"""100M-row SERVE-path probes — the THIRD consecutive decade for the
flat-curve claims (r13 verdict item 7). Builds run once (a corpus
pass is linear by design and priced at 1M/10M in probe_10m.py); what
this probe records is the SERVE slope across 10M -> 100M in ONE
process (the 10M leg re-run here as the same-warm-state control):

- novelty gate: 2k docs against the persisted band index — the
  bucketed exchange-free serve's corpus term is a narrow key scan;
- band append: 2k fresh docs — the Bloom id-guard's
  corpus-independence claim at its third decade;
- IVF-PQ query: k=10 at FIXED nprobe over ``n_centroids="auto"``
  cells (r15: ``ann.auto_n_centroids`` — rows/TARGET_CELL_ROWS, so
  250 cells at 10M and 2500 at 100M). Constant occupancy makes the
  probed code VOLUME constant across decades (nprobe * ~40k rows),
  which is the flat-serve discipline every 100 TB layout uses; the
  r14 run scaled cells only 4x per decade and paid 2.5x probed
  volume for it (the named residual this revision retires).

Sandbox sizing: 100M x 16-dim float32 = ~6.4 GB of vectors; the
corpus is NOT cached (the serve paths read codes/keys, not floats —
caching the floats would measure the sandbox's memory, not the
design). The PQ query is measured ADC-only: the flat claim is the
codes-stage candidate generation; the exact-rerank FETCH at this
scale is a bucket-pruned point read of k*factor ids against the
bucketed collection layout (priced in the serving-matrix rows), and
scanning 6.4 GB of floats for it here would measure sandbox IO.

One-off probe (tens of minutes of build time): run manually, record
the JSON lines in BASELINE.md, keep OUT of the default bench suite
(the probe_10m.py precedent).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators import (
        band_index as bi,
        pq,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        novelty_gate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import (
        get_spark,
    )

    # 100M docs -> ~2.4B shingle rows: two sizing knobs, both the
    # literal "size partitions and memory to the target SF" contract.
    # (1) the engine's local-mode heap defaults to 8g
    # (session.get_spark SPARK_DRIVER_MEMORY) — at this scale 32
    # concurrent hash-agg tasks die with AGGREGATE_OUT_OF_MEMORY in
    # it (observed twice); the probe raises the default to 64g of
    # the sandbox's 128 GiB unless the caller already sized it.
    # (2) shuffle partitions scale to 512 so per-task reduce state
    # stays bounded; AQE coalesces the small stages back down, so
    # the 10M control leg is unharmed.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    spark = get_spark(
        app_name="probe-100m",
        shuffle_partitions=int(os.environ.get("PROBE_SHUFFLE", "512")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def synth_docs(n: int, offset: int = 0):
        # probe_10m.py's band corpus family (24 tokens, 5000 vocab)
        return (
            spark.range(n)
            .repartition(cpus)
            .select(
                (F.col("id") + offset).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(24)),
                        lambda j: F.concat(
                            F.lit("w"),
                            F.pmod(
                                (F.col("id") + offset) * 131 + j * 17,
                                F.lit(5000),
                            ),
                        ),
                    ),
                ).alias("text"),
            )
        )

    def synth_vecs(n: int):
        return (
            spark.range(n)
            .repartition(cpus)
            .select(
                "id",
                F.transform(
                    F.sequence(F.lit(1), F.lit(16)),
                    lambda j: (
                        F.pmod(F.col("id") * j + j * j, F.lit(97)).cast(
                            "float"
                        )
                        / F.lit(97.0)
                    ),
                ).alias("embedding"),
            )
        )

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        auto_n_centroids,
    )

    out: dict = {}
    for n, tag in ((10_000_000, "10m"), (100_000_000, "100m")):
        n_cells = auto_n_centroids(n)  # 250 at 10M, 2500 at 100M
        out[f"n_cells_{tag}"] = n_cells
        root = tempfile.mkdtemp(prefix=f"probe100m_{tag}_")
        # ---- band index: build once (recorded, linear by design),
        # then gate + append min-of-3 ---------------------------------
        docs = synth_docs(n)  # NOT checkpointed at 100M: generate-on-read
        band_path = os.path.join(root, "band")
        t0 = time.time()
        bi.band_index_build(docs, band_path)
        out[f"band_build_{tag}"] = round(time.time() - t0, 3)
        meta = bi.band_index_meta(band_path)
        gate_docs = synth_docs(2000, offset=n + 900_000_000).localCheckpoint(
            eager=True
        )
        times = []
        for _ in range(3):
            t0 = time.time()
            got = novelty_gate(
                gate_docs,
                bi.band_index_bucket_keys(spark, band_path),
                id_col="doc_id",
                text_col="text",
                n=meta["n"],
                num_hashes=meta["num_hashes"],
                bands=meta["bands"],
            ).count()
            times.append(time.time() - t0)
            assert got == 2000, got
        out[f"novelty_gate_2k_{tag}"] = round(min(times), 3)
        times = []
        for k in range(3):  # disjoint batches: every append is fresh
            batch = synth_docs(
                2000, offset=n + 500_000_000 + k * 2000
            ).localCheckpoint(eager=True)
            t0 = time.time()
            added = bi.band_index_append(spark, band_path, batch)
            times.append(time.time() - t0)
            assert added == 2000, added
        out[f"band_append_2k_{tag}"] = round(min(times), 3)
        print(json.dumps({k: v for k, v in out.items() if tag in k}), flush=True)
        import shutil

        shutil.rmtree(root, ignore_errors=True)

        # ---- IVF-PQ: build once, PERSIST (partition-pruned serve),
        # query min-of-3 at a fixed probed fraction -------------------
        vroot = tempfile.mkdtemp(prefix=f"probe100m_vec_{tag}_")
        vecs = synth_vecs(n)
        t0 = time.time()
        enc, C, cb = pq.ivf_pq_build(
            vecs,
            id_col="id",
            n_centroids=n_cells,
            m=4,
            n_codes=256,
            seed=42,
            sample_fraction=20_000 / n,
            n_rows=n,
        )
        idx = os.path.join(vroot, "ivfpq")
        pq.ivf_pq_write(enc, C, cb, idx)
        out[f"ivfpq_build_write_{tag}"] = round(time.time() - t0, 3)
        enc2, C2, cb2 = pq.ivf_pq_read(spark, idx)
        qvec = list(vecs.filter(F.col("id") == 0).first()["embedding"])
        # The FLAT claim is the codes-only candidate stage: ADC over
        # nprobe/n_cells of the persisted 4-byte-code rows (cells
        # scaled with the corpus -> probed volume ~constant). Rerank
        # fetch is a separate concern: at production scale it is a
        # bucket-pruned point read of k*factor ids against the
        # bucketed collection (measured in the serving-matrix rows);
        # scanning the full float corpus for it here would measure
        # the sandbox's IO, not the design.
        times = []
        for _ in range(3):
            t0 = time.time()
            rows = pq.ivf_pq_search(
                enc2,
                C2,
                cb2,
                qvec,
                k=10,
                id_col="id",
                nprobe=16,
                metric="cosine",
                score_decimals=4,
            ).collect()
            times.append(time.time() - t0)
            # ADC-only: quantization-tolerant membership, not rank-1
            assert 0 in {r["id"] for r in rows}, "self lost from ADC top-10"
        out[f"ivfpq_query_adc_{tag}"] = round(min(times), 3)
        print(json.dumps({k: v for k, v in out.items() if tag in k}), flush=True)
        shutil.rmtree(vroot, ignore_errors=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
