"""10M-row scale probes — one more decade over the bench suite's 1M
entries, where file counts and task overheads start to bite, for the
two 100-TB claims the judge asked to see confirmed at depth
(VERDICT r12 item 7):

- **corpus-independent serving/append on the band index**: a 2k-doc
  novelty gate and a 2k-doc append against a 10M-doc persisted band
  index, vs the same operations against a 1M-doc index built in the
  SAME process — the append slope is the Bloom-guard claim
  (filter-negative ids never touch corpus data), the gate slope is
  the bucketed-serve claim (probe shuffles |batch|*bands rows into
  the corpus's bucketing; the corpus-side scan is the only
  corpus-order term).
- **flat ANN serving through IVF-PQ**: build at 16 dims (sandbox
  memory: 10M x 16 floats = ~640 MB cached) with 256 cells / m=4,
  then a k=10 query at nprobe=16 — serving scans nprobe/n_cells of
  codes-only rows, so the 1M -> 10M query slope should be ~the probed
  partition growth, not 10x.

One-off probe (minutes of build time): run manually, record the JSON
lines in BASELINE.md, keep OUT of the default bench suite (the r6
200k-minhash-solo precedent). Same synthetic families as bench.py.
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

    spark = get_spark(app_name="probe-10m")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def synth_docs(n: int, offset: int = 0):
        # bench.py's band corpus family: 24-token docs, 5000-word vocab
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

    out: dict = {}
    for n, tag in ((1_000_000, "1m"), (10_000_000, "10m")):
        root = tempfile.mkdtemp(prefix=f"probe10m_{tag}_")
        # ---- band index: build once, gate + append min-of-3 --------
        docs = synth_docs(n).localCheckpoint(eager=True)
        band_path = os.path.join(root, "band")
        t0 = time.time()
        bi.band_index_build(docs, band_path)
        out[f"band_build_{tag}"] = round(time.time() - t0, 3)
        meta = bi.band_index_meta(band_path)
        gate_docs = synth_docs(2000, offset=n + 50_000_000).localCheckpoint(
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
                2000, offset=n + 10_000_000 + k * 2000
            ).localCheckpoint(eager=True)
            t0 = time.time()
            added = bi.band_index_append(spark, band_path, batch)
            times.append(time.time() - t0)
            assert added == 2000, added
        out[f"band_append_2k_{tag}"] = round(min(times), 3)
        # ---- IVF-PQ: build once, query min-of-3 --------------------
        vecs = synth_vecs(n).cache()
        vecs.count()
        t0 = time.time()
        enc, C, cb = pq.ivf_pq_build(
            vecs,
            id_col="id",
            n_centroids=256,
            m=4,
            n_codes=256,
            seed=42,
            sample_fraction=0.02 if n <= 1_000_000 else 0.002,
        )
        enc = enc.localCheckpoint(eager=True)
        out[f"ivfpq_build_{tag}"] = round(time.time() - t0, 3)
        qvec = list(vecs.filter(F.col("id") == 0).first()["embedding"])
        times = []
        for _ in range(3):
            t0 = time.time()
            rows = pq.ivf_pq_search(
                enc,
                C,
                cb,
                qvec,
                k=10,
                id_col="id",
                nprobe=16,
                rerank_corpus=vecs,
                embedding_col="embedding",
                rerank_factor=8,
                metric="cosine",
                score_decimals=4,
            ).collect()
            times.append(time.time() - t0)
            assert rows[0]["id"] == 0, "lost the self-neighbor"
        out[f"ivfpq_query_{tag}"] = round(min(times), 3)
        vecs.unpersist()
        print(json.dumps({k: v for k, v in out.items() if tag in k}))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
