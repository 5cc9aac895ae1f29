"""r16 probe: decompose `band_index_write` at 1M docs (the
`synth1m_novelty_index_write` entry, 6.9 s / 95 cpu-s in the r16 BEFORE
record) into its four parts, each timed separately on a fresh dir:

  p1_bands_part     8M (doc_id, band, h) rows -> bucketed table (32)
  p2_keys_part      groupBy(band,h).count -> bucketed table (32)
  p3_ids_part       groupBy(doc_id).collect_list(struct) -> range write
  p4_bloom          idguard.rebuild_filter over the written ids part
  full              band_index_write end-to-end (bench parity)

Run on an IDLE host: python tools/probe_r16_bandwrite.py [n_docs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _tree_cpu_delta, _tree_cpu_sample  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    trials = int(os.environ.get("PROBE_TRIALS", "3"))

    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators import (
        band_index as BI,
        idguard,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        lsh_band_rows,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import get_spark

    spark = get_spark(app_name="probe-r16-bandwrite")
    spark.sparkContext.setLogLevel("ERROR")

    doc_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(24)),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(F.col("id").cast("string"), j.cast("string")),
                    F.lit(50_000),
                ).cast("string"),
            ),
        ),
    )
    docs = (
        spark.range(n_docs)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select(F.col("id").alias("doc_id"), doc_text.alias("text"))
        .cache()
    )
    docs.count()
    bands = lsh_band_rows(docs, id_col="doc_id", text_col="text").cache()
    t0 = time.perf_counter()
    n_b = bands.count()
    print(f"bands_cache_build: {time.perf_counter() - t0:.2f}s, {n_b} rows", flush=True)

    def timed(name, fn, warm=True):
        if warm:
            fn()
        ws, cs = [], []
        for _ in range(trials):
            s0 = _tree_cpu_sample()
            t0 = time.perf_counter()
            fn()
            ws.append(time.perf_counter() - t0)
            cs.append(_tree_cpu_delta(s0, _tree_cpu_sample()))
        print(
            f"{name}: wall_min {min(ws):.2f}s (all {[round(w, 2) for w in ws]}), "
            f"cpu_min {min(cs):.1f} (all {[round(c, 1) for c in cs]})",
            flush=True,
        )

    nb = 32
    root = tempfile.mkdtemp(prefix="probe_bw_")

    ctr = {"n": 0}

    def fresh():
        ctr["n"] += 1
        d = os.path.join(root, f"v{ctr['n']}")
        os.makedirs(d, exist_ok=True)
        return d

    def p1():
        BI._write_new_part(bands, fresh(), "bands", nb)

    timed("p1_bands_part", p1)

    keys = bands.groupBy("band", "h").agg(F.count(F.lit(1)).alias("cnt"))

    def p2():
        BI._write_new_part(keys, fresh(), "bucket_keys", nb)

    timed("p2_keys_part", p2)

    ids = (
        bands.groupBy("doc_id")
        .agg(F.collect_list(F.struct("band", "h")).alias("_keys"))
        .repartitionByRange(
            spark.sparkContext.defaultParallelism, "doc_id"
        )
        .sortWithinPartitions("doc_id")
    )

    def p3():
        BI._write_new_part(ids, fresh(), "ids", None)

    timed("p3_ids_part", p3)

    ids_dir = fresh()
    BI._write_new_part(ids, ids_dir, "ids", None)
    ids_loc = os.path.join(ids_dir, "ids_v1")

    def p4():
        p = fresh()
        idguard.rebuild_filter(
            spark.read.parquet(ids_loc), F.col("doc_id").cast("string"), p, None
        )

    timed("p4_bloom", p4)

    def full():
        d = fresh()
        BI.band_index_write(bands, d, id_col="doc_id", num_buckets=nb)

    timed("full", full)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
