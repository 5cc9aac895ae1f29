"""Dump `.explain("formatted")` plans for the r16-touched queries into
plans/r16/<query>_<tag>.txt (tag = before|after). Usage:

    python tools/plan_r16_dump.py before   # run from a HEAD~ worktree
    python tools/plan_r16_dump.py after    # run from the r16 tree

The QUERIES list covers every declared query whose physical plan the
r16 optimizations can move: the minhash band/verify restructure, the
layout-stable k-means sampling (ivf/pq/graph builds), and the
band-index write projection.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    # minhash band/bucket + verify restructure
    "dedup_minhash_lsh_pairs",
    "dedup_jaccard_pairs",
    # layout-stable k-means / PQ sampling (training is driver-side;
    # the declared plans should be UNCHANGED — dumped to prove it)
    "knn_join_ivf_top3",
    "knn_pq_adc_top5",
    "collection_query_graph",
    "dedup_embedding_neardup_ivf",
    # novelty gate family (band-index serve path)
    "collection_neardup_gate",
    "collection_neardup_gate_verified",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "plans", "r16")
    from pyspark.sql import SparkSession

    import __spark_entry__ as contract

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    qs = contract.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in QUERIES:
        df = qs[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
