"""Dump `.explain("formatted")` plans for the r15-touched queries into
plans/r15/<query>_<tag>.txt (tag = before|after). Usage:

    python tools/plan_r15_dump.py before
    python tools/plan_r15_dump.py after
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    # Python-boundary (mapInPandas -> mapInArrow / vectorized) paths
    "knn_join_ivf_top3",
    "dedup_embedding_neardup_ivf",
    "knn_pq_adc_top5",
    "pipeline_semantic_dedup",
    "collection_knn_end_to_end",
    # indexed MaxSim stage-1 literal unroll
    "retrieval_maxsim_from_index",
    # graph build vectorization (serve plan unchanged; build feeds it)
    "collection_query_graph",
    # minhash / shingle family
    "dedup_minhash_lsh_pairs",
    "collection_neardup_gate",
    "dedup_exact_substring_coverage",
    "dedup_dup_ngram_fraction",
    # brute MaxSim lattice (HOF) headline pair
    "retrieval_maxsim_top10",
    "retrieval_maxsim_presplit_top10",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from pyspark.sql import SparkSession

    import __spark_entry__ as contract

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    qs = contract.queries()
    outdir = os.path.join(REPO, "plans", "r15")
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
