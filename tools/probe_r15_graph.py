"""r15 probe: solo re-measure of synth1m_graph_build (flagged 2x CPU in
the mid-round bench run). Replicates the bench entry exactly (same
corpus expression, 320 cells, M=8, seed 42, 5% sample) alone on an
idle host, printing wall + churn-safe process-tree CPU per trial.

Usage: python tools/probe_r15_graph.py [n_rows] [trials]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (module-level helpers only; main() not called)


def main() -> None:
    n1m = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph_ann import (
        graph_index_build,
        graph_index_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="probe-graph")
    spark.sparkContext.setLogLevel("ERROR")

    dim = 64
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            (
                F.pmod(
                    F.xxhash64(
                        F.concat(
                            F.col("id").cast("string"), F.lit("#"), j.cast("string")
                        )
                    ),
                    F.lit(2000),
                )
                - 1000
            ).cast("float")
            / 1000.0
        ),
    )
    corpus = (
        spark.range(n1m).repartition(cpus).select("id", vec.alias("embedding")).cache()
    )
    corpus.count()

    for t in range(trials):
        g_dir = tempfile.mkdtemp(prefix="probe_graph_") + "/idx"
        c0 = bench._tree_cpu_sample()
        w0 = time.perf_counter()
        a, C = graph_index_build(
            corpus,
            id_col="id",
            embedding_col="embedding",
            n_centroids=320,
            M=8,
            seed=42,
            sample_fraction=0.05,
        )
        graph_index_write(a, C, g_dir, M=8, build={"seed": 42})
        wall = time.perf_counter() - w0
        cpu = bench._tree_cpu_delta(c0, bench._tree_cpu_sample())
        shutil.rmtree(os.path.dirname(g_dir), ignore_errors=True)
        print(json.dumps({"trial": t, "wall": round(wall, 2), "cpu": round(cpu, 2)}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
