"""r15 optimization probe: decompose the indexed-MaxSim entries.

(a) build: how much of `synth400k_maxsim_build` is ivf_build (train +
    assign) vs maxsim_index_write (partitioned write + id-guard)?
(b) serve stage 1: the per-token candidate scan currently projects
    `cosine_similarity(embedding, lit(q_j))` per query token — a
    zip_with/aggregate HOF chain, i.e. CodegenFallback interpreted
    eval (the same pathology the r15 knn fix removed). Compare vs
    `cosine_similarity_literal` (statically unrolled, bit-identical
    fold order).

Run on an IDLE host: python tools/probe_r15_maxsim.py [n_docs n_cells]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    trials = int(os.environ.get("PROBE_TRIALS", "3"))
    dim_t = 16

    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.late_interaction import (
        maxsim_index_build,
        maxsim_index_write,
        maxsim_search,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import get_spark

    spark = get_spark(app_name="probe-r15-maxsim")

    tok_expr = F.transform(
        F.sequence(F.lit(0), (F.col("id") % 4).cast("int")),
        lambda p: F.transform(
            F.sequence(F.lit(1), F.lit(dim_t)),
            lambda j: (
                F.pmod(
                    F.xxhash64(
                        F.col("id").cast("string"), p.cast("string"), j.cast("string")
                    ),
                    F.lit(2000),
                )
                - 1000
            ).cast("float")
            / 1000.0,
        ),
    )
    corpus = (
        spark.range(n_docs)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select(F.col("id").cast("string").alias("id"), tok_expr.alias("tokens"))
        .cache()
    )
    corpus.count()

    def timed(name, fn, n=trials):
        ws, cs = [], []
        for _ in range(n):
            c0 = _tree_cpu_sample()
            t0 = time.perf_counter()
            fn()
            ws.append(time.perf_counter() - t0)
            cs.append(_tree_cpu_delta(c0, _tree_cpu_sample()))
        print(
            f"{name}: wall min {min(ws):.2f}s (all {[round(w, 2) for w in ws]}) "
            f"cpu min {min(cs):.1f}s (all {[round(c, 1) for c in cs]})",
            flush=True,
        )

    li_dir = tempfile.mkdtemp(prefix="probe_r15_maxsim_") + "/idx"
    holder = {}

    def build_only():
        holder["a"], holder["C"] = maxsim_index_build(
            corpus, id_col="id", tokens_col="tokens",
            n_centroids=n_cells, seed=42, sample_fraction=0.05,
        )
        # materialize assignment through the noop sink (write cost
        # excluded) — the mapInPandas assign + token explode cost
        holder["a"].write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription("build_assign_only")
    timed("build_assign_only", build_only, n=1)

    def write_only():
        maxsim_index_write(holder["a"], holder["C"], li_dir, build={"seed": 42})

    spark.sparkContext.setJobDescription("index_write_only")
    timed("index_write_only", write_only, n=1)

    q_toks = [list(t) for t in corpus.filter(F.col("id") == "3").first()["tokens"]]

    def serve():
        st: dict = {}
        rows = maxsim_search(
            spark, li_dir, q_toks, k=10, nprobe=8,
            candidate_factor=4, rerank_corpus=corpus,
            id_col="id", tokens_col="tokens", stats_out=st,
        ).collect()
        assert rows[0]["id"] == "3"

    spark.sparkContext.setJobDescription("serve_hof")
    serve()  # warm
    timed("serve_current", serve)

    shutil.rmtree(os.path.dirname(li_dir), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
