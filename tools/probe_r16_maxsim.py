"""r16 probe [V8]: MaxSim stage-2 rerank — bucket-pruned point read vs
full-corpus semi-join, at a corpus large enough for pruning to show.

The r15 verdict accepted the bucket-pruned rerank's PLAN as evidence
(PartitionFilters + id pushdown) but flagged that its wall effect was
invisible at sf0.1-scale corpora. This probe builds a 1M-doc ragged
token corpus (~2.5M token rows, 640 cells), persists BOTH the token
index and the bucketed rerank corpus, and serves the same query two
ways:

  pruned   stage 2 = the persisted bucket-pruned point read (the
           default maxsim_search path; candidates resolve to hash
           buckets driver-side, parquet read prunes statically)
  full     stage 2 = broadcast semi-join against the UNBUCKETED view
           of the same persisted corpus (rerank_corpus= an un-pruned
           read of the identical files)

Identical results asserted; min-of-3 warm wall + tree CPU printed.

Run on an IDLE host: python tools/probe_r16_maxsim.py [n_docs]
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
    n_cells = max(64, (n_docs * 5 // 2) // 4000)
    trials = int(os.environ.get("PROBE_TRIALS", "3"))

    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.late_interaction import (
        maxsim_corpus_read,
        maxsim_corpus_write,
        maxsim_index_build,
        maxsim_index_write,
        maxsim_search,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import get_spark

    spark = get_spark(app_name="probe-r16-maxsim")
    spark.sparkContext.setLogLevel("ERROR")

    dim_t = 16
    tok_expr = F.transform(
        F.sequence(F.lit(0), (F.col("id") % 4).cast("int")),
        lambda p: F.transform(
            F.sequence(F.lit(1), F.lit(dim_t)),
            lambda j: (
                F.pmod(
                    F.xxhash64(
                        F.col("id").cast("string"),
                        p.cast("string"),
                        j.cast("string"),
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
    idx = tempfile.mkdtemp(prefix="probe_maxsim_") + "/idx"
    t0 = time.perf_counter()
    a, C = maxsim_index_build(
        corpus, id_col="id", tokens_col="tokens",
        n_centroids=n_cells, seed=42, sample_fraction=0.05,
    )
    maxsim_index_write(a, C, idx, build={"seed": 42})
    print(f"index_build: {time.perf_counter() - t0:.1f}s ({n_cells} cells)", flush=True)
    t0 = time.perf_counter()
    maxsim_corpus_write(corpus, idx, id_col="id", tokens_col="tokens", n_buckets=64)
    print(f"corpus_write: {time.perf_counter() - t0:.1f}s", flush=True)
    corpus.unpersist()

    # query = doc 3's tokens, read from the persisted corpus
    cdf, _nb = maxsim_corpus_read(spark, idx)
    q_toks = [list(t) for t in cdf.filter(F.col("id") == "3").first()["tokens"]]
    full_view = cdf.select("id", "tokens")  # same files, no bucket pruning

    def serve_pruned(st):
        return maxsim_search(
            spark, idx, q_toks, k=10, nprobe=8, candidate_factor=4,
            stats_out=st,
        ).collect()

    def serve_full(st):
        return maxsim_search(
            spark, idx, q_toks, k=10, nprobe=8, candidate_factor=4,
            rerank_corpus=full_view, id_col="id", tokens_col="tokens",
            stats_out=st,
        ).collect()

    st1, st2 = {}, {}
    r1, r2 = serve_pruned(st1), serve_full(st2)  # warm + parity
    assert [(r["id"], r["maxsim"]) for r in r1] == [
        (r["id"], r["maxsim"]) for r in r2
    ], "pruned vs full rerank disagree"
    assert r1[0]["id"] == "3"
    print(f"stats pruned: {st1}", flush=True)
    print(f"stats full:   {st2}", flush=True)

    for name, fn in (("pruned", serve_pruned), ("full", serve_full)):
        ws, cs = [], []
        for _ in range(trials):
            s0 = _tree_cpu_sample()
            t0 = time.perf_counter()
            fn({})
            ws.append(time.perf_counter() - t0)
            cs.append(_tree_cpu_delta(s0, _tree_cpu_sample()))
        print(
            f"serve_{name}: wall_min {min(ws):.2f}s "
            f"(all {[round(w, 2) for w in ws]}), cpu_min {min(cs):.1f} "
            f"(all {[round(c, 1) for c in cs]})",
            flush=True,
        )
    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)


if __name__ == "__main__":
    main()
