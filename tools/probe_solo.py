"""Solo idle-host re-measure of bench probes flagged out-of-band.

Replicates the exact bench.py setups for synth200k_ivf_neardup and
synth100k_pagerank (same synthetic data, same warm-up discipline) but
runs each ALONE in a fresh session, min-of-3, so the number is free of
in-suite cache pressure and concurrent host load. Usage:

    python tools/probe_solo.py [ivf_neardup] [pagerank]

Prints one JSON line per probe; does not touch BENCH_LOCAL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    which = set(sys.argv[1:]) or {"ivf_neardup", "pagerank"}
    if "synth1m" in which:
        synth1m_probe()
        which -= {"synth1m"}
        if not which:
            return
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-solo")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def min_of_3(fn) -> list[float]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        return ts

    if "ivf_neardup" in which:
        from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
            ivf_neardup_pairs,
        )

        n, dim = 200_000, 64
        dup_base_v = F.when(F.col("id") % 100 == 0, F.col("id") + 1).otherwise(
            F.col("id")
        )
        ndup_vec = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (
                (
                    F.pmod(
                        F.xxhash64(
                            F.concat(
                                dup_base_v.cast("string"), F.lit("#"), j.cast("string")
                            )
                        ),
                        F.lit(2000),
                    )
                    - 1000
                ).cast("double")
                / 1000.0
                + (
                    F.pmod(
                        F.xxhash64(
                            F.concat(
                                F.col("id").cast("string"), F.lit("@"), j.cast("string")
                            )
                        ),
                        F.lit(21),
                    )
                    - 10
                ).cast("double")
                / 100000.0
            ).cast("float"),
        )
        ndup = (
            spark.range(n)
            .repartition(cpus)
            .select("id", ndup_vec.alias("embedding"))
            .cache()
        )
        ndup.count()

        def run_ivf_neardup() -> None:
            got = ivf_neardup_pairs(
                ndup,
                id_col="id",
                embedding_col="embedding",
                threshold=0.9,
                sample_fraction=0.05,
            ).count()
            assert got == n // 100, f"expected {n // 100} pairs, got {got}"

        run_ivf_neardup()  # warm-up (k-means broadcast + Arrow worker spin-up)
        trials = min_of_3(run_ivf_neardup)
        print(
            json.dumps(
                {
                    "probe": "synth200k_ivf_neardup",
                    "trials": trials,
                    "min": min(trials),
                }
            )
        )
        ndup.unpersist()

    if "pagerank" in which:
        from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
            pagerank,
        )

        n_edges, n_nodes_pr = 100_000, 10_000
        edges_pr = (
            spark.range(n_edges)
            .repartition(cpus)
            .select(
                F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(n_nodes_pr)).alias(
                    "src"
                ),
                F.pmod(
                    F.xxhash64(F.concat(F.col("id").cast("string"), F.lit("#d"))),
                    F.lit(n_nodes_pr),
                ).alias("dst"),
            )
            .cache()
        )
        edges_pr.count()

        def run_pagerank_100k() -> None:
            ranks = pagerank(
                edges_pr, src="src", dst="dst", iterations=3, decimals=None
            )
            got = ranks.agg(
                F.sum("rank").alias("s"), F.count(F.lit(1)).alias("n")
            ).first()
            assert got["n"] > 9_000 and got["s"] > 0

        trials = min_of_3(run_pagerank_100k)
        print(
            json.dumps(
                {
                    "probe": "synth100k_pagerank",
                    "trials": trials,
                    "min": min(trials),
                }
            )
        )
        edges_pr.unpersist()

    for tag, n_docs, dup_mod, vocab in (
        ("minhash50k", 50_000, 100, 5000),
        ("minhash1m", 1_000_000, 500, 50_000),
    ):
        if tag not in which:
            continue
        # exact replica of bench.py's synth{50k,1m}_minhash_dedup
        # setup: planted near-dup pairs over a diverse vocabulary,
        # warm once (the bench entries' warm-steady-state discipline),
        # min-of-3 alone on the host
        from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
            minhash_lsh_pairs,
            release_cache,
        )

        dup_base = F.when(
            F.col("id") % dup_mod == 0, F.col("id") + 1
        ).otherwise(F.col("id"))
        doc_text = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(24)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(dup_base.cast("string"), j.cast("string")),
                        F.lit(vocab),
                    ).cast("string"),
                ),
            ),
        )
        docs = (
            spark.range(n_docs)
            .repartition(cpus)
            .select(F.col("id").alias("doc_id"), doc_text.alias("text"))
            .cache()
        )
        docs.count()

        def run_minhash() -> None:
            res = minhash_lsh_pairs(
                docs, id_col="doc_id", text_col="text",
                n=3, num_hashes=16, bands=8, threshold=0.5,
            )
            n_pairs = res.count()
            release_cache(res)
            assert n_pairs == n_docs // dup_mod, n_pairs

        run_minhash()  # warm-up, untimed (bench uses warmup for 1m)
        trials = min_of_3(run_minhash)
        name = (
            "synth50k_minhash_dedup"
            if tag == "minhash50k"
            else "synth1m_minhash_dedup"
        )
        print(
            json.dumps({"probe": name, "trials": trials, "min": min(trials)})
        )
        docs.unpersist()

    spark.stop()


def synth1m_probe() -> None:
    """Solo CPU-banded re-measure of the three r14-flagged synth1m
    serve entries (synth1m_knn_binary 1.62x, synth1m_ivfpq_query
    1.60x, synth1m_knn_exact 1.40x vs the r13 record, consistent
    min-of-3 in-suite). Exact bench.py setups (same corpus recipe,
    cache + warmup discipline), each alone in a fresh session, with
    the churn-safe process-tree CPU delta next to wall so the verdict
    bands on CPU. BLAS A/B: SPARK_GRAFT_PIN_BLAS=1 pins worker BLAS
    to one thread (the r14 session default), =0 force-unsets it (the
    r13 world) — run both to attribute any delta to the pin."""
    pin = os.environ.get("SPARK_GRAFT_PIN_BLAS", "1")
    for v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        if pin == "0":
            os.environ.pop(v, None)
        else:
            os.environ.setdefault(v, "1")
    import bench as _b
    from pyspark.sql import SparkSession, functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-solo-1m")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        binary_quantize,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query as _knn_query,
        knn_query_binary as _knn_query_binary,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        ivf_pq_build,
        ivf_pq_search,
    )

    dim = 64
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(
                F.xxhash64(
                    F.concat(
                        F.col("id").cast("string"), F.lit("#"),
                        j.cast("string"),
                    )
                ),
                F.lit(2000),
            )
            - 1000
        ).cast("float")
        / 1000.0,
    )
    n1m = 1_000_000
    corpus1m = (
        spark.range(n1m)
        .repartition(cpus)
        .select("id", vec.alias("embedding"))
        .cache()
    )
    corpus1m.count()
    qvec1m = list(corpus1m.filter(F.col("id") == 0).first()["embedding"])

    def timed3(fn, warmup=True):
        if warmup:
            fn()
        ws, cs = [], []
        for _ in range(3):
            c0 = _b._tree_cpu_sample()
            t0 = time.perf_counter()
            fn()
            ws.append(round(time.perf_counter() - t0, 3))
            cs.append(round(_b._tree_cpu_delta(c0, _b._tree_cpu_sample()), 2))
        return {"wall": ws, "wall_min": min(ws), "cpu": cs, "cpu_min": min(cs)}

    out = {"probe": "synth1m_solo", "blas_pinned": pin != "0"}

    # --- knn_exact ---------------------------------------------------
    def run_exact_1m() -> None:
        rows = _knn_query(
            corpus1m, qvec1m, k=5, id_col="id", metric="cosine",
            score_decimals=4,
        ).collect()
        assert rows[0]["id"] == 0

    out["synth1m_knn_exact"] = timed3(run_exact_1m)

    # --- knn_binary --------------------------------------------------
    packed1m = corpus1m.select(
        "id", "embedding", binary_quantize("embedding").alias("bits")
    ).cache()
    packed1m.count()

    def run_binary_1m() -> None:
        rows = _knn_query_binary(
            packed1m, qvec1m, k=5, id_col="id", metric="cosine",
            score_decimals=4, bits_col="bits",
        ).collect()
        assert rows[0]["id"] == 0

    out["synth1m_knn_binary"] = timed3(run_binary_1m)
    packed1m.unpersist()

    # --- ivfpq_query -------------------------------------------------
    enc_1m, C_1m, cb_1m = ivf_pq_build(
        corpus1m, id_col="id", n_centroids=256, m=8, n_codes=256,
        seed=42, sample_fraction=0.02,
    )
    enc_1m = enc_1m.cache()
    enc_1m.count()

    def run_ivfpq_query_1m() -> None:
        rows = ivf_pq_search(
            enc_1m, C_1m, cb_1m, qvec1m, k=10, id_col="id", nprobe=16,
            rerank_corpus=corpus1m, embedding_col="embedding",
            rerank_factor=8, metric="cosine", score_decimals=4,
        ).collect()
        assert rows[0]["id"] == 0

    out["synth1m_ivfpq_query"] = timed3(run_ivfpq_query_1m)
    enc_1m.unpersist()
    corpus1m.unpersist()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
