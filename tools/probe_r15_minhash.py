"""r15 optimization probe: stage-level decomposition of the MinHash/LSH
family at 1M docs — where do `synth1m_minhash_dedup`'s ~900 cpu-s go?

Stages timed independently (each from the cold generator, noop-sunk,
min-of-N wall + process-tree CPU via bench._tree_cpu_*):

  s0_docs_build      cache the 1M synthetic doc corpus (control)
  s1_shingle_only    explode(array_distinct(word_shingles)) — no hash
  s2_hash_md5        s1 + portable hash64 (md5+conv) projection
  s2b_hash_xx        s1 + fast_hash64 (xxhash64) projection — isolates
                     the md5-vs-xxhash base-hash cost
  s3_signature       s2 + 16-permutation groupBy agg (the sig table)
  s4_band_rows       full lsh_band_rows (sig + band hash + explode)
  s5_full_minhash    minhash_lsh_pairs end-to-end (the bench entry)

Run on an IDLE host: python tools/probe_r15_minhash.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _tree_cpu_delta, _tree_cpu_sample  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    trials = int(os.environ.get("PROBE_TRIALS", "3"))

    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        MINHASH_P,
        fast_hash64,
        hash64,
        word_shingles,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        _band_rows_from_shingles,
        minhash_lsh_pairs,
        release_cache,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import get_spark

    spark = get_spark(app_name="probe-r15-minhash")

    dup_base = F.when(F.col("id") % 500 == 0, F.col("id") + 1).otherwise(F.col("id"))
    doc_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(24)),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(dup_base.cast("string"), j.cast("string")),
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
    t0 = time.perf_counter()
    docs.count()
    print(f"s0_docs_build: {time.perf_counter() - t0:.2f}s wall")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        ws, cs = [], []
        for _ in range(trials):
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

    target = spark.sparkContext.defaultParallelism
    base = docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text"))

    def shingle_flat():
        return base.repartition(target).select(
            "_id",
            F.explode(F.array_distinct(word_shingles("_text", 3))).alias("shingle"),
        )

    spark.sparkContext.setJobDescription("s1_shingle_only")
    timed("s1_shingle_only", lambda: noop(shingle_flat()))

    spark.sparkContext.setJobDescription("s2_hash_md5")
    timed(
        "s2_hash_md5",
        lambda: noop(
            shingle_flat().withColumn(
                "h", F.pmod(hash64(F.col("shingle")), F.lit(MINHASH_P))
            )
        ),
    )

    spark.sparkContext.setJobDescription("s2b_hash_xx")
    timed(
        "s2b_hash_xx",
        lambda: noop(
            shingle_flat().withColumn(
                "h", F.pmod(fast_hash64(F.col("shingle")), F.lit(MINHASH_P))
            )
        ),
    )

    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        MINHASH_A,
        MINHASH_B,
    )

    def sig():
        flat = shingle_flat().withColumn(
            "h", F.pmod(hash64(F.col("shingle")), F.lit(MINHASH_P))
        )
        perms = [
            F.min(
                F.pmod(
                    F.lit(MINHASH_A[j]) * F.col("h") + F.lit(MINHASH_B[j]),
                    F.lit(MINHASH_P),
                )
            ).alias(f"_s{j}")
            for j in range(16)
        ]
        return flat.groupBy("_id").agg(*perms)

    spark.sparkContext.setJobDescription("s3_signature")
    timed("s3_signature", lambda: noop(sig()))

    def band_rows():
        flat = shingle_flat().withColumn(
            "h", F.pmod(hash64(F.col("shingle")), F.lit(MINHASH_P))
        )
        return _band_rows_from_shingles(flat, "doc_id", 16, 8)

    spark.sparkContext.setJobDescription("s4_band_rows")
    timed("s4_band_rows", lambda: noop(band_rows()))

    def full():
        res = minhash_lsh_pairs(
            docs, id_col="doc_id", text_col="text", n=3,
            num_hashes=16, bands=8, threshold=0.5,
        )
        n_pairs = res.count()
        release_cache(res)
        assert n_pairs == n_docs // 500, n_pairs

    spark.sparkContext.setJobDescription("s5_full_minhash")
    timed("s5_full_minhash", full)

    spark.stop()


if __name__ == "__main__":
    main()
