"""r16 optimization probe: decompose the BAND/BUCKET + VERIFY stages of
`minhash_lsh_pairs` at 1M docs (the `synth1m_minhash_dedup` entry, the
bench's largest CPU term: 750 cpu-s in the r15 record, ~60% attributed
to the band/bucket pipeline by the r15 decomposition).

Stages (each noop-sunk, warmed once, then PROBE_TRIALS timed trials,
process-tree CPU via bench._tree_cpu_*), all downstream of a cached
(_id, h) shingle table and a cached 16-perm signature table so the
band/bucket work is isolated from shingle/signature derivation:

  s1_sig_agg        16-permutation groupBy agg over the shingle cache
  s2_sizes_agg      per-doc shingle counts over the shingle cache
  s3_bstats         buckets explode + groupBy(band,h) (cnt,min) + >=2
  s4_annotated      s3 joined back onto the buckets rows
  s5_candidates     small self-join + star union + distinct (CURRENT)
  s5k_candidates    same, but bucket key folded to ONE bigint h*8+band
  s5m_candidates    members-variant: groupBy collect_list -> explode
                    sorted pairs (no self-join)  [candidate rewrite]
  s6_verify         verify joins from a MATERIALIZED candidate set
  s7_full           minhash_lsh_pairs end-to-end (the bench entry)

Run on an IDLE host: python tools/probe_r16_minhash.py [n_docs]
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
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        hash64,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        _shingle_rows,
        minhash_lsh_pairs,
        release_cache,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import get_spark

    spark = get_spark(app_name="probe-r16-minhash")
    spark.sparkContext.setLogLevel("ERROR")

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
    print(f"docs_build: {time.perf_counter() - t0:.2f}s wall", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

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

    # --- shared upstream state: cached (_id, h) shingles + cached sig
    num_hashes, bands, cap = 16, 8, 256
    rpb = num_hashes // bands
    sh = (
        _shingle_rows(docs, "doc_id", "text", 3, True, engine="auto", cache=False)
        .select("_id", "h")
        .cache()
    )
    t0 = time.perf_counter()
    n_sh = sh.count()
    print(f"sh_cache_build: {time.perf_counter() - t0:.2f}s wall, {n_sh} rows", flush=True)

    perms = [
        F.min(
            F.pmod(
                F.lit(MINHASH_A[j]) * F.col("h") + F.lit(MINHASH_B[j]),
                F.lit(MINHASH_P),
            )
        ).alias(f"_s{j}")
        for j in range(num_hashes)
    ]
    sig_plain = sh.groupBy("_id").agg(*perms)
    timed("s1_sig_agg", lambda: noop(sig_plain))
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    timed("s2_sizes_agg", lambda: noop(sizes))

    sig = sig_plain.cache()
    t0 = time.perf_counter()
    sig.count()
    print(f"sig_cache_build: {time.perf_counter() - t0:.2f}s wall", flush=True)

    band_structs = []
    for b in range(bands):
        piece = [F.col(f"_s{b * rpb + r}").cast("string") for r in range(rpb)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                hash64(F.concat_ws(",", *piece)).alias("h"),
            )
        )
    buckets = sig.select(
        "_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("_id", F.col("b.band").alias("band"), F.col("b.h").alias("h"))

    bstats = (
        buckets.groupBy("band", "h")
        .agg(F.count(F.lit(1)).alias("_bsz"), F.min("_id").alias("_bmin"))
        .filter(F.col("_bsz") >= 2)
    )
    timed("s3_bstats", lambda: noop(bstats))

    annotated = buckets.join(bstats, ["band", "h"])
    timed("s4_annotated", lambda: noop(annotated))

    small = annotated.filter(F.col("_bsz") <= cap)
    x, y = small.alias("x"), small.alias("y")
    small_pairs = x.join(
        y,
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.h") == F.col("y.h"))
        & (F.col("x._id") < F.col("y._id")),
    ).select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
    star_pairs = annotated.filter(
        (F.col("_bsz") > cap) & (F.col("_id") != F.col("_bmin"))
    ).select(F.col("_bmin").alias("id_a"), F.col("_id").alias("id_b"))
    candidates = small_pairs.unionByName(star_pairs).distinct()
    timed("s5_candidates", lambda: noop(candidates))

    # --- variant: ONE bigint bucket key (h*8+band; hash64 < 2^60)
    buckets_k = sig.select(
        "_id", F.explode(F.array(*band_structs)).alias("b")
    ).select(
        "_id", (F.col("b.h") * bands + F.col("b.band")).alias("k")
    )
    bstats_k = (
        buckets_k.groupBy("k")
        .agg(F.count(F.lit(1)).alias("_bsz"), F.min("_id").alias("_bmin"))
        .filter(F.col("_bsz") >= 2)
    )
    annotated_k = buckets_k.join(bstats_k, "k")
    small_k = annotated_k.filter(F.col("_bsz") <= cap)
    xk, yk = small_k.alias("x"), small_k.alias("y")
    small_pairs_k = xk.join(
        yk,
        (F.col("x.k") == F.col("y.k")) & (F.col("x._id") < F.col("y._id")),
    ).select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
    star_pairs_k = annotated_k.filter(
        (F.col("_bsz") > cap) & (F.col("_id") != F.col("_bmin"))
    ).select(F.col("_bmin").alias("id_a"), F.col("_id").alias("id_b"))
    candidates_k = small_pairs_k.unionByName(star_pairs_k).distinct()
    timed("s5k_candidates", lambda: noop(candidates_k))

    # --- variant: pre-aggregated bucket members, pairs by explode
    members = (
        buckets_k.groupBy("k")
        .agg(F.sort_array(F.collect_list("_id")).alias("_m"))
        .withColumn("_sz", F.size("_m"))
        .filter(F.col("_sz") >= 2)
    )
    small_m = (
        members.filter(F.col("_sz") <= cap)
        .select("_m", F.posexplode("_m").alias("_i", "id_a"))
        .select(
            "id_a",
            F.explode(
                F.slice(F.col("_m"), F.col("_i") + 2, F.size("_m"))
            ).alias("id_b"),
        )
    )
    star_m = (
        members.filter(F.col("_sz") > cap)
        .select(
            F.element_at("_m", 1).alias("id_a"), F.explode("_m").alias("id_b")
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    candidates_m = small_m.unionByName(star_m).distinct()
    timed("s5m_candidates", lambda: noop(candidates_m))

    n_cand = candidates.count()
    n_cand_m = candidates_m.count()
    print(f"candidate parity: current {n_cand}, members {n_cand_m}", flush=True)

    # --- verify stage from a materialized candidate table
    cand_mat = candidates.localCheckpoint(eager=True)
    a = sh.select(F.col("_id").alias("id_a"), F.col("h").alias("h_a"))
    b_side = sh.select(F.col("_id").alias("b_id"), F.col("h").alias("h_b"))
    shared = (
        cand_mat.join(a, "id_a")
        .join(
            b_side,
            (F.col("id_b") == F.col("b_id")) & (F.col("h_a") == F.col("h_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.round(
        F.col("shared").cast("double")
        / (F.col("na") + F.col("nb") - F.col("shared")),
        4,
    )
    verify = (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )
    timed("s6_verify", lambda: noop(verify))

    sig.unpersist()
    sh.unpersist()

    # --- the full bench entry, fresh caches per trial (bench parity)
    def full():
        res = minhash_lsh_pairs(
            docs, id_col="doc_id", text_col="text", n=3,
            num_hashes=16, bands=8, threshold=0.5,
        )
        n_pairs = res.count()
        release_cache(res)
        assert n_pairs == n_docs // 500, n_pairs

    timed("s7_full", full)


if __name__ == "__main__":
    main()
