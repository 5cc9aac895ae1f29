"""Vector math properties (hypothesis) + kNN metric variants."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
    knn_join,
    knn_join_gemm,
    knn_query,
)

finite = st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32)


@settings(max_examples=15, deadline=None)
@given(st.lists(finite, min_size=2, max_size=12), st.lists(finite, min_size=2, max_size=12))
def test_vector_properties(spark, a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    row = df.select(
        dot_product("a", "b").alias("ab"),
        dot_product("b", "a").alias("ba"),
        l2_distance("a", "a").alias("self_dist"),
        l2_norm("a").alias("na"),
    ).first()
    assert math.isclose(row["ab"], row["ba"], rel_tol=1e-12)  # symmetry
    assert row["self_dist"] == 0.0
    expect = math.sqrt(sum(float(F_) * float(F_) for F_ in
                           [float.fromhex(float(x).hex()) for x in a]))
    # compare against float32-rounded python computation
    import numpy as np

    assert math.isclose(
        row["na"], float(np.linalg.norm(np.asarray(a, dtype="float32").astype("float64"))),
        rel_tol=1e-9,
    )


def test_knn_metrics_agree_on_direction(spark):
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [-1.0, 0.0]),
        ],
        "id int, embedding array<float>",
    )
    q = [1.0, 0.0]
    cos = [r["id"] for r in knn_query(corpus, q, k=4, metric="cosine").collect()]
    l2 = [r["id"] for r in knn_query(corpus, q, k=4, metric="l2").collect()]
    dot = [r["id"] for r in knn_query(corpus, q, k=4, metric="dot").collect()]
    assert cos[0] == 1 and l2[0] == 1 and dot[0] == 1
    assert cos[-1] == 4 and l2[-1] == 4 and dot[-1] == 4


def test_knn_join_variants_agree(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(200)],
        "id int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(5)],
        "qid int, q_embedding array<float>",
    )
    a = knn_join(queries, corpus, k=3, score_decimals=6)
    b = knn_join_gemm(queries, corpus, k=3, score_decimals=6)
    ra = {(r["qid"], r["rank"]): (r["neighbor_id"], r["score"]) for r in a.collect()}
    rb = {(r["qid"], r["rank"]): (r["neighbor_id"], r["score"]) for r in b.collect()}
    assert ra == rb


def test_knn_join_gemm_chunked_queries_match_expression_form(spark):
    """A query set LARGER than query_block_size (forced tiny) must
    split into multiple GEMM blocks and still agree exactly with the
    expression-form join — the blocked path is pure refactoring of
    where the score matrix is cut, never of the result."""
    import numpy as np

    rng = np.random.RandomState(11)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(150)],
        "id int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(23)],
        "qid int, q_embedding array<float>",
    )
    a = knn_join(queries, corpus, k=4, score_decimals=6)
    b = knn_join_gemm(queries, corpus, k=4, score_decimals=6, query_block_size=7)
    ra = {(r["qid"], r["rank"]): (r["neighbor_id"], r["score"]) for r in a.collect()}
    rb = {(r["qid"], r["rank"]): (r["neighbor_id"], r["score"]) for r in b.collect()}
    assert len(rb) == 23 * 4
    assert ra == rb


def test_knn_join_gemm_auto_dispatches_large_query_sides(spark):
    """A query set above max_driver_queries must route to the fully
    distributed ivf_knn_join (all cells probed -> exhaustive) and
    return results identical to the driver-blocked GEMM path — the
    dispatch boundary changes where work runs, never the answer."""
    import numpy as np

    rng = np.random.RandomState(17)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(180)],
        "id int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)],
        "qid int, q_embedding array<float>",
    )
    below = knn_join_gemm(queries, corpus, k=3, score_decimals=6)
    above = knn_join_gemm(
        queries, corpus, k=3, score_decimals=6, max_driver_queries=16
    )
    ra = {(r["qid"], r["rank"]): (r["neighbor_id"], r["score"]) for r in below.collect()}
    rb = {(r["qid"], r["rank"]): (r["neighbor_id"], r["score"]) for r in above.collect()}
    assert len(ra) == 40 * 3
    assert ra == rb


def test_knn_join_gemm_auto_dispatch_l2(spark):
    """Dispatch boundary parity for the l2 metric (distance ranks
    ascending; ivf cells trained euclidean)."""
    import numpy as np

    rng = np.random.RandomState(23)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(6)]) for i in range(120)],
        "id int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(6)]) for i in range(30)],
        "qid int, q_embedding array<float>",
    )
    below = knn_join_gemm(queries, corpus, k=4, metric="l2", score_decimals=6)
    above = knn_join_gemm(
        queries, corpus, k=4, metric="l2", score_decimals=6, max_driver_queries=8
    )
    ra = {(r["qid"], r["rank"]): (r["neighbor_id"], r["score"]) for r in below.collect()}
    rb = {(r["qid"], r["rank"]): (r["neighbor_id"], r["score"]) for r in above.collect()}
    assert len(ra) == 30 * 4
    assert ra == rb


def test_l2_metric_knn_join_gemm(spark):
    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [3.0, 4.0])],
        "id int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(10, [0.0, 0.0])], "qid int, q_embedding array<float>"
    )
    out = {r["rank"]: (r["neighbor_id"], round(r["score"], 4)) for r in
           knn_join_gemm(queries, corpus, k=3, metric="l2").collect()}
    assert out[1] == (1, 0.0)
    assert out[2] == (2, round(math.sqrt(2), 4))
    assert out[3] == (3, 5.0)


@settings(max_examples=10, deadline=None)
@given(st.lists(finite, min_size=2, max_size=16))
def test_int8_quantization_bounds(spark, a):
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        dequantize_int8,
        maxabs_scale,
        quantize_int8,
    )

    df = spark.createDataFrame([(a,)], "a array<float>")
    s = maxabs_scale("a")
    q = quantize_int8("a", s)
    row = df.select(
        s.alias("scale"),
        F.array_min(q).alias("qmin"),
        F.array_max(q).alias("qmax"),
        F.array_max(
            F.zip_with(
                dequantize_int8(q, s),
                F.col("a"),
                lambda d, x: F.abs(d - x.cast("double")),
            )
        ).alias("err"),
    ).first()
    assert -127 <= row["qmin"] and row["qmax"] <= 127
    # reconstruction error bounded by half a quantization step
    assert row["err"] <= row["scale"] / 254.0 + 1e-12


def test_quantized_knn_preserves_neighbors(spark):
    """Retrieval survives int8 quantization: top-10 cosine neighbors
    computed on dequantized int8 vectors overlap >=8/10 with exact
    neighbors — the property that makes 4x-smaller storage usable for
    first-stage retrieval (rerank with full precision if needed)."""
    from .conftest import SF_CORRECT
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        dequantize_int8,
        maxabs_scale,
        quantize_int8,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
        load_table,
    )

    e = load_table(spark, SF_CORRECT, "embeddings")
    s = maxabs_scale("embedding")
    deq = e.select(
        "vec_id",
        dequantize_int8(quantize_int8("embedding", s), s)
        .cast("array<float>")
        .alias("embedding"),
    )
    qvec = list(e.filter(F.col("vec_id") == 7).first()["embedding"])
    exact = {r["vec_id"] for r in knn_query(e, qvec, k=10, id_col="vec_id").collect()}
    quant = {r["vec_id"] for r in knn_query(deq, qvec, k=10, id_col="vec_id").collect()}
    assert len(exact & quant) >= 8


# ---------------------------------------------------------------------------
# Pre-split MaxSim: identical scores to the slicing form, with the
# slicing moved out of the per-pair expression (ingest-side layout).
# ---------------------------------------------------------------------------


def test_maxsim_presplit_matches_sliced_form(spark):
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxsim_score,
        maxsim_score_presplit,
        split_slots,
    )

    rows = [
        (1, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8]),
        (2, [0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]),
        (3, [1.0, 0.0, -1.0, 0.5, 0.25, -0.25, 2.0, -2.0]),
    ]
    df = spark.createDataFrame(rows, "id int, v array<float>")
    q = [0.3, -0.1, 0.9, 0.2, 0.0, 0.4, -0.6, 0.7]
    qcol = F.lit(q).cast("array<float>")
    m = 4

    sliced = {
        r["id"]: r["s"]
        for r in df.select(
            "id", F.round(maxsim_score("v", qcol, m), 6).alias("s")
        ).collect()
    }
    presplit = {
        r["id"]: r["s"]
        for r in df.select(
            "id", split_slots("v", m).alias("slots")
        )
        .select(
            "id",
            F.round(
                maxsim_score_presplit("slots", split_slots(qcol, m)), 6
            ).alias("s"),
        )
        .collect()
    }
    assert sliced == presplit


def test_maxsim_presplit_plan_has_no_per_pair_slicing(spark):
    """The production claim: pre-splitting moves ALL slice calls out
    of the scoring expression. The sliced form embeds 2*m^2 slices in
    the per-pair expression; the presplit form's scorer embeds zero
    (its slices live in the per-ROW slot projections below the join).
    """
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxsim_score,
        maxsim_score_presplit,
        split_slots,
    )

    rows = [(i, [float(i + j) for j in range(8)]) for i in range(4)]
    corpus = spark.createDataFrame(rows, "id int, v array<float>")
    qdf = spark.createDataFrame([(9, [0.5] * 8)], "qid int, qv array<float>")
    m = 4

    unsplit = (
        corpus.crossJoin(F.broadcast(qdf))
        .select("id", maxsim_score("v", "qv", m).alias("s"))
    )
    presplit = (
        corpus.select("id", split_slots("v", m).alias("d_slots"))
        .crossJoin(
            F.broadcast(qdf.select(split_slots("qv", m).alias("q_slots")))
        )
        .select("id", maxsim_score_presplit("d_slots", "q_slots").alias("s"))
    )
    plan_unsplit = unsplit._jdf.queryExecution().optimizedPlan().toString()
    plan_presplit = presplit._jdf.queryExecution().optimizedPlan().toString()
    # Sliced form: the per-pair scoring expression (the Project
    # computing alias `s`, ABOVE the join) contains slice calls —
    # re-evaluated for every (i, j) slot pair of every row pair.
    unsplit_scoring = [
        ln for ln in plan_unsplit.splitlines() if " AS s" in ln
    ]
    assert unsplit_scoring and any("slice(" in ln for ln in unsplit_scoring)
    # Presplit form: the scoring expression is slice-FREE; every
    # slice call sits in a per-ROW slot projection below the join
    # (lines defining d_slots / q_slots), evaluated once per input
    # row, never per pair.
    presplit_scoring = [
        ln for ln in plan_presplit.splitlines() if " AS s" in ln
    ]
    assert presplit_scoring and all(
        "slice(" not in ln for ln in presplit_scoring
    )
    slot_defs = [
        ln
        for ln in plan_presplit.splitlines()
        if "AS d_slots" in ln or "AS q_slots" in ln
    ]
    assert slot_defs and all("slice(" in ln for ln in slot_defs)


# ---------------------------------------------------------------------------
# Binary (1-bit) quantization: packing equivalence, Hamming, and the
# prescreen+rerank recall contract.
# ---------------------------------------------------------------------------


def test_binary_quantize_matches_driver_packing(spark):
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        binary_quantize,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        pack_sign_bits,
    )

    vecs = [
        [0.5, -0.2, 0.0, 1.0] * 16,          # 64 dims, 2 words
        [-1.0] * 33 + [1.0] * 31,            # crosses the word boundary
        [1.0] * 32,                          # all ones -> 2^32 - 1 (needs long)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id int, v array<float>"
    )
    got = {r["id"]: list(r["b"]) for r in df.select("id", binary_quantize("v").alias("b")).collect()}
    for i, v in enumerate(vecs):
        assert got[i] == pack_sign_bits(v), i
    assert got[2][0] == 2**32 - 1  # top bit set without overflow


def test_hamming_distance_counts_flipped_bits(spark):
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        hamming_distance,
    )

    df = spark.createDataFrame([(1,)], "id int")
    d = df.select(
        hamming_distance(
            F.lit([0b1010, 0b1111]).cast("array<bigint>"),
            F.lit([0b0110, 0b1110]).cast("array<bigint>"),
        ).alias("h")
    ).first()["h"]
    assert d == 3  # 1010^0110 = 1100 (2 bits) + 1111^1110 = 0001 (1 bit)


def test_binary_prescreen_recall_vs_exact(spark):
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query,
        knn_query_binary,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
        load_table,
    )

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 7)
    exact = [
        r["vec_id"] for r in knn_query(corpus, qvec, k=5, id_col="vec_id").collect()
    ]
    approx = [
        r["vec_id"]
        for r in knn_query_binary(
            corpus, qvec, k=5, id_col="vec_id", prescreen_factor=8
        ).collect()
    ]
    # SimHash bound: high-cosine neighbors survive a 40-candidate
    # Hamming prescreen on 64 sign bits with high probability
    assert len(set(exact) & set(approx)) >= 3, (exact, approx)


def test_binary_quantize_non_multiple_of_32_dims(spark):
    """dim % 32 != 0 must pad the last word with 0 bits, not raise —
    Spark 4's default ANSI mode errors on out-of-range element_at, so
    the overhang indexes must never be evaluated."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        binary_quantize,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        pack_sign_bits,
    )

    vecs = [[1.0] * 33, [1.0, -1.0] * 25, [0.5] * 100]  # 33, 50, 100 dims
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id int, v array<float>"
    )
    got = {
        r["id"]: list(r["b"])
        for r in df.select("id", binary_quantize("v").alias("b")).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == pack_sign_bits(v), i


def test_binary_quantize_empty_vector_yields_empty_words(spark):
    """A zero-length embedding must quantize to an EMPTY word array,
    not raise: n_words=0 makes sequence(0, n_words-1) the DESCENDING
    [0, -1], and word -1's idx <= 0 would reach element_at and raise
    under Spark 4 ANSI — one empty row would abort a whole
    knn_query_binary scan without the guard."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        binary_quantize,
    )

    df = spark.createDataFrame(
        [(0, []), (1, [1.0] * 33), (2, None)], "id int, v array<float>"
    )
    got = {
        r["id"]: (None if r["b"] is None else list(r["b"]))
        for r in df.select("id", binary_quantize("v").alias("b")).collect()
    }
    assert got[0] == []
    assert len(got[1]) == 2 and got[1][0] != 0
    assert got[2] is None  # NULL vector stays NULL, does not raise


def test_maxsim_mismatched_slot_widths_yield_null_not_garbage(spark):
    """Documented contract: unequal slot widths null the score (the
    cosine's zip_with pads with NULLs) — callers must keep equal
    widths; the score must never silently truncate."""
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxsim_score,
    )

    df = spark.createDataFrame([([1.0] * 8, [1.0] * 4)], "d array<float>, q array<float>")
    row = df.select(maxsim_score("d", "q", 2).alias("s")).first()
    assert row["s"] is None


def test_matryoshka_prescreen_recall_vs_exact(spark):
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query,
        knn_query_matryoshka,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
        load_table,
    )

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 7)
    exact = [
        r["vec_id"] for r in knn_query(corpus, qvec, k=5, id_col="vec_id").collect()
    ]
    approx = [
        r["vec_id"]
        for r in knn_query_matryoshka(
            corpus, qvec, k=5, id_col="vec_id", prefix_dim=16, prescreen_factor=8
        ).collect()
    ]
    # a 16/64-dim prefix keeps most true neighbors in a 40-candidate cut
    assert len(set(exact) & set(approx)) >= 3, (exact, approx)
    # degenerate bounds validate loudly
    import pytest

    with pytest.raises(ValueError, match="prefix_dim"):
        knn_query_matryoshka(corpus, qvec, k=5, id_col="vec_id", prefix_dim=999)


def test_literal_scores_bit_identical(spark):
    """The unrolled literal-query forms (r15: the JIT-deopt-storm fix
    — see functions/vector.py) must be BIT-identical to the
    zip_with/aggregate forms they replace, unrounded: both fold
    left-to-right in IEEE double, so any divergence is a fold-order
    bug that would move oracle hashes. Covers cosine/l2/dot on
    uniform dims, the shorter-row NULL edge, and packed-word hamming
    (both word counts)."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        binary_quantize,
        cosine_similarity,
        cosine_similarity_literal,
        dot_product,
        dot_product_literal,
        hamming_distance,
        hamming_distance_literal,
        l2_distance,
        l2_distance_literal,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        pack_sign_bits,
    )

    dim = 17  # odd, not a power of two
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
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
        / 1000.0,
    )
    df = spark.range(500).select("id", vec.alias("embedding")).cache()
    q = list(df.filter(F.col("id") == 3).first()["embedding"])
    qlit = F.array(*[F.lit(float(x)) for x in q])

    checks = df.select(
        (
            cosine_similarity("embedding", qlit)
            == cosine_similarity_literal("embedding", q)
        ).alias("cos"),
        (l2_distance("embedding", qlit) == l2_distance_literal("embedding", q)).alias(
            "l2"
        ),
        (
            dot_product("embedding", qlit) == dot_product_literal("embedding", q)
        ).alias("dot"),
        (
            hamming_distance(
                binary_quantize("embedding"),
                F.array(
                    *[F.lit(int(w)).cast("long") for w in pack_sign_bits(q)]
                ),
            )
            == hamming_distance_literal(
                binary_quantize("embedding"), pack_sign_bits(q)
            )
        ).alias("ham"),
    )
    agg = checks.agg(
        *[F.sum(F.when(F.col(c), 0).otherwise(1)).alias(c) for c in ("cos", "l2", "dot", "ham")]
    ).first()
    assert all(agg[c] == 0 for c in ("cos", "l2", "dot", "ham")), agg

    # shorter-row edge: both forms yield NULL (try_element_at past the
    # end poisons the sum exactly like zip_with's NULL padding)
    short = spark.createDataFrame([([0.5, 0.25],)], "embedding array<double>")
    row = short.select(
        cosine_similarity("embedding", qlit).alias("hof"),
        cosine_similarity_literal("embedding", q).alias("lit"),
    ).first()
    assert row["hof"] is None and row["lit"] is None
    df.unpersist()
