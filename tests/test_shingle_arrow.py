"""The r15 vectorized shingle pass (`_shingle_arrow_fn` via mapInArrow)
must reproduce the original `word_shingles` expression row-for-row —
including the null / empty / whitespace-only / short-doc contracts —
because every minhash / band-index / dup-ngram consumer builds on it
and the DuckDB oracles pin the downstream values."""

import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
    word_shingles,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
    _shingle_rows,
)

EDGE_TEXTS = [
    None,
    "",
    "   ",
    "\t\n  \r",
    "one",
    "one two",
    "one two three",
    "one two three four five",
    "  Mixed   CASE \t tokens\nhere  ",
    "dup dup dup dup",
    "a b a b a b",
    "Ünïcode Tökens ÉÉ ß İ",
    "nbsp inside token here now",
    "punct, punct; .punct! ?",
    "x " * 30,
]


def _expr_rows(spark, rows, n):
    """The pre-r15 expression path, verbatim."""
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return sorted(
        (r["_id"], r["shingle"])
        for r in df.select(
            F.col("doc_id").alias("_id"),
            F.explode(F.array_distinct(word_shingles("text", n))).alias("shingle"),
        ).collect()
    )


def _arrow_rows(spark, rows, n):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return sorted(
        (r["_id"], r["shingle"])
        for r in _shingle_rows(
            df, "doc_id", "text", n, with_hash=False
        ).collect()
    )


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_shingle_arrow_matches_expression_edge_cases(spark, n):
    rows = [(i, t) for i, t in enumerate(EDGE_TEXTS)]
    assert _arrow_rows(spark, rows, n) == _expr_rows(spark, rows, n)


@given(
    texts=st.lists(
        st.text(
            alphabet=string.ascii_letters + "  \t\n.,!?-éü",
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_shingle_arrow_matches_expression_random(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    assert _arrow_rows(spark, rows, 3) == _expr_rows(spark, rows, 3)


def test_shingle_arrow_hash_column_unchanged(spark):
    """with_hash=True must produce the identical md5-mod-P values the
    oracle family computes (the hash is still a JVM projection)."""
    rows = [(i, t) for i, t in enumerate(EDGE_TEXTS)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["_id"], r["shingle"]): r["h"]
        for r in _shingle_rows(df, "doc_id", "text", 3).collect()
    }
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        MINHASH_P,
        hash64,
    )

    want = {
        (r["_id"], r["shingle"]): r["h"]
        for r in df.select(
            F.col("doc_id").alias("_id"),
            F.explode(F.array_distinct(word_shingles("text", 3))).alias("shingle"),
        )
        .withColumn("h", F.pmod(hash64(F.col("shingle")), F.lit(MINHASH_P)))
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("k", [2, 8])
def test_window_rows_matches_expression(spark, k):
    """The Arrow positional-window pass must emit exactly the
    (id, pos0, hash) rows the posexplode/transform/slice expression
    produced (ExactSubstr coverage + removal build on it)."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        normalize_text,
        tokens,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        _window_rows,
    )

    rows = [(i, t) for i, t in enumerate(EDGE_TEXTS)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    toks = (
        df.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text"))
        .select("_id", tokens(normalize_text("_text")).alias("_t"))
        .filter(F.size("_t") > 0)
        .select("_id", "_t", F.size("_t").alias("n_tokens"))
    )
    want = sorted(
        (r["_id"], r["_pos0"], r["_wh"])
        for r in toks.filter(F.col("n_tokens") >= k)
        .select(
            "_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tokens") - F.lit(k - 1)),
                    lambda i: hash64(F.concat_ws(" ", F.slice("_t", i, k))),
                )
            ).alias("_pos0", "_wh"),
        )
        .collect()
    )
    got = sorted(
        (r["_id"], r["_pos0"], r["_wh"]) for r in _window_rows(toks, k).collect()
    )
    assert got == want and len(got) > 0


def test_engine_auto_small_input_uses_expr_same_rows(spark):
    """engine="auto" must resolve small inputs to the expression path
    (no BatchEvalPython/ArrowEvalPython/MapInArrow node in the plan)
    and still emit exactly the rows the arrow engine emits — the r15
    crossover fix for the fixed Python-boundary cost on small corpora."""
    rows = [(i, t) for i, t in enumerate(EDGE_TEXTS)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    auto = _shingle_rows(df, "doc_id", "text", 3, engine="auto", cache=False)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInArrow" not in plan
    got = sorted((r["_id"], r["shingle"], r["h"]) for r in auto.collect())
    want = sorted(
        (r["_id"], r["shingle"], r["h"])
        for r in _shingle_rows(
            df, "doc_id", "text", 3, engine="arrow", cache=False
        ).collect()
    )
    assert got == want and len(got) > 0


def test_window_rows_expr_engine_matches_arrow(spark):
    """The expr window engine (small-input branch of the ExactSubstr
    operators) must emit exactly the arrow engine's rows."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        normalize_text,
        tokens,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        _window_rows,
    )

    rows = [(i, t) for i, t in enumerate(EDGE_TEXTS)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    toks = (
        df.select(F.col("doc_id").alias("_id"), F.col("text").alias("_text"))
        .select("_id", tokens(normalize_text("_text")).alias("_t"))
        .filter(F.size("_t") > 0)
        .select("_id", "_t", F.size("_t").alias("n_tokens"))
    )
    for k in (2, 8):
        got = sorted(
            (r["_id"], r["_pos0"], r["_wh"])
            for r in _window_rows(toks, k, engine="expr").collect()
        )
        want = sorted(
            (r["_id"], r["_pos0"], r["_wh"])
            for r in _window_rows(toks, k, engine="arrow").collect()
        )
        assert got == want and len(got) > 0


def test_minhash_pairs_engine_crossover_identical(spark, monkeypatch):
    """minhash_lsh_pairs must produce EXACTLY the same pairs and
    jaccard values whichever engine the auto crossover resolves —
    including edge texts, planted duplicates, and near-dups — because
    the threshold switches engines by corpus size and the DuckDB
    oracle pins the values."""
    import vector_databases___hydrate_chroma_db_collection_spark.operators.dedup as dd

    texts = [(i, t) for i, t in enumerate(EDGE_TEXTS)]
    # planted exact + near dups over a tiny vocabulary
    base = 100
    for i in range(60):
        words = [f"w{(i * 7 + j) % 40}" for j in range(12)]
        texts.append((base + 2 * i, " ".join(words)))
        twin = list(words)
        if i % 3 == 0:
            twin[-1] = "changed"  # near-dup
        texts.append((base + 2 * i + 1, " ".join(twin)))
    df = spark.createDataFrame(texts, "doc_id bigint, text string")

    def run():
        res = dd.minhash_lsh_pairs(
            df, id_col="doc_id", text_col="text", n=3,
            num_hashes=16, bands=8, threshold=0.3,
        )
        rows = sorted(
            (r["id_a"], r["id_b"], r["jaccard"]) for r in res.collect()
        )
        dd.release_cache(res)
        return rows

    monkeypatch.setattr(dd, "_ARROW_MIN_ROWS", 1)  # force per-doc arrow
    got_arrow = run()
    monkeypatch.setattr(dd, "_ARROW_MIN_ROWS", 10**9)  # force flat expr
    got_flat = run()
    assert got_arrow == got_flat and len(got_arrow) >= 60


def test_minhash_arrow_engine_string_ids(spark, monkeypatch):
    """String doc ids must survive the arrow shingle engine inside
    minhash_lsh_pairs (forced via the crossover threshold)."""
    import vector_databases___hydrate_chroma_db_collection_spark.operators.dedup as dd

    rows = [(f"doc-{i}", "alpha beta gamma delta epsilon") for i in range(8)]
    rows += [(f"uniq-{i}", f"one two three four {i} five six") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    monkeypatch.setattr(dd, "_ARROW_MIN_ROWS", 1)
    res = dd.minhash_lsh_pairs(
        df, id_col="doc_id", text_col="text", n=3,
        num_hashes=16, bands=8, threshold=0.9,
    )
    got = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in res.collect())
    dd.release_cache(res)
    # the 8 identical docs form all 28 jaccard-1.0 pairs
    assert len(got) == 28 and all(j == 1.0 for _, _, j in got)


def test_shingle_arrow_string_ids(spark):
    df = spark.createDataFrame(
        [("a", "x y z w"), ("b", None), ("c", "")], "doc_id string, text string"
    )
    rows = sorted(
        (r["_id"], r["shingle"])
        for r in _shingle_rows(df, "doc_id", "text", 3, with_hash=False).collect()
    )
    assert rows == [("a", "x y z"), ("a", "y z w"), ("b", "")]
