"""Unit tests for lexical-retrieval infrastructure
(operators/retrieval.py) not already pinned by the oracle registry."""

from __future__ import annotations


def test_inverted_postings_rows_and_stats(spark):
    """Postings are rows (term, doc, tf) with exact in-doc term
    frequency; term_stats carries (df, total_tf); min_df prunes BOTH
    outputs consistently."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        inverted_postings,
    )

    df = spark.createDataFrame(
        [
            (1, "spark spark joins data"),
            (2, "spark data"),
            (3, "joins unique"),
        ],
        "doc_id int, text string",
    )
    postings, stats = inverted_postings(df, id_col="doc_id", text_col="text")
    p = {(r["term"], r["doc_id"]): r["tf"] for r in postings.collect()}
    s = {r["term"]: (r["df"], r["total_tf"]) for r in stats.collect()}
    assert p[("spark", 1)] == 2 and p[("spark", 2)] == 1
    assert s["spark"] == (2, 3)
    assert s["joins"] == (2, 2)
    assert s["unique"] == (1, 1)

    postings2, stats2 = inverted_postings(
        df, id_col="doc_id", text_col="text", min_df=2
    )
    terms2 = {r["term"] for r in stats2.collect()}
    assert terms2 == {"spark", "data", "joins"}  # 'unique' pruned
    assert {r["term"] for r in postings2.collect()} == terms2


def test_positional_postings_and_phrase_match(spark):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick brown fox"),
            (2, "quick brown quick fox"),
            (3, "the the the"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    idx = positional_postings(docs, id_col="doc_id", text_col="text")
    # positions are 1-based per doc, one row per occurrence
    rows = {(r["doc_id"], r["pos"]): r["term"] for r in idx.collect()}
    assert rows[(1, 1)] == "the" and rows[(1, 4)] == "fox"
    assert (4, 1) not in rows  # empty doc emits nothing

    # 3-term phrase: doc 1 has it twice, doc 2 zero times
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match(
            idx, ["quick", "brown", "fox"], id_col="doc_id"
        ).collect()
    }
    assert got == {1: 2}
    # single-term phrase degrades to occurrence count
    got1 = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match(idx, ["the"], id_col="doc_id").collect()
    }
    assert got1 == {1: 2, 3: 3}
    # repeated-term phrase must respect positions, not bags
    gotrep = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match(idx, ["the", "the"], id_col="doc_id").collect()
    }
    assert gotrep == {3: 2}
    # absent phrase -> empty
    assert phrase_match(idx, ["fox", "trot"], id_col="doc_id").count() == 0
    import pytest

    with pytest.raises(ValueError):
        phrase_match(idx, [], id_col="doc_id")


def test_proximity_match_within_distance(spark):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        positional_postings,
        proximity_match,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha x x beta"),       # dist 3
            (2, "alpha x x x beta"),     # dist 4 - excluded
            (3, "beta alpha"),           # dist 1, order-free
            (4, "alpha alpha beta"),     # two pairs within 3
        ],
        ["doc_id", "text"],
    )
    idx = positional_postings(docs, id_col="doc_id", text_col="text")
    got = {
        r["doc_id"]: r["n_pairs"]
        for r in proximity_match(
            idx, "alpha", "beta", max_distance=3, id_col="doc_id"
        ).collect()
    }
    assert got == {1: 1, 3: 1, 4: 2}
    # same-term proximity: unordered distinct pairs
    same = {
        r["doc_id"]: r["n_pairs"]
        for r in proximity_match(
            idx, "alpha", "alpha", max_distance=3, id_col="doc_id"
        ).collect()
    }
    assert same == {4: 1}
    import pytest

    with pytest.raises(ValueError):
        proximity_match(idx, "a", "b", max_distance=0)


def test_positional_index_serve_pushes_term_filters(spark, tmp_path):
    """The from-index serve contract (text_phrase_search_from_index /
    text_proximity_search_from_index): reading the PERSISTED
    term-clustered postings, the per-term filters reach the parquet
    scan as PushedFilters — the scan reads the query terms' rows, not
    the corpus — and the served verdicts equal the in-memory index's."""
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        phrase_match,
        positional_postings,
        proximity_match,
    )

    docs = spark.createDataFrame(
        [
            (1, "vector search with a fast table scan and a vector query plan"),
            (2, "query the vector store"),
            (3, "nothing relevant here"),
        ],
        "doc_id int, text string",
    )
    out = str(tmp_path / "postings")
    (
        positional_postings(docs, id_col="doc_id", text_col="text")
        .repartition(4, "term")
        .sortWithinPartitions("term", "doc_id", "pos")
        .write.mode("overwrite")
        .parquet(out)
    )
    idx = spark.read.parquet(out)

    prox = proximity_match(idx, "vector", "query", max_distance=3, id_col="doc_id")
    plan = prox._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(term," in plan, plan
    phrase = phrase_match(idx, ["fast", "table", "scan"], id_col="doc_id")
    plan_ph = phrase._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(term," in plan_ph, plan_ph

    # lossless substitute: persisted-index verdicts == in-memory's
    mem = positional_postings(docs, id_col="doc_id", text_col="text")
    got = {r["doc_id"]: r["n_pairs"] for r in prox.collect()}
    want = {
        r["doc_id"]: r["n_pairs"]
        for r in proximity_match(
            mem, "vector", "query", max_distance=3, id_col="doc_id"
        ).collect()
    }
    assert got == want and got[2] == 1


def test_phrase_bm25_from_index_filter_then_rank(spark):
    """Quoted-query composition: output docs are EXACTLY the phrase
    matches, and each candidate's BM25 equals its UNRESTRICTED score
    (the candidates semi-join must not re-weight the corpus length
    model)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        bm25_from_index,
        inverted_postings,
        phrase_bm25_from_index,
        phrase_match,
        positional_postings,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
        load_table,
    )

    from .conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    pos = positional_postings(d, id_col="doc_id", text_col="text")
    postings, stats = inverted_postings(d, id_col="doc_id", text_col="text")
    # the sf0.001 smoke fixture lacks "fast table scan" (that's an
    # sf0.01 phrase); "big order scan" occurs in 9 smoke docs
    phrase = ["big", "order", "scan"]

    out = phrase_bm25_from_index(
        pos, postings, stats, phrase, id_col="doc_id"
    )
    got = {r["doc_id"]: (r["n_matches"], r["bm25"]) for r in out.collect()}
    assert got, "fixture should contain the phrase"

    want_matches = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match(pos, phrase, id_col="doc_id").collect()
    }
    assert {k: v[0] for k, v in got.items()} == want_matches

    unrestricted = {
        r["doc_id"]: r["bm25"]
        for r in bm25_from_index(
            postings, stats, phrase, id_col="doc_id"
        ).collect()
    }
    for doc, (_n, score) in got.items():
        assert score == unrestricted[doc], doc


def test_phrase_bm25_batch_equals_single_path(spark):
    """phrase_bm25_from_index_batch must reproduce each phrase's
    single-query rows byte-for-byte (same match counts, same BM25 —
    the shared corpus length model), and the batch rank/fuse twins
    must agree with their single-list forms."""
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        inverted_postings,
        phrase_bm25_from_index,
        phrase_bm25_from_index_batch,
        positional_postings,
        rrf_fuse,
        rrf_fuse_batch,
        top_ranks,
        top_ranks_batch,
    )

    d = spark.createDataFrame(
        [
            (1, "fast table scan beats slow table scan on a fast table"),
            (2, "sort column then scan the sorted column fast"),
            (3, "a fast table scan and a sort column walk into a bar"),
            (4, "nothing relevant here at all just filler words"),
            (5, "fast fast fast table scan scan"),
        ],
        "doc_id int, text string",
    )
    pos = positional_postings(d, id_col="doc_id", text_col="text")
    postings, stats = inverted_postings(d, id_col="doc_id", text_col="text")
    phrases = [["fast", "table", "scan"], ["sort", "column"]]
    batch = phrase_bm25_from_index_batch(
        pos, postings, stats, phrases, id_col="doc_id"
    )
    for qi, ph in enumerate(phrases):
        single = {
            (r["doc_id"]): (r["n_matches"], r["bm25"])
            for r in phrase_bm25_from_index(
                pos, postings, stats, ph, id_col="doc_id"
            ).collect()
        }
        got = {
            r["doc_id"]: (r["n_matches"], r["bm25"])
            for r in batch.filter(F.col("qid") == qi).collect()
        }
        assert got == single, (qi, got, single)
    # repeated-term phrase: the distinct-offset match test stays exact
    rep = phrase_bm25_from_index_batch(
        pos, postings, stats, [["fast", "fast"]], id_col="doc_id"
    ).collect()
    assert {r["doc_id"]: r["n_matches"] for r in rep} == {5: 2}
    # rank + fuse twins agree per qid
    tb = top_ranks_batch(batch, "bm25", id_col="doc_id", k=2)
    for qi, ph in enumerate(phrases):
        single_rank = {
            r["doc_id"]: r["rank"]
            for r in top_ranks(
                phrase_bm25_from_index(
                    pos, postings, stats, ph, id_col="doc_id"
                ),
                "bm25",
                id_col="doc_id",
                k=2,
            ).collect()
        }
        got_rank = {
            r["doc_id"]: r["rank"]
            for r in tb.filter(F.col("qid") == qi).collect()
        }
        assert got_rank == single_rank
    fused_b = rrf_fuse_batch(
        tb.select("qid", "doc_id", "rank"),
        tb.select("qid", "doc_id", "rank"),
        id_col="doc_id",
    )
    for qi in (0, 1):
        one = tb.filter(F.col("qid") == qi).select("doc_id", "rank")
        single_f = {
            r["doc_id"]: r["rrf"]
            for r in rrf_fuse(one, one, id_col="doc_id").collect()
        }
        got_f = {
            r["doc_id"]: r["rrf"]
            for r in fused_b.filter(F.col("qid") == qi).collect()
        }
        assert got_f == single_f
