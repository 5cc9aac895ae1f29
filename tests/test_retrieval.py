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
