"""Lexical and hybrid retrieval over hydrated corpora.

The reference hydrates a vector store to serve retrieval (reference
README.md:5 — "providing context to a Large Language Model"), and
production retrieval is rarely vector-only: the standard recipe is a
lexical scorer (BM25) fused with the vector ranks via reciprocal-rank
fusion. Both pieces are plain relational algebra, so they run as
Catalyst plans instead of a search-engine sidecar:

- ``bm25_scores`` — Okapi BM25 (Lucene-style idf) for a fixed term
  set: three map-side-combinable aggregations (term frequency, doc
  frequency, doc length), two single-row globals (corpus size, avg
  doc length) broadcast into the scoring projection. No shuffle
  carries anything wider than (doc, term) counts.
- ``top_ranks`` — deterministic (rounded score, id) candidate
  ranking: TakeOrderedAndProject bounds the candidate set FIRST, the
  row_number window then runs over <= k rows in one task — the
  global-sort-free shape that survives a 100 TB corpus.
- ``rrf_fuse`` — reciprocal-rank fusion of two candidate lists:
  full-outer join on id, score = sum over lists of 1/(k + rank).
  Integer ranks in, rational arithmetic out — engine-portable to the
  last bit, which is what makes hybrid search oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
    normalize_text,
    tokens,
)


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 4,
) -> DataFrame:
    """BM25 score per document for ``query_terms`` (docs matching no
    term emit no row). Lucene idf: ln((N - df + 0.5)/(df + 0.5) + 1).

    Returns (id_col, bm25) with bm25 rounded to ``decimals``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # localCheckpoint (lazy): the corpus-wide tokenize+explode is
    # consumed by THREE branches (doc lengths, global stats via dl,
    # term frequencies) — without materialization each branch re-runs
    # it; the checkpoint stores the flat rows once and frees with the
    # DataFrame (no session-wide cache entry to leak)
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(normalize_text(text_col))).alias("_t"),
    ).localCheckpoint(eager=False)
    dl = tok.groupBy("_id").agg(F.count(F.lit(1)).alias("_dl")).localCheckpoint(
        eager=False
    )
    globals_ = dl.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )
    tf = (
        tok.filter(F.col("_t").isin(list(query_terms)))
        .groupBy("_id", "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    tf_part = (
        F.col("_tf")
        * (k1 + 1.0)
        / (
            F.col("_tf")
            + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "_t")
        .join(dl, "_id")
        .crossJoin(F.broadcast(globals_))
        .groupBy("_id")
        .agg(F.round(F.sum(idf * tf_part), decimals).alias("bm25"))
        .select(F.col("_id").alias(id_col), "bm25")
    )


def top_ranks(
    scored: DataFrame,
    score_col: str,
    *,
    id_col: str,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """(id, rank) for the top ``k`` rows by (score, id): the candidate
    cut is a TakeOrderedAndProject (no global sort), the rank window
    then covers <= k rows in a single bounded task. Deterministic
    given rounded scores."""
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col(id_col).asc(),
    ]
    from pyspark.sql import Window

    head = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return head.select(
        id_col, score_col, F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    *,
    id_col: str = "id",
    k: int = 60,
    decimals: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of two (id, rank) candidate lists:
    rrf = sum over lists containing the id of 1/(k + rank). Ids
    missing from a list contribute nothing for it (standard RRF over
    bounded candidate lists). Returns (id, rrf) rounded."""
    ra = a.select(F.col(id_col).alias("_id"), F.col("rank").alias("_ra"))
    rb = b.select(F.col(id_col).alias("_id"), F.col("rank").alias("_rb"))
    joined = ra.join(rb, "_id", "full_outer")
    contrib = F.coalesce(1.0 / (F.lit(k) + F.col("_ra")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(k) + F.col("_rb")), F.lit(0.0)
    )
    return joined.select(
        F.col("_id").alias(id_col), F.round(contrib, decimals).alias("rrf")
    )
