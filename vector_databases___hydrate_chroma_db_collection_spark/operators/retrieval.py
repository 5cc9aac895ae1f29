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


def inverted_postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Build an inverted index over the corpus — the data structure
    behind every lexical search engine, materialized the only way
    that survives 100 TB: postings as DISTRIBUTED ROWS, never as
    collected arrays (a per-term ``collect_list`` would put a
    stop-word's entire posting list — potentially most of the corpus
    — into one struct in one task; as rows, a hot term is ordinary
    partition skew that AQE splits).

    Returns ``(postings, term_stats)``:
    - postings:   (term, id_col, tf) — one row per distinct
      (term, document) pair, tf = in-document term frequency. This
      IS the index: a searcher filters ``term isin query`` and
      aggregates per document (exactly what ``bm25_scores`` computes
      on the fly; building once amortizes it across queries).
    - term_stats: (term, df, total_tf) — the per-term dictionary
      (document frequency + corpus frequency), e.g. for idf, vocab
      pruning, or stop-word discovery.

    ``min_df`` drops hapax/rare terms from BOTH outputs (index-size
    control; the dictionary is filtered with a broadcast semi-join so
    the postings shuffle happens once). Plan: one tokenize + explode
    -> (term, id) hash-agg -> term hash-agg; two key-partitioned
    shuffles, all aggregates map-side combinable."""
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(normalize_text(text_col))).alias("term"),
    )
    postings = tok.groupBy("term", "_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    if min_df > 1:
        stats = stats.filter(F.col("df") >= min_df)
        postings = postings.join(
            F.broadcast(stats.select("term")), "term", "semi"
        )
    return postings.withColumnRenamed("_id", id_col), stats


def positional_postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """POSITIONAL inverted index: one row per token OCCURRENCE —
    ``(term, id_col, pos)`` with 1-based position — the structure
    phrase and proximity queries need (``inverted_postings``'s
    (term, doc, tf) rows can answer "which docs contain X" but not
    "where"). Positions stay as distributed rows, never per-term
    arrays: a stop-word's occurrence list is partition skew AQE can
    split, not a giant struct in one task. Rows = corpus tokens —
    the same cardinality the tokenizer already produced, so building
    this index costs one tokenize + posexplode, no shuffle at all
    (persist partitioned/sorted by term to get pushdown on serve)."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(normalize_text(text_col))).alias("_p0", "term"),
    ).select("term", F.col("_id").alias(id_col), (F.col("_p0") + 1).alias("pos"))


def phrase_match(
    postings: DataFrame,
    phrase_terms: list[str],
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search over a positional index: documents where
    ``phrase_terms`` occur CONSECUTIVELY, with the match count.
    Output: (id_col, n_matches), one row per matching doc.

    The classic positional-intersection plan: each term's postings
    are filtered FIRST (term predicates push into the index scan —
    each join side carries one term's occurrences, not the corpus),
    then successive equi-joins on (doc, pos - offset) keep only
    positions where term_i sits exactly i tokens after term_0. k-1
    hash joins for a k-term phrase, each keyed on (doc, pos) — a hot
    term is ordinary join skew (AQE-splittable), and join input sizes
    shrink monotonically as the prefix constrains. Single-term
    phrases degrade to an occurrence count per doc."""
    if not phrase_terms:
        raise ValueError("phrase_terms must be non-empty")
    base = postings.filter(F.col("term") == phrase_terms[0]).select(
        F.col(id_col).alias("_id"), F.col("pos").alias("_pos")
    )
    for i, t in enumerate(phrase_terms[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            F.col(id_col).alias("_id"),
            (F.col("pos") - i).alias("_pos"),
        )
        base = base.join(nxt, ["_id", "_pos"])
    return (
        base.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .select(F.col("_id").alias(id_col), "n_matches")
    )


def proximity_match(
    postings: DataFrame,
    term_a: str,
    term_b: str,
    *,
    max_distance: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Proximity search ("terms within N tokens", Lucene slop): count
    of (pos_a, pos_b) occurrence pairs with
    ``0 < |pos_a - pos_b| <= max_distance`` per document. Output:
    (id_col, n_pairs), one row per doc with >= 1 qualifying pair.

    Plan: both sides filter to ONE term's postings first (pushdown on
    a persisted index), then an equi-join on the doc id with the
    distance test as a residual filter — a per-document band join
    whose fan-out is bounded by tf_a x tf_b within one doc, never
    cross-corpus. The same-term case (term_a == term_b) counts
    unordered distinct pairs via pos_a < pos_b."""
    if max_distance < 1:
        raise ValueError("max_distance must be >= 1")
    pa = postings.filter(F.col("term") == term_a).select(
        F.col(id_col).alias("_id"), F.col("pos").alias("_pa")
    )
    pb = postings.filter(F.col("term") == term_b).select(
        F.col(id_col).alias("_id"), F.col("pos").alias("_pb")
    )
    dist_ok = (
        F.abs(F.col("_pa") - F.col("_pb")) <= max_distance
    )
    pair_ok = (
        (F.col("_pa") < F.col("_pb"))
        if term_a == term_b
        else (F.col("_pa") != F.col("_pb"))
    )
    return (
        pa.join(pb, "_id")
        .filter(dist_ok & pair_ok)
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(F.col("_id").alias(id_col), "n_pairs")
    )


def bm25_from_index(
    postings: DataFrame,
    term_stats: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 4,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """BM25 served FROM a materialized inverted index
    (``inverted_postings`` output) instead of from raw text — the
    amortization the index exists for: the corpus-wide tokenize +
    explode happens at BUILD time, and every query thereafter touches
    only the postings rows of its own terms (a filter the parquet
    reader turns into a predicate-pushdown scan when the index is
    persisted) plus the tiny per-term dictionary.

    Identical scores to ``bm25_scores`` when the index was built with
    ``min_df=1``: doc length is ``sum(tf)`` over the doc's postings
    (every token occurrence is counted by exactly one (term, doc)
    row), corpus size and avgdl derive from the same doc-length rows,
    df comes from ``term_stats``. With ``min_df > 1`` the pruned
    terms' occurrences drop out of the length model — prune AFTER
    scoring-relevant terms are safe, or keep a separate length table.

    ``candidates`` (optional single-column id frame): restrict
    SCORING to those documents — the filter-then-rank half of a
    quoted query (``phrase_bm25_from_index``). The restriction is a
    semi-join on the tf side only; the length model (n_docs, avgdl,
    per-doc dl) stays corpus-wide, so a candidate's score is
    IDENTICAL to its unrestricted score — filtering never re-weights.

    Returns (id_col, bm25) rounded to ``decimals``; docs matching no
    query term emit no row."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # lazy localCheckpoint: doc lengths feed both the globals and the
    # scoring join (same two-consumer shape as bm25_scores)
    dl = (
        postings.groupBy(F.col(id_col).alias("_id"))
        .agg(F.sum("tf").alias("_dl"))
        .localCheckpoint(eager=False)
    )
    globals_ = dl.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )
    tf = postings.filter(F.col("term").isin(list(query_terms))).select(
        F.col(id_col).alias("_id"), "term", F.col("tf").alias("_tf")
    )
    if candidates is not None:
        cand = candidates.select(
            F.col(candidates.columns[0]).alias("_id")
        )
        tf = tf.join(cand, "_id", "left_semi")
    dfreq = term_stats.filter(
        F.col("term").isin(list(query_terms))
    ).select("term", F.col("df").alias("_df"))
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
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "_id")
        .crossJoin(F.broadcast(globals_))
        .groupBy("_id")
        .agg(F.round(F.sum(idf * tf_part), decimals).alias("bm25"))
        .select(F.col("_id").alias(id_col), "bm25")
    )


def phrase_bm25_from_index(
    pos_postings: DataFrame,
    postings: DataFrame,
    term_stats: DataFrame,
    phrase_terms: list[str],
    *,
    query_terms: list[str] | None = None,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 4,
) -> DataFrame:
    """Quoted-query serving — the standard filter-then-rank shape for
    a query like ``"fast table scan"``: documents must contain the
    EXACT phrase (positional intersection over the persisted
    positional index, ``phrase_match``), and qualifying documents are
    ranked by BM25 of ``query_terms`` (default: the phrase's own
    terms) served from the persisted inverted index
    (``bm25_from_index``). Both predicates prune their index scans
    independently (per-term pushdown on each), the BM25 tf join is
    semi-restricted to the phrase's survivors, and the corpus-wide
    length model keeps candidate scores identical to their
    unrestricted scores. Output: (id_col, n_matches, bm25), one row
    per phrase-matching document — a match containing NONE of the
    ranking terms (possible when ``query_terms`` differs from the
    phrase) still emits its row, with bm25 0.0."""
    # lazy localCheckpoint: the match set feeds both the candidates
    # semi-join inside the scored plan and the final join — without
    # it the k-1 positional-intersection joins execute twice (the
    # same two-consumer shape bm25_from_index guards on `dl`)
    matches = phrase_match(
        pos_postings, phrase_terms, id_col=id_col
    ).localCheckpoint(eager=False)
    scored = bm25_from_index(
        postings,
        term_stats,
        list(query_terms or phrase_terms),
        id_col=id_col,
        k1=k1,
        b=b,
        decimals=decimals,
        candidates=matches.select(id_col),
    )
    return matches.join(scored, id_col, "left").select(
        id_col,
        "n_matches",
        F.coalesce(F.col("bm25"), F.lit(0.0)).alias("bm25"),
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


def logistic_blend_scorer(
    base_col: str,
    feature_col: str,
    *,
    base_weight: float = 0.8,
    feature_center: float = 40.0,
    feature_scale: float = 20.0,
):
    """Deterministic stand-in for a LEARNED re-ranking model: blends
    the retrieval score with a logistic transform of one document
    feature, ``w*base + (1-w)*sigmoid((feat-center)/scale)``. A real
    cross-encoder / GBDT reranker drops in by replacing the returned
    callable with ``model.predict_proba`` over the same pandas batch
    — the operator contract (``rerank_grouped``) only sees
    ``pd.DataFrame -> pd.Series``."""
    import numpy as np

    def score(pdf):
        x = (pdf[feature_col].astype("float64") - feature_center) / feature_scale
        sig = 1.0 / (1.0 + np.exp(-x))
        return base_weight * pdf[base_col].astype("float64") + (
            1.0 - base_weight
        ) * sig

    return score


def rerank_grouped(
    candidates: DataFrame,
    *,
    group_col: str,
    id_col: str,
    scorer,
    k: int,
    score_decimals: int = 6,
) -> DataFrame:
    """Second-stage re-ranking as grouped ``applyInPandas``: each
    retrieval group (one query's candidate list) arrives as ONE pandas
    batch, the scorer runs vectorized over it, and only the top ``k``
    re-scored rows leave the executor. This is the canonical two-tower
    serving shape — a cheap first stage (ANN / BM25) bounds the
    candidate set to tens of rows per query, so the expensive Python
    model runs on k*|queries| rows, never on the corpus. The shuffle
    is one hash partitioning by query id; no state, no driver data.

    Determinism contract (oracle-checkable): scores are rounded to
    ``score_decimals`` BEFORE ranking — half-UP (away from zero) via
    ``np_round_half_up``, matching SQL round() rather than numpy's
    half-to-even, so an exact binary tie at the last digit cannot
    flip the emitted score or the post-round ranking vs the oracle —
    and ties break on ascending ``id_col``, the same ORDER BY the
    SQL twin uses.
    """
    import pandas as pd

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        np_round_half_up,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gt = candidates.schema[group_col].dataType.simpleString()
    it = candidates.schema[id_col].dataType.simpleString()
    out_schema = f"{group_col} {gt}, {id_col} {it}, score double, rank int"

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        scored = pdf.assign(
            score=np_round_half_up(
                scorer(pdf).to_numpy(dtype="float64"), score_decimals
            )
        )
        top = scored.sort_values(
            ["score", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pd.DataFrame(
            {
                group_col: top[group_col].values,
                id_col: top[id_col].values,
                "score": top["score"].values,
                "rank": range(1, len(top) + 1),
            }
        )

    return candidates.groupBy(group_col).applyInPandas(rerank, schema=out_schema)


def mmr_rerank(
    candidates: DataFrame,
    *,
    group_col: str,
    id_col: str,
    vec_col: str,
    base_score_col: str,
    k: int,
    lam: float = 0.7,
    sim_decimals: int = 4,
    score_decimals: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance diversity re-ranking as grouped
    ``applyInPandas``: within each query's bounded candidate list,
    greedily pick the item maximizing
    ``lam * relevance - (1 - lam) * max_similarity_to_already_picked``
    — the standard redundancy penalty for RAG context selection
    (Carbonell & Goldstein 1998). Sequential by nature, but the
    sequence is per query over tens of rows, so the Python stage
    costs k*|queries| steps while the corpus-scale work stays in the
    first-stage retrieval — same serving shape as ``rerank_grouped``.

    Determinism contract: pairwise cosines round half-up to
    ``sim_decimals`` and MMR values to ``score_decimals`` BEFORE each
    argmax; ties break on ascending ``id_col``. The SQL twin unrolls
    the same greedy steps, so the selection is oracle-checkable.
    Output: (group, id, rank 1..k).
    """
    import numpy as np
    import pandas as pd

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        np_round_half_up,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gt = candidates.schema[group_col].dataType.simpleString()
    it = candidates.schema[id_col].dataType.simpleString()
    out_schema = f"{group_col} {gt}, {id_col} {it}, rank int"

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        E = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-300)
        sims = np_round_half_up(En @ En.T, sim_decimals)
        base = pdf[base_score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        picked: list[int] = []
        alive = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            if not picked:
                score = base.copy()
            else:
                penalty = sims[:, picked].max(axis=1)
                score = np_round_half_up(
                    lam * base - (1.0 - lam) * penalty, score_decimals
                )
            score[~alive] = -np.inf
            best = int(np.argmax(score))  # first max = smallest id (sorted)
            picked.append(best)
            alive[best] = False
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[picked].values,
                id_col: pdf[id_col].iloc[picked].values,
                "rank": range(1, len(picked) + 1),
            }
        )

    return candidates.groupBy(group_col).applyInPandas(mmr, schema=out_schema)


def phrase_bm25_from_index_batch(
    pos_postings: DataFrame,
    postings: DataFrame,
    term_stats: DataFrame,
    phrases: list[list[str]],
    *,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 4,
) -> DataFrame:
    """``phrase_bm25_from_index`` for a BATCH of quoted queries with
    corpus work paid ONCE for all of them: the positional index is
    scanned one time restricted to the UNION of every phrase's terms
    (a single pushdown filter instead of per-phrase scans), each
    occurrence joins the tiny broadcast (qid, term, offset) table,
    and a phrase match at anchor position p for query q is "all of
    q's offsets present at p" — ``count(distinct offset) == |phrase|``
    per (qid, doc, anchor), which is exact even for phrases repeating
    a term (each offset row independently requires its term at
    anchor+offset). BM25 likewise reads the inverted index once for
    the union terms, restricted to each query's own phrase survivors;
    the corpus-wide length model is computed once and shared, so each
    (qid, doc) score equals the single-query path's byte-for-byte.

    Output: ``(qid, id_col, n_matches, bm25)`` — one row per
    (query, phrase-matching doc), bm25 0.0 for matches containing no
    ranking term. Scale shape: two index scans TOTAL (positional +
    inverted, both term-pushdown-pruned), broadcast joins against
    query-sized frames, aggregates keyed by (qid, doc) — per-query
    cost is the marginal join fan-out, not a rescan."""
    if not phrases or any(not p for p in phrases):
        raise ValueError("phrases must be a non-empty list of non-empty lists")
    spark = pos_postings.sparkSession
    qt = spark.createDataFrame(
        [
            (qi, t, off)
            for qi, ph in enumerate(phrases)
            for off, t in enumerate(ph)
        ],
        "qid int, term string, off int",
    )
    plen = spark.createDataFrame(
        [(qi, len(ph)) for qi, ph in enumerate(phrases)],
        "qid int, _plen int",
    )
    all_terms = sorted({t for ph in phrases for t in ph})
    occ = pos_postings.filter(F.col("term").isin(all_terms)).select(
        "term", F.col(id_col).alias("_id"), "pos"
    )
    hits = occ.join(F.broadcast(qt), "term").select(
        "qid", "_id", (F.col("pos") - F.col("off")).alias("_apos"), "off"
    )
    matches = (
        hits.groupBy("qid", "_id", "_apos")
        .agg(F.count_distinct("off").alias("_k"))
        .join(F.broadcast(plen), "qid")
        .filter(F.col("_k") == F.col("_plen"))
        .groupBy("qid", "_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .localCheckpoint(eager=False)
    )
    # shared corpus-wide length model (identical to bm25_from_index)
    dl = (
        postings.groupBy(F.col(id_col).alias("_id"))
        .agg(F.sum("tf").alias("_dl"))
        .localCheckpoint(eager=False)
    )
    globals_ = dl.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )
    tfq = (
        postings.filter(F.col("term").isin(all_terms))
        .select(F.col(id_col).alias("_id"), "term", F.col("tf").alias("_tf"))
        .join(F.broadcast(qt.select("qid", "term").distinct()), "term")
        .join(matches.select("qid", "_id"), ["qid", "_id"], "left_semi")
    )
    dfreq = term_stats.filter(F.col("term").isin(all_terms)).select(
        "term", F.col("df").alias("_df")
    )
    idf = F.log(
        (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    tf_part = (
        F.col("_tf")
        * (k1 + 1.0)
        / (F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl")))
    )
    scored = (
        tfq.join(F.broadcast(dfreq), "term")
        .join(dl, "_id")
        .crossJoin(F.broadcast(globals_))
        .groupBy("qid", "_id")
        .agg(F.round(F.sum(idf * tf_part), decimals).alias("bm25"))
    )
    return matches.join(scored, ["qid", "_id"], "left").select(
        "qid",
        F.col("_id").alias(id_col),
        "n_matches",
        F.coalesce(F.col("bm25"), F.lit(0.0)).alias("bm25"),
    )


def top_ranks_batch(
    scored: DataFrame,
    score_col: str,
    *,
    qid_col: str = "qid",
    id_col: str = "doc_id",
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Per-query (qid, id, rank) for each query's top ``k`` rows by
    (score, id) — the batch twin of ``top_ranks``: one rank window
    PARTITIONED by qid (each query's candidate list is bounded, so
    every window task is small), no per-query driver loop."""
    from pyspark.sql import Window

    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(qid_col).orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, score_col, "rank")
    )


def rrf_fuse_batch(
    a: DataFrame,
    b: DataFrame,
    *,
    qid_col: str = "qid",
    id_col: str = "id",
    k: int = 60,
    decimals: int = 6,
) -> DataFrame:
    """Per-query reciprocal-rank fusion of two (qid, id, rank)
    candidate-list tables — the batch twin of ``rrf_fuse``: one
    full-outer join on (qid, id), same 1/(k + rank) contributions."""
    ra = a.select(
        F.col(qid_col).alias("_q"),
        F.col(id_col).alias("_id"),
        F.col("rank").alias("_ra"),
    )
    rb = b.select(
        F.col(qid_col).alias("_q"),
        F.col(id_col).alias("_id"),
        F.col("rank").alias("_rb"),
    )
    joined = ra.join(rb, ["_q", "_id"], "full_outer")
    contrib = F.coalesce(
        1.0 / (F.lit(k) + F.col("_ra")), F.lit(0.0)
    ) + F.coalesce(1.0 / (F.lit(k) + F.col("_rb")), F.lit(0.0))
    return joined.select(
        F.col("_q").alias(qid_col),
        F.col("_id").alias(id_col),
        F.round(contrib, decimals).alias("rrf"),
    )
