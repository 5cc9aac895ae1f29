"""Shared scaffolding for the query registry package: the
``QUERIES``/``ORACLES`` dicts, the ``@query`` decorator, and
every cross-family constant/helper (SQL oracle fragments, money
arithmetic, hash/cosine templates). Family modules import what
they need from here; see queries/__init__.py for the package
contract.

Every operator surface from SURVEY.md §2 gets a named query here:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL can
express it) an ANSI-SQL oracle string run by DuckDB over the same
parquet fixtures. The driver hash-compares both sides (row count,
schema, order-insensitive value hash with columns sorted by name),
so every computed column is aliased identically on both sides and
floating-point results are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import knn_query
from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _cents(c):
    """Money term -> integer cents. Summing money in BIGINT cents is
    order-independent, so Spark (parallel, AQE-dependent partial
    sums) and DuckDB (sequential) agree bit-for-bit at any scale —
    double summation of 100k+ terms differs in the last ~1e-2 between
    engines, which round() cannot paper over."""
    return F.round(c * 100).cast("bigint")


def _money_sum(c):
    """Order-independent money sum: SUM(cents)/100 as double."""
    return F.sum(_cents(c)) / 100.0


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is the DuckDB-SQL twin."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Flagship (M1): exact top-5 cosine neighbors of document 1's vector.
# Plan: corpus scan -> distance expression (codegen) ->
# TakeOrderedAndProject. No shuffle; scales linearly with corpus.
# --------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
scored AS (
    SELECT
        e.vec_id,
        round(
            list_sum(list_transform(list_zip(e.embedding, q.qe),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (
                sqrt(list_sum(list_transform(e.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(q.qe,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            ), 4) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 1
)
SELECT vec_id, cos_sim
FROM scored
ORDER BY cos_sim DESC, vec_id
LIMIT 5
"""


# --------------------------------------------------------------------------
# Text analysis + dedup family (north-star LLM-pipeline operators).
# The oracle SQL re-derives the same hashes/shingles/scores in DuckDB;
# shared fragments below keep the two sides literally in sync.
# --------------------------------------------------------------------------

from vector_databases___hydrate_chroma_db_collection_spark.functions import text as T
from vector_databases___hydrate_chroma_db_collection_spark.operators import dedup as D

# DuckDB fragments mirroring functions/text.py and functions/hashes.py
_NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
_TOKS = r"list_filter(string_split_regex({x}, '\s+'), t -> t <> '')"
_HASH64 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"
_SW = {
    code: "[" + ", ".join(f"'{w}'" for w in words) + "]"
    for code, words in T.STOPWORDS.items()
}


_LANGID_ORACLE = f"""
WITH hits AS (
    SELECT doc_id,
           len(list_filter({_TOKS.format(x='lower(text)')}, t -> list_contains({_SW['de']}, t))) AS h_de,
           len(list_filter({_TOKS.format(x='lower(text)')}, t -> list_contains({_SW['en']}, t))) AS h_en,
           len(list_filter({_TOKS.format(x='lower(text)')}, t -> list_contains({_SW['es']}, t))) AS h_es,
           len(list_filter({_TOKS.format(x='lower(text)')}, t -> list_contains({_SW['fr']}, t))) AS h_fr
    FROM documents
)
SELECT CASE
         WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
         WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
         WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
         WHEN h_en >= h_de THEN 'en'
         ELSE 'de'
       END AS lang_pred,
       count(*) AS cnt
FROM hits
GROUP BY 1
"""


# BPE-ish pre-tokenizer split (functions/text.py::BPE_REGEX): ASCII
# letter/digit/punct runs with optional leading space — identical
# between Java regex and RE2, so the count is fully oracle-checked.
_BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


_STRATA_RATES = {"en": 100, "es": 300, "fr": 300, "de": 300, "zh": 300}


# Shared shingle CTE: distinct word-3-grams over normalized tokens.
_SHINGLES_CTE = f"""
toks AS (
    SELECT doc_id, {_TOKS.format(x=_NORM)} AS t FROM documents
),
shing AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS s
    FROM toks WHERE len(t) > 0
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shing GROUP BY 1)
"""


# MinHash oracle: same universal-hash family as functions/hashes.py —
# one md5-derived base hash per shingle, then (A[j]*x + B[j]) mod P.
from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
)

_MINHASH_BASE = (
    "list_transform(sh_list, s -> "
    + _HASH64.format(x="s")
    + f" % {MINHASH_P})"
)
_MINHASH_SIG = (
    "["
    + ", ".join(
        f"list_min(list_transform(base, x -> ({MINHASH_A[j]} * x + {MINHASH_B[j]}) % {MINHASH_P}))"
        for j in range(16)
    )
    + "]"
)
_BAND_H = _HASH64.format(
    x="array_to_string(list_transform(list_slice(sig, b * 2 + 1, b * 2 + 2), "
    "v -> CAST(v AS VARCHAR)), ',')"
)


def _simhash_sql_terms() -> str:
    terms = []
    for j in range(16):
        mask = 1 << j
        terms.append(
            f"(CASE WHEN list_sum(list_transform(tok_hashes, "
            f"v -> CASE WHEN (v & {mask}) <> 0 THEN 1 ELSE -1 END)) > 0 "
            f"THEN {mask} ELSE 0 END)"
        )
    return " + ".join(terms)


_COS_DOUBLE = """
list_sum(list_transform(list_zip({a}, {b}),
         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
/ (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


def _rp_planes():
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        _hyperplanes,
    )

    return _hyperplanes(64, 8, seed=7)


def _rp_sql() -> str:
    planes = _rp_planes()
    cols = []
    for j, plane in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in plane)
        cols.append(
            f"round(list_sum(list_transform(list_zip(embedding, [{lits}]),"
            f" p -> CAST(p[1] AS DOUBLE) * p[2])), 4) AS rp_{j}"
        )
    return (
        "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings WHERE vec_id < 200"
    )


_BM25_TERMS = ("join", "spark", "vector")
_BM25_SQL_BASE = f"""
    tok AS (
        SELECT doc_id, unnest({_TOKS.format(x=_NORM)}) AS t FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, t, count(*) AS tf FROM tok
        WHERE t IN {str(tuple(_BM25_TERMS))} GROUP BY 1, 2
    ),
    dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
    bscore AS (
        SELECT tf.doc_id,
               round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                     * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))),
                     4) AS bm25
        FROM tf JOIN dfq USING (t) JOIN dl USING (doc_id) CROSS JOIN g
        GROUP BY tf.doc_id
    )
"""


_VCOS = _COS_DOUBLE.format(a="e.embedding", b="q.qe")


# --------------------------------------------------------------------------
# Windowed event-time aggregation (batch twins of the streaming ops in
# streaming/windows.py — identical plans, so the oracle checks both).
# Note: events.ts is nanoseconds in parquet; Spark reads microseconds
# (sources/parquet.py), DuckDB nanoseconds — oracles truncate to the
# microsecond via epoch_us for identical bucketing.
# --------------------------------------------------------------------------

from vector_databases___hydrate_chroma_db_collection_spark.streaming import windows as W


# --------------------------------------------------------------------------
# Chroma client-API surface (plans/chroma_api.py): filtered vector query,
# paged get, predicate delete — the retrieval/maintenance half the
# reference delegates to Chroma's client (reference README.md:5; the SAS
# step only writes, sas:177-190). Each runs against a freshly hydrated
# temp collection so driver re-invocations stay idempotent.
# --------------------------------------------------------------------------

_COS_SQL = """
            round(
                list_sum(list_transform(list_zip(c.emb, q.qe),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                / (sqrt(list_sum(list_transform(c.emb,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                 * sqrt(list_sum(list_transform(q.qe,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
"""


def _hydrate_docs_collection(spark, sf_dir, name, *, n_buckets=None):
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_api_")
    hydrate(
        spark,
        d.join(e, d.doc_id == e.vec_id),
        HydrationConfig(
            collection_name=name,
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
            metadata_col="lang",
            n_buckets=n_buckets,
        ),
    )
    return root


_ESS_K = 8  # ExactSubstr window length in tokens


_PII_EMAIL = T.PII_PATTERNS["email"]
_PII_IPV4 = T.PII_PATTERNS["ipv4"]
_PII_PHONE = T.PII_PATTERNS["phone"]

# Synthetic contact line woven deterministically from fixture columns
# (the fixture corpus itself contains no PII, and a redaction query
# whose counts are all zero would be a vacuous oracle).
_PII_CONTACT_SQL = """
    'doc ' || CAST(doc_id AS VARCHAR)
    || CASE WHEN lang = 'en'
            THEN ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@data-' || source || '.org'
            ELSE '' END
    || CASE WHEN doc_id % 3 = 0
            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST(n_chars % 256 AS VARCHAR) || '.7'
            ELSE '' END
    || CASE WHEN doc_id % 4 = 1
            THEN ' call +1 555 01'
                 || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
            ELSE '' END
"""


_PR_ITER_SQL = """
    pr{t} AS (
        SELECT nd.node,
               0.15 / (SELECT n FROM nn)
               + 0.85 * coalesce(sum(p.rank * m.p), 0) AS rank
        FROM nodes nd
        LEFT JOIN norm m ON m.dst = nd.node
        LEFT JOIN pr{p} p ON p.node = m.src
        GROUP BY 1
    )"""


# hash-row j = hex slice j of ONE md5 per key (operators/sketch.py
# shares the digest across rows via subexpression elimination)
_CMS_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1 + 8 * j, 8)) "
    "AS BIGINT) % 256"
)


_ZORDER_SQL_X = "user_id"
_ZORDER_SQL_Y = "CAST(round(value * 100) AS BIGINT)"


_CMS64_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1 + 8 * j, 8)) "
    "AS BIGINT) % 64"
)


_SUBCOS = _COS_DOUBLE.format(
    a="list_slice(e.embedding, (i - 1) * 16 + 1, i * 16)",
    b="list_slice(q.qe, (j - 1) * 16 + 1, j * 16)",
)


_PACKBITS = """list_transform(range(0, 2), w ->
        list_reduce(list_transform(range(0, 32), b ->
            CASE WHEN {arr}[w*32+b+1] > 0 THEN 1::BIGINT ELSE 0::BIGINT END),
            (acc, x) -> acc*2 + x))"""

_BKNN_COS = _COS_DOUBLE.format(a="c.emb", b="q.qe")


_MMR_COS0 = _COS_DOUBLE.format(a="e.embedding", b="q.qe")
_MMR_COS1 = _COS_DOUBLE.format(a="c.de", b="p.e1")
_MMR_COS2 = _COS_DOUBLE.format(a="c.de", b="r.e2")
