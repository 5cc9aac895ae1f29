"""Count-min sketch — sub-linear frequency estimation at 100 TB.

Exact per-key counts over a high-cardinality key need a shuffle with
one row per distinct key; a count-min sketch (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005) bounds the state at depth × width
counters regardless of cardinality, at the cost of one-sided
(over-)estimation error.

Spark mapping: the sketch IS an aggregation. Each input row
contributes +1 to one bucket per hash row; after map-side partial
aggregation every partition emits at most depth·width counter rows,
so the shuffle volume is bounded by the sketch size — the 100 TB scan
reduces to a few-KB exchange. Estimates are then a broadcast-join of
the queried keys against the counter table with a min() over hash
rows — never a second corpus pass.

The hash family is ``depth`` disjoint 8-hex-char slices of ONE md5
digest per key (computed once per row via subexpression elimination),
so a DuckDB oracle reproduces every counter and estimate bit-for-bit
(same portability contract as the MinHash family in
``functions/hashes.py``) at a quarter of the hashing cost of one
keyed digest per hash row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators._cache import (
    attach_cache,
)


def _bucket(key, row: int, width: int):
    """Hash-row ``row``'s bucket for ``key``: hex slice ``row`` of ONE
    md5 digest, as a 32-bit int mod width. All hash rows share a
    single md5 per input row (Spark's subexpression elimination and
    DuckDB both compute the repeated md5 once per projection), which
    is 4x cheaper than one keyed digest per row — and the slices of a
    single md5 are the standard cheap stand-in for an independent
    family. depth ≤ 4 (32 hex chars / 8). NULL keys hash via a
    control-character sentinel so counters and estimates agree on
    them — md5(NULL) = NULL would give NULL buckets that never
    equi-join, making cms_estimate return 0 for a key the counters
    DID count (an underestimate, the one direction CM forbids)."""
    keyed = F.coalesce(key.cast("string"), F.lit("\x00null\x00"))
    return F.pmod(
        F.conv(
            F.substring(F.md5(keyed.cast("binary")), 1 + 8 * row, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(width),
    )


def cms_counters(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch -> (hash_row, bucket, cnt), ≤ depth·width rows.

    One scan: each input row expands to ``depth`` (row, bucket) pairs
    via an inline array (no join, no extra scan per hash row); the
    hash-partial-agg collapses them to counter rows before the
    exchange, so the shuffle carries the sketch, not the data.
    """
    if depth > 4:
        raise ValueError("cms depth > 4 exceeds the md5 slice budget")
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("hash_row"), _bucket(key, j, width).alias("bucket")
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.hash_row").alias("hash_row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys`` ->
    (key_col…, cms_est). The counter table is ≤ depth·width rows, so
    Spark broadcasts it; estimates are min over the key's ``depth``
    counters (the classic one-sided CM bound: est ≥ true count).
    Buckets that no key hashed into are absent from ``counters`` —
    they read as 0 via the left join coalesce. ``keys`` may carry any
    passthrough columns (any type) except ``cms_est`` or
    ``_cms_``-prefixed names, and output cardinality equals input
    cardinality STRUCTURALLY: the estimate is ``least()`` over
    ``depth`` broadcast hash-row lookups — one tiny left join per
    hash row, no explode, no re-group, no synthetic row ids — so
    duplicate key rows stay duplicated and nothing depends on
    row-identity stability under fault recovery.

    The counters plan is materialized EAGERLY here, exactly once
    (``persist()`` + a ``count()`` action — the sketch is bounded at
    depth·width rows by construction, so this caches a few KB).
    Without it, each of the ``depth`` broadcast builds re-executed
    the whole upstream aggregation — four full input scans for depth
    4 when the caller passes an unmaterialized plan, which at 100 TB
    is the difference between one pass and four (and was the r5
    2M-key bench regression: 1.2-1.6 s -> 3.2 s). NOTE this call is
    therefore EAGER, not a lazy plan-builder: it runs the upstream
    aggregation job at call time. ``persist`` (not
    ``localCheckpoint``) keeps the lineage, so an executor loss
    recomputes the lost blocks instead of failing the downstream
    action. The cache entry rides on the returned DataFrame: call
    ``operators._cache.release_cache(result)`` once the result is
    materialized to unpersist it deterministically (each entry is only
    depth·width rows, but CacheManager entries are never GC'd, so many
    sketches in one session would otherwise accumulate pinned
    entries). Callers that point-query one sketch many times should
    release only after the last query."""
    if depth > 4:
        raise ValueError("cms depth > 4 exceeds the md5 slice budget")
    reserved = [
        c for c in keys.columns if c == "cms_est" or c.startswith("_cms_")
    ]
    if reserved:
        raise ValueError(f"keys has reserved column names: {reserved}")
    key = F.col(key_col)
    mat = counters.persist()
    mat.count()
    out = keys
    est_terms = []
    for j in range(depth):
        cj = mat.filter(F.col("hash_row") == j).select(
            F.col("bucket").alias(f"_cms_b{j}"),
            F.col("cnt").alias(f"_cms_c{j}"),
        )
        out = out.withColumn(f"_cms_b{j}", _bucket(key, j, width)).join(
            F.broadcast(cj), f"_cms_b{j}", "left"
        )
        est_terms.append(F.coalesce(F.col(f"_cms_c{j}"), F.lit(0)))
    est = est_terms[0] if depth == 1 else F.least(*est_terms)
    drop = [f"_cms_b{j}" for j in range(depth)] + [
        f"_cms_c{j}" for j in range(depth)
    ]
    return attach_cache(out.withColumn("cms_est", est).drop(*drop), mat)
