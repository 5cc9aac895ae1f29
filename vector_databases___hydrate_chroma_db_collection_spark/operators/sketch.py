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

def _bucket(key, row: int, width: int):
    """Hash-row ``row``'s bucket for ``key``: hex slice ``row`` of ONE
    md5 digest, as a 32-bit int mod width. All hash rows share a
    single md5 per input row (Spark's subexpression elimination and
    DuckDB both compute the repeated md5 once per projection), which
    is 4x cheaper than one keyed digest per row — and the slices of a
    single md5 are the standard cheap stand-in for an independent
    family. depth ≤ 4 (32 hex chars / 8)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(key.cast("string").cast("binary")), 1 + 8 * row, 8),
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
    passthrough columns except ``cms_est`` (internal probe columns
    are underscore-prefixed), of ANY type, and output cardinality
    equals input cardinality — duplicate key rows stay duplicated
    (the re-group after the probe explode keys on a per-row id, not
    on the passthrough values)."""
    if depth > 4:
        raise ValueError("cms depth > 4 exceeds the md5 slice budget")
    if "cms_est" in keys.columns:
        raise ValueError("keys already has a 'cms_est' column")
    key = F.col(key_col)
    # Row id BEFORE the probe explode: grouping back on it preserves
    # input cardinality exactly and never asks Spark to group on a
    # passthrough column (which fails for maps and collapses dups).
    # monotonically_increasing_id is stable here because the id and
    # the group-by consume it inside one plan, never across restarts.
    tagged = keys.withColumn("_cms_rid", F.monotonically_increasing_id())
    probes = (
        tagged.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("r"),
                            _bucket(key, j, width).alias("b"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("_cms_p"),
        )
        .select(
            "*",
            F.col("_cms_p.r").alias("_cms_row"),
            F.col("_cms_p.b").alias("_cms_bucket"),
        )
        .drop("_cms_p")
    )
    c = counters.select(
        F.col("hash_row").alias("_cms_row"),
        F.col("bucket").alias("_cms_bucket"),
        F.col("cnt").alias("_cms_cnt"),
    )
    passthrough = [col for col in keys.columns]
    return (
        probes.join(F.broadcast(c), ["_cms_row", "_cms_bucket"], "left")
        .groupBy("_cms_rid")
        .agg(
            *[F.first(col).alias(col) for col in passthrough],
            F.min(F.coalesce("_cms_cnt", F.lit(0))).alias("cms_est"),
        )
        .drop("_cms_rid")
    )
