"""Scale-robustness join strategies.

Catalyst + AQE already pick broadcast vs sort-merge and split skewed
partitions; these helpers cover the two cases that still need an
explicit physical choice at 100 TB:

- ``salted_join`` — extreme key skew on the build side of a shuffle
  join (one key holding a double-digit percentage of rows). AQE's
  skew-join splits oversized *partitions*; salting splits the *key
  itself*: the skewed side gets a random salt in [0, buckets), the
  small side is exploded x buckets, and the join key becomes
  (key, salt). Shuffle output is balanced by construction.

- ``bucketed tables`` — recurring joins on the same key. Writing both
  sides bucketed by the key (``write_bucketed``) lets Spark plan a
  sort-merge join with NO exchange on either side: co-located
  bucket files join one-to-one. At 100 TB this converts the
  dominant shuffle of every pipeline run into a pure scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    buckets: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed[on]`` has heavy key skew and ``small``
    is too big to broadcast. The salt column is dropped on output.

    Row multiplication happens only on ``small`` (x buckets), so use
    the smallest side that still can't broadcast. Deterministic given
    the seed (rand(seed) is reproducible per partition lineage).

    Supported ``how``: inner / left / semi / anti — the shapes where
    every skewed-side row carries exactly one salt and matches (or
    not) against the exploded small side. right/full are REJECTED:
    the small side's other salt copies would surface as NULL-padded
    phantom rows and unmatched keys would appear once per bucket.
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi",
               "anti", "leftanti", "left_anti"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, got {how!r}: "
            "right/full outer would emit per-salt phantom rows"
        )
    salt = (F.rand(seed) * buckets).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins and aggregations on ``bucket_col`` between tables bucketed
    with the same bucket count plan without an Exchange."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed managed tables on their bucket key —
    plans as exchange-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    strict: bool = False,
) -> DataFrame:
    """As-of (temporal) join: for every left row, attach the right
    row with the greatest ``right_time`` <= ``left_time`` (strictly
    < when ``strict``) for the same ``on`` key; left rows with no
    earlier right row keep NULLs (left-join semantics).

    The reference's pipeline has no temporal operator at all (its
    data path is a straight-line hydration, sas:126-193); this is
    the standard feature-attribution join a training-data pipeline
    needs (label each example with the latest state known at event
    time, without leaking the future).

    Spark-first plan: instead of the naive non-equi join (whose
    range condition explodes to O(left x right) per key and defeats
    hash partitioning), both sides are UNIONed into one stream,
    window-partitioned by key and sorted by (time, side), and the
    right payload is carried forward with
    ``last(payload, ignorenulls=True)``. The payload travels as ONE
    struct so a NULL field inside a matched right row cannot fall
    through to an older row. Cost: exactly one shuffle (the window
    partitioning), whole-stage codegen throughout, no Python.
    Skewed keys serialize within their partition — for a pathological
    hot key, pre-split by coarse time range and stitch (same plan
    shape per range); AQE cannot split a window partition.

    Determinism: if several right rows share (key, right_time), which
    one wins is tie-broken by the struct's field order via ``max``
    semantics being unavailable — callers wanting bit-stable output
    should pre-aggregate the right side to one row per (key, time)
    (the registered query does).
    """
    if on in (left_time, right_time):
        raise ValueError("key column cannot also be the time column")
    clash = (set(right.columns) - {on}) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")

    from pyspark.sql.window import Window

    payload_cols = [c for c in right.columns if c != on]
    r_struct = F.struct(*[F.col(c) for c in payload_cols])
    # Tie order at equal timestamps: non-strict -> right rows sort
    # BEFORE left rows (an equal-time right row is visible); strict ->
    # left rows sort first (equal-time right rows are in the future).
    tb_r, tb_l = (0, 1) if not strict else (1, 0)
    # NULL right timestamps would sort before every left row (asc
    # NULLS FIRST) and leak as matches-before-everything; the
    # documented contract is that they never match.
    rows_r = right.filter(F.col(right_time).isNotNull()).select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(tb_r).alias("_tb"),
        r_struct.alias("_r"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("_l"),
    )
    rows_l = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(tb_l).alias("_tb"),
        F.lit(None).cast(rows_r.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = rows_l.unionByName(rows_r).withColumn(
        "_carried", F.last("_r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_l").isNotNull())
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_carried.{c}").alias(c) for c in payload_cols],
    )


def prefix_sum(
    df: DataFrame,
    *,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum_before",
    num_partitions: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """EXCLUSIVE running sum of ``value_col`` over the global
    ``order_col`` order — without the single-task window that
    ``Window.orderBy`` (no partitionBy) degenerates to.

    Classic two-level scan: range-repartition on the order column
    (contiguous key ranges per partition), per-partition window
    cumsum (parallel, partition-local), then add each partition's
    prefix offset — the per-partition totals are one tiny row per
    partition, so THEIR running sum is a trivially small window and
    the offsets broadcast back. The result depends only on the global
    order, not on where range boundaries land.

    ``order_col`` must be UNIQUE per row, or a ``tiebreak_col`` that
    breaks its ties must be supplied: tied order keys can split
    across range-partition boundaries and order arbitrarily within a
    partition, making tied rows' exclusive sums vary run to run. With
    ``tiebreak_col`` the pair (order, tiebreak) drives BOTH the range
    partitioning and the window order, so the global order — and the
    result — is total and deterministic.

    This is the scale-correct backbone for order-dependent layouts
    (sequence packing, file splitting by cumulative size) at corpus
    sizes where a single-task window would be the whole job.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    order_exprs = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    order_names = [order_col] + ([tiebreak_col] if tiebreak_col is not None else [])
    ranged = df.repartitionByRange(n_parts, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_names)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
    )
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_ptotal"))
    w_parts = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_ptotal").over(w_parts), F.lit(0))
    ).select("_pid", "_offset")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_offset")).cast("bigint"))
        .drop("_pid", "_local")
    )


def scd2_from_changelog(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: collapse a
    per-key event stream into validity intervals, one row per
    ATTRIBUTE CHANGE — ``(key, *attrs, valid_from, valid_to,
    is_current)`` with ``valid_to`` NULL on the open (current) row.
    Consecutive rows whose attributes are unchanged are merged into
    one interval (the standard changelog->dimension compaction, e.g.
    building a customer-segment dimension from raw events).

    Change detection is null-safe struct comparison against the
    previous row (``<=>`` lifted over a struct of ``attr_cols``), so
    NULL -> NULL is "no change" and NULL -> value is a change.
    ``tiebreak_col`` makes the within-key order total when ``ts_col``
    can tie (e.g. an event id); ties without a tiebreaker are
    nondeterministic exactly like any SQL window would be.

    Scale shape: ONE shuffle on ``key_col``, then two window passes
    (lag to find change rows, lead over the filtered change rows to
    close intervals) inside the same per-key partitioning — Catalyst
    reuses the exchange, and per-key state is a single previous row,
    never the key's history. Dimension keys are typically
    well-distributed; a hot key degrades to one task sorting that
    key's events, the same bound as any per-key window."""
    from pyspark.sql import Window

    order = [ts_col] + ([tiebreak_col] if tiebreak_col is not None else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # lag of a struct of the attributes; the row_number()==1 test (not
    # _prev IS NULL) marks the first row changed even when every
    # attribute is NULL, so all-NULL leading rows still open a period
    marked = (
        df.withColumn("_prev", F.lag(attrs).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_chg",
            (F.col("_rn") == 1) | ~F.col("_prev").eqNullSafe(attrs),
        )
    )
    change_rows = marked.filter(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        change_rows.withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .select(
            key_col,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
