"""Window/analytic surface: ranking, frames, sessionization, funnels, time series.

Split from the original single-file registry (r8); every query keeps
its exact name, body, and oracle — `tools/parity_local.py` guards the
registry contract across the split.
"""

from __future__ import annotations

from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _money_sum,
    load_table,
    query,
)


# --------------------------------------------------------------------------
# Windows, rollup/cube, distinct, sort/limit, set ops.
# --------------------------------------------------------------------------


@query(
    "window_top3_orders_per_customer",
    """
    SELECT custkey, orderkey, totalprice, rn
    FROM (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               o_totalprice AS totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: one shuffle on the partition key, then a local
    sort per group. At scale prefer this over global sorts — the sort
    is bounded by the largest single customer."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            "rn",
        )
    )


@query(
    "window_running_spend",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_lag_event_value",
    """
    SELECT event_id,
           round(value - lag(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ), 6) AS value_delta,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_event_type
    FROM events
    """,
)
def window_lag_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "retention_weekly_cohorts",
    """
    WITH wk AS (
        SELECT user_id,
               CAST(floor(epoch_us(ts) / 1000000.0 / 604800) AS BIGINT) AS week
        FROM events
    ),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1),
    active AS (SELECT DISTINCT user_id, week FROM wk)
    SELECT c.cohort_week,
           a.week - c.cohort_week AS week_offset,
           count(DISTINCT a.user_id) AS users
    FROM active a JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_weekly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    per week-offset of later activity. Weeks are epoch-bucketed
    (floor(epoch/604800)) rather than date_trunc so bucket boundaries
    are engine- and timezone-independent; the whole query is two
    hash-aggs and one equi-join on user_id."""
    e = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000.0 / 604_800
    ).cast("bigint")
    wk = e.select("user_id", week.alias("week"))
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = wk.distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("users"))
    )


# --------------------------------------------------------------------------
# Third batch: remaining window analytics, GROUPING SETS, pivot,
# levenshtein, date arithmetic, and the Python-UDF surface (scalar
# pandas_udf + grouped applyInPandas) — each still oracle-checked.
# --------------------------------------------------------------------------


@query(
    "window_rank_analytics",
    """
    SELECT o_orderkey AS orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           first_value(o_orderkey) OVER w AS first_in_status
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.first("o_orderkey").over(w).alias("first_in_status"),
    )


@query(
    "window_range_frame_revenue",
    """
    SELECT yr, mo, month_revenue,
           round(sum(month_revenue) OVER (
               PARTITION BY yr ORDER BY mo
               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS rev_3mo
    FROM (
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS month_revenue
        FROM orders GROUP BY 1, 2
    )
    """,
)
def window_range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(_money_sum(F.col("o_totalprice")).alias("month_revenue"))
    w = Window.partitionBy("yr").orderBy("mo").rangeBetween(-1, 1)
    return monthly.select(
        "yr",
        "mo",
        "month_revenue",
        F.round(F.sum("month_revenue").over(w), 2).alias("rev_3mo"),
    )


@query(
    "funnel_view_click_purchase",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t0
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t1
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, users FROM (
        SELECT 1 AS ord, 'view' AS stage, count(*) AS users FROM v
        UNION ALL
        SELECT 2, 'view>click', count(*) FROM c
        UNION ALL
        SELECT 3, 'view>click>purchase', count(*) FROM p
    ) ORDER BY ord
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users whose first view precedes a
    click that precedes a purchase. Each stage is one conditional
    min-aggregation joined to the previous stage's anchor time — three
    hash-aggs + two equi-joins on user_id, no window over the raw
    event stream, no self-join explosion; at 100 TB the per-stage
    state is one row per surviving user."""
    e = load_table(spark, sf_dir, "events")

    def first_after(event_type: str, anchor: DataFrame, anchor_ts: str, out_ts: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == event_type)
            .join(anchor, "user_id")
            .filter(F.col("ts") > F.col(anchor_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = first_after("click", v, "t0", "t1")
    p = first_after("purchase", c, "t1", "t2")
    stages = (
        v.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(1).alias("ord"), F.lit("view").alias("stage"), "users"
        )
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(2).alias("ord"), F.lit("view>click").alias("stage"), "users"
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(3).alias("ord"),
                F.lit("view>click>purchase").alias("stage"),
                "users",
            )
        )
    )
    return stages.orderBy("ord").select("stage", "users")


@query(
    "window_sessionize_events",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4)
               AS total_value
    FROM numbered GROUP BY 1, 2
    """,
)
def window_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 6-hour-gap session boundaries via
    lag + cumulative-sum windows, then per-session aggregates — the
    batch twin of streaming session_window (streaming/windows.py).
    One shuffle on user_id serves both windows and the final agg.
    Money-style micro-units sum keeps the float total order-stable."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ-safe epoch: events.ts may read as TIMESTAMP_NTZ (Spark 4
    # parquet inference) and unix_micros rejects NTZ; the cast is a
    # wall-clock identity under UTC and differences are tz-invariant.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    flagged = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 6 * 3600 * 1_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")) / 1_000_000.0, 4
        ).alias("total_value"),
    )


@query(
    "window_ntile_deciles",
    """
    SELECT c_custkey, c_mktsegment,
           ntile(10) OVER w AS decile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile/percent_rank/cume_dist per market
    segment. Total order (balance, key) makes every rank value
    engine-independent."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_order_gap_days",
    """
    SELECT o_orderkey AS orderkey,
           date_diff('day',
               CAST(lag(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS DATE),
               CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    """,
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap per customer: lag + datediff — the
    order-history feature a churn model reads. One shuffle on the
    partition key; NULL for each customer's first order."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("gap_days"),
    )


@query(
    "window_first_last_frame",
    """
    SELECT o_orderkey AS orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_in_frame,
           round(last_value(o_totalprice) OVER w, 2)  AS last_in_frame
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
    )
    """,
)
def window_first_last_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over a bounded ROWS frame (trailing
    3-row window) — the moving-endpoint reads that RANGE frames and
    running sums don't cover."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_in_frame"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_in_frame"),
    )


@query(
    "window_qualify_latest_order",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           round(o_totalprice, 2) AS totalprice
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
    """,
)
def window_qualify_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key (the QUALIFY idiom): row_number over a
    descending order, keep rank 1. The workhorse of CDC compaction
    and snapshot dedup; one shuffle, per-group local sort."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


@query(
    "events_interarrival_stats",
    """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    )
    SELECT user_id,
           round(avg(gap_us) / 1e6, 3) AS avg_gap_s,
           round(max(gap_us) / 1e6, 3) AS max_gap_s,
           count(*) AS n_gaps
    FROM g
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival statistics: lag over event time, then
    one hash agg. Gaps stay INTEGER microseconds through the sum
    (exact, order-independent — double summation would drift between
    engines); division to seconds happens after. The NTZ cast is the
    Spark-4 parquet timestamp gotcha (streaming/windows.py)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select("user_id", (us - F.lag(us).over(w)).alias("gap_us"))
    return (
        g.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(F.avg("gap_us") / 1e6, 3).alias("avg_gap_s"),
            F.round(F.max("gap_us") / 1e6, 3).alias("max_gap_s"),
            F.count(F.lit(1)).alias("n_gaps"),
        )
    )


@query(
    "window_range_time_30d",
    """
    SELECT o_orderkey AS orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ), 2) AS spend_30d
    FROM orders
    """,
)
def window_range_time_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer: a RANGE frame bounded by a
    TIME interval, not a row count — the moving-window shape behind
    rolling revenue/MAU metrics. RANGE treats same-date orders as
    peers (all included), so the result is deterministic even with
    duplicate order dates. Expressed through the SQL entry because
    the DataFrame rangeBetween API takes only numeric offsets."""
    from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
        register_views,
    )

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey AS orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ), 2) AS spend_30d
        FROM orders
        """
    )


@query(
    "timeseries_gap_fill_daily",
    """
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1
    ),
    days AS (
        SELECT user_id,
               CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM span
    ),
    joined AS (
        SELECT d.user_id, d.day, dl.v,
               CASE WHEN dl.v IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM days d LEFT JOIN daily dl USING (user_id, day)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           is_gap
    FROM joined
    """,
)
def timeseries_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification + forward fill: each user's daily
    spend series is completed to EVERY calendar day between their
    first and last active day (sequence + explode — generated rows,
    no join against a calendar table), missing days flagged and
    forward-filled with ``last(v, ignorenulls)`` over the per-user
    ordered frame. The gap-generation fan-out is bounded by each
    user's own span, and the fill window sorts WITHIN user partitions
    only — both properties hold when users number in the billions.
    The first day per user is never null (the span starts at an
    observed day), so the fill is total."""
    # lazy localCheckpoint: daily feeds BOTH the span aggregate and
    # the gap left-join — without it each branch re-runs the events
    # scan + agg (same two-consumer pattern as bm25_scores' token
    # stream)
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.round(F.sum("value"), 2).alias("v"))
        .localCheckpoint(eager=False)
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    days = span.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = days.join(daily, ["user_id", "day"], "left").withColumn(
        "is_gap", F.when(F.col("v").isNull(), 1).otherwise(0)
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("is_gap").cast("int").alias("is_gap"),
    )


@query(
    "window_ewma_user_value",
    """
    WITH seq AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           round(sum(CASE WHEN rn = 1 THEN pow(0.9, n - 1) * value
                          ELSE 0.1 * pow(0.9, n - rn) * value END), 4)
               AS ewma
    FROM seq GROUP BY 1
    """,
)
def window_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event value
    (y_i = 0.9·y_{i-1} + 0.1·x_i, y_1 = x_1) — the standard smoothed-
    signal feature for user activity models. The recurrence is
    SEQUENTIAL state, which naive Spark would fold in a single-task
    loop; here it is algebraically unrolled into its closed form
    y_n = 0.9^{n-1}·x_1 + 0.1·Σ 0.9^{n-i}·x_i, which is one ranked
    window plus one order-independent weighted SUM — fully parallel,
    two shuffles on the user key, no state store. The same unrolling
    is how any linear recurrence (decay counters, leaky integrators,
    discounted returns) distributes."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    seq = e.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    term = F.when(
        F.col("rn") == 1, F.pow(F.lit(0.9), F.col("n") - 1) * F.col("value")
    ).otherwise(
        F.lit(0.1) * F.pow(F.lit(0.9), F.col("n") - F.col("rn")) * F.col("value")
    )
    return seq.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.round(F.sum(term), 4).alias("ewma"),
    )


@query(
    "events_funnel_conversion",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t1
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
         AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 2 DAY
        WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
         AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 2 DAY
        WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS users FROM v
    UNION ALL
    SELECT 'view>click', CAST(count(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis with a conversion window: users who
    viewed, then clicked strictly after their first view AND within 2
    days of it, then purchased within 2 days of that first qualifying
    click — the sequencing + window constraints are what separate a
    funnel from three independent counts (a purchase before the view,
    or a week later, must not convert; at the fixture the stages are
    150 -> 96 -> 58, so both constraints bind). Each stage is one
    map-side-combinable min-agg plus an equi-join on user_id; the
    stage joins shrink monotonically, so the chain costs less than
    the first scan and nothing buffers per-user event lists."""
    win = F.expr("INTERVAL 2 DAYS")
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(label).alias("stage"), "users"
        )

    return (
        stage(v, "view")
        .unionByName(stage(c, "view>click"))
        .unionByName(stage(p, "view>click>purchase"))
    )


@query(
    "events_sequence_pattern",
    """
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'v[cse]*p')) AS INT) AS n_funnels,
           len(regexp_extract_all(seq, 'v[cse]*p')) > 0 AS matched
    FROM seqs
    """,
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching, Spark-first:
    per user, the time-ordered event-type initials collapse into one
    string (collect_list of (ts, event_id, type) structs, array_sort
    — the struct sort makes ties deterministic — then a transform to
    initials), and the row pattern V (NOT P)* P becomes the regex
    'v[cse]*p' counted with regexp_count. Non-overlapping greedy
    scanning is identical between Java regex and DuckDB's RE2 for
    this alternation-free pattern, so the count is fully
    oracle-checked. Scale shape: one groupBy(user) shuffle; the
    per-key sequence is bounded by a user's event count (sessionize
    first for unbounded keys) — no window over the whole timeline,
    no self-join over event pairs (compare events_funnel_conversion,
    which counts a 3-step funnel via min-timestamps; this matches an
    arbitrary regex program over the full sequence)."""
    e = load_table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: F.substring(s["event_type"], 1, 1),
            ),
        ).alias("seq")
    )
    n = F.regexp_count(F.col("seq"), F.lit("v[cse]*p"))
    return seq.select(
        "user_id",
        F.length("seq").cast("int").alias("seq_len"),
        n.cast("int").alias("n_funnels"),
        (n > 0).alias("matched"),
    )
