"""Aggregation surface: full agg set, sketches, profiling, anomaly scoring.

Split from the original single-file registry (r8); every query keeps
its exact name, body, and oracle — `tools/parity_local.py` guards the
registry contract across the split.
"""

from __future__ import annotations

from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _CMS_BUCKET_SQL,
    _money_sum,
    load_table,
    query,
)


@query(
    "agg_rollup_returns",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "cnt",
            "sum_qty",
        )
    )


@query(
    "agg_cube_orders",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS cnt,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "cnt",
            "avg_price",
        )
    )


@query(
    "agg_distinct_suppliers",
    """
    SELECT l_returnflag AS returnflag,
           count(DISTINCT l_suppkey) AS distinct_suppliers,
           count(DISTINCT l_partkey) AS distinct_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
    )


@query(
    "profile_orders",
    """
    WITH m AS (
        SELECT count(*) AS n,
               count(*) - count(o_custkey) AS nulls_cust,
               count(DISTINCT o_orderpriority) AS d_prio,
               count(DISTINCT o_orderstatus) AS d_status,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price,
               round(avg(o_totalprice), 2) AS avg_price,
               CAST(min(o_orderdate) AS VARCHAR) AS min_date,
               CAST(max(o_orderdate) AS VARCHAR) AS max_date
        FROM orders
    )
    SELECT metric, value FROM (
        SELECT 'row_count' AS metric, CAST(n AS VARCHAR) AS value FROM m
        UNION ALL SELECT 'null_custkeys', CAST(nulls_cust AS VARCHAR) FROM m
        UNION ALL SELECT 'distinct_priorities', CAST(d_prio AS VARCHAR) FROM m
        UNION ALL SELECT 'distinct_statuses', CAST(d_status AS VARCHAR) FROM m
        UNION ALL SELECT 'min_totalprice', CAST(min_price AS VARCHAR) FROM m
        UNION ALL SELECT 'max_totalprice', CAST(max_price AS VARCHAR) FROM m
        UNION ALL SELECT 'avg_totalprice', CAST(avg_price AS VARCHAR) FROM m
        UNION ALL SELECT 'min_orderdate', min_date FROM m
        UNION ALL SELECT 'max_orderdate', max_date FROM m
    )
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data profiling — the pre-ingestion sanity report a
    training pipeline runs before trusting a table: row count, null
    counts, distinct cardinalities, numeric ranges and means, date
    bounds, all from ONE aggregation (single scan, map-side partial)
    unpivoted to long (metric, value) form."""
    o = load_table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("nulls_cust"),
        F.countDistinct("o_orderpriority").alias("d_prio"),
        F.countDistinct("o_orderstatus").alias("d_status"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.min("o_orderdate").cast("string").alias("min_date"),
        F.max("o_orderdate").cast("string").alias("max_date"),
    )
    pairs = [
        ("row_count", "n"),
        ("null_custkeys", "nulls_cust"),
        ("distinct_priorities", "d_prio"),
        ("distinct_statuses", "d_status"),
        ("min_totalprice", "min_price"),
        ("max_totalprice", "max_price"),
        ("avg_totalprice", "avg_price"),
        ("min_orderdate", "min_date"),
        ("max_orderdate", "max_date"),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("metric"),
                F.col(col).cast("string").alias("value"),
            )
            for name, col in pairs
        ]
    )
    return (
        m.select(F.explode(rows).alias("r"))
        .select(F.col("r.metric").alias("metric"), F.col("r.value").alias("value"))
    )


@query(
    "anomaly_zscore_events",
    """
    WITH stats AS (
        SELECT event_type,
               avg(value) AS mu,
               stddev_samp(value) AS sigma
        FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type, round(e.value, 4) AS value,
           round((e.value - s.mu) / s.sigma, 4) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE abs(round((e.value - s.mu) / s.sigma, 4)) >= 2.5
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type: one aggregation for
    (mean, sample stddev), broadcast back onto the stream, filter on
    the rounded score. The grouped-stats side is one row per event
    type, so the join never shuffles the fact table when AQE
    broadcasts it — the plan a 100 TB anomaly scan needs."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) >= 2.5)
    )


# --------------------------------------------------------------------------
# Second relational batch: HAVING, correlated EXISTS, median/percentiles,
# UNION ALL / INTERSECT ALL, CASE/null handling, array & map function
# coverage, explode, and the spark.sql entry point over registered views.
# --------------------------------------------------------------------------


@query(
    "agg_having_active_parts",
    """
    SELECT l_partkey AS partkey, count(*) AS line_cnt,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 40
    """,
)
def agg_having_active_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .filter(F.col("line_cnt") >= 40)
    )


@query(
    "agg_median_percentiles",
    """
    SELECT o_orderstatus AS status,
           round(median(o_totalprice), 4) AS med_price,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p25,
           round(percentile_cont(0.90) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_median_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.round(F.median("o_totalprice"), 4).alias("med_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.90)), 4).alias("p90"),
    )


@query(
    "agg_grouping_sets",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(CAST(year(l_shipdate) AS VARCHAR), 'ALL') AS ship_year,
           count(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (DataFrame API only
    exposes rollup/cube; the engine's SQL entry covers the rest)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(CAST(year(l_shipdate) AS STRING), 'ALL') AS ship_year,
               count(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)), ())
        """
    )


@query(
    "agg_approx_count_distinct",
    """
    SELECT l_returnflag AS returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS sketch_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the sketch estimate is
    engine-specific, so the oracle-checked columns are the exact
    distinct count plus ``sketch_within_tol`` — whether Spark's HLL++
    estimate (rsd=0.02) lands within 3*rsd of the exact count. The
    oracle asserts TRUE, making the sketch's accuracy contract (not
    its engine-specific value) the thing the driver verifies."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.06 * F.col("exact_parts")
            ).alias("sketch_within_tol"),
        )
    )


@query(
    "agg_approx_percentile",
    """
    SELECT l_returnflag AS returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50,
           round(quantile_cont(l_extendedprice, 0.9), 2) AS exact_p90,
           TRUE AS sketch_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch): like the HLL++ query, the
    sketch value is engine-specific, so the oracle-checked columns are
    the EXACT interpolated percentiles plus ``sketch_within_tol`` —
    whether Spark's approx estimate (accuracy=10000, i.e. rank error
    ~1e-4) lands within 1%% of the exact value. The sketch is the
    100-TB path (one pass, mergeable, no global sort); the exact twin
    is the correctness anchor."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.9], 10000).alias("ap"),
            F.expr(
                "percentile(l_extendedprice, array(0.5D, 0.9D))"
            ).alias("ex"),
        )
        .select(
            "returnflag",
            F.round(F.element_at("ex", 1), 2).alias("exact_p50"),
            F.round(F.element_at("ex", 2), 2).alias("exact_p90"),
            (
                (
                    F.abs(F.element_at("ap", 1) - F.element_at("ex", 1))
                    <= 0.01 * F.abs(F.element_at("ex", 1))
                )
                & (
                    F.abs(F.element_at("ap", 2) - F.element_at("ex", 2))
                    <= 0.01 * F.abs(F.element_at("ex", 2))
                )
            ).alias("sketch_within_tol"),
        )
    )


@query(
    "agg_statistics",
    """
    SELECT o_orderstatus AS status,
           round(stddev_samp(o_totalprice), 4) AS sd,
           round(var_samp(o_totalprice) / 1000000.0, 4) AS vr,
           round(skewness(o_totalprice) * (count(*) - 2)
                 / sqrt(count(*) * (count(*) - 1.0)), 6) AS skew,
           round(kurtosis_pop(o_totalprice), 6) AS kurt,
           round(corr(o_totalprice, o_custkey), 6) AS price_cust_corr,
           round(covar_samp(o_totalprice, o_custkey), 2) AS price_cust_cov
    FROM orders
    GROUP BY 1
    """,
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family (moments, correlation)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
        F.round(F.var_samp("o_totalprice") / 1000000.0, 4).alias("vr"),
        F.round(F.skewness("o_totalprice"), 6).alias("skew"),
        F.round(F.kurtosis("o_totalprice"), 6).alias("kurt"),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("price_cust_corr"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("price_cust_cov"),
    )


# --------------------------------------------------------------------------
# Round-4 widening: FILTER-clause aggregates, arg_max/arg_min, GROUPING()
# flags, sorted collect_set, multi-column distinct counts, window frames
# (gap / first-last / qualify-latest), bitwise + trig scalars, regex
# counts, inter-arrival stats, EXCEPT ALL, the crash-atomic bucketed
# update e2e, and the audio half of the multimodal plumbing.
# --------------------------------------------------------------------------


@query(
    "agg_filtered_conditional",
    """
    SELECT o_orderpriority AS priority,
           count(*) FILTER (WHERE o_totalprice > 200000)                 AS n_big,
           round(avg(o_totalprice) FILTER (WHERE year(o_orderdate) >= 1997), 2) AS avg_recent,
           count(*)                                                     AS n
    FROM orders
    GROUP BY 1
    """,
)
def agg_filtered_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (FILTER-clause) aggregates: count/avg restricted to
    a predicate inside one hash aggregate — one scan, one shuffle, no
    self-join. Spark expresses FILTER as count(when)/avg(when): when()
    yields NULL outside the predicate and count/avg skip NULLs, which
    is exactly FILTER's semantics."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        F.round(
            F.avg(F.when(F.year("o_orderdate") >= 1997, F.col("o_totalprice"))), 2
        ).alias("avg_recent"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_argmax_by_nation",
    """
    SELECT c_nationkey AS nationkey,
           arg_max(c_custkey, c_acctbal) AS richest_custkey,
           arg_min(c_custkey, c_acctbal) AS poorest_custkey,
           round(max(c_acctbal), 2)      AS max_bal
    FROM customer
    GROUP BY 1
    """,
)
def agg_argmax_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max/arg_min (max_by/min_by): the row-attribute-at-extreme
    aggregate, one hash agg instead of the window-rank-filter detour.
    Deterministic here because acctbal is tie-free per nation in the
    fixtures (verified); with ties both engines pick an arbitrary
    winner and a tiebreak struct key would be required."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.max_by("c_custkey", "c_acctbal").alias("richest_custkey"),
        F.min_by("c_custkey", "c_acctbal").alias("poorest_custkey"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@query(
    "agg_grouping_id_rollup",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL')   AS status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT)   AS g_status,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() flags on a rollup: distinguishes a real NULL group
    key from a super-aggregate row — the standard way BI layers read
    rollup output (coalesce alone is ambiguous when data contains the
    sentinel)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "g_priority",
            "g_status",
            "n",
        )
    )


@query(
    "agg_collect_sorted_segments",
    """
    SELECT c_nationkey AS nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments,
           count(DISTINCT c_mktsegment) AS n_segments
    FROM customer
    GROUP BY 1
    """,
)
def agg_collect_sorted_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> array_sort -> array_join: deterministic grouped
    list aggregation. The sort makes the set order-independent (a raw
    collect_set depends on partition arrival order and can never be
    hash-compared), the join makes it trivially comparable."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
            "segments"
        ),
        F.count_distinct("c_mktsegment").alias("n_segments"),
    )


@query(
    "agg_count_distinct_pairs",
    """
    SELECT o_orderpriority AS priority,
           count(DISTINCT (o_custkey, o_orderstatus)) AS n_pairs,
           count(*) AS n
    FROM orders
    GROUP BY 1
    """,
)
def agg_count_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT(DISTINCT a, b): distinct on the tuple, not
    per column — one expand-free distinct aggregate per group."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count_distinct("o_custkey", "o_orderstatus").alias("n_pairs"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_hll_sketch_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS sketch_within_tol
    FROM events
    GROUP BY event_type
    """,
)
def agg_hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL (hll_sketch_agg / hll_sketch_estimate): unlike
    approx_count_distinct, the sketch itself is a mergeable binary
    column — the 100-TB pattern is per-partition/per-day sketches
    unioned later (hll_union_agg) without rescanning. Same oracle
    contract as the HLL++ query: the exact twin plus a
    within-tolerance boolean the driver asserts TRUE (lgConfigK=14
    -> rse ~0.8%; 5% tolerance is >6 sigma)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(
                    0.05 * F.col("exact_users"), F.lit(2.0)
                )
            ).alias("sketch_within_tol"),
        )
    )


@query(
    "agg_approx_quantile_sketch",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50,
           round(quantile_cont(l_extendedprice, 0.95), 2) AS exact_p95,
           TRUE AS sketch_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (``percentile_approx``, the
    Greenwald-Khanna-style mergeable summary) vs the exact
    interpolated percentile, same oracle contract as the HLL queries:
    the exact twin is hash-checked and a within-tolerance boolean
    covers the sketch (accuracy 10000 => rank error <= 1e-4; the 1%
    VALUE tolerance is generous next to that). The 100 TB point:
    exact quantiles need a full sort or per-group materialization,
    while the sketch is a bounded map-side-combinable state — this is
    how percentile dashboards survive scale."""
    li = load_table(spark, sf_dir, "lineitem")
    exact_p50 = F.round(F.percentile("l_extendedprice", F.lit(0.5)), 2)
    exact_p95 = F.round(F.percentile("l_extendedprice", F.lit(0.95)), 2)
    approx = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            exact_p50.alias("exact_p50"),
            exact_p95.alias("exact_p95"),
            approx.alias("_apx"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            "exact_p95",
            (
                (
                    F.abs(F.element_at("_apx", 1) - F.col("exact_p50"))
                    <= 0.01 * F.col("exact_p50")
                )
                & (
                    F.abs(F.element_at("_apx", 2) - F.col("exact_p95"))
                    <= 0.01 * F.col("exact_p95")
                )
            ).alias("sketch_within_tol"),
        )
    )


@query(
    "agg_mode_ship_priority",
    """
    SELECT o_orderpriority,
           mode(l_returnflag ORDER BY l_returnflag) AS top_returnflag,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def agg_mode_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mode()`` — the most frequent value per group (Spark 4 /
    DuckDB both ship it natively). Ties are broken deterministically:
    Spark's mode(deterministic=true) returns the LOWEST value among
    the tied maxima and DuckDB's ORDER BY inside the aggregate pins
    the same choice, so the hash compare is tie-safe."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.mode("l_returnflag", True).alias("top_returnflag"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "profile_histogram_orders",
    """
    SELECT CAST(least(floor(o_totalprice / 50000) + 1, 10) AS BIGINT) AS bucket,
           count(*) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders
    GROUP BY 1
    """,
)
def profile_histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the skew-visibility
    profile run before choosing partition counts / salting for a new
    table. One partial-agg pass, 10 output rows regardless of input
    size. DuckDB lacks width_bucket, so the oracle states the
    equivalent floor arithmetic (bounds chosen so no row falls in the
    overflow bucket: fixture max 499,978 < 500,000)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket",
            F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(500000.0), F.lit(10))
            .cast("bigint"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), _money_sum(F.col("o_totalprice")).alias("total"))
    )


@query(
    "agg_bitmap_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5+
    bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_count) — the mergeable-and-exact alternative to both
    COUNT(DISTINCT) (full shuffle of raw ids) and HLL (approximate).
    Ids fold into fixed 4 KB bitmap buckets map-side, so the shuffle
    carries one bitmap per (group, bucket) instead of one row per
    distinct id — the same pre-aggregation shape a 100 TB distinct
    count needs. The oracle is the plain COUNT(DISTINCT): the bitmap
    pipeline must reproduce it exactly."""
    e = load_table(spark, sf_dir, "events")
    per_bucket = (
        e.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("cnt"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("cnt").alias("n_users")
    )


@query(
    "agg_regression_exact_sums",
    """
    WITH pts AS (
        SELECT event_type,
               epoch_us(ts) - 1704067200000000 AS x,
               CAST(round(value * 100) AS BIGINT) AS cy
        FROM events
    ),
    sums AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(sum(CAST(cy AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * cy) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sx2,
               CAST(sum(CAST(cy AS HUGEINT) * cy) AS DOUBLE) AS sy2
        FROM pts GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           round(((n * sxy - sx * sy) / (n * sx2 - sx * sx))
                 * 86400000000.0 / 100.0, 6) AS slope_per_day,
           round((sy / n - ((n * sxy - sx * sy) / (n * sx2 - sx * sx))
                  * (sx / n)) / 100.0, 6) AS intercept_value,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)),
                 6) AS pearson_r
    FROM sums
    """,
)
def agg_regression_exact_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend (slope/day, intercept, Pearson r) of
    event value over time, computed from OVERFLOW-SAFE EXACT integer
    sums — x as epoch-microsecond offsets, y as integer cents, the
    five moment sums accumulated in decimal(38,0) (HUGEINT in the
    oracle) — so partial-aggregation ORDER cannot change the result:
    floating-point regr_slope differs in the last bits between a
    32-way parallel sum and a sequential one, exact integer moments
    do not. One map-side-combinable hash-agg; the closed-form OLS is
    a projection over 6 numbers per group. This is the 100 TB-safe
    way to fit millions of tiny per-group trends."""
    e = load_table(spark, sf_dir, "events")
    x = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.lit(1_704_067_200_000_000)
    )
    cy = F.round(F.col("value") * 100).cast("bigint")
    dec = "decimal(38,0)"
    pts = e.select(
        "event_type", x.alias("x"), cy.alias("cy")
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("cy").cast(dec)).cast("double").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("cy").cast(dec))
        .cast("double").alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))
        .cast("double").alias("sx2"),
        F.sum(F.col("cy").cast(dec) * F.col("cy").cast(dec))
        .cast("double").alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sx2, sy2 = F.col("sxy"), F.col("sx2"), F.col("sy2")
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    return sums.select(
        "event_type",
        n.cast("bigint").alias("n_events"),
        F.round(slope * 86400000000.0 / 100.0, 6).alias("slope_per_day"),
        F.round((sy / n - slope * (sx / n)) / 100.0, 6).alias("intercept_value"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy)),
            6,
        ).alias("pearson_r"),
    )


@query(
    "sketch_cms_heavy_hitters",
    f"""
    WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    keys AS (
        SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS true_cnt
        FROM lineitem GROUP BY 1
    ),
    top10 AS (
        SELECT key, true_cnt FROM keys
        ORDER BY true_cnt DESC, key LIMIT 10
    ),
    counters AS (
        SELECT j, {_CMS_BUCKET_SQL.format(key='l_partkey')} AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem CROSS JOIN js
        GROUP BY 1, 2
    ),
    probes AS (
        SELECT t.key, t.true_cnt, j,
               {_CMS_BUCKET_SQL.format(key='t.key')} AS bucket
        FROM top10 t CROSS JOIN js
    )
    SELECT p.key, p.true_cnt, min(c.cnt) AS cms_est
    FROM probes p
    JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
    GROUP BY 1, 2
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation (operators/sketch.py):
    the true top-10 parts by line count, each with its exact count and
    its estimate from a 4x256-counter sketch. The sketch build's
    shuffle is bounded by the SKETCH size (map-side partial agg
    collapses to ≤ depth·width rows per partition) — the 100 TB story
    for frequency tracking over unbounded key spaces — and estimates
    are a broadcast probe of the counter table, never a second scan.
    The md5-portable hash family makes every counter and estimate
    bit-reproducible in the oracle; CM's one-sided guarantee
    (est ≥ truth) is asserted in pytest."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem")
    counters = cms_counters(li, "l_partkey", depth=4, width=256)
    top10 = (
        li.groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "key")
        .limit(10)
    )
    return cms_estimate(counters, top10, "key", depth=4, width=256)


@query(
    "agg_incremental_daily_totals",
    """
    SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(round(value * 100) AS BIGINT)), 0) / 100.0
                AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def agg_incremental_daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the daily summary is built by
    MERGING a precomputed partial over the historical slice with a
    partial over the delta slice (algebraic merge of count/sum
    partials — the additive-state property every incremental ETL
    relies on), and the oracle recomputes from the FULL table. At
    100 TB the historical partial is a tiny stored summary, so the
    daily refresh touches only the delta — this query proves the
    merge path is bit-identical to full recompute (counts are exact;
    sums merge in integer cents, so partial order cannot drift)."""
    e = load_table(spark, sf_dir, "events")
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 86400000000.0
    ).cast("bigint")
    cents = F.round(F.col("value") * 100).cast("bigint")
    base = e.select(day.alias("day"), cents.alias("cents"), "event_id")
    # "historical" summary (event_id % 5 != 0) and "delta" batch: the
    # split is arbitrary — the point is the merge algebra.
    def partial(df):
        return df.groupBy("day").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("cents"),
        )

    hist = partial(base.filter(F.col("event_id") % 5 != 0))
    delta = partial(base.filter(F.col("event_id") % 5 == 0))
    return (
        hist.unionByName(delta)
        .groupBy("day")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("cents").alias("_c"),
        )
        .select(
            "day",
            "n_events",
            (F.round(F.col("_c"), 0) / 100.0).cast("double").alias("total_value"),
        )
    )
