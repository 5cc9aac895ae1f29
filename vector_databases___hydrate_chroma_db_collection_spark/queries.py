"""Query inventory — the engine's operator coverage, executable.

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


@query("knn_top5_cosine", _FLAGSHIP_ORACLE)
def knn_top5_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 1).select("embedding").first()["embedding"]
    return (
        knn_query(
            emb.filter(F.col("vec_id") != 1),
            list(qvec),
            k=5,
            id_col="vec_id",
            embedding_col="embedding",
            metric="cosine",
            score_decimals=4,
        )
        .withColumnRenamed("score", "cos_sim")
    )


# --------------------------------------------------------------------------
# Relational surface (SURVEY.md §2.B): project/filter, joins, aggregation.
# Spark side is DataFrame API (Catalyst plans the joins/aggs); oracle side
# is the literal ANSI-SQL twin. Float aggregates are rounded identically.
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0        AS sum_base_price,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS sum_disc_price,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) / 100.0 AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter -> hash aggregate. Partial (map-side)
    aggregation collapses each scan partition to <=6 groups before the
    shuffle, so this is scan-bound at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _money_sum(disc_price).alias("sum_disc_price"),
            _money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    customer is broadcast by AQE (small side); lineitem never shuffles
    more than the filtered join output."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(l.l_orderkey.alias("orderkey"), "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    """
    SELECT n.n_name AS nation,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. All dimension tables broadcast;
    only orders joined lineitem shuffles once on the fact key."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .groupBy(n.n_name.alias("nation"))
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@query(
    "join_left_order_counts",
    """
    SELECT c.c_custkey AS custkey,
           count(o.o_orderkey) AS order_cnt,
           round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@query(
    "join_semi_customers_with_urgent_orders",
    """
    SELECT c_custkey AS custkey, c_mktsegment AS segment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment")
    )


@query(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


@query(
    "join_full_nation_activity",
    """
    WITH cust AS (
        SELECT c_nationkey AS nk, count(*) AS customers FROM customer GROUP BY 1
    ), supp AS (
        SELECT s_nationkey AS nk, count(*) AS suppliers FROM supplier GROUP BY 1
    )
    SELECT coalesce(cust.nk, supp.nk) AS nationkey,
           coalesce(customers, 0) AS customers,
           coalesce(suppliers, 0) AS suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def join_full_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").cast("int").alias("nationkey"),
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
        )
    )


@query(
    "join_range_shipped_within_30d",
    """
    SELECT o.o_orderkey AS orderkey, count(*) AS lines_shipped_30d
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
)
def join_range_shipped_within_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join anchored on an equi key: Catalyst plans the equi part
    as a hash/sort-merge join and evaluates the range residual as a
    post-join filter, so there is no quadratic blow-up."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    )
    return (
        o.join(l, cond)
        .groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(F.count(F.lit(1)).alias("lines_shipped_30d"))
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
    "sort_top10_orders",
    """
    SELECT o_orderkey AS orderkey, o_totalprice AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: plans as TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@query(
    "setop_union_segments",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def setop_union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    return a.union(b).distinct()


@query(
    "setop_intersect_active_years",
    """
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def setop_intersect_active_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return y96.intersect(y97)


@query(
    "setop_except_inactive",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    left = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey")
    )
    right = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return left.exceptAll(right).distinct()


# --------------------------------------------------------------------------
# Scalar function library: string / math / date / JSON / array / map.
# All built-in pyspark.sql.functions — JVM-side, codegen.
# --------------------------------------------------------------------------


@query(
    "scalar_string_part",
    """
    SELECT p_partkey AS partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           p_type || '/' || p_brand AS type_brand,
           replace(p_name, ' ', '_') AS name_snake,
           substring(p_name, 1, 3) AS name_pfx,
           CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END AS is_bolt
    FROM part
    """,
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.substring("p_name", 1, 3).alias("name_pfx"),
        F.when(F.col("p_name").like("%bolt%"), 1).otherwise(0).alias("is_bolt"),
    )


@query(
    "scalar_math_lineitem",
    """
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           round(abs(l_extendedprice - 1000.0), 2) AS abs_diff,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(power(1 + l_tax, 2), 6) AS tax_sq,
           l_partkey % 10 AS part_mod
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_bucket"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_partkey") % 10).alias("part_mod"),
    )


@query(
    "scalar_date_orders",
    """
    SELECT year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           quarter(o_orderdate) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           count(*) AS order_cnt,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS month_revenue
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.quarter("o_orderdate").alias("qtr"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            _money_sum(F.col("o_totalprice")).alias("month_revenue"),
        )
    )


@query(
    "scalar_json_events",
    """
    SELECT event_type,
           count(*) AS cnt,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "scalar_array_embeddings",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS vec_norm,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def scalar_array_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import l2_norm

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vec_sum"),
        F.round(l2_norm("embedding"), 4).alias("vec_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_elem"),
    )


@query(
    "scalar_map_metadata",
    """
    SELECT CAST(doc_id AS VARCHAR) AS id,
           lang AS meta_lang,
           source AS meta_source
    FROM documents
    WHERE doc_id < 50
    """,
)
def scalar_map_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element access (the reference's metadata
    wrapping, sas:181, generalized beyond the hard-coded key)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    with_map = d.select(
        F.col("doc_id").cast("string").alias("id"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("metadata"),
    )
    return with_map.select(
        "id",
        F.element_at("metadata", "lang").alias("meta_lang"),
        F.element_at("metadata", "source").alias("meta_source"),
    )


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


@query(
    "text_stats_by_lang",
    f"""
    SELECT lang,
           count(*) AS cnt,
           round(avg(len({_TOKS.format(x='text')})), 4) AS avg_tokens,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg(T.token_count("text")), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@query(
    "text_quality_scores",
    f"""
    WITH base AS (
        SELECT doc_id,
               len({_TOKS.format(x='text')}) AS tok_cnt,
               length(text) AS char_cnt,
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                   / greatest(length(text), 1) AS praw,
               len(list_filter({_TOKS.format(x='lower(text)')},
                   t -> list_contains({_SW['en']}, t)))::DOUBLE
                   / greatest(len({_TOKS.format(x='lower(text)')}), 1) AS swraw
        FROM documents
    )
    SELECT doc_id, tok_cnt, char_cnt,
           round(praw, 6) AS punct_ratio,
           round(swraw, 6) AS stopword_ratio,
           round(0.4 * least(tok_cnt / 100.0, 1.0)
                 + 0.4 * (1.0 - praw)
                 + 0.2 * least(swraw / 0.1, 1.0), 6) AS quality
    FROM base
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.add_text_features(d).select(
        "doc_id", "tok_cnt", "char_cnt", "punct_ratio", "stopword_ratio", "quality"
    )


@query(
    "text_gopher_filters",
    r"""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws,
               len(regexp_extract_all(text, '#|\.\.\.')) AS n_sym
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(ws) AS n_words,
               round(list_sum(list_transform(ws, w -> length(w)))::DOUBLE
                     / len(ws), 4) AS mean_word_len,
               round(n_sym::DOUBLE / len(ws), 4) AS symbol_ratio,
               round(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                     / len(ws), 4) AS alpha_word_frac,
               len(list_distinct(list_intersect(
                   list_transform(ws, w -> lower(w)),
                   ['the','be','to','of','and','that','have','with']))) >= 1
                   AS has_stopwords
        FROM base
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
           has_stopwords,
           (n_words >= 30 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio < 0.1 AND alpha_word_frac > 0.8
            AND has_stopwords) AS gopher_pass
    FROM m
    """,
)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality gate (Rae et al. 2021, Table A1) over
    the corpus: word-count bounds, mean word length, symbol ratio,
    alphabetic-word fraction, distinct-stopword presence, and the
    combined pass flag — the standard pre-training garbage filter,
    one struct expression in whole-stage codegen (split + HOFs, no
    UDF, no shuffle; the oracle recomputes every rule from the same
    tokenization). Fixture adaptations, both documented: min_words=30
    (fixture docs are 10-99 words) and min_stopword_hits=1 (the
    synthetic vocabulary carries only 'the' from the canonical list)
    so the pass flag actually partitions the corpus; the published
    50..100k / >=2 thresholds are the function's defaults."""
    d = load_table(spark, sf_dir, "documents")
    g = d.withColumn("_g", T.gopher_flags("text", min_words=30, min_stopword_hits=1))
    return g.select(
        "doc_id",
        F.col("_g.n_words").alias("n_words"),
        F.col("_g.mean_word_len").alias("mean_word_len"),
        F.col("_g.symbol_ratio").alias("symbol_ratio"),
        F.col("_g.alpha_word_frac").alias("alpha_word_frac"),
        F.col("_g.has_stopwords").alias("has_stopwords"),
        F.col("_g.gopher_pass").alias("gopher_pass"),
    )


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


@query("text_language_id", _LANGID_ORACLE)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        T.add_text_features(d)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           md5({_NORM}) AS fp_md5,
           sha256({_NORM}) AS fp_sha256
    FROM documents
    WHERE doc_id < 100
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    norm = T.normalize_text("text")
    return d.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fp_md5"),
        F.sha2(norm.cast("binary"), 256).alias("fp_sha256"),
    )


# BPE-ish pre-tokenizer split (functions/text.py::BPE_REGEX): ASCII
# letter/digit/punct runs with optional leading space — identical
# between Java regex and RE2, so the count is fully oracle-checked.
_BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


@query(
    "text_bpe_token_counts",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe_tok_cnt,
           len({_TOKS.format(x='text')}) AS ws_tok_cnt,
           round(CAST(length(text) AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '{_BPE_RE}')), 1),
                 4) AS chars_per_bpe_tok
    FROM documents
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting for training pipelines: whitespace tokens vs a
    BPE-ish pre-tokenizer split. Pure projection — no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    bpe = T.bpe_token_count("text")
    return d.select(
        "doc_id",
        bpe.alias("bpe_tok_cnt"),
        T.token_count("text").alias("ws_tok_cnt"),
        F.round(
            F.length("text").cast("double") / F.greatest(bpe, F.lit(1)), 4
        ).alias("chars_per_bpe_tok"),
    )


@query(
    "sample_hash_deterministic",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_HASH64.format(x='CAST(doc_id AS VARCHAR)')} % 1000 < 100
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10% sample by hash-mod on the id — the scale-safe
    alternative to rand()-sampling: deterministic across runs/engines,
    no seed coordination, pushes down to the scan as a plain filter,
    and the same predicate selects the same rows on any engine
    (here proven by the DuckDB oracle selecting identical doc_ids)."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(1000)) < 100
    ).select("doc_id", "lang")


@query(
    "sample_weighted_by_quality",
    f"""
    WITH base AS (
        SELECT doc_id,
               len({_TOKS.format(x='text')}) AS tok_cnt,
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                   / greatest(length(text), 1) AS praw,
               len(list_filter({_TOKS.format(x='lower(text)')},
                   t -> list_contains({_SW['en']}, t)))::DOUBLE
                   / greatest(len({_TOKS.format(x='lower(text)')}), 1) AS swraw
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               round(0.4 * least(tok_cnt / 100.0, 1.0)
                     + 0.4 * (1.0 - praw)
                     + 0.2 * least(swraw / 0.1, 1.0), 6) AS quality
        FROM base
    )
    SELECT doc_id, quality
    FROM scored
    WHERE {_HASH64.format(x='CAST(doc_id AS VARCHAR)')} % 1000000
          < CAST(floor(quality * quality * 1000000) AS BIGINT)
    """,
)
def sample_weighted_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling — the training-mix
    primitive (upweight clean documents, downweight boilerplate)
    without rand(): each doc keeps with probability quality², decided
    by comparing an id-hash draw in [0, 1e6) against the scaled
    weight. Reproducible across runs AND engines (the DuckDB oracle
    selects the identical rows), embarrassingly parallel, and the
    predicate is a plain filter over a projection — no shuffle, no
    seed coordination, no sort. The same shape handles temperature
    sampling (weight = p^(1/T)) by swapping the weight expression."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    d = load_table(spark, sf_dir, "documents")
    q = F.round(T.quality_score("text"), 6)
    # floor() on BOTH sides: DuckDB's double->bigint cast rounds while
    # Spark's truncates — an explicit floor pins the boundary.
    draw = F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(1_000_000))
    keep = draw < F.floor(q * q * 1_000_000).cast("bigint")
    return d.select("doc_id", q.alias("quality"), draw.alias("_draw"), keep.alias("_k")) \
        .filter(F.col("_k")).select("doc_id", "quality")


_STRATA_RATES = {"en": 100, "es": 300, "fr": 300, "de": 300, "zh": 300}


@query(
    "sample_stratified_by_lang",
    f"""
    WITH rates(lang, permille) AS (
        VALUES {", ".join(f"('{k}', {v})" for k, v in sorted(_STRATA_RATES.items()))}
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {_HASH64.format(x='CAST(d.doc_id AS VARCHAR)')} % 1000 < r.permille
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling (rebalance a skewed-language corpus):
    per-stratum hash-mod thresholds via a broadcast-joined rates dim.
    At 100 TB this stays a scan + broadcast hash join — the rates
    table is O(#strata) — with the filter applied pre-shuffle."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    d = load_table(spark, sf_dir, "documents")
    rates = d.sparkSession.createDataFrame(
        sorted(_STRATA_RATES.items()), ["lang", "permille"]
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(1000)) < F.col("permille"))
        .select("doc_id", "lang")
    )


@query(
    "dedup_exact_groups",
    f"""
    SELECT md5({_NORM}) AS fingerprint,
           min(doc_id) AS keep_id,
           count(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(d, id_col="doc_id", text_col="text")


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


@query(
    "dedup_jaccard_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) AS jaccard
    FROM shared
    JOIN sizes s1 ON s1.doc_id = id_a
    JOIN sizes s2 ON s2.doc_id = id_b
    WHERE round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) >= 0.5
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(d, id_col="doc_id", text_col="text", n=3, threshold=0.5)


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


@query(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    shsets AS (
        SELECT doc_id, list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS sh_list
        FROM toks
    ),
    bases AS (SELECT doc_id, {_MINHASH_BASE} AS base FROM shsets),
    sigs AS (SELECT doc_id, {_MINHASH_SIG} AS sig FROM bases),
    buckets AS (
        SELECT doc_id, b, {_BAND_H} AS h
        FROM sigs, unnest(range(0, 8)) AS bt(b)
    ),
    cand AS (
        SELECT x.doc_id AS id_a, y.doc_id AS id_b
        FROM buckets x JOIN buckets y
          ON x.b = y.b AND x.h = y.h AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    ),
    shared AS (
        SELECT c.id_a, c.id_b, count(*) AS c
        FROM cand c
        JOIN shing a ON a.doc_id = c.id_a
        JOIN shing b ON b.doc_id = c.id_b
         AND ({_HASH64.format(x='b.s')} % {MINHASH_P})
           = ({_HASH64.format(x='a.s')} % {MINHASH_P})
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) AS jaccard
    FROM shared
    JOIN sizes s1 ON s1.doc_id = id_a
    JOIN sizes s2 ON s2.doc_id = id_b
    WHERE round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) >= 0.5
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        d,
        id_col="doc_id",
        text_col="text",
        n=3,
        num_hashes=16,
        bands=8,
        threshold=0.5,
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


@query(
    "dedup_simhash_values",
    f"""
    WITH th AS (
        SELECT doc_id,
               list_transform({_TOKS.format(x=_NORM)},
                   t -> {_HASH64.format(x='t')}) AS tok_hashes
        FROM documents
        WHERE doc_id < 200
    )
    SELECT doc_id, CAST({{terms}} AS BIGINT) AS simhash FROM th
    """.replace("{terms}", _simhash_sql_terms()),
)
def dedup_simhash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import simhash16

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select("doc_id", simhash16("text").alias("simhash"))


@query(
    "dedup_simhash_hamming_pairs",
    f"""
    WITH th AS (
        SELECT doc_id,
               list_transform({_TOKS.format(x=_NORM)},
                   t -> {_HASH64.format(x='t')}) AS tok_hashes
        FROM documents
    ),
    sh AS (SELECT doc_id, CAST({{terms}} AS BIGINT) AS simhash FROM th)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """.replace("{terms}", _simhash_sql_terms()),
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup at Hamming distance <= 3 via pigeonhole
    banding (operators/dedup.py::simhash_hamming_pairs): 4 contiguous
    bands of the 16-bit fingerprint generate candidates through
    equi-joins (a pair within distance 3 must agree exactly on >= 1
    band), bit_count(xor) verifies. The brute-force all-pairs SQL is
    the oracle, so the banding's exact-recall guarantee is what is
    actually checked."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_hamming_pairs(
        d, id_col="doc_id", text_col="text", max_distance=3
    )


@query(
    "text_tfidf_top_terms",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS.format(x=_NORM)}) AS token
        FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfq AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, token,
               round(tf * ln(n_docs::DOUBLE / dfreq), 4) AS tfidf
        FROM tf JOIN dfq USING (token) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, token, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, token) AS rank
        FROM scored
    )
    SELECT doc_id, token, tfidf, rank FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — the classic distinctive-term
    extractor for corpus triage. Three map-side-combinable hash aggs
    (term frequency, document frequency, corpus size), one equi-join
    on token, a broadcast of the single-row corpus count, and one
    bounded per-doc window; every expression codegen. Rank is over
    the ROUNDED score (ties broken by token) so ordering is
    engine-portable."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        normalize_text,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(normalize_text("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfq, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("dfreq")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


_COS_DOUBLE = """
list_sum(list_transform(list_zip({a}, {b}),
         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
/ (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


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
    "pack_sequences_by_token_budget",
    f"""
    WITH counted AS (
        SELECT doc_id, len({_TOKS.format(x=_NORM)}) AS tok_cnt
        FROM documents
    ),
    binned AS (
        SELECT doc_id, tok_cnt,
               CAST(floor((sum(tok_cnt) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           ) / 2048.0) AS BIGINT) AS seq_id
        FROM counted
    )
    SELECT coalesce(seq_id, 0) AS seq_id,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(tok_cnt) AS BIGINT) AS tokens
    FROM binned GROUP BY 1
    """,
)
def pack_sequences_by_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: documents are laid into
    ~2048-token training sequences in deterministic doc_id order —
    a doc's sequence id is floor(preceding-token-cumsum / budget),
    i.e. contiguous greedy fill. The running sum uses the
    distributed two-level prefix scan (relational.prefix_sum: range
    partition -> parallel local cumsum -> broadcast partition
    offsets), NOT a single-task global window — the oracle's
    single-order window is the semantic spec, the engine plan is the
    scale-correct one. Output: per-sequence doc and token counts."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        prefix_sum,
    )

    d = load_table(spark, sf_dir, "documents")
    counted = d.select("doc_id", T.token_count("text").alias("tok_cnt"))
    binned = prefix_sum(
        counted, order_col="doc_id", value_col="tok_cnt", out_col="_before"
    ).withColumn("seq_id", F.floor(F.col("_before") / 2048.0).cast("bigint"))
    return binned.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("tok_cnt").cast("bigint").alias("tokens"),
    )


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH {_SHINGLES_CTE},
    eval_sh AS (SELECT doc_id, s FROM shing WHERE doc_id % 97 = 0),
    train_sh AS (SELECT doc_id, s FROM shing WHERE doc_id % 97 <> 0),
    hits AS (
        SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
               count(DISTINCT t.s) AS shared_shingles
        FROM train_sh t JOIN eval_sh e ON t.s = e.s
        GROUP BY 1, 2
    )
    SELECT train_doc, eval_doc, CAST(shared_shingles AS BIGINT) AS shared_shingles
    FROM hits WHERE shared_shingles >= 3
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents sharing >= 3
    distinct 3-gram shingles with any held-out eval document (here the
    doc_id %% 97 == 0 slice plays the eval set; the threshold sits
    where the fixture yields hits, so the parity check is
    non-vacuous). The inverted shingle
    join is the same bounded-posting-list shape as the Jaccard dedup
    — the eval side is tiny, so at scale the join broadcasts and the
    sweep is one pass over the training corpus's shingles."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        word_shingles,
    )

    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(word_shingles("text", 3))).alias("s")
    )
    ev = F.col("doc_id") % 97 == 0
    train = sh.filter(~ev).select(F.col("doc_id").alias("train_doc"), "s")
    eval_ = sh.filter(ev).select(F.col("doc_id").alias("eval_doc"), "s")
    return (
        train.join(F.broadcast(eval_), "s")
        .groupBy("train_doc", "eval_doc")
        .agg(F.countDistinct("s").alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= 3)
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


@query("embedding_random_projection", _rp_sql())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64 -> 8 dims with a
    seeded Gaussian matrix (the same ``_hyperplanes`` family the LSH
    bucketer uses) — the cheap dimensionality reduction for sketching
    / coarse clustering before exact distances. Each output dim is a
    codegen dot-product against a literal plane; identical float64
    literals round-trip through DuckDB, so the projection is
    hash-checkable."""
    planes = _rp_planes()
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    outs = []
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), lit_plane, lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        outs.append(F.round(dot, 4).alias(f"rp_{j}"))
    return e.select("vec_id", *outs)


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


@query(
    "text_bm25_scores",
    f"""
    WITH {_BM25_SQL_BASE},
    ranked AS (
        SELECT doc_id, bm25,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM bscore
    )
    SELECT doc_id, bm25, rank FROM ranked WHERE rank <= 20
    """,
)
def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75, Lucene idf) top-20 for a fixed
    3-term query — the lexical retrieval half of hybrid search
    (operators/retrieval.py::bm25_scores). The rank is over the
    ROUNDED score with id tiebreak so ordering is engine-portable."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        bm25_scores,
        top_ranks,
    )

    d = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(d, list(_BM25_TERMS), id_col="doc_id", text_col="text")
    return top_ranks(scored, "bm25", id_col="doc_id", k=20).select(
        "doc_id", "bm25", F.col("rank").cast("long").alias("rank")
    )


_VCOS = _COS_DOUBLE.format(a="e.embedding", b="q.qe")


@query(
    "retrieval_matryoshka_prescreen_top5",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
    cand AS (
        SELECT e.vec_id, e.embedding AS emb,
               round(
                   list_sum(list_transform(list_zip(list_slice(e.embedding, 1, 16), list_slice(q.qe, 1, 16)),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(list_slice(e.embedding, 1, 16),
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(list_slice(q.qe, 1, 16),
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS pre
        FROM embeddings e, q
        WHERE e.vec_id <> 7
        ORDER BY pre DESC, e.vec_id
        LIMIT 40
    ),
    scored AS (
        SELECT c.vec_id,
               round(
                   list_sum(list_transform(list_zip(c.emb, q.qe),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(c.emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos_sim
        FROM cand c, q
    )
    SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def retrieval_matryoshka_prescreen_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (truncated-dimension) retrieval (MRL, Kusupati et
    al. 2022): prescreen on the FIRST 16 of 64 dimensions (a quarter
    of the scan bytes when the prefix is materialized as its own
    column), exact full-dim rerank of the 40 survivors. The oracle
    replays both stages — prefix cosine cut included — so the
    approximation itself is hash-checked; dimensional truncation is
    the complement of the binary prescreen's bit truncation and the
    two compose at 100 TB."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query_matryoshka,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    return knn_query_matryoshka(
        emb.filter(F.col("vec_id") != 7),
        qvec,
        k=5,
        id_col="vec_id",
        prefix_dim=16,
        prescreen_factor=8,
        metric="cosine",
        score_decimals=4,
    ).withColumnRenamed("score", "cos_sim")


@query(
    "hybrid_search_minmax_fusion",
    f"""
    WITH {_BM25_SQL_BASE},
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
    vec AS (
        SELECT e.vec_id AS doc_id,
               round({_VCOS}, 4) AS cos
        FROM embeddings e, q
    ),
    vtop AS (
        SELECT doc_id, cos FROM (
            SELECT doc_id, cos,
                   row_number() OVER (ORDER BY cos DESC, doc_id) AS r
            FROM vec) WHERE r <= 50
    ),
    btop AS (
        SELECT doc_id, bm25 FROM (
            SELECT doc_id, bm25,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
            FROM bscore) WHERE r <= 50
    ),
    vn AS (SELECT min(cos) AS mn, max(cos) AS mx FROM vtop),
    bn AS (SELECT min(bm25) AS mn, max(bm25) AS mx FROM btop),
    fused AS (
        SELECT coalesce(v.doc_id, b.doc_id) AS doc_id,
               round(0.6 * coalesce(
                         CASE WHEN v.doc_id IS NULL THEN NULL
                              WHEN vn.mx = vn.mn THEN 0.5
                              ELSE (v.cos - vn.mn) / (vn.mx - vn.mn) END, 0)
                   + 0.4 * coalesce(
                         CASE WHEN b.doc_id IS NULL THEN NULL
                              WHEN bn.mx = bn.mn THEN 0.5
                              ELSE (b.bm25 - bn.mn) / (bn.mx - bn.mn) END, 0),
                     6) AS fused
        FROM vtop v
        FULL JOIN btop b ON v.doc_id = b.doc_id
        CROSS JOIN vn CROSS JOIN bn
    ),
    final AS (
        SELECT doc_id, fused,
               row_number() OVER (ORDER BY fused DESC, doc_id) AS rank
        FROM fused
    )
    SELECT doc_id, fused, rank FROM final WHERE rank <= 10
    """,
)
def hybrid_search_minmax_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by NORMALIZED WEIGHTED SCORE fusion — the
    standard alternative to RRF when calibrated score magnitudes
    matter: each bounded top-50 list is min-max normalized to [0, 1]
    (degenerate all-equal lists pin to 0.5) and fused as
    0.6*vector + 0.4*lexical, missing side contributing 0. The
    min/max are 1-row aggregates over ALREADY-BOUNDED lists
    (broadcast cross join, no second corpus pass), inputs are rounded
    before normalizing so both engines divide identical doubles, and
    the fused score rounds to 6 before ranking — fully
    hash-checkable, same plan skeleton as hybrid_search_rrf."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        bm25_scores,
        top_ranks,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 7).select("embedding").first()["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    vec = e.select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine_similarity(F.col("embedding"), qlit), 4).alias("cos"),
    )
    vtop = top_ranks(vec, "cos", id_col="doc_id", k=50).select("doc_id", "cos")
    btop = top_ranks(
        bm25_scores(d, list(_BM25_TERMS), id_col="doc_id", text_col="text"),
        "bm25",
        id_col="doc_id",
        k=50,
    ).select("doc_id", "bm25")

    def norm(df, col):
        stats = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
        out = df.crossJoin(F.broadcast(stats))
        normed = F.when(F.col("mx") == F.col("mn"), F.lit(0.5)).otherwise(
            (F.col(col) - F.col("mn")) / (F.col("mx") - F.col("mn"))
        )
        return out.select("doc_id", normed.alias(f"_n_{col}"))

    fused = (
        norm(vtop, "cos")
        .join(norm(btop, "bm25"), "doc_id", "full")
        .select(
            "doc_id",
            F.round(
                0.6 * F.coalesce(F.col("_n_cos"), F.lit(0.0))
                + 0.4 * F.coalesce(F.col("_n_bm25"), F.lit(0.0)),
                6,
            ).alias("fused"),
        )
    )
    return top_ranks(fused, "fused", id_col="doc_id", k=10).select(
        "doc_id", "fused", F.col("rank").cast("long").alias("rank")
    )


@query(
    "hybrid_search_rrf",
    f"""
    WITH {_BM25_SQL_BASE},
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
    vec AS (
        SELECT e.vec_id AS doc_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4) AS cos
        FROM embeddings e, q
    ),
    vrank AS (
        SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rank
        FROM vec
    ),
    brank AS (
        SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM bscore
    ),
    fused AS (
        SELECT coalesce(v.doc_id, b.doc_id) AS doc_id,
               round(coalesce(1.0 / (60 + v.rank), 0)
                     + coalesce(1.0 / (60 + b.rank), 0), 6) AS rrf
        FROM (SELECT * FROM vrank WHERE rank <= 50) v
        FULL JOIN (SELECT * FROM brank WHERE rank <= 50) b
            ON v.doc_id = b.doc_id
    ),
    final AS (
        SELECT doc_id, rrf,
               row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
        FROM fused
    )
    SELECT doc_id, rrf, rank FROM final WHERE rank <= 10
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: vector cosine ranks (query = embedding of
    vec_id 7) fused with BM25 lexical ranks by reciprocal-rank fusion
    (1/(60+rank), the standard hybrid-search recipe). Candidate lists
    are bounded to 50 each by TakeOrderedAndProject BEFORE any window
    runs, fusion is a full-outer join of two <= 50-row lists, and RRF
    arithmetic is rational — bit-portable across engines, which is
    why a hybrid SEARCH pipeline can be hash-checked against DuckDB."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        bm25_scores,
        rrf_fuse,
        top_ranks,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 7).select("embedding").first()["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    vec = e.select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine_similarity(F.col("embedding"), qlit), 4).alias("cos"),
    )
    vrank = top_ranks(vec, "cos", id_col="doc_id", k=50)
    brank = top_ranks(
        bm25_scores(d, list(_BM25_TERMS), id_col="doc_id", text_col="text"),
        "bm25",
        id_col="doc_id",
        k=50,
    )
    fused = rrf_fuse(vrank, brank, id_col="doc_id", k=60)
    return top_ranks(fused, "rrf", id_col="doc_id", k=10).select(
        "doc_id", "rrf", F.col("rank").cast("long").alias("rank")
    )


@query(
    "text_rolling_fingerprint",
    f"""
    WITH th AS (
        SELECT doc_id,
               list_transform({_TOKS.format(x=_NORM)},
                   t -> {_HASH64.format(x='t')} % {MINHASH_P}) AS hs
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(hs) = 0 THEN 0
                ELSE list_reduce(hs, (a, b) -> (a * 131 + b) % {MINHASH_P})
           END AS rfp
    FROM th
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive Rabin–Karp fingerprint over normalized tokens
    (functions/hashes.py::rolling_hash) — distinguishes documents that
    are token permutations of each other, which the md5-of-normalized-
    text and SimHash fingerprints cannot."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        rolling_hash,
    )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        rolling_hash(T.tokens(T.normalize_text("text"))).alias("rfp"),
    )


@query(
    "embedding_int8_quantization",
    """
    WITH s AS (
        SELECT vec_id, label, embedding,
               list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS scale
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, label, embedding, scale,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE)
                        / (CASE WHEN scale = 0 THEN 1 ELSE scale END)
                        * 127 + 0.5)) AS qv
        FROM s
    )
    SELECT vec_id, label,
           round(scale, 6) AS qscale,
           CAST(list_sum(qv) AS BIGINT) AS q_checksum,
           round(list_max(list_transform(
               list_zip(qv, embedding),
               p -> abs(p[1] * scale / 127 - CAST(p[2] AS DOUBLE)))), 6
           ) AS max_abs_err
    FROM q
    """,
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with per-vector max-abs
    scale (functions/vector.py::quantize_int8): checksum of the
    quantized codes plus the max dequantization error. Quantized
    codes are exact integers, so the checksum sum is order-independent
    and the whole result is oracle-exact."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxabs_scale,
        quantize_int8,
    )

    e = load_table(spark, sf_dir, "embeddings")
    s = e.withColumn("scale", maxabs_scale("embedding"))
    q = s.withColumn("qv", quantize_int8("embedding", F.col("scale")))
    err = F.array_max(
        F.zip_with(
            "qv",
            "embedding",
            lambda v, x: F.abs(
                v.cast("double") * F.col("scale") / 127.0 - x.cast("double")
            ),
        )
    )
    return q.select(
        "vec_id",
        "label",
        F.round("scale", 6).alias("qscale"),
        F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")).alias(
            "q_checksum"
        ),
        F.round(err, 6).alias("max_abs_err"),
    )


@query(
    "dedup_embedding_cosine_pairs",
    """
    WITH n AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(list_zip(a.e, b.e),
                 p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(list_zip(a.e, b.e),
          p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) >= 0.4
    """,
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEMM-broadcast variant (one BLAS multiply per Arrow batch);
    the expression form D.embedding_neardup_pairs has the same
    contract but evaluates per-pair array folds — it stays available
    for clusters where Python workers are undesirable."""
    e = load_table(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs_gemm(
        e, id_col="vec_id", embedding_col="embedding", threshold=0.4
    )


@query(
    "pipeline_semantic_dedup",
    """
    WITH RECURSIVE n AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    pr AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE round(list_sum(list_transform(list_zip(a.e, b.e),
              p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) >= 0.4
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pr
        UNION ALL
        SELECT id_b, id_a FROM pr
    ),
    reach(node, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    labeled AS (
        SELECT em.vec_id,
               CAST(coalesce(c.component, em.vec_id) AS BIGINT) AS component
        FROM embeddings em LEFT JOIN comp c ON c.node = em.vec_id
    ),
    sized AS (
        SELECT vec_id, component,
               CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                   AS cluster_size
        FROM labeled
    )
    SELECT vec_id, component, cluster_size FROM sized WHERE vec_id = component
    """,
)
def pipeline_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full semantic-dedup pipeline a training-data run executes:
    embedding near-dup pairs (cell-pruned GEMM path) -> connected
    components (min-label propagation) -> keep ONE survivor per
    duplicate cluster (the min id, the same survivor rule as exact
    dedup) with its cluster size. Oracle recomputes the identical
    fixpoint with a DuckDB recursive CTE. Every stage is the
    operator-library form (dedup.embedding_neardup_pairs_gemm,
    graph.connected_components), so this query is the integration
    proof that the pieces compose without driver materialization."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
        connected_components,
    )

    e = load_table(spark, sf_dir, "embeddings")
    pairs = D.embedding_neardup_pairs_gemm(
        e, id_col="vec_id", embedding_col="embedding", threshold=0.4
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    labeled = (
        e.select("vec_id")
        .join(comp.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
        )
    )
    sizes = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labeled.filter(F.col("vec_id") == F.col("component"))
        .join(sizes, "component")
        .select("vec_id", "component", "cluster_size")
    )


@query(
    "dedup_embedding_neardup_ivf",
    """
    WITH n AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(list_zip(a.e, b.e),
                 p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(list_zip(a.e, b.e),
          p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) >= 0.4
    """,
)
def dedup_embedding_neardup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell-bucketed semantic near-dup (ann.ivf_neardup_pairs) —
    the 100-TB path: KMeans cells on normalized vectors, multi-assign
    to n_assign nearest cells, per-cell blocked GEMM via
    applyInPandas, nothing driver-materialized. At fixture scale the
    auto-sizer picks n_centroids <= n_assign, so every pair is
    co-located and the result is exhaustive — the exact-SQL oracle
    applies verbatim; at real scale the same code prunes to cells."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_neardup_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return ivf_neardup_pairs(
        e, id_col="vec_id", embedding_col="embedding", threshold=0.4
    )


@query(
    "hydrate_canonical_shape",
    """
    SELECT CAST(d.doc_id AS VARCHAR) AS id,
           d.text AS document,
           len(e.embedding) AS dim,
           d.lang AS metadata_value
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def hydrate_canonical_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's entire pipeline (sas:126-193) as one declarative
    plan: join documents to embeddings, project to canonical collection
    schema (id stringified per quirk Q2; metadata keyed by column)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        build_hydration_input,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id)
    canon = build_hydration_input(
        joined,
        HydrationConfig(
            collection_name="docs",
            root="/tmp/unused",
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
            metadata_col="lang",
        ),
    )
    return canon.select(
        "id",
        "document",
        F.size("embedding").alias("dim"),
        F.element_at("metadata", "lang").alias("metadata_value"),
    )


# --------------------------------------------------------------------------
# Windowed event-time aggregation (batch twins of the streaming ops in
# streaming/windows.py — identical plans, so the oracle checks both).
# Note: events.ts is nanoseconds in parquet; Spark reads microseconds
# (sources/parquet.py), DuckDB nanoseconds — oracles truncate to the
# microsecond via epoch_us for identical bucketing.
# --------------------------------------------------------------------------

from vector_databases___hydrate_chroma_db_collection_spark.streaming import windows as W


@query(
    "stream_tumbling_event_stats",
    """
    SELECT strftime(to_timestamp((epoch_us(ts) // 1000000 // 21600) * 21600),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS cnt,
           round(sum(value), 4) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return W.tumbling_event_stats(e, window="6 hours")


@query(
    "stream_sliding_user_activity",
    """
    WITH buckets AS (
        SELECT user_id, ts,
               (epoch_us(ts) // 1000000 // 21600) * 21600 AS b
        FROM events
    ), expanded AS (
        SELECT user_id, to_timestamp(b) AS window_start FROM buckets
        UNION ALL
        SELECT user_id, to_timestamp(b - 21600) AS window_start FROM buckets
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           user_id, count(*) AS cnt
    FROM expanded
    GROUP BY 1, 2
    """,
)
def stream_sliding_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12h windows sliding by 6h: every event lands in exactly two
    windows (its bucket's window and the one starting 6h earlier) —
    which is what the UNION ALL oracle enumerates."""
    e = load_table(spark, sf_dir, "events")
    return W.sliding_user_activity(e, window="12 hours", slide="6 hours")


@query(
    "stream_session_windows",
    """
    WITH ordered AS (
        SELECT user_id, value, epoch_us(ts) AS us FROM events
    ), flagged AS (
        SELECT user_id, us, value,
               CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 300000000
                    OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ), sessions AS (
        SELECT user_id, us, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(to_timestamp(min(us) // 1000000), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(to_timestamp((max(us) + 300000000) // 1000000), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS events,
           round(sum(value), 4) AS value_sum
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (gap 5 min). The oracle reproduces
    F.session_window with classic lag+cumsum sessionization over
    microsecond epochs; session end = last event + gap."""
    e = load_table(spark, sf_dir, "events")
    return W.session_windows(e, gap="5 minutes")


@query(
    "stream_dedup_by_id",
    """
    SELECT count(*) AS total, count(DISTINCT event_id) AS distinct_ids
    FROM events
    """,
)
def stream_dedup_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of dropDuplicatesWithinWatermark: dedup by id then
    count (fixture ids are unique, so total == distinct_ids — the
    streaming test exercises the duplicate path with injected dups)."""
    e = load_table(spark, sf_dir, "events")
    deduped = W.dedup_within_watermark(e)
    return deduped.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("event_id").alias("distinct_ids"),
    )


# --------------------------------------------------------------------------
# kNN join + vector pair math (expression form — oracle-checkable).
# --------------------------------------------------------------------------



@query(
    "knn_join_top3",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.qid, e.vec_id AS neighbor_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4) AS score
        FROM embeddings e, q
    ), ranked AS (
        SELECT qid, neighbor_id, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT qid, neighbor_id, score, rank FROM ranked WHERE rank <= 3
    """,
)
def knn_join_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import knn_join

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding")
    )
    return knn_join(
        q,
        e,
        k=3,
        metric="cosine",
        corpus_id_col="vec_id",
        score_decimals=4,
    ).select("qid", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))


@query(
    "knn_join_gemm_top3",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.qid, e.vec_id AS neighbor_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4) AS score
        FROM embeddings e, q
    ), ranked AS (
        SELECT qid, neighbor_id, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT qid, neighbor_id, score, rank FROM ranked WHERE rank <= 3
    """,
)
def knn_join_gemm_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as knn_join_top3 through the mapInPandas GEMM
    path — the oracle doubles as a determinism check on the
    partition-local top-k fold."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_join_gemm,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding")
    )
    return knn_join_gemm(
        q,
        e,
        k=3,
        metric="cosine",
        corpus_id_col="vec_id",
        score_decimals=4,
    ).select("qid", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))


@query(
    "knn_join_ivf_top3",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.qid, e.vec_id AS neighbor_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4) AS score
        FROM embeddings e, q
    ), ranked AS (
        SELECT qid, neighbor_id, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT qid, neighbor_id, score, rank FROM ranked WHERE rank <= 3
    """,
)
def knn_join_ivf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as knn_join_top3 through the IVF-pruned cogroup
    join (operators/ann.py::ivf_knn_join). nprobe = n_centroids makes
    the probe exhaustive, so the exact brute-force SQL is the oracle —
    what's under test is the distributed plumbing (driver-side k-means
    train, Arrow query assignment, per-cell GEMM cogroup, shared
    deterministic rank merge); pruning recall at nprobe < n_centroids
    is covered by pytest."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_build,
        ivf_knn_join,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding")
    )
    assigned, centroids = ivf_build(
        e, id_col="vec_id", n_centroids=6, seed=42, metric="cosine"
    )
    return ivf_knn_join(
        q,
        assigned,
        centroids,
        k=3,
        id_col="vec_id",
        metric="cosine",
        nprobe=6,
        score_decimals=4,
    ).select("qid", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))


@query(
    "vector_l2_consecutive",
    """
    SELECT a.vec_id,
           round(sqrt(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                 p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                    * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))), 4) AS l2_next
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id < 100
    """,
)
def vector_l2_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        l2_distance,
    )

    e = load_table(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") < 100).select("vec_id", F.col("embedding").alias("e_a"))
    b = e.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("e_b"))
    return a.join(b, "vec_id").select(
        "vec_id", F.round(l2_distance("e_a", "e_b"), 4).alias("l2_next")
    )


@query(
    "embedding_stats_by_label",
    """
    SELECT label,
           count(*) AS cnt,
           round(avg(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import l2_norm

    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg(l2_norm("embedding")), 4).alias("avg_norm"),
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
    "setop_union_all_priorities",
    """
    SELECT o_orderpriority AS priority, count(*) AS cnt FROM (
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderpriority FROM orders WHERE o_totalprice > 300000
    )
    GROUP BY 1
    """,
)
def setop_union_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    b = o.filter(F.col("o_totalprice") > 300000).select("o_orderpriority")
    return (
        a.unionAll(b)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "setop_intersect_all_nations",
    """
    SELECT nk FROM (SELECT c_nationkey AS nk FROM customer)
    INTERSECT ALL
    SELECT nk FROM (SELECT s_nationkey AS nk FROM supplier)
    """,
)
def setop_intersect_all_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersectAll(s)


@query(
    "scalar_case_null_handling",
    """
    SELECT c_custkey AS custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS wealth_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
           CAST(c_acctbal > 0 AS INT) AS is_positive,
           ifnull(NULL, c_custkey) AS id_fallback
    FROM customer
    """,
)
def scalar_case_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("wealth_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        (F.col("c_acctbal") > 0).cast("int").alias("is_positive"),
        F.ifnull(F.lit(None).cast("bigint"), F.col("c_custkey")).alias("id_fallback"),
    )


@query(
    "scalar_array_functions",
    """
    SELECT vec_id,
           list_contains(list_transform(embedding, x -> x > 0), true) AS any_positive,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_elem,
           round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_elem,
           round(CAST(list_sum(list_slice(embedding, 1, 8)) AS DOUBLE), 4) AS head_sum
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id",
        F.exists("embedding", lambda x: x > 0).alias("any_positive"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_elem"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("min_elem"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 8),
                F.lit(0.0).cast("float"),
                lambda acc, x: acc + x,
            ).cast("double"),
            4,
        ).alias("head_sum"),
    )


@query(
    "explode_event_type_chars",
    """
    SELECT t AS token, count(*) AS cnt
    FROM (SELECT unnest(string_split(event_type, '')) AS t FROM events)
    GROUP BY 1
    """,
)
def explode_event_type_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(F.explode(F.split("event_type", "")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "sql_entry_top_customers",
    """
    SELECT c.c_name AS name, count(o.o_orderkey) AS orders,
           round(sum(o.o_totalprice), 2) AS spend
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_name
    ORDER BY spend DESC, name
    LIMIT 20
    """,
)
def sql_entry_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point: fixture tables registered as temp
    views (the caslib-assign equivalent, sas:13-14), query text goes
    straight to spark.sql — same Catalyst plan as the DataFrame API."""
    from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
        register_views,
    )

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_name AS name, count(o.o_orderkey) AS orders,
               round(sum(o.o_totalprice), 2) AS spend
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_name
        ORDER BY spend DESC, name
        LIMIT 20
        """
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
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority AS priority,
           count(*) FILTER (o_orderstatus = 'F') AS cnt_f,
           count(*) FILTER (o_orderstatus = 'O') AS cnt_o,
           count(*) FILTER (o_orderstatus = 'P') AS cnt_p,
           coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)) FILTER (o_orderstatus = 'F'), 0) / 100.0 AS rev_f
    FROM orders
    GROUP BY 1
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on a known small domain. Spark's groupBy().pivot() with an
    explicit value list plans a single aggregation pass (no second job
    to discover values) — the oracle expresses the same as FILTERed
    aggregates."""
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (
                F.coalesce(
                    F.sum(_cents(F.col("o_totalprice"))), F.lit(0).cast("bigint")
                )
                / 100.0
            ).alias("rev"),
        )
    )
    return pivoted.select(
        "priority",
        F.col("F_cnt").alias("cnt_f"),
        F.col("O_cnt").alias("cnt_o"),
        F.col("P_cnt").alias("cnt_p"),
        F.col("F_rev").alias("rev_f"),
    )


@query(
    "text_levenshtein_names",
    """
    SELECT n1.n_name AS name_a, n2.n_name AS name_b,
           levenshtein(n1.n_name, n2.n_name) AS dist
    FROM nation n1 JOIN nation n2 ON n1.n_nationkey < n2.n_nationkey
    WHERE levenshtein(n1.n_name, n2.n_name) <= 2
    """,
)
def text_levenshtein_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k1"), F.col("n_name").alias("name_a")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("name_b")
    )
    return (
        n1.join(n2, F.col("k1") < F.col("k2"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= 2)
    )


@query(
    "scalar_date_arithmetic",
    """
    SELECT o_orderkey AS orderkey,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           round(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') / 365.25, 4) AS years_to_y2k
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(
            F.col("o_orderdate"), F.to_timestamp(F.lit("1995-01-01"))
        ).cast("bigint").alias("days_since_epoch_start"),
        F.round(
            F.datediff(F.to_timestamp(F.lit("2000-01-01")), F.col("o_orderdate"))
            / 365.25,
            4,
        ).alias("years_to_y2k"),
    )


@query(
    "pandas_udf_cosine",
    _FLAGSHIP_ORACLE.replace("LIMIT 5", "LIMIT 10"),
)
def pandas_udf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDF surface (SURVEY.md §2.B): the same flagship cosine
    computed in an Arrow-vectorized pandas_udf instead of the codegen
    expression — numerically identical after rounding, demonstrating
    the documented fallback for very high dimensions."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = np.asarray(
        emb.filter(F.col("vec_id") == 1).first()["embedding"], dtype=np.float64
    )
    qn = qvec / np.linalg.norm(qvec)

    def _cos_to_q(col):
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        return pd.Series(Mn @ qn)

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf cannot resolve locally-imported names
    cos_to_q = pandas_udf(_cos_to_q, "double")

    return (
        emb.filter(F.col("vec_id") != 1)
        .select("vec_id", F.round(cos_to_q("embedding"), 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@query(
    "apply_in_pandas_label_centroids",
    """
    WITH e AS (
        SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), dims AS (
        SELECT label, i, avg(v[i]) AS c
        FROM e, unnest(range(1, 65)) AS t(i)
        GROUP BY label, i
    )
    SELECT label, round(sqrt(sum(c * c)), 4) AS centroid_norm, count(*) AS dim
    FROM dims GROUP BY label
    """,
)
def apply_in_pandas_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF surface: per-label embedding centroid via
    applyInPandas (one Arrow batch per group), reduced to the
    centroid's norm so the oracle stays scalar."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        c = M.mean(axis=0)
        return pd.DataFrame(
            {
                "label": [pdf["label"].iloc[0]],
                "centroid_norm": [round(float(np.sqrt((c * c).sum())), 4)],
                "dim": [M.shape[1]],
            }
        )

    return e.groupBy("label").applyInPandas(
        centroid, schema="label int, centroid_norm double, dim long"
    )


# --------------------------------------------------------------------------
# Gap-closing batch: right join, unionByName, approximate distinct
# (rows-only check — HLL sketches differ across engines), registered
# SQL UDF surface.
# --------------------------------------------------------------------------


@query(
    "join_right_supplier_nations",
    """
    SELECT n.n_name AS nation, count(s.s_suppkey) AS suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_right_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("s_suppkey").alias("suppliers"))
    )


@query(
    "setop_union_by_name",
    """
    SELECT id, kind, count(*) AS cnt FROM (
        SELECT c_custkey AS id, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier
    )
    GROUP BY 1, 2
    """,
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema-aligned union regardless of column order —
    the safe form for evolving pipelines."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.lit("customer").alias("kind")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_suppkey").alias("id")
    )
    return c.unionByName(s).groupBy("id", "kind").agg(F.count(F.lit(1)).alias("cnt"))


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
    "sql_udf_registered",
    f"""
    WITH base AS (
        SELECT doc_id,
               len({_TOKS.format(x='text')}) AS tok_cnt,
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                   / greatest(length(text), 1) AS praw,
               len(list_filter({_TOKS.format(x='lower(text)')},
                   t -> list_contains({_SW['en']}, t)))::DOUBLE
                   / greatest(len({_TOKS.format(x='lower(text)')}), 1) AS swraw
        FROM documents
    )
    SELECT doc_id,
           round(0.4 * least(tok_cnt / 100.0, 1.0)
                 + 0.4 * (1.0 - praw)
                 + 0.2 * least(swraw / 0.1, 1.0), 6) AS quality
    FROM base
    WHERE round(0.4 * least(tok_cnt / 100.0, 1.0)
                + 0.4 * (1.0 - praw)
                + 0.2 * least(swraw / 0.1, 1.0), 6) >= 0.8
    """,
)
def sql_udf_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered SQL UDF surface: the engine's quality_score exposed
    as a SQL function via spark.udf.register (Arrow-batched pandas
    UDF under the hood), used from plain SQL text."""
    import pandas as pd

    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        STOPWORDS,
    )

    en = set(STOPWORDS["en"])

    def _quality(texts):
        import re

        out = []
        for t in texts:
            toks = [x for x in re.split(r"\s+", t) if x]
            praw = len(re.findall(r"[!-/:-@\[-`{-~]", t)) / max(len(t), 1)
            low = [x for x in re.split(r"\s+", t.lower()) if x]
            sw = sum(1 for x in low if x in en) / max(len(low), 1)
            q = 0.4 * min(len(toks) / 100.0, 1.0) + 0.4 * (1 - praw) + 0.2 * min(
                sw / 0.1, 1.0
            )
            out.append(round(q, 6))
        return pd.Series(out)

    from pyspark.sql.functions import pandas_udf

    spark.udf.register("quality_score", pandas_udf(_quality, "double"))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT doc_id, quality_score(text) AS quality
        FROM documents
        WHERE quality_score(text) >= 0.8
        """
    )


# --------------------------------------------------------------------------
# Subquery shapes (TPC-H Q2/Q4/Q6/Q19 analogues) + a composite
# training-data pipeline chaining quality filter -> dedup -> join.
# --------------------------------------------------------------------------


@query(
    "q6_revenue_delta",
    """
    SELECT sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) / 100.0 AS revenue_delta,
           count(*) AS qualifying_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-agg; every predicate pushes to
    the parquet reader, the aggregate is a single partial+final pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("qualifying_lines"),
    )


@query(
    "q4_priority_with_late_lines",
    """
    SELECT o.o_orderpriority AS priority, count(*) AS order_cnt
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY 1
    """,
)
def q4_priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — planned as a left-semi join
    on the correlation key."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority AS priority, count(*) AS order_cnt
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY 1
        """
    )


@query(
    "q11_important_parts",
    """
    WITH value_by_part AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * l_quantity * 100) AS BIGINT)) AS cents
        FROM lineitem GROUP BY 1
    ),
    total AS (SELECT sum(cents) AS total_cents FROM value_by_part)
    SELECT l_partkey AS partkey,
           round(cents / 100.0, 2) AS part_value
    FROM value_by_part CROSS JOIN total
    WHERE cents > 0.0008 * total_cents
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (group total filtered against a fraction of the
    GLOBAL total — HAVING vs a scalar subquery; the 0.08%% cut is
    chosen so the fixture actually yields surviving rows, keeping the
    parity check non-vacuous): per-part value agg,
    single-row grand total broadcast back as a cross join, filter.
    Sums carried as integer cents so the 100k-term additions are
    order-independent across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.sum(
        F.round(F.col("l_extendedprice") * F.col("l_quantity") * 100, 0).cast(
            "bigint"
        )
    )
    by_part = li.groupBy("l_partkey").agg(cents.alias("cents"))
    total = by_part.agg(F.sum("cents").alias("total_cents"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(F.col("cents") > 0.0008 * F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("cents") / 100.0, 2).alias("part_value"),
        )
    )


@query(
    "q12_priority_by_returnflag",
    """
    SELECT l.l_returnflag AS returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY 1
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (CASE-bucketed two-way counts per category
    after a fact-fact equi-join with a pushed date range; the fixture
    has no l_shipmode, so returnflag plays the category). The date
    filter reaches the parquet scan; the priority CASE runs inside
    the post-join hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q2_cheapest_part_suppliers",
    """
    SELECT p.p_partkey AS partkey, s.s_name AS supplier,
           round(ps.min_price, 2) AS min_price
    FROM (
        SELECT l_partkey, l_suppkey, l_extendedprice,
               min(l_extendedprice) OVER (PARTITION BY l_partkey) AS min_price
        FROM lineitem
    ) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE ps.l_extendedprice = ps.min_price AND p.p_size >= 40
    """,
)
def q2_cheapest_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-per-group correlated subquery) expressed as
    a window min — one shuffle on the group key instead of a
    self-join against an aggregated subquery."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_partkey")
    ps = li.select(
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
        F.min("l_extendedprice").over(w).alias("min_price"),
    ).filter(F.col("l_extendedprice") == F.col("min_price"))
    return (
        ps.join(p, p.p_partkey == ps.l_partkey)
        .join(s, s.s_suppkey == ps.l_suppkey)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("s_name").alias("supplier"),
            F.round("min_price", 2).alias("min_price"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS matched
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 5)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 15)
       OR (p.p_type = 'PROMO' AND l.l_discount > 0.05)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — Catalyst
    extracts the common join key and evaluates the disjunction as a
    post-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 15))
        | ((F.col("p_type") == "PROMO") & (F.col("l_discount") > 0.05))
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("matched"),
        )
    )


@query(
    "pipeline_training_data",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               round(0.4 * least(len({_TOKS.format(x='text')}) / 100.0, 1.0)
                     + 0.4 * (1.0 - (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                         / greatest(length(text), 1))
                     + 0.2 * least((len(list_filter({_TOKS.format(x='lower(text)')},
                           t -> list_contains({_SW['en']}, t)))::DOUBLE
                           / greatest(len({_TOKS.format(x='lower(text)')}), 1)) / 0.1, 1.0), 6) AS q
        FROM documents
    ),
    kept AS (SELECT doc_id, lang FROM scored WHERE q >= 0.7),
    with_vec AS (
        SELECT k.doc_id, k.lang, e.label
        FROM kept k JOIN embeddings e ON e.vec_id = k.doc_id
    )
    SELECT lang, label, count(*) AS docs
    FROM with_vec
    GROUP BY 1, 2
    """,
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pipeline (the engine's reason to exist): quality
    filter -> join embeddings -> cohort counts. One declarative plan;
    Catalyst pushes the quality filter below the join so low-quality
    docs never reach the shuffle."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        add_text_features,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    kept = (
        add_text_features(d).filter(F.col("quality") >= 0.7).select("doc_id", "lang")
    )
    return (
        kept.join(e, e.vec_id == kept.doc_id)
        .groupBy("lang", "label")
        .agg(F.count(F.lit(1)).alias("docs"))
    )


@query(
    "multimodal_image_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS asset_id, sha256(text) AS sha256
    FROM documents
    WHERE doc_id < 100
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked: documents synthesized into
    binary image assets (content = utf-8 bytes), pushed through the
    Arrow-batched mapInPandas feature extractor; the content digest is
    the engine-independent output the oracle reproduces (the fake
    decode's dims are covered by unit tests)."""
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.binary import (
        extract_image_features,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    assets = d.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    return extract_image_features(assets).select("asset_id", "sha256")


# --------------------------------------------------------------------------
# TPC-H depth batch: cross-nation flows, returned items, ratio metrics,
# IN-subquery over aggregates, scalar-subquery filters, and the
# hydrate -> read-collection -> kNN end-to-end path.
# --------------------------------------------------------------------------


@query(
    "q7_nation_trade_flows",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l.l_shipdate) AS ship_year,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0 AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND cn.n_name IN ('NATION_1', 'NATION_2')
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dim table (nation) joined twice under
    different roles; both broadcast."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    sn = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(cn), F.col("cnk") == c.c_nationkey)
        .join(F.broadcast(sn), F.col("snk") == s.s_nationkey)
        .filter(F.col("cnk") != F.col("snk"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume")
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-07-01")))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue_ratio",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                         ELSE 0 END)
             / (1.0 * sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))), 4) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", _cents(rev)).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo) / (F.lit(1.0) * F.sum(_cents(rev))), 4
            ).alias("promo_pct")
        )
    )


@query(
    "q18_large_orders",
    """
    SELECT o.o_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    GROUP BY 1, 2
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over an aggregated subquery -> left-semi
    join against the aggregate."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "q22_idle_rich_customers",
    """
    SELECT c.c_mktsegment AS segment, count(*) AS cnt,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery in a filter + anti join. The
    scalar aggregate broadcasts as a literal-like single-row plan."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment AS segment, count(*) AS cnt,
               round(sum(c.c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1
        """
    )


@query(
    "collection_knn_end_to_end",
    """
    WITH corpus AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS id, e.embedding AS emb
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), q AS (SELECT emb AS qe FROM corpus WHERE id = '3'),
    scored AS (
        SELECT c.id,
               round(
                   list_sum(list_transform(list_zip(c.emb, q.qe),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(c.emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos_sim
        FROM corpus c, q
        WHERE c.id <> '3'
    )
    SELECT id, cos_sim FROM scored ORDER BY cos_sim DESC, id LIMIT 5
    """,
)
def collection_knn_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full story in one query: hydrate a collection
    (join docs+embeddings -> canonical schema -> Parquet dataset with
    manifest), read it back as a table, answer a top-5 cosine query
    from the stored embeddings. Every run uses a fresh temp dir, so
    the driver's repeated invocations stay idempotent."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_e2e_")
    hydrate(
        spark,
        d.join(e, d.doc_id == e.vec_id),
        HydrationConfig(
            collection_name="e2e",
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
            metadata_col="lang",
        ),
    )
    coll = read_collection(spark, root, "e2e")
    qvec = list(coll.filter(F.col("id") == "3").first()["embedding"])
    return knn_query(
        coll.filter(F.col("id") != "3"),
        qvec,
        k=5,
        id_col="id",
        embedding_col="embedding",
        metric="cosine",
        score_decimals=4,
    ).withColumnRenamed("score", "cos_sim")


# --------------------------------------------------------------------------
# Extended scalar families: string padding/casing/translate, regexp
# counting, array set-algebra and construction.
# --------------------------------------------------------------------------


@query(
    "scalar_string_extended",
    """
    SELECT p_partkey AS partkey,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           reverse(p_name) AS name_rev,
           repeat(p_brand, 2) AS brand_twice,
           translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels,
           ascii(substring(p_name, 1, 1)) AS first_char_code,
           len(regexp_extract_all(p_name, '[aeiou]')) AS vowel_count,
           CAST(regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS INT) AS two_words
    FROM part
    WHERE p_partkey < 500
    """,
)
def scalar_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("p_name").alias("name_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_lower_vowels"),
        F.ascii(F.substring("p_name", 1, 1)).alias("first_char_code"),
        F.regexp_count("p_name", F.lit("[aeiou]")).alias("vowel_count"),
        F.regexp_like("p_name", F.lit("^[a-z]+ [a-z]+$")).cast("int").alias("two_words"),
    )


@query(
    "scalar_array_algebra",
    """
    SELECT vec_id,
           len(list_distinct(list_concat(head4, tail4))) AS union_distinct,
           len(list_filter(head4, x -> list_contains(tail4, x))) AS overlap,
           array_to_string(list_sort(list_transform(head4,
               x -> round(CAST(x AS DOUBLE), 3))), ',') AS head_sorted,
           array_to_string(list_transform(range(1, 4),
               i -> CAST(i * vec_id AS BIGINT)), ',') AS id_multiples
    FROM (
        SELECT vec_id,
               list_slice(embedding, 1, 4) AS head4,
               list_slice(embedding, 61, 64) AS tail4
        FROM embeddings
        WHERE vec_id < 40
    )
    """,
)
def scalar_array_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    base = e.select(
        "vec_id",
        F.slice("embedding", 1, 4).alias("head4"),
        F.slice("embedding", 61, 4).alias("tail4"),
    )
    return base.select(
        "vec_id",
        F.size(F.array_distinct(F.concat("head4", "tail4"))).alias("union_distinct"),
        F.size(
            F.filter("head4", lambda x: F.array_contains(F.col("tail4"), x))
        ).alias("overlap"),
        F.array_join(
            F.array_sort(
                F.transform("head4", lambda x: F.round(x.cast("double"), 3))
            ).cast("array<string>"),
            ",",
        ).alias("head_sorted"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda i: (i * F.col("vec_id")).cast("bigint"),
            ).cast("array<string>"),
            ",",
        ).alias("id_multiples"),
    )


@query(
    "text_chunking",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS t
        FROM documents WHERE doc_id < 100
    ), meta AS (
        SELECT doc_id, t,
               1 + CAST(floor((greatest(len(t) - 16, 0) + 11) / 12.0) AS INT) AS n_chunks
        FROM toks
    ), chunks AS (
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               array_to_string(list_slice(t, i * 12 + 1, i * 12 + 16), ' ') AS chunk_text,
               len(list_slice(t, i * 12 + 1, i * 12 + 16)) AS chunk_tokens
        FROM meta, unnest(range(0, n_chunks)) AS u(i)
    )
    SELECT doc_id, chunk_idx,
           concat(CAST(doc_id AS VARCHAR), '#', CAST(chunk_idx AS VARCHAR)) AS chunk_id,
           chunk_text, chunk_tokens
    FROM chunks
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: overlapping 16-token windows, step 12, one row
    per chunk with a derived chunk id ready for hydration."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    chunked = d.select(
        "doc_id", F.explode(T.chunk_tokens("text", window=16, step=12)).alias("c")
    )
    return chunked.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("c.chunk_idx").cast("string")).alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.chunk_tokens").alias("chunk_tokens"),
    )


@query(
    "scalar_struct_map_ops",
    """
    SELECT doc_id,
           struct_pack(lang := lang, src := source).lang AS s_lang,
           array_to_string(map_keys(MAP {'lang': lang, 'source': source}), ',') AS mkeys,
           array_to_string(map_values(MAP {'lang': lang, 'source': source}), ',') AS mvals,
           cardinality(MAP {'lang': lang, 'source': source}) AS msize
    FROM documents
    WHERE doc_id < 50
    """,
)
def scalar_struct_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access, map keys/values/size."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.struct(F.col("lang").alias("lang"), F.col("source").alias("src"))["lang"].alias("s_lang"),
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), ",").alias("mvals"),
        F.size(m).alias("msize"),
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


@query(
    "join_cross_nullsafe",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(nullif(r.r_regionkey, 2) IS NOT DISTINCT FROM
                nullif(n.n_regionkey, 2) AS INT) AS nullsafe_eq
    FROM region r CROSS JOIN nation n
    WHERE n.n_nationkey < 5
    """,
)
def join_cross_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product + null-safe equality (<=>): NULL <=>
    NULL is true, unlike ordinary equality."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    return r.crossJoin(n).select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        F.nullif("r_regionkey", F.lit(2))
        .eqNullSafe(F.nullif("n_regionkey", F.lit(2)))
        .cast("int")
        .alias("nullsafe_eq"),
    )


@query(
    "stream_attribution_join",
    """
    SELECT t.user_id, t.event_id AS trigger_id, c.event_id AS conversion_id,
           round((epoch_us(c.ts) - epoch_us(t.ts)) / 1000000.0, 6) AS gap_seconds
    FROM events t
    JOIN events c
      ON c.user_id = t.user_id
     AND c.ts > t.ts
     AND c.ts <= t.ts + INTERVAL 30 MINUTE
    WHERE t.event_type = 'click' AND c.event_type = 'purchase'
    """,
)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream attribution join (the streaming
    variant with watermark state eviction is exercised in
    tests/test_streaming.py with exact parity to this plan)."""
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.joins import (
        attributed_events,
    )

    e = load_table(spark, sf_dir, "events")
    out = attributed_events(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
        within="30 minutes",
    )
    return out.select(
        "user_id",
        "trigger_id",
        "conversion_id",
        F.round("gap_seconds", 6).alias("gap_seconds"),
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH part_avg AS (
        SELECT l_partkey, avg(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group scalar subquery
    (avg quantity per part) joined back — the aggregate side is tiny
    after grouping and broadcasts."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(avg_qty), F.col("pk") == l.l_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q21_multi_supplier_orders",
    """
    SELECT s.s_name AS supplier, count(DISTINCT l1.l_orderkey) AS orders_waiting
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate
          )
    GROUP BY s.s_name
    """,
)
def q21_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact
    table under different correlations (semi + anti join pair)."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s.s_name AS supplier, count(DISTINCT l1.l_orderkey) AS orders_waiting
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
              )
          AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > l1.l_shipdate
              )
        GROUP BY s.s_name
        """
    )


@query(
    "q8_market_share",
    """
    WITH volumes AS (
        SELECT year(o.o_orderdate) AS yr,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT yr,
           round(sum(CASE WHEN supp_nation = 'NATION_3'
                     THEN CAST(round(volume * 100) AS BIGINT) ELSE 0 END)
                 / (1.0 * sum(CAST(round(volume * 100) AS BIGINT))), 6) AS mkt_share
    FROM volumes GROUP BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional share-of-total per group."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("n_name") == "NATION_3", _cents(vol)
                    ).otherwise(F.lit(0).cast("bigint"))
                )
                / (F.lit(1.0) * F.sum(_cents(vol))),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q20_bulk_suppliers",
    """
    SELECT s.s_suppkey AS suppkey, s.s_name AS supplier
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%bolt%'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100
    )
    """,
)
def q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted to the fixture schema): nested IN over
    a filtered, joined, HAVING-gated aggregate -> left-semi join."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    bulk = (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return s.join(bulk, s.s_suppkey == bulk.l_suppkey, "left_semi").select(
        F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("supplier")
    )


@query(
    "scalar_from_json_events",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE event_id < 500
    """,
)
def scalar_from_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON parsing (from_json -> struct field access)
    as opposed to the path-string get_json_object form."""
    from pyspark.sql.types import LongType, StructField, StructType

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    schema = StructType([StructField("k", LongType())])
    parsed = e.select("event_id", F.from_json("props", schema).alias("p"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_mod"),
    )


# --------------------------------------------------------------------------
# Round 2: dedup cluster assignment, temporal (as-of) join, batch
# sessionization, repetition-quality text signal, unpivot, ranking
# distribution windows, TPC-H Q9/Q13/Q15/Q16 shapes, IVF-indexed
# collection retrieval.
# --------------------------------------------------------------------------


@query(
    "dedup_connected_components",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pr AS (
        SELECT id_a, id_b
        FROM shared
        JOIN sizes s1 ON s1.doc_id = id_a
        JOIN sizes s2 ON s2.doc_id = id_b
        WHERE round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pr
        UNION ALL
        SELECT id_b, id_a FROM pr
    ),
    reach(node, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> duplicate CLUSTERS: Jaccard pair graph
    grouped by iterative min-label propagation (operators/graph.py),
    isolated docs joined back as their own singleton component. A
    downstream pipeline keeps min(doc_id) per component. Oracle is a
    DuckDB recursive CTE computing the same fixpoint."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
        connected_components,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, id_col="doc_id", text_col="text", n=3, threshold=0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    D.release_cache(pairs)
    return (
        d.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )


@query(
    "sql_lateral_top2_orders",
    """
    SELECT c.c_custkey AS custkey, t.o_orderkey AS orderkey,
           round(t.o_totalprice, 2) AS totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey < 100
    """,
)
def sql_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table,
    Spark 3.2+): each customer's top-2 orders by price. Catalyst
    decorrelates the lateral into a ranked join — same physical work
    as the window row_number formulation, expressed in the SQL shape
    ported code actually uses. DuckDB runs the identical statement."""
    from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
        register_views,
    )

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey, t.o_orderkey AS orderkey,
               round(t.o_totalprice, 2) AS totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey < 100
        """
    )


@query(
    "sql_recursive_dup_closure",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pr AS (
        SELECT id_a, id_b
        FROM shared
        JOIN sizes s1 ON s1.doc_id = id_a
        JOIN sizes s2 ON s2.doc_id = id_b
        WHERE round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) >= 0.5
    ),
    closure(src, dst) AS (
        SELECT id_a, id_b FROM pr
        UNION ALL
        SELECT cl.src, p.id_b FROM closure cl JOIN pr p ON p.id_a = cl.dst
    )
    SELECT DISTINCT src, dst FROM closure
    """,
)
def sql_recursive_dup_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's native recursive CTE (SPARK-24497) driven through
    spark.sql: the transitive closure of the id-oriented near-dup
    pair graph (edges always increase the id, so the graph is a DAG
    and UNION ALL recursion terminates; UNION-dedup recursion is not
    yet supported — the engine raises UNION_NOT_SUPPORTED_IN_
    RECURSIVE_CTE — so cyclic fixpoints stay on the iterative
    operators/graph.py path). The pair edges come from the engine's
    own jaccard_pairs operator registered as a temp view; DuckDB
    recomputes both the pairs and the identical recursion."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, id_col="doc_id", text_col="text", n=3, threshold=0.5)
    pairs.select("id_a", "id_b").createOrReplaceTempView("_rcte_pairs")
    out = spark.sql(
        """
        WITH RECURSIVE closure(src, dst) AS (
            SELECT id_a, id_b FROM _rcte_pairs
            UNION ALL
            SELECT cl.src, p.id_b
            FROM closure cl JOIN _rcte_pairs p ON p.id_a = cl.dst
        )
        SELECT DISTINCT src, dst FROM closure
        """
    )
    D.release_cache(pairs)
    return out


@query(
    "join_asof_prior_day_spend",
    """
    WITH daily AS (
        SELECT o_custkey,
               o_orderdate AS prior_day,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
                   AS prior_spend
        FROM orders GROUP BY 1, 2
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, d.prior_day, d.prior_spend
    FROM orders o
    ASOF LEFT JOIN daily d
        ON o.o_custkey = d.o_custkey AND o.o_orderdate > d.prior_day
    """,
)
def join_asof_prior_day_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/relational.py): each order is labeled
    with the customer's most recent STRICTLY-earlier order day and
    that day's spend — the no-future-leakage feature-attribution
    join. Right side is pre-aggregated to one row per (key, day) so
    the match is deterministic. Oracle is DuckDB's native ASOF JOIN."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        asof_join,
    )

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy("o_custkey", F.col("o_orderdate").alias("prior_day"))
        .agg(F.round(F.sum(_cents(F.col("o_totalprice"))) / 100.0, 2).alias("prior_spend"))
    )
    return asof_join(
        o.select("o_orderkey", "o_custkey", "o_orderdate"),
        daily,
        on="o_custkey",
        left_time="o_orderdate",
        right_time="prior_day",
        strict=True,
    )


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
    "text_repetition_quality",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS.format(x=_NORM)}) AS tok FROM documents
    ),
    per_tok AS (
        SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round(count(*)::DOUBLE / sum(c), 4) AS distinct_ratio,
           round(max(c)::DOUBLE / sum(c), 4) AS top_token_share
    FROM per_tok GROUP BY doc_id
    """,
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: token count,
    distinct-token ratio, and the share of the single most frequent
    token (boilerplate/spam indicator). Two map-side-combinable
    hash aggregations keyed by doc_id — no windows, no Python."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.explode(T.tokens(T.normalize_text(F.col("text")))).alias("tok")
    )
    per_tok = t.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 4).alias("distinct_ratio"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_token_share"),
    )


@query(
    "unpivot_part_attributes",
    """
    SELECT p_partkey, 'p_size' AS attr, round(CAST(p_size AS DOUBLE), 2) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', round(p_retailprice, 2) FROM part
    """,
)
def unpivot_part_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt) via DataFrame.unpivot — the inverse
    of pivot_status_by_priority. Plans as a single Expand node (one
    scan, rows x n_values), no shuffle."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    )
    return p.unpivot(
        ["p_partkey"], ["p_size", "p_retailprice"], "attr", "val"
    ).withColumn("val", F.round("val", 2))


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
    "q9_product_type_profit",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(CAST(round(
               (l.l_extendedprice * (1 - l.l_discount)
                - 0.8 * p.p_retailprice * l.l_quantity) * 100) AS BIGINT))
               / 100.0, 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: supply cost modeled as 80% of retail
    price — the fixture has no partsupp): five-way join, profit
    aggregated by nation and order year. Dimension sides broadcast;
    the lineitem fact shuffles once for the final agg."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(_cents(amount)) / 100.0, 2).alias("profit"))
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
            ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY 1
    )
    GROUP BY 1
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count-per-customer histogram via left
    join with a join-time predicate, then a second aggregation over
    the counts. count(col) (nulls excluded) is the load-bearing
    semantic for customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                   AS BIGINT)) / 100.0, 2) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s
    JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, filtered to
    the maximum via a scalar subquery over the same derived relation.
    The revenue CTE computes once; the max broadcasts as a one-row
    plan (no second scan of lineitem)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0,
                2,
            ).alias("total_rev")
        )
    )
    rev.createOrReplaceTempView("_q15_rev")
    s.createOrReplaceTempView("_q15_supplier")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM _q15_supplier s
        JOIN _q15_rev r ON r.l_suppkey = s.s_suppkey
        WHERE r.total_rev = (SELECT max(total_rev) FROM _q15_rev)
        """
    )


@query(
    "q16_supplier_part_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the 'complaints' exclusion keys on
    negative account balance; the fixture has no partsupp/comments):
    distinct-supplier variety per part attribute triple with a NOT IN
    anti-join. The part dim broadcasts; distinct-count shuffles on
    the grouping triple."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(
            F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "collection_ivf_knn_end_to_end",
    """
    WITH corpus AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS id, e.embedding AS emb
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), q AS (SELECT emb AS qe FROM corpus WHERE id = '7'),
    scored AS (
        SELECT c.id,
               round(
                   list_sum(list_transform(list_zip(c.emb, q.qe),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(c.emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos_sim
        FROM corpus c, q
        WHERE c.id <> '7'
    )
    SELECT id, cos_sim FROM scored ORDER BY cos_sim DESC, id LIMIT 5
    """,
)
def collection_ivf_knn_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexed retrieval end-to-end: hydrate a collection, build an
    IVF index over it, PERSIST the index (cell-partitioned parquet +
    centroids), read it back, and answer a top-5 cosine query through
    it. nprobe = n_centroids makes the search exhaustive, so the
    oracle is the exact brute-force SQL — the plumbing (index build,
    persisted layout, pruned scan path) is what's under test; recall
    tradeoffs of nprobe < n_cells are covered by pytest recall tests."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_build,
        ivf_read,
        ivf_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_ivf_e2e_")
    hydrate(
        spark,
        d.join(e, d.doc_id == e.vec_id),
        HydrationConfig(
            collection_name="e2e_ivf",
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
            metadata_col="lang",
        ),
    )
    coll = read_collection(spark, root, "e2e_ivf")
    assigned, centroids = ivf_build(coll, n_centroids=8, seed=42)
    ivf_write(assigned, centroids, f"{root}/e2e_ivf/_ivf", metric="cosine")
    assigned2, centroids2, _metric = ivf_read(spark, f"{root}/e2e_ivf/_ivf")
    qvec = list(coll.filter(F.col("id") == "7").first()["embedding"])
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_search,
    )

    return ivf_search(
        assigned2.filter(F.col("id") != "7"),
        centroids2,
        qvec,
        k=5,
        nprobe=8,
        metric="cosine",
        score_decimals=4,
    ).withColumnRenamed("score", "cos_sim")


@query(
    "collection_ivf_knn_stale_rebuild",
    """
    WITH base AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS id, e.embedding AS emb
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), donor AS (SELECT emb FROM base WHERE id = '7'),
    corpus AS (
        SELECT b.id,
               CASE WHEN b.id = '3' THEN donor.emb ELSE b.emb END AS emb
        FROM base b, donor
    ), q AS (SELECT emb AS qe FROM corpus WHERE id = '7'),
    scored AS (
        SELECT c.id,
               round(
                   list_sum(list_transform(list_zip(c.emb, q.qe),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(c.emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos_sim
        FROM corpus c, q
        WHERE c.id <> '7'
    )
    SELECT id, cos_sim FROM scored ORDER BY cos_sim DESC, id LIMIT 5
    """,
)
def collection_ivf_knn_stale_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-staleness contract, end-to-end and LOAD-BEARING:
    hydrate a collection, persist an IVF index stamped with the
    collection's etag (``ivf_write(source=...)``), then
    ``collection_update`` one document's embedding (id '3' takes id
    '7''s vector — the mutation an un-invalidated index would miss).
    ``ivf_read`` must now raise ``StaleIndexError``; the query
    REQUIRES it (no exception => EngineError), rebuilds via the
    one-call remedy ``ivf_refresh`` (which replays the sidecar's
    RECORDED build parameters against the current collection and
    re-stamps), and answers top-5 through the fresh index. The oracle
    scores the UPDATED corpus brute-force, so the result only matches
    if the rebuild actually served the new vector (id '3' surfaces at
    cos_sim 1.0)."""
    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        EngineError,
        StaleIndexError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_build,
        ivf_read,
        ivf_refresh,
        ivf_search,
        ivf_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_update,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    root = _hydrate_docs_collection(spark, sf_dir, "stale_ivf")
    coll = read_collection(spark, root, "stale_ivf")
    assigned, centroids = ivf_build(coll, n_centroids=8, seed=42)
    idx_path = f"{root}/stale_ivf/_ivf"
    ivf_write(
        assigned,
        centroids,
        idx_path,
        metric="cosine",
        source=(root, "stale_ivf"),
        build={"metric": "l2", "seed": 42, "sample_fraction": None},
    )
    qvec = list(coll.filter(F.col("id") == "7").first()["embedding"])

    # Mutate: id '3' takes id '7''s embedding (SQL-expressible so the
    # oracle can reproduce it), swapping the _current data dir. A
    # plain call + raise, NOT an assert — the mutation is load-bearing
    # and must survive python -O.
    donor = coll.filter(F.col("id") == "7").select(F.col("embedding"))
    upd = donor.select(F.lit("3").alias("id"), F.col("embedding"))
    n_upd = collection_update(spark, root, "stale_ivf", upd)
    if n_upd != 1:
        raise EngineError(f"expected exactly 1 updated row, got {n_upd}")

    try:
        ivf_read(spark, idx_path)
    except StaleIndexError:
        pass  # the contract under test
    else:
        raise EngineError(
            "persisted IVF index served a mutated collection without "
            "raising StaleIndexError"
        )

    # One-call remedy: rebuild from the CURRENT collection with the
    # recorded build params, re-stamp, serve.
    assigned3, centroids3, _metric = ivf_refresh(spark, idx_path)
    return ivf_search(
        assigned3.filter(F.col("id") != "7"),
        centroids3,
        qvec,
        k=5,
        nprobe=8,
        metric="cosine",
        score_decimals=4,
    ).withColumnRenamed("score", "cos_sim")


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


@query(
    "collection_filtered_query",
    f"""
    WITH corpus AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS id, d.text, d.lang,
               e.embedding AS emb
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), q AS (SELECT emb AS qe FROM corpus WHERE id = '3'),
    scored AS (
        SELECT c.id, {_COS_SQL} AS score
        FROM corpus c, q
        WHERE c.lang IN ('en', 'de') AND contains(c.text, 'data')
    )
    SELECT id, score FROM scored ORDER BY score DESC, id LIMIT 5
    """,
)
def collection_filtered_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chroma ``collection.query(where=..., where_document=...)``:
    metadata + document predicates compiled to native Columns and
    applied BEFORE the distance expression (pre-filtering — exact
    recall, and the filter prunes the scan ahead of the math), then
    top-5 cosine via TakeOrderedAndProject. Shuffle-free."""
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_query,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    root = _hydrate_docs_collection(spark, sf_dir, "apiq")
    coll = read_collection(spark, root, "apiq")
    qvec = list(coll.filter(F.col("id") == "3").first()["embedding"])
    return collection_query(
        spark,
        root,
        "apiq",
        qvec,
        n_results=5,
        where={"lang": {"$in": ["en", "de"]}},
        where_document={"$contains": "data"},
        score_decimals=4,
    ).select("id", "score")


@query(
    "collection_delete_where",
    """
    SELECT lang, count(*) AS n
    FROM documents
    WHERE lang <> 'de'
    GROUP BY lang
    """,
)
def collection_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chroma ``collection.delete(where=...)`` on a bucketed layout:
    survivors rewritten into a fresh versioned dir, ``_current``
    pointer swapped atomically; the remaining per-language counts
    prove exactly the matching rows died."""
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_delete,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    root = _hydrate_docs_collection(spark, sf_dir, "apid", n_buckets=8)
    collection_delete(spark, root, "apid", where={"lang": "de"})
    return (
        read_collection(spark, root, "apid")
        .groupBy(F.col("metadata")["lang"].alias("lang"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "collection_get_page",
    """
    SELECT CAST(doc_id AS VARCHAR) AS id, text AS document
    FROM documents
    ORDER BY id
    LIMIT 10 OFFSET 5
    """,
)
def collection_get_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chroma ``collection.get(limit=, offset=)``: id-ordered page
    via TakeOrderedAndProject over offset+limit rows (driver cost
    bounded by the page end, not the collection)."""
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_get,
    )

    root = _hydrate_docs_collection(spark, sf_dir, "apig")
    return collection_get(spark, root, "apig", limit=10, offset=5).select(
        "id", "document"
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
    "scalar_bitwise_events",
    """
    SELECT event_id,
           event_id & 255                       AS low_byte,
           xor(event_id, user_id)               AS xor_user,
           (event_id % 1024) << 2               AS shifted,
           CAST(bit_count(event_id) AS BIGINT)  AS bits
    FROM events
    WHERE event_id < 2000
    """,
)
def scalar_bitwise_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface: AND/XOR masks, shifts, popcount —
    the building blocks of hash partitioners, bloom filters and
    bit-packed feature flags. Pure codegen, no shuffle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xor_user"),
        F.shiftleft(F.col("event_id") % 1024, 2).cast("bigint").alias("shifted"),
        F.bit_count("event_id").cast("bigint").alias("bits"),
    )


@query(
    "scalar_trig_part",
    """
    SELECT p_partkey,
           round(sin(p_retailprice), 6)            AS sin_price,
           round(cos(p_retailprice), 6)            AS cos_price,
           round(atan2(p_retailprice, 1000.0), 6)  AS atan2_price,
           round(degrees(atan(p_retailprice / 1000.0)), 6) AS angle_deg
    FROM part
    """,
)
def scalar_trig_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric scalar surface (sin/cos/atan2/atan/degrees) —
    the geo-distance and phase-feature building blocks; both engines
    evaluate libm doubles, rounded well above ulp noise."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.sin("p_retailprice"), 6).alias("sin_price"),
        F.round(F.cos("p_retailprice"), 6).alias("cos_price"),
        F.round(F.atan2(F.col("p_retailprice"), F.lit(1000.0)), 6).alias(
            "atan2_price"
        ),
        F.round(F.degrees(F.atan(F.col("p_retailprice") / 1000.0)), 6).alias(
            "angle_deg"
        ),
    )


@query(
    "text_regexp_extract_counts",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, '[aeiou]+'))                AS vowel_runs,
           length(regexp_replace(lower(text), '[^a-z]', '', 'g'))   AS letter_chars
    FROM documents
    """,
)
def text_regexp_extract_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all + global regexp_replace as corpus-statistics
    primitives (run-counts, alphabet-only lengths). Character classes
    only — the regex subset every engine's dialect agrees on. Spark's
    regexp_replace is global by default; DuckDB needs the 'g' flag."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[aeiou]+"), F.lit(0)))
        .cast("bigint")
        .alias("vowel_runs"),
        F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
        .cast("bigint")
        .alias("letter_chars"),
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
    "setop_except_all_years",
    """
    SELECT year(o_orderdate) AS order_year
    FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT year(o_orderdate) AS order_year
    FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def setop_except_all_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference, duplicate-preserving):
    completes the bag-semantics set-op family next to UNION ALL /
    INTERSECT ALL. Count-based single shuffle, no row explosion."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.year("o_orderdate").cast("bigint").alias("order_year")
    )
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        F.year("o_orderdate").cast("bigint").alias("order_year")
    )
    return urgent.exceptAll(high)


@query(
    "collection_update_bucketed",
    """
    SELECT CAST(doc_id AS VARCHAR) AS id,
           CASE WHEN doc_id % 10 = 0 THEN 'REDACTED' ELSE text END AS document
    FROM documents
    """,
)
def collection_update_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chroma ``collection.update`` end-to-end on a bucketed layout:
    every 10th document redacted in place. Exercises the crash-atomic
    bucketed rewrite (touched buckets written to a fresh versioned
    dir, untouched buckets hardlink-cloned, pointer swap) and the
    distributed bucket pruning (driver sees bucket numbers, never the
    id list); the oracle is the expected final state."""
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_update,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    root = _hydrate_docs_collection(spark, sf_dir, "apiup", n_buckets=8)
    d = load_table(spark, sf_dir, "documents")
    updates = d.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").cast("string").alias("id"),
        F.lit("REDACTED").alias("document"),
    )
    collection_update(spark, root, "apiup", updates)
    return read_collection(spark, root, "apiup").select("id", "document")


@query(
    "multimodal_audio_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS asset_id, sha256(text) AS sha256
    FROM documents
    WHERE doc_id < 100
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio half of the multimodal plumbing, oracle-checked the
    same way as the image half: synthesized binary assets through the
    Arrow-batched extractor; the content digest is the
    engine-independent output (fake-decode sample stats are covered
    by unit tests, real WAV decode by test_multimodal.py)."""
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.binary import (
        extract_audio_features,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    assets = d.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("audio").alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    return extract_audio_features(assets).select("asset_id", "sha256")


@query(
    "multimodal_video_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'mp4/isom' ELSE 'avi' END AS container,
           CASE WHEN doc_id % 2 = 0 THEN 640 ELSE 320 END AS width,
           CASE WHEN doc_id % 2 = 0 THEN 5000 ELSE 10000 END AS duration_ms,
           CASE WHEN doc_id % 2 = 0 THEN NULL ELSE 250 END AS n_frames
    FROM documents
    WHERE doc_id < 100
    """,
)
def multimodal_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video half of the multimodal plumbing with REAL container
    parsing in the distributed path: each asset is a valid MP4 or AVI
    header (``codecs.build_mp4``/``build_avi``) plus row-unique
    trailing bytes, and ``extract_video_features(decode='real')``
    must recover geometry/duration/frame-count from the actual box /
    RIFF structs (``codecs.sniff_video``) — the oracle states the
    expected values as constants (the content digest is unit-tested;
    DuckDB's sha256 is VARCHAR-only so it cannot re-derive a binary
    digest). Pixel decode needs ffmpeg and stays gated; header
    parsing is the no-dependency production contract, same as the
    image sniffers."""
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.binary import (
        extract_video_features,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
        build_avi,
        build_mp4,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    template = F.when(
        F.col("doc_id") % 2 == 0, F.lit(bytearray(build_mp4()))
    ).otherwise(F.lit(bytearray(build_avi())))
    assets = d.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("video").alias("modality"),
        F.concat(template, F.encode("text", "UTF-8")).alias("content"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    return extract_video_features(assets, decode="real").select(
        "asset_id", "container", "width", "duration_ms", "n_frames"
    )


# --------------------------------------------------------------------------
# Round-4 second batch: Spark-4 VARIANT JSON, mergeable HLL sketches with
# the exact-twin contract, time-interval RANGE frames, array set algebra,
# translate/reverse scalars, a salted skew join proven against the plain
# join, and the stream-static join's batch twin.
# --------------------------------------------------------------------------


@query(
    "scalar_variant_json_events",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE event_id < 3000
    """,
)
def scalar_variant_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion: ``parse_json`` to a variant value,
    typed reads via ``try_variant_get`` — the schema-on-read path for
    semi-structured columns (the open-format successor to
    get_json_object string plucking; binary-encoded, so repeated
    reads skip re-parsing). Oracle reads the same JSON with DuckDB's
    json_extract."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_mod"),
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
    "scalar_array_setops_part",
    """
    SELECT p_partkey,
           coalesce(array_to_string(list_sort(list_intersect(
               [p_type, p_name, p_brand],
               ['ECONOMY', 'SMALL', 'JUMBO'])), '|'), '') AS overlap,
           coalesce(array_to_string(list_sort(list_filter(
               [p_type, p_name, p_brand],
               x -> NOT list_contains(['ECONOMY', 'SMALL', 'JUMBO'], x))), '|'), '') AS rest,
           len(list_distinct([p_type, p_name, p_brand])) AS n_distinct_attrs
    FROM part
    """,
)
def scalar_array_setops_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect / except / distinct size) as
    codegen expressions; results sorted + joined to strings so the
    comparison is order-insensitive on both engines."""
    p = load_table(spark, sf_dir, "part")
    attrs = F.array("p_type", "p_name", "p_brand")
    probe = F.array(F.lit("ECONOMY"), F.lit("SMALL"), F.lit("JUMBO"))
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_intersect(attrs, probe)), "|").alias(
            "overlap"
        ),
        F.array_join(F.array_sort(F.array_except(attrs, probe)), "|").alias("rest"),
        F.size(F.array_distinct(attrs)).cast("bigint").alias("n_distinct_attrs"),
    )


@query(
    "scalar_translate_reverse",
    """
    SELECT c_custkey,
           translate(c_name, '#_', '-.') AS squashed,
           reverse(lower(c_mktsegment))  AS rev_segment,
           length(replace(c_name, 'Customer', '')) AS stripped_len
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def scalar_translate_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level string surface: translate (per-char map),
    reverse, replace — the normalization primitives under id
    canonicalization and fuzzy matching."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.translate("c_name", "#_", "-.").alias("squashed"),
        F.reverse(F.lower("c_mktsegment")).alias("rev_segment"),
        F.length(F.replace("c_name", F.lit("Customer"), F.lit(""))).cast(
            "bigint"
        ).alias("stripped_len"),
    )


@query(
    "join_salted_hot_keys",
    """
    SELECT o_orderstatus AS status,
           CAST(sum(length(o_orderpriority)) AS BIGINT) AS total_weight,
           count(*) AS n
    FROM orders
    GROUP BY 1
    """,
)
def join_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join, oracle-proven: the 5 order priorities are
    pathological hot keys (every fact row hits one of 5 build rows),
    the classic skew shape where one reducer gets the whole key. The
    cure: replicate the small side across N_SALT salt ids, hash each
    fact row to one salt, join on (key, salt) — every shuffle
    partition carries ~1/N_SALT of each hot key. The oracle is the
    UNSALTED result (a plain aggregate): salting must never change
    the answer, only the distribution. (With a 5-row dim you would
    broadcast in practice — the query proves the rewrite's identity,
    which is what matters when the dim is too big to broadcast.)"""
    N_SALT = 8
    o = load_table(spark, sf_dir, "orders")
    dim = (
        o.select("o_orderpriority").distinct()
        .select(
            F.col("o_orderpriority").alias("p_key"),
            F.length("o_orderpriority").alias("weight"),
        )
    )
    salted_dim = dim.select(
        "p_key", "weight", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))).alias("salt")
    )
    fact = o.select(
        "o_orderstatus",
        F.col("o_orderpriority").alias("p_key"),
        F.pmod(F.xxhash64("o_orderkey"), F.lit(N_SALT)).cast("int").alias("salt"),
    )
    joined = fact.join(salted_dim.hint("shuffle_hash"), ["p_key", "salt"])
    return joined.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.sum("weight").alias("total_weight"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "stream_static_join_nation",
    """
    SELECT n.n_name AS nation, count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
    WHERE e.event_type IN ('click', 'view', 'purchase')
    GROUP BY 1
    """,
)
def stream_static_join_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static join: each (streaming) event
    enriched against a broadcast static dimension, then aggregated.
    In Structured Streaming the static side is re-broadcast per
    micro-batch with no state store involved — the standard
    dimension-enrichment topology; tests/test_streaming.py drives the
    identical plan through readStream and diffs against this twin.
    sum(value) stays deterministic at 2 decimals because each group
    sums ~hundreds of doubles (error ~1e-10, far under the
    rounding)."""
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.joins import (
        enrich_with_static,
    )

    e = load_table(spark, sf_dir, "events")
    n = load_table(spark, sf_dir, "nation")
    return enrich_with_static(
        e, n, key_expr=lambda f: f["user_id"] % 25, dim_key="n_nationkey"
    )


# --------------------------------------------------------------------------
# Round-4 third batch: training-order shuffle/sharding and corpus
# vocabulary — the data-ordering half of a training-data pipeline.
# --------------------------------------------------------------------------


@query(
    "shard_interleave_documents",
    f"""
    WITH hashed AS (
        SELECT doc_id, lang,
               {_HASH64.format(x="concat('shuffle42:', CAST(doc_id AS VARCHAR))")} AS h
        FROM documents
    )
    SELECT doc_id, lang,
           h % 8 AS shard,
           row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
    FROM hashed
    """,
)
def shard_interleave_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training order: a
    seeded engine-portable hash gives every document a pseudorandom
    rank, the shard is hash mod n_shards, and the within-shard
    position is the rank order — the reproducible replacement for
    rand()-shuffling a 100 TB corpus before writing training shards.
    One shuffle on the shard key; each shard sorts independently (the
    inherent cost of a defined training order), no global sort, no
    driver state. Changing the seed string reshuffles everything
    deterministically."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    d = load_table(spark, sf_dir, "documents")
    h = hash64(F.concat(F.lit("shuffle42:"), F.col("doc_id").cast("string")))
    hashed = d.select("doc_id", "lang", h.alias("h"))
    shard = F.pmod(F.col("h"), F.lit(8))
    w = Window.partitionBy(shard).orderBy("h", "doc_id")
    return hashed.select(
        "doc_id",
        "lang",
        shard.alias("shard"),
        F.row_number().over(w).alias("pos"),
    ).withColumn("pos", F.col("pos").cast("bigint"))


@query(
    "vocab_top_terms",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS.format(x=_NORM)}) AS token
        FROM documents
    ),
    stats AS (
        SELECT token, count(*) AS total_tf,
               count(DISTINCT doc_id) AS dfreq
        FROM tok GROUP BY 1
    ),
    ranked AS (
        SELECT token, total_tf, dfreq,
               row_number() OVER (ORDER BY total_tf DESC, token) AS rank
        FROM stats
    )
    SELECT token, total_tf, dfreq, rank FROM ranked WHERE rank <= 50
    """,
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-50 tokens by total frequency with
    document frequencies — the first pass of tokenizer/vocab training
    and stopword discovery. One explode + one map-side-combinable
    agg; the global top-50 is a TakeOrderedAndProject over the
    (bounded) distinct-token aggregate, never a full sort of the
    corpus. Rank ties break on the token so ordering is
    engine-portable."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        normalize_text,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(normalize_text("text"))).alias("token"))
    stats = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("total_tf"),
        F.count_distinct("doc_id").alias("dfreq"),
    )
    # TakeOrderedAndProject keeps 50 rows; the unpartitioned
    # row_number window then runs over those 50 rows only, never the
    # full vocabulary.
    top = stats.orderBy(F.col("total_tf").desc(), "token").limit(50)
    w = Window.orderBy(F.col("total_tf").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


# --------------------------------------------------------------------------
# Round-4 fourth batch: ANSI-safe try_* arithmetic, map higher-order
# functions, and date-sequence generation.
# --------------------------------------------------------------------------


@query(
    "scalar_try_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / nullif(l_quantity - l_quantity, 0) AS div_by_zero,
           try_cast(l_returnflag AS BIGINT)                     AS bad_cast,
           CAST(round(l_extendedprice / nullif(l_quantity, 0) * 100) AS BIGINT) AS unit_cents
    FROM lineitem
    WHERE l_orderkey < 400
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic: try_divide / try_cast return NULL
    instead of failing the job — the error-isolation surface a
    pipeline needs when one malformed row must not kill a 100 TB
    scan. Division by zero and an unparseable cast both surface as
    NULLs the oracle reproduces with nullif/try_cast."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_by_zero"),
        F.col("l_returnflag").try_cast("bigint").alias("bad_cast"),
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")) * 100
        ).cast("bigint").alias("unit_cents"),
    )


@query(
    "scalar_map_hof_orders",
    """
    SELECT o_orderkey,
           concat('base=', CAST(round(o_totalprice, 2) AS VARCHAR),
                  ';taxed=', CAST(round(o_totalprice * 1.1, 2) AS VARCHAR)) AS fee_map,
           2 AS n_keys
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def scalar_map_hof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build a map from arrays,
    transform_values (per-entry lambda), then serialize via
    map_entries -> transform -> array_join. DuckDB has no comparable
    map surface, so the oracle reproduces the serialized STRING — the
    values and ordering are what the driver hashes, the map HOF
    machinery is what the Spark side exercises."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    m = F.map_from_arrays(
        F.array(F.lit("base"), F.lit("taxed")),
        F.array(F.col("o_totalprice"), F.col("o_totalprice")),
    )
    taxed = F.transform_values(
        m, lambda k, v: F.when(k == "taxed", F.round(v * 1.1, 2)).otherwise(F.round(v, 2))
    )
    entries = F.transform(
        F.map_entries(taxed),
        lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
    )
    return o.select(
        "o_orderkey",
        F.array_join(entries, ";").alias("fee_map"),
        F.size(F.map_keys(taxed)).cast("bigint").alias("n_keys"),
    )


@query(
    "scalar_sequence_dates",
    """
    SELECT o_orderkey,
           CAST(unnest(generate_series(CAST(o_orderdate AS DATE),
                                       CAST(o_orderdate AS DATE) + 3,
                                       INTERVAL 1 DAY)) AS TIMESTAMP) AS day
    FROM orders
    WHERE o_orderkey < 300
    """,
)
def scalar_sequence_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-sequence generation + explode: each order expanded to its
    4-day observation window — the row-generation primitive behind
    calendar spines and gap-filling joins. sequence() is codegen;
    explode multiplies rows without a shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.explode(
            F.sequence(
                F.col("o_orderdate").cast("date"),
                F.date_add(F.col("o_orderdate").cast("date"), 3),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    ).withColumn("day", F.col("day").cast("timestamp"))


# --------------------------------------------------------------------------
# Round 4 additions: interval-overlap join, embedding decontamination,
# weighted source mixing, histogram profiling, and PQ compressed kNN —
# the remaining training-pipeline shapes the registry did not yet cover.
# --------------------------------------------------------------------------


@query(
    "join_interval_overlap",
    """
    WITH li AS (
        SELECT l_orderkey, l_linenumber, l_suppkey,
               CAST(l_shipdate AS DATE) AS s,
               CAST(l_shipdate AS DATE) + CAST(l_quantity AS INTEGER) AS e
        FROM lineitem WHERE l_suppkey % 40 = 0
    )
    SELECT a.l_suppkey AS suppkey,
           a.l_orderkey AS a_orderkey, a.l_linenumber AS a_linenumber,
           b.l_orderkey AS b_orderkey, b.l_linenumber AS b_linenumber,
           date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1 AS overlap_days
    FROM li a JOIN li b
      ON a.l_suppkey = b.l_suppkey
     AND (a.l_orderkey < b.l_orderkey
          OR (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber))
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join via month-bucket blocking — the
    scale-safe band-join pattern Spark lacks natively. A naive overlap
    join is an inequality theta-join (BroadcastNestedLoop / cartesian
    at scale); instead each interval explodes to the calendar months
    it touches (<=3 rows here), the join becomes an EQUI-join on
    (supplier, month) that hash-partitions and prunes like any other,
    and the exact overlap predicate + pair-key dedup run on the
    blocked candidates only. Same decompose-to-equi-join trick as the
    SimHash Hamming bands (operators/dedup.py)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") % 40 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            F.col("l_shipdate").cast("date").alias("s"),
            F.date_add(
                F.col("l_shipdate").cast("date"),
                F.col("l_quantity").cast("int"),
            ).alias("e"),
        )
        .withColumn(
            "month",
            F.explode(
                F.sequence(
                    F.trunc("s", "MM"), F.trunc("e", "MM"), F.expr("interval 1 month")
                )
            ),
        )
    )
    a, b = li.alias("a"), li.alias("b")
    pair_lt = (F.col("a.l_orderkey") < F.col("b.l_orderkey")) | (
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
    )
    return (
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & (F.col("a.month") == F.col("b.month")),
        )
        .filter(
            pair_lt
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e"))
        )
        .select(
            F.col("a.l_suppkey").alias("suppkey"),
            F.col("a.l_orderkey").alias("a_orderkey"),
            F.col("a.l_linenumber").alias("a_linenumber"),
            F.col("b.l_orderkey").alias("b_orderkey"),
            F.col("b.l_linenumber").alias("b_linenumber"),
            (
                F.datediff(
                    F.least(F.col("a.e"), F.col("b.e")),
                    F.greatest(F.col("a.s"), F.col("b.s")),
                )
                + 1
            )
            .cast("bigint")
            .alias("overlap_days"),
        )
        # an overlapping pair co-occurs in every shared month — dedup
        # the pair key (bounded fan-in: <=3 months per interval)
        .dropDuplicates(
            ["suppkey", "a_orderkey", "a_linenumber", "b_orderkey", "b_linenumber"]
        )
    )


@query(
    "decontaminate_embedding_cosine",
    """
    WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE label = 9),
    tr AS (SELECT vec_id, embedding FROM embeddings WHERE label < 9),
    s AS (
        SELECT tr.vec_id,
               round(
                   list_sum(list_transform(list_zip(tr.embedding, ev.embedding),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (
                       sqrt(list_sum(list_transform(tr.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                       * sqrt(list_sum(list_transform(ev.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                   ), 4) AS cs
        FROM tr, ev
    )
    SELECT vec_id, count(*) AS n_eval_hits, max(cs) AS max_cos
    FROM s WHERE cs >= 0.30
    GROUP BY vec_id
    """,
)
def decontaminate_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: drop training vectors too
    close (cosine >= threshold) to any held-out eval vector — the
    semantic complement of `decontaminate_ngram_overlap` (paraphrased
    leakage that n-gram overlap misses). The eval side is small by
    construction, so it BROADCASTS and the cosine runs as a codegen
    expression over one corpus scan: O(train x eval) FLOPs but O(train)
    shuffle — at 100 TB the eval set is still a few thousand rows, so
    the plan shape holds. Threshold 0.30 calibrated non-vacuous on the
    fixture (157 flagged of 450 train rows)."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("label") == 9).select(
        F.col("vec_id").alias("ev_id"), F.col("embedding").alias("ev_emb")
    )
    tr = emb.filter(F.col("label") < 9).select("vec_id", "embedding")
    cs = F.round(cosine_similarity(F.col("embedding"), F.col("ev_emb")), 4)
    return (
        tr.join(F.broadcast(ev))
        .withColumn("cs", cs)
        .filter(F.col("cs") >= 0.30)
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_eval_hits"),
            F.max("cs").alias("max_cos"),
        )
    )


@query(
    "mix_sources_by_weight",
    f"""
    WITH w AS (
        SELECT doc_id, source,
               CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 800
                    WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 400
                    ELSE 100 END AS keep_permille
        FROM documents
    )
    SELECT doc_id, source, keep_permille
    FROM w
    WHERE {_HASH64.format(x="concat(CAST(doc_id AS VARCHAR), ':', source)")} % 1000
          < keep_permille
    """,
)
def mix_sources_by_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing: per-source sampling rates (the training-mix
    step that reweights corpora — e.g. 80% of curated sources, 10% of
    crawl). Deterministic hash-mod draws instead of rand(): the same
    row set is selected on every run and every engine (proven by the
    DuckDB oracle), the filter pushes to the scan, and no seed
    coordination or sort is needed. Changing the mix = changing one
    literal map, not reshuffling data."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    d = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    keep = (
        F.when(src_num < 5, 800).when(src_num < 10, 400).otherwise(100)
    ).alias("keep_permille")
    draw = F.pmod(
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))),
        F.lit(1000),
    )
    return (
        d.select("doc_id", "source", keep)
        .filter(draw < F.col("keep_permille"))
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
    "knn_pq_adc_top5",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 2),
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
        WHERE e.vec_id <> 2
    )
    SELECT vec_id, cos_sim
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT 5
    """,
)
def knn_pq_adc_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-corpus kNN: PQ-encode the corpus (4·dim bytes -> 16
    bytes/row), ADC-prescreen on codes only, exact-rerank the bounded
    candidate set — FAISS's IVFPQ+refine recipe on Spark (operators/
    pq.py). The oracle is EXACT brute-force cosine: with a prescreen
    width of 40·k the refined top-5 provably matches it on this
    corpus, so the approximation is checked, not trusted. At 100 TB
    the win is that the scan/shuffle volume of the prescreen pass is
    the compressed size."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        pq_encode,
        pq_knn_query,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 2).select("embedding").first()["embedding"]
    corpus = emb.filter(F.col("vec_id") != 2)
    cb = pq_train(
        corpus, embedding_col="embedding", m=16, n_codes=32, seed=7, normalize=True
    )
    enc = pq_encode(corpus, cb, id_col="vec_id", normalize=True)
    return pq_knn_query(
        enc,
        cb,
        list(qvec),
        k=5,
        id_col="vec_id",
        metric="cosine",
        rerank_corpus=corpus,
        embedding_col="embedding",
        rerank_factor=40,
        score_decimals=4,
    ).withColumnRenamed("score", "cos_sim")


@query(
    "scalar_url_parse",
    """
    SELECT doc_id,
           source || '.example.com'                    AS host,
           '/docs/' || CAST(doc_id AS VARCHAR)         AS path,
           'lang=' || lang                             AS query,
           lang                                        AS lang_param
    FROM documents
    WHERE doc_id < 300
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with parse_url — the first step of every
    web-crawl pipeline (host-level dedup, domain quality lists, path
    routing). The URLs are constructed from fixture columns so the
    DuckDB oracle can state the expected parts exactly; the Spark side
    must recover them THROUGH the real parser (HOST/PATH/QUERY + a
    keyed query parameter), all codegen expressions."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
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
    "text_bigram_freq",
    f"""
    WITH tok AS (
        SELECT doc_id, {_TOKS.format(x=_NORM)} AS toks FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM tok
    ),
    stats AS (
        SELECT bigram, count(*) AS tf, count(DISTINCT doc_id) AS dfreq
        FROM bg GROUP BY 1
    ),
    ranked AS (
        SELECT bigram, tf, dfreq,
               row_number() OVER (ORDER BY tf DESC, bigram) AS rank
        FROM stats
    )
    SELECT bigram, tf, dfreq, rank FROM ranked WHERE rank <= 40
    """,
)
def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram head: top-40 word pairs by frequency — the n-gram
    statistics pass behind phrase mining, collocation scoring, and
    n-gram LM features. Bigrams are built POSITIONALLY inside one
    expression (sequence + element_at, no self-join of the token
    table), so the plan is explode -> map-side-combinable agg ->
    TakeOrderedAndProject over the distinct-bigram aggregate; rank
    ties break on the bigram text for engine portability."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        normalize_text,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(normalize_text("text"))
    bigrams = F.when(
        F.size(toks) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    stats = bg.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("dfreq"),
    )
    w = Window.orderBy(F.col("tf").desc(), F.col("bigram"))
    return (
        stats.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 40)
    )


@query(
    "collection_pq_knn_end_to_end",
    """
    WITH corpus AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS id, e.embedding AS emb
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), q AS (SELECT emb AS qe FROM corpus WHERE id = '7'),
    scored AS (
        SELECT c.id,
               round(
                   list_sum(list_transform(list_zip(c.emb, q.qe),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(c.emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos_sim
        FROM corpus c, q
        WHERE c.id <> '7'
    )
    SELECT id, cos_sim FROM scored ORDER BY cos_sim DESC, id LIMIT 5
    """,
)
def collection_pq_knn_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed indexed retrieval end-to-end: hydrate a collection,
    build an IVF-PQ index over it (coarse cells + residual uint8
    codes), PERSIST the index (cell-partitioned codes + JSON sidecar),
    read it back, and answer a top-5 cosine query through ADC
    prescreen + exact rerank. Full probe + a prescreen wider than the
    corpus make the result exactly the brute-force oracle — the
    plumbing (residual encode, persisted compressed layout, per-cell
    LUT scoring, rerank join) is what's under test; the recall/probe
    tradeoff is covered by `test_pq.py`."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        ivf_pq_build,
        ivf_pq_read,
        ivf_pq_search,
        ivf_pq_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_pq_e2e_")
    hydrate(
        spark,
        d.join(e, d.doc_id == e.vec_id),
        HydrationConfig(
            collection_name="e2e_pq",
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
            metadata_col="lang",
        ),
    )
    coll = read_collection(spark, root, "e2e_pq").filter(F.col("id") != "7")
    qvec = list(
        read_collection(spark, root, "e2e_pq")
        .filter(F.col("id") == "7")
        .first()["embedding"]
    )
    enc, cents, cbs = ivf_pq_build(
        coll, id_col="id", n_centroids=8, m=16, n_codes=32, seed=7
    )
    ivf_pq_write(enc, cents, cbs, f"{root}/e2e_pq/_ivfpq")
    enc2, cents2, cbs2 = ivf_pq_read(spark, f"{root}/e2e_pq/_ivfpq")
    return ivf_pq_search(
        enc2,
        cents2,
        cbs2,
        qvec,
        k=5,
        id_col="id",
        nprobe=8,
        rerank_corpus=coll,
        embedding_col="embedding",
        rerank_factor=100,  # 500-candidate prescreen covers the corpus
        metric="cosine",
        score_decimals=4,
    ).withColumnsRenamed({"score": "cos_sim"})


# --------------------------------------------------------------------------
# Round 4 additions: per-document duplication fraction, PII scrubbing,
# exact-sum distributed regression, bigram-LM quality scoring,
# temperature-weighted source mixing, and deterministic 3-way splits.
# --------------------------------------------------------------------------


@query(
    "dedup_dup_ngram_fraction",
    f"""
    WITH {_SHINGLES_CTE},
    dfreq AS (SELECT s, count(*) AS docs FROM shing GROUP BY 1)
    SELECT sh.doc_id AS id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN d.docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_shingles,
           round(sum(CASE WHEN d.docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS dup_frac
    FROM shing sh JOIN dfreq d USING (s)
    GROUP BY 1
    """,
)
def dedup_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated 3-gram fraction — the share of a doc's
    distinct shingles that appear in at least one other document
    (Lee et al. 2022's memorization signal, the filter behind
    "drop documents that are >X% duplicated text"). Runs on the
    dedup operator (operators/dedup.py::dup_ngram_fraction): one
    document-frequency hash-agg, a fan-out-free 1:1 join back, one
    per-doc agg — no all-pairs stage, so the shape holds at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    return D.dup_ngram_fraction(d, id_col="doc_id", text_col="text", n=3)


_ESS_K = 8  # ExactSubstr window length in tokens


@query(
    "dedup_exact_substring_coverage",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS.format(x=_NORM)} AS t FROM documents
    ),
    nt AS (SELECT doc_id, t, len(t) AS n_tokens FROM toks WHERE len(t) > 0),
    wl AS (
        SELECT doc_id,
               list_transform(range(1, n_tokens - {_ESS_K} + 2),
                   i -> {_HASH64.format(
                       x=f"array_to_string(list_slice(t, i, i + {_ESS_K - 1}), ' ')"
                   )}) AS ws
        FROM nt WHERE n_tokens >= {_ESS_K}
    ),
    win AS (
        SELECT doc_id, unnest(range(1, len(ws) + 1)) AS s, unnest(ws) AS wh
        FROM wl
    ),
    cw AS (
        SELECT doc_id, s, s + {_ESS_K - 1} AS e,
               min(doc_id) OVER (PARTITION BY wh)
                   <> max(doc_id) OVER (PARTITION BY wh) AS x
        FROM win
    ),
    isl AS (
        SELECT doc_id, s, e,
               coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pe
        FROM cw WHERE x
    ),
    pd AS (
        SELECT doc_id, count(*) AS dup_windows,
               CAST(sum(greatest(e - greatest(s - 1, pe), 0)) AS BIGINT)
                   AS covered_tokens
        FROM isl GROUP BY 1
    )
    SELECT n.doc_id AS id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
           coalesce(p.dup_windows, 0) AS dup_windows,
           coalesce(p.covered_tokens, 0) AS covered_tokens,
           round(coalesce(p.covered_tokens, 0)::DOUBLE / n.n_tokens, 4)
               AS coverage
    FROM nt n LEFT JOIN pd p USING (doc_id)
    """,
)
def dedup_exact_substring_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr coverage (Lee et al. 2022 §4.1, the suffix-array
    dedup, at 8-token window granularity): per document, the fraction
    of TOKEN POSITIONS inside at least one 8-token window whose exact
    token sequence also occurs in a different document — overlapping
    duplicated windows union-merged by a gaps-and-islands running
    max, i.e. the actual share of text an ExactSubstr cut removes
    (positional, unlike dedup_dup_ngram_fraction's distinct-shingle
    share). Cross-doc detection is one min(id)!=max(id) analytic over
    the window-hash partition — no distinct, no self-join, no
    posting-list collection (operators/dedup.py::
    exact_substring_coverage; three bounded shuffles at any scale)."""
    d = load_table(spark, sf_dir, "documents")
    out = D.exact_substring_coverage(
        d, id_col="doc_id", text_col="text", k=_ESS_K
    )
    return out.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "dup_windows",
        "covered_tokens",
        "coverage",
    )


@query(
    "dedup_exact_substring_removal",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS.format(x=_NORM)} AS t FROM documents
    ),
    nt AS (SELECT doc_id, t, len(t) AS n_tokens FROM toks WHERE len(t) > 0),
    wl AS (
        SELECT doc_id,
               list_transform(range(1, n_tokens - {_ESS_K} + 2),
                   i -> {_HASH64.format(
                       x=f"array_to_string(list_slice(t, i, i + {_ESS_K - 1}), ' ')"
                   )}) AS ws
        FROM nt WHERE n_tokens >= {_ESS_K}
    ),
    win AS (
        SELECT doc_id, unnest(range(1, len(ws) + 1)) AS s, unnest(ws) AS wh
        FROM wl
    ),
    owned AS (
        SELECT doc_id, s,
               min(doc_id) OVER (PARTITION BY wh) AS min_id
        FROM win
    ),
    covered AS (
        SELECT DISTINCT doc_id, unnest(range(s, s + {_ESS_K})) AS p
        FROM owned WHERE min_id < doc_id
    ),
    pos AS (
        SELECT doc_id, unnest(range(1, len(t) + 1)) AS p, unnest(t) AS tok
        FROM nt
    ),
    kept AS (
        SELECT pos.doc_id, pos.p, pos.tok
        FROM pos LEFT JOIN covered c USING (doc_id, p)
        WHERE c.p IS NULL
    ),
    rebuilt AS (
        SELECT doc_id, count(*) AS kept_tokens,
               string_agg(tok, ' ' ORDER BY p) AS cleaned_text
        FROM kept GROUP BY 1
    )
    SELECT n.doc_id AS id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
           coalesce(r.kept_tokens, 0) AS kept_tokens,
           coalesce(r.cleaned_text, '') AS cleaned_text
    FROM nt n LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def dedup_exact_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT half of ExactSubstr dedup: token positions inside an
    8-token window whose exact sequence also occurs in an EARLIER doc
    (min id over the window hash < this id) are removed and the text
    rebuilt from the survivors — the earliest doc keeps its text
    verbatim, later copies lose exactly the spans that already exist
    upstream, a fully-duplicated doc collapses to the empty string
    (operators/dedup.py::exact_substring_removal; rebuild is an
    order-free sort_array(collect_list) bounded by DOCUMENT length).
    Complements dedup_exact_substring_coverage (the MEASURE half)."""
    d = load_table(spark, sf_dir, "documents")
    out = D.exact_substring_removal(
        d, id_col="doc_id", text_col="text", k=_ESS_K
    )
    return out.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "kept_tokens",
        "cleaned_text",
    )


@query(
    "text_inverted_index",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS.format(x=_NORM)}) AS t FROM documents
    ),
    tf AS (
        SELECT t AS term, doc_id, count(*) AS tf FROM tok
        WHERE t IN {str(tuple(_BM25_TERMS))} GROUP BY 1, 2
    ),
    st AS (
        SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
        FROM tf GROUP BY 1
    ),
    r AS (
        SELECT tf.term, tf.doc_id, tf.tf, st.df, st.total_tf,
               row_number() OVER (PARTITION BY tf.term
                   ORDER BY tf.tf DESC, tf.doc_id) AS rank
        FROM tf JOIN st USING (term)
    )
    SELECT term, doc_id, tf, df, total_tf, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 5
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction (operators/retrieval.py::
    inverted_postings) — postings as DISTRIBUTED ROWS (term, doc, tf)
    plus the per-term dictionary (df, total_tf), the layout that
    survives a stop-word's corpus-sized posting list at 100 TB where
    a collect_list posting array cannot. The query materializes the
    index and serves a dictionary lookup: for the fixture term set,
    the top-5 postings per term by (tf, doc) with term stats
    attached — i.e. the exact probe a lexical searcher runs."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        inverted_postings,
    )

    d = load_table(spark, sf_dir, "documents")
    postings, stats = inverted_postings(d, id_col="doc_id", text_col="text")
    probe = postings.filter(F.col("term").isin(list(_BM25_TERMS)))
    w = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    return (
        probe.join(F.broadcast(stats), "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("term", "doc_id", "tf", "df", "total_tf", "rank")
    )


@query(
    "collection_export_import",
    """
    WITH corpus AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS id, e.embedding AS emb
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), q AS (SELECT emb AS qe FROM corpus WHERE id = '5'),
    scored AS (
        SELECT c.id,
               round(
                   list_sum(list_transform(list_zip(c.emb, q.qe),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(c.emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos_sim
        FROM corpus c, q
        WHERE c.id <> '5'
    )
    SELECT id, cos_sim FROM scored ORDER BY cos_sim DESC, id LIMIT 5
    """,
)
def collection_export_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot portability roundtrip: hydrate a BUCKETED collection,
    ``export_collection`` it to a self-contained flat snapshot
    (manifest + canonical parquet — readable by anything), then
    ``import_collection`` the snapshot under a new root/name and
    serve a top-5 cosine query from the IMPORTED copy. The oracle is
    the brute-force scan of the original corpus, so the whole
    export->import->query path is value-checked; both data moves are
    distributed scan->write jobs, never driver-side file copies
    (plans/collection.py::export_collection/import_collection)."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        export_collection,
        import_collection,
        read_collection,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_exp_")
    hydrate(
        spark,
        d.join(e, d.doc_id == e.vec_id),
        HydrationConfig(
            collection_name="src",
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
            metadata_col="lang",
            n_buckets=4,
        ),
    )
    snap = export_collection(
        spark, root, "src", tempfile.mkdtemp(prefix="vdb_snap_")
    )
    root2 = tempfile.mkdtemp(prefix="vdb_imp_")
    import_collection(spark, snap, root2, name="restored")
    coll = read_collection(spark, root2, "restored")
    qvec = list(coll.filter(F.col("id") == "5").first()["embedding"])
    return knn_query(
        coll.filter(F.col("id") != "5"),
        qvec,
        k=5,
        id_col="id",
        embedding_col="embedding",
        metric="cosine",
        score_decimals=4,
    ).withColumnRenamed("score", "cos_sim")


@query(
    "layout_partitioned_write_prune",
    """
    SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_clicks,
           round(sum(value), 2) AS click_value
    FROM events
    WHERE event_type = 'click'
    GROUP BY 1
    """,
)
def layout_partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned DISK LAYOUT as an operator: events are
    written ``partitionBy(event_type)`` (the standard coarse
    first-level layout under Z-order's intra-file clustering,
    functions/layout.py), then read back with an event_type filter —
    which Spark satisfies by LISTING only the matching partition
    directory: the scan's PartitionFilters prune 4/5 of the data
    before any file is opened (asserted in tests/test_plans.py). The
    oracle aggregates the original table, so the roundtrip through
    the partitioned layout is value-checked, not just plan-checked.
    Every run writes a fresh temp dir (driver re-invocations stay
    idempotent)."""
    import tempfile

    e = load_table(spark, sf_dir, "events")
    out = tempfile.mkdtemp(prefix="vdb_layout_")
    e.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    return back.groupBy(
        F.date_format(F.date_trunc("day", "ts").cast("date"), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum("value"), 2).alias("click_value"),
    )


@query(
    "collection_query_batch_top3",
    """
    WITH corpus AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS id, d.text AS document,
               e.embedding AS emb
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    q AS (
        SELECT 0 AS qid, emb AS qe FROM corpus WHERE id = '7'
        UNION ALL
        SELECT 1 AS qid, emb AS qe FROM corpus WHERE id = '11'
    ),
    scored AS (
        SELECT q.qid, c.id, c.document,
               round(
                   list_sum(list_transform(list_zip(c.emb, q.qe),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(c.emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS score
        FROM corpus c, q
    ),
    ranked AS (
        SELECT qid, id, document, score,
               row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, id) AS rank
        FROM scored
    )
    SELECT qid, CAST(rank AS BIGINT) AS rank, id, document, score
    FROM ranked WHERE rank <= 3
    """,
)
def collection_query_batch_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chroma's NATIVE multi-embedding ``collection.query`` signature
    (``query_embeddings`` is a list; results are positional per
    query): hydrate a collection, then answer a 2-query batch with
    payload columns attached, via
    plans/chroma_api.py::collection_query_batch — the query batch
    broadcasts through knn_join's two-level top-k (shuffle carries
    queries x k rows, never the corpus) and documents re-attach by
    one bounded equi-join. Oracle replays both queries brute-force."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_query_batch,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_qb_")
    hydrate(
        spark,
        d.join(e, d.doc_id == e.vec_id),
        HydrationConfig(
            collection_name="qb",
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
        ),
    )
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in e.filter(F.col("vec_id").isin([7, 11])).collect()
    }
    return collection_query_batch(
        spark,
        root,
        "qb",
        [vecs[7], vecs[11]],
        n_results=3,
        score_decimals=4,
    ).select(
        "qid", F.col("rank").cast("long").alias("rank"), "id", "document", "score"
    )


@query(
    "vocab_bpe_pair_merges",
    f"""
    WITH tok AS (
        SELECT unnest({_TOKS.format(x=_NORM)}) AS w FROM documents
    ),
    wc AS (SELECT w, count(*) AS cnt FROM tok GROUP BY 1),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(w)),
                   i -> substr(w, i, 1) || ' ' || substr(w, i + 1, 1))) AS pair,
               cnt
        FROM wc WHERE length(w) >= 2
    ),
    agg AS (
        SELECT pair, CAST(sum(cnt) AS BIGINT) AS merges FROM pairs GROUP BY 1
    ),
    r AS (
        SELECT pair, merges,
               row_number() OVER (ORDER BY merges DESC, pair) AS rank
        FROM agg
    )
    SELECT pair, merges, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 20
    """,
)
def vocab_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration's core computation (Sennrich et al.
    2016): corpus-frequency-weighted counts of ADJACENT symbol pairs
    within words (character-level init), whose argmax is the next
    merge rule. The scale-critical trick: pairs are counted over the
    DISTINCT-WORD table weighted by word count — the pair explode
    touches |vocab| rows, not |corpus| tokens (the standard dictionary
    optimization; at 100 TB the vocab table is millions of rows while
    the token stream is trillions). Words shorter than 2 chars are
    filtered BEFORE the pair transform: sequence(1, len-1) at len=1
    is the DESCENDING [1, 0] (same ANSI trap as binary_quantize)."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        normalize_text,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(tokens(normalize_text("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = F.col("w")
    pairs = (
        wc.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.concat(
                        w.substr(i, F.lit(1)),
                        F.lit(" "),
                        w.substr(i + 1, F.lit(1)),
                    ),
                )
            ).alias("pair"),
            "cnt",
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("merges"))
    )
    from pyspark.sql import Window

    ranked = pairs.orderBy(F.col("merges").desc(), F.col("pair")).limit(20)
    return ranked.select(
        "pair",
        "merges",
        F.row_number()
        .over(Window.orderBy(F.col("merges").desc(), F.col("pair")))
        .cast("long")
        .alias("rank"),
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
    "mix_negative_sampling",
    f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    anchors AS (SELECT doc_id FROM documents WHERE doc_id < 50),
    draws AS (
        SELECT a.doc_id, j,
               {_HASH64.format(
                   x="CAST(a.doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR)"
               )} % n.n_docs AS raw
        FROM anchors a, unnest(range(1, 5)) AS jj(j), n
    ),
    negs AS (
        SELECT doc_id, j,
               CASE WHEN raw = doc_id THEN (raw + 1) % (SELECT n_docs FROM n)
                    ELSE raw END AS neg_id
        FROM draws
    )
    SELECT ng.doc_id, CAST(ng.j AS BIGINT) AS j, ng.neg_id, d.source AS neg_source
    FROM negs ng JOIN documents d ON d.doc_id = ng.neg_id
    """,
)
def mix_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive
    training (the data-prep step behind every embedding-model recipe,
    e.g. DPR/SimCSE): each anchor draws 4 pseudo-random corpus
    negatives via the portable md5 hash of (anchor, draw index) mod
    corpus size, collision with the anchor bumped to the next id.
    Hash draws instead of rand() make the sample reproducible across
    runs, engines, AND retries (a task retry with rand() would
    silently resample — the same reason the hash split operator
    exists). Corpus size enters as a broadcast 1-row aggregate, the
    negative fetch is one equi-join on neg_id; nothing here scales
    worse than the corpus scan."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    draws = (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j"),
            "n_docs",
        )
        .withColumn(
            "raw",
            hash64(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.col("j").cast("string"),
                )
            )
            % F.col("n_docs"),
        )
        .withColumn(
            "neg_id",
            F.when(
                F.col("raw") == F.col("doc_id"),
                (F.col("raw") + 1) % F.col("n_docs"),
            ).otherwise(F.col("raw")),
        )
    )
    return draws.join(
        d.select(F.col("doc_id").alias("neg_id"), F.col("source")), "neg_id"
    ).select(
        "doc_id",
        F.col("j").cast("long").alias("j"),
        "neg_id",
        F.col("source").alias("neg_source"),
    )


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


@query(
    "text_pii_redaction",
    f"""
    WITH base AS (
        SELECT doc_id, {_PII_CONTACT_SQL} AS contact FROM documents
    ),
    r1 AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(contact, '{_PII_EMAIL}')) AS BIGINT)
                   AS n_email,
               regexp_replace(contact, '{_PII_EMAIL}', '[EMAIL]', 'g') AS t1
        FROM base
    ),
    r2 AS (
        SELECT doc_id, n_email,
               CAST(len(regexp_extract_all(t1, '{_PII_IPV4}')) AS BIGINT)
                   AS n_ipv4,
               regexp_replace(t1, '{_PII_IPV4}', '[IPV4]', 'g') AS t2
        FROM r1
    )
    SELECT doc_id, n_email, n_ipv4,
           CAST(len(regexp_extract_all(t2, '{_PII_PHONE}')) AS BIGINT)
               AS n_phone,
           regexp_replace(t2, '{_PII_PHONE}', '[PHONE]', 'g') AS redacted
    FROM r2
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing before training-data release: emails, IPv4
    addresses, and phone-like digit runs replaced with typed tags,
    plus per-category counts (functions/text.py::redact_pii /
    pii_counts). The patterns are RE2-compatible so the SAME strings
    run in Spark's Java regex and DuckDB — pattern portability IS the
    oracle check. Fixture docs carry no PII, so a contact line is
    woven deterministically from fixture columns on both sides;
    redaction order (email -> ipv4 -> phone) is part of the contract.
    Everything is a codegen regexp chain — scrubbing 100 TB is a
    scan, no UDF, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    contact = F.concat(
        F.lit("doc "),
        did,
        F.when(
            F.col("lang") == "en",
            F.concat(
                F.lit(" contact user"), did, F.lit("@data-"),
                F.col("source"), F.lit(".org"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
                F.lit("."), (F.col("n_chars") % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit(" call +1 555 01"),
                F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        T.pii_counts(contact).alias("_c"),
        T.redact_pii(contact).alias("redacted"),
    ).select(
        "doc_id",
        F.col("_c.n_email").cast("bigint").alias("n_email"),
        F.col("_c.n_ipv4").cast("bigint").alias("n_ipv4"),
        F.col("_c.n_phone").cast("bigint").alias("n_phone"),
        "redacted",
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
    "text_bigram_lm_score",
    f"""
    WITH tok AS (
        SELECT doc_id, {_TOKS.format(x=_NORM)} AS toks FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM tok WHERE len(toks) > 1
    ),
    c12 AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1),
    c1 AS (
        SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS cw
        FROM bg GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(c12.cb::DOUBLE / c1.cw)), 4) AS avg_logp
    FROM bg b
    JOIN c12 USING (bigram)
    JOIN c1 ON c1.w1 = split_part(b.bigram, ' ', 1)
    GROUP BY 1
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: each document's mean bigram
    log-likelihood under the corpus's own MLE bigram model
    (avg ln c(w1,w2)/c(w1·)) — the cheap stand-in for model-based
    perplexity filters in training-data pipelines (low scores =
    unusual token transitions = boilerplate/garbled text). The model
    IS an aggregation: two hash-aggs build the bigram and context
    counts, two equi-joins score every position, one per-doc agg
    averages — every stage map-side-combinable, no model broadcast
    needed (the "LM" never leaves the cluster), so scoring 100 TB is
    three shuffles over key-partitioned counts."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        normalize_text,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(normalize_text("text"))
    t = F.col("_t")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat(
            F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
        ),
    )
    bg = (
        d.select("doc_id", toks.alias("_t"))
        .filter(F.size("_t") > 1)
        .select("doc_id", F.explode(pairs).alias("bigram"))
        .select("doc_id", "bigram", F.substring_index("bigram", " ", 1).alias("w1"))
    )
    c12 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cw"))
    return (
        bg.join(c12, "bigram")
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("cb").cast("double") / F.col("cw"))), 4
            ).alias("avg_logp"),
        )
    )


@query(
    "mix_temperature_sampling",
    f"""
    WITH counts AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
    ),
    quota AS (
        SELECT source,
               CAST(floor(round(400.0 * pow(n_docs, 0.7)
                    / (SELECT sum(pow(n_docs, 0.7)) FROM counts), 6))
                    AS BIGINT) AS q
        FROM counts
    ),
    ranked AS (
        SELECT d.doc_id, d.source,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rk
        FROM documents d
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quota USING (source)
    WHERE r.rk <= quota.q
    """,
)
def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (the multilingual/multi-
    source rebalancing rule p_s ∝ n_s^T with T=0.7, as in mBERT/XLM-R
    and data-mixture tuning): each source gets a quota proportional
    to n^0.7 of a 400-doc target and fills it with its md5-ranked
    first documents — deterministic across engines and runs, no
    seeded RNG. The quota table is a few rows (one per source) so the
    quota join broadcasts; the only real work is one per-source
    window rank, which at 100 TB can swap to the hash-threshold
    draw (sample_hash_deterministic) when exact quotas aren't
    required."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum(F.pow("n_docs", 0.7)).alias("_t"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        # round before floor: a tree-vs-sequential float sum can land
        # the raw quota a few ulps either side of an exact integer
        # (uniform sources make this CERTAIN, not rare), and floor
        # would amplify that into a whole-row diff.
        F.floor(F.round(400.0 * F.pow("n_docs", 0.7) / F.col("_t"), 6))
        .cast("bigint").alias("q"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    ranked = d.select(
        "doc_id", "source", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("q"))
        .select("doc_id", "source")
    )


@query(
    "sample_train_val_test_split",
    f"""
    WITH tagged AS (
        SELECT lang,
               CASE WHEN {_HASH64.format(x='CAST(doc_id AS VARCHAR)')} % 10 < 8
                    THEN 'train'
                    WHEN {_HASH64.format(x='CAST(doc_id AS VARCHAR)')} % 10 = 8
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
    FROM tagged GROUP BY 1, 2
    """,
)
def sample_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by id hash — the
    reproducible alternative to randomSplit(): the SAME document
    lands in the SAME split on any engine, any run, any cluster
    size (no seed/partitioning coupling, which randomSplit has).
    Output is the per-(lang, split) census — the check that
    stratification looks sane before training. The split tag is a
    pure projection (md5 mod 10), so splitting 100 TB adds nothing
    to the scan; the census is one map-side-combinable agg."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    d = load_table(spark, sf_dir, "documents")
    h = F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(10))
    split = (
        F.when(h < 8, F.lit("train"))
        .when(h == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


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


@query(
    "graph_pagerank_trade_flows",
    f"""
    WITH edges AS (
        SELECT ns.n_name AS src, nc.n_name AS dst,
               CAST(count(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        WHERE ns.n_name <> nc.n_name
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
    norm AS (
        SELECT e.src, e.dst, e.w / o.ow AS p
        FROM edges e JOIN outw o USING (src)
    ),
    nodes AS (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges
    ),
    nn AS (SELECT count(*) AS n FROM nodes),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
    {_PR_ITER_SQL.format(t=1, p=0)},
    {_PR_ITER_SQL.format(t=2, p=1)},
    {_PR_ITER_SQL.format(t=3, p=2)}
    SELECT node, round(rank, 6) AS rank FROM pr3
    """,
)
def graph_pagerank_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the international trade-flow graph
    (supplier nation -> customer nation, edge weight = shipped line
    count, self-loops dropped): which nations CONCENTRATE trade
    gravity, not just volume. Runs the iterative graph operator
    (operators/graph.py::pagerank — fixed 3 damped rounds, each one
    rank-join + destination re-agg, lineage checkpointed per round);
    the oracle is the SAME recurrence unrolled as 3 SQL CTE levels,
    which is what makes an iterative algorithm oracle-checkable at
    all. The edge build is the q7 join shape: broadcast dims around
    one fact shuffle."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
        pagerank,
    )

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("src")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return pagerank(
        edges, src="src", dst="dst", weight="w", iterations=3, decimals=6
    )


# hash-row j = hex slice j of ONE md5 per key (operators/sketch.py
# shares the digest across rows via subexpression elimination)
_CMS_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1 + 8 * j, 8)) "
    "AS BIGINT) % 256"
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


_ZORDER_SQL_X = "user_id"
_ZORDER_SQL_Y = "CAST(round(value * 100) AS BIGINT)"


@query(
    "layout_zorder_events",
    f"""
    SELECT event_id,
           {{z}} AS zval,
           CAST(floor({{z}} / {1 << 26}) AS BIGINT) AS zbucket
    FROM events
    """.format(
        z=__import__(
            "vector_databases___hydrate_chroma_db_collection_spark.functions.layout",
            fromlist=["zorder_key_sql"],
        ).zorder_key_sql([_ZORDER_SQL_X, _ZORDER_SQL_Y], bits=16)
    ),
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, value-cents) —
    the multi-dimensional file-clustering technique behind
    OPTIMIZE ZORDER BY / Iceberg zorder rewrites: write files sorted
    by zval and footer min/max stats prune scans filtered on EITHER
    dimension. The key (functions/layout.py::zorder_key) is a pure
    shift/mask/add projection — whole-stage codegen, zero shuffle to
    compute; zbucket (top bits) is what a writer would range-
    partition on. The oracle embeds the IDENTICAL arithmetic via
    zorder_key_sql, proving the key is engine-portable (a layout job
    and a reader written in different engines must agree on the
    clustering)."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.layout import (
        zorder_key,
    )

    e = load_table(spark, sf_dir, "events")
    z = zorder_key(
        [F.col("user_id"), F.round(F.col("value") * 100).cast("bigint")],
        bits=16,
    )
    return e.select("event_id", z.alias("zval")).withColumn(
        "zbucket", F.floor(F.col("zval") / F.lit(1 << 26)).cast("bigint")
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


_CMS64_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1 + 8 * j, 8)) "
    "AS BIGINT) % 64"
)


@query(
    "stream_cms_event_users",
    f"""
    WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j)
    SELECT j AS hash_row,
           {_CMS64_BUCKET_SQL.format(key='user_id')} AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events CROSS JOIN js
    GROUP BY 1, 2
    """,
)
def stream_cms_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sketch maintenance END-TO-END: the events table is
    replayed as a file stream in forced micro-batches, each batch's
    CMS delta is merged into versioned pointer-swapped state
    (streaming/sketches.py::stream_cms_counters), and the FINAL merged
    counter table is returned. The oracle is the plain batch sketch
    in SQL — CMS linearity (sketch of union = cellwise sum of
    sketches) is exactly what makes a streaming sketch correct, so
    the hash-equality here IS the merge-correctness proof, on top of
    the pytest two-batch twin. State stays ≤ depth·width rows no
    matter how many users the stream ever sees."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.streaming.sketches import (
        read_cms_state,
        stream_cms_counters,
    )

    e = load_table(spark, sf_dir, "events").select("user_id")
    root = tempfile.mkdtemp(prefix="vdb_stream_cms_")
    in_dir = f"{root}/in"
    # two replay files -> two micro-batches via maxFilesPerTrigger
    e.filter(F.col("user_id") % 2 == 0).write.parquet(f"{in_dir}/b0")
    e.filter(F.col("user_id") % 2 == 1).write.parquet(f"{in_dir}/b1")
    stream = (
        spark.readStream.schema(e.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = stream_cms_counters(
        stream,
        "user_id",
        state_dir=f"{root}/state",
        checkpoint_dir=f"{root}/ckpt",
        depth=4,
        width=64,
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError(
            "stream_cms_event_users: availableNow stream did not drain "
            "within 300s — partial state would corrupt the oracle compare"
        )
    return read_cms_state(spark, f"{root}/state")


@query(
    "source_csv_json_roundtrip",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_csv,
           CAST(count(*) AS BIGINT) AS n_json,
           CAST(round(sum(CAST(round(value * 100) AS BIGINT)), 0) / 100.0
                AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)
def source_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-format round-trip: the events table is exported to CSV
    (header, ISO timestamps) and JSON-lines, re-read through
    explicit-schema readers (schema inference is forbidden at scale —
    it costs an extra full pass and can flip types between runs), and
    re-aggregated from EACH format. The oracle is the parquet truth:
    per-type counts from the CSV copy and the JSON copy must both
    equal the parquet count, and the value sum (order-independent
    integer cents) must survive both text round-trips — the
    CSV/JSON quoting, timestamp formatting, and float printing are
    what's under test. Readers are single-pass, splittable scans; no
    inference jobs appear in the plan."""
    import tempfile

    e = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="vdb_src_")
    csv_dir, json_dir = f"{root}/csv", f"{root}/json"
    out = e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out.write.option("header", True).mode("overwrite").csv(csv_dir)
    out.write.mode("overwrite").json(json_dir)
    schema = (
        "event_id bigint, ts string, user_id bigint, "
        "event_type string, value double, props string"
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    csv_agg = (
        spark.read.option("header", True).schema(schema).csv(csv_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_csv"),
            F.sum(cents).alias("_c_cents"),
        )
    )
    json_agg = (
        spark.read.schema(schema).json(json_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_json"),
            F.sum(cents).alias("_j_cents"),
        )
    )
    return (
        csv_agg.join(json_agg, "event_type")
        .filter(F.col("_c_cents") == F.col("_j_cents"))
        .select(
            "event_type",
            "n_csv",
            "n_json",
            (F.round(F.col("_c_cents"), 0) / 100.0)
            .cast("double")
            .alias("sum_value"),
        )
    )


@query(
    "collection_time_travel",
    """
    SELECT CAST(doc_id AS VARCHAR) AS id,
           lang AS metadata_before,
           'updated' AS metadata_after
    FROM documents
    WHERE doc_id < 50 AND doc_id % 7 = 0
    """,
)
def collection_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel end-to-end: hydrate a collection, UPDATE a slice of
    its metadata with ``retain_previous=True`` (the pointer-swap
    protocol keeps the retired dir as a readable version instead of
    deleting it — the lakehouse VACUUM-retention contract), then read
    the CURRENT and PREVIOUS versions side by side and return the
    changed rows' before/after metadata. The previous version is a
    complete, immutable dir — no log replay, no copy — because every
    rewrite already goes through versioned-dir + atomic pointer
    commit; retention just skips the post-swap delete, and
    ``vacuum_collection``'s horizon bounds how long versions
    accumulate."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_update,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_versions,
        read_collection,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    e = load_table(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id)
    root = tempfile.mkdtemp(prefix="vdb_tt_")
    hydrate(
        spark,
        joined,
        HydrationConfig(
            collection_name="tt",
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
            metadata_col="lang",
        ),
    )
    updates = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").cast("string").alias("id"),
        F.create_map(F.lit("lang"), F.lit("updated")).alias("metadata"),
    )
    collection_update(spark, root, "tt", updates, retain_previous=True)
    prev_name = [v for v, active in collection_versions(root, "tt") if not active][0]
    cur = read_collection(spark, root, "tt").select(
        "id", F.col("metadata")["lang"].alias("metadata_after")
    )
    prev = read_collection(spark, root, "tt", version=prev_name).select(
        "id", F.col("metadata")["lang"].alias("metadata_before")
    )
    return (
        prev.join(cur, "id")
        .filter(F.col("metadata_before") != F.col("metadata_after"))
        .select("id", "metadata_before", "metadata_after")
    )


@query(
    "udtf_chunk_documents",
    f"""
    WITH tok AS (
        SELECT doc_id, {_TOKS.format(x=_NORM)} AS toks
        FROM documents WHERE doc_id < 100
    ),
    idx AS (
        SELECT doc_id, toks,
               unnest(generate_series(0,
                   CASE WHEN len(toks) <= 10 THEN 0
                        ELSE CAST(ceil((len(toks) - 10) / 8.0) AS BIGINT)
                   END)) AS i
        FROM tok WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 10), ' ')
               AS chunk
    FROM idx
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface: a row-to-rows chunker
    registered and invoked through SQL's LATERAL — the fourth UDF
    shape next to scalar pandas_udf, grouped applyInPandas, and
    registered SQL UDFs. The UDTF is the API-coverage twin of the
    EXPRESSION chunker (`text_chunking` / functions.text.chunk_tokens
    — codegen, the production path at scale); a table function earns
    its per-row Python cost only when the row fan-out logic genuinely
    can't be expressed as array expressions. Window 10, step 8, same
    normalization as the token helpers, so the DuckDB oracle
    enumerates identical chunks."""
    import math
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string")
    class ChunkDoc:
        def eval(self, text: str):
            if text is None:
                return
            toks = [
                t
                for t in _re.sub(r"\s+", " ", text.lower()).strip().split(" ")
                if t
            ]
            if not toks:
                return
            n = len(toks)
            n_chunks = 1 if n <= 10 else math.ceil((n - 10) / 8.0) + 1
            for i in range(int(n_chunks)):
                yield i, " ".join(toks[i * 8 : i * 8 + 10])

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, c.chunk_idx, c.chunk "
        "FROM _udtf_docs, LATERAL chunk_doc(text) AS c"
    )


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


@query(
    "source_schema_evolution",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_batch_tag
    FROM events GROUP BY 1
    """,
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a growing dataset: an old batch written
    WITHOUT a column and a new batch written WITH an added
    ``batch_tag`` column are read together under ``mergeSchema`` —
    the widened schema applies to both, old rows surface NULL for the
    added column, and nothing is rewritten (schema-on-read, the only
    viable evolution at 100 TB; a backfill rewrite is a choice, not a
    requirement). The oracle derives the same counts from the
    original table: rows that came through the tagged batch are
    exactly the rows whose tag is non-null."""
    import tempfile

    e = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="vdb_evo_")
    old = e.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type"
    )
    new = e.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type", F.lit("b1").alias("batch_tag")
    )
    old.write.parquet(f"{root}/b0")
    new.write.parquet(f"{root}/b1")
    merged = (
        spark.read.option("mergeSchema", True)
        .option("recursiveFileLookup", True)
        .parquet(root)
    )
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("batch_tag").isNotNull().cast("bigint")).alias(
            "n_with_batch_tag"
        ),
    )


@query(
    "collection_vacuum_retention",
    """
    WITH base AS (SELECT doc_id, lang FROM documents WHERE doc_id < 40),
    v1 AS (
        SELECT CASE WHEN doc_id % 5 = 0 THEN 'v2' ELSE lang END AS lang
        FROM base
    ),
    v2 AS (
        SELECT CASE WHEN doc_id % 10 = 0 THEN 'v3'
                    WHEN doc_id % 5 = 0 THEN 'v2'
                    ELSE lang END AS lang
        FROM base
    )
    SELECT 1 AS version_idx, lang, count(*) AS n FROM v1 GROUP BY 2
    UNION ALL
    SELECT 2 AS version_idx, lang, count(*) AS n FROM v2 GROUP BY 2
    """,
)
def collection_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM with a retention policy over the time-travel store:
    hydrate, apply TWO retained updates (three on-disk versions), then
    ``vacuum_collection(older_than_s=0, keep_last=1)`` — the newest
    retained version survives regardless of age (the lakehouse
    ``VACUUM ... RETAIN`` contract), the older one is swept. The
    query returns per-lang counts for EVERY surviving version
    oldest-first, so the oracle proves both halves of the policy: the
    kept version's state (post-update-1) is readable, and the swept
    version's state (the original) is GONE — had vacuum kept it, a
    third version_idx would appear and the row counts would mismatch."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_update,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_versions,
        read_collection,
        vacuum_collection,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    e = load_table(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id)
    root = tempfile.mkdtemp(prefix="vdb_vac_")
    hydrate(
        spark,
        joined,
        HydrationConfig(
            collection_name="vac",
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
            metadata_col="lang",
        ),
    )
    for modulus, tag in ((5, "v2"), (10, "v3")):
        updates = d.filter(F.col("doc_id") % modulus == 0).select(
            F.col("doc_id").cast("string").alias("id"),
            F.create_map(F.lit("lang"), F.lit(tag)).alias("metadata"),
        )
        collection_update(spark, root, "vac", updates, retain_previous=True)
    vacuum_collection(root, "vac", older_than_s=0.0, keep_last=1)

    surviving = collection_versions(root, "vac")  # oldest-first
    per_version = [
        read_collection(spark, root, "vac", version=ver).select(
            F.lit(idx).alias("version_idx"),
            F.col("metadata")["lang"].alias("lang"),
        )
        for idx, (ver, _active) in enumerate(surviving, start=1)
    ]
    from functools import reduce

    return (
        reduce(DataFrame.unionByName, per_version)
        .groupBy("version_idx", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_bloom_pruned_revenue",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY 1
    """,
)
def join_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning: a merge-hinted shuffle join
    where the build side is highly selective (o_totalprice > 400000
    keeps ~2% of orders). With
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` (default on)
    and the application-side scan above its size threshold — always
    true at 100 TB, forced via thresholds in the plan test — Catalyst
    injects ``bloom_filter_agg`` over the filtered build keys and a
    ``might_contain`` probe into the lineitem SCAN, so ~98% of fact
    rows drop before the shuffle instead of after the join. The
    rewrite is answer-preserving (Bloom filters have no false
    negatives); this oracle proves that identity, and
    test_relational.py::test_bloom_filter_injected_into_probe_side
    proves the plan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_cents"),
        )
    )


@query(
    "rerank_learned_scorer_top3",
    f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qe
        FROM embeddings WHERE vec_id IN (1, 2, 3)
    ),
    cand AS (
        SELECT q.qid, e.vec_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4)
                   AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <= 400 AND e.vec_id <> q.qid
    ),
    top10 AS (
        SELECT qid, vec_id, cos_sim,
               row_number() OVER (
                   PARTITION BY qid ORDER BY cos_sim DESC, vec_id
               ) AS rn
        FROM cand
    ),
    feat AS (
        SELECT t.qid, t.vec_id AS doc_id, t.cos_sim,
               len({_TOKS.format(x=_NORM)}) AS n_tokens
        FROM top10 t JOIN documents d ON d.doc_id = t.vec_id
        WHERE t.rn <= 10
    ),
    scored AS (
        SELECT qid, doc_id,
               round(0.8 * cos_sim
                     + 0.2 * (1.0 / (1.0 + exp(-(n_tokens - 40.0) / 20.0))),
                     6) AS score
        FROM feat
    ),
    ranked AS (
        SELECT qid, doc_id, score,
               row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, doc_id
               ) AS rank
        FROM scored
    )
    SELECT qid, doc_id, score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def rerank_learned_scorer_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval with a grouped-applyInPandas reranker: a
    cheap exact first stage bounds each query's candidates to 10, a
    feature join adds a document signal (token count), then
    ``rerank_grouped`` re-scores each query's candidate list as ONE
    Arrow batch with a learned-scorer stub (logistic blend — a real
    cross-encoder's ``predict_proba`` drops into the same callable)
    and emits only the top 3. The expensive Python stage touches
    k*|queries| rows, never the corpus — the serving shape that holds
    at 100 TB. Scores round before ranking and ties break on doc_id,
    so the SQL twin reproduces the ranking exactly."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        token_count,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        logistic_blend_scorer,
        rerank_grouped,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    corpus = emb.filter(F.col("vec_id") <= 400)
    cand = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), F.col("qe")), 4).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    top10 = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    feat = top10.join(docs, top10.vec_id == docs.doc_id).select(
        "qid", "doc_id", "cos_sim", "n_tokens"
    )
    return rerank_grouped(
        feat,
        group_col="qid",
        id_col="doc_id",
        scorer=logistic_blend_scorer("cos_sim", "n_tokens"),
        k=3,
    )


@query(
    "pipeline_training_data_end_to_end",
    f"""
    WITH pool AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text
        FROM documents WHERE doc_id % 97 <> 0 AND doc_id % 11 = 0
    ),
    fp AS (SELECT doc_id, md5({_NORM}) AS f FROM pool),
    surv AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
    sdocs AS (
        SELECT d.doc_id, d.text FROM documents d JOIN surv s USING (doc_id)
    ),
    qbase AS (
        SELECT doc_id,
               len({_TOKS.format(x='text')}) AS tok_cnt,
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                   / greatest(length(text), 1) AS praw,
               len(list_filter({_TOKS.format(x='lower(text)')},
                   t -> list_contains({_SW['en']}, t)))::DOUBLE
                   / greatest(len({_TOKS.format(x='lower(text)')}), 1) AS swraw
        FROM sdocs
    ),
    keepq AS (
        SELECT doc_id FROM qbase
        WHERE round(0.4 * least(tok_cnt / 100.0, 1.0)
                    + 0.4 * (1.0 - praw)
                    + 0.2 * least(swraw / 0.1, 1.0), 6) >= 0.7
    ),
    {_SHINGLES_CTE},
    tr_sh AS (
        SELECT s.doc_id, s.s FROM shing s JOIN keepq k USING (doc_id)
    ),
    ev_sh AS (
        SELECT DISTINCT s FROM shing WHERE doc_id % 97 = 0
    ),
    contaminated AS (
        SELECT t.doc_id
        FROM tr_sh t JOIN ev_sh e ON t.s = e.s
        GROUP BY t.doc_id
        HAVING count(DISTINCT t.s) >= 3
    ),
    clean AS (
        SELECT doc_id FROM keepq
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    train AS (
        SELECT doc_id FROM clean
        WHERE {_HASH64.format(x='CAST(doc_id AS VARCHAR)')} % 10 < 8
    ),
    counted AS (
        SELECT t.doc_id, len({_TOKS.format(x=_NORM)}) AS tok_cnt
        FROM train t JOIN documents d USING (doc_id)
    ),
    binned AS (
        SELECT doc_id, tok_cnt,
               CAST(floor(coalesce(sum(tok_cnt) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) / 2048.0) AS BIGINT) AS seq_id
        FROM counted
    )
    SELECT seq_id,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(tok_cnt) AS BIGINT) AS tokens
    FROM binned GROUP BY 1
    """,
)
def pipeline_training_data_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data preparation pipeline as ONE Catalyst
    DAG — the composition proof that the engine's pieces chain:
    exact dedup (survivor = min id per normalized fingerprint) ->
    quality gate (>= 0.7 on the text_quality_scores formula) ->
    benchmark decontamination (drop docs sharing >= 3 distinct
    3-gram shingles with the held-out doc_id %% 97 eval slice) ->
    deterministic 80%% hash split -> token-budget sequence packing
    (distributed prefix scan, 2048/seq). Every stage is the same
    operator its standalone query uses, so this one oracle pins the
    joint semantics end-to-end. Plan shape: hash-agg dedup, pure
    projections for quality/split tags, one broadcast shingle join
    for decontamination, the two-level prefix scan for packing — no
    stage widens beyond its standalone cost, so the composition
    scales exactly as its parts do."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
        word_shingles,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        exact_dedup,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        prefix_sum,
    )

    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0

    # The fixture has no exact duplicates, so plant re-keyed copies of
    # a slice: dedup MUST collapse them back onto the original ids or
    # the extra docs shift the split/packing and the oracle mismatches
    # — the stage is load-bearing, not decorative.
    base_pool = d.filter(~is_eval).select("doc_id", "text")
    planted = base_pool.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    pool = base_pool.unionByName(planted)
    surv = exact_dedup(pool, id_col="doc_id", text_col="text").select(
        F.col("keep_id").alias("doc_id")
    )
    sdocs = d.join(surv, "doc_id").select("doc_id", "text")

    feat = T.add_text_features(sdocs)
    keepq = feat.filter(F.col("quality") >= 0.7).select("doc_id", "text")

    tr_sh = keepq.select(
        "doc_id", F.explode(F.array_distinct(word_shingles("text", 3))).alias("s")
    )
    ev_sh = (
        d.filter(is_eval)
        .select(F.explode(F.array_distinct(word_shingles("text", 3))).alias("s"))
        .distinct()
    )
    contaminated = (
        tr_sh.join(F.broadcast(ev_sh), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("_shared"))
        .filter(F.col("_shared") >= 3)
        .select("doc_id")
    )
    clean = keepq.join(contaminated, "doc_id", "left_anti")

    train = clean.filter(
        F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(10)) < 8
    )
    counted = train.select("doc_id", T.token_count("text").alias("tok_cnt"))
    binned = prefix_sum(
        counted, order_col="doc_id", value_col="tok_cnt", out_col="_before"
    ).withColumn("seq_id", F.floor(F.col("_before") / 2048.0).cast("bigint"))
    return binned.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("tok_cnt").cast("bigint").alias("tokens"),
    )


_SUBCOS = _COS_DOUBLE.format(
    a="list_slice(e.embedding, (i - 1) * 16 + 1, i * 16)",
    b="list_slice(q.qe, (j - 1) * 16 + 1, j * 16)",
)


@query(
    "retrieval_maxsim_top10",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 5),
    scored AS (
        SELECT e.vec_id,
               round(list_sum(list_transform(range(1, 5), j ->
                   list_max(list_transform(range(1, 5), i -> {_SUBCOS}))
               )), 4) AS maxsim
        FROM embeddings e, q
        WHERE e.vec_id <= 300 AND e.vec_id <> 5
    )
    SELECT vec_id, maxsim
    FROM scored
    ORDER BY maxsim DESC, vec_id
    LIMIT 10
    """,
)
def retrieval_maxsim_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (ColBERT-style MaxSim): each
    embedding is treated as 4 contiguous 16-dim sub-vector slots and
    the score is sum over query slots of the max cosine against any
    document slot — partial matches score where a single pooled
    cosine flattens them. The scoring is one Catalyst HOF expression
    over the scan (no UDF, no shuffle) feeding
    TakeOrderedAndProject, the same shuffle-free top-k shape as exact
    kNN; at 100 TB the slots would be pre-split into columns at
    ingest and the plan is otherwise unchanged."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxsim_score,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 5).select(F.col("embedding").alias("qe"))
    return (
        emb.filter((F.col("vec_id") <= 300) & (F.col("vec_id") != 5))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(maxsim_score("embedding", "qe", 4), 4).alias("maxsim"),
        )
        .orderBy(F.desc("maxsim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "retrieval_maxsim_presplit_top10",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 5),
    scored AS (
        SELECT e.vec_id,
               round(list_sum(list_transform(range(1, 5), j ->
                   list_max(list_transform(range(1, 5), i -> {_SUBCOS}))
               )), 4) AS maxsim
        FROM embeddings e, q
        WHERE e.vec_id <= 300 AND e.vec_id <> 5
    )
    SELECT vec_id, maxsim
    FROM scored
    ORDER BY maxsim DESC, vec_id
    LIMIT 10
    """,
)
def retrieval_maxsim_presplit_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``retrieval_maxsim_top10``'s PRODUCTION layout: slots are
    split ONCE per row at ingest (``split_slots`` — m slices per
    row in the scan projection) and the scorer
    (``maxsim_score_presplit``) contains zero slice calls, so the
    per-pair work is exactly the m×m cosine lattice instead of
    re-slicing both vectors 2·m² times per comparison. Same oracle,
    same answer, the plan a 100 TB late-interaction corpus wants —
    at real scale the slot column is persisted at write time and the
    scan never touches the unsplit vector at all."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxsim_score_presplit,
        split_slots,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 5).select(
        split_slots("embedding", 4).alias("q_slots")
    )
    corpus = emb.filter((F.col("vec_id") <= 300) & (F.col("vec_id") != 5)).select(
        "vec_id", split_slots("embedding", 4).alias("d_slots")
    )
    return (
        corpus.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(maxsim_score_presplit("d_slots", "q_slots"), 4).alias("maxsim"),
        )
        .orderBy(F.desc("maxsim"), F.asc("vec_id"))
        .limit(10)
    )


_PACKBITS = """list_transform(range(0, 2), w ->
        list_reduce(list_transform(range(0, 32), b ->
            CASE WHEN {arr}[w*32+b+1] > 0 THEN 1::BIGINT ELSE 0::BIGINT END),
            (acc, x) -> acc*2 + x))"""

_BKNN_COS = _COS_DOUBLE.format(a="c.emb", b="q.qe")


@query(
    "knn_binary_prescreen_top5",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
    qbits AS (SELECT {_PACKBITS.format(arr="qe")} AS qb FROM q),
    cand AS (
        SELECT e.vec_id, e.embedding AS emb,
               list_sum(list_transform(
                   list_zip({_PACKBITS.format(arr="e.embedding")}, qb.qb),
                   p -> bit_count(xor(p[1], p[2])))) AS hamming
        FROM embeddings e, qbits qb
        WHERE e.vec_id <> 7
        ORDER BY hamming, e.vec_id
        LIMIT 40
    ),
    scored AS (
        SELECT c.vec_id, round({_BKNN_COS}, 4) AS cos_sim
        FROM cand c, q
    )
    SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def knn_binary_prescreen_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized kNN serving shape: 1-bit sign packing
    (32-bit Horner words — overflow-exact in both engines), Hamming
    xor+popcount prescreen to 8x candidates, exact cosine rerank of
    only the survivors. The oracle replays BOTH stages bit-for-bit
    (same packing fold, same (distance, id) tiebreaks), so the
    approximation itself is what's checked, not just the final
    ranking. At 100 TB the packed column is the scan (16-32x less
    I/O); plan is scan -> popcount top-(k*8) -> rerank top-k, no
    shuffle (two TakeOrderedAndProject stages)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query_binary,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    return (
        knn_query_binary(
            emb.filter(F.col("vec_id") != 7),
            qvec,
            k=5,
            id_col="vec_id",
            prescreen_factor=8,
            metric="cosine",
            score_decimals=4,
        )
        .withColumnRenamed("score", "cos_sim")
    )


@query(
    "mix_dsir_importance_top20",
    """
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split_regex(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   ' '), w -> w <> '')) AS w
        FROM documents
    ),
    feats AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) % 1024 AS b
        FROM toks
    ),
    s_cnt AS (SELECT b, count(*) AS s_c FROM feats GROUP BY b),
    t_cnt AS (SELECT b, count(*) AS t_c FROM feats WHERE lang = 'en' GROUP BY b),
    tot AS (
        SELECT count(*) AS s_tot,
               count(*) FILTER (WHERE lang = 'en') AS t_tot
        FROM feats
    ),
    doc_b AS (
        SELECT doc_id, b, count(*) AS c FROM feats GROUP BY doc_id, b
    ),
    core AS (
        SELECT d.doc_id,
               sum(d.c * (ln(COALESCE(t.t_c, 0) + 1) - ln(s.s_c + 1))) AS core,
               sum(d.c) AS n_toks
        FROM doc_b d
        JOIN s_cnt s USING (b)
        LEFT JOIN t_cnt t USING (b)
        GROUP BY d.doc_id
    )
    SELECT c.doc_id,
           round(c.core + c.n_toks * (ln(tot.s_tot + 1024) - ln(tot.t_tot + 1024)),
                 4) AS dsir_weight
    FROM core c, tot
    ORDER BY dsir_weight DESC, c.doc_id
    LIMIT 20
    """,
)
def mix_dsir_importance_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): rank documents by the hashed-n-gram log importance weight
    log p_target / p_source, with the 'en' slice as the target and
    the whole corpus as the source. Features are word unigrams hashed
    to 1024 buckets via the portable md5 family (so DuckDB reproduces
    every bucket); probabilities are add-one smoothed. The scale
    shape is what matters: both bucket tables are BOUNDED at 1024
    rows (broadcast joins), the totals are one scalar aggregate, and
    the per-doc weight is a map-side-combinable sum — the 100 TB
    corpus is scanned once however big it is. Selecting top-k by
    weight IS the resampling step's deterministic skeleton (DSIR
    proper adds Gumbel noise; seeded noise drops into the same ORDER
    BY)."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    B = 1024
    d = load_table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        "lang",
        F.explode(T.tokens(T.normalize_text("text"))).alias("w"),
    ).select(
        "doc_id", "lang", F.pmod(hash64(F.col("w")), F.lit(B)).alias("b")
    )
    s_cnt = feats.groupBy("b").agg(F.count(F.lit(1)).alias("s_c"))
    t_cnt = (
        feats.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("t_c"))
    )
    tot = feats.agg(
        F.count(F.lit(1)).alias("s_tot"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("t_tot"),
    )
    doc_b = feats.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    core = (
        doc_b.join(F.broadcast(s_cnt), "b")
        .join(F.broadcast(t_cnt), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("c")
                * (
                    F.log(F.coalesce(F.col("t_c"), F.lit(0)) + F.lit(1))
                    - F.log(F.col("s_c") + F.lit(1))
                )
            ).alias("core"),
            F.sum("c").alias("n_toks"),
        )
    )
    return (
        core.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.col("core")
                + F.col("n_toks")
                * (
                    F.log(F.col("s_tot") + F.lit(B))
                    - F.log(F.col("t_tot") + F.lit(B))
                ),
                4,
            ).alias("dsir_weight"),
        )
        .orderBy(F.desc("dsir_weight"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "quality_centroid_scores",
    f"""
    WITH en AS (
        SELECT e.embedding AS emb
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        WHERE d.lang = 'en'
    ),
    centroid AS (SELECT list_value(avg(emb[1]), avg(emb[2]), avg(emb[3]), avg(emb[4]), avg(emb[5]), avg(emb[6]), avg(emb[7]), avg(emb[8]), avg(emb[9]), avg(emb[10]), avg(emb[11]), avg(emb[12]), avg(emb[13]), avg(emb[14]), avg(emb[15]), avg(emb[16]), avg(emb[17]), avg(emb[18]), avg(emb[19]), avg(emb[20]), avg(emb[21]), avg(emb[22]), avg(emb[23]), avg(emb[24]), avg(emb[25]), avg(emb[26]), avg(emb[27]), avg(emb[28]), avg(emb[29]), avg(emb[30]), avg(emb[31]), avg(emb[32]), avg(emb[33]), avg(emb[34]), avg(emb[35]), avg(emb[36]), avg(emb[37]), avg(emb[38]), avg(emb[39]), avg(emb[40]), avg(emb[41]), avg(emb[42]), avg(emb[43]), avg(emb[44]), avg(emb[45]), avg(emb[46]), avg(emb[47]), avg(emb[48]), avg(emb[49]), avg(emb[50]), avg(emb[51]), avg(emb[52]), avg(emb[53]), avg(emb[54]), avg(emb[55]), avg(emb[56]), avg(emb[57]), avg(emb[58]), avg(emb[59]), avg(emb[60]), avg(emb[61]), avg(emb[62]), avg(emb[63]), avg(emb[64])) AS c FROM en),
    scored AS (
        SELECT d.doc_id,
               round(
                   list_sum(list_transform(list_zip(e.embedding, c.c),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(e.embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(c.c,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS centroid_sim
        FROM documents d
        JOIN embeddings e ON e.vec_id = d.doc_id
        CROSS JOIN centroid c
    )
    SELECT doc_id, centroid_sim
    FROM scored ORDER BY centroid_sim DESC, doc_id LIMIT 20
    """,
)
def quality_centroid_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring, centroid flavor: embed-and-rank
    against the mean vector of a trusted reference slice (here the
    'en' documents) — the serving shape of classifier-based data
    curation (FineWeb-Edu / phi-style filters score documents with a
    small model; the infrastructure cost is identical, one broadcast
    model/centroid + one scan). The centroid is ONE aggregation
    (64 per-dimension avgs in a single pass), broadcast as a 1-row
    frame; scoring is the usual codegen cosine feeding
    TakeOrderedAndProject. Swapping the centroid for a real
    classifier means replacing the cosine expression with a
    pandas_udf over the same broadcast — the plan does not change
    shape."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id)
    cent = (
        joined.filter(F.col("lang") == "en")
        .agg(
            F.array(
                *[F.avg(F.element_at("embedding", i)) for i in range(1, 65)]
            ).alias("c")
        )
    )
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )

    return (
        joined.crossJoin(F.broadcast(cent))
        .select(
            "doc_id",
            F.round(cosine_similarity("embedding", "c"), 4).alias("centroid_sim"),
        )
        .orderBy(F.desc("centroid_sim"), F.asc("doc_id"))
        .limit(20)
    )


_MMR_COS0 = _COS_DOUBLE.format(a="e.embedding", b="q.qe")
_MMR_COS1 = _COS_DOUBLE.format(a="c.de", b="p.e1")
_MMR_COS2 = _COS_DOUBLE.format(a="c.de", b="r.e2")


@query(
    "rerank_mmr_diversity_top3",
    f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qe
        FROM embeddings WHERE vec_id IN (1, 2, 3)
    ),
    cand0 AS (
        SELECT q.qid, e.vec_id, e.embedding AS de,
               round({_MMR_COS0}, 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <= 300 AND e.vec_id <> q.qid
    ),
    cand AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn
            FROM cand0) WHERE rn <= 8
    ),
    p1 AS (SELECT qid, vec_id AS id1, de AS e1 FROM cand WHERE rn = 1),
    m2 AS (
        SELECT c.qid, c.vec_id, c.de,
               round(0.7 * c.cos_sim
                     - 0.3 * round({_MMR_COS1}, 4), 6) AS mmr
        FROM cand c JOIN p1 p USING (qid)
        WHERE c.vec_id <> p.id1
    ),
    p2 AS (
        SELECT qid, vec_id AS id2, de AS e2 FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY mmr DESC, vec_id) AS rr
            FROM m2) WHERE rr = 1
    ),
    m3 AS (
        SELECT c.qid, c.vec_id,
               round(0.7 * c.cos_sim
                     - 0.3 * greatest(round({_MMR_COS1}, 4),
                                      round({_MMR_COS2}, 4)), 6) AS mmr
        FROM cand c JOIN p1 p USING (qid) JOIN p2 r USING (qid)
        WHERE c.vec_id <> p.id1 AND c.vec_id <> r.id2
    ),
    p3 AS (
        SELECT qid, vec_id AS id3 FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY mmr DESC, vec_id) AS rr
            FROM m3) WHERE rr = 1
    )
    SELECT qid, id1 AS doc_id, CAST(1 AS INT) AS rank FROM p1
    UNION ALL SELECT qid, id2 AS doc_id, CAST(2 AS INT) AS rank FROM p2
    UNION ALL SELECT qid, id3 AS doc_id, CAST(3 AS INT) AS rank FROM p3
    """,
)
def rerank_mmr_diversity_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversity selection over each
    query's top-8 cosine candidates: rank 1 is the most relevant,
    ranks 2-3 maximize 0.7*relevance - 0.3*max-similarity-to-picked
    — the redundancy penalty that keeps RAG context windows from
    filling with near-duplicates. The greedy loop runs as grouped
    applyInPandas over <= 8 rows per query (operator
    ``retrieval.mmr_rerank``); the oracle UNROLLS the same greedy
    steps (pick1 -> penalized argmax -> pick2 -> ...), with pairwise
    cosines rounded half-up to 4 and MMR values to 6 on both sides,
    ties on ascending id — a sequential algorithm made
    hash-checkable."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        mmr_rerank,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    cand = (
        emb.filter(F.col("vec_id") <= 300)
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("doc_id"),
            "embedding",
            F.round(cosine_similarity(F.col("embedding"), F.col("qe")), 4).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    top8 = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 8)
    return mmr_rerank(
        top8.select("qid", "doc_id", "embedding", "cos_sim"),
        group_col="qid",
        id_col="doc_id",
        vec_col="embedding",
        base_score_col="cos_sim",
        k=3,
        lam=0.7,
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
    "collection_version_diff",
    """
    SELECT CAST(doc_id AS VARCHAR) AS id, 'removed' AS change
    FROM documents WHERE doc_id < 50 AND doc_id % 13 = 0
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), 'changed'
    FROM documents WHERE doc_id < 50 AND doc_id % 7 = 0 AND doc_id % 13 <> 0
    UNION ALL
    SELECT CAST(doc_id + 1000 AS VARCHAR), 'added'
    FROM documents WHERE doc_id < 10
    """,
)
def collection_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between collection versions: hydrate, then
    update metadata (%7, retaining the original version), delete ids
    (%13), and upsert 10 re-keyed new docs — then ``collection_diff``
    classifies every id as added / removed / changed against the
    retained original (delete wins over update for ids hit by both,
    e.g. id 0). One full-outer join of two complete version dirs — no
    log replay, the same reason time travel is O(1) here. The oracle
    derives the expected change set straight from the base table."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_delete,
        collection_diff,
        collection_update,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_versions,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_diff_")

    def cfg(on_duplicate: str = "error") -> HydrationConfig:
        return HydrationConfig(
            collection_name="vd",
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
            metadata_col="lang",
            on_duplicate=on_duplicate,
        )

    hydrate(spark, d.join(e, d.doc_id == e.vec_id), cfg())
    updates = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").cast("string").alias("id"),
        F.create_map(F.lit("lang"), F.lit("updated")).alias("metadata"),
    )
    collection_update(spark, root, "vd", updates, retain_previous=True)
    doomed = [str(r["doc_id"]) for r in d.filter(F.col("doc_id") % 13 == 0).collect()]
    collection_delete(spark, root, "vd", ids=doomed)
    newbies = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select((F.col("doc_id") + 1000).alias("doc_id"), "text", "lang")
    )
    hydrate(
        spark,
        newbies.join(
            e.select((F.col("vec_id") + 1000).alias("doc_id"), "embedding"),
            "doc_id",
        ),
        cfg(on_duplicate="upsert"),
    )
    original = [v for v, active in collection_versions(root, "vd") if not active][0]
    return collection_diff(spark, root, "vd", from_version=original)


@query(
    "pack_greedy_bins",
    f"""
    WITH RECURSIVE counted AS (
        SELECT doc_id, lang AS shard,
               CAST(len({_TOKS.format(x=_NORM)}) AS BIGINT) AS tok_cnt
        FROM documents
    ),
    ordered AS (
        SELECT shard, doc_id, tok_cnt,
               row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM counted
    ),
    packed(shard, rn, doc_id, tok_cnt, bin_id, bin_fill) AS (
        SELECT shard, rn, doc_id, tok_cnt, CAST(0 AS BIGINT), tok_cnt
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.doc_id, o.tok_cnt,
               CASE WHEN p.bin_fill > 0 AND p.bin_fill + o.tok_cnt > 256
                    THEN p.bin_id + 1 ELSE p.bin_id END,
               CASE WHEN p.bin_fill > 0 AND p.bin_fill + o.tok_cnt > 256
                    THEN o.tok_cnt ELSE p.bin_fill + o.tok_cnt END
        FROM packed p JOIN ordered o
          ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT shard, doc_id, tok_cnt AS n_tokens, bin_id, bin_fill
    FROM packed
    """,
)
def pack_greedy_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT greedy sequence packing (operators/pack.py): documents
    never straddle a bin — a bin closes when the next document no
    longer fits, and an over-budget document gets a bin of its own.
    Complements pack_sequences_by_token_budget, whose contiguous
    floor-cumsum fill SPLITS documents across sequence boundaries
    (the packed-pretraining discipline); this is the
    sample-integrity discipline (SFT/eval batches, where a document
    must stay whole). Sharded by lang: one hash shuffle, then each
    shard packs in ONE ordered Arrow pass (applyInPandas) — shards
    are the parallelism unit at scale. The oracle replays the greedy
    recurrence as a DuckDB recursive CTE."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pack import (
        pack_greedy,
    )

    d = load_table(spark, sf_dir, "documents")
    counted = d.select(
        "doc_id",
        F.col("lang").alias("shard"),
        T.token_count(T.normalize_text("text")).alias("tok_cnt"),
    )
    return pack_greedy(
        counted, id_col="doc_id", size_col="tok_cnt", shard_col="shard", budget=256
    ).select("shard", "doc_id", "n_tokens", "bin_id", "bin_fill")


@query(
    "decontaminate_overlap_fraction",
    f"""
    WITH {_SHINGLES_CTE},
    bench AS (SELECT DISTINCT s FROM shing WHERE doc_id % 41 = 0),
    hits AS (
        SELECT sh.doc_id, count(*) AS c
        FROM shing sh JOIN bench b ON b.s = sh.s
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(z.n_sh, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(h.c, 0) AS BIGINT) AS n_overlap,
           round(coalesce(h.c, 0)::DOUBLE
                 / greatest(coalesce(z.n_sh, 0), 1), 4) AS overlap_frac,
           round(coalesce(h.c, 0)::DOUBLE
                 / greatest(coalesce(z.n_sh, 0), 1), 4) >= 0.2 AS contaminated
    FROM documents d
    LEFT JOIN sizes z ON z.doc_id = d.doc_id
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    """,
)
def decontaminate_overlap_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination FRACTION against a benchmark slice
    (doc_id % 41 == 0 plays the eval suite): share of a doc's
    distinct 3-grams that appear anywhere in the benchmark, plus the
    >= 0.2 gate — the GPT-3-style dirty-document score, complementing
    decontaminate_ngram_overlap's pairwise (train_doc, eval_doc)
    listing. Engine plan (operators/decontaminate.py): benchmark
    n-gram HASHES broadcast (8 B/row), docs explode to distinct
    n-gram hashes inside the scan stage, one map-side-combinable agg
    per doc — the only shuffle carries one row per document. Note the
    benchmark docs themselves score 1.0 (they are their own
    n-grams), which keeps the gate non-vacuous on the fixture."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.decontaminate import (
        ngram_overlap,
    )

    d = load_table(spark, sf_dir, "documents")
    return ngram_overlap(
        d,
        d.filter(F.col("doc_id") % 41 == 0),
        id_col="doc_id",
        text_col="text",
        n=3,
        threshold=0.2,
    )


@query(
    "scd2_user_event_type",
    """
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER w AS prev_type,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_id, ts, event_type
        FROM ordered
        WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
    ),
    iv AS (
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM changes
    )
    SELECT user_id, event_type,
           epoch_us(valid_from) AS valid_from_us,
           epoch_us(valid_to) AS valid_to_us,
           valid_to IS NULL AS is_current
    FROM iv
    """,
)
def scd2_user_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog -> SCD2 dimension (operators/relational.py::
    scd2_from_changelog): each user's event stream compacts into
    validity intervals of their event_type attribute — consecutive
    unchanged rows merge, every attribute flip opens a period, the
    open period carries valid_to NULL / is_current true. The classic
    warehouse shape for building dimension history from CDC streams.
    Plan: ONE shuffle on user_id feeds both window passes (lag to
    mark changes, lead over the filtered change rows to close
    periods) — Catalyst reuses the exchange. Timestamps project to
    epoch micros so both engines hash identical integers."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        scd2_from_changelog,
    )

    e = load_table(spark, sf_dir, "events")
    out = scd2_from_changelog(
        e,
        key_col="user_id",
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_col="event_id",
    )
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.col("valid_to").cast("timestamp")).alias("valid_to_us"),
        "is_current",
    )


@query(
    "scd2_point_in_time_revenue",
    """
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER w AS prev_type,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_id, ts, event_type FROM ordered
        WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
    ),
    dim AS (
        SELECT user_id, event_type AS segment, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM changes
    )
    SELECT d.segment,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events e
    JOIN dim d
      ON d.user_id = e.user_id
     AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    GROUP BY 1
    """,
)
def scd2_point_in_time_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the SCD2 dimension that
    scd2_user_event_type builds: every event joins the dimension row
    whose validity interval covers its timestamp, then value rolls up
    by the then-active segment. The fact->dimension-history join is
    an equi-join on the KEY plus an interval predicate — so the
    shuffle is keyed (user_id), never a broadcast-nested-loop over
    time ranges; per key the interval check is a residual filter on
    the joined rows. This is the standard "attribute facts to the
    dimension version that was true at event time" warehouse query,
    run here with the dimension built in the same plan (CDC ->
    SCD2 -> PIT join, no materialization step)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        scd2_from_changelog,
    )

    e = load_table(spark, sf_dir, "events")
    dim = scd2_from_changelog(
        e,
        key_col="user_id",
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_col="event_id",
    ).select(
        "user_id",
        F.col("event_type").alias("segment"),
        "valid_from",
        "valid_to",
    )
    joined = e.join(
        dim,
        (e.user_id == dim.user_id)
        & (e.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (e.ts < dim.valid_to)),
    )
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        _money_sum(F.col("value")).alias("total_value"),
    )
