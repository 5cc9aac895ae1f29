"""TPC-H q1-q22: the relational benchmark suite over the fixture tables.

Split from the original single-file registry (r8); every query keeps
its exact name, body, and oracle — `tools/parity_local.py` guards the
registry contract across the split.
"""

from __future__ import annotations

from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _cents,
    _money_sum,
    load_table,
    query,
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
