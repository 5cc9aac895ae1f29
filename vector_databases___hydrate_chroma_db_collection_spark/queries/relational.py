"""Relational algebra: joins (all types), set ops, sampling, pivot, SQL UDF/UDTF, graph.

Split from the original single-file registry (r8); every query keeps
its exact name, body, and oracle — `tools/parity_local.py` guards the
registry contract across the split.
"""

from __future__ import annotations

from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401
    D,
    DataFrame,
    F,
    SparkSession,
    T,
    _FLAGSHIP_ORACLE,
    _HASH64,
    _NORM,
    _PR_ITER_SQL,
    _SHINGLES_CTE,
    _STRATA_RATES,
    _SW,
    _TOKS,
    _cents,
    _money_sum,
    load_table,
    query,
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
    # explicit aliases: dim derives from e, so attribute references
    # (e.user_id == dim.user_id) would lean on DeduplicateRelations'
    # ambiguous-self-join disambiguation — fragile across refactors
    f, d = e.alias("f"), dim.alias("d")
    joined = f.join(
        d,
        (F.col("f.user_id") == F.col("d.user_id"))
        & (F.col("f.ts") >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (F.col("f.ts") < F.col("d.valid_to"))),
    )
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        _money_sum(F.col("value")).alias("total_value"),
    )
