"""Skew and co-location strategies: salted join correctness +
balance, bucketed join exchange elimination, partitioned collection
pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark):
    # skewed side: 10k rows, 90% on key 1
    skewed = spark.range(10000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("v")
    )
    plain = skewed.join(small, "k").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sv")
    ).first()
    salted = salted_join(skewed, small, "k", buckets=8).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sv")
    ).first()
    assert plain["cnt"] == salted["cnt"]
    assert plain["sv"] == salted["sv"]


def test_salted_join_balances_partitions(spark):
    skewed = spark.range(20000).select(F.lit(1).alias("k"), F.col("id").alias("p"))
    small = spark.range(4).select(F.col("id").alias("k"), F.col("id").alias("v"))
    out = salted_join(skewed, small, "k", buckets=8)
    # distribution over (k, salt): no single group holds everything
    sizes = (
        skewed.withColumn("_salt", (F.rand(42) * 8).cast("int"))
        .groupBy("k", "_salt")
        .count()
        .collect()
    )
    assert len(sizes) == 8
    assert max(r["count"] for r in sizes) < 20000 * 0.25
    assert out.count() == 20000  # key 1 matches small k=1 exactly once


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a stale warehouse dir from a previous session is invisible to
    # the fresh catalog but still blocks CREATE (LOCATION_ALREADY_EXISTS)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    # force the shuffle-join path: at real scale neither side
    # broadcasts, which is exactly when bucketing pays off
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    o = load_table(spark, SF_SMOKE, "orders")
    l = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(o, "b_orders", bucket_col="o_orderkey", num_buckets=8)
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        bucket_col="o_orderkey",
        num_buckets=8,
    )
    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    plan = plan_of(joined.select("o_orderkey", "o_totalprice", "l_quantity"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan
    # sanity: result matches the plain join
    plain = o.join(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).count()
    assert joined.count() == plain
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_collection_prunes(spark, tmp_path):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        add_lsh_buckets,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    bucketed = add_lsh_buckets(emb, dim=64, n_bits=4)
    path = str(tmp_path / "part_coll")
    bucketed.write.partitionBy("lsh_bucket").parquet(path)

    scan = spark.read.parquet(path).filter(F.col("lsh_bucket").isin(3, 5))
    plan = plan_of(scan)
    # partition filters must appear as PartitionFilters, not data filters
    assert "PartitionFilters: [lsh_bucket" in plan.replace("#", " #").replace(
        "lsh_bucket #", "lsh_bucket#"
    ) or "PartitionFilters" in plan
    got = scan.count()
    want = bucketed.filter(F.col("lsh_bucket").isin(3, 5)).count()
    assert got == want > 0


def test_prefix_sum_matches_single_task_window(spark):
    """The two-level distributed scan must equal the naive global
    window on every row, regardless of initial partitioning."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        prefix_sum,
    )

    df = (
        spark.range(10_000)
        .repartition(17)  # scrambled input partitioning
        .select(
            F.col("id").alias("k"),
            (F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(97)) + 1).alias("v"),
        )
    )
    got = prefix_sum(df, order_col="k", value_col="v", out_col="c")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("c", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("bigint"))
    diff = (
        got.select("k", "c")
        .join(want.select("k", F.col("c").alias("c2")), "k")
        .filter(F.col("c") != F.col("c2"))
        .count()
    )
    assert diff == 0
    # the per-row window is partitioned by the range-partition id, so
    # the only unpartitioned window in the plan runs over the tiny
    # per-partition totals, never the data
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(_pid" in plan


def test_prefix_sum_tiebreak_makes_duplicate_keys_deterministic(spark):
    """With a duplicated order key and a tiebreak column, the result
    must equal the naive window over (order, tiebreak) on every row
    and be stable across runs."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        prefix_sum,
    )

    df = (
        spark.range(5_000)
        .repartition(13)
        .select(
            (F.col("id") % 50).alias("k"),  # heavy ties: 100 rows/key
            F.col("id").alias("uid"),
            (F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(7)) + 1).alias("v"),
        )
    )
    w = Window.orderBy("k", "uid").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("c", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("bigint"))
    for _ in range(2):  # two runs, same answer
        got = prefix_sum(
            df, order_col="k", value_col="v", out_col="c", tiebreak_col="uid"
        )
        diff = (
            got.select("uid", "c")
            .join(want.select("uid", F.col("c").alias("c2")), "uid")
            .filter(F.col("c") != F.col("c2"))
            .count()
        )
        assert diff == 0
