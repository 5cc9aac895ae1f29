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


def test_cms_estimate_one_sided_and_exact_when_wide(spark):
    """CM guarantee: estimate >= true count always; with width >>
    #distinct keys (no collisions) the estimate is EXACT."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )
    from pyspark.sql import functions as F

    df = spark.range(1000).select((F.col("id") % 7).alias("k"))
    truth = df.groupBy(F.col("k").alias("key")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    # narrow sketch: collisions possible, estimates one-sided
    narrow = cms_estimate(
        cms_counters(df, "k", depth=3, width=4), truth, "key", depth=3, width=4
    )
    assert all(r["cms_est"] >= r["true_cnt"] for r in narrow.collect())
    # wide sketch: 7 keys into 1024 buckets x 4 rows -> exact
    wide = cms_estimate(
        cms_counters(df, "k", depth=4, width=1024),
        truth, "key", depth=4, width=1024,
    )
    assert all(r["cms_est"] == r["true_cnt"] for r in wide.collect())


def test_zorder_key_interleaves_and_orders_locally(spark):
    """Bit-exact Morton check against a Python reference, plus the
    locality property: the key of (x, y) differs from (x, y+1) only
    above the y-bit positions."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.layout import (
        zorder_key,
    )
    from pyspark.sql import functions as F

    def morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(3, 5), (0, 0), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == morton(x, y)


def test_ewma_closed_form_matches_recurrence(spark):
    """window_ewma_user_value unrolls y_i = 0.9 y_{i-1} + 0.1 x_i into
    a weighted window sum; its DuckDB oracle uses the SAME closed
    form, so parity alone cannot catch a shared algebra error. This
    asserts the closed form against the literal Python recurrence."""
    import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    vals = [3.0, 1.0, 4.0, 1.5, 9.25]
    y = vals[0]
    for x in vals[1:]:
        y = 0.9 * y + 0.1 * x

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (7, i, t0 + datetime.timedelta(seconds=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    seq = df.select(
        "user_id", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    term = F.when(
        F.col("rn") == 1, F.pow(F.lit(0.9), F.col("n") - 1) * F.col("value")
    ).otherwise(
        F.lit(0.1) * F.pow(F.lit(0.9), F.col("n") - F.col("rn")) * F.col("value")
    )
    got = seq.groupBy("user_id").agg(F.sum(term).alias("ewma")).first()["ewma"]
    assert abs(got - y) < 1e-9


def test_zorder_key_hypothesis_roundtrip(spark):
    """Property: the Morton key is a bijection on (x, y) — decode the
    Spark-computed key in Python and recover both coordinates."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.functions.layout import (
        zorder_key,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 65535), st.integers(0, 65535)
            ),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    def check(pairs):
        df = spark.createDataFrame(pairs, "x int, y int")
        got = df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z")
        ).collect()
        for r in got:
            x = y = 0
            for i in range(16):
                x |= ((r["z"] >> (2 * i)) & 1) << i
                y |= ((r["z"] >> (2 * i + 1)) & 1) << i
            assert (x, y) == (r["x"], r["y"])

    check()


def test_cms_estimate_survives_colliding_key_columns(spark):
    """keys frames named like the counter schema (hash_row/bucket)
    must pass through untouched — internal probe columns are
    underscore-prefixed."""
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    df = spark.range(100).select((F.col("id") % 5).alias("hash_row"))
    counters = cms_counters(df, "hash_row", depth=2, width=512)
    keys = df.groupBy(F.col("hash_row")).agg(
        F.count(F.lit(1)).alias("bucket")  # deliberately colliding names
    )
    got = cms_estimate(counters, keys, "hash_row", depth=2, width=512)
    assert sorted(got.columns) == ["bucket", "cms_est", "hash_row"]
    assert all(r["cms_est"] == r["bucket"] for r in got.collect())  # exact (wide)


def test_salted_join_rejects_right_outer(spark):
    import pytest

    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        salted_join,
    )

    a = spark.createDataFrame([(1, "a")], "k int, v string")
    b = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    with pytest.raises(ValueError, match="phantom"):
        salted_join(a, b, "k", buckets=4, how="right")
    # left stays supported and correct
    got = salted_join(a, b, "k", buckets=4, how="left").collect()
    assert len(got) == 1 and got[0]["w"] == "x"


def test_asof_join_ignores_null_right_timestamps(spark):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        asof_join,
    )

    left = spark.createDataFrame([(1, 10)], "k int, lt int")
    right = spark.createDataFrame(
        [(1, None, "null-time"), (1, 50, "at-50")],
        "k int, rt int, payload string",
    )
    got = asof_join(
        left, right, on="k", left_time="lt", right_time="rt"
    ).collect()
    assert len(got) == 1
    assert got[0]["payload"] is None  # no EARLIER right row; NULL rt excluded


def test_bloom_filter_injected_into_probe_side(spark):
    """With the runtime Bloom-filter thresholds opened (they gate on
    scan sizes that are always exceeded at production scale), Catalyst
    must inject a bloom_filter_agg over the selective build side and a
    might_contain probe on the fact side of the merge join — and the
    pruned plan must return the identical result."""
    from vector_databases___hydrate_chroma_db_collection_spark.queries import (
        QUERIES,
    )

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        df = QUERIES["join_bloom_pruned_revenue"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        pruned = {r["priority"]: (r["n_items"], r["revenue_cents"]) for r in df.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)

    plain = QUERIES["join_bloom_pruned_revenue"](spark, SF_SMOKE)
    assert "bloom_filter_agg" not in plain._jdf.queryExecution().optimizedPlan().toString()
    unpruned = {r["priority"]: (r["n_items"], r["revenue_cents"]) for r in plain.collect()}
    assert pruned == unpruned


def test_rerank_grouped_edges(spark):
    """Groups smaller than k emit all their rows with dense ranks;
    ties break on ascending id; k < 1 raises."""
    import pytest as _pytest

    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        rerank_grouped,
    )

    cand = spark.createDataFrame(
        [
            ("q1", 3, 0.5), ("q1", 1, 0.5), ("q1", 2, 0.9),
            ("q2", 7, 0.1),
        ],
        "qid string, doc_id int, s double",
    )
    got = rerank_grouped(
        cand,
        group_col="qid",
        id_col="doc_id",
        scorer=lambda pdf: pdf["s"],
        k=2,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    assert sorted(by_q["q1"]) == [(1, 2, 0.9), (2, 1, 0.5)]  # tie -> lower id
    assert sorted(by_q["q2"]) == [(1, 7, 0.1)]  # short group keeps all

    with _pytest.raises(ValueError):
        rerank_grouped(
            cand, group_col="qid", id_col="doc_id",
            scorer=lambda pdf: pdf["s"], k=0,
        )


def test_mmr_rerank_skips_redundant_twin(spark):
    """Two near-identical top candidates: plain relevance ranks them
    1-2, but MMR's redundancy penalty must push the twin below a less
    relevant but orthogonal candidate; ranks and k<1 validation hold."""
    import pytest as _pytest

    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        mmr_rerank,
    )

    rows = [
        # (qid, doc_id, embedding, cos_sim): docs 1,2 are twins along
        # the query axis; doc 3 is orthogonal with lower relevance
        (1, 1, [1.0, 0.0, 0.0], 0.99),
        (1, 2, [0.999, 0.01, 0.0], 0.985),
        (1, 3, [0.0, 1.0, 0.0], 0.80),
    ]
    cand = spark.createDataFrame(
        rows, "qid int, doc_id int, embedding array<double>, cos_sim double"
    )
    got = {
        r["rank"]: r["doc_id"]
        for r in mmr_rerank(
            cand,
            group_col="qid",
            id_col="doc_id",
            vec_col="embedding",
            base_score_col="cos_sim",
            k=3,
            lam=0.7,
        ).collect()
    }
    # mmr(doc2 | {1}) = .7*.985 - .3*~1.0 ≈ .39
    # mmr(doc3 | {1}) = .7*.80  - .3*0.0  = .56 -> the orthogonal doc wins
    assert got == {1: 1, 2: 3, 3: 2}

    with _pytest.raises(ValueError):
        mmr_rerank(
            cand, group_col="qid", id_col="doc_id", vec_col="embedding",
            base_score_col="cos_sim", k=0,
        )


def test_gopher_flags_canonical_rules(spark):
    """Published Gopher thresholds on constructed documents: a clean
    English paragraph passes; too-short, symbol-spammed, and
    stopword-free documents each fail on exactly the intended rule."""
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        gopher_flags,
    )

    good = (
        "the quick brown fox jumps over that lazy dog and runs with "
        "great speed to have some fun in fields of green grass today "
    ) * 3  # 66 words, all alpha, plenty of distinct stopwords
    short = "the cat sat on the mat"  # 6 words < 50
    symbols = ("the data ### and ### that ### have ### with " * 12)  # symbol spam
    nostop = "alpha beta gamma delta epsilon zeta eta theta " * 8  # no stopwords

    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, nostop)], "id int, text string"
    )
    rows = {
        r["id"]: r["g"]
        for r in df.select("id", gopher_flags("text").alias("g")).collect()
    }
    assert rows[1]["gopher_pass"] is True
    assert rows[2]["gopher_pass"] is False and rows[2]["n_words"] < 50
    assert rows[3]["gopher_pass"] is False and rows[3]["symbol_ratio"] >= 0.1
    assert rows[4]["gopher_pass"] is False and rows[4]["has_stopwords"] is False
    # rule independence: the failing docs fail ONLY their target rule
    assert rows[3]["has_stopwords"] is True
    assert rows[4]["n_words"] >= 50


def test_gopher_flags_empty_doc_classifies_not_crashes(spark):
    """An empty / whitespace-only document must CLASSIFY as failing
    the gate (ratios 0.0), never raise — Spark 4 ANSI divides by zero
    loudly, and a quality filter exists precisely to eat garbage."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        gopher_flags,
    )

    df = spark.createDataFrame([(1, ""), (2, "   \t  ")], "id int, text string")
    rows = {
        r["id"]: r["g"]
        for r in df.select("id", gopher_flags("text").alias("g")).collect()
    }
    for i in (1, 2):
        assert rows[i]["n_words"] == 0
        assert rows[i]["gopher_pass"] is False
        assert rows[i]["mean_word_len"] == 0.0


def test_scd2_from_changelog_semantics(spark):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        scd2_from_changelog,
    )

    rows = [
        # key 1: a, a, b, b, a -> periods a[1,3) b[3,5) a[5,None)
        (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "b"), (1, 5, "a"),
        # key 2: NULL, NULL, x -> periods NULL[1,3) x[3,None)
        (2, 1, None), (2, 2, None), (2, 3, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, attr string")
    got = [
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_from_changelog(
            df, key_col="k", ts_col="t", attr_cols=["attr"]
        ).orderBy("k", "valid_from").collect()
    ]
    assert got == [
        (1, "a", 1, 3, False),
        (1, "b", 3, 5, False),
        (1, "a", 5, None, True),
        (2, None, 1, 3, False),
        (2, "x", 3, None, True),
    ]
    # exactly one open period per key
    cur = [g for g in got if g[4]]
    assert len(cur) == 2


def test_scd2_single_exchange(spark):
    """Both window passes must share ONE shuffle on the key."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        scd2_from_changelog,
    )

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "k long, t long, attr string"
    )
    plan = scd2_from_changelog(
        df, key_col="k", ts_col="t", attr_cols=["attr"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_cms_estimate_release_hook(spark):
    """cms_estimate pins its counter cache eagerly; the shared
    release hook must unpersist it deterministically (r7 advice —
    many sketches in one session otherwise accumulate pinned
    CacheManager entries)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators._cache import (
        release_cache,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    df = spark.range(1000).select((F.col("id") % 7).alias("k"))
    counters = cms_counters(df, "k", depth=2, width=64)
    keys = spark.createDataFrame([(0,), (3,)], "key bigint")
    est = cms_estimate(counters, keys, "key", depth=2, width=64)
    assert est.count() == 2
    deps = est._spark_graft_cached_deps
    assert len(deps) == 1 and deps[0].storageLevel.useMemory
    release_cache(est)
    assert not deps[0].storageLevel.useMemory
    release_cache(est)  # idempotent no-op after deps cleared
