"""Physical-plan assertions: the engine's scale contract is that
Catalyst produces the plan shapes we designed for (SURVEY.md §4).
These tests freeze them: predicate pushdown reaching parquet, column
pruning, broadcast joins for dim tables, TakeOrderedAndProject for
top-k, and no shuffle in the single-query kNN path."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark import queries as registry
from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import load_table

from .conftest import SF_CORRECT


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_knn_query_plan_no_shuffle_pushdown(spark):
    df = registry.QUERIES["knn_top5_cosine"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle anywhere
    assert "PushedFilters: [IsNotNull(vec_id), Not(EqualTo(vec_id,1))]" in plan


def test_column_pruning_reaches_scan(spark):
    li = load_table(spark, SF_CORRECT, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(li)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_q3_broadcasts_dimension_side(spark):
    df = registry.QUERIES["q3_shipping_priority"](spark, SF_CORRECT)
    assert "BroadcastHashJoin" in plan_of(df)


def test_q5_single_fact_shuffle(spark):
    df = registry.QUERIES["q5_region_revenue"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    # the only sort-merge-worthy pair is orders x lineitem; everything
    # else must broadcast (dims are tiny)
    assert plan.count("SortMergeJoin") <= 1


def test_top10_is_take_ordered(spark):
    df = registry.QUERIES["sort_top10_orders"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort materialization


def test_semi_and_anti_join_operators(spark):
    semi = registry.QUERIES["join_semi_customers_with_urgent_orders"](spark, SF_CORRECT)
    anti = registry.QUERIES["join_anti_customers_without_orders"](spark, SF_CORRECT)
    assert "LeftSemi" in plan_of(semi)
    assert "LeftAnti" in plan_of(anti)


def test_q1_partial_aggregation(spark):
    df = registry.QUERIES["q1_pricing_summary"](spark, SF_CORRECT)
    plan = plan_of(df)
    # partial (map-side) then final hash aggregation around one exchange
    # (AQE prints the pre-finalized plan here; codegen appears on run)
    assert plan.count("HashAggregate") >= 2
    assert "AdaptiveSparkPlan" in plan


def test_date_filter_pushed_to_parquet(spark):
    o = load_table(spark, SF_CORRECT, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01"))
    )
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan_of(o)


def test_tfidf_broadcasts_corpus_count(spark):
    """The single-row corpus-size side must broadcast (explicit
    F.broadcast); the tf x df token join may shuffle — it's the only
    data-sized exchange in the plan."""
    df = registry.QUERIES["text_tfidf_top_terms"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_funnel_has_no_cartesian(spark):
    df = registry.QUERIES["funnel_view_click_purchase"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan


def test_simhash_hamming_no_cross_join(spark):
    """Banding must keep the candidate join an equi-join — a plan with
    a cartesian/nested-loop over the corpus would mean the pigeonhole
    bucketing fell out of the join keys."""
    df = registry.QUERIES["dedup_simhash_hamming_pairs"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_binary_prescreen_two_stage_topk_no_shuffle(spark):
    """The binary-kNN serving claim (LATE MATERIALIZATION, r15 —
    knn.knn_query_binary docstring): the prescreen top-k heap runs
    over NARROW (id, hamming) rows, the k*factor rerank payloads come
    back through ONE broadcast self-join (a point read at scale), and
    no row-shuffling exchange appears anywhere — the only Exchange is
    the broadcast of the bounded candidate id set."""
    df = registry.QUERIES["knn_binary_prescreen_top5"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert plan.count("TakeOrderedAndProject") == 2, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    shuffles = plan.replace("BroadcastExchange", "").replace(
        "ReusedExchange", ""
    )
    assert "Exchange" not in shuffles, plan
    # the heap's output is the id alone — the float payload must NOT
    # ride through the prescreen TakeOrderedAndProject
    import re

    pre = re.search(
        r"TakeOrderedAndProject\(limit=\d+, orderBy=\[hamming[^\n]*", plan
    )
    assert pre is not None and "embedding" not in pre.group(0), plan


def test_partitioned_layout_prunes_partitions(spark):
    """The hive-partitioned roundtrip must satisfy the event_type
    filter with PARTITION pruning (directory listing), not row
    filtering: the scan's PartitionFilters carry the predicate and
    only 1/5 of the partitions is read."""
    df = registry.QUERIES["layout_partitioned_write_prune"](spark, SF_CORRECT)
    plan = plan_of(df)
    assert "PartitionFilters: [" in plan and "event_type" in plan, plan
    # the predicate must NOT degrade to a post-scan row filter
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" not in plan


def test_exact_substring_no_window_over_hash(spark):
    """The ExactSubstr cross-doc test must be a map-side-combinable
    groupBy over the window hash + join back, NOT a Window analytic
    partitioned by the hash: Window exchanges have no partial
    aggregation and AQE's skew mitigation does not split them, so a
    corpus-common 8-token sequence would funnel every occurrence into
    one task at scale. The only Window allowed in the coverage plan is
    the per-document gaps-and-islands sort (bounded by doc length)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        exact_substring_coverage,
        exact_substring_removal,
    )

    df = spark.createDataFrame(
        [("a", "one two three four five six seven eight nine"),
         ("b", "one two three four five six seven eight ten")],
        ["doc_id", "text"],
    )
    for fn in (exact_substring_coverage, exact_substring_removal):
        out = fn(df, id_col="doc_id", text_col="text", k=8)
        plan = plan_of(out)
        # the hash-keyed min/max must partial-aggregate (>= 2
        # HashAggregate around the exchange; q1-style assertion)
        assert plan.count("HashAggregate") >= 2, plan
        # no Window operator keyed on the window hash
        for line in plan.splitlines():
            if "Window " in line or line.strip().startswith("Window"):
                assert "_wh" not in line, plan
    # coverage keeps exactly one Window: the per-doc islands pass
    cov_plan = plan_of(
        exact_substring_coverage(df, id_col="doc_id", text_col="text", k=8)
    )
    win_lines = [ln for ln in cov_plan.splitlines() if "Window [" in ln]
    assert len(win_lines) == 1 and "_id" in win_lines[0], cov_plan


def test_dup_ngram_no_window_over_shingle(spark):
    """dup_ngram_fraction's per-shingle document frequency must be a
    map-side-combinable groupBy + equi-join back, never a COUNT
    window partitioned by the shingle key: a corpus-common shingle
    (license boilerplate) would otherwise funnel every occurrence
    into one task with no partial aggregation, and AQE cannot split
    a window exchange (the same r8 finding ExactSubstr fixed)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        dup_ngram_fraction,
        release_cache,
    )

    df = spark.createDataFrame(
        [("a", "one two three four five"), ("b", "one two three six seven")],
        ["doc_id", "text"],
    )
    out = dup_ngram_fraction(df, id_col="doc_id", text_col="text", n=3)
    plan = plan_of(out)
    assert "Window" not in plan, plan
    # doc-freq groupBy(shingle) and per-doc groupBy(id) both partial-
    # aggregate: >= 2 HashAggregates per groupBy around its exchange
    assert plan.count("HashAggregate") >= 4, plan
    release_cache(out)


def test_common_segments_no_window_over_segment(spark):
    """remove_common_segments' per-segment document frequency must be
    a distinct + map-side-combinable groupBy with an anti-join back —
    never a window (or a count-distinct window) partitioned by the
    segment key: a corpus-common boilerplate line would funnel every
    occurrence into one task AQE cannot split. The only per-doc state
    is the ordered collect_list reassembly, bounded by one document's
    own length."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        remove_common_segments,
    )

    df = spark.createDataFrame(
        [("a", "nav\ncontent one"), ("b", "nav\ncontent two")],
        ["doc_id", "text"],
    )
    out = remove_common_segments(df, id_col="doc_id", text_col="text", min_docs=2)
    plan = plan_of(out)
    assert "Window" not in plan, plan
    # distinct, segment-count, per-doc rebuild, per-doc totals: every
    # groupBy partial-aggregates (>= 2 HashAggregate nodes each)
    assert plan.count("HashAggregate") >= 6, plan
    assert "CartesianProduct" not in plan, plan
