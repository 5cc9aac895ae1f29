"""Connected components (operators/graph.py) + as-of join
(operators/relational.py asof_join) unit tests on hand-built frames."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
    connected_components,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
    asof_join,
)


def _components(spark, edges, max_iter=25):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    rows = connected_components(df, max_iter=max_iter).collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_clusters_and_chain(spark):
    # cluster {1,2,3} as a triangle, chain 10-11-12-13 (diameter 3),
    # pair {20,21}
    got = _components(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
    )
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-12: worst case for propagation depth;
    # every node must still collapse to component 0
    edges = [(i, i + 1) for i in range(12)]
    got = _components(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_edge_direction_irrelevant(spark):
    # (high, low) vs (low, high) orientation must not matter
    a = _components(spark, [(5, 9), (9, 7)])
    b = _components(spark, [(9, 5), (7, 9)])
    assert a == b == {5: 5, 7: 5, 9: 5}


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(1), "b"), (2, _ts(5), "c")],
        "k bigint, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 20.0), (1, _ts(4), 40.0), (2, _ts(9), 90.0)],
        "k bigint, rt timestamp, v double",
    )
    rows = {
        (r["k"], r["t"]): (r["rt"], r["v"])
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt"
        ).collect()
    }
    # k=1 @ day5 -> latest right at/before day5 = day4
    assert rows[(1, _ts(5))] == (_ts(4), 40.0)
    # k=1 @ day1 -> nothing earlier -> nulls
    assert rows[(1, _ts(1))] == (None, None)
    # k=2 @ day5 -> right row is in the future -> nulls
    assert rows[(2, _ts(5))] == (None, None)


def test_asof_strict_vs_inclusive_at_equal_time(spark):
    left = spark.createDataFrame([(1, _ts(3))], "k bigint, t timestamp")
    right = spark.createDataFrame(
        [(1, _ts(3), 30.0), (1, _ts(2), 20.0)], "k bigint, rt timestamp, v double"
    )
    inclusive = asof_join(
        left, right, on="k", left_time="t", right_time="rt"
    ).collect()[0]
    strict = asof_join(
        left, right, on="k", left_time="t", right_time="rt", strict=True
    ).collect()[0]
    assert (inclusive["rt"], inclusive["v"]) == (_ts(3), 30.0)
    assert (strict["rt"], strict["v"]) == (_ts(2), 20.0)


def test_asof_null_payload_field_does_not_fall_through(spark):
    # the matched right row has v=NULL; the join must return that NULL,
    # not reach back to the older row's 10.0 (struct-atomic carry)
    left = spark.createDataFrame([(1, _ts(9))], "k bigint, t timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 10.0), (1, _ts(5), None)], "k bigint, rt timestamp, v double"
    )
    row = asof_join(left, right, on="k", left_time="t", right_time="rt").collect()[0]
    assert row["rt"] == _ts(5) and row["v"] is None


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([(1, _ts(1))], "k bigint, t timestamp")
    right = spark.createDataFrame([(1, _ts(1), 1.0)], "k bigint, rt timestamp, v double")
    plan = (
        asof_join(left, right, on="k", left_time="t", right_time="rt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + window: exactly one Exchange (the window's hash partition),
    # no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_pagerank_star_graph(spark):
    """On a star a->hub from every leaf, the hub accumulates rank and
    the total rank mass stays (1-d)·N + d·(non-dangling mass) — here
    just sanity: hub rank strictly above every leaf, ranks positive."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame(
        [(i, 0, 1.0) for i in range(1, 6)], "src int, dst int, w double"
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, src="src", dst="dst", weight="w", iterations=3
        ).collect()
    }
    assert len(ranks) == 6
    hub = ranks.pop(0)
    assert all(hub > v for v in ranks.values())
    assert all(v > 0 for v in ranks.values())


def test_pagerank_uniform_cycle_stays_uniform(spark):
    """A directed cycle is rank-preserving: the uniform vector is the
    exact fixpoint, so every node keeps 1/N after any number of
    iterations — a closed-form correctness check."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
        pagerank,
    )

    n = 8
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src int, dst int"
    )
    ranks = pagerank(edges, src="src", dst="dst", iterations=4).collect()
    assert all(abs(r["rank"] - 1.0 / n) < 1e-9 for r in ranks)
