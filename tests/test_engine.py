"""Engine lifecycle + approx-distinct accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.engine import (
    engine_session,
    validate_session,
)

from .conftest import SF_CORRECT


def test_validate_session_returns_app_id(spark):
    app_id = validate_session(spark)
    assert app_id.startswith("local-")


def test_engine_session_drops_created_views(spark):
    with engine_session(spark) as s:
        s.range(5).createOrReplaceTempView("scoped_view_xyz")
        assert s.catalog.tableExists("scoped_view_xyz")
    assert not spark.catalog.tableExists("scoped_view_xyz")


def test_engine_session_preserves_preexisting_views(spark):
    spark.range(3).createOrReplaceTempView("longlived_view")
    with engine_session(spark):
        pass
    assert spark.catalog.tableExists("longlived_view")
    spark.catalog.dropTempView("longlived_view")


def test_approx_count_distinct_within_rsd(spark):
    from vector_databases___hydrate_chroma_db_collection_spark import queries as R

    rows = R.QUERIES["agg_approx_count_distinct"](spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        # the query folds the HLL++ estimate into a boolean accuracy
        # contract (|approx - exact| <= 3*rsd*exact) that the oracle
        # asserts TRUE; verify it holds and exact counts are sane
        assert r["sketch_within_tol"] is True, r
        assert r["exact_parts"] > 0, r
