"""Engine lifecycle: session validation + scoped teardown.

The reference guards every run with a CAS-session liveness check
(sas:283-311) and tears down all global state afterwards
(sas:544-587). The Spark equivalents are a liveness assert on the
SparkSession and a context manager that owns temp views, cached
DataFrames, and (optionally) the session itself.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

from vector_databases___hydrate_chroma_db_collection_spark.errors import EngineError


def validate_session(spark: SparkSession) -> str:
    """Assert the session is alive and return its id (the reference
    captures the CAS session UUID the same way, sas:283-311)."""
    try:
        sc = spark.sparkContext
        if sc._jsc is None:  # stopped
            raise EngineError("SparkSession has been stopped")
        return sc.applicationId
    except EngineError:
        raise
    except Exception as e:  # pragma: no cover - defensive
        raise EngineError(f"SparkSession is not usable: {e}") from e


@contextmanager
def engine_session(
    spark: SparkSession | None = None, *, stop_on_exit: bool = False, **session_kwargs
):
    """Scoped engine run: validates liveness on entry; on exit drops
    the temp views the run created (the reference's global-macro
    cleanup, sas:544-587), optionally stopping the session. The
    session-wide cache is cleared only when the context CREATED the
    session — Spark has no per-scope cache registry, and wiping a
    borrowed session's cache would silently evict the caller's
    pre-existing cached plans (a full upstream recompute at scale)."""
    from vector_databases___hydrate_chroma_db_collection_spark.session import get_spark

    own = spark is None
    spark = spark or get_spark(**session_kwargs)
    validate_session(spark)
    views_before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    try:
        yield spark
    finally:
        views_after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
        for view in views_after - views_before:
            spark.catalog.dropTempView(view)
        if own:
            # only safe on a session this context created: clearCache
            # is session-GLOBAL and would wipe a borrowing caller's
            # caches along with ours
            spark.catalog.clearCache()
        if stop_on_exit and own:
            spark.stop()
