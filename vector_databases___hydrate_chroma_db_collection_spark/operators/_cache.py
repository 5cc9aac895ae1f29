"""Deterministic cache lifecycle for operators that persist an
intermediate (shingle rows, sketch counters) shared by several
consumers of one result plan.

``persist()`` entries live in the session CacheManager until an
explicit ``unpersist`` — they are NOT freed when the DataFrame is
garbage collected, so a long session that builds many results
accumulates pinned storage. Operators that persist therefore hang the
cached dependencies off the result with :func:`attach_cache`; callers
release them with :func:`release_cache` once the result is
materialized (collected / written). ``spark.catalog.clearCache()``
remains the blunt session-wide alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_spark_graft_cached_deps"


def attach_cache(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Hang persisted dependencies off ``result`` so callers can
    release them after materializing (see :func:`release_cache`)."""
    deps = list(getattr(result, _ATTR, []))
    deps.extend(cached)
    setattr(result, _ATTR, deps)
    return result


def release_cache(result: DataFrame) -> None:
    """Unpersist every cached dependency attached to ``result``. Call
    after the result is materialized; a no-op for results without an
    attached cache."""
    for dep in getattr(result, _ATTR, []):
        dep.unpersist()
    setattr(result, _ATTR, [])
