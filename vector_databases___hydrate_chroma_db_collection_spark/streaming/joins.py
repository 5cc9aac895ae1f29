"""Stream-stream joins.

The hardest Structured Streaming operator: both sides are unbounded,
so Spark buffers each side's rows in state until the watermark proves
no more matches can arrive. The time-range condition is what makes
state eviction possible — an unconstrained stream-stream join would
hold both streams forever.

The same builder works on batch DataFrames (identical plan semantics)
which is what the oracle-checkable batch twin and the streaming test
both rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attributed_events(
    triggers: DataFrame,
    conversions: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Attribution join: each conversion matched to trigger events of
    the same user that happened in the ``within`` window before it.

    Streaming: both sides get watermarks and the join's time-range
    bound lets Spark evict trigger state older than
    (watermark + within). Batch: the identical equi+range join.

    Output: (user_id, trigger_id, conversion_id, gap_seconds).
    """
    t = triggers.select(
        F.col(key_col).alias("t_user"),
        F.col("event_id").alias("trigger_id"),
        F.col(ts_col).alias("t_ts"),
    )
    c = conversions.select(
        F.col(key_col).alias("c_user"),
        F.col("event_id").alias("conversion_id"),
        F.col(ts_col).alias("c_ts"),
    )
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.windows import (
        watermark_ready,
    )

    if triggers.isStreaming:
        t = watermark_ready(t, "t_ts").withWatermark("t_ts", watermark)
    if conversions.isStreaming:
        c = watermark_ready(c, "c_ts").withWatermark("c_ts", watermark)

    cond = (
        (F.col("t_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("t_ts"))
        & (F.col("c_ts") <= F.col("t_ts") + F.expr(f"INTERVAL {within}"))
    )
    # events.ts arrives as TIMESTAMP or TIMESTAMP_NTZ depending on the
    # session's parquet inference; unix_micros only takes TIMESTAMP, so
    # cast first (wall-clock identity under the engine's UTC session tz,
    # and an epoch *difference* is tz-invariant regardless).
    def _us(name: str):
        return F.unix_micros(F.col(name).cast("timestamp"))

    return t.join(c, cond).select(
        F.col("t_user").alias("user_id"),
        "trigger_id",
        "conversion_id",
        (_us("c_ts") / 1_000_000 - _us("t_ts") / 1_000_000).alias("gap_seconds"),
    )


def enrich_with_static(
    events: DataFrame,
    dim: DataFrame,
    *,
    key_expr,
    dim_key: str,
    event_types: tuple[str, ...] = ("click", "view", "purchase"),
) -> DataFrame:
    """Stream-static join + aggregation: each (possibly streaming)
    event row enriched against a broadcast STATIC dimension, then
    aggregated. Unlike a stream-stream join there is NO state store —
    the static side is simply re-planned (and re-broadcast) every
    micro-batch, which is why this is the cheapest enrichment
    topology and the recommended shape for slowly-changing dims at
    100 TB/day ingest (swap the dim dataset between batches to pick
    up changes).

    Works identically on a batch frame — the oracle-checkable twin is
    registry query ``stream_static_join_nation``; streaming parity is
    asserted in tests/test_streaming.py.
    """
    filtered = events.filter(F.col("event_type").isin(*event_types))
    joined = filtered.join(F.broadcast(dim), dim[dim_key] == key_expr(filtered))
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
