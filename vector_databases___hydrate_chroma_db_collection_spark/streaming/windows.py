"""Streaming windowed aggregation (the reference is batch-only;
SURVEY.md §2.B names this the Spark-idiomatic extension).

Each builder takes either a batch or a streaming DataFrame with an
event-time column — the plans are identical, which is what makes the
batch twin oracle-checkable while the streaming variant gets
watermark semantics for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermark_ready(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks (and watermark-scoped state eviction) require a
    TIMESTAMP event-time column, but parquet schema inference can
    surface event time as TIMESTAMP_NTZ. The cast is a wall-clock
    identity under the session timezone, and both the streaming
    variant and its batch twin bucket the same casted column, so
    oracle parity is unaffected."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def tumbling_event_stats(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "6 hours",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling windows: count + value sum per (window, event_type).
    Windows align to the unix epoch (Spark's F.window contract), so a
    batch oracle can recompute them with floor(epoch/width)."""
    df = events
    if watermark is not None and events.isStreaming:
        df = watermark_ready(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "value_sum",
        )
    )


def sliding_user_activity(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "12 hours",
    slide: str = "6 hours",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows: distinct-ish activity per window (count of
    events per user per overlapping window)."""
    df = events
    if watermark is not None and events.isStreaming:
        df = watermark_ready(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
            "cnt",
        )
    )


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per user: a session extends while consecutive
    events are < gap apart; the window closes gap after the last
    event (F.session_window contract — the batch oracle reproduces it
    with lag + cumulative-sum sessionization)."""
    df = events
    if watermark is not None and events.isStreaming:
        df = watermark_ready(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "events",
            "value_sum",
        )
    )


def dedup_within_watermark(
    events: DataFrame, *, id_col: str = "event_id", ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming id-dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state older than the
    watermark is evicted (dropDuplicatesWithinWatermark). The batch
    equivalent is a plain dropDuplicates on the id."""
    if events.isStreaming:
        return watermark_ready(events, ts_col).withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark([id_col])
    return events.dropDuplicates([id_col])


def stateful_user_totals(events: DataFrame, *, timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a running
    (events_seen, value_sum) per user maintained across micro-batches.

    This is the engine's template for operators Structured Streaming
    lacks natively (the driver's 'custom stateful operators' surface):
    state is a compact tuple per key, updates are Arrow-batched, and
    emission happens once per key per micro-batch (update mode).
    State size is O(distinct users), independent of stream length.
    """
    from pyspark.sql.streaming.state import GroupState

    output_schema = "user_id long, events_seen long, value_sum double"
    state_schema = "events_seen long, value_sum double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        seen, vsum = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            seen += len(pdf)
            vsum += float(pdf["value"].sum())
        state.update((seen, vsum))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "events_seen": [seen],
                "value_sum": [round(vsum, 4)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, output_schema, state_schema, "update", timeout
    )


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same running (events_seen, value_sum) per user through
    Spark 4's ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (SPARK-49070): state is a named,
    schema-ed ``ValueState`` on a ``StatefulProcessor`` object instead
    of one opaque tuple, which is what composite operators (several
    state variables, timers, TTL) need. Kept alongside the classic
    variant so both stateful surfaces stay exercised; the parity test
    drives identical micro-batches through each and diffs the output.

    Environment requirements (checked up front with clear errors):
    - the RocksDB state store provider
      (``spark.sql.streaming.stateStore.providerClass`` =
      ``...state.RocksDBStateStoreProvider``) — transformWithState
      does not support the default HDFS-backed provider and fails at
      state-schema validation without it;
    - the ``protobuf`` package — the state-server protocol between
      the JVM and the Python StatefulProcessor is protobuf-encoded
      (``pyspark/sql/streaming/proto``); absent it, the driver worker
      crashes with an opaque STREAMING_PYTHON_RUNNER_INITIALIZATION
      error, so we pre-check and raise something actionable. The
      classic ``stateful_user_totals`` has no such dependency.
    """
    import pandas as pd

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark's state-server protocol); it is not installed in "
            "this environment. Use stateful_user_totals "
            "(applyInPandasWithState) — same semantics, no protobuf."
        ) from exc

    provider = events.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    if "RocksDBStateStoreProvider" not in (provider or ""):
        raise NotImplementedError(
            "transformWithStateInPandas requires the RocksDB state "
            "store: set spark.sql.streaming.stateStore.providerClass to "
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider (the default HDFS-backed provider "
            "fails state-schema validation mid-run). Use "
            "stateful_user_totals (applyInPandasWithState) otherwise."
        )

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    output_schema = "user_id long, events_seen long, value_sum double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "events_seen long, value_sum double"
            )

        def handleInputRows(self, key, rows, timerValues):
            prior = self._totals.get()
            seen, vsum = (prior[0], prior[1]) if prior is not None else (0, 0.0)
            for pdf in rows:
                seen += len(pdf)
                vsum += float(pdf["value"].sum())
            self._totals.update((seen, vsum))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "events_seen": [seen],
                    "value_sum": [round(vsum, 4)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(), output_schema, "Update", "None"
    )
