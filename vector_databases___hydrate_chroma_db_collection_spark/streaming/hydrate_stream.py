"""Incremental (streaming) collection hydration.

The reference re-runs its whole batch step to add documents
(sas:126-193, one-shot). The Spark-native equivalent hydrates
continuously: a file/kafka stream of canonical-shape rows is
deduplicated within a watermark horizon and appended to the
collection dataset via ``foreachBatch`` — each micro-batch reuses the
batch writer, so all invariants (dimension guard, id policy) hold
per batch, and the Parquet appends stay atomic per micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
    CANONICAL_COLUMNS,
    HydrationConfig,
)
from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
    current_data_dir,
    get_or_create_collection,
)


def stream_hydrate(
    stream: DataFrame,
    cfg: HydrationConfig,
    *,
    dim: int,
    ts_col: str | None = None,
    watermark: str = "10 minutes",
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    mode: str = "append",
) -> StreamingQuery:
    """Continuously hydrate a canonical-shape stream into a collection.

    - id dedup (``mode="append"`` only): within the watermark horizon
      via ``dropDuplicatesWithinWatermark`` (bounded state — the
      unbounded exact variant would OOM a year-long stream), falling
      back to plain stateful dedup when no ts column exists. Upsert
      mode NEVER dedups at the stream level: a re-sent id must reach
      the writer to replace its stored row.
    - dimension guard: same strict policy as batch hydrate.
    - ``mode="append"`` (default): each micro-batch is a partitioned
      Parquet append — the ingest path for immutable event streams.
    - ``mode="upsert"``: each micro-batch routes through the batch
      ``hydrate(on_duplicate='upsert')`` writer, so a re-sent id
      REPLACES its stored row (CDC-style streams); the rewrite
      inherits batch upsert's crash-atomicity (versioned dir +
      pointer swap, bucket-pruned on bucketed layouts). When one
      micro-batch carries several updates for the same id, the row
      with the LATEST ``ts_col`` wins (deterministic; equal
      timestamps fall back to an arbitrary pick); without ``ts_col``
      the pick is arbitrary — pass ``ts_col`` for CDC streams.
      ACROSS micro-batches the last PROCESSED batch wins (standard
      CDC contract: the source must deliver per-key updates in
      order); the collection stores no event time, so out-of-order
      cross-batch delivery is not detected.

    Changing ``mode`` or ``ts_col`` across restarts changes the
    stream's stateful-operator layout (append uses watermark dedup,
    upsert uses none): restart such a change from a FRESH
    ``checkpoint_dir`` — Spark rejects a checkpoint whose recorded
    state operators no longer match the plan.
    """
    if mode not in ("append", "upsert"):
        raise ValueError(f"mode must be 'append' or 'upsert', got {mode!r}")
    manifest = get_or_create_collection(
        cfg.root, cfg.collection_name, dim, cfg.metric, n_buckets=cfg.n_buckets
    )
    checkpoint = checkpoint_dir or os.path.join(cfg.root, manifest.name, "_checkpoint")

    data = stream.select(
        F.col(cfg.id_col).cast("string").alias("id"),
        F.col(cfg.text_col).cast("string").alias("document"),
        F.col(cfg.embedding_col).cast("array<float>").alias("embedding"),
        *([F.col(ts_col).alias("_ts")] if ts_col else []),
    )
    ok = (F.size("embedding") == F.lit(dim)) & ~F.exists(
        "embedding", lambda x: x.isNull()
    )
    data = data.filter(ok)
    if ts_col and mode == "append":
        from vector_databases___hydrate_chroma_db_collection_spark.streaming.windows import (
            watermark_ready,
        )

        data = watermark_ready(data, "_ts").withWatermark(
            "_ts", watermark
        ).dropDuplicatesWithinWatermark(["id"]).drop("_ts")
    elif mode == "append":
        # Stateful stream-level dedup: an id seen ONCE is suppressed
        # forever after (unbounded state — callers with long streams
        # should pass ts_col for the bounded watermark variant).
        data = data.dropDuplicates(["id"])
    # mode == "upsert": NO stream-level dedup, with or without
    # ts_col — a re-sent id must reach the writer to replace its
    # stored row (stateful dropDuplicates[WithinWatermark] would
    # swallow the update and freeze the stale row forever). In-batch
    # duplicates are collapsed inside write_batch, latest-ts wins.

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        picked = batch_df
        if mode == "upsert":
            if "_ts" in picked.columns:
                from pyspark.sql import Window

                w = Window.partitionBy("id").orderBy(F.col("_ts").desc())
                picked = (
                    picked.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", "_ts")
                )
            else:
                picked = picked.dropDuplicates(["id"])
        canonical = picked.withColumn(
            "metadata", F.create_map().cast("map<string,string>")
        ).select(*CANONICAL_COLUMNS)
        if mode == "upsert":
            if canonical.isEmpty():
                return
            from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
                hydrate,
            )

            hydrate(
                canonical.sparkSession,
                canonical,
                HydrationConfig(
                    collection_name=cfg.collection_name,
                    root=cfg.root,
                    metric=cfg.metric,
                    on_duplicate="upsert",
                    dim=dim,
                    n_buckets=manifest.n_buckets,
                ),
            )
            return
        # Resolve the active data dir per micro-batch so a concurrent
        # compaction/upsert swap redirects subsequent appends.
        out_path = current_data_dir(cfg.root, manifest.name)
        # Exactly-once append under foreachBatch's at-least-once
        # contract: a plain .mode("append") would re-append the whole
        # batch when a crash lands between the write and the
        # checkpoint commit. Instead the batch is written to a private
        # staging dir and PUBLISHED under deterministic names keyed by
        # (checkpoint token, batch id); a replay first sweeps the
        # previous attempt's files for this batch, then republishes —
        # converging to exactly one copy no matter how many attempts.
        import hashlib
        import shutil

        tok = hashlib.md5(os.path.abspath(checkpoint).encode()).hexdigest()[:8]
        prefix = f"stream-{tok}-{batch_id}-"
        coll_dir = os.path.dirname(out_path)
        staging = os.path.join(coll_dir, f"_stream_staging-{tok}-{batch_id}")
        if manifest.n_buckets:
            canonical.withColumn(
                "id_bucket", F.pmod(F.xxhash64("id"), F.lit(manifest.n_buckets))
            ).write.mode("overwrite").partitionBy("id_bucket").parquet(staging)
        else:
            canonical.write.mode("overwrite").parquet(staging)
        # sweep a crashed prior attempt's published files
        for dirpath, _, files in os.walk(out_path):
            for fname in files:
                if fname.startswith(prefix):
                    os.remove(os.path.join(dirpath, fname))
        # publish with deterministic names, preserving bucket subdirs
        i = 0
        for dirpath, _, files in os.walk(staging):
            rel = os.path.relpath(dirpath, staging)
            for fname in sorted(files):
                if not fname.endswith(".parquet"):
                    continue
                dest_dir = (
                    out_path if rel == "." else os.path.join(out_path, rel)
                )
                os.makedirs(dest_dir, exist_ok=True)
                os.replace(
                    os.path.join(dirpath, fname),
                    os.path.join(dest_dir, f"{prefix}{i:05d}.parquet"),
                )
                i += 1
        shutil.rmtree(staging, ignore_errors=True)

    writer = data.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
