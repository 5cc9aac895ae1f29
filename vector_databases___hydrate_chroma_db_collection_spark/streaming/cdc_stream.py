"""Streaming CDC ingest: apply insert/update/delete change events to a
collection AND its persisted IVF index, exactly-once, with
replay-stable verdicts.

The r12 tombstone/upsert work gave the persisted index full CRUD
(``ivf_append`` / ``ivf_upsert`` / ``ivf_delete``); this loop is what
consumes it from a stream — the change-data-capture shape every
lakehouse ingest eventually needs: a source emits
``(op, seq, id, text, embedding)`` events, each micro-batch collapses
to the LATEST event per id (``max_by`` on ``seq`` — a source retry
folding several events for one id into a batch must apply only the
final one), outcomes are judged against the PRE-batch collection
state, and the mutations flow through the same composed front doors
the batch API uses:

- ``applied_insert``  -> ``hydrate`` + ``ivf_upsert`` (upsert, not
  append, so re-inserting an id a previous batch DELETED resurrects
  it — ``ivf_append`` would raise ``TombstonedIdError`` until a
  compact; the upsert's surgical rewrite purges the old row itself)
- ``applied_update``  -> ``plans.chroma_api.collection_update_indexed``
  (collection rewrite + surgical cell rewrite + re-stamp)
- ``applied_delete``  -> ``plans.chroma_api.collection_delete_indexed``
  (collection pointer swap + index tombstones + re-stamp)
- ``skipped_existing`` / ``skipped_missing``: Chroma semantics —
  inserts of held ids and updates/deletes of absent ids are recorded,
  not applied.

Replay stability is RECORDING-based, not recompute-based: outcomes
depend on the pre-batch state, which a replayed attempt can no longer
observe (its own first attempt mutated it). So the verdict table is
persisted to a versioned dir under the index path and the tag —
content-qualified, ``sink#batch#digest(id:op:seq set)``, the
``stream_semantic_ingest`` discipline — is committed into a tiny WAL
(``cdc_log.json``, atomic temp+fsync+rename) BEFORE the first
mutation. A replay finds its tag pending (crashed) or done
(completed), republishes the recorded verdicts verbatim, and re-runs
the mutations — every one of which is idempotent (hydrate
``on_duplicate='first'``; upsert replaces a row with itself; deleting
a gone id is a no-op), so the stores converge while the published
verdicts equal the first attempt's exactly. Completed entries are
retained for the last batch only (Structured Streaming replays at
most the last uncommitted batch); pending entries of OTHER tags —
crashed batches awaiting their own replay — survive every commit.

Scale shape: per batch the loop pays the composed front doors' costs
(id-column scans + touched-cell rewrites + tombstone bookkeeping —
never a corpus data rewrite, never a retrain) plus one verdict-table
write bounded by the batch. The index transitions stale -> fresh at
every step without a rebuild, which is the whole point of the r12
CRUD paths.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_LOG = "cdc_log.json"


def _log_read(p: str) -> dict:
    f = os.path.join(p, _LOG)
    if not os.path.exists(f):
        return {"entries": []}
    with open(f) as fh:
        return json.load(fh)


def _log_write(p: str, log: dict) -> None:
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        _atomic_sidecar_write,
    )

    _atomic_sidecar_write(p, _LOG, log)


def stream_cdc_ingest(
    event_stream: DataFrame,
    *,
    index_path: str,
    hydration_cfg,
    sink_path: str | None = None,
    sink_table: str = "stream_cdc_results",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Run the CDC loop as one streaming query. ``event_stream`` must
    carry ``(op, seq, <id>, <text>, <embedding>)`` with the last three
    named by ``hydration_cfg``'s column bindings; published rows are
    ``(id, op, seq, outcome)`` partitioned by ``batch_id`` with the
    exactly-once overwrite sink contract of ``stream_knn_serve``."""
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.knn_stream import (
        stream_knn_serve,
    )

    return stream_knn_serve(
        event_stream,
        corpus=None,  # unused: retrieval_fn overrides the knn plan
        retrieval_fn=cdc_ingest_batch_fn(
            index_path, hydration_cfg, sink_table
        ),
        sink_path=sink_path,
        sink_table=sink_table,
        checkpoint_dir=checkpoint_dir,
        trigger_available_now=trigger_available_now,
    )


def cdc_ingest_batch_fn(index_path: str, hydration_cfg, sink_table: str):
    """The per-micro-batch body of ``stream_cdc_ingest``, exposed at
    module level so tests and the oracle-checked batch twin can drive
    first-attempt vs replay invocations of the SAME
    ``(batch, batch_id)`` directly."""
    from dataclasses import replace

    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        EngineError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        _fresh_versioned_dir,
        _local_sidecar_path,
        ivf_upsert,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_delete_indexed,
        collection_update_indexed,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    cfg = replace(hydration_cfg, on_duplicate="first")
    ic, tc, ec = cfg.id_col, cfg.text_col, cfg.embedding_col

    def ingest(batch_events: DataFrame, batch_id: int) -> DataFrame:
        from vector_databases___hydrate_chroma_db_collection_spark.operators import (
            idguard,
        )

        spark = batch_events.sparkSession
        bad_ops = batch_events.filter(
            ~F.col("op").isin(["insert", "update", "delete"])
        )
        # LATEST event per id wins (source retries fold several events
        # for one id into a batch); max_by on seq, deterministic
        # because (id, seq) identifies one event
        uniq = (
            batch_events.groupBy(F.col(ic).cast("string").alias("id"))
            .agg(
                F.expr("max_by(op, seq)").alias("op"),
                F.max("seq").alias("seq"),
                F.expr(f"max_by({tc}, seq)").alias("_text"),
                F.expr(f"max_by({ec}, seq)").alias("_embedding"),
            )
        )
        probe_only = batch_events.isEmpty()
        if probe_only:
            # schema probe / empty batch: lazy plan only, no stores
            return uniq.select("id", "op", "seq", F.lit("").alias("outcome")).limit(0)
        if bad_ops.limit(1).count() > 0:
            raise EngineError(
                "stream_cdc_ingest: op must be one of "
                "insert/update/delete"
            )
        uniq = uniq.localCheckpoint(eager=True)
        p = _local_sidecar_path(index_path)
        # content-qualified batch identity over (id, op, seq): a
        # restarted stream with same batch ids but different events
        # must judge as a FRESH batch
        tagged = uniq.select(
            F.concat_ws(":", "id", "op", F.col("seq").cast("string")).alias(
                "_k"
            )
        )
        digest, _legacy = idguard.batch_digests(tagged, "_k")
        tag = f"{sink_table}#{batch_id}#{digest}"
        log = _log_read(p)
        entry = next(
            (e for e in log["entries"] if e.get("tag") == tag), None
        )
        if entry is not None:
            # replay (crashed or completed): republish the recorded
            # verdicts verbatim — outcomes were judged against the
            # pre-batch state only the first attempt could observe
            verdicts = spark.read.parquet(os.path.join(p, entry["dir"]))
        else:
            held = read_collection(spark, cfg.root, cfg.collection_name)
            exists = uniq.join(
                held.select(F.col("id").cast("string").alias("id")),
                "id",
                "left_semi",
            ).select("id", F.lit(True).alias("_exists"))
            outcome = (
                F.when(
                    F.col("op") == "insert",
                    F.when(
                        F.col("_exists").isNotNull(),
                        F.lit("skipped_existing"),
                    ).otherwise(F.lit("applied_insert")),
                )
                .when(
                    F.col("op") == "update",
                    F.when(
                        F.col("_exists").isNotNull(), F.lit("applied_update")
                    ).otherwise(F.lit("skipped_missing")),
                )
                .otherwise(
                    F.when(
                        F.col("_exists").isNotNull(), F.lit("applied_delete")
                    ).otherwise(F.lit("skipped_missing"))
                )
            )
            verdicts = (
                uniq.join(exists, "id", "left")
                .select("id", "op", "seq", outcome.alias("outcome"))
                .localCheckpoint(eager=True)
            )
            # record BEFORE the first mutation: a crash after any
            # mutation must replay into the recorded verdicts, never
            # re-judge against the half-mutated state
            d = _fresh_versioned_dir(
                p,
                "cdc_verdicts",
                floor_names=[e.get("dir") for e in log["entries"]],
            )
            verdicts.write.mode("overwrite").parquet(os.path.join(p, d))
            entry = {"tag": tag, "dir": d, "state": "pending"}
            log["entries"].append(entry)
            _log_write(p, log)
        applied = verdicts.filter(F.col("outcome").startswith("applied"))
        # -- mutations: each idempotent, so a replay converges --------
        ins = (
            uniq.join(
                applied.filter("outcome = 'applied_insert'").select("id"),
                "id",
                "left_semi",
            )
            .select(
                F.col("id").alias(ic),
                F.col("_text").alias(tc),
                F.col("_embedding").alias(ec),
            )
            .localCheckpoint(eager=True)
        )
        if ins.limit(1).count() > 0:
            hydrate(spark, ins, cfg)
            # upsert, not append: resurrects ids a previous batch
            # tombstoned (its surgical rewrite purges the old row).
            # EVERY vector sidecar cohabiting at index_path gets the
            # rows — upserting only the IVF one would leave a
            # cohabiting IVF-PQ index stale, and the NEXT batch's
            # composed update/delete (which fences on the etag it
            # observes) would crash-loop on its StaleIndexError.
            from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
                ivf_pq_upsert,
            )

            found = False
            for sc, up_fn in (
                ("ivf_index.json", ivf_upsert),
                ("ivf_pq_index.json", ivf_pq_upsert),
            ):
                if os.path.exists(os.path.join(p, sc)):
                    found = True
                    up_fn(
                        spark, index_path, ins.select(ic, ec),
                        id_col=ic, embedding_col=ec,
                    )
            if not found:
                raise EngineError(
                    f"stream_cdc_ingest: no vector index sidecar at "
                    f"{index_path!r} (expected ivf_index.json or "
                    "ivf_pq_index.json)"
                )
        upd = uniq.join(
            applied.filter("outcome = 'applied_update'").select("id"),
            "id",
            "left_semi",
        ).select(
            "id",
            F.col("_text").alias("document"),
            F.col("_embedding").alias("embedding"),
        )
        if upd.limit(1).count() > 0:
            collection_update_indexed(
                spark,
                cfg.root,
                cfg.collection_name,
                upd,
                index_paths=[index_path],
            )
        dels = [
            r["id"]
            for r in applied.filter("outcome = 'applied_delete'")
            .select("id")
            .collect()
        ]
        if dels:
            collection_delete_indexed(
                spark,
                cfg.root,
                cfg.collection_name,
                ids=dels,
                index_paths=[index_path],
            )
        # -- commit: this tag done; retain other tags' pending entries
        # (crashed batches awaiting replay) and drop completed entries
        # older than this batch; GC their verdict dirs
        log = _log_read(p)
        keep = []
        for e in log["entries"]:
            if e.get("tag") == tag:
                keep.append({"tag": tag, "dir": e["dir"], "state": "done"})
            elif e.get("state") == "pending":
                keep.append(e)
        dropped = [
            e["dir"]
            for e in log["entries"]
            if not any(k["dir"] == e["dir"] for k in keep)
        ]
        log["entries"] = keep
        _log_write(p, log)
        import shutil

        for d_ in dropped:
            shutil.rmtree(os.path.join(p, d_), ignore_errors=True)
        # orphan recordings (a crash between the verdict write and the
        # WAL commit leaves an unreferenced dir; its replay wrote a
        # fresh one) are unreachable by construction — GC them too
        referenced = {e["dir"] for e in log["entries"]}
        for d_ in os.listdir(p):
            if d_.startswith("cdc_verdicts_v") and d_ not in referenced:
                shutil.rmtree(os.path.join(p, d_), ignore_errors=True)
        return verdicts

    return ingest


__all__ = ["stream_cdc_ingest", "cdc_ingest_batch_fn"]
