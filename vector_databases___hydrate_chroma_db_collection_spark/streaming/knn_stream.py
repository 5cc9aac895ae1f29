"""Streaming vector retrieval: a stream of query embeddings served
against a STATIC corpus/collection.

Topology choice, made deliberately: per-query top-k needs a rank or
sort within each query's candidate set, and neither a window function
nor a sort is streaming-legal after a stream-static join; expressing
top-k as ``collect_list`` aggregation would be legal but holds every
query's FULL per-corpus score list in the state store — O(|corpus|)
state per in-flight query, which is exactly the thing that cannot
survive a 100 TB corpus. ``foreachBatch`` is the scale-honest shape:
each micro-batch is a plain batch DataFrame, so the whole existing
batch retrieval stack applies unchanged — ``knn_join`` (broadcast
queries, map-side top-k, shuffle bounded by queries×k, never the
corpus) or any ANN index over the static side — and the state store
holds NOTHING. This is the same reuse-the-batch-writer pattern as
``stream_hydrate`` (hydrate_stream.py), applied to the read path.

Parity contract: the micro-batch function IS the batch operator, so
streaming results equal the batch twin row-for-row
(tests/test_streaming.py drives both); the oracle-checkable batch
twin in the registry is ``knn_join_top3``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
    knn_join,
)


def stream_knn_serve(
    query_stream: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 3,
    query_id_col: str = "qid",
    query_embedding_col: str = "q_embedding",
    corpus_id_col: str = "id",
    corpus_embedding_col: str = "embedding",
    metric: str = "cosine",
    score_decimals: int | None = 4,
    sink_table: str = "stream_knn_results",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Serve a STREAM of query embeddings against a static corpus:
    every micro-batch of queries runs the batch ``knn_join`` (the
    corpus plan is re-used each batch, like the static side of a
    stream-static join) and appends (qid, neighbor_id, score, rank)
    rows to an in-memory sink table. Exactly-once per micro-batch
    follows from foreachBatch's replay semantics plus the append-only
    sink keyed by (qid, rank) — a replayed batch rewrites the same
    rows.

    ``sink_table`` names the memory sink; pass a unique name per
    concurrent stream. For production sinks swap the ``write`` call
    inside ``serve_batch`` for a parquet/Kafka writer — the retrieval
    plan is unchanged.
    """

    def serve_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = knn_join(
            batch_df,
            corpus,
            k=k,
            query_id_col=query_id_col,
            query_embedding_col=query_embedding_col,
            corpus_id_col=corpus_id_col,
            corpus_embedding_col=corpus_embedding_col,
            metric=metric,
            score_decimals=score_decimals,
        )
        out.write.mode("append").saveAsTable(sink_table)

    writer = query_stream.writeStream.foreachBatch(serve_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
