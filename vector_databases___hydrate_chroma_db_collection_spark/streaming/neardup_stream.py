"""Streaming near-duplicate NOVELTY gate: a stream of documents
filtered against a STATIC corpus LSH band index.

Why foreachBatch and not a stream-static join: novelty is "NONE of
this doc's bands hit the corpus" — a per-doc aggregate over the band
probe. Stream-static LEFT SEMI gives only the hit side, stream-static
LEFT ANTI is not a supported streaming join type, and folding the
band probe into a streaming aggregation would put per-doc state in
the state store for data that is fully decided within one batch.
``foreachBatch`` makes each micro-batch a plain batch frame, so the
batch operator (``operators.dedup.novelty_gate``) applies unchanged:
the corpus band table is the static side (built ONCE with
``lsh_band_rows``, reused every batch exactly like a stream-static
join's static plan), the probe is an equi-join on ``(band, h)``, and
the state store holds NOTHING — the same scale-honest topology as
``stream_knn_serve`` (knn_stream.py), whose sink/checkpoint plumbing
this module reuses verbatim.

Parity contract: the micro-batch function IS the batch operator, so
streaming results equal the batch twin row-for-row
(tests/test_streaming.py drives both); the oracle-checked batch twin
in the registry is ``stream_neardup_novelty_gate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
    novelty_gate,
    release_cache,
)
from vector_databases___hydrate_chroma_db_collection_spark.streaming.knn_stream import (
    stream_knn_serve,
)


def stream_novelty_serve(
    doc_stream: DataFrame,
    reference_bands: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    novel_only: bool = False,
    sink_path: str | None = None,
    sink_table: str = "stream_novelty_results",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Gate a STREAM of documents against a prebuilt corpus band
    table; publish ``(id, n_hit_bands, novel)`` rows (optionally only
    the novel ones) to a Parquet sink partitioned by micro-batch.

    Delegates the serve loop to ``stream_knn_serve`` with the novelty
    gate as its ``retrieval_fn`` — that function is already the
    generic "per-batch batch-plan over a static side, exactly-once
    deterministic ``batch_id=N`` overwrite sink" harness; only the
    per-batch plan differs here. See its docstring for the sink/view/
    checkpoint contract (``sink_table`` is a pre-registered temp view
    usable before the first batch and after empty streams).
    """

    def gate(batch_docs: DataFrame) -> DataFrame:
        out = novelty_gate(
            batch_docs,
            reference_bands,
            id_col=id_col,
            text_col=text_col,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
        )
        if novel_only:
            out = out.filter("novel")
        return out

    base_serve = stream_knn_serve(
        doc_stream,
        corpus=None,  # unused: retrieval_fn overrides the knn plan
        retrieval_fn=gate,
        sink_path=sink_path,
        sink_table=sink_table,
        checkpoint_dir=checkpoint_dir,
        trigger_available_now=trigger_available_now,
    )
    return base_serve


__all__ = ["stream_novelty_serve", "novelty_gate", "release_cache"]
