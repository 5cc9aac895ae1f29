"""Sequence packing: assign documents to fixed-token-budget training
bins (context windows).

Training pipelines concatenate documents into fixed-length sequences
(e.g. 2048/4096/8192 tokens); the packing step decides which documents
share a window. This implements GREEDY SEQUENTIAL packing — documents
are taken in a deterministic order and a bin closes when the next
document no longer fits — the streaming-friendly discipline production
packers use (exact bin packing is NP-hard and order-destroying;
greedy-in-order keeps locality and is reproducible).

Scale shape: packing is sequential WITHIN a bin stream but training
needs millions of bins, so the corpus is sharded first (any key —
source, language, hash bucket) and each shard packs independently:

- one hash shuffle keyed by shard (the only shuffle; output
  cardinality == input cardinality),
- per-shard packing is a single ordered O(rows) pass inside ONE
  ``applyInPandas`` group — Arrow-batched, no row-at-a-time Python,
- shards are independent, so 1000 executors pack 1000+ shards
  concurrently; choose shard granularity so a shard's (id, n_tokens)
  pairs fit an executor core (16 bytes/row -> tens of millions of
  rows per shard are fine).

Semantics, frozen so a SQL oracle can replay them:

- documents pack in ascending ``id_col`` order within a shard;
- a bin closes when ``fill + next > budget`` and the bin is
  non-empty;
- a document LARGER than the budget gets a bin of its own (fill >
  budget — the caller truncates or splits downstream; silently
  dropping data inside a packer is the wrong layer).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_greedy(
    df: DataFrame,
    *,
    id_col: str,
    size_col: str,
    shard_col: str,
    budget: int,
) -> DataFrame:
    """Greedy sequential packing per shard. Returns one row per input
    document: ``(shard_col, id_col, n_tokens, bin_id, bin_fill)``
    where ``bin_id`` is 0-based per shard and ``bin_fill`` is the
    bin's running token count AFTER placing the document (the last
    document of a bin therefore carries the bin's final size).

    ``size_col`` is the document's token count — precomputed by the
    caller (``functions.text.token_count`` or a real tokenizer's
    output column) so the packer never re-tokenizes.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [
            fields[shard_col],
            fields[id_col],
            StructField("n_tokens", LongType()),
            StructField("bin_id", LongType()),
            StructField("bin_fill", LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bin_ids: list[int] = []
        fills: list[int] = []
        b, fill = 0, 0
        for t in pdf[size_col]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                b += 1
                fill = 0
            fill += t
            bin_ids.append(b)
            fills.append(fill)
        return pd.DataFrame(
            {
                shard_col: pdf[shard_col],
                id_col: pdf[id_col],
                "n_tokens": pdf[size_col].astype("int64"),
                "bin_id": pd.Series(bin_ids, dtype="int64"),
                "bin_fill": pd.Series(fills, dtype="int64"),
            }
        )

    return (
        df.select(shard_col, id_col, F.col(size_col).cast("long").alias(size_col))
        .groupBy(shard_col)
        .applyInPandas(pack, schema=out_schema)
    )


def pack_bins_summary(packed: DataFrame, *, shard_col: str) -> DataFrame:
    """Roll packed rows up to one row per bin:
    ``(shard_col, bin_id, n_docs, bin_tokens, utilization)`` —
    ``utilization`` left to the caller's budget: this emits raw
    ``bin_tokens`` so the summary stays budget-agnostic. One
    map-side-combinable aggregation."""
    return packed.groupBy(shard_col, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.max("bin_fill").alias("bin_tokens"),
    )
