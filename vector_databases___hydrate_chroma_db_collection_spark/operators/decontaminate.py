"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared n-grams.

The standard LLM-training hygiene step (GPT-3 appendix C / Llama-style
"13-gram decontamination"): any training document sharing enough
n-grams with a held-out benchmark is contaminated and must be dropped
or quarantined before training. The reference repo hydrates document
corpora into a vector collection (sas:126-193); a production corpus
feeding BOTH a collection and a training run needs this gate in the
same pipeline.

Scale shape (the part that must survive 100 TB):

- The BENCHMARK side is always request-sized (an eval suite is
  10^4-10^6 n-grams, never corpus-sized), so its distinct n-gram
  hashes broadcast; the corpus streams through the scan stage once.
- Documents explode to (doc, distinct n-gram hash) rows INSIDE the
  scan stage (same ``_shingle_rows`` cache-free shape dedup uses),
  join the broadcast set, and collapse by one map-side-combinable
  aggregation keyed by doc id — the only shuffle carries one row per
  document, not per n-gram.
- Joining on the 60-bit md5-derived hash (functions/hashes.hash64)
  instead of the n-gram string keeps the broadcast and the join keys
  at 8 bytes/row; collision probability for |bench| x |doc| distinct
  n-grams is ~ n^2 / 2^61 — negligible below ~10^9 distinct n-grams,
  and a false hit only ever OVER-counts contamination (the
  conservative direction for a safety gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def benchmark_ngram_hashes(
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    n: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Distinct n-gram hashes of the benchmark set: one ``h`` column,
    one row per distinct n-gram. Small by construction (eval suites);
    the caller broadcasts it. ``portable=True`` uses the md5-derived
    ``hash64`` family so a DuckDB oracle reproduces the values;
    production flips to xxhash64."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        fast_hash64,
        hash64,
        word_shingles,
    )

    h = hash64 if portable else fast_hash64
    return (
        benchmark.select(
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), n))
            ).alias("_ng")
        )
        .select(h(F.col("_ng")).alias("h"))
        .distinct()
    )


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
    decimals: int = 4,
    portable: bool = True,
    max_bench_broadcast_rows: int = 8_000_000,
) -> DataFrame:
    """Per-document benchmark overlap:
    ``(id_col, n_ngrams, n_overlap, overlap_frac, contaminated)``.

    ``overlap_frac`` = distinct doc n-grams also present in the
    benchmark / distinct doc n-grams (documents with zero n-grams —
    empty/whitespace text — score 0.0 and are never contaminated).
    ``contaminated`` = overlap_frac >= threshold.

    Plan: benchmark n-gram hashes broadcast; docs explode to distinct
    n-gram hashes in the scan stage, the broadcast semi-probe marks
    hits, and ONE hash aggregation per doc id (map-side combinable)
    produces the counts. Nothing quadratic, nothing corpus-sized on
    the build side. See module docstring for the 100 TB shape.

    The "benchmark sets are request-sized" assumption is GUARDED, not
    assumed (same discipline as the dedup GEMM's byte budget): the
    distinct-hash count is probed with a bounded ``limit(cap+1)``
    count, and a pathological "benchmark" above
    ``max_bench_broadcast_rows`` (default 8M hashes ≈ 64 MB of 8-byte
    keys before overhead) falls back to a shuffled hash-keyed join —
    same answer, no executor-OOM from an unbounded broadcast build.
    The probed hash set is lazily localCheckpointed so the probe and
    the join share one computation of the distinct."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        fast_hash64,
        hash64,
        word_shingles,
    )

    h = hash64 if portable else fast_hash64
    bench_hashes = benchmark_ngram_hashes(
        benchmark, text_col=bench_text_col, n=n, portable=portable
    ).localCheckpoint(eager=False)
    n_bench = bench_hashes.limit(max_bench_broadcast_rows + 1).count()
    bench = (
        F.broadcast(bench_hashes)
        if n_bench <= max_bench_broadcast_rows
        else bench_hashes.hint("shuffle_hash")
    )
    flat = docs.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(
            F.array_distinct(word_shingles(F.col(text_col), n))
        ).alias("_ng"),
    ).select("_id", h(F.col("_ng")).alias("h"))
    # explode_outer keeps zero-ngram docs as a NULL row so every input
    # document appears in the output without a second pass over docs;
    # hash64(NULL) is NULL and never matches a bench hash.
    marked = flat.join(
        bench.withColumn("_hit", F.lit(1)), "h", "left"
    )
    frac: Column = F.round(
        F.col("n_overlap")
        / F.greatest(F.col("n_ngrams"), F.lit(1)).cast("double"),
        decimals,
    )
    return (
        marked.groupBy(F.col("_id").alias(id_col))
        .agg(
            # h is NULL exactly when the explode_outer emitted the
            # zero-ngram placeholder row, so count(h) = n distinct
            # n-grams; count(_hit) counts benchmark matches.
            F.count(F.col("h")).alias("n_ngrams"),
            F.count(F.col("_hit")).alias("n_overlap"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_overlap",
            frac.alias("overlap_frac"),
            (frac >= F.lit(threshold)).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
    portable: bool = True,
    max_bench_broadcast_rows: int = 8_000_000,
) -> DataFrame:
    """The filter form: ``docs`` minus contaminated rows (all original
    columns preserved). One broadcast probe + one per-doc agg + one
    id-keyed join back — the join's right side carries only doc ids
    that SURVIVE, so at high contamination it shrinks, never grows."""
    keep = (
        ngram_overlap(
            docs,
            benchmark,
            id_col=id_col,
            text_col=text_col,
            bench_text_col=bench_text_col,
            n=n,
            threshold=threshold,
            portable=portable,
            max_bench_broadcast_rows=max_bench_broadcast_rows,
        )
        .filter(~F.col("contaminated"))
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")
