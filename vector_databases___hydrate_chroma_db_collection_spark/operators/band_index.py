"""Persisted MinHash LSH band index: the corpus half of the
near-duplicate novelty gate, materialized once and reused across
batch gates and streaming micro-batches.

``operators.dedup.lsh_band_rows`` computes a corpus band table; this
module gives it the same durable-index lifecycle as the IVF sidecar
(``operators/ann.py::ivf_write/ivf_read/ivf_refresh``): the index is
just a Parquet dataset plus a JSON sidecar that records the BUILD
parameters (shingle ``n``, ``num_hashes``, ``bands``, the id/text
column names) and an optional source-collection etag stamp.
``band_index_read`` raises ``StaleIndexError`` once the collection
changes under the index; ``band_index_refresh`` is the one-call
remedy — replay the recorded build against the CURRENT collection,
overwrite, re-stamp.

Scale notes: the band table is ``bands`` rows per corpus document
(8-byte keys; ~100 GB per billion docs at the defaults) — it scans,
joins, appends and replicates like any other table. Incremental
ingest appends only the new documents' rows (signatures are per-doc,
so no global recompute); probing it (``novelty_gate``) is one
equi-join on ``(band, h)``. At cluster scale write it bucketed by
``h`` so repeated serving skips the corpus-side shuffle.

Reference provenance: the reference (sas:126-193) hydrates a Chroma
collection for retrieval; a production hydration pipeline gates
re-ingested documents against what the collection already holds —
this index is that gate's corpus state.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
    _check_source_stamp,
    _local_sidecar_path,
    _source_stamp,
)

_SIDECAR = "band_index.json"


def band_index_build(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    include_shingles: bool = False,
    source: tuple[str, str] | None = None,
) -> None:
    """One-call build: shingle the corpus ONCE, derive band rows (and
    optionally the shingle postings + sizes for verified serving)
    from that single cached pass, persist everything, release the
    cache. Equivalent to ``lsh_band_rows`` + ``band_index_write`` but
    without a second shingle pass when ``include_shingles=True``."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        _band_rows_from_shingles,
        _shingle_rows,
    )

    sh = _shingle_rows(df, id_col, text_col, n)
    band_rows = _band_rows_from_shingles(sh, id_col, num_hashes, bands)
    band_index_write(
        band_rows,
        path,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        id_col=id_col,
        text_col=text_col,
        source=source,
        shingles=sh if include_shingles else None,
    )
    sh.unpersist()


def band_index_write(
    band_rows: DataFrame,
    path: str,
    *,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    source: tuple[str, str] | None = None,
    shingles: DataFrame | None = None,
) -> None:
    """Persist a corpus band table (the output of ``lsh_band_rows``
    over the corpus) plus its sidecar.

    The ``n/num_hashes/bands/id_col/text_col`` kwargs are the BUILD
    record — ``band_index_refresh`` replays them verbatim, and
    ``novelty_gate`` callers read them back so the probe side is
    hashed with the identical family (mismatched ``n`` would silently
    gate everything as novel). ``source=(root, name)`` stamps the
    sidecar with the collection's current etag.

    ``shingles`` (optional): the corpus shingle-hash rows
    ``(id, h)`` — pass ``lsh_band_rows``'s attached shingle cache (it
    is already materialized by the band write) to ALSO persist the
    exact-verification side: posting rows under ``shingles/`` and
    per-doc set sizes under ``sizes/``. With them on disk,
    ``neardup_gate_verified`` serves LSH candidates AND exact-Jaccard
    verdicts without ever touching corpus text again."""
    p = _local_sidecar_path(path)
    stamp = _source_stamp(source)
    band_rows.write.mode("overwrite").parquet(os.path.join(p, "bands"))
    if shingles is not None:
        from pyspark.sql import functions as F

        sh = shingles.select(F.col("_id").alias(id_col), "h")
        sh.write.mode("overwrite").parquet(os.path.join(p, "shingles"))
        (
            shingles.groupBy(F.col("_id").alias(id_col))
            .agg(F.count(F.lit(1)).alias("n_sh"))
            .write.mode("overwrite")
            .parquet(os.path.join(p, "sizes"))
        )
    with open(os.path.join(p, _SIDECAR), "w") as f:
        json.dump(
            {
                "kind": "minhash_band_index",
                "n": n,
                "num_hashes": num_hashes,
                "bands": bands,
                "id_col": id_col,
                "text_col": text_col,
                "source": stamp,
                "has_shingles": shingles is not None,
            },
            f,
        )


def band_index_read(
    spark: SparkSession, path: str, *, verify_source: bool = True
) -> tuple[DataFrame, dict]:
    """Load a persisted band index -> (band_rows, meta).

    Same staleness contract as ``ivf_read``: a stamped sidecar whose
    source collection has since changed raises ``StaleIndexError`` —
    a gate can never silently treat deleted/replaced corpus text as
    still ingested. Unstamped indexes load as-is."""
    p = _local_sidecar_path(path)
    with open(os.path.join(p, _SIDECAR)) as f:
        meta = json.load(f)
    _check_source_stamp(meta, path, verify_source)
    return spark.read.parquet(os.path.join(p, "bands")), meta


def band_index_read_verified(
    spark: SparkSession, path: str, *, verify_source: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """Load the full verification-capable index ->
    (band_rows, shingle_rows, size_rows, meta). Raises ValueError if
    the index was written without ``shingles`` (band-only indexes can
    gate novelty but cannot verify Jaccard)."""
    bands, meta = band_index_read(spark, path, verify_source=verify_source)
    if not meta.get("has_shingles"):
        raise ValueError(
            f"band index at {path!r} was written without shingles; "
            "re-write it with band_index_write(..., shingles=...) to "
            "serve verified gates"
        )
    p = _local_sidecar_path(path)
    return (
        bands,
        spark.read.parquet(os.path.join(p, "shingles")),
        spark.read.parquet(os.path.join(p, "sizes")),
        meta,
    )


def band_index_refresh(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """The remedy ``StaleIndexError`` prescribes, as one call: re-read
    the source collection the sidecar names, recompute the band table
    with the sidecar's RECORDED build parameters, overwrite the
    persisted rows, re-stamp with the collection's CURRENT etag, and
    return the freshly-loaded index. Only works on stamped indexes
    (an index built from an arbitrary DataFrame has no recorded
    source — ValueError says so)."""
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    p = _local_sidecar_path(path)
    with open(os.path.join(p, _SIDECAR)) as f:
        meta = json.load(f)
    src = meta.get("source")
    if src is None:
        raise ValueError(
            f"band index at {path!r} carries no source-collection stamp; "
            "rebuild it from the original DataFrame with lsh_band_rows + "
            "band_index_write"
        )
    coll = read_collection(spark, src["root"], src["name"])
    band_index_build(
        coll,
        path,
        id_col=meta["id_col"],
        text_col=meta["text_col"],
        n=meta["n"],
        num_hashes=meta["num_hashes"],
        bands=meta["bands"],
        include_shingles=bool(meta.get("has_shingles")),
        source=(src["root"], src["name"]),
    )
    return band_index_read(spark, path)
