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
from pyspark.sql import functions as F

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
    # Pre-distincted bucket keys: novelty serving needs only (band, h)
    # MEMBERSHIP, so the distinct is paid once at build time instead
    # of once per serve call (novelty_gate skips its defensive
    # distinct when handed a two-column key table).
    band_rows.select("band", "h").distinct().write.mode("overwrite").parquet(
        os.path.join(p, "bucket_keys")
    )
    if shingles is not None:
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
                "id_type": dict(band_rows.dtypes)[id_col],
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


def band_index_bucket_keys(
    spark: SparkSession, path: str, *, verify_source: bool = True
) -> DataFrame:
    """The pre-distincted ``(band, h)`` bucket-key table — the only
    corpus state a pure NOVELTY serve needs. Distinct is paid at
    build/append time, so handing this to ``novelty_gate`` skips the
    per-serve corpus-side distinct entirely (the gate trusts
    two-column references to be duplicate-free; this table is kept
    that way by ``band_index_write`` and ``band_index_append``)."""
    p = _local_sidecar_path(path)
    with open(os.path.join(p, _SIDECAR)) as f:
        meta = json.load(f)
    _check_source_stamp(meta, path, verify_source)
    return spark.read.parquet(os.path.join(p, "bucket_keys"))


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


def band_index_append(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    id_col: str | None = None,
    text_col: str | None = None,
) -> int:
    """Incremental ingest: extend a persisted band index with the
    rows for ``new_docs`` ONLY — no corpus recompute. This is the
    append path the index docstrings promise: signatures are per-doc,
    so adding documents to the corpus adds ``bands`` rows per doc
    (plus postings/sizes when the index is verification-capable) and
    touches nothing already on disk.

    ``new_docs`` uses the sidecar's recorded id/text columns by
    default; pass ``id_col``/``text_col`` when the new batch carries
    different column names (values are still hashed with the RECORDED
    n/num_hashes/bands so appended rows join the existing family).

    The sidecar is re-stamped with the source collection's CURRENT
    etag — call this AFTER appending the same docs to the collection,
    and the index transitions stale -> fresh without the full
    ``band_index_refresh`` rebuild. (Appends only: updates or deletes
    change existing docs' rows and need the full refresh; this
    function cannot detect which kind of mutation happened, so the
    caller owns that contract — the same trust model as any
    warehouse incremental-maintenance path.)

    Returns the number of new documents indexed.
    """
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        _band_rows_from_shingles,
        _shingle_rows,
    )

    p = _local_sidecar_path(path)
    with open(os.path.join(p, _SIDECAR)) as f:
        meta = json.load(f)
    ic = id_col or meta["id_col"]
    tc = text_col or meta["text_col"]
    sh_cached = _shingle_rows(new_docs, ic, tc, meta["n"])
    # Appended files must carry the EXISTING parquet schema — the id
    # is cast to the recorded type (e.g. int doc_ids appended to a
    # collection-backed index whose ids are strings).
    id_type = meta.get("id_type")
    sh = (
        sh_cached.withColumn("_id", F.col("_id").cast(id_type))
        if id_type
        else sh_cached
    )
    band_rows = _band_rows_from_shingles(
        sh, meta["id_col"], meta["num_hashes"], meta["bands"]
    )
    band_rows.write.mode("append").parquet(os.path.join(p, "bands"))
    # keep bucket_keys duplicate-free: append only keys the corpus
    # has never produced (anti-join against the persisted set — the
    # set is small relative to bands/, and the novelty-serve counting
    # contract depends on it staying distinct)
    existing_keys = spark.read.parquet(os.path.join(p, "bucket_keys"))
    (
        band_rows.select("band", "h")
        .distinct()
        .join(existing_keys, ["band", "h"], "left_anti")
        .write.mode("append")
        .parquet(os.path.join(p, "bucket_keys"))
    )
    if meta.get("has_shingles"):
        sh.select(F.col("_id").alias(meta["id_col"]), "h").write.mode(
            "append"
        ).parquet(os.path.join(p, "shingles"))
        (
            sh.groupBy(F.col("_id").alias(meta["id_col"]))
            .agg(F.count(F.lit(1)).alias("n_sh"))
            .write.mode("append")
            .parquet(os.path.join(p, "sizes"))
        )
    n_new = sh.select("_id").distinct().count()
    sh_cached.unpersist()
    src = meta.get("source")
    if src is not None:
        meta["source"] = _source_stamp((src["root"], src["name"]))
        with open(os.path.join(p, _SIDECAR), "w") as f:
            json.dump(meta, f)
    return n_new
