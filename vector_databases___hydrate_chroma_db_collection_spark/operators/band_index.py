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
equi-join on ``(band, h)``. The serving layout makes that join
exchange-free on the corpus side: ``bands/`` and ``bucket_keys/``
are written as Spark BUCKETED tables clustered by ``(band, h)``
(``num_buckets``, recorded in the sidecar), so a gate's probe batch
is shuffled into the corpus's existing bucketing and the
corpus-scale table is scanned in place — the shuffle cost of a serve
call is |batch| * bands rows, never the corpus
(``tests/test_band_index.py`` freezes the no-corpus-Exchange plan).
Bucketed datasets are registered in the session catalog on
read/append (``CREATE TABLE IF NOT EXISTS ... CLUSTERED BY ...
LOCATION``), so a fresh session serves an index written by another.

Reference provenance: the reference (sas:126-193) hydrates a Chroma
collection for retrieval; a production hydration pipeline gates
re-ingested documents against what the collection already holds —
this index is that gate's corpus state.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
    _check_source_stamp,
    _local_sidecar_path,
    _source_stamp,
)

_SIDECAR = "band_index.json"
_BUCKET_COLS = ("band", "h")


def _bucket_table(path: str, part: str) -> str:
    """Deterministic session-catalog name for a bucketed index part:
    the catalog entry is session-local metadata over the files at
    ``path``; any session re-derives the same name from the path."""
    digest = hashlib.md5(os.path.abspath(path).encode("utf-8")).hexdigest()[:12]
    return f"band_index_{digest}_{part}"


def _register_bucketed(
    spark: SparkSession, path: str, part: str, ddl: str, nb: int
) -> str:
    """Idempotently (re-)register the bucketed table over the
    persisted files and refresh cached file listings. Returns the
    table name; ``spark.table(name)`` scans with ``Bucketed: true``
    (hash-distributed on (band, h)), which is what lets the gate's
    join skip the corpus-side Exchange."""
    tbl = _bucket_table(path, part)
    loc = os.path.join(_local_sidecar_path(path), part)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {tbl} ({ddl}) USING PARQUET "
        f"CLUSTERED BY (band, h) SORTED BY (band, h) INTO {nb} BUCKETS "
        f"LOCATION '{loc}'"
    )
    spark.sql(f"REFRESH TABLE {tbl}")
    return tbl


def _write_part(
    df: DataFrame, path: str, part: str, nb: int | None, mode: str = "overwrite"
) -> None:
    """Persist one index dataset. ``nb`` set: a bucketed catalog
    table clustered+sorted by (band, h) — ``repartition`` onto the
    bucket keys first so each task owns whole buckets (one file per
    bucket, not files-per-task-per-bucket). ``nb`` None: plain
    parquet (the pre-r9 layout, still readable)."""
    loc = os.path.join(_local_sidecar_path(path), part)
    if nb is None:
        df.write.mode(mode).parquet(loc)
        return
    spark = df.sparkSession
    tbl = _bucket_table(path, part)
    writer = (
        df.repartition(nb, *_BUCKET_COLS)
        .write.bucketBy(nb, *_BUCKET_COLS)
        .sortBy(*_BUCKET_COLS)
    )
    if mode == "overwrite":
        # A fresh session overwriting an existing on-disk index has
        # files but no catalog entry; CTAS refuses a non-empty
        # location, so clear both sides first (the sidecar write
        # below re-commits the index atomically for readers that
        # follow the read API).
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(loc, ignore_errors=True)
        writer.option("path", loc).mode("overwrite").saveAsTable(tbl)
    else:
        ddl = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
        _register_bucketed(spark, path, part, ddl, nb)
        writer.mode("append").saveAsTable(tbl)
        spark.sql(f"REFRESH TABLE {tbl}")


def _read_part(
    spark: SparkSession, path: str, part: str, meta: dict
) -> DataFrame:
    nb = meta.get("num_buckets")
    loc = os.path.join(_local_sidecar_path(path), part)
    if nb is None:
        return spark.read.parquet(loc)
    tbl = _register_bucketed(spark, path, part, meta["ddl"][part], nb)
    return spark.table(tbl)


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
    num_buckets: int | None = 32,
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
        num_buckets=num_buckets,
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
    num_buckets: int | None = 32,
) -> None:
    """Persist a corpus band table (the output of ``lsh_band_rows``
    over the corpus) plus its sidecar.

    The ``n/num_hashes/bands/id_col/text_col`` kwargs are the BUILD
    record — ``band_index_refresh`` replays them verbatim, and
    ``novelty_gate`` callers read them back so the probe side is
    hashed with the identical family (mismatched ``n`` would silently
    gate everything as novel). ``source=(root, name)`` stamps the
    sidecar with the collection's current etag.

    ``num_buckets`` (default 32): write ``bands/`` and
    ``bucket_keys/`` as bucketed tables clustered by ``(band, h)`` —
    the serving layout; every gate call joins the corpus side
    exchange-free. Pass ``None`` for plain parquet (portable to
    engines without Spark bucketing; each serve then shuffles the
    corpus side).

    ``shingles`` (optional): the corpus shingle-hash rows
    ``(id, h)`` — pass ``lsh_band_rows``'s attached shingle cache (it
    is already materialized by the band write) to ALSO persist the
    exact-verification side: posting rows under ``shingles/`` and
    per-doc set sizes under ``sizes/``. With them on disk,
    ``neardup_gate_verified`` serves LSH candidates AND exact-Jaccard
    verdicts without ever touching corpus text again."""
    p = _local_sidecar_path(path)
    os.makedirs(p, exist_ok=True)
    stamp = _source_stamp(source)
    keys = band_rows.select("band", "h").distinct()
    # Pre-distincted bucket keys: novelty serving needs only (band, h)
    # MEMBERSHIP, so the distinct is paid once at build time instead
    # of once per serve call (novelty_gate skips its defensive
    # distinct when handed a two-column key table).
    _write_part(band_rows, path, "bands", num_buckets)
    _write_part(keys, path, "bucket_keys", num_buckets)
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
                "num_buckets": num_buckets,
                "ddl": {
                    "bands": ", ".join(
                        f"`{c}` {t}" for c, t in band_rows.dtypes
                    ),
                    "bucket_keys": ", ".join(
                        f"`{c}` {t}" for c, t in keys.dtypes
                    ),
                },
            },
            f,
        )


def band_index_meta(path: str) -> dict:
    """The sidecar's BUILD record (n / num_hashes / bands / column
    bindings / bucket layout / source stamp) without loading any
    data — what a serving caller needs to hash its probe side with
    the index's exact family."""
    p = _local_sidecar_path(path)
    with open(os.path.join(p, _SIDECAR)) as f:
        return json.load(f)


def band_index_read(
    spark: SparkSession, path: str, *, verify_source: bool = True
) -> tuple[DataFrame, dict]:
    """Load a persisted band index -> (band_rows, meta).

    Same staleness contract as ``ivf_read``: a stamped sidecar whose
    source collection has since changed raises ``StaleIndexError`` —
    a gate can never silently treat deleted/replaced corpus text as
    still ingested. Unstamped indexes load as-is. Bucketed indexes
    come back as catalog-table scans (``Bucketed: true``), so joins
    against them need no corpus-side Exchange."""
    p = _local_sidecar_path(path)
    with open(os.path.join(p, _SIDECAR)) as f:
        meta = json.load(f)
    _check_source_stamp(meta, path, verify_source)
    return _read_part(spark, path, "bands", meta), meta


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
    return _read_part(spark, path, "bucket_keys", meta)


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
        num_buckets=meta.get("num_buckets"),
    )
    return band_index_read(spark, path)


def band_index_append(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    id_col: str | None = None,
    text_col: str | None = None,
    on_existing: str = "skip",
    expected_prev_etag: str | None = None,
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

    Double-ingest is guarded, not caller-trusted: incoming ids are
    anti-joined against the ids the index already holds (``sizes/``
    when the index is verification-capable, else the distinct ids of
    ``bands/`` — one bounded join either way). ``on_existing="skip"``
    (default) silently drops re-appended ids so replaying a batch is
    idempotent; ``"error"`` raises ValueError naming the count, for
    pipelines where a replay indicates a bug. Without the guard a
    re-append would duplicate band/posting rows and double posting
    weights in ``neardup_gate_verified``.

    The sidecar is re-stamped with the source collection's CURRENT
    etag — call this AFTER appending the same docs to the collection,
    and the index transitions stale -> fresh without the full
    ``band_index_refresh`` rebuild. Appends only: updates or deletes
    change existing docs' rows and need the full refresh; this
    function cannot detect which KIND of mutation happened, so pass
    ``expected_prev_etag`` (the etag you observed before mutating the
    collection — what the sidecar currently records) to assert the
    only change since the last stamp was your own append;
    ``StaleIndexError`` is raised on mismatch instead of silently
    marking a foreign mutation fresh.

    Returns the number of new documents indexed (after the guard).
    """
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        _band_rows_from_shingles,
        _shingle_rows,
    )

    p = _local_sidecar_path(path)
    with open(os.path.join(p, _SIDECAR)) as f:
        meta = json.load(f)
    if on_existing not in ("skip", "error"):
        raise ValueError(
            f"on_existing must be 'skip' or 'error', got {on_existing!r}"
        )
    if expected_prev_etag is not None:
        from vector_databases___hydrate_chroma_db_collection_spark.errors import (
            StaleIndexError,
        )

        src = meta.get("source")
        recorded = src["etag"] if src else None
        if recorded != expected_prev_etag:
            raise StaleIndexError(
                f"band index at {path!r} records etag "
                f"{str(recorded)[:12]!r} but the append expected "
                f"{expected_prev_etag[:12]!r}: the source collection "
                "was mutated by something other than this append "
                "since the index was last stamped — run "
                "band_index_refresh instead"
            )
    ic = id_col or meta["id_col"]
    tc = text_col or meta["text_col"]
    id_type = meta.get("id_type")

    # -- double-ingest guard: one bounded anti-join on the id --------
    if meta.get("has_shingles"):
        have = spark.read.parquet(os.path.join(p, "sizes")).select(
            F.col(meta["id_col"]).alias("_have_id")
        )
    else:
        have = _read_part(spark, path, "bands", meta).select(
            F.col(meta["id_col"]).alias("_have_id")
        ).distinct()
    inc_id = F.col(ic).cast(id_type) if id_type else F.col(ic)
    fresh = new_docs.join(have, inc_id == F.col("_have_id"), "left_anti")
    if on_existing == "error":
        n_dup = new_docs.join(have, inc_id == F.col("_have_id"), "left_semi").count()
        if n_dup:
            raise ValueError(
                f"band_index_append: {n_dup} incoming id(s) are already "
                f"indexed at {path!r}; re-appending would duplicate "
                "band/posting rows (pass on_existing='skip' to make "
                "replays idempotent)"
            )
    # Materialize the guarded batch BEFORE any append below: the
    # anti-join's lineage reads sizes/ (or bands/), which this call
    # appends to — localCheckpoint cuts the lineage so no append's
    # write action re-lists a directory it is writing into.
    fresh = fresh.localCheckpoint(eager=True)

    sh_cached = _shingle_rows(fresh, ic, tc, meta["n"])
    # Appended files must carry the EXISTING parquet schema — the id
    # is cast to the recorded type (e.g. int doc_ids appended to a
    # collection-backed index whose ids are strings).
    sh = (
        sh_cached.withColumn("_id", F.col("_id").cast(id_type))
        if id_type
        else sh_cached
    )
    band_rows = _band_rows_from_shingles(
        sh, meta["id_col"], meta["num_hashes"], meta["bands"]
    )
    nb = meta.get("num_buckets")
    _write_part(band_rows, path, "bands", nb, mode="append")
    # keep bucket_keys duplicate-free: append only keys the corpus
    # has never produced (anti-join against the persisted set — the
    # set is small relative to bands/, and the novelty-serve counting
    # contract depends on it staying distinct). Materialized before
    # the append so the write never re-reads its own target.
    existing_keys = _read_part(spark, path, "bucket_keys", meta)
    new_keys = (
        band_rows.select("band", "h")
        .distinct()
        .join(existing_keys, ["band", "h"], "left_anti")
        .localCheckpoint(eager=True)
    )
    _write_part(new_keys, path, "bucket_keys", nb, mode="append")
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
