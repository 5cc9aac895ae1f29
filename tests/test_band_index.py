"""Persisted MinHash band index lifecycle: write/read round-trip,
etag staleness after a collection mutation, one-call refresh — the
same contract surface as the IVF sidecar tests (test_ann.py), applied
to the near-dup novelty gate's corpus state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
    band_index_read,
    band_index_refresh,
    band_index_write,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
    lsh_band_rows,
    novelty_gate,
    release_cache,
)
from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
    load_table,
)

from .conftest import SF_SMOKE

SENTINEL = (
    "zeta omega kappa lambda sigma tau epsilon delta rho xi "
    "chi psi phi upsilon omicron nu mu iota theta eta"
)


def _make_collection(spark, tmp_path, name):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    e = load_table(spark, SF_SMOKE, "embeddings")
    hydrate(
        spark,
        d.join(e, d.doc_id == e.vec_id),
        HydrationConfig(
            collection_name=name,
            root=str(tmp_path),
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
        ),
    )
    return str(tmp_path)


def test_band_index_roundtrip_stale_and_refresh(spark, tmp_path):
    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        StaleIndexError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_update,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    root = _make_collection(spark, tmp_path, "band_c")
    coll = read_collection(spark, root, "band_c")
    n_docs = coll.count()

    bands = lsh_band_rows(coll, id_col="id", text_col="document")
    path = f"{root}/band_c/_bands"
    band_index_write(
        bands, path, id_col="id", text_col="document", source=(root, "band_c")
    )
    release_cache(bands)

    # fresh: loads fine, full band table, build params recorded
    loaded, meta = band_index_read(spark, path)
    assert loaded.count() == n_docs * 8
    assert (meta["n"], meta["num_hashes"], meta["bands"]) == (3, 16, 8)
    assert meta["text_col"] == "document"

    # gate through the loaded index: a verbatim copy of doc '7' is a
    # suspect on all 8 bands; the sentinel text is novel
    incoming = spark.createDataFrame(
        [(999, None), (998, SENTINEL)], "doc_id int, text string"
    )
    doc7 = coll.filter(F.col("id") == "7").first()["document"]
    incoming = incoming.withColumn(
        "text", F.when(F.col("doc_id") == 999, F.lit(doc7)).otherwise(F.col("text"))
    )
    out = novelty_gate(incoming, loaded, id_col="doc_id", text_col="text")
    got = {r["doc_id"]: (r["n_hit_bands"], r["novel"]) for r in out.collect()}
    release_cache(out)
    assert got == {999: (8, False), 998: (0, True)}

    # mutate: doc '3' takes the sentinel text -> etag changes
    upd = spark.createDataFrame([("3", SENTINEL)], "id string, document string")
    assert collection_update(spark, root, "band_c", upd) == 1

    with pytest.raises(StaleIndexError, match="STALE"):
        band_index_read(spark, path)
    # explicit opt-out still serves the OLD state: sentinel is novel
    old_bands, _ = band_index_read(spark, path, verify_source=False)
    out_old = novelty_gate(
        incoming.filter(F.col("doc_id") == 998),
        old_bands,
        id_col="doc_id",
        text_col="text",
    )
    assert [r["novel"] for r in out_old.collect()] == [True]
    release_cache(out_old)

    # one-call remedy: rebuild against the CURRENT collection — the
    # sentinel is now ingested text, so the gate must flag it
    fresh, meta2 = band_index_refresh(spark, path)
    assert fresh.count() == n_docs * 8
    assert meta2["source"]["etag"] != meta["source"]["etag"]
    out_new = novelty_gate(
        incoming.filter(F.col("doc_id") == 998),
        fresh,
        id_col="doc_id",
        text_col="text",
    )
    rows = out_new.collect()
    release_cache(out_new)
    assert rows[0]["n_hit_bands"] == 8 and not rows[0]["novel"]
    # and a plain read passes the staleness gate again
    band_index_read(spark, path)


def test_band_index_unstamped_never_checks_and_cannot_refresh(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    bands = lsh_band_rows(docs, id_col="doc_id", text_col="text")
    path = str(tmp_path / "plain_bands")
    band_index_write(bands, path)
    release_cache(bands)
    loaded, meta = band_index_read(spark, path)
    assert meta["source"] is None and loaded.count() == 20 * 8
    with pytest.raises(ValueError, match="no source-collection stamp"):
        band_index_refresh(spark, path)


def test_neardup_gate_verified_from_persisted_index(spark, tmp_path):
    """Verified serving path: exact dup -> jaccard 1.0 dup verdict
    with the right match id; novel doc -> NULL match, not dup; the
    verdict comes entirely from the persisted postings (corpus text
    never read at serve time — the gate gets only index tables)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_build,
        band_index_read_verified,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        neardup_gate_verified,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank while birds sing in the tall green trees above"
    )
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("green", "blue")),
            (3, "completely different content about catalyst optimizer "
                "plans and distributed shuffles in large clusters today"),
        ],
        "doc_id int, text string",
    )
    path = str(tmp_path / "vidx")
    band_index_build(
        corpus, path, id_col="doc_id", text_col="text", include_shingles=True
    )
    bands_t, sh_t, sizes_t, meta = band_index_read_verified(spark, path)
    assert meta["has_shingles"]

    incoming = spark.createDataFrame(
        [
            (101, base),  # exact dup of corpus doc 1
            (102, "novel prose about reinforcement learning reward "
                  "models and preference optimization at scale today"),
        ],
        "doc_id int, text string",
    )
    out = neardup_gate_verified(
        incoming, bands_t, sh_t, sizes_t, id_col="doc_id", text_col="text"
    )
    got = {
        r["doc_id"]: (r["best_match_id"], r["best_jaccard"], r["is_dup"])
        for r in out.collect()
    }
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        release_cache,
    )

    release_cache(out)
    assert got[101] == (1, 1.0, True)
    assert got[102] == (None, None, False)


def test_band_index_read_verified_requires_shingles(spark, tmp_path):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_build,
        band_index_read_verified,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(5)
    path = str(tmp_path / "bands_only")
    band_index_build(docs, path, id_col="doc_id", text_col="text")
    with pytest.raises(ValueError, match="without shingles"):
        band_index_read_verified(spark, path)


def test_band_index_append_incremental(spark, tmp_path):
    """Incremental ingest: appending docs to the collection makes the
    index stale; band_index_append indexes ONLY the new docs (no
    corpus recompute), re-stamps, and the verified gate then flags
    copies of the newly-appended text."""
    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        StaleIndexError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_append,
        band_index_build,
        band_index_read,
        band_index_read_verified,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        neardup_gate_verified,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    e = load_table(spark, SF_SMOKE, "embeddings")
    root = str(tmp_path)

    def cfg():
        return HydrationConfig(
            collection_name="band_a",
            root=root,
            id_col="doc_id",
            text_col="text",
            embedding_col="embedding",
        )

    first = d.filter(F.col("doc_id") < 30)
    hydrate(spark, first.join(e, first.doc_id == e.vec_id), cfg())
    coll = read_collection(spark, root, "band_a")
    n0 = coll.count()
    path = f"{root}/band_a/_bands"
    band_index_build(
        coll,
        path,
        id_col="id",
        text_col="document",
        include_shingles=True,
        source=(root, "band_a"),
    )

    nxt = d.filter(F.col("doc_id").between(30, 39))
    hydrate(spark, nxt.join(e, nxt.doc_id == e.vec_id), cfg())
    with pytest.raises(StaleIndexError, match="STALE"):
        band_index_read(spark, path)

    new_docs = nxt.join(e, nxt.doc_id == e.vec_id).select(
        F.col("doc_id").cast("string").alias("id"),
        F.col("text").alias("document"),
    )
    n_new = band_index_append(spark, path, new_docs)
    assert n_new == new_docs.count()

    bands_t, sh_t, sizes_t, meta = band_index_read_verified(spark, path)
    assert bands_t.count() == (n0 + n_new) * 8
    assert dict(bands_t.dtypes)["id"] == meta["id_type"] == "string"

    doc35 = d.filter(F.col("doc_id") == 35).first()["text"]
    incoming = spark.createDataFrame([(500, doc35)], "doc_id int, text string")
    out = neardup_gate_verified(
        incoming, bands_t, sh_t, sizes_t, id_col="doc_id", text_col="text"
    )
    row = out.collect()[0]
    release_cache(out)
    # expected match: smallest (string-ordered) collection id whose
    # document text equals doc 35's — usually '35' itself, but the
    # fixture may contain planted duplicates
    expect = (
        read_collection(spark, root, "band_a")
        .filter(F.col("document") == doc35)
        .agg(F.min("id"))
        .first()[0]
    )
    assert row["best_jaccard"] == 1.0 and row["is_dup"]
    assert row["best_match_id"] == expect


def test_bucket_keys_gate_equals_full_bands_gate(spark, tmp_path):
    """The pre-distincted bucket_keys table serves the novelty gate
    with identical results to the full (id, band, h) table — and it
    stays duplicate-free through an append (the counting contract
    novelty_gate trusts two-column references to uphold)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_append,
        band_index_bucket_keys,
        band_index_build,
        band_index_read,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "bk_idx")
    band_index_build(
        d.filter(F.col("doc_id") < 30), path, id_col="doc_id", text_col="text"
    )
    band_index_append(
        spark, path, d.filter(F.col("doc_id").between(30, 39))
    )
    bk = band_index_bucket_keys(spark, path)
    assert bk.columns == ["band", "h"]
    assert bk.count() == bk.distinct().count()

    bands_full, _ = band_index_read(spark, path)
    incoming = d.filter(F.col("doc_id").between(35, 44)).select("doc_id", "text")
    via_keys = novelty_gate(incoming, bk, id_col="doc_id", text_col="text")
    via_bands = novelty_gate(incoming, bands_full, id_col="doc_id", text_col="text")
    got_k = {r["doc_id"]: (r["n_hit_bands"], r["novel"]) for r in via_keys.collect()}
    got_b = {r["doc_id"]: (r["n_hit_bands"], r["novel"]) for r in via_bands.collect()}
    release_cache(via_keys)
    release_cache(via_bands)
    assert got_k == got_b
    # docs 35-39 are ingested corpus members -> all 8 bands hit
    assert all(got_k[i] == (8, False) for i in range(35, 40))
