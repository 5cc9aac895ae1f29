"""Hydration invariants from the reference semantics (SURVEY.md §5.2):
count-in == count-out, id stringification (Q2), strict/drop_nulls
embedding policy (Q1), hard-coded "rating" metadata key compat,
idempotent get-or-create, duplicate-id rejection."""

from __future__ import annotations

import pytest

from vector_databases___hydrate_chroma_db_collection_spark.errors import (
    DisabledError,
    DuplicateIdError,
    InvalidPathError,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
    HydrationConfig,
    build_hydration_input,
    hydrate,
)
from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
    get_or_create_collection,
    load_manifest,
    read_collection,
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [
            (1.0, "first doc", [0.1, 0.2], 5.0),
            (2.0, "second doc", [0.3, 0.4], 3.0),
            (3.0, "third doc", [0.5, 0.6], 1.0),
        ],
        "uid double, body string, vec array<float>, stars double",
    )


def cfg(root, **kw):
    base = dict(
        collection_name="c1",
        root=str(root),
        id_col="uid",
        text_col="body",
        embedding_col="vec",
        metadata_col="stars",
        metadata_key="rating",  # reference compat (sas:181)
    )
    base.update(kw)
    return HydrationConfig(**base)


def test_count_in_equals_count_out(spark, sample, tmp_path):
    report = hydrate(spark, sample, cfg(tmp_path))
    assert report.rows_in == 3
    assert report.rows_written == 3
    assert report.count_before == 0
    assert report.count_after == 3


def test_id_stringification_q2(spark, sample, tmp_path):
    # double-typed ids stringify like the reference's str(1.0) -> "1.0"
    hydrate(spark, sample, cfg(tmp_path))
    ids = {r["id"] for r in read_collection(spark, str(tmp_path), "c1").collect()}
    assert ids == {"1.0", "2.0", "3.0"}


def test_metadata_rating_compat(spark, sample, tmp_path):
    hydrate(spark, sample, cfg(tmp_path))
    row = (
        read_collection(spark, str(tmp_path), "c1")
        .filter("id = '1.0'")
        .first()
    )
    assert dict(row["metadata"]) == {"rating": "5.0"}


def test_duplicate_ids_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", [0.1, 0.2]), (1, "b", [0.3, 0.4])],
        "uid int, body string, vec array<float>",
    )
    with pytest.raises(DuplicateIdError):
        hydrate(spark, df, cfg(tmp_path, metadata_col=None, metadata_key=None))


def test_re_add_existing_id_rejected(spark, sample, tmp_path):
    hydrate(spark, sample, cfg(tmp_path))
    with pytest.raises(DuplicateIdError):
        hydrate(spark, sample, cfg(tmp_path))


def test_upsert_replaces_existing(spark, sample, tmp_path):
    # Chroma upsert() semantics: incoming rows replace same-id rows.
    hydrate(spark, sample, cfg(tmp_path))
    updated = spark.createDataFrame(
        [(1.0, "first doc v2", [0.9, 0.9], 4.0), (4.0, "fourth doc", [0.7, 0.8], 2.0)],
        "uid double, body string, vec array<float>, stars double",
    )
    report = hydrate(spark, updated, cfg(tmp_path, on_duplicate="upsert"))
    assert report.rows_written == 2
    assert report.count_after == 4  # 3 existing - 1 replaced + 2 incoming
    rows = {
        r["id"]: r["document"]
        for r in read_collection(spark, str(tmp_path), "c1").collect()
    }
    assert rows["1.0"] == "first doc v2"  # replaced, not the original
    assert rows["4.0"] == "fourth doc"
    assert set(rows) == {"1.0", "2.0", "3.0", "4.0"}


def test_upsert_identical_batch_is_idempotent(spark, sample, tmp_path):
    hydrate(spark, sample, cfg(tmp_path))
    report = hydrate(spark, sample, cfg(tmp_path, on_duplicate="upsert"))
    assert report.rows_written == 3
    assert report.count_after == 3


def test_dimension_guard_rejects_ragged(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", [0.1, 0.2]), (2, "b", [0.3]), (3, "c", [0.1, None])],
        "uid int, body string, vec array<float>",
    )
    report = hydrate(spark, df, cfg(tmp_path, metadata_col=None, metadata_key=None))
    assert report.rows_written == 1
    assert report.rows_rejected == 2


def test_get_or_create_idempotent(tmp_path):
    m1 = get_or_create_collection(str(tmp_path), "c", dim=4)
    m2 = get_or_create_collection(str(tmp_path), "c", dim=4)
    assert m1 == m2
    with pytest.raises(InvalidPathError):
        get_or_create_collection(str(tmp_path), "c", dim=8)
    assert load_manifest(str(tmp_path), "c").dim == 4


def test_disabled_trigger(spark, sample, tmp_path):
    # reference run-time trigger compat (sas:244-255, 527-538)
    with pytest.raises(DisabledError):
        hydrate(spark, sample, cfg(tmp_path, enabled=False))


def test_canonical_projection_shapes(spark, sample):
    out = build_hydration_input(sample, cfg("/tmp/x"))
    assert [f.name for f in out.schema.fields] == [
        "id",
        "document",
        "embedding",
        "metadata",
    ]
    assert out.schema["id"].dataType.simpleString() == "string"
    assert out.schema["embedding"].dataType.simpleString() == "array<float>"
    assert out.schema["metadata"].dataType.simpleString() == "map<string,string>"


def test_chunked_hydration_end_to_end(spark, tmp_path):
    """RAG path: chunk documents -> fake per-chunk embeddings ->
    hydrate -> chunk ids resolvable back to parent docs."""
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        chunk_tokens,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    chunks = docs.select(
        "doc_id", F.posexplode(chunk_tokens("text", window=16, step=12))
    ).select(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("pos").cast("string")).alias("chunk_id"),
        F.col("col.chunk_text").alias("chunk_text"),
        # deterministic fake embedding per chunk (hash-derived 4-dim)
        F.array(
            *[
                (F.conv(F.substring(F.md5(F.concat(F.col("col.chunk_text"), F.lit(i))
                    .cast("binary")), 1, 6), 16, 10).cast("float") / 16777215.0)
                for i in ["a", "b", "c", "d"]
            ]
        ).alias("vec"),
    )
    report = hydrate(
        spark,
        chunks,
        HydrationConfig(
            collection_name="chunks",
            root=str(tmp_path),
            id_col="chunk_id",
            text_col="chunk_text",
            embedding_col="vec",
        ),
    )
    assert report.rows_written == report.rows_in > 50  # chunking expanded rows
    coll = read_collection(spark, str(tmp_path), "chunks")
    parents = coll.select(F.split("id", "#").getItem(0).cast("long").alias("doc_id")).distinct()
    assert parents.count() == 50


def test_invalid_path_scheme_rejected():
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        validate_path,
    )

    assert validate_path("file:/tmp/x") == "/tmp/x"
    assert validate_path("/tmp/y") == "/tmp/y"
    with pytest.raises(InvalidPathError):
        validate_path("s3://bucket/coll")
    with pytest.raises(InvalidPathError):
        validate_path("")


def test_compaction_and_sql_view(spark, sample, tmp_path):
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        compact_collection,
        register_collection_view,
    )

    # three appends -> many small files
    hydrate(spark, sample, cfg(tmp_path))
    for i in (10, 20):
        more = sample.selectExpr(f"uid + {i} AS uid", "body", "vec", "stars")
        hydrate(spark, more, cfg(tmp_path))
    import glob

    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        current_data_dir,
    )

    files_before = glob.glob(str(tmp_path / "c1" / "data" / "*.parquet"))
    n = compact_collection(spark, str(tmp_path), "c1", target_partitions=1)
    files_after = glob.glob(current_data_dir(str(tmp_path), "c1") + "/*.parquet")
    assert n == 9
    assert len(files_after) < len(files_before)
    assert len(files_after) == 1

    view = register_collection_view(spark, str(tmp_path), "c1")
    assert spark.sql(f"SELECT count(*) AS c FROM {view}").first()["c"] == 9
    spark.catalog.dropTempView(view)


def test_swap_is_pointer_replace_and_crash_safe(spark, sample, tmp_path):
    """The active data dir is named by the _current pointer; a rewrite
    that dies before the pointer swap leaves the old dir live."""
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        compact_collection,
        current_data_dir,
        next_data_dir,
    )

    hydrate(spark, sample, cfg(tmp_path))
    before = current_data_dir(str(tmp_path), "c1")

    # simulate a crashed rewrite: staging dir written, pointer untouched
    stale = next_data_dir(str(tmp_path), "c1")
    os.makedirs(stale)
    assert current_data_dir(str(tmp_path), "c1") == before
    assert read_collection(spark, str(tmp_path), "c1").count() == 3

    # a real compaction swaps past the stale dir and stays readable
    compact_collection(spark, str(tmp_path), "c1", target_partitions=1)
    after = current_data_dir(str(tmp_path), "c1")
    assert after != before
    assert not os.path.exists(before)  # retired dir cleaned post-swap
    assert read_collection(spark, str(tmp_path), "c1").count() == 3


def test_duplicate_guard_is_single_job(spark, sample, tmp_path):
    """In-batch dup + collection-clash detection fold into ONE Spark
    job (one aggregation over the union of tagged id sets)."""
    hydrate(spark, sample, cfg(tmp_path))
    fresh = spark.createDataFrame(
        [(7.0, "seventh", [0.1, 0.1], 1.0)],
        "uid double, body string, vec array<float>, stars double",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    hydrate(spark, fresh, cfg(tmp_path))
    jobs = len(tracker.getJobIdsForGroup(None)) - before
    # Measured on this Spark (AQE splits stages into jobs): the folded
    # guard runs 3 jobs where the two-guard shape ran 7, putting the
    # whole hydration at 15 vs ~19. The bound catches a regression to
    # two guard actions without being flaky about AQE job splitting.
    assert jobs <= 16, f"hydrate ran {jobs} jobs; duplicate guard not folded"


def _bucket_dirs(root, name="c1"):
    import glob
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        current_data_dir,
    )

    out = {}
    for d in glob.glob(os.path.join(current_data_dir(str(root), name), "id_bucket=*")):
        out[os.path.basename(d)] = sorted(
            os.path.basename(f) for f in glob.glob(os.path.join(d, "*.parquet"))
        )
    return out


def test_bucketed_layout_and_reads(spark, sample, tmp_path):
    report = hydrate(spark, sample, cfg(tmp_path, n_buckets=4))
    assert report.count_after == 3
    assert load_manifest(str(tmp_path), "c1").n_buckets == 4
    assert _bucket_dirs(tmp_path)  # hive partition dirs exist
    # canonical read hides the partition column
    df = read_collection(spark, str(tmp_path), "c1")
    assert df.columns == ["id", "document", "embedding", "metadata"]
    assert df.count() == 3
    # bucket-aware read supports partition pruning
    raw = read_collection(spark, str(tmp_path), "c1", include_bucket=True)
    some_bucket = raw.select("id_bucket").first()["id_bucket"]
    plan = (
        raw.filter(f"id_bucket = {some_bucket}")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan and "id_bucket" in plan


def test_bucketed_upsert_rewrites_only_affected_buckets(spark, sample, tmp_path):
    hydrate(spark, sample, cfg(tmp_path, n_buckets=16))
    before = _bucket_dirs(tmp_path)
    updated = spark.createDataFrame(
        [(1.0, "first doc v2", [0.9, 0.9], 4.0)],
        "uid double, body string, vec array<float>, stars double",
    )
    report = hydrate(spark, updated, cfg(tmp_path, n_buckets=16, on_duplicate="upsert"))
    assert report.rows_written == 1
    assert report.count_after == 3
    after = _bucket_dirs(tmp_path)
    changed = {b for b in set(before) | set(after) if before.get(b) != after.get(b)}
    # with 16 buckets and 3 docs, id "1.0" is alone in its bucket:
    # exactly one bucket rewrote, every other file set is untouched
    assert len(changed) == 1, (changed, before, after)
    rows = {r["id"]: r["document"] for r in read_collection(spark, str(tmp_path), "c1").collect()}
    assert rows == {"1.0": "first doc v2", "2.0": "second doc", "3.0": "third doc"}


def test_clone_untouched_buckets_links_only_untouched(tmp_path):
    """Unit contract of the bucket-clone helper: untouched id_bucket
    dirs are carried forward (hardlink or copy), touched buckets and
    non-bucket entries are skipped, and a missing source dir is a
    no-op."""
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        clone_untouched_buckets,
    )

    src = tmp_path / "data-1"
    for b in (0, 1, 2):
        d = src / f"id_bucket={b}"
        d.mkdir(parents=True)
        (d / f"part-{b}.parquet").write_bytes(b"x" * (b + 1))
    (src / "_SUCCESS").write_text("")  # non-bucket entry: never cloned
    (src / "id_bucket=junk").mkdir()  # unparseable bucket id: skipped

    staging = tmp_path / "data-2"
    n = clone_untouched_buckets(str(src), str(staging), touched={1})
    assert n == 2  # buckets 0 and 2 cloned, bucket 1 skipped
    assert (staging / "id_bucket=0" / "part-0.parquet").read_bytes() == b"x"
    assert (staging / "id_bucket=2" / "part-2.parquet").read_bytes() == b"xxx"
    assert not (staging / "id_bucket=1").exists()
    assert not (staging / "_SUCCESS").exists()
    assert not (staging / "id_bucket=junk").exists()
    # hardlinked files survive removal of the source (pointer-swap GC)
    import shutil

    shutil.rmtree(src)
    assert (staging / "id_bucket=0" / "part-0.parquet").read_bytes() == b"x"
    # missing source: no-op
    assert clone_untouched_buckets(str(tmp_path / "nope"), str(staging), set()) == 0


def test_bucketed_upsert_is_crash_atomic(spark, sample, tmp_path, monkeypatch):
    """Bucketed upsert commits through the pointer swap: a simulated
    crash after the staging write leaves the collection on its prior
    complete state (never mixed old/new buckets)."""
    import importlib

    hy = importlib.import_module(
        "vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate"
    )

    hydrate(spark, sample, cfg(tmp_path, n_buckets=16))
    before = sorted(
        (r["id"], r["document"])
        for r in read_collection(spark, str(tmp_path), "c1").collect()
    )

    def boom(*a, **k):
        raise RuntimeError("simulated crash before pointer swap")

    monkeypatch.setattr(hy, "swap_data_dir", boom)
    updated = spark.createDataFrame(
        [(1.0, "first doc v2", [0.9, 0.9], 4.0)],
        "uid double, body string, vec array<float>, stars double",
    )
    import pytest

    with pytest.raises(RuntimeError, match="simulated crash"):
        hydrate(spark, updated, cfg(tmp_path, n_buckets=16, on_duplicate="upsert"))
    after = sorted(
        (r["id"], r["document"])
        for r in read_collection(spark, str(tmp_path), "c1").collect()
    )
    assert after == before


def test_bucketed_collection_compacts_preserving_layout(spark, sample, tmp_path):
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        compact_collection,
    )

    hydrate(spark, sample, cfg(tmp_path, n_buckets=4))
    more = spark.createDataFrame(
        [(9.0, "ninth", [0.2, 0.2], 2.0)],
        "uid double, body string, vec array<float>, stars double",
    )
    hydrate(spark, more, cfg(tmp_path))  # manifest's bucketing wins
    assert compact_collection(spark, str(tmp_path), "c1", target_partitions=2) == 4
    assert _bucket_dirs(tmp_path)  # still hive-partitioned after compaction
    assert read_collection(spark, str(tmp_path), "c1").count() == 4


def test_vacuum_removes_only_orphans(spark, sample, tmp_path):
    import os
    import time

    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_count,
        compact_collection,
        current_data_dir,
        vacuum_collection,
    )

    hydrate(spark, sample, cfg(tmp_path, collection_name="vac"))
    # a rewrite (compaction) moves the active dir to data-1
    compact_collection(spark, str(tmp_path), "vac", target_partitions=1)
    base = tmp_path / "vac"
    # simulate a crashed rewrite: staging dir written, pointer never swapped
    orphan = base / "data-7"
    orphan.mkdir()
    (orphan / "part-zzz.parquet").write_bytes(b"junk")
    (base / "_current.tmp").write_text("data-7")

    active_before = current_data_dir(str(tmp_path), "vac")
    # fresh dirs are presumed in-flight rewrites and must survive...
    assert vacuum_collection(str(tmp_path), "vac") == []
    assert orphan.exists() and (base / "_current.tmp").exists()
    # ...until they age past the horizon (backdate mtime to simulate)
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    os.utime(base / "_current.tmp", (old, old))
    removed = vacuum_collection(str(tmp_path), "vac")
    assert str(orphan) in removed
    assert current_data_dir(str(tmp_path), "vac") == active_before
    assert os.path.isdir(active_before)
    assert not orphan.exists()
    assert not (base / "_current.tmp").exists()
    assert collection_count(spark, str(tmp_path), "vac") == 3


def _cfg(tmp_path, **kw):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
    )

    base = dict(
        collection_name="rg",
        root=str(tmp_path),
        id_col="doc_id",
        text_col="text",
        embedding_col="embedding",
    )
    base.update(kw)
    return HydrationConfig(**base)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, text string, embedding array<float>"
    )


def test_on_duplicate_typo_raises_typed(spark, tmp_path):
    """Review regression: an unknown policy must raise, never fall
    through to a guard-free append."""
    import pytest

    from vector_databases___hydrate_chroma_db_collection_spark.errors import EngineError
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate,
    )

    with pytest.raises(EngineError, match="on_duplicate"):
        hydrate(
            spark,
            _frame(spark, [(1, "a", [1.0, 0.0])]),
            _cfg(tmp_path, on_duplicate="ignore"),
        )


def test_first_policy_is_idempotent_retry(spark, tmp_path):
    """Review regression: 'first' skips ids already stored, so
    re-hydrating the same batch is a no-op, not a duplication."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    batch = _frame(spark, [(1, "a", [1.0, 0.0]), (2, "b", [0.0, 1.0])])
    cfg = _cfg(tmp_path, on_duplicate="first")
    hydrate(spark, batch, cfg)
    rpt = hydrate(spark, batch, cfg)  # retry of the same batch
    assert rpt.rows_written == 0
    assert read_collection(spark, str(tmp_path), "rg").count() == 2


def test_upsert_collapses_in_batch_duplicate_ids(spark, tmp_path):
    """Review regression: upsert with the same id twice in one batch
    stores exactly ONE row (deterministic: lowest document wins)."""
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    cfg = _cfg(tmp_path, on_duplicate="upsert")
    hydrate(spark, _frame(spark, [(1, "orig", [1.0, 0.0])]), cfg)
    hydrate(
        spark,
        _frame(spark, [(1, "zz-late", [0.5, 0.5]), (1, "aa-early", [0.2, 0.8])]),
        cfg,
    )
    got = read_collection(spark, str(tmp_path), "rg").filter(F.col("id") == "1")
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0]["document"] == "aa-early"


def test_empty_batch_into_existing_collection_no_ops(spark, tmp_path):
    """Review regression: a zero-row incremental batch with dim=None
    falls back to the manifest's dimension instead of crashing."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate,
    )

    cfg = _cfg(tmp_path)
    hydrate(spark, _frame(spark, [(1, "a", [1.0, 0.0])]), cfg)
    rpt = hydrate(spark, _frame(spark, []), cfg)
    assert rpt.rows_in == 0 and rpt.rows_written == 0
    assert rpt.count_after == 1


def test_file_scheme_root_survives_upsert_swap(spark, tmp_path):
    """Review regression: a 'file:'-scheme root must resolve to the
    same local path in EVERY component — pointer files, staging dirs,
    and swaps — not just the manifest layer."""
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    cfg = _cfg(tmp_path, root=f"file:{tmp_path}", on_duplicate="upsert")
    hydrate(spark, _frame(spark, [(1, "v1", [1.0, 0.0])]), cfg)
    hydrate(spark, _frame(spark, [(1, "v2", [0.0, 1.0])]), cfg)  # swap path
    got = read_collection(spark, str(tmp_path), "rg")
    rows = {r["id"]: r["document"] for r in got.collect()}
    assert rows == {"1": "v2"}


# ---------------------------------------------------------------------------
# Step-compat front-end: the reference's literal parameter names
# (step:1 /ui; the standalone %let block, sas:21-30) drive the whole
# sas:126-193 data path through hydrate_from_step.
# ---------------------------------------------------------------------------


def test_from_step_params_literal_let_values(tmp_path):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
    )

    cfg = HydrationConfig.from_step_params(
        {
            # exact %let values from sas:21-30 (path rerooted into tmp)
            "inputTable": "PUBLIC.Topics_20240123",
            "inputTable_lib": "PUBLIC",
            "casHostPath": "sas-cas-server-default-client",
            "casHostPort": 5570,
            "persistentPath": f"sasserver:{tmp_path}",
            "collectionName": "new_collection",
            "embeddingPattern": "_Col",
            "docId": "__unique_id_",
            "textVar": "Text_Review",
            "metadataColumn": "Target_Rating",
        }
    )
    assert cfg.collection_name == "new_collection"
    assert cfg.root == str(tmp_path)  # sasserver: scheme stripped
    assert cfg.id_col == "__unique_id_"
    assert cfg.text_col == "Text_Review"
    assert cfg.metadata_col == "Target_Rating"
    assert cfg.metadata_key == "rating"  # sas:181 hard-coded key
    assert cfg.enabled


def test_from_step_params_run_trigger_and_typos(tmp_path):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
    )

    off = HydrationConfig.from_step_params(
        {
            "collectionName": "c",
            "persistentPathName": str(tmp_path),
            "_hcdc_run_trigger": "0",
        }
    )
    assert not off.enabled
    with pytest.raises(ValueError, match="unknown step parameters"):
        HydrationConfig.from_step_params(
            {"collectionName": "c", "colectionName": "typo"}
        )
    with pytest.raises(ValueError, match="collectionName"):
        HydrationConfig.from_step_params({"persistentPath": str(tmp_path)})


def test_hydrate_from_step_round_trip(spark, tmp_path):
    """sas:21-30 %let values -> hydrated collection: ids stringified
    via the double-typed CAS shape (Q2: str(1.0) == '1.0'), metadata
    under the hard-coded 'rating' key (sas:181), drop_nulls vector
    assembly (Q1, sas:162) filtered by the write-time dim guard."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate_from_step,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    wide = spark.createDataFrame(
        [
            (1.0, "great product", 5.0, 0.1, 0.2, 0.3, "x"),
            (2.0, "bad product", 1.0, 0.4, 0.5, 0.6, "y"),
        ],
        "__unique_id_ double, Text_Review string, Target_Rating double, "
        "_Col1 float, _Col2 float, _Col3 float, decoy_column string",
    )
    report = hydrate_from_step(
        spark,
        wide,
        {
            "inputTable": "PUBLIC.Topics_20240123",
            "inputTable_lib": "PUBLIC",
            "casHostPath": "sas-cas-server-default-client",
            "casHostPort": 5570,
            "persistentPath": f"sasserver:{tmp_path}",
            "collectionName": "new_collection",
            "embeddingPattern": "_Col",
            "docId": "__unique_id_",
            "textVar": "Text_Review",
            "metadataColumn": "Target_Rating",
        },
    )
    assert report.count_after == 2 == report.rows_written
    rows = {
        r["id"]: r
        for r in read_collection(spark, str(tmp_path), "new_collection").collect()
    }
    assert set(rows) == {"1.0", "2.0"}  # Q2 via double-typed ids
    assert rows["1.0"]["document"] == "great product"
    assert dict(rows["1.0"]["metadata"]) == {"rating": "5.0"}
    assert [round(v, 4) for v in rows["2.0"]["embedding"]] == [0.4, 0.5, 0.6]


def test_hydrate_from_step_disabled_trigger(spark, tmp_path):
    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        DisabledError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate_from_step,
    )

    wide = spark.createDataFrame(
        [(1.0, "t", 0.1)], "__unique_id_ double, Text_Review string, _Col1 float"
    )
    with pytest.raises(DisabledError):
        hydrate_from_step(
            spark,
            wide,
            {
                "persistentPath": f"sasserver:{tmp_path}",
                "collectionName": "c",
                "embeddingPattern": "_Col",
                "docId": "__unique_id_",
                "textVar": "Text_Review",
                "_hcdc_run_trigger": 0,
            },
        )


REFERENCE_STEP = (
    "/root/reference/Vector Databases - Hydrate Chroma DB Collection.step"
)


def test_step_file_controls_match_reference_ui():
    """parse_step_controls on the ACTUAL reference .step file must
    recover the step:1 /ui control schema: the five input-parameter
    controls, the output collectionName, and the three configuration
    controls, with the UI's required flags and the sasserver:/tmp
    path default."""
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        parse_step_controls,
    )

    if not os.path.exists(REFERENCE_STEP):
        pytest.skip("reference .step file not present")
    c = parse_step_controls(REFERENCE_STEP)
    assert set(c) == {
        "inputTable", "textVar", "docId", "embeddingPattern",
        "metadataColumn", "collectionName", "persistentPathName",
        "casHostPath", "casHostPort",
    }
    required = {k for k, v in c.items() if v["required"]}
    assert required == {
        "inputTable", "textVar", "docId", "embeddingPattern",
        "collectionName",
    }
    assert c["persistentPathName"]["default"] == "sasserver:/tmp"
    assert c["casHostPort"]["type"] == "numberfield"


def test_step_file_value_validation(tmp_path):
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        step_params_from_file,
    )

    if not os.path.exists(REFERENCE_STEP):
        pytest.skip("reference .step file not present")
    base = {
        "inputTable": "PUBLIC.Topics_20240123",
        "textVar": "Text_Review",
        "docId": "__unique_id_",
        "embeddingPattern": "_Col",
        "collectionName": "new_collection",
    }
    # unknown control id = typo guard
    with pytest.raises(ValueError, match="unknown step controls"):
        step_params_from_file(REFERENCE_STEP, {**base, "colectionName": "x"})
    # missing required control raises with the UI label
    missing = dict(base)
    del missing["embeddingPattern"]
    with pytest.raises(ValueError, match="pattern representing"):
        step_params_from_file(REFERENCE_STEP, missing)
    # numberfield coercion + rejection
    with pytest.raises(ValueError, match="numberfield"):
        step_params_from_file(REFERENCE_STEP, {**base, "casHostPort": "not-a-port"})
    p = step_params_from_file(REFERENCE_STEP, {**base, "casHostPort": "5570"})
    assert p["casHostPort"] == 5570.0
    # absent optional path control falls back to the .step placeholder
    assert p["persistentPathName"] == "sasserver:/tmp"
    # trigger passes through
    p2 = step_params_from_file(
        REFERENCE_STEP, {**base, "_hcdc_run_trigger": "0"}
    )
    assert p2["_hcdc_run_trigger"] == "0"


def test_hydrate_from_step_file_round_trip(spark, tmp_path):
    """The full product path: the reference's one-line .step file +
    a flow instance's values -> hydrated collection with the same
    Q1/Q2/'rating' semantics as hydrate_from_step."""
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate_from_step_file,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    if not os.path.exists(REFERENCE_STEP):
        pytest.skip("reference .step file not present")
    wide = spark.createDataFrame(
        [
            (1.0, "great product", 5.0, 0.1, 0.2, 0.3, "x"),
            (2.0, "bad product", 1.0, 0.4, 0.5, 0.6, "y"),
        ],
        "__unique_id_ double, Text_Review string, Target_Rating double, "
        "_Col1 float, _Col2 float, _Col3 float, decoy_column string",
    )
    report = hydrate_from_step_file(
        spark,
        wide,
        REFERENCE_STEP,
        {
            "inputTable": "PUBLIC.Topics_20240123",
            "casHostPath": "sas-cas-server-default-client",
            "casHostPort": 5570,
            "persistentPathName": f"sasserver:{tmp_path}",
            "collectionName": "new_collection",
            "embeddingPattern": "_Col",
            "docId": "__unique_id_",
            "textVar": "Text_Review",
            "metadataColumn": "Target_Rating",
        },
    )
    assert report.count_after == 2 == report.rows_written
    rows = {
        r["id"]: r
        for r in read_collection(
            spark, str(tmp_path), "new_collection"
        ).collect()
    }
    assert set(rows) == {"1.0", "2.0"}
    assert dict(rows["1.0"]["metadata"]) == {"rating": "5.0"}
    assert [round(v, 4) for v in rows["2.0"]["embedding"]] == [0.4, 0.5, 0.6]


def test_near_dup_policy_skip_and_error(spark, tmp_path):
    """Dedup-on-ingest through the hydrate front door: planted
    near-dups of already-ingested content are gated via the persisted
    band index — skipped and accounted under 'skip', typed error
    under 'error'; novel rows always land."""
    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        EngineError,
        NearDuplicateError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_build,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    base_a = (
        "the quick brown fox jumps over the lazy dog near the wide "
        "river bank while birds sing in the tall green trees"
    )
    base_b = (
        "catalyst turns declarative plans into distributed physical "
        "operators with pushdown pruning and whole stage codegen"
    )
    corpus = _frame(
        spark, [(1, base_a, [1.0, 0.0]), (2, base_b, [0.0, 1.0])]
    )
    hydrate(spark, corpus, _cfg(tmp_path, collection_name="ndp"))
    idx = str(tmp_path / "ndp" / "_bands")
    band_index_build(
        read_collection(spark, str(tmp_path), "ndp"),
        idx,
        id_col="id",
        text_col="document",
        include_shingles=True,
        source=(str(tmp_path), "ndp"),
    )

    batch = _frame(
        spark,
        [
            (101, base_a, [0.5, 0.5]),                     # verbatim near-dup
            (102, base_b.replace("codegen", "fusion"), [0.5, 0.5]),  # near-dup
            (103, "entirely novel prose about reward models and "
                  "preference data curation pipelines at scale", [0.9, 0.1]),
        ],
    )
    with pytest.raises(NearDuplicateError, match="near-duplicates"):
        hydrate(
            spark,
            batch,
            _cfg(
                tmp_path,
                collection_name="ndp",
                near_dup_index=idx,
                near_dup_policy="error",
            ),
        )

    rpt = hydrate(
        spark,
        batch,
        _cfg(
            tmp_path,
            collection_name="ndp",
            near_dup_index=idx,
            near_dup_policy="skip",
        ),
    )
    assert rpt.rows_written == 1 and rpt.rows_rejected == 2
    assert any("2 near-duplicate rows skipped" in n for n in rpt.notes)
    ids = {
        r["id"]
        for r in read_collection(spark, str(tmp_path), "ndp").select("id").collect()
    }
    assert ids == {"1", "2", "103"}

    with pytest.raises(EngineError, match="near_dup_policy"):
        hydrate(
            spark,
            _frame(spark, [(9, "x", [1.0, 0.0])]),
            _cfg(
                tmp_path,
                collection_name="ndp",
                near_dup_index=idx,
                near_dup_policy="maybe",
            ),
        )


def test_near_dup_policy_band_only_membership(spark, tmp_path):
    """A band-only index (no shingles) falls back to the conservative
    membership gate: any band hit rejects the row."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_build,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    text = (
        "structured streaming maintains watermarked state across "
        "micro batches with exactly once sinks and idempotent writes"
    )
    hydrate(
        spark,
        _frame(spark, [(1, text, [1.0, 0.0])]),
        _cfg(tmp_path, collection_name="ndb"),
    )
    idx = str(tmp_path / "ndb" / "_bands")
    band_index_build(
        read_collection(spark, str(tmp_path), "ndb"),
        idx,
        id_col="id",
        text_col="document",
    )
    rpt = hydrate(
        spark,
        _frame(
            spark,
            [
                (201, text, [0.2, 0.8]),
                (202, "novel words entirely disjoint vocabulary here "
                      "nothing shared with the ingested corpus", [0.3, 0.7]),
            ],
        ),
        _cfg(
            tmp_path, collection_name="ndb", near_dup_index=idx,
            near_dup_policy="skip",
        ),
    )
    assert rpt.rows_written == 1 and rpt.rows_rejected == 1
    assert any("band membership" in n for n in rpt.notes)


def test_semantic_dup_gate_skip_error_and_stale(spark, tmp_path):
    """Vector-side dedup-on-ingest: an incoming row whose TEXT is new
    but whose EMBEDDING duplicates a stored vector is skipped (policy
    'skip', accounted in rows_rejected + a note) or raises the typed
    SemanticDuplicateError (policy 'error'); genuinely novel vectors
    pass; a stale index (collection mutated out-of-band) refuses to
    gate with StaleIndexError rather than silently comparing against
    deleted state."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        SemanticDuplicateError,
        StaleIndexError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_build,
        ivf_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
        load_table,
    )

    from .conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    e = load_table(spark, SF_SMOKE, "embeddings")
    root = str(tmp_path)
    cfg = HydrationConfig(
        collection_name="semg",
        root=root,
        id_col="doc_id",
        text_col="text",
        embedding_col="embedding",
    )
    corpus = d.filter(F.col("doc_id") < 40)
    hydrate(spark, corpus.join(e, corpus.doc_id == e.vec_id), cfg)
    coll = read_collection(spark, root, "semg")
    assigned, C = ivf_build(coll, n_centroids=4, seed=42)
    idx = f"{root}/semg/_ivf"
    ivf_write(assigned, C, idx, metric="cosine", source=(root, "semg"),
              build={"metric": "l2", "seed": 42})

    # incoming: 100 re-encodes doc 7's stored vector under new text
    # (the text gate cannot see this); 101 carries a genuinely novel
    # vector
    stored7 = e.filter(F.col("vec_id") == 7).first()["embedding"]
    novel = e.filter(F.col("vec_id") == 101).first()["embedding"]
    inc = spark.createDataFrame(
        [
            (100, "totally different words about something else", stored7),
            (101, "more new prose entirely", novel),
        ],
        "doc_id bigint, text string, embedding array<float>",
    )
    gated = replace(
        cfg,
        semantic_dup_index=idx,
        semantic_dup_policy="skip",
        semantic_dup_threshold=0.99,
        semantic_dup_nprobe=4,  # all cells: exact
    )
    # policy 'error' first (raises BEFORE any write, so the index
    # stays fresh for the next assertion)
    with pytest.raises(SemanticDuplicateError, match="semantically"):
        hydrate(
            spark,
            spark.createDataFrame(
                [(102, "again different text", stored7)],
                "doc_id bigint, text string, embedding array<float>",
            ),
            replace(gated, semantic_dup_policy="error"),
        )

    rpt = hydrate(spark, inc, gated)
    assert rpt.rows_written == 1 and rpt.rows_rejected == 1
    assert any("semantic-duplicate" in n for n in rpt.notes)
    ids = {r["id"] for r in read_collection(spark, root, "semg").collect()}
    assert "101" in ids and "100" not in ids

    # that (gated, skip) hydrate mutated the collection, so the index
    # is now stale: gating through it must refuse loudly rather than
    # silently comparing against the pre-write corpus
    with pytest.raises(StaleIndexError, match="STALE"):
        hydrate(
            spark,
            spark.createDataFrame(
                [(103, "text", novel)],
                "doc_id bigint, text string, embedding array<float>",
            ),
            gated,
        )
