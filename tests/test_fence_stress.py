"""Two-writer optimistic-concurrency fence (r13 verdict item 5):
interleaved writers against one source-stamped IVF index — exactly
one winner at a contested etag, the loser gets the typed retryable
``StaleIndexError``, the sidecar is never torn, and the loser's
retry through the composed front door converges. Plus kill-point
coverage inside the delete commit sequence."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.errors import (
    StaleIndexError,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
    ivf_append,
    ivf_build,
    ivf_delete,
    ivf_read,
    ivf_write,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
    HydrationConfig,
    hydrate,
)
from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
    collection_delete_indexed,
)
from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
    collection_etag,
    read_collection,
)

N = 24


def _setup(spark, tmp_path):
    root = str(tmp_path / "root")
    docs = [
        (str(i), f"doc {i}", [float((i * 7 + j) % 11) for j in range(4)])
        for i in range(N)
    ]
    cfg = HydrationConfig(
        collection_name="w", root=root, id_col="id",
        text_col="text", embedding_col="embedding",
    )
    hydrate(
        spark,
        spark.createDataFrame(
            docs, "id string, text string, embedding array<float>"
        ),
        cfg,
    )
    coll = read_collection(spark, root, "w")
    assigned, C = ivf_build(coll, n_centroids=2, seed=3)
    idx = str(tmp_path / "ivf")
    ivf_write(
        assigned, C, idx, metric="cosine", source=(root, "w"),
        build={"metric": "l2", "seed": 3, "sample_fraction": None},
    )
    return root, cfg, idx


def test_two_writer_delete_one_winner_loser_retries(spark, tmp_path):
    root, cfg, idx = _setup(spark, tmp_path)
    etag0 = collection_etag(root, "w")
    # writer A wins the race: full composed delete commits
    assert collection_delete_indexed(
        spark, root, "w", ids=["1", "2"], index_paths=[idx]
    ) == 2
    # writer B planned against etag0 — its index mutation must LOSE
    # with the typed retryable error, not half-apply
    with pytest.raises(StaleIndexError):
        ivf_delete(spark, idx, ["3"], expected_prev_etag=etag0)
    # the sidecar is not torn: readable, fence passes, B's id is NOT
    # tombstoned, A's deletes hold
    a, _, _ = ivf_read(spark, idx)
    assert a.count() == N - 2
    assert a.filter(F.col("id") == "3").count() == 1
    # B retries through the composed front door (re-observes state)
    assert collection_delete_indexed(
        spark, root, "w", ids=["3"], index_paths=[idx]
    ) == 1
    a2, _, _ = ivf_read(spark, idx)
    assert a2.count() == N - 3
    assert a2.filter(F.col("id").isin(["1", "2", "3"])).count() == 0


def test_two_writer_append_fence_loses_then_retries(spark, tmp_path):
    root, cfg, idx = _setup(spark, tmp_path)
    etag0 = collection_etag(root, "w")
    # A commits a composed delete first
    collection_delete_indexed(
        spark, root, "w", ids=["5"], index_paths=[idx]
    )
    # B: hydrate new rows (collection append moves the etag again),
    # then tries to index them pinned to the STALE etag0 — refused
    newrows = spark.createDataFrame(
        [("100", "new", [1.0] * 4)],
        "id string, text string, embedding array<float>",
    )
    hydrate(spark, newrows, cfg)
    with pytest.raises(StaleIndexError):
        ivf_append(spark, idx, newrows, expected_prev_etag=etag0)
    # index untouched by the refused append (read unfenced: the
    # collection legitimately moved past the stamp, which is exactly
    # what the refused append did NOT launder)
    a, _, _ = ivf_read(spark, idx, verify_source=False)
    assert a.filter(F.col("id") == "100").count() == 0
    # retry pinned to the etag B NOW observes converges
    assert ivf_append(spark, idx, newrows) == 1
    a2, _, _ = ivf_read(spark, idx)
    assert a2.filter(F.col("id") == "100").count() == 1
    assert a2.count() == N  # 24 - 1 deleted + 1 appended


def test_delete_kill_point_before_sidecar_swap_replays(
    spark, tmp_path, monkeypatch
):
    # crash INSIDE ivf_delete after the tombstone recording lands but
    # before the atomic sidecar swap: readers keep the old complete
    # index; the replay re-runs the whole delete and converges; the
    # orphan recording dir is GC'd by the replay's commit.
    import sys

    root, cfg, idx = _setup(spark, tmp_path)
    ann = sys.modules[
        "vector_databases___hydrate_chroma_db_collection_spark.operators.ann"
    ]
    real = ann._atomic_sidecar_write
    calls = {"n": 0}

    def boom(p, fname, meta):
        calls["n"] += 1
        raise RuntimeError("injected crash before sidecar swap")

    monkeypatch.setattr(ann, "_atomic_sidecar_write", boom)
    with pytest.raises(RuntimeError, match="injected"):
        ivf_delete(spark, idx, ["4"])
    monkeypatch.setattr(ann, "_atomic_sidecar_write", real)
    assert calls["n"] == 1
    # old sidecar intact: id 4 still served (the delete never commits)
    a, _, _ = ivf_read(spark, idx)
    assert a.filter(F.col("id") == "4").count() == 1
    orphans = [
        d for d in os.listdir(idx) if d.startswith("ivf_tombstones_v")
    ]
    assert orphans, "the crashed attempt should have left a recording"
    # replay converges and GC's every superseded/orphan recording
    assert ivf_delete(spark, idx, ["4"]) == 1
    a2, _, _ = ivf_read(spark, idx)
    assert a2.filter(F.col("id") == "4").count() == 0
    with open(os.path.join(idx, "ivf_index.json")) as f:
        meta = json.load(f)
    kept = meta["tombstones"]["location"]
    leftover = [
        d
        for d in os.listdir(idx)
        if d.startswith("ivf_tombstones_v") and d != kept
    ]
    assert leftover == []
