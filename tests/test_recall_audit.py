"""Sampled ground-truth recall audits for persisted ANN indexes.

The geometry audits (``ivf_balance_audit`` occupancy/drift,
``ivf_pq_balance_audit`` reconstruction saturation) measure proxies;
these tests pin the DIRECT measure — index top-k at serving nprobe vs
exhaustive ground truth — and, for IVF-PQ, construct the exact drift
the saturation signal is blind to (appended residuals that RECONSTRUCT
inside the trained codebook hull), proving the recall audit sees what
the geometry audit can't.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from vector_databases___hydrate_chroma_db_collection_spark.operators import ann, pq

DIM = 16


def _original_rows():
    """4 tight clusters of 30 rows each around the scaled basis
    centroids e_c * 10; members are separated on a radius-0.1 circle
    in dims (4, 5), so every row's true top-5 neighbors are its own
    cluster and ALL residual norms are ~equal (the circle is what
    keeps PQ reconstruction saturation flat under drift)."""
    rows = []
    for i in range(120):
        c, j = divmod(i, 30)
        v = [0.0] * DIM
        v[c] = 10.0
        theta = 2.0 * math.pi * j / 30.0
        v[4] += 0.1 * math.cos(theta)
        v[5] += 0.1 * math.sin(theta)
        rows.append((i, v))
    return rows


def _drifted_rows():
    """120 rows clustered at the MIDPOINT of centroids 0 and 1 — far
    from every trained centroid (l2 ~7.07 to the nearest two) — with a
    ±0.001 parity bump on dim 0/1 deciding which of the two cells each
    row assigns to, and an id-linear dim-4 offset making the true
    nearest neighbors the ADJACENT ids (alternating parity, so they
    alternate CELLS): at nprobe=1 the probed cell holds only the
    same-parity half of every row's true top-5."""
    rows = []
    for i in range(120):
        v = [0.0] * DIM
        v[0], v[1] = 5.0, 5.0
        v[i % 2] += 0.001
        v[4] = 1.0 + i * 0.05
        rows.append((200 + i, v))
    return rows


def _mk_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_ivf_recall_audit_fresh_perfect_then_drift_flips(spark, tmp_path):
    """Fresh clustered index at nprobe=1: recall 1.0, no flag. After a
    drifted append whose true neighbor lists straddle two cells: every
    drifted query reads exactly 3/5 (self + the two same-parity
    neighbors), mean recall 0.8, flag flips. Exhaustive nprobe stays
    at 1.0 — the loss is pure candidate selection, by construction."""
    corpus = _mk_df(spark, _original_rows())
    C = np.eye(4, DIM) * 10.0
    assigned = ann._assign_to_centroids(
        corpus, C, id_col="vec_id", embedding_col="embedding", metric="l2"
    )
    path = str(tmp_path / "ivf_recall")
    ann.ivf_write(
        assigned, C, path, metric="l2", build={"metric": "l2", "seed": 42}
    )

    fresh = ann.ivf_recall_audit(
        spark, path, k=5, n_queries=200, nprobe=1, recall_threshold=0.9
    ).collect()
    assert len(fresh) == 120
    assert all(r["recall_at_k"] == 1.0 for r in fresh)
    assert all(r["mean_recall"] == 1.0 for r in fresh)
    assert not any(r["refresh_recommended"] for r in fresh)
    assert all(r["k_eff"] == 5 for r in fresh)

    assert ann.ivf_append(spark, path, _mk_df(spark, _drifted_rows())) == 120

    after = {
        r["qid"]: r
        for r in ann.ivf_recall_audit(
            spark, path, k=5, n_queries=300, nprobe=1, recall_threshold=0.9
        ).collect()
    }
    assert len(after) == 240
    originals = [r for q, r in after.items() if q < 200]
    drifted = [r for q, r in after.items() if q >= 200]
    assert all(r["recall_at_k"] == 1.0 for r in originals)
    # interior drifted queries find self + the two same-parity
    # neighbors (3/5); the two one-past-the-edge ids (201, 318) have
    # asymmetric true neighborhoods and find only 2/5
    assert sorted(r["recall_at_k"] for r in drifted) == [0.4, 0.4] + [
        0.6
    ] * 118
    mean = next(iter(after.values()))["mean_recall"]
    assert mean == round((120 * 1.0 + 118 * 0.6 + 2 * 0.4) / 240, 4)
    assert all(r["refresh_recommended"] for r in after.values())

    # exhaustive probing (nprobe = n_centroids) is exact even on the
    # drifted index: the audit measures pruning loss, nothing else
    full = ann.ivf_recall_audit(
        spark, path, k=5, n_queries=300, nprobe=4, recall_threshold=0.9
    ).collect()
    assert all(r["recall_at_k"] == 1.0 for r in full)
    assert not any(r["refresh_recommended"] for r in full)


def test_ivf_recall_audit_sampling_is_deterministic(spark, tmp_path):
    """n_queries below the corpus size draws the SAME md5-ranked query
    set every run (corpus-order-free), and k_eff caps at the true
    neighbor count when k exceeds the corpus."""
    corpus = _mk_df(spark, _original_rows()[:8])
    C = np.eye(4, DIM) * 10.0
    assigned = ann._assign_to_centroids(
        corpus, C, id_col="vec_id", embedding_col="embedding", metric="l2"
    )
    path = str(tmp_path / "ivf_sample")
    ann.ivf_write(
        assigned, C, path, metric="l2", build={"metric": "l2", "seed": 42}
    )
    a = ann.ivf_recall_audit(spark, path, k=20, n_queries=3, nprobe=4)
    b = ann.ivf_recall_audit(spark, path, k=20, n_queries=3, nprobe=4)
    ra, rb = (sorted(x.collect(), key=lambda r: r["qid"]) for x in (a, b))
    assert [r["qid"] for r in ra] == [r["qid"] for r in rb]
    assert len(ra) == 3
    # 8 rows total: k_eff is the true neighbor count, recall undeflated
    assert all(r["k_eff"] == 8 for r in ra)
    assert all(r["recall_at_k"] == 1.0 for r in ra)


def test_ivf_pq_recall_audit_sees_drift_saturation_cannot(spark, tmp_path):
    """THE case the recall audit exists for: append drift whose
    residuals RECONSTRUCT inside the trained codebook hull. The
    drifted rows sit ~7 l2 away from every trained centroid, but their
    codes decode to hull entries whose norms match the trained
    baseline (the originals' residuals all lie on a radius-0.1
    circle), so ``ivf_pq_balance_audit`` reads near-1.0x saturation
    and stays silent — while served recall craters and
    ``ivf_pq_recall_audit`` flips."""
    corpus = _mk_df(spark, _original_rows())
    enc, C, books = pq.ivf_pq_build(
        corpus,
        id_col="vec_id",
        embedding_col="embedding",
        n_centroids=4,
        m=4,
        n_codes=16,
        seed=7,
    )
    path = str(tmp_path / "pq_recall")
    pq.ivf_pq_write(enc, C, books, path)

    fresh = pq.ivf_pq_recall_audit(
        spark,
        path,
        corpus=corpus,
        id_col="vec_id",
        embedding_col="embedding",
        k=5,
        n_queries=200,
        nprobe=1,
        recall_threshold=0.7,
    ).collect()
    assert len(fresh) == 120
    fresh_mean = fresh[0]["mean_recall"]
    assert fresh_mean >= 0.7  # quantization-limited, not perfect
    assert not any(r["refresh_recommended"] for r in fresh)

    drifted_df = _mk_df(spark, _drifted_rows())
    assert (
        pq.ivf_pq_append(
            spark, path, drifted_df, id_col="vec_id",
            embedding_col="embedding",
        )
        == 120
    )
    full = corpus.unionByName(drifted_df)

    after = pq.ivf_pq_recall_audit(
        spark,
        path,
        corpus=full,
        id_col="vec_id",
        embedding_col="embedding",
        k=5,
        n_queries=300,
        nprobe=1,
        recall_threshold=0.7,
    ).collect()
    assert len(after) == 240
    after_mean = after[0]["mean_recall"]
    assert after_mean < fresh_mean - 0.2  # recall cratered
    assert all(r["refresh_recommended"] for r in after)
    drifted_recalls = [r["recall_at_k"] for r in after if r["qid"] >= 200]
    assert sum(drifted_recalls) / len(drifted_recalls) < 0.3

    # the saturation audit is BLIND to this drift: reconstructed
    # residual norms sit on the trained circle, ratio ~1.0x, no flag
    sat = pq.ivf_pq_balance_audit(spark, path).collect()
    assert not any(r["refresh_recommended"] for r in sat)


def test_ivf_pq_recall_audit_requires_ground_truth_source(spark, tmp_path):
    """Codes alone cannot provide ground truth: an unstamped index
    with no corpus passed is a typed refusal, not a silent guess."""
    corpus = _mk_df(spark, _original_rows()[:40])
    enc, C, books = pq.ivf_pq_build(
        corpus,
        id_col="vec_id",
        embedding_col="embedding",
        n_centroids=2,
        m=4,
        n_codes=8,
    )
    path = str(tmp_path / "pq_nosrc")
    pq.ivf_pq_write(enc, C, books, path)
    with pytest.raises(ValueError, match="ground-truth recall"):
        pq.ivf_pq_recall_audit(spark, path)
