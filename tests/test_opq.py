"""OPQ rotation for IVF-PQ (operators/pq.py::_train_opq, r13 verdict
item 8): identical bytes/row, lower quantization error on correlated
embedding spaces, recall up through the persisted-index audit, and
exact parity with the non-OPQ path once the exact rerank runs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
    _train_opq,
    _train_subspaces,
    ivf_pq_build,
    ivf_pq_read,
    ivf_pq_recall_audit,
    ivf_pq_search,
    ivf_pq_write,
)

DIM, LATENT, N = 32, 6, 3000


def _aniso_corpus(spark, n=N, dim=DIM, latent=LATENT):
    """Rows live on a ``latent``-dim subspace mixed across all ``dim``
    coordinates (a fixed seeded mixing matrix) — the correlated
    structure real encoder outputs have and isotropic hash noise
    lacks; plain PQ's contiguous subspace split is maximally hurt,
    which is the case OPQ exists for."""
    rng = np.random.RandomState(7)
    A = rng.standard_normal((latent, dim))
    z_cols = [
        (
            (
                F.pmod(
                    F.xxhash64(F.col("id").cast("string"), F.lit(str(k))),
                    F.lit(2001),
                )
                - 1000
            ).cast("double")
            / 1000.0
        )
        for k in range(latent)
    ]
    x = F.array(
        *[
            sum(
                [z_cols[k] * float(A[k][j]) for k in range(1, latent)],
                z_cols[0] * float(A[0][j]),
            ).cast("float")
            for j in range(dim)
        ]
    )
    return spark.range(n).select(
        F.col("id").cast("string").alias("id"), x.alias("embedding")
    )


def test_opq_lowers_sample_quantization_error():
    rng = np.random.RandomState(3)
    A = rng.standard_normal((LATENT, DIM))
    R = rng.standard_normal((4096, LATENT)) @ A  # correlated residuals
    m, dsub, n_codes = 8, DIM // 8, 64

    def mse(X, books, rot=None):
        Xr = X if rot is None else X @ rot
        err = 0.0
        for j in range(m):
            sub = Xr[:, j * dsub : (j + 1) * dsub]
            c_sq = (books[j] * books[j]).sum(axis=1)
            idx = np.argmin(
                c_sq[None, :] - 2.0 * (sub @ books[j].T), axis=1
            )
            err += ((sub - books[j][idx]) ** 2).sum()
        return err / len(X)

    plain = _train_subspaces(R, m, dsub, n_codes, seed=5)
    rot, opq_books = _train_opq(R, m, dsub, n_codes, seed=5, iters=6)
    # orthogonality: rotating never changes norms
    assert np.allclose(rot @ rot.T, np.eye(DIM), atol=1e-8)
    e_plain = mse(R, plain)
    e_opq = mse(R, opq_books, rot)
    assert e_opq < e_plain * 0.9, (e_plain, e_opq)


@pytest.fixture(scope="module")
def corpora(spark):
    c = _aniso_corpus(spark).cache()
    c.count()
    return c


def test_opq_recall_up_at_identical_bytes(spark, corpora, tmp_path_factory):
    root = tmp_path_factory.mktemp("opq")
    enc_p, C_p, books_p = ivf_pq_build(
        corpora, n_centroids=8, m=8, n_codes=32, seed=42
    )
    ivf_pq_write(enc_p, C_p, books_p, str(root / "plain"))
    enc_o, C_o, books_o, rot = ivf_pq_build(
        corpora, n_centroids=8, m=8, n_codes=32, seed=42, opq=True
    )
    assert rot.shape == (DIM, DIM)
    ivf_pq_write(enc_o, C_o, books_o, str(root / "opq"), rotation=rot)
    # identical bytes/row: same m smallint codes per row both sides
    _e, _c, _b, rot_back = ivf_pq_read(
        spark, str(root / "opq"), with_rotation=True
    )
    assert np.allclose(rot_back, rot)
    kw = dict(corpus=corpora, k=10, n_queries=24, nprobe=8)
    r_plain = ivf_pq_recall_audit(
        spark, str(root / "plain"), **kw
    ).first()["mean_recall"]
    r_opq = ivf_pq_recall_audit(
        spark, str(root / "opq"), **kw
    ).first()["mean_recall"]
    # the verdict's bar: recall UP at identical bytes/row (exhaustive
    # probing, so the delta is pure quantization quality)
    assert r_opq > r_plain, (r_plain, r_opq)


def test_opq_search_parity_with_exact_rerank(spark, corpora, tmp_path_factory):
    # the rerank path must land on the exact brute-force answer from
    # OPQ codes exactly as it does from plain codes — the "parity
    # with the non-OPQ oracle path" criterion
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query,
    )

    enc_o, C_o, books_o, rot = ivf_pq_build(
        corpora, n_centroids=8, m=8, n_codes=32, seed=42, opq=True
    )
    enc_o = enc_o.localCheckpoint(eager=True)
    qvec = list(
        corpora.filter(F.col("id") == "17").first()["embedding"]
    )
    got = ivf_pq_search(
        enc_o, C_o, books_o, qvec, k=5, nprobe=8,
        rerank_corpus=corpora, embedding_col="embedding",
        rerank_factor=16, metric="cosine", score_decimals=4,
        rotation=rot,
    ).collect()
    want = knn_query(
        corpora, qvec, k=5, id_col="id", metric="cosine",
        score_decimals=4,
    ).collect()
    assert [(r["id"], r["score"]) for r in got] == [
        (r["id"], r["score"]) for r in want
    ]


def test_opq_append_and_upsert_rotate_consistently(
    spark, corpora, tmp_path_factory
):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        ivf_pq_append,
        ivf_pq_knn_join,
        ivf_pq_upsert,
    )

    root = tmp_path_factory.mktemp("opq_crud")
    base = corpora.filter(F.col("id").cast("long") < N - 50)
    enc, C, books, rot = ivf_pq_build(
        base, n_centroids=8, m=8, n_codes=32, seed=42, opq=True
    )
    idx = str(root / "idx")
    ivf_pq_write(enc, C, books, idx, rotation=rot)
    extra = corpora.filter(F.col("id").cast("long") >= N - 50)
    assert ivf_pq_append(spark, idx, extra) == 50
    # an appended row must be its own ADC nearest neighbor — only
    # true when the append rotated its residuals like the build did
    probe_id = str(N - 7)
    qvec = corpora.filter(F.col("id") == probe_id).first()["embedding"]
    enc2, C2, books2, rot2 = ivf_pq_read(spark, idx, with_rotation=True)
    q = spark.createDataFrame(
        [(probe_id, list(qvec))], "qid string, q_embedding array<float>"
    )
    top = ivf_pq_knn_join(
        q, enc2, C2, books2, k=1, nprobe=8, rotation=rot2
    ).first()
    assert top["neighbor_id"] == probe_id
    # upsert moves a held id's vector; its code must follow (rotated)
    moved = corpora.filter(F.col("id") == "5").select(
        "id", F.reverse("embedding").alias("embedding")
    )
    n_up, n_new = ivf_pq_upsert(spark, idx, moved)
    assert (n_up, n_new) == (1, 0)
    qv2 = list(moved.first()["embedding"])
    enc3, C3, books3, rot3 = ivf_pq_read(spark, idx, with_rotation=True)
    q2 = spark.createDataFrame(
        [("m", qv2)], "qid string, q_embedding array<float>"
    )
    top2 = ivf_pq_knn_join(
        q2, enc3, C3, books3, k=1, nprobe=8, rotation=rot3
    ).first()
    assert top2["neighbor_id"] == "5"
