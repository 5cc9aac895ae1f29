"""Indexed late-interaction MaxSim (operators/late_interaction.py):
token-level IVF candidate generation + exact rerank must reproduce
brute-force ragged MaxSim exactly under exhaustive probing, keep
self-recall under pruned probing, and prune the token scan to the
probed cells."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.errors import (
    EngineError,
)
from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
    maxsim_score_presplit,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.late_interaction import (
    maxsim_index_build,
    maxsim_index_write,
    maxsim_search,
)


def _ragged_corpus(spark, n=120, dim=8):
    """n docs with 1 + id % 4 deterministic token vectors each."""
    tok = F.transform(
        F.sequence(F.lit(0), (F.col("id") % 4).cast("int")),
        lambda p: F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (
                F.pmod(
                    F.xxhash64(
                        F.col("id").cast("string"),
                        p.cast("string"),
                        j.cast("string"),
                    ),
                    F.lit(2000),
                )
                - 1000
            ).cast("float")
            / 1000.0,
        ),
    )
    return spark.range(n).select(
        F.col("id").cast("string").alias("id"), tok.alias("tokens")
    )


def _brute_topk(corpus, q_toks, k):
    q_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in t]) for t in q_toks]
    )
    return (
        corpus.select(
            "id",
            F.round(
                maxsim_score_presplit(F.col("tokens"), q_lit), 6
            ).alias("maxsim"),
        )
        .orderBy(F.desc("maxsim"), F.asc("id"))
        .limit(k)
    )


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = _ragged_corpus(spark).cache()
    corpus.count()
    assigned, C = maxsim_index_build(
        corpus, id_col="id", tokens_col="tokens", n_centroids=8, seed=7
    )
    idx = str(tmp_path_factory.mktemp("maxsim") / "idx")
    maxsim_index_write(assigned, C, idx, build={"seed": 7})
    return corpus, idx


def test_exhaustive_probe_matches_brute_force(spark, built):
    corpus, idx = built
    q_toks = [
        list(r)
        for r in corpus.filter(F.col("id") == "5").first()["tokens"][:2]
    ]
    st = {}
    got = maxsim_search(
        spark, idx, q_toks, k=10, nprobe=999, candidate_factor=4,
        rerank_corpus=corpus, id_col="id", tokens_col="tokens",
        score_decimals=6, stats_out=st,
    ).collect()
    want = _brute_topk(corpus, q_toks, 10).collect()
    assert [(r["id"], r["maxsim"]) for r in got] == [
        (r["id"], r["maxsim"]) for r in want
    ]
    assert st["probed_cells"] == st["n_cells"] == 8


def test_pruned_probe_keeps_self_recall_and_prunes(spark, built):
    corpus, idx = built
    # query = doc 42's full token matrix: its own tokens sit in the
    # probed cells by construction (each token probes its OWN nearest
    # centroid first), so doc 42 must come back rank 1
    q_toks = [
        list(r) for r in corpus.filter(F.col("id") == "42").first()["tokens"]
    ]
    st = {}
    rows = maxsim_search(
        spark, idx, q_toks, k=5, nprobe=1, candidate_factor=4,
        rerank_corpus=corpus, id_col="id", tokens_col="tokens",
        stats_out=st,
    ).collect()
    assert rows[0]["id"] == "42"
    # nprobe=1 with <=4 query tokens probes at most 4 of 8 cells
    assert st["probed_cells"] <= min(len(q_toks), 8) < st["n_cells"]
    assert st["candidates"] <= 20


def test_sidecar_is_a_real_ivf_index(spark, built):
    # the persisted artifact reuses the IVF lifecycle wholesale:
    # readable by ivf_read, late_interaction flag recorded, token ids
    # unique (one row per (doc, position))
    import json
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_read,
    )

    corpus, idx = built
    assigned, C, metric = ivf_read(spark, idx)
    assert metric == "cosine" and C.shape == (8, 8)
    n_tok = assigned.count()
    want_tok = corpus.select(F.sum(F.size("tokens"))).first()[0]
    assert n_tok == want_tok
    assert assigned.select("token_id").distinct().count() == n_tok
    with open(os.path.join(idx, "ivf_index.json")) as f:
        meta = json.load(f)
    assert meta["build"]["late_interaction"] is True


def test_build_rejects_separator_in_ids(spark):
    bad = spark.createDataFrame(
        [("a\x1fb", [[1.0, 0.0]])],
        "id string, tokens array<array<float>>",
    )
    with pytest.raises(EngineError, match="separator"):
        maxsim_index_build(bad, n_centroids=2)


def test_query_width_mismatch_raises(spark, built):
    corpus, idx = built
    with pytest.raises(EngineError, match="width"):
        maxsim_search(
            spark, idx, [[1.0, 0.0]], k=3, rerank_corpus=corpus
        ).collect()


def test_persisted_bucketed_rerank_matches_and_prunes(spark, built):
    """r15: stage 2 reads the PERSISTED bucketed corpus by default —
    results byte-identical to the explicit rerank_corpus path, and
    the read is a bucket-pruned point read: the rerank scan's plan
    prunes to the candidate ids' hash buckets."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.late_interaction import (
        maxsim_corpus_read,
        maxsim_corpus_write,
    )

    corpus, idx = built
    maxsim_corpus_write(
        corpus, idx, id_col="id", tokens_col="tokens", n_buckets=16
    )
    q_toks = [
        list(r)
        for r in corpus.filter(F.col("id") == "7").first()["tokens"][:2]
    ]
    st: dict = {}
    got = maxsim_search(
        spark, idx, q_toks, k=10, nprobe=999, candidate_factor=4,
        id_col="id", tokens_col="tokens", score_decimals=6,
        stats_out=st,
    ).collect()
    want = maxsim_search(
        spark, idx, q_toks, k=10, nprobe=999, candidate_factor=4,
        rerank_corpus=corpus, id_col="id", tokens_col="tokens",
        score_decimals=6,
    ).collect()
    assert [(r["id"], r["maxsim"]) for r in got] == [
        (r["id"], r["maxsim"]) for r in want
    ]
    # pruning is REAL: the candidate set's buckets < n_buckets, and
    # the rerank scan's PartitionFilters carry the bucket IN-list
    # (frozen plan shape — the point read, not a corpus scan)
    assert 0 < st["rerank_buckets_scanned"] < st["rerank_n_buckets"] == 16
    assert st["rerank_buckets_scanned"] <= st["candidates"]
    corpus_df, nb = maxsim_corpus_read(spark, idx)
    assert nb == 16
    ranked = maxsim_search(
        spark, idx, q_toks, k=10, nprobe=999, candidate_factor=4,
        id_col="id", tokens_col="tokens", score_decimals=6,
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_bucket" in plan, plan
    # and the id filter is pushed into the parquet read
    assert "PushedFilters" in plan and "id" in plan, plan


def test_persisted_corpus_missing_raises(spark, tmp_path):
    from vector_databases___hydrate_chroma_db_collection_spark.operators.late_interaction import (
        maxsim_corpus_read,
    )

    corpus = _ragged_corpus(spark, n=30)
    assigned, C = maxsim_index_build(
        corpus, id_col="id", tokens_col="tokens", n_centroids=4, seed=7
    )
    idx = str(tmp_path / "noc")
    maxsim_index_write(assigned, C, idx, build={"seed": 7})
    with pytest.raises(EngineError, match="rerank_corpus"):
        maxsim_corpus_read(spark, idx)
    q = [list(corpus.first()["tokens"][0])]
    with pytest.raises(EngineError, match="rerank_corpus"):
        maxsim_search(spark, idx, q, k=3, nprobe=4).collect()
