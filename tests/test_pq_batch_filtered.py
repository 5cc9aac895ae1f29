"""Batch filtered serving through the compressed index
(plans/chroma_api.py::collection_query_batch_ivf_pq): per-query
k-fill under cell-killing predicates, exactness when rerank_factor
covers the filtered slice, and the exact-batch output contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
    HydrationConfig,
    hydrate,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
    ivf_pq_build,
    ivf_pq_write,
)
from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
    collection_query_batch,
    collection_query_batch_ivf_pq,
)
from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
    read_collection,
)


@pytest.fixture(scope="module")
def pq_setup(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bfpq")
    root = str(tmp / "root")
    # two well-separated clusters so cells correlate with the
    # metadata — the classic filtered-ANN failure shape: the 'rare'
    # docs live in cluster B, a query near cluster A with the rare
    # filter must expand its probe to find them
    rows = []
    for i in range(24):
        base = [10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        rows.append((str(i), f"doc {i}", "common",
                     [base[j] + 0.01 * i * ((j % 3) + 1) for j in range(8)]))
    for i in range(24, 30):
        base = [0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        rows.append((str(i), f"doc {i}", "rare",
                     [base[j] + 0.01 * i * ((j % 3) + 1) for j in range(8)]))
    df = spark.createDataFrame(
        rows, "id string, text string, kind string, embedding array<float>"
    )
    hydrate(
        spark, df,
        HydrationConfig(
            collection_name="c", root=root, id_col="id",
            text_col="text", embedding_col="embedding",
            metadata_col="kind",
        ),
    )
    coll = read_collection(spark, root, "c")
    enc, C, books = ivf_pq_build(coll, n_centroids=2, m=4, n_codes=8, seed=1)
    idx = str(tmp / "pq")
    ivf_pq_write(enc, C, books, idx, source=(root, "c"))
    return root, idx


def test_batch_pq_kfill_and_exactness(spark, pq_setup):
    root, idx = pq_setup
    # query vectors near cluster A; the 'rare' filter kills the
    # probed cell at nprobe=1, so the per-query expansion must walk
    # to the other cell — and with rerank_factor covering the whole
    # rare slice the result equals the exact filtered batch path
    qvecs = [[9.5, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
             [10.5, -0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]]
    got = collection_query_batch_ivf_pq(
        spark, root, "c", qvecs, n_results=4, index_path=idx,
        nprobe=1, where={"kind": "rare"}, rerank_factor=8,
        score_decimals=4,
    ).select("qid", "rank", "id", "score").collect()
    want = collection_query_batch(
        spark, root, "c", qvecs, n_results=4,
        where={"kind": "rare"}, score_decimals=4,
    ).select("qid", "rank", "id", "score").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 8  # both queries filled to k=4


def test_batch_pq_exhaustion_floor(spark, pq_setup):
    root, idx = pq_setup
    # over-ask: only 6 'rare' docs exist — every query exhausts the
    # probe and returns exactly the filtered slice, fully ranked
    got = collection_query_batch_ivf_pq(
        spark, root, "c",
        [[9.5, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]],
        n_results=50, index_path=idx, nprobe=1,
        where={"kind": "rare"}, rerank_factor=10, score_decimals=4,
    )
    rows = got.collect()
    assert len(rows) == 6
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5, 6]
    assert {r["id"] for r in rows} == {str(i) for i in range(24, 30)}


def test_batch_pq_include_distance(spark, pq_setup):
    root, idx = pq_setup
    out = collection_query_batch_ivf_pq(
        spark, root, "c",
        [[9.5, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]],
        n_results=2, index_path=idx, nprobe=2,
        rerank_factor=8, score_decimals=4, include_distance=True,
    )
    r = out.collect()
    assert out.columns == ["qid", "rank", "id", "document", "metadata", "score", "distance"]
    for row in r:
        # cosine: distance = 1 - unrounded similarity (close to score)
        assert row["distance"] == pytest.approx(1.0 - row["score"], abs=1e-3)


def test_expansion_stats_all_four_serving_paths(spark, pq_setup, tmp_path):
    """stats_out pins the k-fill doubling contract on every serving
    path: a cell-killing predicate walks the probe to exhaustion in
    exactly 1 + log2(n_cells/nprobe) rounds (here 2 cells, nprobe=1
    -> 2 rounds, final_probe == n_cells), while an unfiltered query
    that fills immediately stops after one round."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_build,
        ivf_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.chroma_api import (
        collection_query_batch_ivf,
        collection_query_ivf,
        collection_query_ivf_pq,
    )

    root, idx = pq_setup
    coll = read_collection(spark, root, "c")
    assigned, C = ivf_build(coll, n_centroids=2, seed=1)
    ividx = str(tmp_path / "ivf")
    ivf_write(assigned, C, ividx, metric="cosine", source=(root, "c"))
    qv = [9.5, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]

    # single IVF: rare filter kills the near cell -> exhaustion in 2
    st: dict = {}
    got = collection_query_ivf(
        spark, root, "c", qv, n_results=4, index_path=ividx,
        nprobe=1, where={"kind": "rare"}, stats_out=st,
    ).collect()
    assert len(got) == 4
    assert st == {"rounds": 2, "final_probe": 2, "n_cells": 2}
    # ... and an unfiltered fill settles in ONE round at nprobe=1
    st1: dict = {}
    collection_query_ivf(
        spark, root, "c", qv, n_results=4, index_path=ividx,
        nprobe=1, stats_out=st1,
    ).collect()
    assert st1["rounds"] == 1 and st1["final_probe"] == 1

    # batch IVF: zero-match predicate -> exhaustion, empty, 2 rounds
    st2: dict = {}
    empty = collection_query_batch_ivf(
        spark, root, "c", [qv, qv], n_results=4, index_path=ividx,
        nprobe=1, where={"kind": "no-such"}, stats_out=st2,
    ).collect()
    assert empty == []
    assert st2 == {"rounds": 2, "final_probe": 2, "n_cells": 2}

    # single PQ: rare filter -> exhaustion in 2
    st3: dict = {}
    got3 = collection_query_ivf_pq(
        spark, root, "c", qv, n_results=4, index_path=idx,
        nprobe=1, where={"kind": "rare"}, rerank_factor=8,
        stats_out=st3,
    ).collect()
    assert len(got3) == 4
    assert st3 == {"rounds": 2, "final_probe": 2, "n_cells": 2}

    # batch PQ: rare filter -> per-query expansion, stats recorded
    st4: dict = {}
    got4 = collection_query_batch_ivf_pq(
        spark, root, "c", [qv], n_results=4, index_path=idx,
        nprobe=1, where={"kind": "rare"}, rerank_factor=8,
        stats_out=st4,
    ).collect()
    assert len(got4) == 4
    assert st4 == {"rounds": 2, "final_probe": 2, "n_cells": 2}
