"""k-nearest-neighbor search over an embedding column.

The reference hydrates Chroma precisely so that someone else can run
similarity queries (reference README.md:5); the step itself never
implements one. Here search is a first-class distributed operator:

- ``knn_query``: one query vector vs the corpus. The vector ships as
  a literal array expression, so the plan is scan -> distance expr ->
  ``TakeOrderedAndProject`` (Spark's physical top-k): no shuffle of
  corpus rows, only k rows per partition reach the driver-side merge.
  This is the plan that survives 100 TB — cost is one pass over the
  corpus partitioned arbitrarily.

- ``knn_join``: a query *set* vs the corpus, expression form. The
  query side is broadcast; scoring happens corpus-partition-locally
  inside codegen; a two-level aggregation (per (query, partition)
  top-k, then per query merge) reduces the data before the final
  shuffle. Exact, no Python — but the broadcast-nested-loop scoring
  shuffles list buffers at level 1, so it is the *small-query-set*
  path.

- ``knn_join_gemm``: the scale path. Queries are collected to a
  (small) numpy matrix, corpus partitions stream through
  ``mapInPandas`` where scores are one BLAS matrix multiply per Arrow
  batch and a running per-query top-k is folded across the partition.
  Each partition emits at most |Q| * (k + slack) candidate rows, so
  the only shuffle moves O(P * |Q| * k) rows regardless of corpus
  size. This is how a 100 TB corpus meets a 10k-query batch. Query
  sides past ``max_driver_queries`` never touch the driver: a bounded
  probe detects them and the join auto-dispatches to the fully
  distributed ``ivf_knn_join`` with every cell probed (exact).

- approximate variants (LSH / IVF) live in ``ann.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
)

METRICS = ("cosine", "l2", "dot")


def _score(metric: str, a: Column, b: Column) -> tuple[Column, bool]:
    """Returns (score column, ascending?) — cosine/dot rank descending
    (similarity), l2 ascending (distance)."""
    if metric == "cosine":
        return cosine_similarity(a, b), False
    if metric == "l2":
        return l2_distance(a, b), True
    if metric == "dot":
        return dot_product(a, b), False
    raise ValueError(f"metric must be one of {METRICS}")


def _score_vs_literal(
    metric: str, a: Column, query_vector: list[float]
) -> tuple[Column, bool]:
    """``_score`` for the serve path where the query side is a
    driver-known list. r15 history: this briefly returned the
    statically UNROLLED per-dimension expressions
    (functions/vector.py *_literal) on the theory that the
    zip_with/aggregate chain's interpreted lambda was behind bimodal
    1M-row serve CPU. Re-measured on an idle host after the driver
    BLAS pin: the unrolled form is the SLOWER one at every scale —
    1M x 64 cosine scan 36-38 cpu-s unrolled vs 12.5-14.5 HOF, sf0.1
    top-k 0.9-1.3 vs 0.5-0.7 — the 64 try_element_at calls each
    re-null-check and re-bounds-check the array, while the aggregate
    walks it once; the old "bimodal" spikes reproduce on FIRST
    executions of any fresh plan (JIT/allocation storms, absorbed by
    bench warmups) and were misattributed to the HOF. The unrolled
    forms remain in functions/vector.py for callers that measured
    real wins (MaxSim stage-1 token cosines at dim 16). Fold order is
    bit-identical either way, so the flip cannot move an oracle
    hash."""
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    return _score(metric, a, q)


def knn_query(
    corpus: DataFrame,
    query_vector: list[float],
    k: int = 5,
    *,
    id_col: str = "id",
    embedding_col: str = "embedding",
    metric: str = "cosine",
    score_decimals: int | None = None,
) -> DataFrame:
    """Top-k rows of ``corpus`` nearest to ``query_vector``.

    Plan shape: Scan -> Project(distance expr) -> TakeOrderedAndProject.
    The query vector is a literal; no join, no shuffle. The distance
    expression is the ``zip_with``/``aggregate`` HOF form
    (``_score_vs_literal``): the r15 per-dimension unroll re-measured
    SLOWER at serve dims (64 ``try_element_at`` terms re-null/bounds-
    check per term; the fold walks the array once) and was reverted —
    the unrolled forms survive only where re-measured wins exist
    (dim-16 MaxSim stage-1, 2-word Hamming; functions/vector.py).
    """
    score, asc = _score_vs_literal(metric, F.col(embedding_col), query_vector)
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    scored = corpus.withColumn("score", score)
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(id_col).asc()]
    return scored.orderBy(*order).limit(k).select(id_col, "score")


def pack_sign_bits(vec: list[float]) -> list[int]:
    """Driver-side twin of ``functions.vector.binary_quantize`` for a
    literal query vector: 32-bit words, Horner-packed sign bits —
    bit-identical to the expression form so a packed query literal
    joins the packed corpus column."""
    words = []
    for w in range(0, (len(vec) + 31) // 32):
        acc = 0
        for b in range(32):
            i = w * 32 + b
            acc = acc * 2 + (1 if i < len(vec) and vec[i] > 0 else 0)
        words.append(acc)
    return words


def knn_query_binary(
    corpus: DataFrame,
    query_vector: list[float],
    k: int = 5,
    *,
    id_col: str = "id",
    embedding_col: str = "embedding",
    prescreen_factor: int = 8,
    metric: str = "cosine",
    score_decimals: int | None = None,
    bits_col: str | None = None,
) -> DataFrame:
    """Top-k via BINARY PRESCREEN + exact rerank: Hamming distance on
    1-bit sign-quantized vectors (``binary_quantize`` /
    ``hamming_distance`` — xor+popcount per 32-bit word, pure
    codegen) selects ``k * prescreen_factor`` candidates, and only
    those get the full float distance. At 100 TB the packed column is
    what scans (16-32x less I/O than float32); the Hamming/angle
    relationship is the SimHash bound (Charikar 2002), so high-cosine
    neighbors survive the prescreen with overwhelming probability —
    recall vs exact top-k is asserted in tests, and both stages are
    deterministic (distance, then id, ascending), so the whole
    operator is SQL-oracle-checkable.

    Plan shape (LATE MATERIALIZATION, r15): Scan ->
    Project(pack+popcount) -> TakeOrderedAndProject(k*factor) over
    NARROW (id, hamming) rows, then a broadcast self-join fetches the
    k*factor float vectors for the exact rerank. Carrying the float
    column through the top-k heap costs ~25x the whole prescreen
    (every scanned row materializes its array into the heap's row
    copy before the bound check — measured 42 vs 1.6 cpu-s on a 1M
    corpus, BASELINE.md r15); at 100 TB the narrow heap is also the
    only shape that works — the rerank join is a k*factor-row point
    read, not a corpus-wide payload carry.

    ``bits_col``: name of a PRE-PACKED ``binary_quantize`` column
    when the corpus carries one (the production layout — pack once at
    ingest, scan 2 words instead of re-quantizing 64 floats per
    query). Defaults to quantizing ``embedding_col`` inline, which
    keeps the operator self-contained on raw corpora."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        binary_quantize,
        hamming_distance_literal,
    )

    if k < 1 or prescreen_factor < 1:
        raise ValueError("k and prescreen_factor must be >= 1")
    bits = (
        F.col(bits_col) if bits_col is not None else binary_quantize(embedding_col)
    )
    ham = hamming_distance_literal(bits, pack_sign_bits(query_vector))
    cand_ids = (
        corpus.select(id_col, ham.alias("hamming"))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(k * prescreen_factor)
        .select(id_col)
    )
    cand = corpus.join(F.broadcast(cand_ids), id_col, "inner")
    score, asc = _score_vs_literal(metric, F.col(embedding_col), query_vector)
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    scored = cand.withColumn("score", score)
    order = [
        F.col("score").asc() if asc else F.col("score").desc(),
        F.col(id_col).asc(),
    ]
    return scored.orderBy(*order).limit(k).select(id_col, "score")


def knn_query_matryoshka(
    corpus: DataFrame,
    query_vector: list[float],
    k: int = 5,
    *,
    id_col: str = "id",
    embedding_col: str = "embedding",
    prefix_dim: int = 16,
    prescreen_factor: int = 8,
    metric: str = "cosine",
    score_decimals: int | None = None,
    prescreen_decimals: int | None = 4,
) -> DataFrame:
    """Top-k via MATRYOSHKA (truncated-dimension) prescreen + full
    rerank: score the FIRST ``prefix_dim`` dimensions only (MRL,
    Kusupati et al. 2022 — Matryoshka-trained embeddings pack coarse
    semantics into the prefix, so a 16-of-768 slice preserves
    neighborhood structure), keep ``k * prescreen_factor``
    candidates, then rerank the survivors with the full vector. The
    complement of ``knn_query_binary``: that shrinks BYTES PER
    DIMENSION (1 bit), this shrinks DIMENSIONS — at 100 TB the
    prefix can live as its own thin column so the prescreen scan
    reads prefix_dim/dim of the data, and the two compose (binary
    prefix). Both stages are deterministic ((score, id) ordering), so
    the whole operator is SQL-oracle-checkable.

    Plan shape (LATE MATERIALIZATION, r15 — see knn_query_binary):
    Scan -> Project(prefix distance) -> TakeOrderedAndProject
    (k*factor) over narrow (id, _pre) rows -> broadcast self-join ->
    Project(full distance) -> TakeOrderedAndProject(k)."""
    if k < 1 or prescreen_factor < 1 or prefix_dim < 1:
        raise ValueError("k, prescreen_factor and prefix_dim must be >= 1")
    if prefix_dim > len(query_vector):
        raise ValueError(
            f"prefix_dim {prefix_dim} exceeds query dim {len(query_vector)}"
        )
    pre_score, pre_asc = _score_vs_literal(
        metric,
        F.slice(F.col(embedding_col), 1, prefix_dim),
        list(query_vector[:prefix_dim]),
    )
    if prescreen_decimals is not None:
        # The candidate CUT must be engine-portable: rounding the
        # prescreen score before ordering removes last-ulp summation
        # differences at the top-(k*factor) boundary vs a SQL oracle.
        pre_score = F.round(pre_score, prescreen_decimals)
    cand_ids = (
        corpus.select(id_col, pre_score.alias("_pre"))
        .orderBy(
            F.col("_pre").asc() if pre_asc else F.col("_pre").desc(),
            F.col(id_col).asc(),
        )
        .limit(k * prescreen_factor)
        .select(id_col)
    )
    cand = corpus.join(F.broadcast(cand_ids), id_col, "inner")
    score, asc = _score_vs_literal(metric, F.col(embedding_col), query_vector)
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    scored = cand.withColumn("score", score)
    order = [
        F.col("score").asc() if asc else F.col("score").desc(),
        F.col(id_col).asc(),
    ]
    return scored.orderBy(*order).limit(k).select(id_col, "score")


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    query_id_col: str = "qid",
    query_embedding_col: str = "q_embedding",
    corpus_id_col: str = "id",
    corpus_embedding_col: str = "embedding",
    metric: str = "cosine",
    score_decimals: int | None = None,
    include_raw_score: bool = False,
) -> DataFrame:
    """For each query row, the k nearest corpus rows.

    Broadcast the (small) query side, score corpus-locally inside
    codegen, then reduce with a two-level top-k aggregation keyed by
    (qid, scan partition id) so the final per-query merge sees at
    most k candidates per partition. Exact and UDF-free; for large
    query batches or very high dimensions prefer ``knn_join_gemm``.
    Output: one row per (qid, neighbor) with rank 1..k; with
    ``include_raw_score`` an extra ``raw_score`` column carries the
    UNROUNDED score even when ``score_decimals`` rounds ``score`` —
    ranking stays on the rounded value, so callers that derive a
    secondary measure (e.g. Chroma's ``distance``) from the raw score
    keep the same rank order as the rounded contract.
    """
    raw_score, asc = _score(
        metric, F.col(corpus_embedding_col), F.col(query_embedding_col)
    )
    score = (
        F.round(raw_score, score_decimals)
        if score_decimals is not None
        else raw_score
    )
    # Orderable key: ascending sort always; negate descending metrics.
    sort_key = score if asc else -score

    # raw_score widens every candidate struct through BOTH top-k
    # aggregation levels — carry it only when the caller asked.
    pair_cols = [
        F.col(query_id_col).alias("qid"),
        F.col(corpus_id_col).alias("neighbor_id"),
        score.alias("score"),
        sort_key.alias("_key"),
        F.spark_partition_id().alias("_pid"),
    ]
    struct_fields = ["_key", "neighbor_id", "score"]
    if include_raw_score:
        pair_cols.insert(3, raw_score.alias("raw_score"))
        struct_fields.append("raw_score")
    pairs = corpus.join(F.broadcast(queries)).select(*pair_cols)
    # Level 1: top-k per (query, corpus-partition). Each (qid, pid)
    # group lives entirely in one scan partition, so the partial hash
    # agg collapses it locally; only aggregated buffers shuffle.
    local = pairs.groupBy("qid", "_pid").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct(*struct_fields))),
            1,
            k,
        ).alias("nn")
    )
    # Level 2: merge partition-local top-k lists; shuffle carries only
    # O(|Q| * k * P) candidate rows.
    out_cols = [
        "qid",
        F.col("nn.neighbor_id").alias("neighbor_id"),
        F.col("nn.score").alias("score"),
        (F.col("rank0") + 1).alias("rank"),
    ]
    if include_raw_score:
        out_cols.append(F.col("nn.raw_score").alias("raw_score"))
    topk = (
        local.select("qid", F.explode("nn").alias("nn"))
        .groupBy("qid")
        .agg(F.slice(F.array_sort(F.collect_list("nn")), 1, k).alias("nn"))
        .select("qid", F.posexplode("nn").alias("rank0", "nn"))
        .select(*out_cols)
    )
    return topk


def knn_join_gemm(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    query_id_col: str = "qid",
    query_embedding_col: str = "q_embedding",
    corpus_id_col: str = "id",
    corpus_embedding_col: str = "embedding",
    metric: str = "cosine",
    score_decimals: int | None = None,
    slack: int = 32,
    query_block_size: int = 4096,
    max_driver_queries: int = 65_536,
) -> DataFrame:
    """kNN join via Arrow-batched numpy GEMM (see module docstring).

    The query side is materialized on the driver in BLOCKS of
    ``query_block_size`` rows (streamed via ``toLocalIterator`` — the
    driver never holds more than one partition of raw rows; each block
    is kept only as a compact float64 matrix). ALL blocks score inside
    ONE ``mapInPandas`` corpus pass — per Arrow batch the scorer loops
    the block list, so executor memory is bounded by a single (arrow
    batch x block) score matrix plus the blocks' (k + slack) x block
    candidate buffers regardless of total query count, and the corpus
    is read once however many blocks there are (a per-block pass
    design would rescan it |blocks| times). A 100k+ query batch
    (offline retrieval eval) runs where the round-1 single-collect
    form concentrated the whole (batch x |Q|) score matrix in every
    task; blocks share one final per-qid merge.

    All arithmetic is float64 so scores match a double-precision
    oracle up to summation order. Partition-local selection keeps
    ``k + slack`` candidates per query (raw score order); the final
    merge ranks by (rounded score, neighbor id) for deterministic,
    oracle-matching output.

    Query sets LARGER than ``max_driver_queries`` never touch the
    driver: a bounded ``limit(max+1).count()`` probe detects them and
    the join dispatches to the fully distributed ``ivf_knn_join`` with
    every cell probed — exhaustive, so results keep this operator's
    exact contract (same candidate pool, same ``rank_merge``) while
    both sides stay executor-resident. Callers who want real IVF
    pruning at that scale should call ``ivf_knn_join`` directly with a
    finite ``nprobe``. This mirrors ``embedding_neardup_pairs_gemm``'s
    broadcast-cap auto-dispatch (operators/dedup.py).
    """
    import numpy as np

    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}")

    # Bounded probe: limit() pushes down, so the scan stops as soon as
    # max_driver_queries + 1 rows exist — never a full count of a huge
    # query side.
    probe = queries.limit(max_driver_queries + 1).count()
    if probe > max_driver_queries:
        from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
            ivf_build,
            ivf_knn_join,
        )

        n = corpus.count()
        n_centroids = int(min(4096, max(4, n // 1024)))
        assigned, C = ivf_build(
            corpus,
            id_col=corpus_id_col,
            embedding_col=corpus_embedding_col,
            n_centroids=n_centroids,
            metric="cosine" if metric == "cosine" else "l2",
            n_rows=n,  # reuse the sizing count — no second corpus scan
        )
        return ivf_knn_join(
            queries,
            assigned,
            C,
            k,
            query_id_col=query_id_col,
            query_embedding_col=query_embedding_col,
            id_col=corpus_id_col,
            embedding_col=corpus_embedding_col,
            metric=metric,
            nprobe=C.shape[0],  # all cells -> exhaustive, exact
            score_decimals=score_decimals,
            slack=slack,
        )

    # Stream the query side into per-block compact matrices: the
    # driver's transient footprint is one Spark partition of Row
    # objects; retained state is float64 matrices (~0.5 MB per 1k
    # queries at dim 64).
    blocks: list[tuple[list, "np.ndarray"]] = []
    buf: list = []
    for r in queries.select(query_id_col, query_embedding_col).toLocalIterator():
        buf.append(r)
        if len(buf) == query_block_size:
            blocks.append(
                ([x[0] for x in buf], np.asarray([list(x[1]) for x in buf], float))
            )
            buf = []
    if buf:
        blocks.append(
            ([x[0] for x in buf], np.asarray([list(x[1]) for x in buf], float))
        )
    id_field = corpus.schema[corpus_id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    if not blocks:
        # schema must match the non-empty path exactly (review fix:
        # a hardcoded long/long here broke unions over empty batches)
        return queries.sparkSession.createDataFrame(
            [],
            f"qid {qid_type}, neighbor_id {id_field}, "
            "score double, rank int",
        )

    out_schema = f"qid {qid_type}, neighbor_id {id_field}, score double"
    corpus_cols = corpus.select(corpus_id_col, corpus_embedding_col)
    m = k + slack

    candidates = corpus_cols.mapInPandas(
        _gemm_blocks_scorer(
            blocks,
            metric=metric,
            m=m,
            corpus_id_col=corpus_id_col,
            corpus_embedding_col=corpus_embedding_col,
        ),
        schema=out_schema,
    )
    return rank_merge(candidates, k, metric=metric, score_decimals=score_decimals)


def rank_merge(
    candidates: DataFrame,
    k: int,
    *,
    metric: str,
    score_decimals: int | None = None,
) -> DataFrame:
    """Final deterministic top-k per qid over a (qid, neighbor_id,
    score) candidate pool: rank by (rounded score best-first,
    neighbor_id asc) via one hash-agg whose per-key state is bounded
    by the candidate count per query — never a global sort. Shared by
    every multi-source kNN plan (GEMM blocks, IVF cells)."""
    final_score = F.round(F.col("score"), score_decimals) if score_decimals is not None else F.col("score")
    asc = metric == "l2"
    sort_key = final_score if asc else -final_score
    return (
        candidates.select(
            "qid",
            "neighbor_id",
            final_score.alias("score"),
            sort_key.alias("_key"),
        )
        .groupBy("qid")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("_key", "neighbor_id", "score"))),
                1,
                k,
            ).alias("nn")
        )
        .select("qid", F.posexplode("nn").alias("rank0", "nn"))
        .select(
            "qid",
            F.col("nn.neighbor_id").alias("neighbor_id"),
            F.col("nn.score").alias("score"),
            (F.col("rank0") + 1).alias("rank"),
        )
    )


def _gemm_blocks_scorer(
    blocks: list,
    *,
    metric: str,
    m: int,
    corpus_id_col: str,
    corpus_embedding_col: str,
):
    """Partition scorer for ALL query blocks in ONE corpus pass.

    Per Arrow batch the corpus slice is decoded once and scored
    against each block in turn — peak memory is a single
    (batch x block) score matrix plus each block's (m x block)
    running-candidate buffers (the same buffers a per-block design
    holds), while the corpus is read ONCE instead of once per block
    (at the module's 100 TB design point a 16-block query batch
    would otherwise scan 1.6 PB)."""
    import numpy as np
    import pandas as pd

    prepped = []
    for qids, Q in blocks:
        if metric == "cosine":
            Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
        else:
            Qn = Q
        prepped.append((np.asarray(qids), Qn, (Q * Q).sum(axis=1)))

    def _fold(state, keys, scores, id_mat):
        if state is None:
            cand_key, cand_id, cand_score = keys, id_mat, scores
        else:
            cand_key = np.vstack([state[0], keys])
            cand_id = np.vstack([state[1], id_mat])
            cand_score = np.vstack([state[2], scores])
        take = min(m, cand_key.shape[0])
        # Tie-aware top-m: argpartition on the key alone keeps an
        # ARBITRARY subset of boundary-tied candidates, which can
        # drop the lowest-id tied neighbor rank_merge would pick —
        # lexsort per query column ((key desc, id asc)) keeps the
        # same candidates the final deterministic rank keeps.
        # (``slack`` still covers ties introduced by downstream
        # score rounding, as documented.)
        idx = np.empty((take, cand_key.shape[1]), dtype=np.int64)
        for c in range(cand_key.shape[1]):
            order = np.lexsort((cand_id[:, c], -cand_key[:, c]))
            idx[:, c] = order[:take]
        return (
            np.take_along_axis(cand_key, idx, axis=0),
            np.take_along_axis(cand_id, idx, axis=0),
            np.take_along_axis(cand_score, idx, axis=0),
        )

    def score_partition(batches):
        state: list = [None] * len(prepped)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf[corpus_embedding_col]]
            )
            ids = pdf[corpus_id_col].to_numpy()
            if metric == "cosine":
                en = emb / np.maximum(
                    np.linalg.norm(emb, axis=1, keepdims=True), 1e-300
                )
            elif metric == "l2":
                e_sq = (emb * emb).sum(axis=1, keepdims=True)
            for bi, (_, Qn, q_sq) in enumerate(prepped):
                if metric == "cosine":
                    scores = en @ Qn.T  # (n, q)
                    keys = scores
                elif metric == "dot":
                    scores = emb @ Qn.T
                    keys = scores
                else:  # l2: dist^2 = |e|^2 - 2 e.q + |q|^2 ; key = -dist
                    d2 = np.maximum(
                        e_sq - 2.0 * (emb @ Qn.T) + q_sq[None, :], 0.0
                    )
                    scores = np.sqrt(d2)
                    keys = -scores
                id_mat = np.broadcast_to(ids[:, None], keys.shape)
                state[bi] = _fold(state[bi], keys, scores, id_mat)
        for (qids, _, _), st in zip(prepped, state):
            if st is None:
                continue
            _, best_id, best_score = st
            take = best_id.shape[0]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, take),
                    "neighbor_id": best_id.T.reshape(-1),
                    "score": best_score.T.reshape(-1),
                }
            )

    return score_partition
