"""Approximate nearest neighbor — the scale path for similarity search.

Exact kNN (knn.py) costs one full corpus pass per query batch. At
100 TB that pass is the bottleneck, so we trade recall for pruning:

- ``add_lsh_buckets`` / ``lsh_knn_query`` — random-hyperplane LSH.
  The bucket id is a pure Catalyst expression (sign bits of dot
  products with ``n_bits`` fixed hyperplanes), so bucketing is free
  at write time and the bucketed table can be *partitioned* by
  bucket: a query then prunes to matching partitions (multi-probe:
  Hamming-adjacent buckets) and reranks exactly. Partition pruning
  means the 100 TB scan becomes a (100 TB / 2^n_bits * probes) scan.

- ``ivf_build`` / ``ivf_search`` — inverted-file index: KMeans
  centroids (MLlib, trained on a sample), corpus assigned to nearest
  centroid, stored partitioned by centroid id. Queries scan only the
  ``nprobe`` nearest centroids' partitions and rerank exactly.
  Better recall/selectivity trade-off than LSH for clustered data.

Both return exact distances on the candidate set — approximation is
only in candidate selection (standard IVF/LSH semantics, same as the
reference's backing store would do with its HNSW index).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators._arrow import (
    rows_matrix as _rows_matrix,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import knn_query


def np_round_half_up(a, decimals: int):
    """numpy.round is round-half-to-EVEN; Spark and DuckDB round() are
    half-UP (away from zero). Any numpy-computed value that must
    hash-match an expression-form twin or a SQL oracle rounds through
    this, or exact binary ties (e.g. power-of-two cosine components)
    diverge in the last digit."""
    import numpy as np

    s = 10.0 ** decimals
    return np.sign(a) * np.floor(np.abs(a) * s + 0.5) / s


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float64)


def _bucket_expr(embedding_col: str, planes: np.ndarray):
    """Bucket id = sum_j [dot(e, plane_j) > 0] << j, as a codegen
    expression (dot products against literal arrays)."""
    out = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(
                F.col(embedding_col), lit_plane, lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(dot > 0, F.lit(1 << j)).otherwise(0).cast("bigint")
    return out


def add_lsh_buckets(
    corpus: DataFrame,
    *,
    embedding_col: str = "embedding",
    dim: int,
    n_bits: int = 8,
    seed: int = 42,
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Attach the LSH bucket id. Write the result partitioned by
    ``bucket_col`` (``df.write.partitionBy(bucket_col)``) to get
    partition pruning on queries."""
    planes = _hyperplanes(dim, n_bits, seed)
    return corpus.withColumn(bucket_col, _bucket_expr(embedding_col, planes))


def lsh_knn_query(
    corpus_with_buckets: DataFrame,
    query_vector: list[float],
    k: int = 5,
    *,
    id_col: str = "id",
    embedding_col: str = "embedding",
    n_bits: int = 8,
    seed: int = 42,
    bucket_col: str = "lsh_bucket",
    hamming_probe: int = 1,
    metric: str = "cosine",
    score_decimals: int | None = None,
) -> DataFrame:
    """Probe the query's bucket plus all buckets within Hamming
    distance ``hamming_probe``, then exact-rerank the candidates.
    The bucket filter is a literal IN-list -> partition pruning when
    the corpus is partitioned by bucket."""
    q = np.asarray(query_vector, dtype=np.float64)
    planes = _hyperplanes(len(query_vector), n_bits, seed)
    qbucket = 0
    for j, plane in enumerate(planes):
        if float(plane @ q) > 0:
            qbucket |= 1 << j

    if hamming_probe > 2:
        raise ValueError(
            "hamming_probe supports 0, 1 or 2 (wider multi-probe is "
            "not implemented — silently capping would overstate recall)"
        )
    probes = {qbucket}
    if hamming_probe >= 1:
        probes |= {qbucket ^ (1 << j) for j in range(n_bits)}
    if hamming_probe >= 2:
        probes |= {
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_bits)
            for j in range(i + 1, n_bits)
        }

    candidates = corpus_with_buckets.filter(F.col(bucket_col).isin(list(probes)))
    return knn_query(
        candidates,
        query_vector,
        k,
        id_col=id_col,
        embedding_col=embedding_col,
        metric=metric,
        score_decimals=score_decimals,
    )


#: Auto-sizing target: rows per cell the serving math wants to hold
#: CONSTANT as the corpus grows. nprobe cells of ~40k rows keep the
#: probed volume (the serve cost) flat across corpus decades — the
#: r14 100M probe paid 2.5x probed volume because a fixed cell count
#: let occupancy grow 10x per decade.
TARGET_CELL_ROWS = 40_000


def auto_n_centroids(
    n_rows: int, *, target_cell_rows: int | None = None
) -> int:
    """Constant-occupancy cell count for a corpus of ``n_rows``:
    ``ceil(rows / TARGET_CELL_ROWS)`` clamped to [16, 65536]. 1M rows
    -> 25 cells; 100M -> 2500; 1B -> 25k — the probed volume at fixed
    nprobe stays ~nprobe * TARGET_CELL_ROWS at every decade instead
    of growing with the corpus. The k-means train cost scales with
    n_centroids (distance matrix columns), which is why the cap: past
    65k cells train hierarchically (coarse-quantize twice) rather
    than flat."""
    target = int(target_cell_rows or TARGET_CELL_ROWS)
    return max(16, min(65_536, -(-int(n_rows) // max(target, 1))))


def ivf_build(
    corpus: DataFrame,
    *,
    id_col: str = "id",
    embedding_col: str = "embedding",
    n_centroids: int | str = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
    metric: str = "l2",
    n_rows: int | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Train k-means centroids (driver-side numpy Lloyd on a bounded
    sample — see ``_train_kmeans`` for why not MLlib) and assign every
    row its nearest centroid in one Arrow-batched scan (the centroid
    matrix ships in the task closure; it is tiny). Returns
    (assigned_df, centroids).

    ``n_rows``: pass the corpus row count when the caller already has
    it and the sizing count inside ``_train_kmeans`` is skipped — at
    scale that is one full scan saved per build. With
    ``sample_fraction`` set the expected post-sample count is used;
    binomial overshoot past the training cap is trimmed by the seeded
    choice in ``_train_kmeans``, so the slight expectation error only
    nudges the sample size, never the memory bound.

    Persist ``assigned_df`` partitioned by ``ivf_cell`` for pruning
    (``ivf_write``). ``metric="l2"`` reproduces classic Euclidean
    cells; ``"cosine"`` trains spherical cells (better for normalized
    embedding spaces).
    """
    if metric not in ("cosine", "l2"):
        raise ValueError(
            f"ivf_build metric must be 'cosine' or 'l2', got {metric!r}"
        )
    if n_centroids == "auto":
        # constant-occupancy sizing: one column-pruned count (skipped
        # when the caller already has it) -> rows/TARGET_CELL_ROWS
        if n_rows is None:
            n_rows = corpus.select(id_col).count()
        n_centroids = auto_n_centroids(n_rows)
    n_centroids = int(n_centroids)
    base = corpus.select(F.col(id_col).alias("_id"), F.col(embedding_col).alias("_e"))
    train = (
        base
        if sample_fraction is None
        # layout-independent membership (value hash, not per-partition
        # RNG) so the trained centroids do not depend on core count
        else _det_sample(
            base, sample_fraction, seed, F.col("_id"), F.col("_e")
        )
    )
    eff_rows = None
    if n_rows is not None:
        eff_rows = (
            int(n_rows)
            if sample_fraction is None
            else max(1, int(n_rows * sample_fraction))
        )
    C = _train_kmeans(
        train, "_e", n_centroids, seed=seed, metric=metric, n_rows=eff_rows
    )
    return _assign_to_centroids(
        corpus, C, id_col=id_col, embedding_col=embedding_col, metric=metric
    ), C


def _assign_to_centroids(
    rows: DataFrame,
    C: np.ndarray,
    *,
    id_col: str,
    embedding_col: str,
    metric: str,
) -> DataFrame:
    """Nearest-centroid assignment as one Arrow-batched scan (the
    centroid matrix ships in the task closure; it is tiny). Shared by
    ``ivf_build`` (initial layout) and ``ivf_append`` (incremental
    ingest with the PERSISTED centroids — identical math, so appended
    rows land in exactly the cell a rebuild would give them).

    r15: ``mapInArrow`` with the flat-buffer matrix path — the id and
    embedding columns pass through untouched as Arrow arrays (no
    per-row Python objects in either direction); the per-row
    ``np.stack`` idiom it replaces measured 4x the wall time on 1M
    rows (operators/_arrow.py module doc). Identical assignments."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators._arrow import (
        list_matrix,
        rows_matrix,
    )

    spherical = metric == "cosine"
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    c_sq = (C * C).sum(axis=1)
    base = rows.select(F.col(id_col).alias("_id"), F.col(embedding_col).alias("_e"))
    id_type = rows.schema[id_col].dataType.simpleString()
    emb_type = rows.schema[embedding_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, `{embedding_col}` {emb_type}, ivf_cell int"

    def assign(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            E = list_matrix(rb.column(1))
            if E is None:  # ragged/null rows — per-row fallback
                E = rows_matrix(rb.column(1).to_pandas())
            if spherical:
                E_unit = E / np.maximum(
                    np.linalg.norm(E, axis=1, keepdims=True), 1e-300
                )
                cell = np.argmax(E_unit @ Cn.T, axis=1)
            else:
                cell = np.argmin(c_sq[None, :] - 2.0 * (E @ C.T), axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    rb.column(1),
                    pa.array(cell.astype("int32")),
                ],
                names=[id_col, embedding_col, "ivf_cell"],
            )

    return base.mapInArrow(assign, schema=out_schema)


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vector: list[float],
    k: int = 5,
    *,
    id_col: str = "id",
    embedding_col: str = "embedding",
    nprobe: int = 3,
    metric: str = "cosine",
    score_decimals: int | None = None,
) -> DataFrame:
    """Scan only the ``nprobe`` cells whose centroids are nearest the
    query, exact-rerank inside them."""
    q = np.asarray(query_vector, dtype=np.float64)
    if metric == "cosine":
        qn = q / max(np.linalg.norm(q), 1e-300)
        cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-300
        )
        order = np.argsort(-(cn @ qn), kind="stable")
    else:
        order = np.argsort(((centroids - q) ** 2).sum(axis=1), kind="stable")
    cells = [int(c) for c in order[:nprobe]]
    candidates = assigned.filter(F.col("ivf_cell").isin(cells))
    return knn_query(
        candidates,
        query_vector,
        k,
        id_col=id_col,
        embedding_col=embedding_col,
        metric=metric,
        score_decimals=score_decimals,
    )


def ivf_knn_join(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    *,
    query_id_col: str = "qid",
    query_embedding_col: str = "q_embedding",
    id_col: str = "id",
    embedding_col: str = "embedding",
    metric: str = "cosine",
    nprobe: int = 3,
    score_decimals: int | None = None,
    slack: int = 32,
    multi_assigned: bool = False,
) -> DataFrame:
    """Batch kNN join through an IVF index — the scale path when BOTH
    sides are large. ``knn_join_gemm`` streams the whole corpus once
    per query block; here each query only meets the ``nprobe`` cells
    whose centroids are nearest it, so the scored volume drops to
    ~(nprobe / n_centroids) of the corpus — and on an ``ivf_write``
    layout the cell grouping is already the storage partitioning.

    Plan (all distributed, no driver materialization of either side):
    1. one Arrow pass over the queries assigns each to its ``nprobe``
       nearest cells (centroid matrix rides the closure);
    2. ``groupby(cell).cogroup(queries_by_cell).applyInPandas``: one
       float64 GEMM per cell scores that cell's corpus rows against
       that cell's queries, keeping k+slack candidates per query;
    3. ``rank_merge`` (shared with the GEMM join) produces the final
       deterministic (rounded score, neighbor_id) top-k.

    Standard IVF recall semantics: a true neighbor is found iff it
    lives in one of the query's probed cells; scores of emitted rows
    are exact. ``nprobe >= n_centroids`` degrades gracefully to the
    exhaustive join (every cell probed — results identical to
    ``knn_join``), which is what makes the operator oracle-checkable.

    Output: (qid, neighbor_id, score, rank) — same contract as
    ``knn_join`` / ``knn_join_gemm``.
    """
    import pandas as pd

    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        METRICS,
        rank_merge,
    )

    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}")
    C = np.asarray(centroids, dtype=np.float64)
    npb = int(min(nprobe, C.shape[0]))
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    c_sq = (C * C).sum(axis=1)

    qid_type = queries.schema[query_id_col].dataType.simpleString()
    qemb_type = queries.schema[query_embedding_col].dataType.simpleString()
    qcell_schema = f"_qid {qid_type}, _qe {qemb_type}, ivf_cell int"

    def assign_queries(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = _rows_matrix(pdf["_qe"])
            # stable argsort, not argpartition: boundary ties between
            # the npb-th and npb+1-th cell resolve to the LOWER cell
            # index deterministically, so the probed set is a pure
            # function of (query, centroids) — what lets a recall
            # audit's SQL oracle replay the probe decision exactly
            # (n_centroids is small; the full sort is negligible)
            if metric == "l2":
                d = c_sq[None, :] - 2.0 * (Q @ C.T)
                top = np.argsort(d, axis=1, kind="stable")[:, :npb]
            else:
                Qn = Q
                if metric == "cosine":
                    Qn = Q / np.maximum(
                        np.linalg.norm(Q, axis=1, keepdims=True), 1e-300
                    )
                sims = Qn @ (Cn.T if metric == "cosine" else C.T)
                top = np.argsort(-sims, axis=1, kind="stable")[:, :npb]
            yield pd.DataFrame(
                {
                    "_qid": pdf["_qid"].to_numpy().repeat(npb),
                    "_qe": pdf["_qe"].to_numpy().repeat(npb),
                    "ivf_cell": top.reshape(-1).astype("int32"),
                }
            )

    qcells = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(query_embedding_col).alias("_qe")
    ).mapInPandas(assign_queries, schema=qcell_schema)

    nid_type = assigned.schema[id_col].dataType.simpleString()
    out_schema = f"qid {qid_type}, neighbor_id {nid_type}, score double"
    m = k + slack

    def cell_scores(corp_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(corp_pdf) == 0 or len(q_pdf) == 0:
            return pd.DataFrame({"qid": [], "neighbor_id": [], "score": []})
        M = _rows_matrix(corp_pdf[embedding_col])
        Q = _rows_matrix(q_pdf["_qe"])
        ids = corp_pdf[id_col].to_numpy()
        qids = q_pdf["_qid"].to_numpy()
        if metric == "l2":
            scores = np.sqrt(
                np.maximum(
                    (Q * Q).sum(axis=1)[:, None]
                    + (M * M).sum(axis=1)[None, :]
                    - 2.0 * (Q @ M.T),
                    0.0,
                )
            )
            order_scores = scores  # lower is better
        else:
            Qs = Q
            if metric == "cosine":
                Qs = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
                Ms = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            else:
                Ms = M
            scores = Qs @ Ms.T
            order_scores = -scores  # higher is better
        keep = min(m, scores.shape[1])
        # tie-aware per-query top-m (see knn._gemm_block_scorer): keep
        # the lowest-id candidates among boundary ties, matching the
        # deterministic (score, neighbor_id) final rank
        top = np.empty((order_scores.shape[0], keep), dtype=np.int64)
        for r in range(order_scores.shape[0]):
            top[r] = np.lexsort((ids, order_scores[r]))[:keep]
        return pd.DataFrame(
            {
                "qid": qids.repeat(keep),
                "neighbor_id": ids[top.reshape(-1)],
                "score": np.take_along_axis(scores, top, axis=1).reshape(-1),
            }
        )

    candidates = (
        assigned.select(id_col, embedding_col, "ivf_cell")
        .groupby("ivf_cell")
        .cogroup(qcells.groupby("ivf_cell"))
        .applyInPandas(cell_scores, schema=out_schema)
    )
    # ivf_build assigns each corpus row to exactly ONE cell, so a
    # (query, corpus) pair meets in at most one probed cell and no
    # dedup shuffle is needed. Only an explicitly multi-assigned
    # corpus (e.g. an ivf_neardup_pairs-style n_assign>1 layout) can
    # produce duplicates — and then the kept copy must be made
    # deterministic, because different cell shapes can round-trip the
    # GEMM differently in the last bits.
    if multi_assigned:
        candidates = candidates.groupBy("qid", "neighbor_id").agg(
            F.max("score").alias("score") if metric != "l2" else F.min("score").alias("score")
        )
    return rank_merge(candidates, k, metric=metric, score_decimals=score_decimals)


def _det_sample(df: DataFrame, fraction: float, seed: int, *cols):
    """LAYOUT-INDEPENDENT seeded sample: keep rows whose seeded 64-bit
    hash of ``cols`` lands in the first ``fraction`` of the 2^31 hash
    space. Membership is a pure function of row VALUES, so the sampled
    set is identical at any core count, partition count or row order —
    unlike ``df.sample()``, whose per-partition RNG draws depend on the
    row-to-partition layout (the r15 8-core bench crash: the k-means
    training sample shifted under ``local[8]``, the 1M graph index came
    out with different cells, and the beam missed the planted
    self-neighbor). Same expected count and one cheap filter, exactly
    like Bernoulli sampling."""
    h = F.xxhash64(*cols, F.lit(int(seed)))
    return df.filter(
        F.pmod(h, F.lit(1 << 31)) < F.lit(int(min(fraction, 1.0) * (1 << 31)))
    )


def collect_bounded_sample(
    df: DataFrame,
    vec_col: str,
    *,
    max_rows: int,
    seed: int,
    n_rows: int | None = None,
    as_rows: bool = False,
):
    """Driver-side float64 matrix (or raw value list with
    ``as_rows=True``) of ≤ ``max_rows`` sampled rows, drawn WITHOUT a
    partition-prefix bias and INDEPENDENT of the input's physical
    layout. Shared by every k-means-style trainer (``_train_kmeans``,
    ``pq.pq_train``, ``pq.ivf_pq_build``) so the sampling contract has
    exactly one implementation.

    limit() alone would take the first partitions' rows, which on an
    ordered or clustered corpus (time-ordered ingest, per-tenant
    files) trains on the head of the distribution only. r15 used
    ``df.sample()`` + collect, which fixed the prefix bias but left
    TWO layout dependencies: Bernoulli draws are seeded per partition
    (a different core count keeps different rows), and the collected
    row ORDER follows partition order (k-means init indexes into the
    collected matrix). Both made index builds differ across core
    counts — the r16 scaling-bench fix. Now membership is a seeded
    VALUE hash (``_det_sample``) with a small slack above the cap, and
    the collected rows are sorted by that hash before the cap trim, so
    the returned sample is a pure function of (values, seed): build an
    index on 8 cores or 32 and the centroids are identical. Callers
    that already know the row count pass ``n_rows`` so sizing adds no
    extra scan. The collect is bounded (``max_rows`` × dim float64 — a
    few MB at typical dims): the same memory contract as a broadcast
    join side.
    """
    vecs = df.select(F.col(vec_col).alias("_v"))
    n = vecs.count() if n_rows is None else int(n_rows)
    sel = vecs.select(
        F.xxhash64(F.col("_v"), F.lit(int(seed))).alias("_h"), "_v"
    )
    if n > max_rows:
        # slack of ~6 binomial sigmas over the cap: the hash-rank trim
        # below cuts back to exactly max_rows, so the slight oversample
        # only costs a few hundred extra collected rows, never bias
        target = max_rows + 6 * int(max_rows**0.5) + 16
        sel = sel.filter(
            F.pmod(F.col("_h"), F.lit(1 << 31))
            < F.lit(int(min(1.0, target / n) * (1 << 31)))
        )
    pdf = sel.toPandas()
    order = np.argsort(pdf["_h"].to_numpy(), kind="stable")
    vals = pdf["_v"].iloc[order]
    if len(vals) > max_rows:
        vals = vals.iloc[:max_rows]
    if as_rows:
        # structured samples (e.g. (embedding, cell) pairs) — return
        # the raw values; the caller shapes them
        return list(vals)
    return _rows_matrix(vals)


def _train_kmeans(
    sample: DataFrame,
    vec_col: str,
    n_centroids: int,
    *,
    seed: int,
    metric: str = "cosine",
    max_train_rows: int = 262_144,
    n_iter: int = 15,
    n_rows: int | None = None,
) -> np.ndarray:
    """Seeded k-means on a driver-side sample — spherical (cosine:
    rows normalized, centroids renormalized each step) or plain Lloyd
    (l2/dot). The sample is bounded (``max_train_rows`` × dim float64
    — a few MB for typical dims), so collecting it to the driver is
    the same contract as broadcasting a small join side; all per-row
    corpus work stays distributed.

    Why not MLlib KMeans: at the hundreds-of-centroids IVF operators
    auto-size to, ``pyspark.ml.clustering.KMeans.fit`` spends minutes
    in k-means|| init + per-iteration job scheduling for a training
    problem numpy's dense Lloyd loop solves in well under a second
    (measured: >120 s vs 0.65 s at 10k × 64, k=195). Centroid quality
    only gates *pruning recall*, never correctness — candidate
    distances are recomputed exactly either way — so cheap Lloyd
    iterations are plenty.
    """
    spherical = metric == "cosine"
    X = collect_bounded_sample(
        sample, vec_col, max_rows=max_train_rows, seed=seed, n_rows=n_rows
    )
    if spherical:
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    rng = np.random.RandomState(seed)
    k = int(min(n_centroids, len(X)))
    C = X[rng.choice(len(X), k, replace=False)].copy()
    for _ in range(n_iter):
        if spherical:
            owner = np.argmax(X @ C.T, axis=1)  # cosine on unit rows
        else:
            # argmin ||x-c||^2 = argmin (c^2 - 2 x.c); x^2 constant
            owner = np.argmin((C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T), axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, owner, X)
        counts = np.bincount(owner, minlength=k)
        live = counts > 0
        C[live] = sums[live] / counts[live, None]
        if spherical:
            C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ivf_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    embedding_col: str,
    threshold: float = 0.9,
    decimals: int = 4,
    n_centroids: int | None = None,
    n_assign: int = 4,
    seed: int = 42,
    sample_fraction: float | None = None,
    block_size: int = 4096,
) -> DataFrame:
    """Semantic near-dup pairs at corpus scale: IVF-cell-bucketed GEMM.

    The scale path ``embedding_neardup_pairs_gemm`` delegates to for
    corpora too large to broadcast (operators/dedup.py). Same output
    contract as ``embedding_neardup_pairs``: (id_a, id_b, cosine)
    with id_a < id_b and cosine rounded to ``decimals``.

    Plan:
    1. L2-normalize, train spherical-KMeans centroids on a bounded
       driver-side sample (seeded numpy Lloyd iterations — the sample
       is capped at ``max_train_rows`` × dim doubles, a few MB, and
       training there is ~100× faster than an MLlib fit at the
       hundreds-of-centroids this operator sizes to; the distributed
       work stays in steps 2–3). Cosine on normalized vectors is
       monotone in Euclidean distance, so Euclidean cells are cosine
       cells.
    2. MULTI-ASSIGN each vector to its ``n_assign`` nearest cells
       (one Arrow-batched pass; centroid matrix ships in the closure,
       it is tiny). Boundary points live in several cells, which is
       what keeps cross-cell recall high without any all-pairs step.
    3. ``applyInPandas`` per cell: blocked GEMM within the cell.
       The score pass runs in float32 against a slightly LOWERED
       threshold (dim-aware margin = 0.5·10^-decimals + dim·2^-23,
       covering rounding slack plus worst-case float32 cast+GEMM
       error for unit vectors at any dim), then only
       the surviving candidate pairs are recomputed in float64 and
       rounded — so emitted cosines are bit-identical to the exact
       expression form while the quadratic pass never pays float64
       bandwidth or a full-matrix ``np.round`` (measured 5× the GEMM
       itself at 16k-row cells). The shuffle moves each vector
       ``n_assign`` times — O(n·d) — and per-task memory is bounded
       by (cell rows × dim) + one (block_size × cell rows) float32
       score block.
    4. ``dropDuplicates`` over the pair key (a pair co-located in
       more than one shared cell is emitted once).

    Recall contract (standard IVF semantics): a pair is found iff the
    two vectors share at least one assigned cell. At high thresholds
    near-dup vectors are nearly coincident, so their top-``n_assign``
    cell sets intersect in all but adversarial geometries; raise
    ``n_assign`` (or ``n_centroids``-to-corpus ratio) to trade cost
    for recall. Exactness is never approximated — every emitted
    cosine is the true value, identical to the exact-form output.
    When ``n_assign >= n_centroids`` (auto-sizing picks 4 cells for
    corpora under ~5k rows) every vector lands in every cell and the
    operator degrades gracefully to the exhaustive GEMM — small
    inputs are exact by construction, pruning kicks in exactly when
    the corpus is big enough to need it. Measured at sf0.1 (5k
    vectors, genuine 2-of-4 pruning via n_assign=2): 866/920 pairs at
    threshold 0.4, 14/14 at 0.5; defaults recover 920/920.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    base = df.select(id_col, embedding_col)
    n = None
    if n_centroids is None:
        # one metadata-cheap count to size the index: ~1k rows/cell.
        # Quadratic work is sum(cell²) ≈ (n_assign·rows_per_cell)·n·d,
        # so halving the cell size halves the whole GEMM bill; 1k rows
        # keeps per-cell work ~20 ms while KMeans (k ≈ n/1024, trained
        # on a sample) stays a rounding error next to the pair pass.
        # The same count feeds _train_kmeans' sample sizing, so
        # training adds no second scan.
        n = base.count()
        n_centroids = int(min(4096, max(4, n // 1024)))

    # Normalization happens in numpy inside the Arrow passes (driver
    # sample + assign), NOT as a higher-order-function expression: a
    # per-element transform lambda that references an outer aggregate
    # re-evaluates the aggregate for every element — interpreted
    # O(dim²) per row, measured seconds per 100k rows — while the
    # vectorized divide is effectively free next to the GEMM.
    raw = base.select(F.col(id_col).alias("_id"), F.col(embedding_col).alias("_e"))
    train = (
        raw
        if sample_fraction is None
        else _det_sample(raw, sample_fraction, seed, F.col("_id"), F.col("_e"))
    )
    C = _train_kmeans(
        train,
        "_e",
        n_centroids,
        seed=seed,
        metric="cosine",
        # reuse the sizing count when train IS the full corpus
        n_rows=n if sample_fraction is None else None,
    )  # (c, d)
    k_assign = min(n_assign, C.shape[0])

    id_type = df.schema[id_col].dataType.simpleString()
    assign_schema = f"_id {id_type}, _e array<double>, ivf_cell int"

    def assign(batches):
        import pyarrow as pa

        from vector_databases___hydrate_chroma_db_collection_spark.operators._arrow import (
            list_matrix,
            matrix_to_list_array,
            rows_matrix,
        )

        for rb in batches:
            if rb.num_rows == 0:
                continue
            E = list_matrix(rb.column(1))
            if E is None:
                E = rows_matrix(rb.column(1).to_pandas())
            E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-300)
            sims = E @ C.T  # (n, c); rows are unit, centroids near-unit
            top = np.argpartition(-sims, k_assign - 1, axis=1)[:, :k_assign]
            # normalized rows repeated k_assign times, as ONE flat
            # buffer (r15 — the object-column repeat this replaces
            # shipped every row back through per-row Python objects)
            rep = np.repeat(E, k_assign, axis=0)
            idx = pa.array(
                np.repeat(np.arange(rb.num_rows, dtype=np.int64), k_assign)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0).take(idx),
                    matrix_to_list_array(rep),
                    pa.array(top.reshape(-1).astype(np.int32)),
                ],
                names=["_id", "_e", "ivf_cell"],
            )

    assigned = raw.mapInArrow(assign, schema=assign_schema)

    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n_rows = len(pdf)
        if n_rows < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"cosine": "float64"}
            )
        ids = pdf["_id"].to_numpy()
        M = _rows_matrix(pdf["_e"])
        M32 = M.astype(np.float32)
        # Dim-aware prescreen margin: anything whose ROUNDED float64
        # value could reach `threshold` sits above threshold −
        # 0.5·10^-decimals, and the float32 pass (cast + GEMM over
        # unit vectors) may under-read a true cosine by up to
        # ~dim·2^-23 — at dim=1024 that alone is ~1.2e-4, more than a
        # fixed 10^-4 margin, so the margin must scale with dim or
        # boundary pairs get silently dropped.
        prescreen = threshold - (0.5 * 10.0 ** (-decimals) + M.shape[1] * 2.0 ** (-23))
        outs = []
        for s in range(0, n_rows, block_size):
            blk = slice(s, min(s + block_size, n_rows))
            sims32 = M32[blk] @ M32.T
            mask = (sims32 >= prescreen) & (
                ids[blk.start : blk.stop, None] < ids[None, :]
            )
            ii, jj = np.nonzero(mask)
            if len(ii):
                # exact float64 value + round for the rare survivors
                exact = np_round_half_up(
                    np.einsum("ij,ij->i", M[blk.start + ii], M[jj]), decimals
                )
                keep = exact >= threshold
                if keep.any():
                    outs.append(
                        pd.DataFrame(
                            {
                                "id_a": ids[blk.start + ii[keep]],
                                "id_b": ids[jj[keep]],
                                "cosine": exact[keep],
                            }
                        )
                    )
        if not outs:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"cosine": "float64"}
            )
        return pd.concat(outs, ignore_index=True)

    # groupBy().applyInPandas shuffles by key on its own — an explicit
    # repartition first would be a second full pass over n_assign
    # copies of the corpus.
    return (
        assigned.groupBy("ivf_cell")
        .applyInPandas(cell_pairs, schema=out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def mllib_lsh_similarity_join(
    a: DataFrame,
    b: DataFrame,
    *,
    id_col: str = "id",
    embedding_col: str = "embedding",
    distance_threshold: float = 1.0,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Public-API alternative: MLlib BucketedRandomProjectionLSH
    approxSimilarityJoin (Euclidean). Kept alongside the native
    expression-level LSH because MLlib's implementation ships with
    Spark and is battle-tested; the native one gives partition
    pruning on a persisted bucket column. Output: (id_a, id_b,
    l2_dist) with id_a < id_b."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    fa = a.select(
        F.col(id_col).alias("_id"),
        array_to_vector(F.col(embedding_col).cast("array<double>")).alias("features"),
    )
    fb = b.select(
        F.col(id_col).alias("_id"),
        array_to_vector(F.col(embedding_col).cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(fa)
    joined = lsh.approxSimilarityJoin(fa, fb, distance_threshold, distCol="l2_dist")
    return (
        joined.select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.round("l2_dist", 4).alias("l2_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def mllib_minhash_dedup_join(
    df: DataFrame,
    *,
    id_col: str = "id",
    text_col: str = "document",
    n: int = 3,
    jaccard_distance_threshold: float = 0.5,
    num_hash_tables: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Public-API alternative for near-dup: MLlib MinHashLSH over a
    hashed shingle vocabulary (HashingTF), approxSimilarityJoin on
    Jaccard distance. The native operators/dedup.py path remains the
    oracle-checkable default."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        word_shingles,
    )

    base = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_shingles(text_col, n)).alias("sh"),
    ).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(base)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(feats)
    joined = lsh.approxSimilarityJoin(
        feats, feats, jaccard_distance_threshold, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def _local_sidecar_path(path: str) -> str:
    """The JSON sidecar is written with driver-local file IO; a remote
    scheme (s3a/hdfs/...) would silently land the Parquet cells remote
    and the sidecar on the driver's local disk — a half-persisted
    index. Accept local paths and the file: scheme only, loudly."""
    if "://" in path and not path.startswith("file://"):
        raise NotImplementedError(
            f"index sidecars use driver-local file IO; got {path!r} — "
            "persist to a locally-mounted path (or file:), or write "
            "the sidecar through your object-store client"
        )
    return path[len("file://"):] if path.startswith("file://") else path


_WRITER_LOCK_STATE = None  # lazily a threading.local with per-thread depth


def _writer_lock(p: str, sidecar: str):
    """Cross-PROCESS writer serialization for one index sidecar: an
    ``flock`` on ``<sidecar>.writer_lock`` held for the whole
    read-modify-write mutation. The r14 fence covered foreign SOURCE
    mutations (etag pin) and the sidecar swap itself is atomic, but
    two concurrent writers that both read generation N of the sidecar
    would each commit an N+1 derived from N — last replace wins and
    the first writer's tombstones / pending records / guard segments
    silently vanish (a real lost-update under true syscall
    interleaving). Serializing whole mutations is the honest local
    answer: index mutations are micro-batch-sized, writers queue for
    seconds, and every committed op derives from the committed state
    before it — exactly-one-winner per generation by construction.
    Reentrant per THREAD (a pq delete delegating to ``ivf_delete``
    must not self-deadlock); a second thread or process blocks until
    release. Local-filesystem scope, like the sidecar layout itself —
    an object-store port would use conditional puts instead."""
    import contextlib
    import threading

    global _WRITER_LOCK_STATE
    if _WRITER_LOCK_STATE is None:
        _WRITER_LOCK_STATE = threading.local()

    @contextlib.contextmanager
    def _ctx():
        import fcntl
        import os

        os.makedirs(p, exist_ok=True)
        key = os.path.join(os.path.realpath(p), sidecar)
        held = getattr(_WRITER_LOCK_STATE, "held", None)
        if held is None:
            held = _WRITER_LOCK_STATE.held = {}
        if key in held:
            held[key][1] += 1
            try:
                yield
            finally:
                held[key][1] -= 1
                if held[key][1] == 0:
                    del held[key]
            return
        lf = open(key + ".writer_lock", "w")
        try:
            fcntl.flock(lf, fcntl.LOCK_EX)
            held[key] = [lf, 1]
            try:
                yield
            finally:
                held[key][1] -= 1
                if held[key][1] == 0:
                    del held[key]
                    fcntl.flock(lf, fcntl.LOCK_UN)
        finally:
            lf.close()

    return _ctx()


def _serialized_writer(default_sidecar: str = "ivf_index.json"):
    """Decorator applying ``_writer_lock`` around a whole mutation
    function of shape ``fn(spark, path, *...)`` — the sidecar name
    follows the function's own ``sidecar=`` kwarg when present (the
    IVF-PQ delegation pattern)."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(spark, path, *args, **kwargs):
            sidecar = kwargs.get("sidecar", default_sidecar)
            with _writer_lock(_local_sidecar_path(path), sidecar):
                return fn(spark, path, *args, **kwargs)

        return wrapper

    return deco


def _atomic_sidecar_write(p: str, fname: str, meta: dict) -> None:
    """Atomic, durable sidecar commit: temp file + fsync + rename (+
    best-effort directory fsync), so a reader never observes a
    half-written JSON and neither a crash mid-write NOR a power loss
    right after the rename can leave a truncated sidecar where the
    previous one used to be (rename alone orders nothing against data
    writeback on most filesystems)."""
    import json
    import os

    tmp = os.path.join(p, fname + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(p, fname))
    try:
        dfd = os.open(p, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass  # directory fsync is best-effort (not all FS/OS allow it)


def _fresh_versioned_dir(
    p: str, base: str, floor_names: list | None = None
) -> str:
    """Next unused versioned data directory (``<base>_v1``, ...) — a
    REBUILD never writes into the directory readers are scanning;
    the sidecar's location pointer is swapped last (atomic), so
    readers that follow the read API (sidecar first) see the complete
    old index until the commit and the complete new index after.
    Scans the filesystem (a crashed rebuild's orphan directory is
    never reused) AND floors the version above every name in
    ``floor_names`` — the sidecar's CURRENT recording locations. The
    floor is what makes versions MONOTONIC across GC (the
    ``fresh_bloom_file`` ``prev`` contract): after GC removes a
    superseded version, a bare filesystem scan would recycle its name
    and a reader holding an older sidecar could open a same-named
    directory with different content."""
    import os

    v = 0
    for name in floor_names or []:
        if not name:
            continue
        try:
            v = max(v, int(str(name).rsplit("_v", 1)[1].split(".")[0]))
        except (IndexError, ValueError):
            pass
    v += 1
    while os.path.exists(os.path.join(p, f"{base}_v{v}")):
        v += 1
    return f"{base}_v{v}"


def _fresh_cells_dir(p: str, prev: str | None = None) -> str:
    """``prev`` = the sidecar's CURRENT cells location: floors the new
    version above it so repeated compact/refresh cycles (each GCs the
    superseded dir) can never recycle a freed ``cells_vN`` name under
    a reader holding an older sidecar."""
    return _fresh_versioned_dir(p, "cells", floor_names=[prev])


def _drop_old_cells(p: str, old_meta: dict | None, new_dir: str) -> None:
    """Post-commit cleanup of a rebuild: remove the superseded data
    directory. Runs only AFTER the new sidecar is committed, so a
    crash here leaks a directory (safe) rather than breaking
    readers. Pre-versioning indexes kept cells at the bare ``cells``
    name — handled by the same fallback the readers use."""
    import os
    import shutil

    if old_meta is None:
        return
    old_dir = old_meta.get("location", "cells")
    if old_dir != new_dir:
        shutil.rmtree(os.path.join(p, old_dir), ignore_errors=True)


def _source_stamp(source: tuple[str, str] | None) -> dict | None:
    """Staleness stamp for an index built FROM a collection: record
    (root, name, etag-at-build). Readers re-derive the etag and
    refuse to serve an index whose source has since been mutated —
    without this, a persisted index keeps answering with ids a
    ``collection_delete`` removed or vectors a ``collection_update``
    replaced (plans/chroma_api.py:245,409 swap the ``_current`` data
    dir; appends add files; ``collection_etag`` changes either way)."""
    if source is None:
        return None
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_etag,
    )

    root, name = source
    return {"root": root, "name": name, "etag": collection_etag(root, name)}


def _check_source_stamp(meta: dict, path: str, verify_source: bool) -> None:
    src = meta.get("source")
    if src is None or not verify_source:
        return
    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        StaleIndexError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_etag,
    )

    try:
        now = collection_etag(src["root"], src["name"])
    except Exception as e:
        raise StaleIndexError(
            f"index at {path!r} was built from collection "
            f"{src['name']!r} at {src['root']!r}, which is no longer "
            f"readable ({e}); rebuild the index or pass "
            "verify_source=False"
        ) from e
    if now != src["etag"]:
        raise StaleIndexError(
            f"index at {path!r} is STALE: collection {src['name']!r} "
            f"at {src['root']!r} changed since the index was built "
            f"(etag {src['etag'][:12]} -> {now[:12]}). Rebuild the "
            "index from the current collection, or pass "
            "verify_source=False to serve it anyway"
        )


def ivf_write(
    assigned: DataFrame,
    centroids: np.ndarray,
    path: str,
    *,
    metric: str = "cosine",
    source: tuple[str, str] | None = None,
    build: dict | None = None,
) -> None:
    """Persist an IVF index: the assigned corpus partitioned by
    ``ivf_cell`` (so queries get partition pruning) plus a JSON
    sidecar with centroids + metric. The index is just a dataset — it
    scans, joins, and replicates like any other table.

    ``source=(root, name)`` stamps the sidecar with the source
    collection's ``collection_etag`` so ``ivf_read`` can detect (and
    refuse) a stale index after the collection is updated, deleted
    from, or appended to.

    ``build`` records the TRAINING parameters (the kwargs passed to
    ``ivf_build``: metric, seed, sample_fraction, ...) so
    ``ivf_refresh`` can reproduce the same clustering. The ``metric``
    kwarg here is the SEARCH metric and may legitimately differ from
    the build metric (e.g. l2-trained cells served with cosine
    scoring) — without the explicit ``build`` record a refresh would
    have to guess, and guessing the wrong training metric silently
    swaps the cell layout."""
    import json
    import os

    path = _local_sidecar_path(path)
    os.makedirs(path, exist_ok=True)
    old_meta = None
    if os.path.exists(os.path.join(path, "ivf_index.json")):
        with open(os.path.join(path, "ivf_index.json")) as f:
            old_meta = json.load(f)
    stamp = _source_stamp(source)
    # Rebuild-is-atomic-for-readers: fresh versioned data dir, sidecar
    # location swapped last, superseded dir removed after the commit
    # (the same lifecycle as band_index_write; the r9 in-place
    # overwrite gave concurrent readers read failures mid-rebuild).
    cells_dir = _fresh_cells_dir(path, (old_meta or {}).get("location"))
    # One task per cell -> exactly one data file per cell dir (the
    # ivf_compact idiom). Without the cluster-by-cell exchange the
    # dynamic-partition write fans every map task into every cell it
    # touches — up to tasks x n_cells files — and the Bloom/cell-stats
    # read-backs below plus every serve pay the per-file open cost.
    (
        assigned.repartition(int(np.asarray(centroids).shape[0]), F.col("ivf_cell"))
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(os.path.join(path, cells_dir))
    )
    # id-guard Bloom over the persisted ids (operators/idguard.py):
    # what lets ivf_append prescreen its double-ingest guard with
    # zero corpus IO instead of anti-joining every batch against the
    # full cells id column. Built from the freshly-written parquet
    # (one bounded column scan); capacity 4x the build count gives
    # append headroom, ivf_compact re-sizes from the current count.
    from vector_databases___hydrate_chroma_db_collection_spark.operators import (
        idguard,
    )

    spark = assigned.sparkSession
    cells_back = spark.read.parquet(os.path.join(path, cells_dir))
    idc = [c for c in cells_back.columns if c != "ivf_cell"][0]
    id_bloom = idguard.rebuild_filter(
        cells_back,
        F.col(idc).cast("string"),
        path,
        ((old_meta or {}).get("id_bloom") or {}).get("location"),
    )
    # build-time per-cell training stats: the baseline
    # ivf_balance_audit compares appended drift against. One scan of
    # the freshly-written cells with the ASSIGNMENT metric's math.
    assign_metric = (build or {}).get("metric", metric)
    stats = {
        int(r["ivf_cell"]): (int(r["n_rows"]), float(r["mean_dist"]))
        for r in _cell_stats(spark, cells_back, centroids, assign_metric)
        .collect()
    }
    n_cells = int(centroids.shape[0])
    train_stats = {
        "cell_rows": [stats.get(i, (0, 0.0))[0] for i in range(n_cells)],
        "cell_mean_dist": [
            stats.get(i, (0, 0.0))[1] for i in range(n_cells)
        ],
    }
    _atomic_sidecar_write(
        path,
        "ivf_index.json",
        {
            "metric": metric,
            "n_centroids": n_cells,
            "dim": int(centroids.shape[1]),
            "centroids": centroids.tolist(),
            "source": stamp,
            "build": build,
            "location": cells_dir,
            "train_stats": train_stats,
            "id_bloom": id_bloom,
        },
    )
    _drop_old_cells(path, old_meta, cells_dir)
    idguard.gc_bloom_files(path, {id_bloom["location"]})
    # a rebuild supersedes every recorded per-tag append contribution
    # (the fresh sidecar carries no last_append_*) AND every tombstone
    # recording (the fresh cells hold only current-collection rows):
    # GC both recording families
    import shutil

    for d_ in os.listdir(path):
        if d_.startswith("ivf_append_ids_v") or d_.startswith(
            "ivf_tombstones_v"
        ):
            shutil.rmtree(os.path.join(path, d_), ignore_errors=True)


def ivf_read(
    spark, path: str, *, verify_source: bool = True, include_tombstoned: bool = False
) -> tuple[DataFrame, np.ndarray, str]:
    """Load a persisted IVF index -> (assigned_df, centroids, metric).

    If the sidecar carries a source-collection stamp (``ivf_write``'s
    ``source=``), the collection's CURRENT etag is re-derived and a
    mismatch raises ``StaleIndexError`` — a reader can never silently
    serve ids the collection has since deleted or replaced. Indexes
    built from arbitrary DataFrames carry no stamp and load as-is.

    Rows ``ivf_delete`` tombstoned are MASKED out (a broadcast
    anti-join against the small recording — the reader sees the
    LOGICAL index, so every consumer built on this — serving, audits,
    the semantic gate — is delete-correct for free); pass
    ``include_tombstoned=True`` for the physical rows (compaction and
    append internals read the raw parquet directly instead)."""
    import json
    import os

    path = _local_sidecar_path(path)
    with open(os.path.join(path, "ivf_index.json")) as f:
        meta = json.load(f)
    _check_source_stamp(meta, path, verify_source)
    # pre-versioning sidecars have no "location" — cells at bare name
    assigned = spark.read.parquet(
        os.path.join(path, meta.get("location", "cells"))
    )
    if not include_tombstoned:
        idc = [c for c in assigned.columns if c != "ivf_cell"][0]
        assigned = _mask_tombstones(spark, path, meta, assigned, idc)
    return assigned, np.asarray(meta["centroids"]), meta["metric"]


@_serialized_writer()
def ivf_append(
    spark,
    path: str,
    new_rows: DataFrame,
    *,
    id_col: str | None = None,
    embedding_col: str | None = None,
    on_existing: str = "skip",
    expected_prev_etag: str | None = None,
    tag: str | None = None,
) -> int:
    """Incremental vector ingest: extend a persisted IVF index with
    ``new_rows`` ONLY — assign them to their nearest EXISTING
    centroid (no retraining, the standard IVF add path: FAISS
    ``index.add`` semantics) and append the assigned rows into the
    current cells dataset. The vector-side twin of
    ``band_index_append``: a hydration loop that appends documents to
    the collection appends their embeddings here, and the index
    transitions stale -> fresh without the full ``ivf_refresh``
    k-means rebuild. Cell balance degrades only as far as the data
    drifts from the trained centroids — refresh when recall or
    balance audits say so.

    ``new_rows`` defaults to the cells dataset's own column names
    (first two columns: id, embedding); pass ``id_col``/
    ``embedding_col`` when the batch differs — values are cast to the
    existing schema's types so appended files carry the identical
    parquet schema.

    Double-ingest is guarded, not caller-trusted — and
    CORPUS-INDEPENDENTLY in the steady state: incoming ids are
    prescreened against the id-guard Bloom sidecar
    (``operators/idguard.py``; a committed filter is a superset of
    the indexed ids, so filter-negative = definitely new, zero
    corpus IO) and only filter-positive ids (true replays + ~0.8%
    false positives) are anti-joined against the indexed id column.
    The filter is re-merged with the whole batch and committed
    BEFORE the data append (superset invariant survives any crash);
    pre-filter indexes pay one full id scan on their first append
    and carry a filter thereafter. ``on_existing='skip'`` (default)
    makes replays idempotent, ``'error'`` raises naming the count. The guarded
    batch is eagerly materialized (localCheckpoint) BEFORE the append
    so the write never re-lists the directory it writes into. A
    single-dataset append needs no torn-write protocol — but NOT
    because the job commit is atomic (a Spark append commit is not
    atomic across task files; a concurrent reader, or a crash
    mid-commit, can observe a PREFIX of the batch). It converges
    because every id holds exactly one row, each row lives whole
    inside one task file, and the replay guard is id-granular: a
    replay re-appends precisely the ids whose rows did not land and
    skips the ones that did, so the cells dataset reaches
    exactly-once row counts without part-level healing.

    ``expected_prev_etag``: same foreign-mutation fence as
    ``band_index_append`` — pass the etag observed before your own
    collection append; mismatch raises ``StaleIndexError`` instead of
    silently stamping someone else's update/delete fresh. Appends
    only: updates/deletes need ``ivf_refresh``.

    ``tag`` (optional): an idempotence token for streaming callers —
    the batch's deterministic identity. A tagged append records its
    POST-GUARD contributed id set (a tiny versioned parquet, written
    and referenced from the sidecar BEFORE the data append, so a
    replay can read it across any crash window) and promotes the tag
    to ``last_append_tag`` on commit; ``ivf_appended_ids`` serves the
    set back. This is what lets a replayed semantic-gate micro-batch
    exclude exactly its own contribution from the gate's reference
    (``streaming.neardup_stream.stream_semantic_ingest``) — excluding
    the whole batch would flip same-id redeliveries contributed by
    EARLIER batches from duplicate to novel.

    Returns the number of new vectors indexed (after the guard)."""
    import json
    import os

    p = _local_sidecar_path(path)
    with open(os.path.join(p, "ivf_index.json")) as f:
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
                f"IVF index at {path!r} records etag "
                f"{str(recorded)[:12]!r} but the append expected "
                f"{expected_prev_etag[:12]!r}: the source collection "
                "was mutated by something other than this append "
                "since the index was last stamped — run ivf_refresh "
                "instead"
            )
    from vector_databases___hydrate_chroma_db_collection_spark.operators import (
        idguard,
    )

    loc = os.path.join(p, meta.get("location", "cells"))
    existing = spark.read.parquet(loc)
    exist_id, exist_emb = [c for c in existing.columns if c != "ivf_cell"][:2]
    ic = id_col or exist_id
    ec = embedding_col or exist_emb
    types = dict(existing.dtypes)
    inc_id = F.col(ic).cast(types[exist_id])
    batch = (
        new_rows.select(
            inc_id.alias(exist_id),
            F.col(ec).cast(types[exist_emb]).alias(exist_emb),
        )
        # guarded, not caller-trusted — including WITHIN the batch: a
        # source retry folded into one micro-batch must not index an
        # id twice (duplicate cells rows would waste top-k slots and
        # can never be removed by a replay)
        .dropDuplicates([exist_id])
        # materialized ONCE: the guard probe, the filter merge, and
        # the assignment all consume the batch — without this each
        # re-executes the caller's upstream lineage
        .localCheckpoint(eager=True)
    )
    # tombstoned ids refuse to re-append until a compact purges their
    # old physical rows: the id-granular serve mask (ivf_delete)
    # cannot tell a NEW row from the old one under the same id, so a
    # re-append would be silently invisible. Zero extra jobs when the
    # index carries no tombstones. A REPLAY of a tagged append
    # (completed or crashed) BYPASSES the refusal: its rows already
    # landed — they may be the very rows a later delete tombstoned —
    # the id-guard below skips them, and the replay contract is
    # republish, not raise.
    ts = _tombstones_df(spark, p, meta)
    if ts is not None and tag is not None:
        _pend = list(meta.get("pending_appends") or [])
        if meta.get("pending_append"):
            _pend.append(meta["pending_append"])
        if tag == meta.get("last_append_tag") or any(
            e.get("tag") == tag for e in _pend
        ):
            ts = None
    if ts is not None:
        n_dead = batch.join(
            F.broadcast(ts),
            F.col(exist_id).cast("string") == F.col("_ts_id"),
            "left_semi",
        ).count()
        if n_dead:
            from vector_databases___hydrate_chroma_db_collection_spark.errors import (
                TombstonedIdError,
            )

            raise TombstonedIdError(
                f"ivf_append: {n_dead} incoming id(s) are TOMBSTONED "
                f"in the index at {path!r} (deleted but not yet "
                "physically purged) — run ivf_compact to purge them, "
                "then retry the append"
            )
    have = existing.select(F.col(exist_id).alias("_have_id"))
    bloom_meta = meta.get("id_bloom")
    if not idguard.filter_usable(bloom_meta):
        # missing OR hash-incompatible filter (probing a different
        # hash family can yield false negatives = double ingest):
        # exact path now, fresh filter rebuilt below
        bloom_meta = None
    ig_state = None
    if bloom_meta is not None:
        # corpus-independent prescreen (operators/idguard.py): the
        # committed filter is a superset of the indexed ids, so
        # filter-negative = definitely new with ZERO corpus IO; only
        # filter-positive ids (replays + false positives) pay the
        # exact anti-join against the cells id column.
        neg, maybe, ig_state = idguard.bloom_split(
            batch, p, bloom_meta, exist_id
        )
        fresh = (
            neg
            if maybe is None
            else neg.unionByName(
                maybe.join(
                    have, F.col(exist_id) == F.col("_have_id"), "left_anti"
                )
            )
        )
    else:
        maybe = batch  # pre-filter index: exact path for the whole batch
        fresh = batch.join(
            have, F.col(exist_id) == F.col("_have_id"), "left_anti"
        )
    if on_existing == "error":
        n_dup = (
            maybe.join(
                have, F.col(exist_id) == F.col("_have_id"), "left_semi"
            ).count()
            if maybe is not None
            else 0
        )
        if n_dup:
            raise ValueError(
                f"ivf_append: {n_dup} incoming id(s) are already indexed "
                f"at {path!r}; re-appending would duplicate cell rows "
                "(pass on_existing='skip' to make replays idempotent)"
            )
    fresh = fresh.localCheckpoint(eager=True)
    n_new = fresh.count()
    # A true verbatim replay of a COMPLETED append contributes nothing
    # new (every id is guarded away). A reused tag carrying NEW ids is
    # NOT a replay — it is a fresh append that must RE-record its
    # contribution (keeping the stale recording while appending new
    # rows would make a later replay of that tag exclude the wrong id
    # set and flip this batch's own docs novel -> duplicate).
    # Streaming callers also fold a content digest into the tag
    # (idguard.batch_digest), so tag collisions across different
    # content cannot reach here through the stream path at all.
    replay_of_completed = (
        tag is not None
        and tag == meta.get("last_append_tag")
        and n_new == 0
    )
    # pending crashed-append recordings: a LIST keyed by tag (the
    # band-index design) — a single slot would let a second writer's
    # tagged append overwrite a crashed batch's record, making that
    # batch's replay gate as fresh against an index already holding
    # its partial rows. A legacy single-slot record is MIGRATED into
    # the list in meta itself (not just read) so every later commit
    # path — including a different tag committing with zero new rows,
    # which skips the recording block entirely — preserves it and its
    # recording dir survives the keep-set GC.
    pending = list(meta.get("pending_appends") or [])
    legacy = meta.pop("pending_append", None)
    if legacy:
        pending.append(legacy)
        meta["pending_appends"] = pending
    prev_entry = next((e for e in pending if e.get("tag") == tag), None)
    app_dir = (prev_entry or {}).get("appended_ids")
    if n_new:
        if tag is not None:
            # Record the POST-GUARD contribution BEFORE any data
            # write so a replay can read the FIRST attempt's set
            # whatever the crash window; a crashed attempt's replay
            # REUSES the recorded set (its own recomputed post-guard
            # set can be smaller once rows landed).
            if app_dir is None or not os.path.exists(
                os.path.join(p, app_dir)
            ):
                # namespaced per index kind: a cohabiting band index
                # owns the bare "append_ids_v*" prefix, and recording
                # GC must never cross sidecars
                app_dir = _fresh_versioned_dir(
                    p,
                    "ivf_append_ids",
                    floor_names=[
                        e.get("appended_ids")
                        for e in pending
                        if e.get("appended_ids")
                    ]
                    + [meta.get("last_append_ids")],
                )
                fresh.select(exist_id).write.mode("overwrite").parquet(
                    os.path.join(p, app_dir)
                )
            meta["pending_appends"] = [
                e for e in pending if e.get("tag") != tag
            ] + [{"tag": tag, "appended_ids": app_dir}]
            meta.pop("pending_append", None)  # legacy single slot
        # -- persist the merged id-guard filter BEFORE the data append:
        # a committed filter must stay a SUPERSET of the indexed ids
        # (a missing id would let its replay skip the exact check and
        # double-ingest); supersets are safe, so the WHOLE batch goes
        # in and a crash mid-append leaves the replay filter-positive,
        # routed into the exact id-granular convergence path.
        idguard.bloom_extend(
            p,
            meta,
            ig_state,
            batch.select(F.col(exist_id).cast("string").alias("_s")),
            fallback_ids=existing.select(F.col(exist_id).cast("string")),
        )
        _atomic_sidecar_write(p, "ivf_index.json", meta)
        build = meta.get("build") or {}
        assign_metric = build.get("metric", meta["metric"])
        assigned = _assign_to_centroids(
            fresh,
            np.asarray(meta["centroids"]),
            id_col=exist_id,
            embedding_col=exist_emb,
            metric=assign_metric,
        )
        assigned.write.mode("append").partitionBy("ivf_cell").parquet(loc)
    # -- final commit: re-stamp, promote the tag, GC recordings --------
    import shutil

    commit = False
    src = meta.get("source")
    if src is not None:
        meta["source"] = _source_stamp((src["root"], src["name"]))
        commit = True
    if tag is not None:
        # clear only THIS tag's pending entry — other writers'
        # crashed-batch recordings must survive until their replays
        remaining = [
            e
            for e in (meta.get("pending_appends") or [])
            if e.get("tag") != tag
        ]
        if remaining:
            meta["pending_appends"] = remaining
        else:
            meta.pop("pending_appends", None)
        meta.pop("pending_append", None)  # legacy single slot
        meta["last_append_tag"] = tag
        if not replay_of_completed:
            # None = recorded as an all-duplicate (empty) contribution;
            # a pure replay of a COMPLETED append must not overwrite
            # the first attempt's record with its own empty set
            meta["last_append_ids"] = app_dir
        commit = True
    if commit:
        _atomic_sidecar_write(p, "ivf_index.json", meta)
        keep = {meta.get("last_append_ids")} | {
            e.get("appended_ids")
            for e in (meta.get("pending_appends") or [])
        }
        for d_ in os.listdir(p):
            if d_.startswith("ivf_append_ids_v") and d_ not in keep:
                shutil.rmtree(os.path.join(p, d_), ignore_errors=True)
    idguard.gc_bloom_files(
        p, {(meta.get("id_bloom") or {}).get("location")}
    )
    return n_new


def ivf_appended_ids(spark, path: str, tag: str) -> DataFrame | None:
    """The id set a TAGGED ``ivf_append`` actually contributed (its
    post-guard fresh ids, recorded before the batch's data write) —
    what a replayed semantic-gate micro-batch excludes from the
    index's rows so first-attempt verdicts republish exactly (same
    contract as ``band_index_appended_ids``; see that docstring for
    why whole-batch exclusion is wrong for same-id redeliveries).
    Served from the pending record (crashed append) or
    ``last_append_tag`` (completed). Returns a one-column DataFrame
    (empty when the append was recorded as all-duplicate), ``None``
    when the tag matches but carries no recording, and raises
    ``KeyError`` for unknown tags."""
    import json
    import os

    p = _local_sidecar_path(path)
    with open(os.path.join(p, "ivf_index.json")) as f:
        meta = json.load(f)
    pending = list(meta.get("pending_appends") or [])
    legacy = meta.get("pending_append")
    if legacy:
        pending.append(legacy)
    entry = next((e for e in pending if e.get("tag") == tag), None)
    if entry is not None:
        d = entry.get("appended_ids")
    elif meta.get("last_append_tag") == tag:
        if "last_append_ids" not in meta:
            return None
        d = meta["last_append_ids"]
    else:
        raise KeyError(
            f"IVF index at {path!r} records no append tagged {tag!r}"
        )
    if d is None:
        cells = spark.read.parquet(
            os.path.join(p, meta.get("location", "cells"))
        )
        idc = [c for c in cells.columns if c != "ivf_cell"][0]
        return cells.select(idc).limit(0)
    return spark.read.parquet(os.path.join(p, d))


def _tombstone_prefix(sidecar: str) -> str:
    """Tombstone recording dirs are NAMESPACED per sidecar kind — an
    IVF, an IVF-PQ, and a graph index cohabiting one directory must
    never GC each other's recordings (the same isolation rule as the
    ``ivf_append_ids`` vs bare ``append_ids`` prefixes)."""
    s = str(sidecar)
    if s.startswith("ivf_pq"):
        return "ivf_pq_tombstones"
    if s.startswith("graph"):
        return "graph_tombstones"
    return "ivf_tombstones"


def _tombstones_df(spark, p: str, meta: dict) -> DataFrame | None:
    """The sidecar's tombstone recording as a one-column DataFrame
    (``_ts_id`` string) — ``None`` when the index carries no
    tombstones. The set is bounded by compaction cadence (``
    ivf_compact`` purges it), never by corpus size."""
    import os

    ts = meta.get("tombstones")
    if not ts or not int(ts.get("n") or 0):
        return None
    return spark.read.parquet(os.path.join(p, ts["location"]))


def _mask_tombstones(spark, p: str, meta: dict, df: DataFrame, id_col: str) -> DataFrame:
    """Serve-time tombstone mask: anti-join the cells dataset against
    the (small, compaction-bounded) tombstoned-id set. Broadcast is
    explicit — the set's size is a POLICY invariant
    (``MaintenancePolicy.tombstone_threshold`` compacts before it
    grows past a fraction of the corpus ids, and ids are tiny next to
    embeddings), so the mask never shuffles the corpus."""
    ts = _tombstones_df(spark, p, meta)
    if ts is None:
        return df
    return df.join(
        F.broadcast(ts),
        F.col(id_col).cast("string") == F.col("_ts_id"),
        "left_anti",
    )


def _parquet_rows(loc: str) -> int:
    """Row count from parquet FOOTERS only (O(files) metadata reads,
    zero data IO) — what lets a maintenance tick price the tombstone
    fraction without a corpus scan."""
    import os

    import pyarrow.parquet as papq

    n = 0
    for root_, _dirs, files in os.walk(loc):
        for f in files:
            if f.endswith(".parquet"):
                n += papq.ParquetFile(
                    os.path.join(root_, f)
                ).metadata.num_rows
    return n


@_serialized_writer()
def ivf_delete(
    spark,
    path: str,
    ids,
    *,
    sidecar: str = "ivf_index.json",
    expected_prev_etag: str | None = None,
) -> int:
    """Incremental vector DELETE: tombstone ``ids`` in a persisted
    IVF (or, via ``sidecar``, IVF-PQ) index — the delete-side twin of
    ``ivf_append``. The reference's collection is mutable
    (``collection.delete`` — the get-or-create surface at sas:132
    implies the full Chroma CRUD), and before this the only honest
    answers to "the collection deleted rows" were a full
    ``ivf_refresh`` k-means rebuild or serving stale. Tombstones are
    the standard third way (Lucene deleted-docs / FAISS
    ``remove_ids`` semantics): record the deleted ids in a tiny
    versioned sidecar recording, MASK them at read time
    (``ivf_read`` anti-joins them out), and physically purge at the
    next ``ivf_compact``. Cost: O(batch + existing tombstones)
    bookkeeping plus ONE id-column scan of the cells dataset — the
    deleted ids are all filter-positive in the id-guard Bloom by
    construction, so the exact intersect (which keeps the recording
    minimal and re-append refusals honest) cannot be prescreened
    away — but never a data rewrite, so the index transitions
    stale -> fresh in id-scan time however wide the embedding rows.

    ``ids``: a list OR a one-column DataFrame (first column is cast
    to string). Ids not physically present in the index are dropped
    via the id-guard Bloom prescreen (filter-negative = definitely
    not indexed, zero corpus IO) + exact semi-join on the survivors,
    so the recorded set stays minimal and the reported count honest.

    Crash-safe and replay-idempotent: the merged tombstone recording
    lands in a fresh monotonic versioned dir FIRST, then one atomic
    sidecar swap commits {recording location, count, re-derived
    source etag} together — a crash before the swap leaves the old
    index intact (orphan dir GC'd at the next commit), and a replay
    of a completed delete finds every id already tombstoned and
    returns 0 without touching the sidecar. ``expected_prev_etag``:
    same foreign-mutation fence as ``ivf_append`` — pass the etag
    observed BEFORE your own ``collection_delete``; a mismatch means
    something else mutated the collection since the index was
    stamped, and re-stamping would launder that mutation
    (StaleIndexError prescribes ``ivf_refresh``).

    Re-appending a tombstoned id is REFUSED by ``ivf_append``
    (``TombstonedIdError``) until a compact purges the old row —
    id-granular masking cannot distinguish the old physical row from
    a new one under the same id. Returns the number of NEWLY
    tombstoned ids."""
    import json
    import os

    p = _local_sidecar_path(path)
    with open(os.path.join(p, sidecar)) as f:
        meta = json.load(f)
    if isinstance(ids, DataFrame):
        first = ids.columns[0]
        batch = ids.select(F.col(first).cast("string").alias("_del_id"))
    else:
        batch = spark.createDataFrame(
            [(str(i),) for i in ids], "_del_id string"
        )
    batch = batch.where(F.col("_del_id").isNotNull()).dropDuplicates(
        ["_del_id"]
    ).localCheckpoint(eager=True)

    ts_prev = _tombstones_df(spark, p, meta)
    if ts_prev is not None:
        fresh_batch = batch.join(
            ts_prev, F.col("_del_id") == F.col("_ts_id"), "left_anti"
        )
    else:
        fresh_batch = batch
    if fresh_batch.limit(1).count() == 0:
        # replay of a completed delete (or an all-tombstoned / empty
        # batch): the index already masks every id — no recording
        # write. The stamp is still HEALED when the collection's etag
        # moved on (a predicate delete that matched 0 rows still
        # swaps the data dir; without this the index would stay stale
        # forever) — but ONLY under the same fence as the main path:
        # when the caller pinned expected_prev_etag and the recorded
        # stamp differs, the etag movement belongs to someone else's
        # mutation, and healing over it would launder exactly what
        # the fence exists to catch (the index stays honestly stale).
        src = meta.get("source")
        if src is not None and (
            expected_prev_etag is None
            or src.get("etag") == expected_prev_etag
        ):
            stamp = _source_stamp((src["root"], src["name"]))
            if stamp != src:
                meta["source"] = stamp
                _atomic_sidecar_write(p, sidecar, meta)
        return 0

    if expected_prev_etag is not None:
        from vector_databases___hydrate_chroma_db_collection_spark.errors import (
            StaleIndexError,
        )

        src = meta.get("source")
        recorded = src["etag"] if src else None
        if recorded != expected_prev_etag:
            raise StaleIndexError(
                f"index at {path!r} records etag "
                f"{str(recorded)[:12]!r} but the delete expected "
                f"{expected_prev_etag[:12]!r}: the source collection "
                "was mutated by something other than this delete "
                "since the index was last stamped — run ivf_refresh "
                "(or rebuild) instead"
            )

    from vector_databases___hydrate_chroma_db_collection_spark.operators import (
        idguard,
    )

    loc = os.path.join(p, meta.get("location", "cells"))
    cells = spark.read.parquet(loc)
    idc = [c for c in cells.columns if c not in ("ivf_cell", "pq_code")][0]
    have = cells.select(F.col(idc).cast("string").alias("_have_id"))
    bloom_meta = meta.get("id_bloom")
    if idguard.filter_usable(bloom_meta):
        # corpus-independent prescreen: filter-negative ids are
        # DEFINITELY not indexed -> nothing to tombstone for them
        _neg, maybe, _ig_state = idguard.bloom_split(
            fresh_batch, p, bloom_meta, "_del_id"
        )
        present = (
            maybe.join(
                have, F.col("_del_id") == F.col("_have_id"), "left_semi"
            )
            if maybe is not None
            else fresh_batch.limit(0)
        )
    else:
        present = fresh_batch.join(
            have, F.col("_del_id") == F.col("_have_id"), "left_semi"
        )
    present = present.select(
        F.col("_del_id").alias("_ts_id")
    ).localCheckpoint(eager=True)
    n_new = present.count()
    commit = n_new > 0
    prefix = _tombstone_prefix(sidecar)
    if commit:
        merged = (
            present if ts_prev is None else ts_prev.unionByName(present)
        ).dropDuplicates(["_ts_id"])
        ts_dir = _fresh_versioned_dir(
            p,
            prefix,
            floor_names=[(meta.get("tombstones") or {}).get("location")],
        )
        merged.write.mode("overwrite").parquet(os.path.join(p, ts_dir))
        n_ts = spark.read.parquet(os.path.join(p, ts_dir)).count()
        meta["tombstones"] = {"location": ts_dir, "n": int(n_ts)}
    # re-stamp even when the batch tombstoned nothing NEW in the
    # index (the caller's collection delete may have removed rows the
    # index never held — e.g. hydration-gated docs): the index is
    # consistent with the post-delete collection either way, and the
    # stamp is what lets the etag fence pass again
    src = meta.get("source")
    if src is not None:
        meta["source"] = _source_stamp((src["root"], src["name"]))
        commit = True
    if commit:
        _atomic_sidecar_write(p, sidecar, meta)
        import shutil

        keep = {(meta.get("tombstones") or {}).get("location")}
        for d_ in os.listdir(p):
            if d_.startswith(prefix + "_v") and d_ not in keep:
                shutil.rmtree(os.path.join(p, d_), ignore_errors=True)
    return n_new


def _clone_untouched_cells(data_dir: str, staging: str, touched: set) -> int:
    """Carry every ``ivf_cell=N`` partition dir NOT in ``touched``
    forward by hardlink (copy fallback) — the cells-layout twin of
    ``plans.collection.clone_untouched_buckets`` (see that docstring
    for the crash-atomicity argument and the object-store note).
    Returns the number of files cloned."""
    import os
    import shutil

    if not os.path.isdir(data_dir):
        return 0
    os.makedirs(staging, exist_ok=True)
    cloned = 0
    for d in os.listdir(data_dir):
        if not d.startswith("ivf_cell="):
            continue
        try:
            cell = int(d.split("=", 1)[1])
        except ValueError:
            continue
        if cell in touched:
            continue
        src = os.path.join(data_dir, d)
        dst = os.path.join(staging, d)
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(src):
            s = os.path.join(src, f)
            if not os.path.isfile(s):
                continue
            try:
                os.link(s, os.path.join(dst, f))
            except OSError:
                shutil.copy2(s, os.path.join(dst, f))
            cloned += 1
    return cloned


def _surgical_replace(
    spark,
    p: str,
    sidecar: str,
    meta: dict,
    batch_ids: DataFrame,
    new_rows: DataFrame,
) -> int:
    """The shared core of ``ivf_upsert`` / ``pq.ivf_pq_upsert``:
    replace every physical row whose id is in ``batch_ids`` with the
    (already cell-assigned, already encoded) ``new_rows``, touching
    only the CELL PARTITIONS involved. One id-column scan finds the
    old rows' cells; those cells' survivors plus ALL new rows land in
    a fresh versioned dir in one write; every untouched cell dir is
    hardlink-cloned forward (O(files) metadata ops, no data read);
    the sidecar swap is the single atomic commit point — delete and
    re-add publish together, readers see the whole upsert or none of
    it. Updated ids leave the tombstone set (an upsert RESURRECTS a
    deleted id — the new row is the only physical row, so the
    id-granular mask ambiguity that blocks plain re-appends does not
    arise), and the id-guard filter is extended with the batch
    (superset invariant). Returns the number of ids that had an old
    row (the rest are pure adds)."""
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.operators import (
        idguard,
    )

    loc = os.path.join(p, meta.get("location", "cells"))
    cells = spark.read.parquet(loc)
    idc = [c for c in cells.columns if c not in ("ivf_cell", "pq_code")][0]
    # no broadcast hint on the batch: unlike the tombstone recordings
    # (policy-bounded small), an upsert batch is caller-sized — a bulk
    # re-embed can be millions of rows, and a forced broadcast would
    # OOM the driver; AQE broadcasts the small common case on its own
    old = cells.join(
        batch_ids,
        F.col(idc).cast("string") == F.col("_up_id"),
        "left_semi",
    )
    # <= one row per updated id: the touched-cell list and the
    # updated count are both bounded by the batch
    old_facts = old.groupBy("ivf_cell").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    touched = {int(r["ivf_cell"]) for r in old_facts}
    n_updated = int(sum(r["n"] for r in old_facts))
    new_dir = _fresh_cells_dir(p, meta.get("location"))
    new_loc = os.path.join(p, new_dir)
    survivors = cells.filter(F.col("ivf_cell").isin(list(touched))).join(
        batch_ids,
        F.col(idc).cast("string") == F.col("_up_id"),
        "left_anti",
    ) if touched else None
    payload = (
        new_rows
        if survivors is None
        else survivors.unionByName(new_rows)
    )
    payload.write.mode("append").partitionBy("ivf_cell").parquet(new_loc)
    _clone_untouched_cells(loc, new_loc, touched)
    # filter superset BEFORE the swap (same invariant as appends)
    bloom_meta = meta.get("id_bloom")
    if idguard.filter_usable(bloom_meta):
        st = idguard.bloom_read(p, bloom_meta["location"])
        idguard.bloom_extend(
            p, meta, st, batch_ids.select(F.col("_up_id").alias("_s"))
        )
    ts_prev = _tombstones_df(spark, p, meta)
    if ts_prev is not None:
        # resurrect: updated ids leave the tombstone set
        still = ts_prev.join(
            batch_ids,
            F.col("_ts_id") == F.col("_up_id"),
            "left_anti",
        ).localCheckpoint(eager=True)
        n_still = still.count()
        prefix = _tombstone_prefix(sidecar)
        if n_still != int((meta.get("tombstones") or {}).get("n") or 0):
            if n_still:
                ts_dir = _fresh_versioned_dir(
                    p,
                    prefix,
                    floor_names=[(meta.get("tombstones") or {}).get("location")],
                )
                still.write.mode("overwrite").parquet(
                    os.path.join(p, ts_dir)
                )
                meta["tombstones"] = {"location": ts_dir, "n": int(n_still)}
            else:
                meta.pop("tombstones", None)
    old_meta_loc = {"location": meta.get("location", "cells")}
    meta["location"] = new_dir
    src = meta.get("source")
    if src is not None:
        meta["source"] = _source_stamp((src["root"], src["name"]))
    _atomic_sidecar_write(p, sidecar, meta)
    _drop_old_cells(p, old_meta_loc, new_dir)
    idguard.gc_bloom_files(p, {(meta.get("id_bloom") or {}).get("location")})
    prefix = _tombstone_prefix(sidecar)
    keep = {(meta.get("tombstones") or {}).get("location")}
    import shutil

    for d_ in os.listdir(p):
        if d_.startswith(prefix + "_v") and d_ not in keep:
            shutil.rmtree(os.path.join(p, d_), ignore_errors=True)
    return n_updated


@_serialized_writer()
def ivf_upsert(
    spark,
    path: str,
    rows: DataFrame,
    *,
    id_col: str | None = None,
    embedding_col: str | None = None,
    expected_prev_etag: str | None = None,
) -> tuple[int, int]:
    """Incremental vector UPDATE-or-ADD: replace the indexed vectors
    for ``rows``' ids (and add the ids the index has never held) by
    SURGICAL CELL REWRITE — the missing middle of the index CRUD.
    ``ivf_append`` cannot update (it refuses known ids), ``ivf_delete``
    + re-append is blocked until a full-compact purge, and
    ``ivf_refresh`` re-trains k-means over the whole corpus; this
    rewrites ONLY the cell partitions holding the updated ids' old
    rows (found with one id-column scan), hardlink-clones every other
    cell forward (O(files) metadata ops — the
    ``plans.collection.clone_untouched_buckets`` recipe applied to the
    cells layout), assigns the new vectors to their nearest EXISTING
    centroid (no retrain — update quality degrades only with drift,
    which the balance/recall audits already watch), and commits
    delete+add together in ONE atomic sidecar swap: readers see the
    whole upsert or none of it, never an index missing the updated
    ids. Cost: O(touched cells' data + batch) — at 4096 cells a
    2k-row upsert touches <= 2k cells ~ half the corpus worst-case,
    but real batches cluster (drifted re-encodes land near their old
    cells) and small batches touch few cells; the floor is the
    id-column scan, never a full data rewrite, never a k-means.

    Upserting a TOMBSTONED id resurrects it: the old physical row is
    purged by this very rewrite, so the id leaves the tombstone set
    and the new row serves — the one mutation ``TombstonedIdError``
    blocks elsewhere, legal here precisely because the ambiguity
    (two physical rows under one masked id) cannot arise.

    ``expected_prev_etag``: the same foreign-mutation fence as
    append/delete — pass the etag observed before your own
    ``collection_update``/upsert; the commit re-stamps to the current
    etag so the index transitions stale -> fresh. Crash-safe: all
    writes land in the fresh versioned dir before the swap; a crash
    leaves the old index intact (orphan dir GC'd by later lifecycle
    points) and the replay redoes the whole upsert idempotently
    (replacing a row with itself converges).

    Returns ``(n_updated, n_added)``."""
    import json
    import os

    p = _local_sidecar_path(path)
    with open(os.path.join(p, "ivf_index.json")) as f:
        meta = json.load(f)
    if expected_prev_etag is not None:
        from vector_databases___hydrate_chroma_db_collection_spark.errors import (
            StaleIndexError,
        )

        src = meta.get("source")
        recorded = src["etag"] if src else None
        if recorded != expected_prev_etag:
            raise StaleIndexError(
                f"IVF index at {path!r} records etag "
                f"{str(recorded)[:12]!r} but the upsert expected "
                f"{expected_prev_etag[:12]!r}: the source collection "
                "was mutated by something other than this upsert "
                "since the index was last stamped — run ivf_refresh "
                "instead"
            )
    loc = os.path.join(p, meta.get("location", "cells"))
    existing = spark.read.parquet(loc)
    exist_id, exist_emb = [c for c in existing.columns if c != "ivf_cell"][:2]
    ic = id_col or exist_id
    ec = embedding_col or exist_emb
    types = dict(existing.dtypes)
    batch = (
        rows.select(
            F.col(ic).cast(types[exist_id]).alias(exist_id),
            F.col(ec).cast(types[exist_emb]).alias(exist_emb),
        )
        .dropDuplicates([exist_id])
        .localCheckpoint(eager=True)
    )
    n_batch = batch.count()
    if n_batch == 0:
        return (0, 0)
    build = meta.get("build") or {}
    assigned = _assign_to_centroids(
        batch,
        np.asarray(meta["centroids"]),
        id_col=exist_id,
        embedding_col=exist_emb,
        metric=build.get("metric", meta["metric"]),
    ).localCheckpoint(eager=True)
    batch_ids = batch.select(
        F.col(exist_id).cast("string").alias("_up_id")
    ).localCheckpoint(eager=True)
    n_updated = _surgical_replace(
        spark, p, "ivf_index.json", meta, batch_ids, assigned
    )
    return (n_updated, n_batch - n_updated)


def ivf_tombstoned_ids(
    spark, path: str, *, sidecar: str = "ivf_index.json"
) -> DataFrame:
    """The index's current tombstone set as a one-column DataFrame
    (``_ts_id`` string; empty when the index carries none) — the
    observability twin of ``ivf_appended_ids`` for the delete path."""
    import json
    import os

    p = _local_sidecar_path(path)
    with open(os.path.join(p, sidecar)) as f:
        meta = json.load(f)
    ts = _tombstones_df(spark, p, meta)
    if ts is not None:
        return ts
    return spark.createDataFrame([], "_ts_id string")


def _dist_to_centroid(emb, cen, metric: str, dim: int | None = None):
    """Row-to-assigned-centroid distance as a pure expression (no
    UDF): l2 distance, or cosine DISTANCE (1 - cos). Used by the
    build-time training stats and the balance audit, so both sides of
    the drift comparison use identical math.

    With ``dim`` known (every call site holds the centroid matrix) the
    fold is UNROLLED into per-index try_element_at terms that
    whole-stage codegen compiles — the zip_with/aggregate HOF chain is
    CodegenFallback, interpreted per element (the same pathology the
    r15 literal-distance unroll removed from the serve paths; see
    functions/vector.py module comment). The unrolled form keeps the
    HOF's exact left-to-right IEEE fold order AND its per-element
    types (a float32 embedding squares in float32 before the double
    accumulate, exactly like ``transform(emb, x*x)``), so the audit
    oracles cannot move. Same uniform-dim caveat as the literal
    family: rows LONGER than dim would score on the first ``dim``
    elements instead of going NULL — IVF cells are uniform-dim by
    construction."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        _LITERAL_DIM_CAP,
    )

    if dim is not None and 0 < int(dim) <= _LITERAL_DIM_CAP:
        dim = int(dim)
        if metric == "cosine":
            dot, nx2, nc2 = F.lit(0.0), F.lit(0.0), F.lit(0.0)
            for i in range(1, dim + 1):
                e = F.try_element_at(emb, F.lit(i))
                c = F.try_element_at(cen, F.lit(i))
                dot = dot + e * c
                nx2 = nx2 + e * e
                nc2 = nc2 + c * c
            return F.lit(1.0) - dot / F.greatest(
                F.sqrt(nx2) * F.sqrt(nc2), F.lit(1e-300)
            )
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            d = F.try_element_at(emb, F.lit(i)) - F.try_element_at(
                cen, F.lit(i)
            )
            acc = acc + d * d
        return F.sqrt(acc)
    dot = F.aggregate(
        F.zip_with(emb, cen, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if metric == "cosine":
        nx = F.sqrt(
            F.aggregate(
                F.transform(emb, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        nc = F.sqrt(
            F.aggregate(
                F.transform(cen, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        # ANSI mode raises on /0 — floor the denominator
        return F.lit(1.0) - dot / F.greatest(nx * nc, F.lit(1e-300))
    return F.sqrt(
        F.aggregate(
            F.zip_with(emb, cen, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _centroid_df(spark, C: np.ndarray) -> DataFrame:
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(C)],
        "ivf_cell int, _centroid array<double>",
    )


def _cell_stats(
    spark, cells: DataFrame, C: np.ndarray, metric: str
) -> DataFrame:
    """Per-cell (n_rows, mean assignment distance) over an assigned
    cells dataset: one broadcast join against the (tiny) centroid
    table + one map-side-combinable aggregate — a single scan however
    large the corpus."""
    emb = [c for c in cells.columns if c not in ("ivf_cell",)][1]
    return (
        cells.join(F.broadcast(_centroid_df(spark, C)), "ivf_cell")
        .select(
            "ivf_cell",
            _dist_to_centroid(
                F.col(emb), F.col("_centroid"), metric, dim=int(C.shape[1])
            ).alias("_d"),
        )
        .groupBy("ivf_cell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.avg("_d").alias("mean_dist"),
        )
    )


def ivf_balance_audit(
    spark,
    path: str,
    *,
    skew_threshold: float = 4.0,
    drift_threshold: float = 1.5,
    dist_decimals: int = 4,
) -> DataFrame:
    """The audit ``ivf_append`` defers to ("refresh when recall or
    balance audits say so"): per-cell occupancy and assignment-
    distance drift of the CURRENT cells dataset versus the sidecar's
    recorded build-time training stats, as a small (n_centroids-row)
    DataFrame —

    ``(ivf_cell, n_rows, occupancy_ratio, mean_dist, trained_n_rows,
    trained_mean_dist, refresh_recommended)``

    ``occupancy_ratio`` is the cell's share of rows relative to a
    perfectly balanced index (n_rows * n_centroids / total);
    ``refresh_recommended`` flips when a cell is over
    ``skew_threshold``-times overfull (hot cells make nprobe scans
    lopsided and recall/latency unpredictable; note the ratio is
    bounded by ``n_centroids``, so pick a threshold below it — the
    default 4.0 assumes production-sized cell counts) or its mean assignment
    distance exceeds ``drift_threshold``-times its trained mean (the
    appended data has drifted away from the trained centroids —
    nearest-EXISTING-centroid assignment is getting worse, run
    ``ivf_refresh``). Indexes written before training stats were
    recorded audit occupancy only (trained columns NULL, drift
    untested).

    ``recell_recommended`` (one value, stamped on every row) is the
    CELL-COUNT hint the constant-occupancy sizing implies
    (``auto_n_centroids``): it flips when appends have grown MEAN
    occupancy a decade past the build-time mean (or, for indexes
    without training stats, past 10x ``TARGET_CELL_ROWS``) — at that
    point every cell is uniformly overfull, ``refresh_recommended``'s
    per-cell skew test stays quiet, but a fixed-nprobe serve scans
    10x the rows the build was sized for; rebuild with
    ``n_centroids="auto"`` rather than re-training at the old count. One scan of the cells dataset (broadcast centroid
    join + map-side-combinable aggregate) — audit cost is corpus-scan
    bound, run it at the cadence appends warrant, not per batch."""
    import json
    import os

    p = _local_sidecar_path(path)
    with open(os.path.join(p, "ivf_index.json")) as f:
        meta = json.load(f)
    cells = spark.read.parquet(
        os.path.join(p, meta.get("location", "cells"))
    )
    # audit the LOGICAL index (tombstones masked): occupancy and
    # drift verdicts drive refresh decisions about SERVABLE content —
    # rows a delete already masked must not keep a cell looking hot
    cells = _mask_tombstones(
        spark, p, meta, cells,
        [c for c in cells.columns if c != "ivf_cell"][0],
    )
    C = np.asarray(meta["centroids"])
    build = meta.get("build") or {}
    metric = build.get("metric", meta["metric"])
    # the ONE corpus scan: collect the <= n_centroids aggregate rows
    # and derive everything else locally — summing via the DataFrame
    # would execute the scan once for the total and AGAIN for the
    # report (and a report collected after a later append would mix
    # scan generations)
    stat_rows = _cell_stats(spark, cells, C, metric).collect()
    n_cells = int(meta["n_centroids"])
    total = sum(r["n_rows"] for r in stat_rows)
    cur = spark.createDataFrame(
        [
            (int(r["ivf_cell"]), int(r["n_rows"]), float(r["mean_dist"]))
            for r in stat_rows
        ],
        "ivf_cell int, n_rows bigint, mean_dist double",
    )
    trained = meta.get("train_stats")
    if trained is not None:
        tdf = spark.createDataFrame(
            [
                (i, int(n), float(d))
                for i, (n, d) in enumerate(
                    zip(trained["cell_rows"], trained["cell_mean_dist"])
                )
            ],
            "ivf_cell int, trained_n_rows bigint, trained_mean_dist double",
        )
    else:
        tdf = spark.createDataFrame(
            [(i, None, None) for i in range(n_cells)],
            "ivf_cell int, trained_n_rows bigint, trained_mean_dist double",
        )
    built_total = (
        sum(trained["cell_rows"]) if trained is not None else None
    )
    mean_occ = total / max(n_cells, 1)
    if built_total:
        recell = mean_occ >= 10.0 * max(built_total / n_cells, 1.0)
    else:
        recell = mean_occ >= 10.0 * TARGET_CELL_ROWS
    occ = (F.col("n_rows") * n_cells / F.greatest(F.lit(total), F.lit(1))).cast(
        "double"
    )
    drifted = F.coalesce(
        (F.col("trained_mean_dist") > 0)
        & (
            F.col("mean_dist")
            > F.lit(drift_threshold) * F.col("trained_mean_dist")
        ),
        F.lit(False),
    )
    return (
        tdf.join(cur, "ivf_cell", "left")
        .select(
            "ivf_cell",
            F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
            F.round(
                F.coalesce(occ, F.lit(0.0)), dist_decimals
            ).alias("occupancy_ratio"),
            F.round("mean_dist", dist_decimals).alias("mean_dist"),
            "trained_n_rows",
            F.round("trained_mean_dist", dist_decimals).alias(
                "trained_mean_dist"
            ),
            (
                (F.coalesce(occ, F.lit(0.0)) > skew_threshold) | drifted
            ).alias("refresh_recommended"),
            F.lit(bool(recell)).alias("recell_recommended"),
        )
    )


def _sample_queries(
    df: DataFrame, id_col: str, embedding_col: str, n_queries: int
) -> DataFrame:
    """The deterministic md5-rank query draw both recall audits use
    (and their SQL oracles replay): rank ids by
    ``md5(cast(id as string))``, take the lowest ``n_queries`` (a
    TakeOrderedAndProject — no full sort materialized), return
    ``(qid, q_embedding)`` eagerly checkpointed (two serving joins
    consume the sample; neither may re-execute the draw). ONE
    implementation — the sampling discipline is a cross-audit
    determinism contract, and a tweak applied to only one copy would
    silently desynchronize the audits from each other and from their
    oracles."""
    return (
        df.select(
            F.col(id_col).alias("qid"),
            F.col(embedding_col).alias("q_embedding"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "qid")
        .limit(int(n_queries))
        .drop("_h")
        .localCheckpoint(eager=True)
    )


def _recall_report(
    exact: DataFrame,
    approx: DataFrame,
    *,
    recall_threshold: float,
    decimals: int = 4,
) -> DataFrame:
    """Fold two (qid, neighbor_id) top-k sets into the per-query
    recall report shared by ``ivf_recall_audit`` and
    ``pq.ivf_pq_recall_audit``:

    ``(qid, n_hits, k_eff, recall_at_k, mean_recall,
    refresh_recommended)``

    ``k_eff`` is the number of GROUND-TRUTH neighbors the query
    actually has (< k on corpora smaller than k), so recall is never
    deflated by asking for more neighbors than exist. ``mean_recall``
    and the flag ride a global window — bounded by construction: both
    inputs hold <= n_queries * k rows and the grouped report
    <= n_queries rows, so the single-partition exchange the empty
    window frame implies moves a few KB, never corpus data."""
    from pyspark.sql import Window

    per = (
        exact.select("qid", "neighbor_id")
        .join(
            approx.select("qid", "neighbor_id").withColumn(
                "_hit", F.lit(1)
            ),
            ["qid", "neighbor_id"],
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("k_eff"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
        )
    )
    recall = F.col("n_hits") / F.col("k_eff")
    w = Window.partitionBy()
    mean_recall = F.avg(recall).over(w)
    return per.select(
        "qid",
        "n_hits",
        "k_eff",
        F.round(recall, decimals).alias("recall_at_k"),
        F.round(mean_recall, decimals).alias("mean_recall"),
        (mean_recall < F.lit(recall_threshold)).alias(
            "refresh_recommended"
        ),
    )


def ivf_recall_audit(
    spark,
    path: str,
    *,
    k: int = 10,
    n_queries: int = 64,
    nprobe: int = 3,
    recall_threshold: float = 0.9,
    score_decimals: int = 4,
) -> DataFrame:
    """The DIRECT measure the geometry audit cannot give: sampled
    ground-truth recall of the persisted index at production serving
    settings. ``ivf_balance_audit`` sees occupancy skew and assignment-
    distance drift — proxies; this answers the operative question
    ("do nprobe-cell probes still find the true neighbors?") by
    serving ``n_queries`` sampled corpus vectors through the index at
    ``nprobe`` and comparing against exhaustive ground truth.

    Sampling is DETERMINISTIC and corpus-order-free — the
    ``mix_negative_sampling`` discipline: rank ids by
    ``md5(cast(id as string))`` and take the lowest ``n_queries``
    (a TakeOrderedAndProject, no full sort materialized), so reruns
    and SQL oracles draw the identical query set. Both serving paths
    are the SAME operator (``ivf_knn_join``): the audited path at the
    caller's ``nprobe``, ground truth at ``nprobe = n_centroids``
    (exhaustive — per that operator's contract, identical to the
    exact join). Identical per-pair scoring on both sides means the
    sets differ only by cell pruning — recall measures EXACTLY the
    index's candidate-selection loss, never float noise.

    Output: one row per sampled query —
    ``(qid, n_hits, k_eff, recall_at_k, mean_recall,
    refresh_recommended)`` — the flag flips when mean recall falls
    under ``recall_threshold``. Cost: one exhaustive scoring pass of
    the corpus against ``n_queries`` vectors (the ground-truth side)
    plus the pruned probe — run it at audit cadence, not per batch,
    and size ``n_queries`` to the confidence needed. Closes
    ``ivf_append``'s "refresh when recall ... audits say so" loop
    with the recall half; pairs with ``ivf_balance_audit`` (geometry)
    and ``pq.ivf_pq_recall_audit`` (the compressed twin, which this
    design exists for: PQ saturation is hull-bounded and can audit
    near-clean under real drift — recall cannot be fooled that way).
    """
    import json
    import os

    p = _local_sidecar_path(path)
    with open(os.path.join(p, "ivf_index.json")) as f:
        meta = json.load(f)
    cells = spark.read.parquet(
        os.path.join(p, meta.get("location", "cells"))
    )
    C = np.asarray(meta["centroids"])
    metric = meta["metric"]
    idc, embc = [c for c in cells.columns if c != "ivf_cell"][:2]
    # logical rows only: a tombstoned vector is neither a valid query
    # draw nor a valid ground-truth neighbor (serving masks it), and
    # leaving it in would deflate measured recall with unservable hits
    cells = _mask_tombstones(spark, p, meta, cells, idc)
    queries = _sample_queries(cells, idc, embc, n_queries)
    approx = ivf_knn_join(
        queries,
        cells,
        C,
        k=k,
        id_col=idc,
        embedding_col=embc,
        metric=metric,
        nprobe=nprobe,
        score_decimals=score_decimals,
    )
    exact = ivf_knn_join(
        queries,
        cells,
        C,
        k=k,
        id_col=idc,
        embedding_col=embc,
        metric=metric,
        nprobe=int(C.shape[0]),
        score_decimals=score_decimals,
    )
    return _recall_report(
        exact, approx, recall_threshold=recall_threshold
    )


def _data_files(loc: str) -> int:
    """Parquet data-file count under a directory (bookkeeping files
    excluded) — the quantity compaction exists to bound."""
    import os

    n = 0
    for _root, _dirs, files in os.walk(loc):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


@_serialized_writer()
def ivf_compact(
    spark, path: str, *, sidecar: str = "ivf_index.json"
) -> tuple[int, int]:
    """Compact an append-grown IVF (or, via ``sidecar``, IVF-PQ)
    cells dataset: every ``ivf_append``/``ivf_pq_append`` lands one
    file per touched cell per batch (``mode('append')
    .partitionBy('ivf_cell')``), so a long ingest loop degrades every
    serve-time cell scan with per-file open/footer costs — the classic
    small-files problem, the vector twin of what
    ``band_index_compact`` fixes for the band index. This rewrites
    the CURRENT rows into a fresh versioned directory with each cell
    repartitioned into a single task (one data file per cell) and
    commits by the same atomic sidecar swap as a rebuild — concurrent
    readers see the pre-compact index until the swap, the post-compact
    index after, never a torn mix. LOGICAL content, centroids and
    codebooks are untouched (compaction is not a freshness event: the
    source stamp carries over unchanged) — but rows ``ivf_delete``
    tombstoned are physically PURGED here and the recording cleared
    (the Lucene merge discipline), after which the purged ids are
    re-appendable. The id-guard Bloom filter is RE-SIZED from the
    surviving id count, restoring the designed false-positive rate an
    append-grown index has outgrown.

    Returns ``(files_before, files_after)``. Safe to interleave with
    id-guarded appends: an append replayed across a compaction still
    converges (the guard is id-granular against the compacted rows).
    Cells large enough to need multi-file splits should lower
    ``spark.sql.files.maxRecordsPerFile`` for the session instead.
    """
    import json
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.operators import (
        idguard,
    )

    p = _local_sidecar_path(path)
    with open(os.path.join(p, sidecar)) as f:
        meta = json.load(f)
    old_dir = meta.get("location", "cells")
    old_loc = os.path.join(p, old_dir)
    before = _data_files(old_loc)
    df = spark.read.parquet(old_loc)
    # compaction is also the tombstone PURGE point (Lucene merge
    # semantics): ivf_delete's masked rows are physically dropped
    # here, the recording cleared, and the id-guard filter rebuilt
    # from the survivors — after which the purged ids are
    # re-appendable. Purging everything would leave an unreadable
    # empty dataset; refuse loudly instead.
    ts = _tombstones_df(spark, p, meta)
    if ts is not None:
        idc0 = [c for c in df.columns if c not in ("ivf_cell", "pq_code")][0]
        df = df.join(
            F.broadcast(ts),
            F.col(idc0).cast("string") == F.col("_ts_id"),
            "left_anti",
        )
        if df.limit(1).count() == 0:
            from vector_databases___hydrate_chroma_db_collection_spark.errors import (
                EngineError,
            )

            raise EngineError(
                f"ivf_compact: every row of the index at {path!r} is "
                "tombstoned — compacting would leave an empty cells "
                "dataset; drop the index directory and rebuild when "
                "new vectors arrive instead"
            )
    new_dir = _fresh_cells_dir(p, old_dir)
    new_loc = os.path.join(p, new_dir)
    (
        # one task per cell -> exactly one data file per cell dir
        df.repartition(int(meta["n_centroids"]), F.col("ivf_cell"))
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(new_loc)
    )
    cells_back = spark.read.parquet(new_loc)
    idc = [c for c in cells_back.columns if c not in ("ivf_cell", "pq_code")][0]
    meta["id_bloom"] = idguard.rebuild_filter(
        cells_back,
        F.col(idc).cast("string"),
        p,
        (meta.get("id_bloom") or {}).get("location"),
    )
    meta["location"] = new_dir
    meta.pop("tombstones", None)
    _atomic_sidecar_write(p, sidecar, meta)
    _drop_old_cells(p, {"location": old_dir}, new_dir)
    idguard.gc_bloom_files(p, {meta["id_bloom"]["location"]})
    if ts is not None:
        import shutil

        prefix = _tombstone_prefix(sidecar)
        for d_ in os.listdir(p):
            if d_.startswith(prefix + "_v"):
                shutil.rmtree(os.path.join(p, d_), ignore_errors=True)
    return before, _data_files(new_loc)


@_serialized_writer()
def ivf_refresh(
    spark,
    path: str,
    *,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> tuple[DataFrame, np.ndarray, str]:
    """The remedy ``StaleIndexError`` prescribes, as one call: re-read
    the source collection the sidecar names, rebuild the index with
    the sidecar's RECORDED build parameters (the ``build`` dict
    ``ivf_write`` stored: training metric, seed, sample_fraction —
    n_centroids comes from the sidecar either way), overwrite the
    persisted cells, re-stamp with the collection's CURRENT etag, and
    return the freshly-loaded (assigned_df, centroids, metric).

    Only works on stamped indexes — an index built from an arbitrary
    DataFrame has no recorded source to rebuild from (ValueError says
    so). Sidecars written WITHOUT a ``build`` record fall back to the
    search metric plus this function's seed/sample_fraction kwargs —
    note the search metric is not necessarily the training metric
    (l2-trained cells are often served with cosine), so pre-``build``
    indexes should be refreshed once with explicit intent and
    re-written with the record."""
    import json
    import os

    p = _local_sidecar_path(path)
    with open(os.path.join(p, "ivf_index.json")) as f:
        meta = json.load(f)
    src = meta.get("source")
    if src is None:
        raise ValueError(
            f"index at {path!r} carries no source-collection stamp; "
            "rebuild it from the original DataFrame with ivf_build + ivf_write"
        )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    build = meta.get("build") or {}
    build_metric = build.get("metric", meta["metric"])
    build_seed = int(build.get("seed", seed))
    build_sf = build.get("sample_fraction", sample_fraction)
    coll = read_collection(spark, src["root"], src["name"])
    assigned, centroids = ivf_build(
        coll,
        id_col="id",
        embedding_col="embedding",
        n_centroids=int(meta["n_centroids"]),
        metric=build_metric,
        seed=build_seed,
        sample_fraction=build_sf,
    )
    ivf_write(
        assigned,
        centroids,
        path,
        metric=meta["metric"],
        source=(src["root"], src["name"]),
        build={
            "metric": build_metric,
            "seed": build_seed,
            "sample_fraction": build_sf,
        },
    )
    return ivf_read(spark, path)
