"""Chroma's read-side and delete API over managed collections.

The reference only ever WRITES a collection (``collection.add``,
sas:177-190) and counts it (sas:134,193); retrieval is delegated to
Chroma's client API out of band (motivated but never implemented —
reference README.md:5). A user switching from the reference's Chroma
store to this engine still needs that client surface, so this module
re-expresses it Spark-first over the managed Parquet layout:

- ``collection_query``  = ``collection.query(query_embeddings=...,
  n_results=k, where=..., where_document=...)`` — filtered top-k
  similarity. The metadata/document predicates are compiled to native
  Column expressions and applied BEFORE the distance math
  (pre-filtering, the recall-exact strategy), so Catalyst prunes the
  scan first and the distance expression + TakeOrderedAndProject run
  only on survivors. No shuffle, no Python.
- ``collection_get``    = ``collection.get(ids=..., where=...,
  limit=..., offset=...)`` — point/paged reads. On a bucketed layout
  an id-list lookup filters on the ``id_bucket`` hive-partition
  column, so the scan prunes to the O(|ids|) buckets the ids hash
  into — a point read touches ~1/n_buckets of a 100 TB collection.
- ``collection_delete`` = ``collection.delete(ids=..., where=...)``.
  On a bucketed layout an id-list delete rewrites ONLY the affected
  buckets (dynamic partition overwrite, same pruning contract as
  upsert); predicate deletes and flat layouts rewrite into a fresh
  versioned dir and atomically swap the ``_current`` pointer, so
  readers never observe a half-deleted collection.

``where`` compilation covers Chroma's documented operator set
(implicit equality, ``$eq/$ne/$gt/$gte/$lt/$lte/$in/$nin``, and
``$and/$or`` composition); document predicates cover ``$contains`` /
``$not_contains``. Values stored in the canonical
``MAP<STRING,STRING>`` metadata compare numerically when the query
literal is numeric (``try_cast`` to double), string-wise otherwise —
matching how Chroma compares typed metadata. Negations follow
current Chroma (0.4.x+) set-complement semantics: ``$ne``/``$nin``
DO match documents that lack the key entirely (they are "everything
not matching ``$eq``/``$in``"), while every positive operator
requires the key to be present.

Validation is deliberately more lenient than Chroma's: a key spec
with several operators (``{"k": {"$gte": 1, "$lte": 5}}``) and
``$and``/``$or`` mixed with plain keys at the same level — shapes
Chroma rejects client-side — compile here to the obvious AND of
clauses instead of erroring. Filters valid in Chroma behave
identically; this engine just accepts a superset.
"""

from __future__ import annotations

import numbers

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.errors import EngineError
from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
    clone_untouched_buckets,
    current_data_dir,
    load_manifest,
    next_data_dir,
    read_collection,
    swap_data_dir,
)

_CMP_OPS = ("$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin")


def _is_num(v) -> bool:
    return isinstance(v, numbers.Number) and not isinstance(v, bool)


def _value_col(key: str, numeric: bool) -> Column:
    v = F.col("metadata")[key]
    return v.try_cast("double") if numeric else v


def _lit(v) -> Column:
    return F.lit(float(v)) if _is_num(v) else F.lit(v)


def _compile_cmp(key: str, op: str, v) -> Column:
    if op in ("$in", "$nin"):
        if not isinstance(v, (list, tuple)) or not v:
            raise EngineError(f"{op} on {key!r} needs a non-empty list")
        numeric = all(_is_num(x) for x in v)
        col = _value_col(key, numeric)
        hit = col.isin([float(x) if numeric else x for x in v])
        # $nin is the set complement of $in (current Chroma semantics):
        # it also matches docs where the key is missing or the value
        # fails the numeric cast — coalesce turns that NULL into a hit.
        return hit if op == "$in" else F.coalesce(~hit, F.lit(True))
    numeric = _is_num(v)
    col, lit = _value_col(key, numeric), _lit(v)
    if op == "$eq":
        return col == lit
    if op == "$ne":
        # complement of $eq — matches missing keys too (see module doc)
        return F.coalesce(col != lit, F.lit(True))
    if op == "$gt":
        return col > lit
    if op == "$gte":
        return col >= lit
    if op == "$lt":
        return col < lit
    if op == "$lte":
        return col <= lit
    raise EngineError(f"unsupported where operator {op!r}")


def compile_where(where: dict) -> Column:
    """Chroma ``where`` dict -> one boolean Column (codegen-friendly:
    plain map lookups, casts and comparisons — no UDFs)."""
    if not isinstance(where, dict) or not where:
        raise EngineError("where must be a non-empty dict")
    clauses: list[Column] = []
    for key, spec in where.items():
        if key in ("$and", "$or"):
            if not isinstance(spec, (list, tuple)) or len(spec) < 2:
                raise EngineError(f"{key} needs a list of >=2 clauses")
            parts = [compile_where(s) for s in spec]
            combined = parts[0]
            for p in parts[1:]:
                combined = (combined & p) if key == "$and" else (combined | p)
            clauses.append(combined)
        elif isinstance(spec, dict):
            if not spec:
                raise EngineError(
                    f"where key {key!r} has an empty operator dict"
                )
            for op, v in spec.items():
                clauses.append(_compile_cmp(key, op, v))
        else:
            clauses.append(_compile_cmp(key, "$eq", spec))
    out = clauses[0]
    for c in clauses[1:]:
        out = out & c
    return out


def compile_where_document(where_document: dict) -> Column:
    """Chroma ``where_document`` -> Column over the ``document`` text."""
    if not isinstance(where_document, dict) or len(where_document) != 1:
        raise EngineError("where_document must be a single-operator dict")
    [(op, v)] = where_document.items()
    if op == "$contains":
        return F.col("document").contains(v)
    if op == "$not_contains":
        return ~F.col("document").contains(v)
    raise EngineError(f"unsupported where_document operator {op!r}")


def _filtered(
    df: DataFrame,
    ids: list[str] | None,
    where: dict | None,
    where_document: dict | None,
) -> DataFrame:
    if ids is not None:
        df = df.filter(F.col("id").isin([str(i) for i in ids]))
    if where is not None:
        df = df.filter(compile_where(where))
    if where_document is not None:
        df = df.filter(compile_where_document(where_document))
    return df


def _buckets_for_ids(
    spark: SparkSession, ids: list[str], n_buckets: int
) -> list[int]:
    """The distinct bucket set an id list hashes into, computed with
    the layout's own expression (one tiny local job over a literal
    frame — never a scan of the collection); bounded by n_buckets."""
    return [
        r["b"]
        for r in spark.createDataFrame([(str(i),) for i in ids], "id string")
        .select(F.pmod(F.xxhash64("id"), F.lit(n_buckets)).alias("b"))
        .distinct()
        .collect()
    ]


def _prune_buckets_for_ids(
    spark: SparkSession, df: DataFrame, ids: list[str], n_buckets: int
) -> DataFrame:
    """Static partition pruning for an id-list lookup: filter the
    hive-partition column to the ids' bucket set (a literal IN-list,
    so the scan skips every other bucket dir)."""
    return df.filter(
        F.col("id_bucket").isin(_buckets_for_ids(spark, ids, n_buckets))
    )


_INCLUDE_MAP = {
    "documents": "document",
    "embeddings": "embedding",
    "metadatas": "metadata",
}


def _parse_include(
    include, *, default: tuple, distances_ok: bool = False
) -> tuple[list[str], bool]:
    """Chroma's literal ``include=[...]`` parameter -> (payload
    columns in canonical order, want_distance). ids always return —
    exactly Chroma's contract. Unknown entries raise; ``uris``/
    ``data`` (Chroma's multimodal loader fields) raise a typed
    not-supported error; ``distances`` is only legal where a query
    vector exists (``query``, not ``get``/``peek``)."""
    if include is None:
        include = list(default)
    want_distance = False
    cols = set()
    for item in include:
        if item == "distances":
            if not distances_ok:
                raise EngineError(
                    "include=['distances'] is only valid on query "
                    "(get/peek have no query vector to measure from)"
                )
            want_distance = True
        elif item in _INCLUDE_MAP:
            cols.add(_INCLUDE_MAP[item])
        elif item in ("uris", "data"):
            raise EngineError(
                f"include={item!r}: Chroma's multimodal loader fields "
                "are not supported by this engine (store binary "
                "payloads in a multimodal column instead)"
            )
        else:
            raise EngineError(
                f"unknown include entry {item!r}: expected "
                "documents/embeddings/metadatas"
                + ("/distances" if distances_ok else "")
            )
    ordered = [
        c for c in ("document", "embedding", "metadata") if c in cols
    ]
    return ordered, want_distance


def collection_get(
    spark: SparkSession,
    root: str,
    name: str,
    *,
    ids: list[str] | None = None,
    where: dict | None = None,
    where_document: dict | None = None,
    limit: int | None = None,
    offset: int = 0,
    include: list[str] | None = None,
) -> DataFrame:
    """``collection.get``: rows in canonical schema, id-ordered when
    paginating. ``include=[...]`` is Chroma's literal
    caller-controlled column set (default ``["documents",
    "metadatas"]`` — Chroma's get default; pass ``"embeddings"`` to
    add the vector column); ids always return.

    Pagination (limit/offset) sorts by id and keeps ``offset+limit``
    rows via TakeOrderedAndProject (driver-bounded by the page end,
    never a full global sort); unpaginated gets stream unordered.
    """
    payload, _ = _parse_include(
        include, default=("documents", "metadatas")
    )
    manifest = load_manifest(root, name)
    df = read_collection(spark, root, name, include_bucket=bool(manifest.n_buckets))
    if ids is not None and manifest.n_buckets:
        df = _prune_buckets_for_ids(spark, df, ids, manifest.n_buckets)
    df = _filtered(df, ids, where, where_document).select("id", *payload)
    if limit is None and offset == 0:
        return df
    if limit is None:
        raise EngineError("offset requires limit (unbounded offset pages are a scan)")
    page_end = offset + limit
    head = df.orderBy("id").limit(page_end)
    if offset == 0:
        return head
    from pyspark.sql import Window

    w = Window.orderBy("id")  # head is <= page_end rows: single-task window is fine
    return (
        head.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > offset)
        .drop("_rn")
    )


def collection_peek(
    spark: SparkSession,
    root: str,
    name: str,
    n: int = 10,
    *,
    include: list[str] | None = None,
) -> DataFrame:
    """``collection.peek``: the first ``n`` rows by id INCLUDING the
    embedding column (Chroma's peek default include-set); narrow or
    reorder with the literal ``include=[...]``. TakeOrderedAndProject
    — never a full sort."""
    payload, _ = _parse_include(
        include, default=("documents", "embeddings", "metadatas")
    )
    df = read_collection(spark, root, name)
    return df.orderBy("id").limit(n).select("id", *payload)


def collection_update(
    spark: SparkSession,
    root: str,
    name: str,
    updates: DataFrame,
    *,
    retain_previous: bool = False,
) -> int:
    """``collection.update``: overwrite document / metadata /
    embedding for EXISTING ids; ids not present in the collection are
    ignored (Chroma logs-and-skips rather than inserting — use the
    hydrate ``on_duplicate='upsert'`` path for insert-or-update).
    Returns how many rows were updated.

    ``updates`` must have an ``id`` column plus any subset of
    ``document`` / ``metadata`` / ``embedding``; unmentioned fields
    keep their stored values (per-row coalesce after a left join).
    Embedding updates are dim-validated against the manifest before
    any rewrite. Bucketed layouts rewrite only the buckets the
    updated ids hash into, hardlink-clone the untouched buckets into
    the same fresh versioned dir, and swap the ``_current`` pointer;
    flat layouts rewrite the whole set into a fresh dir and swap.
    Either way the swap is the single atomic commit point — readers
    see the whole update or none of it, and a crash mid-rewrite
    leaves the collection on its prior complete state.
    """
    manifest = load_manifest(root, name)
    bucketed = bool(manifest.n_buckets)
    upd_cols = set(updates.columns)
    if "id" not in upd_cols:
        raise EngineError("updates needs an 'id' column")
    payload = [c for c in ("document", "metadata", "embedding") if c in upd_cols]
    if not payload:
        raise EngineError("updates needs document, metadata and/or embedding")

    u = updates.select(
        F.col("id").cast("string").alias("id"),
        *[F.col(c).alias(f"_u_{c}") for c in payload],
    ).dropDuplicates(["id"])
    if "embedding" in payload:
        bad = (
            u.filter(
                F.col("_u_embedding").isNotNull()
                & (F.size("_u_embedding") != manifest.dim)
            ).limit(1).count()
        )
        if bad:
            raise EngineError(
                f"update embeddings must have dim {manifest.dim}"
            )
        u = u.withColumn("_u_embedding", F.col("_u_embedding").cast("array<float>"))

    df = read_collection(spark, root, name, include_bucket=bucketed)
    scoped = df
    if bucketed:
        # Distributed bucket pruning: hash each update id to its bucket
        # ON THE UPDATE FRAME and collect only the DISTINCT bucket set
        # (bounded by n_buckets, never O(updates)) — a bulk update with
        # millions of ids ships a few hundred ints to the driver, not
        # the id list. The literal IN-list on the hive-partition column
        # keeps static partition pruning.
        buckets = [
            r["b"]
            for r in u.select(
                F.pmod(F.xxhash64("id"), F.lit(manifest.n_buckets)).alias("b")
            )
            .distinct()
            .collect()
        ]
        scoped = df.filter(F.col("id_bucket").isin(buckets))
    # Cheap existence probe only — the exact matched count is observed
    # inside the rewrite job itself (below), so an update costs the
    # probe plus ONE pass over the scoped rows, not a separate
    # full-count job (same Observation pattern as collection_delete).
    if scoped.join(u, "id", "left_semi").limit(1).count() == 0:
        return 0

    from pyspark.sql import Observation

    obs = Observation("update_matched")
    matched_flag = F.col("_u_hit").isNotNull()
    merged = (
        scoped.join(u.withColumn("_u_hit", F.lit(True)), "id", "left")
        .observe(obs, F.sum(matched_flag.cast("long")).alias("matched"))
        .select(
            "id",
            *[
                (
                    F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c)
                    if c in payload
                    else F.col(c)
                )
                for c in ("document", "embedding", "metadata")
            ],
            *(["id_bucket"] if bucketed else []),
        )
    )
    staging = next_data_dir(root, manifest.name)
    if bucketed:
        merged.write.mode("overwrite").partitionBy("id_bucket").parquet(staging)
        clone_untouched_buckets(
            current_data_dir(root, manifest.name), staging, set(buckets)
        )
    else:
        merged.write.mode("overwrite").parquet(staging)
    swap_data_dir(root, manifest.name, staging, retain=retain_previous)
    return int(obs.get["matched"])


def collection_query(
    spark: SparkSession,
    root: str,
    name: str,
    query_vector: list[float],
    n_results: int = 10,
    *,
    where: dict | None = None,
    where_document: dict | None = None,
    score_decimals: int | None = None,
    include_distance: bool = False,
    include: list[str] | None = None,
) -> DataFrame:
    """``collection.query`` for one query embedding: pre-filter by
    metadata/document predicates, then exact top-k by the manifest's
    metric. Plan: Scan -> Filter (pushed ahead of the distance
    expression) -> Project(score) -> TakeOrderedAndProject. Returns
    ``(id, document, metadata, score)`` best-first.

    ``include=[...]`` is Chroma's literal caller-controlled column
    set: any of ``documents``/``embeddings``/``metadatas``/
    ``distances`` (default documents+metadatas — Chroma's query
    default); it controls the payload columns and ORs its
    ``distances`` entry with ``include_distance``. ``score`` always
    returns (it is this engine's rank key), ids always return.

    NOTE on ``score`` vs Chroma: ``score`` is metric-native — cosine /
    dot SIMILARITY (higher is better), L2 distance (lower is better) —
    whereas ``collection.query`` in Chroma always returns DISTANCES
    ascending (cosine distance = 1 − similarity, ip distance =
    1 − dot, l2 = SQUARED Euclidean). Thresholds ported from Chroma
    should set ``include_distance=True``, which appends a ``distance``
    column in exactly those Chroma conventions (rank order is the
    same either way; ``score_decimals`` rounding applies to ``score``
    only, ``distance`` derives from the unrounded value).

    Batch query sets should use ``operators.knn.knn_join`` /
    ``knn_join_gemm`` on ``read_collection`` output instead — this is
    the interactive single-query path (shuffle-free).
    """
    manifest = load_manifest(root, name)
    if len(query_vector) != manifest.dim:
        raise EngineError(
            f"query vector dim {len(query_vector)} != collection dim {manifest.dim}"
        )
    payload, want_d = _parse_include(
        include, default=("documents", "metadatas"), distances_ok=True
    )
    df = _filtered(read_collection(spark, root, name), None, where, where_document)
    return _serve_topk(
        df,
        manifest.metric,
        query_vector,
        n_results,
        score_decimals=score_decimals,
        include_distance=include_distance or want_d,
        payload_cols=tuple(payload),
    )


def _serve_topk(
    df,
    metric: str,
    query_vector: list[float],
    n_results: int,
    *,
    score_decimals: int | None,
    include_distance: bool,
    payload_cols: tuple = ("document", "metadata"),
) -> DataFrame:
    """Shared exact-rerank tail of the interactive query paths
    (``collection_query``'s full scan and ``collection_query_ivf``'s
    probed candidates): Project(score) -> TakeOrderedAndProject,
    metric-native ``score`` plus optional Chroma-convention
    ``distance``. ``payload_cols`` is the include-resolved column
    set between ``id`` and ``score``."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        _score_vs_literal,
    )

    raw, asc = _score_vs_literal(metric, F.col("embedding"), query_vector)
    score = F.round(raw, score_decimals) if score_decimals is not None else raw
    scored = df.withColumn("score", score)
    cols = ["id", *payload_cols, "score"]
    if include_distance:
        # Chroma's distance conventions per metric (hnswlib spaces):
        # cosine -> 1 - similarity, ip -> 1 - dot, l2 -> squared L2.
        dist = F.lit(1.0) - raw if metric in ("cosine", "dot") else raw * raw
        scored = scored.withColumn("distance", dist)
        cols.append("distance")
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col("id").asc()]
    return scored.orderBy(*order).limit(n_results).select(*cols)


def collection_query_ivf(
    spark: SparkSession,
    root: str,
    name: str,
    query_vector: list[float],
    n_results: int = 10,
    *,
    index_path: str,
    nprobe: int = 2,
    where: dict | None = None,
    where_document: dict | None = None,
    score_decimals: int | None = None,
    include_distance: bool = False,
    verify_source: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """``collection.query`` served THROUGH the persisted IVF index,
    with metadata/document pre-filters — the filtered-ANN shape
    ``collection_query`` deliberately does not take at corpus scale
    (its exact scan is the right interactive path at fixture scale;
    at 10^9 rows every filtered query paying a full scan is not).

    Standard filtered-ANN algorithm: rank the index's cells by
    centroid proximity to the query under the INDEX's serve metric
    (stable order — ties to the lower cell, same contract as
    ``ivf_search``), probe the nearest ``nprobe`` cells, evaluate the
    ``where``/``where_document`` predicates ONLY on the probed
    candidates, and DOUBLE the probe set until ``n_results`` filtered
    candidates exist or every cell is probed — the k-fill guarantee:
    a predicate that kills whole cells (metadata correlated with
    vector position, the classic filtered-ANN failure) widens the
    probe until matches are found, and the exhaustion fallback is
    exactly the full filtered scan, never an empty under-fill.
    Survivors are exact-reranked by the MANIFEST's metric through the
    same tail as ``collection_query``, so the two paths return
    byte-identical rows whenever the probe reaches every matching
    cell.

    Scale shape: each round scans ~p/n_centroids of the corpus
    (partition-pruned on the ``ivf_cell`` layout), the predicate is
    evaluated on candidate rows via one semi-join of the collection
    against the probed ids (Catalyst broadcasts the small side), and
    the fill check is ``limit(k).count()`` — an early-exit probe, not
    a full count. Expansion rounds are bounded by log2(n_centroids).
    ``verify_source`` keeps ``ivf_read``'s etag fence: a stale index
    (collection mutated since the stamp) refuses rather than serving
    deleted rows. Returns ``(id, document, metadata, score
    [, distance])`` best-first — ``collection_query``'s contract."""
    import numpy as np

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_read,
    )

    manifest = load_manifest(root, name)
    if len(query_vector) != manifest.dim:
        raise EngineError(
            f"query vector dim {len(query_vector)} != collection dim {manifest.dim}"
        )
    assigned, C, idx_metric = ivf_read(
        spark, index_path, verify_source=verify_source
    )
    idx_id = [c for c in assigned.columns if c != "ivf_cell"][0]
    q = np.asarray(query_vector, dtype=np.float64)
    if idx_metric == "cosine":
        qn = q / max(np.linalg.norm(q), 1e-300)
        cn = C / np.maximum(
            np.linalg.norm(C, axis=1, keepdims=True), 1e-300
        )
        cell_order = np.argsort(-(cn @ qn), kind="stable")
    else:
        cell_order = np.argsort(
            ((C - q) ** 2).sum(axis=1), kind="stable"
        )
    n_cells = int(C.shape[0])
    filtered = _filtered(
        read_collection(spark, root, name), None, where, where_document
    )
    k = int(n_results)
    p = max(1, min(int(nprobe), n_cells))
    rounds = 0
    while True:
        rounds += 1
        probed = [int(c) for c in cell_order[:p]]
        cand_ids = assigned.filter(
            F.col("ivf_cell").isin(probed)
        ).select(F.col(idx_id).cast("string").alias("id"))
        cand = filtered.join(cand_ids, "id", "left_semi")
        if p >= n_cells or cand.limit(k).count() >= k:
            break
        p = min(n_cells, p * 2)
    if stats_out is not None:
        # observability for scale probes/tests: how far the k-fill
        # doubling walked (rounds <= 1 + ceil(log2(n_cells/nprobe)))
        # and the probe width it settled at (== n_cells on a
        # cell-killing predicate — the exhaustion floor)
        stats_out["rounds"] = rounds
        stats_out["final_probe"] = p
        stats_out["n_cells"] = n_cells
    return _serve_topk(
        cand,
        manifest.metric,
        query_vector,
        k,
        score_decimals=score_decimals,
        include_distance=include_distance,
    )


def collection_query_batch_ivf(
    spark: SparkSession,
    root: str,
    name: str,
    query_vectors: list[list[float]],
    n_results: int = 10,
    *,
    index_path: str,
    nprobe: int = 2,
    where: dict | None = None,
    where_document: dict | None = None,
    score_decimals: int | None = None,
    include_distance: bool = False,
    verify_source: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """``collection.query`` with MULTIPLE query embeddings served
    through the persisted IVF index, with optional metadata/document
    pre-filters — the BATCH scale path (``collection_query_batch``
    streams the whole filtered collection once per request;
    ``collection_query_ivf`` expands one query at a time). Same
    output contract as the exact batch path:
    ``(qid, rank, id, document, metadata, score[, distance])``.

    Plan: the filtered collection SEMI-restricts the index's
    cell-assigned rows (predicate evaluated once, cells layout
    preserved), ``ann.ivf_knn_join`` scores each query against only
    its ``nprobe`` nearest cells (cogrouped per-cell GEMM, exact
    scores, candidate-selection-only approximation), and queries that
    UNDER-FILL (< n_results rows — the filter killed their probed
    cells) are re-joined at a DOUBLED probe width until they fill or
    every cell is probed — the per-query k-fill guarantee, with the
    exhaustive join (== exact) as the floor. Each round's fill check
    collects <= |queries| count rows; settled queries never re-score.
    NOTE: this path probes AND scores with the MANIFEST's metric,
    while ``collection_query_ivf`` probes with the index's recorded
    serve metric — byte-equality between the two at partial probing
    therefore holds when the index was written with
    ``metric=manifest.metric`` (the standard configuration every
    composed builder uses); at exhaustion both are exact regardless.
    ``distance`` (Chroma conventions) derives from the UNROUNDED
    exact score recomputed on the <= queries x k result rows —
    identical contract to the exact batch path."""
    import numpy as np

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_knn_join,
        ivf_read,
    )

    manifest = load_manifest(root, name)
    if not query_vectors:
        raise EngineError("query_vectors must be non-empty")
    for i, v in enumerate(query_vectors):
        if len(v) != manifest.dim:
            raise EngineError(
                f"query vector {i} dim {len(v)} != collection dim {manifest.dim}"
            )
    assigned, C, _idx_metric = ivf_read(
        spark, index_path, verify_source=verify_source
    )
    idx_id = [c for c in assigned.columns if c != "ivf_cell"][0]
    n_cells = int(np.asarray(C).shape[0])
    filtered = _filtered(
        read_collection(spark, root, name), None, where, where_document
    )
    # predicate evaluated ONCE, on the index rows (cells layout kept)
    cand = assigned.join(
        filtered.select(F.col("id").cast(dict(assigned.dtypes)[idx_id]).alias(idx_id)),
        idx_id,
        "left_semi",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(query_vectors)],
        "qid int, q_embedding array<float>",
    )
    k = int(n_results)
    p = max(1, min(int(nprobe), n_cells))
    pending = queries
    settled = []
    rounds = 0
    while True:
        rounds += 1
        nn = ivf_knn_join(
            pending,
            cand,
            C,
            k=k,
            id_col=idx_id,
            embedding_col=[c for c in assigned.columns if c != "ivf_cell"][1],
            metric=manifest.metric,
            nprobe=p,
            score_decimals=score_decimals,
        ).localCheckpoint(eager=True)  # bounded: <= |pending| * k rows
        if p >= n_cells:
            settled.append(nn)
            break
        counts = {
            int(r["qid"]): int(r["n"])
            for r in nn.groupBy("qid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        unfilled = [
            int(r["qid"])
            for r in pending.select("qid").collect()
            if counts.get(int(r["qid"]), 0) < k
        ]
        if not unfilled:
            settled.append(nn)
            break
        settled.append(nn.filter(~F.col("qid").isin(unfilled)))
        pending = queries.filter(F.col("qid").isin(unfilled))
        p = min(n_cells, p * 2)
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["final_probe"] = p
        stats_out["n_cells"] = n_cells
    out = settled[0]
    for part in settled[1:]:
        out = out.unionByName(part)
    out = out.join(
        filtered.select(
            F.col("id").alias("neighbor_id"), "document", "metadata",
            *(["embedding"] if include_distance else []),
        ),
        "neighbor_id",
    ).withColumnRenamed("neighbor_id", "id")
    cols = ["qid", "rank", "id", "document", "metadata", "score"]
    if include_distance:
        from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
            _score,
        )

        qv = queries.withColumnRenamed("q_embedding", "_qe")
        out = out.join(F.broadcast(qv), "qid")
        raw, _asc = _score(manifest.metric, F.col("embedding"), F.col("_qe"))
        dist = (
            raw * raw if manifest.metric == "l2" else F.lit(1.0) - raw
        )
        out = out.withColumn("distance", dist)
        cols.append("distance")
    return out.select(*cols).orderBy("qid", "rank")


def collection_query_batch_ivf_pq(
    spark: SparkSession,
    root: str,
    name: str,
    query_vectors: list[list[float]],
    n_results: int = 10,
    *,
    index_path: str,
    nprobe: int = 2,
    where: dict | None = None,
    where_document: dict | None = None,
    rerank_factor: int = 8,
    score_decimals: int | None = None,
    include_distance: bool = False,
    verify_source: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """``collection.query`` with MULTIPLE query embeddings served
    through the persisted COMPRESSED (IVF-PQ) index, with optional
    metadata/document pre-filters — the last cell of the serving
    matrix (single/batch x IVF/IVF-PQ x filtered/unfiltered). Same
    output contract as the other batch paths:
    ``(qid, rank, id, document, metadata, score[, distance])``.

    Plan: the filtered collection SEMI-restricts the 8-byte code
    table once (cells layout preserved — the float vectors are never
    scanned for candidate generation), ``pq.ivf_pq_knn_join`` ADC-
    prescreens each query against its ``nprobe`` nearest cells to
    ``n_results * rerank_factor`` candidates (executor-built residual
    LUTs, the batch ADC shape), queries that UNDER-FILL (< n_results
    candidates — the filter killed their probed cells) re-join at a
    DOUBLED probe width until they fill or every cell is probed (the
    per-query k-fill guarantee, exhaustive ADC as the floor), and the
    exact rerank recomputes the MANIFEST metric on only the <=
    queries x k x rerank_factor surviving rows — identical tie-breaks
    (score, then id) to ``_serve_topk``, so a ``rerank_factor``
    covering the filtered candidate count makes every row equal the
    exact batch path's."""
    import numpy as np

    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        _score,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        ivf_pq_knn_join,
        ivf_pq_read,
    )

    manifest = load_manifest(root, name)
    if not query_vectors:
        raise EngineError("query_vectors must be non-empty")
    for i, v in enumerate(query_vectors):
        if len(v) != manifest.dim:
            raise EngineError(
                f"query vector {i} dim {len(v)} != collection dim {manifest.dim}"
            )
    encoded, C, books, _rot = ivf_pq_read(
        spark, index_path, verify_source=verify_source,
        with_rotation=True,
    )
    idx_id = [
        c for c in encoded.columns if c not in ("ivf_cell", "pq_code")
    ][0]
    n_cells = int(np.asarray(C).shape[0])
    filtered = _filtered(
        read_collection(spark, root, name), None, where, where_document
    )
    # predicate evaluated ONCE, on the code rows (cells layout kept)
    cand = encoded.join(
        filtered.select(
            F.col("id").cast(dict(encoded.dtypes)[idx_id]).alias(idx_id)
        ),
        idx_id,
        "left_semi",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(query_vectors)],
        "qid int, q_embedding array<float>",
    )
    k = int(n_results)
    kk = k * int(rerank_factor)
    p = max(1, min(int(nprobe), n_cells))
    pending = queries
    settled = []
    rounds = 0
    while True:
        rounds += 1
        nn = ivf_pq_knn_join(
            pending,
            cand,
            C,
            books,
            k=kk,
            id_col=idx_id,
            nprobe=p,
            rotation=_rot,
            score_decimals=score_decimals,
        ).localCheckpoint(eager=True)  # bounded: <= |pending| * k * rf
        if p >= n_cells:
            settled.append(nn)
            break
        counts = {
            int(r["qid"]): int(r["n"])
            for r in nn.groupBy("qid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        unfilled = [
            int(r["qid"])
            for r in pending.select("qid").collect()
            if counts.get(int(r["qid"]), 0) < k
        ]
        if not unfilled:
            settled.append(nn)
            break
        settled.append(nn.filter(~F.col("qid").isin(unfilled)))
        pending = queries.filter(F.col("qid").isin(unfilled))
        p = min(n_cells, p * 2)
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["final_probe"] = p
        stats_out["n_cells"] = n_cells
    adc = settled[0]
    for part in settled[1:]:
        adc = adc.unionByName(part)
    # exact rerank on the ADC survivors only: manifest-metric scores
    # recomputed from the collection's float rows, _serve_topk's
    # (score, id) tie-breaks, top-k per query
    rows = adc.select("qid", F.col("neighbor_id").cast("string").alias("id")).join(
        filtered.select("id", "document", "metadata", "embedding"), "id"
    ).join(F.broadcast(queries.withColumnRenamed("q_embedding", "_qe")), "qid")
    raw, asc = _score(manifest.metric, F.col("embedding"), F.col("_qe"))
    score = (
        F.round(raw, score_decimals) if score_decimals is not None else raw
    )
    rows = rows.withColumn("score", score)
    order = [
        F.col("score").asc() if asc else F.col("score").desc(),
        F.col("id").asc(),
    ]
    w = Window.partitionBy("qid").orderBy(*order)
    out = rows.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    cols = ["qid", "rank", "id", "document", "metadata", "score"]
    if include_distance:
        # Chroma's distance conventions per metric (see _serve_topk)
        dist = (
            F.lit(1.0) - raw
            if manifest.metric in ("cosine", "dot")
            else raw * raw
        )
        out = out.withColumn("distance", dist)
        cols.append("distance")
    return out.select(*cols).orderBy("qid", "rank")


def collection_query_ivf_pq(
    spark: SparkSession,
    root: str,
    name: str,
    query_vector: list[float],
    n_results: int = 10,
    *,
    index_path: str,
    nprobe: int = 2,
    where: dict | None = None,
    where_document: dict | None = None,
    rerank_factor: int = 8,
    score_decimals: int | None = None,
    include_distance: bool = False,
    verify_source: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """``collection.query`` served through the persisted COMPRESSED
    (IVF-PQ) index with metadata/document pre-filters — the 8-bytes-
    per-row twin of ``collection_query_ivf``, completing the filtered
    serving matrix (exact scan / IVF / IVF-PQ). Same filtered-ANN
    shape: rank cells by l2 centroid proximity (ADC is residual
    squared-L2 whatever the rerank metric — FAISS semantics; stable
    ties), probe ``nprobe`` cells, evaluate the predicates only on
    probed candidates, DOUBLE until ``n_results`` filtered candidates
    exist or every cell is probed (the same k-fill guarantee, with
    the same full-filtered-scan exhaustion floor). Survivors then go
    through the standard IVF-PQ+refine recipe: ADC prescreens the
    filtered candidates to ``n_results * rerank_factor`` ids over the
    8-byte codes (``ivf_pq_search`` on the candidate-restricted code
    table — the corpus's float vectors are never scanned), and the
    exact rerank is ``collection_query``'s own tail over just those
    rows, so the output contract and tie-breaks are identical to the
    other two paths.

    Scale shape: the probe scans ~p/n_centroids of the CODE table
    (m bytes/row, partition-pruned), the predicate semi-join and the
    fill check are the same bounded shapes as the IVF path, and the
    float vectors are touched only for the <= k*rerank_factor
    reranked rows. A ``rerank_factor`` large enough to cover the
    filtered candidate count makes the result exact (the
    oracle-checkable configuration); production settings trade that
    for bytes moved. Returns ``(id, document, metadata, score
    [, distance])`` best-first."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        ivf_pq_read,
        ivf_pq_search,
    )

    manifest = load_manifest(root, name)
    if len(query_vector) != manifest.dim:
        raise EngineError(
            f"query vector dim {len(query_vector)} != collection dim {manifest.dim}"
        )
    encoded, C, books, _rot = ivf_pq_read(
        spark, index_path, verify_source=verify_source,
        with_rotation=True,
    )
    idx_id = [
        c for c in encoded.columns if c not in ("ivf_cell", "pq_code")
    ][0]
    import numpy as np

    q = np.asarray(query_vector, dtype=np.float64)
    cell_order = np.argsort(((C - q) ** 2).sum(axis=1), kind="stable")
    n_cells = int(C.shape[0])
    filtered = _filtered(
        read_collection(spark, root, name), None, where, where_document
    )
    k = int(n_results)
    p = max(1, min(int(nprobe), n_cells))
    rounds = 0
    while True:
        rounds += 1
        probed = [int(c) for c in cell_order[:p]]
        cand_codes = encoded.filter(F.col("ivf_cell").isin(probed))
        cand = filtered.join(
            cand_codes.select(F.col(idx_id).cast("string").alias("id")),
            "id",
            "left_semi",
        )
        if p >= n_cells or cand.limit(k).count() >= k:
            break
        p = min(n_cells, p * 2)
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["final_probe"] = p
        stats_out["n_cells"] = n_cells
    # ADC prescreen over the FILTERED candidates' codes only, then
    # exact rerank through the shared tail (rerank inside
    # ivf_pq_search would re-scan embeddings per candidate anyway;
    # routing through _serve_topk keeps one rerank implementation)
    fil_codes = cand_codes.join(
        cand.select(F.col("id").cast(dict(encoded.dtypes)[idx_id]).alias(idx_id)),
        idx_id,
        "left_semi",
    )
    prescreen = ivf_pq_search(
        fil_codes,
        C,
        books,
        query_vector,
        k=k * int(rerank_factor),
        id_col=idx_id,
        nprobe=p,  # the cells the fill loop settled on
        rotation=_rot,
    ).select(F.col(idx_id).cast("string").alias("id"))
    return _serve_topk(
        filtered.join(F.broadcast(prescreen), "id", "left_semi"),
        manifest.metric,
        query_vector,
        k,
        score_decimals=score_decimals,
        include_distance=include_distance,
    )


def collection_query_batch(
    spark: SparkSession,
    root: str,
    name: str,
    query_vectors: list[list[float]],
    n_results: int = 10,
    *,
    where: dict | None = None,
    where_document: dict | None = None,
    score_decimals: int | None = None,
    include_distance: bool = False,
) -> DataFrame:
    """``collection.query`` with MULTIPLE query embeddings — Chroma's
    native signature (``query_embeddings`` is a list; results come
    back per query). Returns one row per (query, neighbor):
    ``(qid, rank, id, document, metadata, score[, distance])`` with
    ``qid`` the 0-based index into ``query_vectors``, mirroring
    Chroma's positional result lists.

    Plan: the query batch broadcasts (it is request-sized, never
    corpus-sized), the filtered collection streams ONCE through
    ``knn_join``'s two-level top-k (per-partition partial top-k, then
    a per-query merge of <= k x partitions candidates — the shuffle
    carries queries x k rows, not the corpus), and the payload
    columns re-attach via one equi-join on id bounded by
    queries x k rows. Same metric/distance conventions AND the same
    precision contract as ``collection_query``: ``score`` rounds when
    ``score_decimals`` is set (ranking is on the rounded value, id
    tiebreak), while ``distance`` always derives from the UNROUNDED
    score (``knn_join`` carries it through as ``raw_score``) — a
    distance threshold ported from Chroma behaves identically on both
    entry points."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_join,
    )

    manifest = load_manifest(root, name)
    if not query_vectors:
        raise EngineError("query_vectors must be non-empty")
    for i, v in enumerate(query_vectors):
        if len(v) != manifest.dim:
            raise EngineError(
                f"query vector {i} dim {len(v)} != collection dim {manifest.dim}"
            )
    corpus = _filtered(
        read_collection(spark, root, name), None, where, where_document
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(query_vectors)],
        "qid int, q_embedding array<float>",
    )
    nn = knn_join(
        queries,
        corpus,
        k=n_results,
        metric=manifest.metric,
        score_decimals=score_decimals,
        include_raw_score=include_distance,
    )
    out = nn.join(
        corpus.select(
            F.col("id").alias("neighbor_id"), "document", "metadata"
        ),
        "neighbor_id",
    )
    cols = ["qid", "rank", "id", "document", "metadata", "score"]
    out = out.withColumnRenamed("neighbor_id", "id")
    if include_distance:
        asc_metric = manifest.metric == "l2"
        raw = F.col("raw_score")
        dist = raw * raw if asc_metric else F.lit(1.0) - raw
        out = out.withColumn("distance", dist)
        cols.append("distance")
    return out.select(*cols).orderBy("qid", "rank")


def collection_delete(
    spark: SparkSession,
    root: str,
    name: str,
    *,
    ids: list[str] | None = None,
    where: dict | None = None,
    where_document: dict | None = None,
    retain_previous: bool = False,
) -> int:
    """``collection.delete``: remove matching rows, return how many.
    ``retain_previous`` keeps the pre-delete data dir readable as a
    version (``read_collection(version=...)``) until vacuum.

    Bucketed layout + id-list: rewrites only the buckets the ids hash
    into; cost scales with touched buckets, not collection size. The
    touched buckets' survivors are written to a fresh versioned dir,
    untouched buckets are hardlink-cloned forward (O(files) metadata
    ops, no data rewrite), and the ``_current`` pointer swap commits —
    a bucket whose rows are ALL deleted is simply never written or
    cloned. Predicate deletes (and flat layouts) rewrite survivors
    into a fresh versioned dir and swap the same pointer.

    Consistency contract: EVERY path commits through the atomic
    pointer swap — readers see the collection before the delete or
    after it, never mixed bucket state, and a crash at any point
    leaves the pointer naming a complete dir (the stale staging dir is
    vacuum_collection's job).
    """
    if ids is None and where is None and where_document is None:
        raise EngineError("delete needs ids and/or a where predicate")
    manifest = load_manifest(root, name)
    bucketed = bool(manifest.n_buckets)
    df = read_collection(spark, root, name, include_bucket=bucketed)

    cond = F.lit(True)
    if ids is not None:
        cond = cond & F.col("id").isin([str(i) for i in ids])
    if where is not None:
        cond = cond & compile_where(where)
    if where_document is not None:
        cond = cond & compile_where_document(where_document)
    # NULL predicate (missing metadata key) means "not matched": keep.
    doomed = F.coalesce(cond, F.lit(False))

    if bucketed and ids is not None and where is None and where_document is None:
        touched = _buckets_for_ids(spark, ids, manifest.n_buckets)
        scoped = df.filter(F.col("id_bucket").isin(touched))
        # One aggregation over the pruned buckets sizes the delete
        # before any rewrite (nothing touched when no id matches).
        deleted = int(
            scoped.agg(F.sum(doomed.cast("long")).alias("n_del")).collect()[0][
                "n_del"
            ]
            or 0
        )
        if deleted == 0:
            return 0
        survivors = scoped.filter(~doomed)
        staging = next_data_dir(root, manifest.name)
        if survivors.limit(1).count() > 0:
            survivors.write.mode("overwrite").partitionBy("id_bucket").parquet(
                staging
            )
        clone_untouched_buckets(
            current_data_dir(root, manifest.name), staging, set(touched)
        )
        swap_data_dir(root, manifest.name, staging, retain=retain_previous)
        return deleted

    from pyspark.sql import Observation

    n_before = df.count()
    # Count survivors inside the write job itself (as hydrate does) —
    # two scans total (count + rewrite), no post-swap re-read.
    obs = Observation("delete_survivors")
    survivors = df.filter(~doomed).observe(obs, F.count(F.lit(1)).alias("rows"))
    staging = next_data_dir(root, manifest.name)
    writer = survivors.write.mode("overwrite")
    if bucketed:
        writer = writer.partitionBy("id_bucket")
    writer.parquet(staging)
    swap_data_dir(root, manifest.name, staging, retain=retain_previous)
    return int(n_before - obs.get["rows"])


def _fence_etag(
    fence: str, etag_before: str, p: str, sidecar: str
) -> str | None:
    """Resolve the ``expected_prev_etag`` an indexed mutation should
    pin, per the composed front doors' ``fence`` contract:
    ``"collection"`` -> the collection etag observed before the
    collection mutation (foreign-mutation fence); ``"recorded"`` ->
    the etag the sidecar at ``p/sidecar`` itself records (WAL-recorded
    replay heal — see ``collection_delete_indexed``). A sidecar built
    without a source stamp fences nothing under ``"recorded"``."""
    if fence == "collection":
        return etag_before
    if fence != "recorded":
        raise EngineError(
            f"fence must be 'collection' or 'recorded', got {fence!r}"
        )
    import json
    import os

    with open(os.path.join(p, sidecar)) as fh:
        src = json.load(fh).get("source")
    return src["etag"] if src else None


def collection_delete_indexed(
    spark: SparkSession,
    root: str,
    name: str,
    *,
    ids: list[str] | None = None,
    where: dict | None = None,
    where_document: dict | None = None,
    index_paths: list[str] | tuple[str, ...] = (),
    retain_previous: bool = False,
    fence: str = "collection",
) -> int:
    """``collection.delete`` that keeps the collection's persisted
    ANN indexes SERVABLE: tombstone the deleted ids in every index at
    ``index_paths`` (``ann.ivf_delete`` — one id-column scan plus
    O(batch) bookkeeping, never a data rewrite) and re-stamp them to
    the post-delete etag, so the etag
    fence that would otherwise make every ``ivf_read`` raise
    ``StaleIndexError`` until a full k-means ``ivf_refresh`` passes
    again immediately. Each path is probed for ALL THREE sidecar
    kinds (``ivf_index.json`` / ``ivf_pq_index.json`` /
    ``band_index.json`` — they may cohabit one directory) and every
    one found is tombstoned: vector indexes via ``ann.ivf_delete``,
    the near-dup band index via ``band_index_delete`` (which ALSO
    retires the deleted docs' unshared bucket keys, so the novelty
    gate stops blocking near-duplicates of removed content).

    Sequencing and crash window: the doomed id set is resolved and
    materialized FIRST (one predicate scan — the ids must be captured
    before the rows vanish), the collection delete commits through
    its atomic pointer swap, then each index tombstones with the
    PRE-delete etag as its foreign-mutation fence. A crash between
    the swap and an index's tombstone commit leaves that index
    honestly stale (its fence refuses to serve) — re-run
    ``ivf_delete`` with the same ids, or ``ivf_refresh``; it can
    never silently serve the deleted rows.

    ``fence``: ``"collection"`` (default) pins every index mutation
    to the PRE-delete collection etag — any foreign mutation between
    stampings raises ``StaleIndexError``. ``"recorded"`` pins each
    index mutation to that index's OWN recorded stamp instead; this
    exists for WAL-recorded replays (``streaming/cdc_stream.py``):
    a retry after a crash between the collection commit and an index
    tombstone finds the collection etag already moved by its own
    first attempt, so the default fence would refuse forever. Self-
    fencing is sound ONLY when the caller serializes all writers and
    holds a durable record proving the retried mutation is byte-
    identical to the crashed one (the CDC WAL's content-qualified
    tag). Returns the number of collection rows deleted."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        _local_sidecar_path,
        ivf_delete,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_etag,
    )

    if ids is None and where is None and where_document is None:
        raise EngineError("delete needs ids and/or a where predicate")
    if fence not in ("collection", "recorded"):
        raise EngineError(
            f"fence must be 'collection' or 'recorded', got {fence!r}"
        )
    etag_before = collection_etag(root, name)
    if where is None and where_document is None:
        # pure id-list delete: the doomed set IS the list — no scan
        # (ids absent from an index are dropped by its Bloom prescreen)
        doomed = spark.createDataFrame(
            [(str(i),) for i in ids], "id string"
        )
    else:
        cond = F.lit(True)
        if ids is not None:
            cond = cond & F.col("id").isin([str(i) for i in ids])
        if where is not None:
            cond = cond & compile_where(where)
        if where_document is not None:
            cond = cond & compile_where_document(where_document)
        doomed = (
            read_collection(spark, root, name)
            .filter(F.coalesce(cond, F.lit(False)))
            .select("id")
            .localCheckpoint(eager=True)
        )
    n = collection_delete(
        spark,
        root,
        name,
        ids=ids,
        where=where,
        where_document=where_document,
        retain_previous=retain_previous,
    )
    import os

    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_delete,
    )

    for path in index_paths:
        p = _local_sidecar_path(path)
        found = False
        for sc in ("ivf_index.json", "ivf_pq_index.json"):
            if os.path.exists(os.path.join(p, sc)):
                found = True
                ivf_delete(
                    spark,
                    path,
                    doomed,
                    sidecar=sc,
                    expected_prev_etag=_fence_etag(fence, etag_before, p, sc),
                )
        if os.path.exists(os.path.join(p, "band_index.json")):
            found = True
            band_index_delete(
                spark,
                path,
                # pure id-list deletes pass the LITERAL list so the
                # band delete's isin pushdown can row-group-prune its
                # ids-part lookup; predicate deletes pass the resolved
                # frame
                ids
                if (where is None and where_document is None)
                else doomed,
                expected_prev_etag=_fence_etag(
                    fence, etag_before, p, "band_index.json"
                ),
            )
        if not found:
            raise EngineError(
                f"collection_delete_indexed: no index sidecar found at "
                f"{path!r} (expected ivf_index.json, ivf_pq_index.json "
                "or band_index.json) — the collection delete has "
                "already committed; tombstone the index manually once "
                "the path is corrected"
            )
    return n


def collection_update_indexed(
    spark: SparkSession,
    root: str,
    name: str,
    updates: DataFrame,
    *,
    index_paths: list[str] | tuple[str, ...] = (),
    retain_previous: bool = False,
    fence: str = "collection",
    band_text_mode: str = "refuse",
) -> int:
    """``collection.update`` that keeps the persisted VECTOR indexes
    servable: after the collection's atomic rewrite, surgically upsert
    the updated embeddings into every IVF / IVF-PQ index at
    ``index_paths`` (``ann.ivf_upsert`` / ``pq.ivf_pq_upsert`` — only
    the touched cell partitions rewrite, untouched cells hardlink-
    clone forward, one sidecar swap per index) and re-stamp, so the
    etag fence passes without an ``ivf_refresh``. Updates that carry
    no ``embedding`` column (document/metadata-only) leave the vector
    content valid — the indexes just re-stamp (the ``ivf_delete``
    empty-batch heal path). Only ids the collection actually holds
    are upserted (``collection.update`` ignores unknown ids — Chroma
    semantics — and indexing a vector the collection rejected would
    diverge the two); rows whose ``embedding`` is NULL keep their
    stored vector (the update's per-field coalesce) and are likewise
    skipped.

    Text updates on a path holding a BAND index: changed text
    invalidates the doc's shingle/band rows, and the id-free serving
    layout has no surgical row replacement — the honest unit is a
    part rewrite. ``band_text_mode`` picks the posture:

    - ``"refuse"`` (default): raise UP FRONT, no mutation performed —
      the conservative pre-r13 contract.
    - ``"apply_now"``: route the ``(id, document)`` pairs through
      ``band_index_apply`` — ONE atomic part rewrite (compact-cost,
      however many updates ride along); the index serves the new
      text immediately and prior tombstones purge as a side effect.
    - ``"defer"``: queue the pairs via ``band_index_defer_updates``
      (tiny recording + sidecar swap) and re-stamp; the index serves
      the PRE-update bands until the next ``band_index_compact``
      drains the queue — ``band_index_audit`` reports the queue and
      flips ``compact_recommended``, so a maintenance loop bounds
      the window. The streaming CDC posture.

    (Embedding/metadata-only updates leave band content valid
    whatever the mode; such paths just re-stamp via the band delete's
    empty-batch heal.)

    Same crash posture as ``collection_delete_indexed``: the
    collection commit is the pointer swap; a crash before an index's
    upsert leaves that index honestly stale (fence refuses); and the
    same ``fence`` escape hatch — ``"recorded"`` pins each index
    mutation to its own recorded stamp so a WAL-recorded replay (the
    CDC loop) can heal through the crash window instead of fencing
    against its own first attempt's etag movement forever. Returns
    the number of collection rows updated."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        _local_sidecar_path,
        ivf_delete,
        ivf_upsert,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_delete,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        ivf_pq_upsert,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_etag,
    )
    import os

    if fence not in ("collection", "recorded"):
        raise EngineError(
            f"fence must be 'collection' or 'recorded', got {fence!r}"
        )
    if band_text_mode not in ("refuse", "apply_now", "defer"):
        raise EngineError(
            "band_text_mode must be 'refuse', 'apply_now' or 'defer', "
            f"got {band_text_mode!r}"
        )
    has_embedding = "embedding" in updates.columns
    has_document = "document" in updates.columns
    band_text_paths = []
    for path in index_paths:
        p = _local_sidecar_path(path)
        if has_document and os.path.exists(
            os.path.join(p, "band_index.json")
        ):
            if band_text_mode == "refuse":
                raise EngineError(
                    "collection_update_indexed: the updates carry a "
                    f"'document' column and {path!r} holds a band "
                    "index — changed text invalidates its shingle/"
                    "band rows and the id-free serving layout has no "
                    "surgical row replacement; pass "
                    "band_text_mode='apply_now' (one atomic part "
                    "rewrite) or 'defer' (queue, drained at compact "
                    "cadence), or run band_index_refresh. No mutation "
                    "was performed."
                )
            band_text_paths.append(path)
    etag_before = collection_etag(root, name)
    doc_batch = None
    if band_text_paths:
        doc_batch = (
            updates.select(
                F.col("id").cast("string").alias("id"), "document"
            )
            .filter(F.col("document").isNotNull())
            .dropDuplicates(["id"])
            # only ids the collection holds (collection.update ignores
            # the rest — the band index must not gate on text the
            # collection rejected)
            .join(
                read_collection(spark, root, name).select("id"),
                "id",
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
    vec_batch = None
    if has_embedding:
        vec_batch = (
            updates.select(
                F.col("id").cast("string").alias("id"), "embedding"
            )
            .filter(F.col("embedding").isNotNull())
            .dropDuplicates(["id"])
            # only ids the collection holds: collection.update ignores
            # the rest, and the index must not hold vectors the
            # collection rejected
            .join(
                read_collection(spark, root, name).select("id"),
                "id",
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
    n = collection_update(
        spark, root, name, updates, retain_previous=retain_previous
    )
    # one emptiness probe for the whole loop (the checkpointed batch
    # is invariant across paths/sidecars — re-probing per sidecar
    # would launch a redundant job each time)
    has_vecs = vec_batch is not None and vec_batch.limit(1).count() > 0
    # an updates frame CARRYING a document column whose values are all
    # NULL (per-field Chroma semantics: keep stored text) must not pay
    # an apply rewrite or queue an empty deferral — stamp-heal instead
    has_docs = doc_batch is not None and doc_batch.limit(1).count() > 0
    for path in index_paths:
        p = _local_sidecar_path(path)
        found = False
        for sc, upsert_fn in (
            ("ivf_index.json", ivf_upsert),
            ("ivf_pq_index.json", ivf_pq_upsert),
        ):
            if not os.path.exists(os.path.join(p, sc)):
                continue
            found = True
            if has_vecs:
                upsert_fn(
                    spark, path, vec_batch,
                    id_col="id", embedding_col="embedding",
                    expected_prev_etag=_fence_etag(fence, etag_before, p, sc),
                )
            else:
                # content untouched: heal the stamp only (the delete
                # functions' fence-guarded empty-batch path)
                ivf_delete(
                    spark, path, [], sidecar=sc,
                    expected_prev_etag=_fence_etag(fence, etag_before, p, sc),
                )
        if os.path.exists(os.path.join(p, "band_index.json")):
            found = True
            if path in band_text_paths and has_docs:
                from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
                    band_index_apply,
                    band_index_defer_updates,
                )

                band_fence = _fence_etag(
                    fence, etag_before, p, "band_index.json"
                )
                if band_text_mode == "apply_now":
                    band_index_apply(
                        spark,
                        path,
                        upserts=doc_batch,
                        id_col="id",
                        text_col="document",
                        expected_prev_etag=band_fence,
                    )
                else:  # defer
                    band_index_defer_updates(
                        spark,
                        path,
                        doc_batch,
                        id_col="id",
                        text_col="document",
                        expected_prev_etag=band_fence,
                    )
            else:
                # text untouched on this path: heal the stamp only
                band_index_delete(
                    spark,
                    path,
                    [],
                    expected_prev_etag=_fence_etag(
                        fence, etag_before, p, "band_index.json"
                    ),
                )
        if not found:
            raise EngineError(
                f"collection_update_indexed: no index sidecar found at "
                f"{path!r} (expected ivf_index.json, ivf_pq_index.json "
                "or band_index.json) — the collection update has "
                "already committed; upsert the index manually once the "
                "path is corrected"
            )
    return n


def collection_diff(
    spark: SparkSession,
    root: str,
    name: str,
    *,
    from_version: str,
    to_version: str | None = None,
) -> DataFrame:
    """CDC-style diff between two readable collection versions (the
    change-data-feed a lakehouse exposes): rows present only in the
    newer state are ``added``, only in the older ``removed``, and rows
    whose (document, metadata, embedding) payload differs ``changed``;
    unchanged rows are dropped. ``to_version=None`` means the current
    state. One full-outer join on id — cost scales with the two
    versions, not with history, because every version is a complete
    dir (no log replay). Maps are compared as sorted entry arrays
    (MapType itself is not comparable in Spark)."""
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )

    def state(version: str | None) -> DataFrame:
        df = read_collection(spark, root, name, version=version)
        return df.select(
            F.col("id"),
            F.struct(
                F.col("document"),
                F.sort_array(F.map_entries(F.col("metadata"))).alias("_meta"),
                F.col("embedding"),
            ).alias("_payload"),
        )

    a = state(from_version).select(
        F.col("id").alias("_id_a"), F.col("_payload").alias("_pa")
    )
    b = state(to_version).select(
        F.col("id").alias("_id_b"), F.col("_payload").alias("_pb")
    )
    j = a.join(b, a["_id_a"] == b["_id_b"], "full_outer")
    change = (
        F.when(F.col("_id_b").isNull(), F.lit("removed"))
        .when(F.col("_id_a").isNull(), F.lit("added"))
        .when(~(F.col("_pa").eqNullSafe(F.col("_pb"))), F.lit("changed"))
    )
    return (
        j.select(
            F.coalesce(F.col("_id_a"), F.col("_id_b")).alias("id"),
            change.alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )


def _chroma_items_df(
    spark: SparkSession,
    ids,
    embeddings,
    documents,
    metadatas,
) -> DataFrame:
    """Chroma's parallel-list item shape -> one canonical-column
    DataFrame. ``ids`` is required and sets the length; the optional
    lists must match it (the literal client-side validation). Typed
    metadata values stringify into the canonical
    ``map<string,string>`` — the query side compares them numerically
    when the predicate literal is numeric (``compile_where``), which
    is how the round-trip preserves Chroma's typed comparisons."""
    n = len(ids)
    for nm, lst in (
        ("embeddings", embeddings),
        ("documents", documents),
        ("metadatas", metadatas),
    ):
        if lst is not None and len(lst) != n:
            raise EngineError(
                f"collection add/upsert: {nm} has {len(lst)} entries "
                f"for {n} ids"
            )
    if embeddings is None:
        raise EngineError(
            "collection add/upsert: embeddings are required (this "
            "engine has no server-side embedding function)"
        )
    dims = {len(e) for e in embeddings}
    if len(dims) > 1:
        raise EngineError(
            "collection add/upsert: embeddings have mixed dimensions "
            f"{sorted(dims)} — Chroma rejects the call, nothing was "
            "written"
        )
    rows = []
    for i in range(n):
        meta = metadatas[i] if metadatas is not None else None
        rows.append(
            (
                str(ids[i]),
                documents[i] if documents is not None else None,
                [float(x) for x in embeddings[i]],
                {str(k): str(v) for k, v in meta.items()}
                if meta is not None
                else {},
            )
        )
    return spark.createDataFrame(
        rows,
        "id string, document string, embedding array<float>, "
        "metadata map<string,string>",
    )


def _check_dim_vs_manifest(root, name, embeddings, who: str) -> None:
    """Raise BEFORE any write when the batch's (uniform) dimension
    contradicts an existing collection's manifest — Chroma rejects
    the whole call; hydrate's lake-scan null policy would silently
    drop the rows instead, which is wrong for literal client
    input."""
    try:
        dim = load_manifest(root, name).dim
    except Exception:
        return  # new collection: hydrate infers the dim from the batch
    bad = {len(e) for e in embeddings} - {dim}
    if bad:
        raise EngineError(
            f"{who}: embeddings have dimension {sorted(bad)} but "
            f"collection {name!r} stores dim {dim} — nothing was "
            "written"
        )


def _band_guard_documents(index_paths, documents, n: int) -> None:
    """Validate-before-write guard for the literal client front
    doors: ``documents=None`` (or null entries) is legal Chroma, but
    a cohabiting band (near-dup) index needs text for every row it
    will minhash — and the index refresh runs AFTER the collection
    write, so failing late would leave collection and index
    inconsistent. Driver-side and free: ``documents`` is a local
    list here and the sidecar probe is a file stat."""
    import os as _os

    if documents is not None and not any(d is None for d in documents):
        return
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        _local_sidecar_path,
    )

    for path in index_paths:
        if _os.path.exists(
            _os.path.join(_local_sidecar_path(path), "band_index.json")
        ):
            raise EngineError(
                "a band (near-dup) index cohabits at this index_path "
                "but the batch carries missing documents "
                "(documents=None or null entries are legal Chroma, "
                "but every row indexed by a band index needs text to "
                "minhash). Pass documents for all rows, or drop the "
                "band index from index_paths for document-less "
                "collections."
            )


def _indexes_insert(
    spark: SparkSession,
    index_paths,
    batch: DataFrame,
    *,
    upsert_semantics: bool,
) -> None:
    """Keep every persisted index at ``index_paths`` servable after
    rows landed in the collection — the same discipline as the CDC
    loop's insert path. Vector sidecars (IVF / IVF-PQ) take the rows
    through their surgical upsert (add-or-replace; also resurrects
    ids a previous delete tombstoned). A cohabiting BAND index: for
    pure inserts the cheap ``band_index_append`` covers the live
    slice and previously-tombstoned ids ride ``band_index_apply``'s
    atomic part rewrite; with upsert semantics the text of HELD ids
    may have changed, so the whole batch rides ``band_index_apply``
    (replace-or-add, one part rewrite — compact-cost, documented on
    the front doors)."""
    import os as _os

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        _local_sidecar_path,
        ivf_upsert,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        ivf_pq_upsert,
    )

    for path in index_paths:
        p = _local_sidecar_path(path)
        for sc, up_fn in (
            ("ivf_index.json", ivf_upsert),
            ("ivf_pq_index.json", ivf_pq_upsert),
        ):
            if _os.path.exists(_os.path.join(p, sc)):
                up_fn(
                    spark,
                    path,
                    batch.select("id", "embedding"),
                    id_col="id",
                    embedding_col="embedding",
                )
        if _os.path.exists(_os.path.join(p, "band_index.json")):
            from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
                band_index_append,
                band_index_apply,
                band_index_tombstoned_ids,
            )

            docs = batch.select("id", "document")
            if (
                docs.filter(F.col("document").isNull()).limit(1).count()
                > 0
            ):
                raise EngineError(
                    "a band (near-dup) index cohabits at this "
                    "index_path but the batch carries null documents "
                    "(collection add/upsert with documents=None is "
                    "legal in Chroma, but every row indexed by a band "
                    "index needs text to minhash). Pass documents for "
                    "the batch, or drop the band index from "
                    "index_paths for document-less collections."
                )
            if upsert_semantics:
                band_index_apply(
                    spark, path, upserts=docs,
                    id_col="id", text_col="document",
                )
                continue
            ts = band_index_tombstoned_ids(spark, path)
            dead = docs.join(
                ts, F.col("id") == F.col("_ts_id"), "left_semi"
            ).localCheckpoint(eager=True)
            live = docs.join(
                ts, F.col("id") == F.col("_ts_id"), "left_anti"
            )
            band_index_append(
                spark, path, live, id_col="id", text_col="document"
            )
            if dead.limit(1).count() > 0:
                band_index_apply(
                    spark, path, upserts=dead,
                    id_col="id", text_col="document",
                )


def collection_add(
    spark: SparkSession,
    root: str,
    name: str,
    *,
    ids,
    embeddings,
    documents=None,
    metadatas=None,
    index_paths: list[str] | tuple[str, ...] = (),
) -> int:
    """``collection.add(ids=..., embeddings=..., documents=...,
    metadatas=...)`` — the literal Chroma client front door the
    reference's script reaches for first (sas:177-190 calls it in
    bulk). Signature-faithful thin wrapper over the hydrate path with
    ``on_duplicate='error'``: a duplicate id — in-batch or already
    held — raises ``DuplicateIdError`` before anything lands, exactly
    Chroma's add semantics (ids a previous ``collection.delete``
    removed are NOT duplicates and insert normally). Embeddings are
    dim-validated strictly; an invalid vector raises instead of
    silently dropping (lists are literal client input, not a lake
    scan with a null policy). Per-row ``metadatas`` dicts land whole
    in the canonical ``map<string,string>``. Every persisted index at
    ``index_paths`` is kept servable through its surgical
    upsert/append path. Returns the number of rows added.

    Driver-side note: the parallel-list signature is for
    client-SIZED batches (it builds one local DataFrame); bulk loads
    keep using ``operators.hydrate.hydrate`` on a distributed frame —
    same machinery, no collect anywhere."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )

    items = _chroma_items_df(spark, ids, embeddings, documents, metadatas)
    _check_dim_vs_manifest(root, name, embeddings, "collection_add")
    if index_paths:
        _band_guard_documents(index_paths, documents, len(ids))
    cfg = HydrationConfig(
        collection_name=name,
        root=root,
        id_col="id",
        text_col="document",
        embedding_col="embedding",
        metadata_col="metadata",
        on_duplicate="error",
    )
    report = hydrate(spark, items, cfg)
    if index_paths:
        _indexes_insert(
            spark,
            index_paths,
            items,
            upsert_semantics=False,
        )
    return report.rows_written


def collection_upsert(
    spark: SparkSession,
    root: str,
    name: str,
    *,
    ids,
    embeddings,
    documents=None,
    metadatas=None,
    index_paths: list[str] | tuple[str, ...] = (),
) -> int:
    """``collection.upsert(...)`` — insert-or-replace, the other
    Chroma write front door. Same signature and item handling as
    ``collection_add``; underneath it is the hydrate path with
    ``on_duplicate='upsert'`` (held ids' rows are REPLACED whole —
    bucketed layouts rewrite only the touched buckets). Persisted
    vector indexes take the batch through their surgical upsert; a
    cohabiting band index takes it through ``band_index_apply``
    (held ids' text may have changed, and the id-free band layout's
    honest replacement unit is the atomic part rewrite — compact-
    cost per call; batch upserts accordingly). Returns the number of
    rows written."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )

    items = _chroma_items_df(spark, ids, embeddings, documents, metadatas)
    _check_dim_vs_manifest(root, name, embeddings, "collection_upsert")
    if index_paths:
        _band_guard_documents(index_paths, documents, len(ids))
    cfg = HydrationConfig(
        collection_name=name,
        root=root,
        id_col="id",
        text_col="document",
        embedding_col="embedding",
        metadata_col="metadata",
        on_duplicate="upsert",
    )
    report = hydrate(spark, items, cfg)
    if index_paths:
        _indexes_insert(
            spark,
            index_paths,
            items,
            upsert_semantics=True,
        )
    return report.rows_written


def collection_query_graph(
    spark: SparkSession,
    root: str,
    name: str,
    query_vector,
    n_results: int = 10,
    *,
    index_path: str,
    nprobe: int = 2,
    ef: int | None = None,
    where: dict | None = None,
    where_document: dict | None = None,
    score_decimals: int | None = None,
    include_distance: bool = False,
    verify_source: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """``collection.query`` served THROUGH the persisted per-cell
    GRAPH index (``operators/graph_ann.py``) with metadata/document
    pre-filters — completing the filtered serving matrix's fourth
    column (exact scan / IVF / IVF-PQ / graph). The k-fill contract
    is two-dimensional here: a starved fill first DOUBLES the probed
    cell set (the IVF discipline), and once every cell is probed it
    saturates ``ef`` past the largest cell, which by the beam's
    documented degradation turns the final round into the EXACT
    filtered scan — so exhaustion can never under-fill, and with the
    filter off the exhausted answer equals ``collection_query``
    byte-for-byte. Each round's beam scores ~probed_cells * ef rows
    (the budget, not the probed row count); survivors rerank through
    the shared ``_serve_topk`` tail under the MANIFEST's metric.
    ``stats_out`` receives rounds / final_probe / final_ef / n_cells
    for the termination assertions. Returns ``(id, document,
    metadata, score[, distance])`` — ``collection_query``'s
    contract."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph_ann import (
        _serve_cells,
        graph_index_read,
    )

    manifest = load_manifest(root, name)
    if manifest.metric != "cosine":
        raise EngineError(
            f"collection metric {manifest.metric!r} != 'cosine': the "
            "graph index generates candidates by cosine, so serving "
            "an l2/dot collection through it would bias non-exhausted "
            "top-k for unnormalized embeddings. Use the IVF/IVF-PQ or "
            "exact doors for non-cosine collections."
        )
    if len(query_vector) != manifest.dim:
        raise EngineError(
            f"query vector dim {len(query_vector)} != collection dim "
            f"{manifest.dim}"
        )
    _cells, C, _meta = graph_index_read(
        spark, index_path, verify_source=verify_source
    )
    n_cells = int(C.shape[0])
    filtered = _filtered(
        read_collection(spark, root, name), None, where, where_document
    )
    k = int(n_results)
    p = max(1, min(int(nprobe), n_cells))
    e = max(int(ef) if ef is not None else 4 * k, k)
    exhaustive_ef = 2**31  # saturates any cell: the exact-scan round
    rounds = 0
    while True:
        rounds += 1
        per_cell = _serve_cells(
            spark,
            index_path,
            [("q", query_vector)],
            k=k,
            nprobe=p,
            ef=e,
            verify_source=False,  # checked once above
        )
        # widen the per-query emission to the fill target: the beam
        # emits its best `e` per cell; rank_topk to k*? — keep all
        # emitted candidates, the filter decides what survives
        cand_ids = per_cell.select(
            F.col("neighbor_id").alias("id")
        ).dropDuplicates(["id"])
        cand = filtered.join(cand_ids, "id", "left_semi")
        if cand.limit(k).count() >= k:
            break
        if p >= n_cells and e >= exhaustive_ef:
            break  # full filtered scan completed: nothing more exists
        if p < n_cells:
            p = min(n_cells, p * 2)
        else:
            e = exhaustive_ef
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["final_probe"] = p
        stats_out["final_ef"] = e
        stats_out["n_cells"] = n_cells
    return _serve_topk(
        cand,
        manifest.metric,
        query_vector,
        k,
        score_decimals=score_decimals,
        include_distance=include_distance,
    )


def collection_query_batch_graph(
    spark: SparkSession,
    root: str,
    name: str,
    query_vectors: list,
    n_results: int = 10,
    *,
    index_path: str,
    nprobe: int = 2,
    ef: int | None = None,
    where: dict | None = None,
    where_document: dict | None = None,
    score_decimals: int | None = None,
    include_distance: bool = False,
    verify_source: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """Batch ``collection.query`` through the persisted GRAPH index
    with optional pre-filters — completing the single/batch x
    {IVF, IVF-PQ, graph} filtered serving matrix. One per-cell beam
    pass serves every PENDING query per round (the shared
    ``graph_ann._serve_cells`` stage: each query's probed cells union
    into one partition-pruned scan); per-query k-fill follows the
    ``collection_query_batch_ivf`` discipline — settled queries never
    re-score, unfilled ones re-serve at a DOUBLED probe width, and
    once every cell is probed ``ef`` saturates past the largest cell
    so the final round is each remaining query's EXACT filtered scan
    (the beam's documented degradation): exhaustion can never
    under-fill. Candidates rerank against the collection rows under
    the MANIFEST's metric (per-qid broadcast query join + bounded
    window), so exhausted results equal the exact batch path
    byte-for-byte. Output: ``(qid, rank, id, document, metadata,
    score[, distance])`` ordered (qid, rank)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph_ann import (
        _serve_cells,
        graph_index_read,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        _score,
    )

    manifest = load_manifest(root, name)
    if manifest.metric != "cosine":
        raise EngineError(
            f"collection metric {manifest.metric!r} != 'cosine': the "
            "graph index generates candidates by cosine, so serving "
            "an l2/dot collection through it would bias non-exhausted "
            "top-k for unnormalized embeddings. Use the IVF/IVF-PQ or "
            "exact doors for non-cosine collections."
        )
    if not query_vectors:
        raise EngineError("query_vectors must be non-empty")
    for i, v in enumerate(query_vectors):
        if len(v) != manifest.dim:
            raise EngineError(
                f"query vector {i} dim {len(v)} != collection dim "
                f"{manifest.dim}"
            )
    _cells, C, _meta = graph_index_read(
        spark, index_path, verify_source=verify_source
    )
    n_cells = int(C.shape[0])
    filtered = _filtered(
        read_collection(spark, root, name), None, where, where_document
    )
    k = int(n_results)
    p = max(1, min(int(nprobe), n_cells))
    e = max(int(ef) if ef is not None else 4 * k, k)
    exhaustive_ef = 2**31
    pending = {i: [float(x) for x in v] for i, v in enumerate(query_vectors)}
    settled = []
    rounds = 0
    while True:
        rounds += 1
        per_cell = _serve_cells(
            spark,
            index_path,
            [(str(q), v) for q, v in sorted(pending.items())],
            k=k,
            nprobe=p,
            ef=e,
            verify_source=False,  # fenced once above
        )
        cand = (
            per_cell.select(
                F.col("qid").cast("int").alias("qid"),
                F.col("neighbor_id").alias("id"),
            )
            .dropDuplicates(["qid", "id"])
            .join(filtered.select("id"), "id", "left_semi")
            .localCheckpoint(eager=True)  # bounded: <= |pending|*p*ef
        )
        exhausted = p >= n_cells and e >= exhaustive_ef
        counts = {
            int(r["qid"]): int(r["n"])
            for r in cand.groupBy("qid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        unfilled = [q for q in pending if counts.get(q, 0) < k]
        if not unfilled or exhausted:
            settled.append(cand)
            break
        settled.append(cand.filter(~F.col("qid").isin(unfilled)))
        pending = {q: pending[q] for q in unfilled}
        if p < n_cells:
            p = min(n_cells, p * 2)
        else:
            e = exhaustive_ef
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["final_probe"] = p
        stats_out["final_ef"] = e
        stats_out["n_cells"] = n_cells
    out = settled[0]
    for part in settled[1:]:
        out = out.unionByName(part)
    queries_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(query_vectors)],
        "qid int, _qe array<float>",
    )
    payload = out.join(
        filtered.select("id", "document", "metadata", "embedding"), "id"
    ).join(F.broadcast(queries_df), "qid")
    raw, asc = _score(manifest.metric, F.col("embedding"), F.col("_qe"))
    score = (
        F.round(raw, score_decimals) if score_decimals is not None else raw
    )
    payload = payload.withColumn("score", score)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("score").asc() if asc else F.col("score").desc(),
        F.col("id").asc(),
    )
    payload = payload.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    cols = ["qid", "rank", "id", "document", "metadata", "score"]
    if include_distance:
        dist = raw * raw if manifest.metric == "l2" else F.lit(1.0) - raw
        payload = payload.withColumn("distance", dist)
        cols.append("distance")
    return payload.select(*cols).orderBy("qid", "rank")
