"""Vector search: exact/ANN kNN, embeddings, retrieval fusion, reranking.

Split from the original single-file registry (r8); every query keeps
its exact name, body, and oracle — `tools/parity_local.py` guards the
registry contract across the split.
"""

from __future__ import annotations

from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _BKNN_COS,
    _BM25_SQL_BASE,
    _BM25_TERMS,
    _COS_DOUBLE,
    _FLAGSHIP_ORACLE,
    _MMR_COS0,
    _MMR_COS1,
    _MMR_COS2,
    _NORM,
    _PACKBITS,
    _SUBCOS,
    _TOKS,
    _VCOS,
    _rp_planes,
    _rp_sql,
    knn_query,
    load_table,
    query,
)


@query("knn_top5_cosine", _FLAGSHIP_ORACLE)
def knn_top5_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 1).select("embedding").first()["embedding"]
    return (
        knn_query(
            emb.filter(F.col("vec_id") != 1),
            list(qvec),
            k=5,
            id_col="vec_id",
            embedding_col="embedding",
            metric="cosine",
            score_decimals=4,
        )
        .withColumnRenamed("score", "cos_sim")
    )


@query("embedding_random_projection", _rp_sql())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64 -> 8 dims with a
    seeded Gaussian matrix (the same ``_hyperplanes`` family the LSH
    bucketer uses) — the cheap dimensionality reduction for sketching
    / coarse clustering before exact distances. Each output dim is a
    codegen dot-product against a literal plane; identical float64
    literals round-trip through DuckDB, so the projection is
    hash-checkable."""
    planes = _rp_planes()
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    outs = []
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), lit_plane, lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        outs.append(F.round(dot, 4).alias(f"rp_{j}"))
    return e.select("vec_id", *outs)


@query(
    "retrieval_matryoshka_prescreen_top5",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
    cand AS (
        SELECT e.vec_id, e.embedding AS emb,
               round(
                   list_sum(list_transform(list_zip(list_slice(e.embedding, 1, 16), list_slice(q.qe, 1, 16)),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(list_slice(e.embedding, 1, 16),
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(list_slice(q.qe, 1, 16),
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS pre
        FROM embeddings e, q
        WHERE e.vec_id <> 7
        ORDER BY pre DESC, e.vec_id
        LIMIT 40
    ),
    scored AS (
        SELECT c.vec_id,
               round(
                   list_sum(list_transform(list_zip(c.emb, q.qe),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(c.emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos_sim
        FROM cand c, q
    )
    SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def retrieval_matryoshka_prescreen_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (truncated-dimension) retrieval (MRL, Kusupati et
    al. 2022): prescreen on the FIRST 16 of 64 dimensions (a quarter
    of the scan bytes when the prefix is materialized as its own
    column), exact full-dim rerank of the 40 survivors. The oracle
    replays both stages — prefix cosine cut included — so the
    approximation itself is hash-checked; dimensional truncation is
    the complement of the binary prescreen's bit truncation and the
    two compose at 100 TB."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query_matryoshka,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    return knn_query_matryoshka(
        emb.filter(F.col("vec_id") != 7),
        qvec,
        k=5,
        id_col="vec_id",
        prefix_dim=16,
        prescreen_factor=8,
        metric="cosine",
        score_decimals=4,
    ).withColumnRenamed("score", "cos_sim")


@query(
    "hybrid_search_minmax_fusion",
    f"""
    WITH {_BM25_SQL_BASE},
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
    vec AS (
        SELECT e.vec_id AS doc_id,
               round({_VCOS}, 4) AS cos
        FROM embeddings e, q
    ),
    vtop AS (
        SELECT doc_id, cos FROM (
            SELECT doc_id, cos,
                   row_number() OVER (ORDER BY cos DESC, doc_id) AS r
            FROM vec) WHERE r <= 50
    ),
    btop AS (
        SELECT doc_id, bm25 FROM (
            SELECT doc_id, bm25,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
            FROM bscore) WHERE r <= 50
    ),
    vn AS (SELECT min(cos) AS mn, max(cos) AS mx FROM vtop),
    bn AS (SELECT min(bm25) AS mn, max(bm25) AS mx FROM btop),
    fused AS (
        SELECT coalesce(v.doc_id, b.doc_id) AS doc_id,
               round(0.6 * coalesce(
                         CASE WHEN v.doc_id IS NULL THEN NULL
                              WHEN vn.mx = vn.mn THEN 0.5
                              ELSE (v.cos - vn.mn) / (vn.mx - vn.mn) END, 0)
                   + 0.4 * coalesce(
                         CASE WHEN b.doc_id IS NULL THEN NULL
                              WHEN bn.mx = bn.mn THEN 0.5
                              ELSE (b.bm25 - bn.mn) / (bn.mx - bn.mn) END, 0),
                     6) AS fused
        FROM vtop v
        FULL JOIN btop b ON v.doc_id = b.doc_id
        CROSS JOIN vn CROSS JOIN bn
    ),
    final AS (
        SELECT doc_id, fused,
               row_number() OVER (ORDER BY fused DESC, doc_id) AS rank
        FROM fused
    )
    SELECT doc_id, fused, rank FROM final WHERE rank <= 10
    """,
)
def hybrid_search_minmax_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by NORMALIZED WEIGHTED SCORE fusion — the
    standard alternative to RRF when calibrated score magnitudes
    matter: each bounded top-50 list is min-max normalized to [0, 1]
    (degenerate all-equal lists pin to 0.5) and fused as
    0.6*vector + 0.4*lexical, missing side contributing 0. The
    min/max are 1-row aggregates over ALREADY-BOUNDED lists
    (broadcast cross join, no second corpus pass), inputs are rounded
    before normalizing so both engines divide identical doubles, and
    the fused score rounds to 6 before ranking — fully
    hash-checkable, same plan skeleton as hybrid_search_rrf."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        bm25_scores,
        top_ranks,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 7).select("embedding").first()["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    vec = e.select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine_similarity(F.col("embedding"), qlit), 4).alias("cos"),
    )
    vtop = top_ranks(vec, "cos", id_col="doc_id", k=50).select("doc_id", "cos")
    btop = top_ranks(
        bm25_scores(d, list(_BM25_TERMS), id_col="doc_id", text_col="text"),
        "bm25",
        id_col="doc_id",
        k=50,
    ).select("doc_id", "bm25")

    def norm(df, col):
        stats = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
        out = df.crossJoin(F.broadcast(stats))
        normed = F.when(F.col("mx") == F.col("mn"), F.lit(0.5)).otherwise(
            (F.col(col) - F.col("mn")) / (F.col("mx") - F.col("mn"))
        )
        return out.select("doc_id", normed.alias(f"_n_{col}"))

    fused = (
        norm(vtop, "cos")
        .join(norm(btop, "bm25"), "doc_id", "full")
        .select(
            "doc_id",
            F.round(
                0.6 * F.coalesce(F.col("_n_cos"), F.lit(0.0))
                + 0.4 * F.coalesce(F.col("_n_bm25"), F.lit(0.0)),
                6,
            ).alias("fused"),
        )
    )
    return top_ranks(fused, "fused", id_col="doc_id", k=10).select(
        "doc_id", "fused", F.col("rank").cast("long").alias("rank")
    )


@query(
    "hybrid_search_rrf",
    f"""
    WITH {_BM25_SQL_BASE},
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
    vec AS (
        SELECT e.vec_id AS doc_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4) AS cos
        FROM embeddings e, q
    ),
    vrank AS (
        SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rank
        FROM vec
    ),
    brank AS (
        SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM bscore
    ),
    fused AS (
        SELECT coalesce(v.doc_id, b.doc_id) AS doc_id,
               round(coalesce(1.0 / (60 + v.rank), 0)
                     + coalesce(1.0 / (60 + b.rank), 0), 6) AS rrf
        FROM (SELECT * FROM vrank WHERE rank <= 50) v
        FULL JOIN (SELECT * FROM brank WHERE rank <= 50) b
            ON v.doc_id = b.doc_id
    ),
    final AS (
        SELECT doc_id, rrf,
               row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
        FROM fused
    )
    SELECT doc_id, rrf, rank FROM final WHERE rank <= 10
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: vector cosine ranks (query = embedding of
    vec_id 7) fused with BM25 lexical ranks by reciprocal-rank fusion
    (1/(60+rank), the standard hybrid-search recipe). Candidate lists
    are bounded to 50 each by TakeOrderedAndProject BEFORE any window
    runs, fusion is a full-outer join of two <= 50-row lists, and RRF
    arithmetic is rational — bit-portable across engines, which is
    why a hybrid SEARCH pipeline can be hash-checked against DuckDB."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        bm25_scores,
        rrf_fuse,
        top_ranks,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 7).select("embedding").first()["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    vec = e.select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine_similarity(F.col("embedding"), qlit), 4).alias("cos"),
    )
    vrank = top_ranks(vec, "cos", id_col="doc_id", k=50)
    brank = top_ranks(
        bm25_scores(d, list(_BM25_TERMS), id_col="doc_id", text_col="text"),
        "bm25",
        id_col="doc_id",
        k=50,
    )
    fused = rrf_fuse(vrank, brank, id_col="doc_id", k=60)
    return top_ranks(fused, "rrf", id_col="doc_id", k=10).select(
        "doc_id", "rrf", F.col("rank").cast("long").alias("rank")
    )


@query(
    "embedding_int8_quantization",
    """
    WITH s AS (
        SELECT vec_id, label, embedding,
               list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS scale
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, label, embedding, scale,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE)
                        / (CASE WHEN scale = 0 THEN 1 ELSE scale END)
                        * 127 + 0.5)) AS qv
        FROM s
    )
    SELECT vec_id, label,
           round(scale, 6) AS qscale,
           CAST(list_sum(qv) AS BIGINT) AS q_checksum,
           round(list_max(list_transform(
               list_zip(qv, embedding),
               p -> abs(p[1] * scale / 127 - CAST(p[2] AS DOUBLE)))), 6
           ) AS max_abs_err
    FROM q
    """,
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with per-vector max-abs
    scale (functions/vector.py::quantize_int8): checksum of the
    quantized codes plus the max dequantization error. Quantized
    codes are exact integers, so the checksum sum is order-independent
    and the whole result is oracle-exact."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxabs_scale,
        quantize_int8,
    )

    e = load_table(spark, sf_dir, "embeddings")
    s = e.withColumn("scale", maxabs_scale("embedding"))
    q = s.withColumn("qv", quantize_int8("embedding", F.col("scale")))
    err = F.array_max(
        F.zip_with(
            "qv",
            "embedding",
            lambda v, x: F.abs(
                v.cast("double") * F.col("scale") / 127.0 - x.cast("double")
            ),
        )
    )
    return q.select(
        "vec_id",
        "label",
        F.round("scale", 6).alias("qscale"),
        F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")).alias(
            "q_checksum"
        ),
        F.round(err, 6).alias("max_abs_err"),
    )


# --------------------------------------------------------------------------
# kNN join + vector pair math (expression form — oracle-checkable).
# --------------------------------------------------------------------------



@query(
    "knn_join_top3",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.qid, e.vec_id AS neighbor_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4) AS score
        FROM embeddings e, q
    ), ranked AS (
        SELECT qid, neighbor_id, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT qid, neighbor_id, score, rank FROM ranked WHERE rank <= 3
    """,
)
def knn_join_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import knn_join

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding")
    )
    return knn_join(
        q,
        e,
        k=3,
        metric="cosine",
        corpus_id_col="vec_id",
        score_decimals=4,
    ).select("qid", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))


@query(
    "knn_join_gemm_top3",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.qid, e.vec_id AS neighbor_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4) AS score
        FROM embeddings e, q
    ), ranked AS (
        SELECT qid, neighbor_id, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT qid, neighbor_id, score, rank FROM ranked WHERE rank <= 3
    """,
)
def knn_join_gemm_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as knn_join_top3 through the mapInPandas GEMM
    path — the oracle doubles as a determinism check on the
    partition-local top-k fold."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_join_gemm,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding")
    )
    return knn_join_gemm(
        q,
        e,
        k=3,
        metric="cosine",
        corpus_id_col="vec_id",
        score_decimals=4,
    ).select("qid", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))


@query(
    "knn_join_ivf_top3",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.qid, e.vec_id AS neighbor_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4) AS score
        FROM embeddings e, q
    ), ranked AS (
        SELECT qid, neighbor_id, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT qid, neighbor_id, score, rank FROM ranked WHERE rank <= 3
    """,
)
def knn_join_ivf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as knn_join_top3 through the IVF-pruned cogroup
    join (operators/ann.py::ivf_knn_join). nprobe = n_centroids makes
    the probe exhaustive, so the exact brute-force SQL is the oracle —
    what's under test is the distributed plumbing (driver-side k-means
    train, Arrow query assignment, per-cell GEMM cogroup, shared
    deterministic rank merge); pruning recall at nprobe < n_centroids
    is covered by pytest."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_build,
        ivf_knn_join,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding")
    )
    assigned, centroids = ivf_build(
        e, id_col="vec_id", n_centroids=6, seed=42, metric="cosine"
    )
    return ivf_knn_join(
        q,
        assigned,
        centroids,
        k=3,
        id_col="vec_id",
        metric="cosine",
        nprobe=6,
        score_decimals=4,
    ).select("qid", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))


@query(
    "vector_l2_consecutive",
    """
    SELECT a.vec_id,
           round(sqrt(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                 p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                    * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))), 4) AS l2_next
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id < 100
    """,
)
def vector_l2_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        l2_distance,
    )

    e = load_table(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") < 100).select("vec_id", F.col("embedding").alias("e_a"))
    b = e.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("e_b"))
    return a.join(b, "vec_id").select(
        "vec_id", F.round(l2_distance("e_a", "e_b"), 4).alias("l2_next")
    )


@query(
    "embedding_stats_by_label",
    """
    SELECT label,
           count(*) AS cnt,
           round(avg(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import l2_norm

    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg(l2_norm("embedding")), 4).alias("avg_norm"),
    )


@query(
    "knn_pq_adc_top5",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 2),
    scored AS (
        SELECT
            e.vec_id,
            round(
                list_sum(list_transform(list_zip(e.embedding, q.qe),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                / (
                    sqrt(list_sum(list_transform(e.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(q.qe,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                ), 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> 2
    )
    SELECT vec_id, cos_sim
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT 5
    """,
)
def knn_pq_adc_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-corpus kNN: PQ-encode the corpus (4·dim bytes -> 16
    bytes/row), ADC-prescreen on codes only, exact-rerank the bounded
    candidate set — FAISS's IVFPQ+refine recipe on Spark (operators/
    pq.py). The oracle is EXACT brute-force cosine: with a prescreen
    width of 40·k the refined top-5 provably matches it on this
    corpus, so the approximation is checked, not trusted. At 100 TB
    the win is that the scan/shuffle volume of the prescreen pass is
    the compressed size."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        pq_encode,
        pq_knn_query,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 2).select("embedding").first()["embedding"]
    corpus = emb.filter(F.col("vec_id") != 2)
    cb = pq_train(
        corpus, embedding_col="embedding", m=16, n_codes=32, seed=7, normalize=True
    )
    enc = pq_encode(corpus, cb, id_col="vec_id", normalize=True)
    return pq_knn_query(
        enc,
        cb,
        list(qvec),
        k=5,
        id_col="vec_id",
        metric="cosine",
        rerank_corpus=corpus,
        embedding_col="embedding",
        rerank_factor=40,
        score_decimals=4,
    ).withColumnRenamed("score", "cos_sim")


@query(
    "rerank_learned_scorer_top3",
    f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qe
        FROM embeddings WHERE vec_id IN (1, 2, 3)
    ),
    cand AS (
        SELECT q.qid, e.vec_id,
               round({_COS_DOUBLE.format(a='e.embedding', b='q.qe')}, 4)
                   AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <= 400 AND e.vec_id <> q.qid
    ),
    top10 AS (
        SELECT qid, vec_id, cos_sim,
               row_number() OVER (
                   PARTITION BY qid ORDER BY cos_sim DESC, vec_id
               ) AS rn
        FROM cand
    ),
    feat AS (
        SELECT t.qid, t.vec_id AS doc_id, t.cos_sim,
               len({_TOKS.format(x=_NORM)}) AS n_tokens
        FROM top10 t JOIN documents d ON d.doc_id = t.vec_id
        WHERE t.rn <= 10
    ),
    scored AS (
        SELECT qid, doc_id,
               round(0.8 * cos_sim
                     + 0.2 * (1.0 / (1.0 + exp(-(n_tokens - 40.0) / 20.0))),
                     6) AS score
        FROM feat
    ),
    ranked AS (
        SELECT qid, doc_id, score,
               row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, doc_id
               ) AS rank
        FROM scored
    )
    SELECT qid, doc_id, score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def rerank_learned_scorer_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval with a grouped-applyInPandas reranker: a
    cheap exact first stage bounds each query's candidates to 10, a
    feature join adds a document signal (token count), then
    ``rerank_grouped`` re-scores each query's candidate list as ONE
    Arrow batch with a learned-scorer stub (logistic blend — a real
    cross-encoder's ``predict_proba`` drops into the same callable)
    and emits only the top 3. The expensive Python stage touches
    k*|queries| rows, never the corpus — the serving shape that holds
    at 100 TB. Scores round before ranking and ties break on doc_id,
    so the SQL twin reproduces the ranking exactly."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        token_count,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        logistic_blend_scorer,
        rerank_grouped,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    corpus = emb.filter(F.col("vec_id") <= 400)
    cand = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), F.col("qe")), 4).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    top10 = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    feat = top10.join(docs, top10.vec_id == docs.doc_id).select(
        "qid", "doc_id", "cos_sim", "n_tokens"
    )
    return rerank_grouped(
        feat,
        group_col="qid",
        id_col="doc_id",
        scorer=logistic_blend_scorer("cos_sim", "n_tokens"),
        k=3,
    )


@query(
    "retrieval_maxsim_top10",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 5),
    scored AS (
        SELECT e.vec_id,
               round(list_sum(list_transform(range(1, 5), j ->
                   list_max(list_transform(range(1, 5), i -> {_SUBCOS}))
               )), 4) AS maxsim
        FROM embeddings e, q
        WHERE e.vec_id <= 300 AND e.vec_id <> 5
    )
    SELECT vec_id, maxsim
    FROM scored
    ORDER BY maxsim DESC, vec_id
    LIMIT 10
    """,
)
def retrieval_maxsim_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (ColBERT-style MaxSim): each
    embedding is treated as 4 contiguous 16-dim sub-vector slots and
    the score is sum over query slots of the max cosine against any
    document slot — partial matches score where a single pooled
    cosine flattens them. The scoring is one Catalyst HOF expression
    over the scan (no UDF, no shuffle) feeding
    TakeOrderedAndProject, the same shuffle-free top-k shape as exact
    kNN; at 100 TB the slots would be pre-split into columns at
    ingest and the plan is otherwise unchanged."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxsim_score,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 5).select(F.col("embedding").alias("qe"))
    return (
        emb.filter((F.col("vec_id") <= 300) & (F.col("vec_id") != 5))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(maxsim_score("embedding", "qe", 4), 4).alias("maxsim"),
        )
        .orderBy(F.desc("maxsim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "retrieval_maxsim_presplit_top10",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 5),
    scored AS (
        SELECT e.vec_id,
               round(list_sum(list_transform(range(1, 5), j ->
                   list_max(list_transform(range(1, 5), i -> {_SUBCOS}))
               )), 4) AS maxsim
        FROM embeddings e, q
        WHERE e.vec_id <= 300 AND e.vec_id <> 5
    )
    SELECT vec_id, maxsim
    FROM scored
    ORDER BY maxsim DESC, vec_id
    LIMIT 10
    """,
)
def retrieval_maxsim_presplit_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``retrieval_maxsim_top10``'s PRODUCTION layout: slots are
    split ONCE per row at ingest (``split_slots`` — m slices per
    row in the scan projection) and the scorer
    (``maxsim_score_presplit``) contains zero slice calls, so the
    per-pair work is exactly the m×m cosine lattice instead of
    re-slicing both vectors 2·m² times per comparison. Same oracle,
    same answer, the plan a 100 TB late-interaction corpus wants —
    at real scale the slot column is persisted at write time and the
    scan never touches the unsplit vector at all."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxsim_score_presplit,
        split_slots,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 5).select(
        split_slots("embedding", 4).alias("q_slots")
    )
    corpus = emb.filter((F.col("vec_id") <= 300) & (F.col("vec_id") != 5)).select(
        "vec_id", split_slots("embedding", 4).alias("d_slots")
    )
    return (
        corpus.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(maxsim_score_presplit("d_slots", "q_slots"), 4).alias("maxsim"),
        )
        .orderBy(F.desc("maxsim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "knn_binary_prescreen_top5",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
    qbits AS (SELECT {_PACKBITS.format(arr="qe")} AS qb FROM q),
    cand AS (
        SELECT e.vec_id, e.embedding AS emb,
               list_sum(list_transform(
                   list_zip({_PACKBITS.format(arr="e.embedding")}, qb.qb),
                   p -> bit_count(xor(p[1], p[2])))) AS hamming
        FROM embeddings e, qbits qb
        WHERE e.vec_id <> 7
        ORDER BY hamming, e.vec_id
        LIMIT 40
    ),
    scored AS (
        SELECT c.vec_id, round({_BKNN_COS}, 4) AS cos_sim
        FROM cand c, q
    )
    SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def knn_binary_prescreen_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized kNN serving shape: 1-bit sign packing
    (32-bit Horner words — overflow-exact in both engines), Hamming
    xor+popcount prescreen to 8x candidates, exact cosine rerank of
    only the survivors. The oracle replays BOTH stages bit-for-bit
    (same packing fold, same (distance, id) tiebreaks), so the
    approximation itself is what's checked, not just the final
    ranking. At 100 TB the packed column is the scan (16-32x less
    I/O); plan is scan -> popcount top-(k*8) -> rerank top-k, no
    shuffle (two TakeOrderedAndProject stages)."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
        knn_query_binary,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    return (
        knn_query_binary(
            emb.filter(F.col("vec_id") != 7),
            qvec,
            k=5,
            id_col="vec_id",
            prescreen_factor=8,
            metric="cosine",
            score_decimals=4,
        )
        .withColumnRenamed("score", "cos_sim")
    )


@query(
    "rerank_mmr_diversity_top3",
    f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qe
        FROM embeddings WHERE vec_id IN (1, 2, 3)
    ),
    cand0 AS (
        SELECT q.qid, e.vec_id, e.embedding AS de,
               round({_MMR_COS0}, 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <= 300 AND e.vec_id <> q.qid
    ),
    cand AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn
            FROM cand0) WHERE rn <= 8
    ),
    p1 AS (SELECT qid, vec_id AS id1, de AS e1 FROM cand WHERE rn = 1),
    m2 AS (
        SELECT c.qid, c.vec_id, c.de,
               round(0.7 * c.cos_sim
                     - 0.3 * round({_MMR_COS1}, 4), 6) AS mmr
        FROM cand c JOIN p1 p USING (qid)
        WHERE c.vec_id <> p.id1
    ),
    p2 AS (
        SELECT qid, vec_id AS id2, de AS e2 FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY mmr DESC, vec_id) AS rr
            FROM m2) WHERE rr = 1
    ),
    m3 AS (
        SELECT c.qid, c.vec_id,
               round(0.7 * c.cos_sim
                     - 0.3 * greatest(round({_MMR_COS1}, 4),
                                      round({_MMR_COS2}, 4)), 6) AS mmr
        FROM cand c JOIN p1 p USING (qid) JOIN p2 r USING (qid)
        WHERE c.vec_id <> p.id1 AND c.vec_id <> r.id2
    ),
    p3 AS (
        SELECT qid, vec_id AS id3 FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY mmr DESC, vec_id) AS rr
            FROM m3) WHERE rr = 1
    )
    SELECT qid, id1 AS doc_id, CAST(1 AS INT) AS rank FROM p1
    UNION ALL SELECT qid, id2 AS doc_id, CAST(2 AS INT) AS rank FROM p2
    UNION ALL SELECT qid, id3 AS doc_id, CAST(3 AS INT) AS rank FROM p3
    """,
)
def rerank_mmr_diversity_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversity selection over each
    query's top-8 cosine candidates: rank 1 is the most relevant,
    ranks 2-3 maximize 0.7*relevance - 0.3*max-similarity-to-picked
    — the redundancy penalty that keeps RAG context windows from
    filling with near-duplicates. The greedy loop runs as grouped
    applyInPandas over <= 8 rows per query (operator
    ``retrieval.mmr_rerank``); the oracle UNROLLS the same greedy
    steps (pick1 -> penalized argmax -> pick2 -> ...), with pairwise
    cosines rounded half-up to 4 and MMR values to 6 on both sides,
    ties on ascending id — a sequential algorithm made
    hash-checkable."""
    from pyspark.sql import Window

    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.retrieval import (
        mmr_rerank,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    cand = (
        emb.filter(F.col("vec_id") <= 300)
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("doc_id"),
            "embedding",
            F.round(cosine_similarity(F.col("embedding"), F.col("qe")), 4).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    top8 = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 8)
    return mmr_rerank(
        top8.select("qid", "doc_id", "embedding", "cos_sim"),
        group_col="qid",
        id_col="doc_id",
        vec_col="embedding",
        base_score_col="cos_sim",
        k=3,
        lam=0.7,
    )


@query(
    "retrieval_maxsim_ragged_top10",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 5),
    scored AS (
        SELECT e.vec_id,
               round(list_sum(list_transform(range(1, 4), j ->
                   list_max(list_transform(
                       range(1, CAST(e.vec_id % 4 AS INT) + 2),
                       i -> {_SUBCOS}))
               )), 4) AS maxsim
        FROM embeddings e, q
        WHERE e.vec_id <= 300 AND e.vec_id <> 5
    )
    SELECT vec_id, maxsim
    FROM scored
    ORDER BY maxsim DESC, vec_id
    LIMIT 10
    """,
)
def retrieval_maxsim_ragged_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIABLE-LENGTH late interaction — ColBERT-proper's ragged
    per-token matrix, the r12 growth item: each document carries an
    ``ARRAY<ARRAY<FLOAT>>`` token-embedding column whose TOKEN COUNT
    varies per doc (here 1 + vec_id % 4 sixteen-wide token vectors
    sliced from the fixture embedding — a deterministic stand-in for
    a real token encoder's output), the query carries 3 token
    vectors, and the score is ``maxsim_score_presplit``: sum over
    query tokens of the max cosine against ANY of the doc's tokens,
    however many it has. The scoring is one Catalyst HOF lattice over
    the ragged arrays — no UDF, no shuffle, no fixed-slot assumption
    — feeding the same TakeOrderedAndProject top-k tail as exact kNN.
    Docs with MORE tokens can only gain (max over a superset), which
    the oracle's unrolled ragged replay checks row-for-row. At 100 TB
    the token matrix is the stored layout (one row per doc, tokens
    nested) and this exact plan serves it."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        maxsim_score_presplit,
        split_slots,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 5).select(
        # 3 query tokens of width 16 (the first 48 dims)
        F.slice(split_slots(F.col("embedding"), 4), 1, 3).alias("q_toks")
    )
    # ragged doc token matrices: 1 + vec_id % 4 leading 16-wide slots
    docs = emb.filter((F.col("vec_id") <= 300) & (F.col("vec_id") != 5)).select(
        "vec_id",
        F.slice(
            split_slots(F.col("embedding"), 4),
            1,
            (F.col("vec_id") % 4 + 1).cast("int"),
        ).alias("d_toks"),
    )
    return (
        docs.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                maxsim_score_presplit(F.col("d_toks"), F.col("q_toks")), 4
            ).alias("maxsim"),
        )
        .orderBy(F.desc("maxsim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "retrieval_maxsim_from_index",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 5),
    scored AS (
        SELECT e.vec_id,
               round(list_sum(list_transform(range(1, 4), j ->
                   list_max(list_transform(
                       range(1, CAST(e.vec_id % 4 AS INT) + 2),
                       i -> {_SUBCOS}))
               )), 4) AS maxsim
        FROM embeddings e, q
        WHERE e.vec_id <= 300 AND e.vec_id <> 5
    )
    SELECT CAST(vec_id AS VARCHAR) AS id, maxsim
    FROM scored
    ORDER BY maxsim DESC, id
    LIMIT 10
    """,
)
def retrieval_maxsim_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``retrieval_maxsim_ragged_top10`` served THROUGH the persisted
    token-level index (``operators/late_interaction.py`` — the
    PLAID/ColBERTv2 shape, r13 verdict item 3) instead of brute
    force: the same ragged corpus's token vectors cluster into IVF
    cells at write time; the query's 3 tokens generate candidates
    from the probed cells' token rows (partition-pruned, map-side-
    combinable per-token max), and the bounded candidate set reranks
    exactly with ``maxsim_score_presplit`` — the identical scorer the
    brute-force twin compiles. Probing is EXHAUSTIVE here so the
    oracle's brute-force replay must match byte-for-byte (the
    ``collection_ivf_knn_end_to_end`` discipline: correctness gates
    prove the index path lossless; the bench's pruned probes measure
    the sublinear serve). Note the ORDER BY ties are broken on the
    STRING id both sides — the index serves string ids."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        split_slots,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.late_interaction import (
        maxsim_corpus_write,
        maxsim_index_build,
        maxsim_index_write,
        maxsim_search,
    )
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    q_toks = [
        list(t)
        for t in emb.filter(F.col("vec_id") == 5)
        .select(F.slice(split_slots(F.col("embedding"), 4), 1, 3).alias("q"))
        .first()["q"]
    ]
    docs = emb.filter((F.col("vec_id") <= 300) & (F.col("vec_id") != 5)).select(
        F.col("vec_id").cast("string").alias("id"),
        F.slice(
            split_slots(F.col("embedding"), 4),
            1,
            (F.col("vec_id") % 4 + 1).cast("int"),
        ).alias("tokens"),
    )
    assigned, C = maxsim_index_build(
        docs, id_col="id", tokens_col="tokens", n_centroids=8, seed=42
    )
    idx = tempfile.mkdtemp(prefix="vdb_maxsim_") + "/idx"
    maxsim_index_write(assigned, C, idx, build={"seed": 42})
    # the persisted BUCKETED rerank corpus (r15): stage 2 prunes to
    # the candidates' bucket dirs — the serve path the bench measures
    maxsim_corpus_write(docs, idx, id_col="id", tokens_col="tokens")
    return maxsim_search(
        spark,
        idx,
        q_toks,
        k=10,
        nprobe=8,  # exhaustive: 8 cells — the oracle is exact
        candidate_factor=4,
        id_col="id",
        tokens_col="tokens",
        score_decimals=4,
    )
