"""Deduplication + decontamination: exact, MinHash LSH, SimHash, ExactSubstr, n-gram overlap.

Split from the original single-file registry (r8); every query keeps
its exact name, body, and oracle — `tools/parity_local.py` guards the
registry contract across the split.
"""

from __future__ import annotations

from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401
    D,
    DataFrame,
    F,
    MINHASH_P,
    SparkSession,
    _BAND_H,
    _ESS_K,
    _HASH64,
    _MINHASH_BASE,
    _MINHASH_SIG,
    _NORM,
    _SHINGLES_CTE,
    _TOKS,
    _simhash_sql_terms,
    load_table,
    query,
)


@query(
    "dedup_exact_groups",
    f"""
    SELECT md5({_NORM}) AS fingerprint,
           min(doc_id) AS keep_id,
           count(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(d, id_col="doc_id", text_col="text")


@query(
    "dedup_jaccard_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) AS jaccard
    FROM shared
    JOIN sizes s1 ON s1.doc_id = id_a
    JOIN sizes s2 ON s2.doc_id = id_b
    WHERE round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) >= 0.5
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(d, id_col="doc_id", text_col="text", n=3, threshold=0.5)


@query(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    shsets AS (
        SELECT doc_id, list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS sh_list
        FROM toks
    ),
    bases AS (SELECT doc_id, {_MINHASH_BASE} AS base FROM shsets),
    sigs AS (SELECT doc_id, {_MINHASH_SIG} AS sig FROM bases),
    buckets AS (
        SELECT doc_id, b, {_BAND_H} AS h
        FROM sigs, unnest(range(0, 8)) AS bt(b)
    ),
    cand AS (
        SELECT x.doc_id AS id_a, y.doc_id AS id_b
        FROM buckets x JOIN buckets y
          ON x.b = y.b AND x.h = y.h AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    ),
    shared AS (
        SELECT c.id_a, c.id_b, count(*) AS c
        FROM cand c
        JOIN shing a ON a.doc_id = c.id_a
        JOIN shing b ON b.doc_id = c.id_b
         AND ({_HASH64.format(x='b.s')} % {MINHASH_P})
           = ({_HASH64.format(x='a.s')} % {MINHASH_P})
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) AS jaccard
    FROM shared
    JOIN sizes s1 ON s1.doc_id = id_a
    JOIN sizes s2 ON s2.doc_id = id_b
    WHERE round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) >= 0.5
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        d,
        id_col="doc_id",
        text_col="text",
        n=3,
        num_hashes=16,
        bands=8,
        threshold=0.5,
    )


@query(
    "dedup_simhash_values",
    f"""
    WITH th AS (
        SELECT doc_id,
               list_transform({_TOKS.format(x=_NORM)},
                   t -> {_HASH64.format(x='t')}) AS tok_hashes
        FROM documents
        WHERE doc_id < 200
    )
    SELECT doc_id, CAST({{terms}} AS BIGINT) AS simhash FROM th
    """.replace("{terms}", _simhash_sql_terms()),
)
def dedup_simhash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import simhash16

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select("doc_id", simhash16("text").alias("simhash"))


@query(
    "dedup_simhash_hamming_pairs",
    f"""
    WITH th AS (
        SELECT doc_id,
               list_transform({_TOKS.format(x=_NORM)},
                   t -> {_HASH64.format(x='t')}) AS tok_hashes
        FROM documents
    ),
    sh AS (SELECT doc_id, CAST({{terms}} AS BIGINT) AS simhash FROM th)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """.replace("{terms}", _simhash_sql_terms()),
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup at Hamming distance <= 3 via pigeonhole
    banding (operators/dedup.py::simhash_hamming_pairs): 4 contiguous
    bands of the 16-bit fingerprint generate candidates through
    equi-joins (a pair within distance 3 must agree exactly on >= 1
    band), bit_count(xor) verifies. The brute-force all-pairs SQL is
    the oracle, so the banding's exact-recall guarantee is what is
    actually checked."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_hamming_pairs(
        d, id_col="doc_id", text_col="text", max_distance=3
    )


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH {_SHINGLES_CTE},
    eval_sh AS (SELECT doc_id, s FROM shing WHERE doc_id % 97 = 0),
    train_sh AS (SELECT doc_id, s FROM shing WHERE doc_id % 97 <> 0),
    hits AS (
        SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
               count(DISTINCT t.s) AS shared_shingles
        FROM train_sh t JOIN eval_sh e ON t.s = e.s
        GROUP BY 1, 2
    )
    SELECT train_doc, eval_doc, CAST(shared_shingles AS BIGINT) AS shared_shingles
    FROM hits WHERE shared_shingles >= 3
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents sharing >= 3
    distinct 3-gram shingles with any held-out eval document (here the
    doc_id %% 97 == 0 slice plays the eval set; the threshold sits
    where the fixture yields hits, so the parity check is
    non-vacuous). The inverted shingle
    join is the same bounded-posting-list shape as the Jaccard dedup
    — the eval side is tiny, so at scale the join broadcasts and the
    sweep is one pass over the training corpus's shingles."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        word_shingles,
    )

    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(word_shingles("text", 3))).alias("s")
    )
    ev = F.col("doc_id") % 97 == 0
    train = sh.filter(~ev).select(F.col("doc_id").alias("train_doc"), "s")
    eval_ = sh.filter(ev).select(F.col("doc_id").alias("eval_doc"), "s")
    return (
        train.join(F.broadcast(eval_), "s")
        .groupBy("train_doc", "eval_doc")
        .agg(F.countDistinct("s").alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= 3)
    )


@query(
    "dedup_embedding_cosine_pairs",
    """
    WITH n AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(list_zip(a.e, b.e),
                 p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(list_zip(a.e, b.e),
          p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) >= 0.4
    """,
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEMM-broadcast variant (one BLAS multiply per Arrow batch);
    the expression form D.embedding_neardup_pairs has the same
    contract but evaluates per-pair array folds — it stays available
    for clusters where Python workers are undesirable."""
    e = load_table(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs_gemm(
        e, id_col="vec_id", embedding_col="embedding", threshold=0.4
    )


@query(
    "dedup_embedding_neardup_ivf",
    """
    WITH n AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(list_zip(a.e, b.e),
                 p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(list_zip(a.e, b.e),
          p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) >= 0.4
    """,
)
def dedup_embedding_neardup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell-bucketed semantic near-dup (ann.ivf_neardup_pairs) —
    the 100-TB path: KMeans cells on normalized vectors, multi-assign
    to n_assign nearest cells, per-cell blocked GEMM via
    applyInPandas, nothing driver-materialized. At fixture scale the
    auto-sizer picks n_centroids <= n_assign, so every pair is
    co-located and the result is exhaustive — the exact-SQL oracle
    applies verbatim; at real scale the same code prunes to cells."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_neardup_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return ivf_neardup_pairs(
        e, id_col="vec_id", embedding_col="embedding", threshold=0.4
    )


# --------------------------------------------------------------------------
# Round 2: dedup cluster assignment, temporal (as-of) join, batch
# sessionization, repetition-quality text signal, unpivot, ranking
# distribution windows, TPC-H Q9/Q13/Q15/Q16 shapes, IVF-indexed
# collection retrieval.
# --------------------------------------------------------------------------


@query(
    "dedup_connected_components",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pr AS (
        SELECT id_a, id_b
        FROM shared
        JOIN sizes s1 ON s1.doc_id = id_a
        JOIN sizes s2 ON s2.doc_id = id_b
        WHERE round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pr
        UNION ALL
        SELECT id_b, id_a FROM pr
    ),
    reach(node, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> duplicate CLUSTERS: Jaccard pair graph
    grouped by iterative min-label propagation (operators/graph.py),
    isolated docs joined back as their own singleton component. A
    downstream pipeline keeps min(doc_id) per component. Oracle is a
    DuckDB recursive CTE computing the same fixpoint."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
        connected_components,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, id_col="doc_id", text_col="text", n=3, threshold=0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    D.release_cache(pairs)
    return (
        d.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )


@query(
    "decontaminate_embedding_cosine",
    """
    WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE label = 9),
    tr AS (SELECT vec_id, embedding FROM embeddings WHERE label < 9),
    s AS (
        SELECT tr.vec_id,
               round(
                   list_sum(list_transform(list_zip(tr.embedding, ev.embedding),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (
                       sqrt(list_sum(list_transform(tr.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                       * sqrt(list_sum(list_transform(ev.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                   ), 4) AS cs
        FROM tr, ev
    )
    SELECT vec_id, count(*) AS n_eval_hits, max(cs) AS max_cos
    FROM s WHERE cs >= 0.30
    GROUP BY vec_id
    """,
)
def decontaminate_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: drop training vectors too
    close (cosine >= threshold) to any held-out eval vector — the
    semantic complement of `decontaminate_ngram_overlap` (paraphrased
    leakage that n-gram overlap misses). The eval side is small by
    construction, so it BROADCASTS and the cosine runs as a codegen
    expression over one corpus scan: O(train x eval) FLOPs but O(train)
    shuffle — at 100 TB the eval set is still a few thousand rows, so
    the plan shape holds. Threshold 0.30 calibrated non-vacuous on the
    fixture (157 flagged of 450 train rows)."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
        cosine_similarity,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("label") == 9).select(
        F.col("vec_id").alias("ev_id"), F.col("embedding").alias("ev_emb")
    )
    tr = emb.filter(F.col("label") < 9).select("vec_id", "embedding")
    cs = F.round(cosine_similarity(F.col("embedding"), F.col("ev_emb")), 4)
    return (
        tr.join(F.broadcast(ev))
        .withColumn("cs", cs)
        .filter(F.col("cs") >= 0.30)
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_eval_hits"),
            F.max("cs").alias("max_cos"),
        )
    )


# --------------------------------------------------------------------------
# Round 4 additions: per-document duplication fraction, PII scrubbing,
# exact-sum distributed regression, bigram-LM quality scoring,
# temperature-weighted source mixing, and deterministic 3-way splits.
# --------------------------------------------------------------------------


@query(
    "dedup_dup_ngram_fraction",
    f"""
    WITH {_SHINGLES_CTE},
    dfreq AS (SELECT s, count(*) AS docs FROM shing GROUP BY 1)
    SELECT sh.doc_id AS id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN d.docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_shingles,
           round(sum(CASE WHEN d.docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS dup_frac
    FROM shing sh JOIN dfreq d USING (s)
    GROUP BY 1
    """,
)
def dedup_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated 3-gram fraction — the share of a doc's
    distinct shingles that appear in at least one other document
    (Lee et al. 2022's memorization signal, the filter behind
    "drop documents that are >X% duplicated text"). Runs on the
    dedup operator (operators/dedup.py::dup_ngram_fraction): one
    document-frequency hash-agg, a fan-out-free 1:1 join back, one
    per-doc agg — no all-pairs stage, so the shape holds at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    return D.dup_ngram_fraction(d, id_col="doc_id", text_col="text", n=3)


@query(
    "dedup_exact_substring_coverage",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS.format(x=_NORM)} AS t FROM documents
    ),
    nt AS (SELECT doc_id, t, len(t) AS n_tokens FROM toks WHERE len(t) > 0),
    wl AS (
        SELECT doc_id,
               list_transform(range(1, n_tokens - {_ESS_K} + 2),
                   i -> {_HASH64.format(
                       x=f"array_to_string(list_slice(t, i, i + {_ESS_K - 1}), ' ')"
                   )}) AS ws
        FROM nt WHERE n_tokens >= {_ESS_K}
    ),
    win AS (
        SELECT doc_id, unnest(range(1, len(ws) + 1)) AS s, unnest(ws) AS wh
        FROM wl
    ),
    cw AS (
        SELECT doc_id, s, s + {_ESS_K - 1} AS e,
               min(doc_id) OVER (PARTITION BY wh)
                   <> max(doc_id) OVER (PARTITION BY wh) AS x
        FROM win
    ),
    isl AS (
        SELECT doc_id, s, e,
               coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pe
        FROM cw WHERE x
    ),
    pd AS (
        SELECT doc_id, count(*) AS dup_windows,
               CAST(sum(greatest(e - greatest(s - 1, pe), 0)) AS BIGINT)
                   AS covered_tokens
        FROM isl GROUP BY 1
    )
    SELECT n.doc_id AS id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
           coalesce(p.dup_windows, 0) AS dup_windows,
           coalesce(p.covered_tokens, 0) AS covered_tokens,
           round(coalesce(p.covered_tokens, 0)::DOUBLE / n.n_tokens, 4)
               AS coverage
    FROM nt n LEFT JOIN pd p USING (doc_id)
    """,
)
def dedup_exact_substring_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr coverage (Lee et al. 2022 §4.1, the suffix-array
    dedup, at 8-token window granularity): per document, the fraction
    of TOKEN POSITIONS inside at least one 8-token window whose exact
    token sequence also occurs in a different document — overlapping
    duplicated windows union-merged by a gaps-and-islands running
    max, i.e. the actual share of text an ExactSubstr cut removes
    (positional, unlike dedup_dup_ngram_fraction's distinct-shingle
    share). Cross-doc detection is a map-side-combinable
    groupBy(hash).agg(min(id)!=max(id)) + AQE-skew-splittable
    semi-join back — no distinct, no self-join, no posting-list
    collection, and no window over the (skewable) hash key
    (operators/dedup.py::exact_substring_coverage)."""
    d = load_table(spark, sf_dir, "documents")
    out = D.exact_substring_coverage(
        d, id_col="doc_id", text_col="text", k=_ESS_K
    )
    return out.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "dup_windows",
        "covered_tokens",
        "coverage",
    )


@query(
    "dedup_exact_substring_removal",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS.format(x=_NORM)} AS t FROM documents
    ),
    nt AS (SELECT doc_id, t, len(t) AS n_tokens FROM toks WHERE len(t) > 0),
    wl AS (
        SELECT doc_id,
               list_transform(range(1, n_tokens - {_ESS_K} + 2),
                   i -> {_HASH64.format(
                       x=f"array_to_string(list_slice(t, i, i + {_ESS_K - 1}), ' ')"
                   )}) AS ws
        FROM nt WHERE n_tokens >= {_ESS_K}
    ),
    win AS (
        SELECT doc_id, unnest(range(1, len(ws) + 1)) AS s, unnest(ws) AS wh
        FROM wl
    ),
    owned AS (
        SELECT doc_id, s,
               min(doc_id) OVER (PARTITION BY wh) AS min_id
        FROM win
    ),
    covered AS (
        SELECT DISTINCT doc_id, unnest(range(s, s + {_ESS_K})) AS p
        FROM owned WHERE min_id < doc_id
    ),
    pos AS (
        SELECT doc_id, unnest(range(1, len(t) + 1)) AS p, unnest(t) AS tok
        FROM nt
    ),
    kept AS (
        SELECT pos.doc_id, pos.p, pos.tok
        FROM pos LEFT JOIN covered c USING (doc_id, p)
        WHERE c.p IS NULL
    ),
    rebuilt AS (
        SELECT doc_id, count(*) AS kept_tokens,
               string_agg(tok, ' ' ORDER BY p) AS cleaned_text
        FROM kept GROUP BY 1
    )
    SELECT n.doc_id AS id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
           coalesce(r.kept_tokens, 0) AS kept_tokens,
           coalesce(r.cleaned_text, '') AS cleaned_text
    FROM nt n LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def dedup_exact_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT half of ExactSubstr dedup: token positions inside an
    8-token window whose exact sequence also occurs in an EARLIER doc
    (grouped min id per window hash < this id, map-side combinable,
    joined back on the hash) are removed and the text
    rebuilt from the survivors — the earliest doc keeps its text
    verbatim, later copies lose exactly the spans that already exist
    upstream, a fully-duplicated doc collapses to the empty string
    (operators/dedup.py::exact_substring_removal; rebuild is an
    order-free sort_array(collect_list) bounded by DOCUMENT length).
    Complements dedup_exact_substring_coverage (the MEASURE half)."""
    d = load_table(spark, sf_dir, "documents")
    out = D.exact_substring_removal(
        d, id_col="doc_id", text_col="text", k=_ESS_K
    )
    return out.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "kept_tokens",
        "cleaned_text",
    )


@query(
    "decontaminate_overlap_fraction",
    f"""
    WITH {_SHINGLES_CTE},
    bench AS (SELECT DISTINCT s FROM shing WHERE doc_id % 41 = 0),
    hits AS (
        SELECT sh.doc_id, count(*) AS c
        FROM shing sh JOIN bench b ON b.s = sh.s
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(z.n_sh, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(h.c, 0) AS BIGINT) AS n_overlap,
           round(coalesce(h.c, 0)::DOUBLE
                 / greatest(coalesce(z.n_sh, 0), 1), 4) AS overlap_frac,
           round(coalesce(h.c, 0)::DOUBLE
                 / greatest(coalesce(z.n_sh, 0), 1), 4) >= 0.2 AS contaminated
    FROM documents d
    LEFT JOIN sizes z ON z.doc_id = d.doc_id
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    """,
)
def decontaminate_overlap_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination FRACTION against a benchmark slice
    (doc_id % 41 == 0 plays the eval suite): share of a doc's
    distinct 3-grams that appear anywhere in the benchmark, plus the
    >= 0.2 gate — the GPT-3-style dirty-document score, complementing
    decontaminate_ngram_overlap's pairwise (train_doc, eval_doc)
    listing. Engine plan (operators/decontaminate.py): benchmark
    n-gram HASHES broadcast (8 B/row), docs explode to distinct
    n-gram hashes inside the scan stage, one map-side-combinable agg
    per doc — the only shuffle carries one row per document. Note the
    benchmark docs themselves score 1.0 (they are their own
    n-grams), which keeps the gate non-vacuous on the fixture."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.decontaminate import (
        ngram_overlap,
    )

    d = load_table(spark, sf_dir, "documents")
    return ngram_overlap(
        d,
        d.filter(F.col("doc_id") % 41 == 0),
        id_col="doc_id",
        text_col="text",
        n=3,
        threshold=0.2,
    )


@query(
    "dedup_cluster_keep_canonical",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pr AS (
        SELECT id_a, id_b
        FROM shared
        JOIN sizes s1 ON s1.doc_id = id_a
        JOIN sizes s2 ON s2.doc_id = id_b
        WHERE round(c::DOUBLE / (s1.n_sh + s2.n_sh - c), 4) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pr
        UNION ALL
        SELECT id_b, id_a FROM pr
    ),
    reach(node, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    assign AS (
        SELECT d.doc_id,
               CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    sz AS (
        SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
        FROM assign GROUP BY 1
    )
    SELECT a.doc_id, s.cluster_size
    FROM assign a JOIN sz s USING (component)
    WHERE a.doc_id = a.component
    """,
)
def dedup_cluster_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT half of cluster dedup (complements
    dedup_connected_components, the MEASURE half): near-dup pair
    graph -> connected components -> keep exactly ONE canonical doc
    per cluster (the min doc_id = the component label itself, so the
    keep test is the shuffle-free ``doc_id == component``), reporting
    how many near-duplicates each survivor absorbed. Singletons
    survive as clusters of one — the output IS the deduplicated
    corpus id set, the thing a training pipeline feeds downstream.
    One extra map-side-combinable count per component on top of the
    component assignment; no new shuffle shape at 100 TB."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
        connected_components,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(
        d, id_col="doc_id", text_col="text", n=3, threshold=0.5
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    D.release_cache(pairs)
    assign = (
        d.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )
    sizes = assign.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        assign.filter(F.col("doc_id") == F.col("component"))
        .join(sizes, "component")
        .select("doc_id", "cluster_size")
    )


@query(
    "dedup_canonical_url",
    """
    WITH pages AS (
        SELECT doc_id, doc_id // 2 AS page FROM documents WHERE doc_id < 1000
    )
    SELECT 'https://www.example' || CAST(page % 5 AS VARCHAR)
               || '.com/page/' || CAST(page AS VARCHAR)
               || '?id=' || CAST(page AS VARCHAR) AS canonical_url,
           count(*) AS n_variants,
           min(doc_id) AS keeper_id
    FROM pages
    GROUP BY 1
    """,
)
def dedup_canonical_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL exact dedup — the cheapest highest-yield dedup
    pass a web corpus gets: canonicalize every crawl URL (lowercase
    scheme+host, strip utm_*/click-id tracking params, drop the
    fragment; functions/text.py::canonical_url over Spark's real
    parse_url — all codegen, no UDF), then collapse to one keeper per
    canonical key with ONE hash-shuffle (group by canonical). The
    fixture carries no URL column, so the query constructs two
    same-page variants per page id from fixture columns — even docs
    get an UPPERCASED scheme/host + utm_source/fbclid + fragment, odd
    docs a gclid — and the canonicalizer must collapse each pair; the
    oracle states the expected canonical form directly (the same
    construct-then-verify pattern as scalar_url_parse). 100 TB shape:
    pure projection + one digest-keyed exchange; AQE handles
    hot-domain skew on the canonical key."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        canonical_url,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    page = F.expr("doc_id DIV 2")
    pstr = page.cast("string")
    even = F.col("doc_id") % 2 == 0
    did = F.col("doc_id").cast("string")
    host = F.when(
        even, F.concat(F.lit("WWW.Example"), (page % 5).cast("string"), F.lit(".COM"))
    ).otherwise(
        F.concat(F.lit("www.example"), (page % 5).cast("string"), F.lit(".com"))
    )
    scheme = F.when(even, F.lit("HTTPS")).otherwise(F.lit("https"))
    tracking = F.when(
        even, F.concat(F.lit("&utm_source=feed&fbclid="), did)
    ).otherwise(F.concat(F.lit("&gclid=g"), did))
    frag = F.when(even, F.lit("#top")).otherwise(F.concat(F.lit("#sec"), did))
    url = F.concat(
        scheme, F.lit("://"), host, F.lit("/page/"), pstr,
        F.lit("?id="), pstr, tracking, frag,
    )
    return (
        d.select("doc_id", canonical_url(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_id"),
        )
    )


@query(
    "dedup_neardup_gate_compacted",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS.format(x=_NORM)} AS t FROM documents
    ),
    shsets AS (
        SELECT doc_id, list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS sh_list
        FROM toks WHERE len(t) > 0
    ),
    bases AS (SELECT doc_id, {_MINHASH_BASE} AS base FROM shsets),
    sigs AS (SELECT doc_id, {_MINHASH_SIG} AS sig FROM bases),
    buckets AS (
        SELECT doc_id, b, {_BAND_H} AS h
        FROM sigs, unnest(range(0, 8)) AS bt(b)
    ),
    ref AS (
        SELECT DISTINCT b, h FROM buckets WHERE doc_id % 7 <> 0
    ),
    inc AS (SELECT doc_id, b, h FROM buckets WHERE doc_id % 7 = 0),
    hits AS (
        SELECT i.doc_id, count(*) AS c
        FROM inc i JOIN ref r ON i.b = r.b AND i.h = r.h
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_bands,
           coalesce(h.c, 0) = 0 AS novel
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 7 = 0
    """,
)
def dedup_neardup_gate_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The band index's FULL maintenance lifecycle under the driver's
    hash gate: build from half the corpus, ``band_index_append`` the
    other half (two incremental batches — the small-files growth
    path), then ``band_index_compact`` (rewrite every part into a
    bounded-file-count versioned directory, atomic sidecar swap), and
    serve a novelty gate from the compacted index. The oracle
    recomputes the gate brute-force over the WHOLE corpus, so the
    result only matches if append preserved the band family across
    batches AND compaction was content-lossless. File-count bounds
    and torn-append interplay are pinned in tests/test_band_index.py
    (not SQL-expressible)."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_append,
        band_index_build,
        band_index_bucket_keys,
        band_index_compact,
    )

    d = load_table(spark, sf_dir, "documents")
    mod = F.col("doc_id") % 7
    build = d.filter(mod.isin(1, 2, 3))
    batch1 = d.filter(mod.isin(4, 5))
    batch2 = d.filter(mod == 6)
    incoming = d.filter(mod == 0).select("doc_id", "text")
    idx = tempfile.mkdtemp(prefix="vdb_compact_gate_") + "/idx"
    band_index_build(build, idx, id_col="doc_id", text_col="text")
    band_index_append(spark, idx, batch1)
    band_index_append(spark, idx, batch2)
    band_index_compact(spark, idx)
    keys = band_index_bucket_keys(spark, idx)
    return D.novelty_gate(incoming, keys, id_col="doc_id", text_col="text")


@query(
    "text_common_segment_removal",
    """
    WITH base AS (
        SELECT doc_id,
               coalesce(array_to_string(list_slice(string_split(coalesce(text, ''), ' '), 1, 12), ' '), '') AS c1,
               coalesce(array_to_string(list_slice(string_split(coalesce(text, ''), ' '), 13, 24), ' '), '') AS c2
        FROM documents WHERE doc_id < 600
    ),
    raw AS (
        SELECT doc_id,
               'nav home about contact' || chr(10) || c1 || chr(10)
                   || 'copyright footer all rights reserved' || chr(10) || c2 AS t
        FROM base
    ),
    lines AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM raw),
    segs AS (
        SELECT doc_id, i AS pos, ls[i] AS seg
        FROM lines, UNNEST(generate_series(1, len(ls))) AS g(i)
    ),
    freq AS (SELECT seg, count(DISTINCT doc_id) AS n_docs FROM segs GROUP BY 1),
    kept AS (
        SELECT s.doc_id, s.pos, s.seg
        FROM segs s JOIN freq f USING (seg) WHERE f.n_docs < 3
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(seg, chr(10) ORDER BY pos) AS cleaned
        FROM kept GROUP BY 1
    )
    SELECT l.doc_id,
           CAST(len(l.ls) AS BIGINT) AS n_segments,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(a.cleaned, '') AS cleaned
    FROM lines l LEFT JOIN agg a USING (doc_id)
    """,
)
def text_common_segment_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document boilerplate removal — the C4 rule (Raffel et al.
    2020 §2.2: drop any line occurring in >= 3 documents of the
    corpus), the complement of the within-document pass
    (text_repetition_removal). The fixture's documents are
    single-line, so the query plants the boilerplate identically in
    both engines: every doc becomes 4 lines — two nav/footer lines
    shared by ALL docs (corpus-common, must vanish from every doc)
    around two content chunks (doc-local, must survive; short docs'
    empty second chunk is itself corpus-common and vanishes too).
    operators/dedup.py::remove_common_segments — posexplode, one
    distinct + map-side-combinable segment count, AQE-skew-splittable
    join back, per-doc ordered reassembly; no Window over the segment
    key, no UDF."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    raw = F.concat_ws(
        "\n",
        F.lit("nav home about contact"),
        F.array_join(F.slice(words, 1, 12), " "),
        F.lit("copyright footer all rights reserved"),
        F.array_join(F.slice(words, 13, 12), " "),
    )
    return D.remove_common_segments(
        d.select("doc_id", raw.alias("planted")),
        id_col="doc_id",
        text_col="planted",
        sep="\n",
        min_docs=3,
    )


@query(
    "dedup_band_index_audit",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS.format(x=_NORM)} AS t FROM documents
    ),
    shsets AS (
        SELECT doc_id, list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS sh_list
        FROM toks WHERE len(t) > 0
    ),
    bases AS (SELECT doc_id, {_MINHASH_BASE} AS base FROM shsets),
    sigs AS (SELECT doc_id, {_MINHASH_SIG} AS sig FROM bases),
    buckets AS (
        SELECT doc_id, b, {_BAND_H} AS h
        FROM sigs, unnest(range(0, 8)) AS bt(b)
    ),
    kb AS (SELECT DISTINCT b, h FROM buckets WHERE doc_id % 7 IN (1, 2, 3)),
    ka AS (
        SELECT DISTINCT bk.b, bk.h
        FROM documents a JOIN buckets bk ON bk.doc_id = a.doc_id + 1
        WHERE a.doc_id % 7 = 0
    ),
    kc AS (SELECT DISTINCT b, h FROM buckets WHERE doc_id % 7 IN (4, 5, 6)),
    counts AS (
        SELECT (SELECT count(*) FROM kb)
             + (SELECT count(*) FROM ka)
             + (SELECT count(*) FROM kc) AS key_rows,
               (SELECT count(*) FROM
                   (SELECT * FROM kb UNION SELECT * FROM ka
                    UNION SELECT * FROM kc)) AS distinct_keys
    ),
    nb AS (
        SELECT count(*) AS n_build FROM toks
        WHERE doc_id % 7 IN (1, 2, 3) AND len(t) > 0
    ),
    ndoc AS (
        SELECT (SELECT n_build FROM nb)
             + (SELECT count(*) FROM documents a
                JOIN documents b ON b.doc_id = a.doc_id + 1
                WHERE a.doc_id % 7 = 0)
             + (SELECT count(*) FROM documents
                WHERE doc_id % 7 IN (4, 5, 6)) AS n_docs
    ),
    mm AS (
        SELECT CAST(greatest(4 * n_build, 1) AS DOUBLE) AS cap
        FROM nb
    )
    SELECT n_docs,
           key_rows,
           distinct_keys,
           round(key_rows * 1.0 / distinct_keys, 4) AS dup_key_ratio,
           round(n_docs / cap, 4) AS filter_capacity_used,
           (round(key_rows * 1.0 / distinct_keys, 4) > 1.05
            OR round(n_docs / cap, 4) > 1.0) AS compact_recommended
    FROM counts, ndoc, mm
    """,
)
def dedup_band_index_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "when do I compact?" audit for the band index
    (operators/band_index.py::band_index_audit — the maintenance twin
    of collection_ivf_balance_audit's "when do I refresh?"): build
    from 3/7 of the corpus, append a batch of RE-INGESTED content
    (every %7==0 doc carries its doc_id+1 neighbor's text under a new
    id — batch-distinct bucket keys that duplicate corpus keys, the
    exact bloat the corpus-independent append design defers to
    compaction) and a batch of genuinely new content (%7 in 4,5,6),
    then audit. The duplicate-key ratio crosses the query's 1.05
    threshold and flips compact_recommended; the oracle recomputes
    EVERYTHING from raw text — per-batch distinct band-key sets and
    their union (the append design's exact key-row arithmetic), the
    indexed-doc count, and even the id-guard filter's SIZING capacity
    (4 * n_build ids — what rebuild_filter records in the sidecar at
    build time; r12 moved the audit's denominator from the derived
    density formula to this recording, per the r11 ADVICE finding on
    expected_ids-sized filters). File counts are reported but not
    selected here (not content-derivable; pinned in pytest)."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_append,
        band_index_audit,
        band_index_build,
    )

    d = load_table(spark, sf_dir, "documents")
    mod = F.col("doc_id") % 7
    build = d.filter(mod.isin(1, 2, 3))
    batch_dup = (
        d.filter(mod == 0)
        .join(
            d.select(
                (F.col("doc_id") - 1).alias("doc_id"),
                F.col("text").alias("_t1"),
            ),
            "doc_id",  # re-ingest REQUIRES the +1 neighbor (oracle mirrors)
        )
        .select("doc_id", F.col("_t1").alias("text"))
    )
    batch_new = d.filter(mod.isin(4, 5, 6)).select("doc_id", "text")
    idx = tempfile.mkdtemp(prefix="vdb_band_audit_") + "/idx"
    band_index_build(build, idx, id_col="doc_id", text_col="text")
    band_index_append(spark, idx, batch_dup)
    band_index_append(spark, idx, batch_new)
    return band_index_audit(spark, idx, dup_ratio_threshold=1.05).select(
        "n_docs",
        "key_rows",
        "distinct_keys",
        "dup_key_ratio",
        "filter_capacity_used",
        "compact_recommended",
    )


@query(
    "dedup_band_index_delete_gate",
    f"""
    WITH {_SHINGLES_CTE},
    shsets AS (
        SELECT doc_id, list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS sh_list
        FROM toks WHERE len(t) > 0
    ),
    bases AS (SELECT doc_id, {_MINHASH_BASE} AS base FROM shsets),
    sigs AS (SELECT doc_id, {_MINHASH_SIG} AS sig FROM bases),
    buckets AS (
        SELECT doc_id, b, {_BAND_H} AS h
        FROM sigs, unnest(range(0, 8)) AS bt(b)
    ),
    ref AS (SELECT DISTINCT b, h FROM buckets WHERE doc_id % 5 <> 0),
    inc AS (
        SELECT doc_id + 1000000 AS doc_id, b, h FROM buckets
        WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id, b, h FROM buckets
        WHERE doc_id % 5 = 1
    ),
    hits AS (
        SELECT i.doc_id, count(*) AS c
        FROM inc i JOIN ref r ON i.b = r.b AND i.h = r.h
        GROUP BY 1
    ),
    incids AS (
        SELECT doc_id + 1000000 AS doc_id FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id FROM documents WHERE doc_id % 5 = 1
    )
    SELECT CAST(i.doc_id AS VARCHAR) AS id,
           CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_bands,
           coalesce(h.c, 0) = 0 AS novel
    FROM incids i LEFT JOIN hits h ON h.doc_id = i.doc_id
    """,
)
def dedup_band_index_delete_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-aware novelty gating from the persisted band index —
    the text twin of ``collection_ivf_delete_serve``
    (``operators/band_index.py::band_index_delete``): build the band
    index over the WHOLE corpus, delete every ``doc_id % 5 == 0``
    document through the index (tombstoned ids + RETIRED bucket keys
    — keys no surviving doc also emits — by the r13 refcount
    arithmetic: per-key decrements off the batch docs' recorded key
    arrays against the ``cnt`` contributor counts in ``bucket_keys``,
    never a bands scan, never a re-shingle), then gate a probe batch
    of VERBATIM
    COPIES: copies of the deleted docs (ids +1000000) must gate by
    the SURVIVORS' keys only — novel wherever the deleted doc owned
    its content exclusively, still-duplicate wherever a surviving doc
    shares a band bucket — and copies of kept docs (%5 == 1, ids
    +2000000) must hit all 8 bands exactly as before the delete. The
    oracle replays the full MinHash band arithmetic over the
    surviving corpus, so every (id, n_hit_bands, novel) row checks
    the served keys equal "distinct keys of the survivors" —
    byte-for-byte, which is precisely the removed-keys mask's
    contract. Un-retire-on-re-append and the compaction purge are
    pinned in tests/test_band_delete.py."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_bucket_keys,
        band_index_build,
        band_index_delete,
        band_index_meta,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        novelty_gate,
    )

    d = load_table(spark, sf_dir, "documents")
    idx = tempfile.mkdtemp(prefix="vdb_bdel_") + "/bidx"
    band_index_build(d, idx, id_col="doc_id", text_col="text")
    doomed = d.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    band_index_delete(spark, idx, doomed)
    meta = band_index_meta(idx)
    probes = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 5 == 1).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
    )
    keys = band_index_bucket_keys(spark, idx)
    return novelty_gate(
        probes,
        keys,
        id_col="doc_id",
        text_col="text",
        n=meta["n"],
        num_hashes=meta["num_hashes"],
        bands=meta["bands"],
    ).select(
        F.col("doc_id").cast("string").alias("id"),
        F.col("n_hit_bands").cast("bigint").alias("n_hit_bands"),
        "novel",
    )


_APPLY_TOKS = _TOKS.format(x=_NORM)

@query(
    "dedup_band_index_apply_gate",
    f"""
    WITH src AS (
        SELECT doc_id, text, TRUE AS is_ref FROM documents
        WHERE doc_id % 7 NOT IN (1, 3)
        UNION ALL
        SELECT doc_id, text || ' updated', TRUE FROM documents
        WHERE doc_id % 7 = 1
        UNION ALL
        SELECT doc_id + 1000000, text, TRUE FROM documents
        WHERE doc_id % 7 = 2
        UNION ALL
        SELECT doc_id + 2000000, text, FALSE FROM documents
        WHERE doc_id % 7 = 3
        UNION ALL
        SELECT doc_id + 3000000, text, FALSE FROM documents
        WHERE doc_id % 7 = 1
        UNION ALL
        SELECT doc_id + 4000000, text || ' updated', FALSE FROM documents
        WHERE doc_id % 7 = 1
        UNION ALL
        SELECT doc_id + 5000000, text, FALSE FROM documents
        WHERE doc_id % 7 = 2
    ),
    toks AS (SELECT doc_id, is_ref, {_APPLY_TOKS} AS t FROM src),
    shsets AS (
        SELECT doc_id, is_ref, list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS sh_list
        FROM toks WHERE len(t) > 0
    ),
    bases AS (SELECT doc_id, is_ref, {_MINHASH_BASE} AS base FROM shsets),
    sigs AS (SELECT doc_id, is_ref, {_MINHASH_SIG} AS sig FROM bases),
    buckets AS (
        SELECT doc_id, is_ref, b, {_BAND_H} AS h
        FROM sigs, unnest(range(0, 8)) AS bt(b)
    ),
    ref AS (SELECT DISTINCT b, h FROM buckets WHERE is_ref),
    inc AS (SELECT doc_id, b, h FROM buckets WHERE NOT is_ref),
    hits AS (
        SELECT i.doc_id, count(*) AS c
        FROM inc i JOIN ref r ON i.b = r.b AND i.h = r.h
        GROUP BY 1
    ),
    incids AS (
        SELECT doc_id + 2000000 AS doc_id FROM documents WHERE doc_id % 7 = 3
        UNION ALL
        SELECT doc_id + 3000000 FROM documents WHERE doc_id % 7 = 1
        UNION ALL
        SELECT doc_id + 4000000 FROM documents WHERE doc_id % 7 = 1
        UNION ALL
        SELECT doc_id + 5000000 FROM documents WHERE doc_id % 7 = 2
    )
    SELECT CAST(i.doc_id AS VARCHAR) AS id,
           CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_bands,
           coalesce(h.c, 0) = 0 AS novel
    FROM incids i LEFT JOIN hits h ON h.doc_id = i.doc_id
    """,
)
def dedup_band_index_apply_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic batch TEXT mutation of the persisted band index
    (``operators/band_index.py::band_index_apply`` — the one-call
    delete+update+insert the id-free band layout supports honestly at
    one part-rewrite cost): build the index over the whole corpus,
    then apply DELETE every %7==3 doc, UPDATE every %7==1 doc's text
    (append ' updated'), INSERT verbatim copies of the %7==2 docs
    under new ids (+1000000) — one sidecar swap, no tombstone phase
    left behind. Four probe families then gate against the served
    keys: the deleted docs' text (+2M — novel wherever no survivor
    shares it), the updated docs' OLD text (+3M — its rows were
    REPLACED, so it gates like deleted content), the updated docs'
    NEW text (+4M — must hit all 8 bands), and the inserted copies'
    content (+5M — duplicate via both the original and the copy).
    The oracle replays the full MinHash band arithmetic over the
    FINAL corpus, so every (id, n_hit_bands, novel) row checks that
    the rewrite's served keys equal exactly the final corpus's
    distinct keys — the whole point of deriving bucket_keys from the
    post-apply bands. Refusals, purge-of-prior-tombstones and replay
    idempotence are pinned in tests/test_band_delete.py."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_apply,
        band_index_bucket_keys,
        band_index_build,
        band_index_meta,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        novelty_gate,
    )

    d = load_table(spark, sf_dir, "documents")
    idx = tempfile.mkdtemp(prefix="vdb_bapply_") + "/bidx"
    band_index_build(d, idx, id_col="doc_id", text_col="text")
    meta = band_index_meta(idx)
    m7 = F.col("doc_id") % 7
    upserts = (
        d.filter(m7 == 1)
        .select("doc_id", F.concat(F.col("text"), F.lit(" updated")).alias("text"))
        .unionByName(
            d.filter(m7 == 2).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    band_index_apply(
        spark, idx, upserts=upserts,
        delete_ids=d.filter(m7 == 3).select("doc_id"),
    )
    probes = (
        d.filter(m7 == 3)
        .select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
        .unionByName(
            d.filter(m7 == 1).select(
                (F.col("doc_id") + 3000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            d.filter(m7 == 1).select(
                (F.col("doc_id") + 4000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" updated")).alias("text"),
            )
        )
        .unionByName(
            d.filter(m7 == 2).select(
                (F.col("doc_id") + 5000000).alias("doc_id"), "text"
            )
        )
    )
    return novelty_gate(
        probes,
        band_index_bucket_keys(spark, idx),
        id_col="doc_id",
        text_col="text",
        n=meta["n"],
        num_hashes=meta["num_hashes"],
        bands=meta["bands"],
    ).select(
        F.col("doc_id").cast("string").alias("id"),
        F.col("n_hit_bands").cast("bigint").alias("n_hit_bands"),
        "novel",
    )
