"""Training-data pipeline: mixing, packing, multimodal, end-to-end DAG.

Split from the original single-file registry (r8); every query keeps
its exact name, body, and oracle — `tools/parity_local.py` guards the
registry contract across the split.
"""

from __future__ import annotations

from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401
    D,
    DataFrame,
    F,
    SparkSession,
    T,
    _HASH64,
    _NORM,
    _SHINGLES_CTE,
    _SW,
    _TOKS,
    load_table,
    query,
)


@query(
    "pack_sequences_by_token_budget",
    f"""
    WITH counted AS (
        SELECT doc_id, len({_TOKS.format(x=_NORM)}) AS tok_cnt
        FROM documents
    ),
    binned AS (
        SELECT doc_id, tok_cnt,
               CAST(floor((sum(tok_cnt) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           ) / 2048.0) AS BIGINT) AS seq_id
        FROM counted
    )
    SELECT coalesce(seq_id, 0) AS seq_id,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(tok_cnt) AS BIGINT) AS tokens
    FROM binned GROUP BY 1
    """,
)
def pack_sequences_by_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: documents are laid into
    ~2048-token training sequences in deterministic doc_id order —
    a doc's sequence id is floor(preceding-token-cumsum / budget),
    i.e. contiguous greedy fill. The running sum uses the
    distributed two-level prefix scan (relational.prefix_sum: range
    partition -> parallel local cumsum -> broadcast partition
    offsets), NOT a single-task global window — the oracle's
    single-order window is the semantic spec, the engine plan is the
    scale-correct one. Output: per-sequence doc and token counts."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        prefix_sum,
    )

    d = load_table(spark, sf_dir, "documents")
    counted = d.select("doc_id", T.token_count("text").alias("tok_cnt"))
    binned = prefix_sum(
        counted, order_col="doc_id", value_col="tok_cnt", out_col="_before"
    ).withColumn("seq_id", F.floor(F.col("_before") / 2048.0).cast("bigint"))
    return binned.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("tok_cnt").cast("bigint").alias("tokens"),
    )


@query(
    "pipeline_semantic_dedup",
    """
    WITH RECURSIVE n AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    pr AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE round(list_sum(list_transform(list_zip(a.e, b.e),
              p -> p[1] * p[2])) / (a.nrm * b.nrm), 4) >= 0.4
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
    labeled AS (
        SELECT em.vec_id,
               CAST(coalesce(c.component, em.vec_id) AS BIGINT) AS component
        FROM embeddings em LEFT JOIN comp c ON c.node = em.vec_id
    ),
    sized AS (
        SELECT vec_id, component,
               CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                   AS cluster_size
        FROM labeled
    )
    SELECT vec_id, component, cluster_size FROM sized WHERE vec_id = component
    """,
)
def pipeline_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full semantic-dedup pipeline a training-data run executes:
    embedding near-dup pairs (cell-pruned GEMM path) -> connected
    components (min-label propagation) -> keep ONE survivor per
    duplicate cluster (the min id, the same survivor rule as exact
    dedup) with its cluster size. Oracle recomputes the identical
    fixpoint with a DuckDB recursive CTE. Every stage is the
    operator-library form (dedup.embedding_neardup_pairs_gemm,
    graph.connected_components), so this query is the integration
    proof that the pieces compose without driver materialization."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
        connected_components,
    )

    e = load_table(spark, sf_dir, "embeddings")
    pairs = D.embedding_neardup_pairs_gemm(
        e, id_col="vec_id", embedding_col="embedding", threshold=0.4
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    labeled = (
        e.select("vec_id")
        .join(comp.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
        )
    )
    sizes = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labeled.filter(F.col("vec_id") == F.col("component"))
        .join(sizes, "component")
        .select("vec_id", "component", "cluster_size")
    )


@query(
    "pipeline_training_data",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               round(0.4 * least(len({_TOKS.format(x='text')}) / 100.0, 1.0)
                     + 0.4 * (1.0 - (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                         / greatest(length(text), 1))
                     + 0.2 * least((len(list_filter({_TOKS.format(x='lower(text)')},
                           t -> list_contains({_SW['en']}, t)))::DOUBLE
                           / greatest(len({_TOKS.format(x='lower(text)')}), 1)) / 0.1, 1.0), 6) AS q
        FROM documents
    ),
    kept AS (SELECT doc_id, lang FROM scored WHERE q >= 0.7),
    with_vec AS (
        SELECT k.doc_id, k.lang, e.label
        FROM kept k JOIN embeddings e ON e.vec_id = k.doc_id
    )
    SELECT lang, label, count(*) AS docs
    FROM with_vec
    GROUP BY 1, 2
    """,
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pipeline (the engine's reason to exist): quality
    filter -> join embeddings -> cohort counts. One declarative plan;
    Catalyst pushes the quality filter below the join so low-quality
    docs never reach the shuffle."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        add_text_features,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    kept = (
        add_text_features(d).filter(F.col("quality") >= 0.7).select("doc_id", "lang")
    )
    return (
        kept.join(e, e.vec_id == kept.doc_id)
        .groupBy("lang", "label")
        .agg(F.count(F.lit(1)).alias("docs"))
    )


@query(
    "multimodal_image_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS asset_id, sha256(text) AS sha256
    FROM documents
    WHERE doc_id < 100
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked: documents synthesized into
    binary image assets (content = utf-8 bytes), pushed through the
    Arrow-batched mapInPandas feature extractor; the content digest is
    the engine-independent output the oracle reproduces (the fake
    decode's dims are covered by unit tests)."""
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.binary import (
        extract_image_features,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    assets = d.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    return extract_image_features(assets).select("asset_id", "sha256")


@query(
    "multimodal_audio_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS asset_id, sha256(text) AS sha256
    FROM documents
    WHERE doc_id < 100
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio half of the multimodal plumbing, oracle-checked the
    same way as the image half: synthesized binary assets through the
    Arrow-batched extractor; the content digest is the
    engine-independent output (fake-decode sample stats are covered
    by unit tests, real WAV decode by test_multimodal.py)."""
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.binary import (
        extract_audio_features,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    assets = d.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("audio").alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    return extract_audio_features(assets).select("asset_id", "sha256")


@query(
    "multimodal_video_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'mp4/isom' ELSE 'avi' END AS container,
           CASE WHEN doc_id % 2 = 0 THEN 640 ELSE 320 END AS width,
           CASE WHEN doc_id % 2 = 0 THEN 5000 ELSE 10000 END AS duration_ms,
           CASE WHEN doc_id % 2 = 0 THEN NULL ELSE 250 END AS n_frames
    FROM documents
    WHERE doc_id < 100
    """,
)
def multimodal_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video half of the multimodal plumbing with REAL container
    parsing in the distributed path: each asset is a valid MP4 or AVI
    header (``codecs.build_mp4``/``build_avi``) plus row-unique
    trailing bytes, and ``extract_video_features(decode='real')``
    must recover geometry/duration/frame-count from the actual box /
    RIFF structs (``codecs.sniff_video``) — the oracle states the
    expected values as constants (the content digest is unit-tested;
    DuckDB's sha256 is VARCHAR-only so it cannot re-derive a binary
    digest). Pixel decode needs ffmpeg and stays gated; header
    parsing is the no-dependency production contract, same as the
    image sniffers."""
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.binary import (
        extract_video_features,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
        build_avi,
        build_mp4,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    template = F.when(
        F.col("doc_id") % 2 == 0, F.lit(bytearray(build_mp4()))
    ).otherwise(F.lit(bytearray(build_avi())))
    assets = d.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("video").alias("modality"),
        F.concat(template, F.encode("text", "UTF-8")).alias("content"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    return extract_video_features(assets, decode="real").select(
        "asset_id", "container", "width", "duration_ms", "n_frames"
    )


@query(
    "mix_sources_by_weight",
    f"""
    WITH w AS (
        SELECT doc_id, source,
               CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 800
                    WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 400
                    ELSE 100 END AS keep_permille
        FROM documents
    )
    SELECT doc_id, source, keep_permille
    FROM w
    WHERE {_HASH64.format(x="concat(CAST(doc_id AS VARCHAR), ':', source)")} % 1000
          < keep_permille
    """,
)
def mix_sources_by_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing: per-source sampling rates (the training-mix
    step that reweights corpora — e.g. 80% of curated sources, 10% of
    crawl). Deterministic hash-mod draws instead of rand(): the same
    row set is selected on every run and every engine (proven by the
    DuckDB oracle), the filter pushes to the scan, and no seed
    coordination or sort is needed. Changing the mix = changing one
    literal map, not reshuffling data."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    d = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    keep = (
        F.when(src_num < 5, 800).when(src_num < 10, 400).otherwise(100)
    ).alias("keep_permille")
    draw = F.pmod(
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))),
        F.lit(1000),
    )
    return (
        d.select("doc_id", "source", keep)
        .filter(draw < F.col("keep_permille"))
    )


@query(
    "mix_negative_sampling",
    f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    anchors AS (SELECT doc_id FROM documents WHERE doc_id < 50),
    draws AS (
        SELECT a.doc_id, j,
               {_HASH64.format(
                   x="CAST(a.doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR)"
               )} % n.n_docs AS raw
        FROM anchors a, unnest(range(1, 5)) AS jj(j), n
    ),
    negs AS (
        SELECT doc_id, j,
               CASE WHEN raw = doc_id THEN (raw + 1) % (SELECT n_docs FROM n)
                    ELSE raw END AS neg_id
        FROM draws
    )
    SELECT ng.doc_id, CAST(ng.j AS BIGINT) AS j, ng.neg_id, d.source AS neg_source
    FROM negs ng JOIN documents d ON d.doc_id = ng.neg_id
    """,
)
def mix_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive
    training (the data-prep step behind every embedding-model recipe,
    e.g. DPR/SimCSE): each anchor draws 4 pseudo-random corpus
    negatives via the portable md5 hash of (anchor, draw index) mod
    corpus size, collision with the anchor bumped to the next id.
    Hash draws instead of rand() make the sample reproducible across
    runs, engines, AND retries (a task retry with rand() would
    silently resample — the same reason the hash split operator
    exists). Corpus size enters as a broadcast 1-row aggregate, the
    negative fetch is one equi-join on neg_id; nothing here scales
    worse than the corpus scan."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    draws = (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j"),
            "n_docs",
        )
        .withColumn(
            "raw",
            hash64(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.col("j").cast("string"),
                )
            )
            % F.col("n_docs"),
        )
        .withColumn(
            "neg_id",
            F.when(
                F.col("raw") == F.col("doc_id"),
                (F.col("raw") + 1) % F.col("n_docs"),
            ).otherwise(F.col("raw")),
        )
    )
    return draws.join(
        d.select(F.col("doc_id").alias("neg_id"), F.col("source")), "neg_id"
    ).select(
        "doc_id",
        F.col("j").cast("long").alias("j"),
        "neg_id",
        F.col("source").alias("neg_source"),
    )


@query(
    "mix_temperature_sampling",
    f"""
    WITH counts AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
    ),
    quota AS (
        SELECT source,
               CAST(floor(round(400.0 * pow(n_docs, 0.7)
                    / (SELECT sum(pow(n_docs, 0.7)) FROM counts), 6))
                    AS BIGINT) AS q
        FROM counts
    ),
    ranked AS (
        SELECT d.doc_id, d.source,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rk
        FROM documents d
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quota USING (source)
    WHERE r.rk <= quota.q
    """,
)
def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (the multilingual/multi-
    source rebalancing rule p_s ∝ n_s^T with T=0.7, as in mBERT/XLM-R
    and data-mixture tuning): each source gets a quota proportional
    to n^0.7 of a 400-doc target and fills it with its md5-ranked
    first documents — deterministic across engines and runs, no
    seeded RNG. The quota table is a few rows (one per source) so the
    quota join broadcasts; the only real work is one per-source
    window rank, which at 100 TB can swap to the hash-threshold
    draw (sample_hash_deterministic) when exact quotas aren't
    required."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum(F.pow("n_docs", 0.7)).alias("_t"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        # round before floor: a tree-vs-sequential float sum can land
        # the raw quota a few ulps either side of an exact integer
        # (uniform sources make this CERTAIN, not rare), and floor
        # would amplify that into a whole-row diff.
        F.floor(F.round(400.0 * F.pow("n_docs", 0.7) / F.col("_t"), 6))
        .cast("bigint").alias("q"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    ranked = d.select(
        "doc_id", "source", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.col("q"))
        .select("doc_id", "source")
    )


@query(
    "pipeline_training_data_end_to_end",
    f"""
    WITH pool AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text
        FROM documents WHERE doc_id % 97 <> 0 AND doc_id % 11 = 0
    ),
    fp AS (SELECT doc_id, md5({_NORM}) AS f FROM pool),
    surv AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
    sdocs AS (
        SELECT d.doc_id, d.text FROM documents d JOIN surv s USING (doc_id)
    ),
    qbase AS (
        SELECT doc_id,
               len({_TOKS.format(x='text')}) AS tok_cnt,
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                   / greatest(length(text), 1) AS praw,
               len(list_filter({_TOKS.format(x='lower(text)')},
                   t -> list_contains({_SW['en']}, t)))::DOUBLE
                   / greatest(len({_TOKS.format(x='lower(text)')}), 1) AS swraw
        FROM sdocs
    ),
    keepq AS (
        SELECT doc_id FROM qbase
        WHERE round(0.4 * least(tok_cnt / 100.0, 1.0)
                    + 0.4 * (1.0 - praw)
                    + 0.2 * least(swraw / 0.1, 1.0), 6) >= 0.7
    ),
    {_SHINGLES_CTE},
    tr_sh AS (
        SELECT s.doc_id, s.s FROM shing s JOIN keepq k USING (doc_id)
    ),
    ev_sh AS (
        SELECT DISTINCT s FROM shing WHERE doc_id % 97 = 0
    ),
    contaminated AS (
        SELECT t.doc_id
        FROM tr_sh t JOIN ev_sh e ON t.s = e.s
        GROUP BY t.doc_id
        HAVING count(DISTINCT t.s) >= 3
    ),
    clean AS (
        SELECT doc_id FROM keepq
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    train AS (
        SELECT doc_id FROM clean
        WHERE {_HASH64.format(x='CAST(doc_id AS VARCHAR)')} % 10 < 8
    ),
    counted AS (
        SELECT t.doc_id, len({_TOKS.format(x=_NORM)}) AS tok_cnt
        FROM train t JOIN documents d USING (doc_id)
    ),
    binned AS (
        SELECT doc_id, tok_cnt,
               CAST(floor(coalesce(sum(tok_cnt) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) / 2048.0) AS BIGINT) AS seq_id
        FROM counted
    )
    SELECT seq_id,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(tok_cnt) AS BIGINT) AS tokens
    FROM binned GROUP BY 1
    """,
)
def pipeline_training_data_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data preparation pipeline as ONE Catalyst
    DAG — the composition proof that the engine's pieces chain:
    exact dedup (survivor = min id per normalized fingerprint) ->
    quality gate (>= 0.7 on the text_quality_scores formula) ->
    benchmark decontamination (drop docs sharing >= 3 distinct
    3-gram shingles with the held-out doc_id %% 97 eval slice) ->
    deterministic 80%% hash split -> token-budget sequence packing
    (distributed prefix scan, 2048/seq). Every stage is the same
    operator its standalone query uses, so this one oracle pins the
    joint semantics end-to-end. Plan shape: hash-agg dedup, pure
    projections for quality/split tags, one broadcast shingle join
    for decontamination, the two-level prefix scan for packing — no
    stage widens beyond its standalone cost, so the composition
    scales exactly as its parts do."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
        word_shingles,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        exact_dedup,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
        prefix_sum,
    )

    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0

    # The fixture has no exact duplicates, so plant re-keyed copies of
    # a slice: dedup MUST collapse them back onto the original ids or
    # the extra docs shift the split/packing and the oracle mismatches
    # — the stage is load-bearing, not decorative.
    base_pool = d.filter(~is_eval).select("doc_id", "text")
    planted = base_pool.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    pool = base_pool.unionByName(planted)
    surv = exact_dedup(pool, id_col="doc_id", text_col="text").select(
        F.col("keep_id").alias("doc_id")
    )
    sdocs = d.join(surv, "doc_id").select("doc_id", "text")

    feat = T.add_text_features(sdocs)
    keepq = feat.filter(F.col("quality") >= 0.7).select("doc_id", "text")

    tr_sh = keepq.select(
        "doc_id", F.explode(F.array_distinct(word_shingles("text", 3))).alias("s")
    )
    ev_sh = (
        d.filter(is_eval)
        .select(F.explode(F.array_distinct(word_shingles("text", 3))).alias("s"))
        .distinct()
    )
    contaminated = (
        tr_sh.join(F.broadcast(ev_sh), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("_shared"))
        .filter(F.col("_shared") >= 3)
        .select("doc_id")
    )
    clean = keepq.join(contaminated, "doc_id", "left_anti")

    train = clean.filter(
        F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(10)) < 8
    )
    counted = train.select("doc_id", T.token_count("text").alias("tok_cnt"))
    binned = prefix_sum(
        counted, order_col="doc_id", value_col="tok_cnt", out_col="_before"
    ).withColumn("seq_id", F.floor(F.col("_before") / 2048.0).cast("bigint"))
    return binned.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("tok_cnt").cast("bigint").alias("tokens"),
    )


@query(
    "mix_dsir_importance_top20",
    """
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split_regex(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   ' '), w -> w <> '')) AS w
        FROM documents
    ),
    feats AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) % 1024 AS b
        FROM toks
    ),
    s_cnt AS (SELECT b, count(*) AS s_c FROM feats GROUP BY b),
    t_cnt AS (SELECT b, count(*) AS t_c FROM feats WHERE lang = 'en' GROUP BY b),
    tot AS (
        SELECT count(*) AS s_tot,
               count(*) FILTER (WHERE lang = 'en') AS t_tot
        FROM feats
    ),
    doc_b AS (
        SELECT doc_id, b, count(*) AS c FROM feats GROUP BY doc_id, b
    ),
    core AS (
        SELECT d.doc_id,
               sum(d.c * (ln(COALESCE(t.t_c, 0) + 1) - ln(s.s_c + 1))) AS core,
               sum(d.c) AS n_toks
        FROM doc_b d
        JOIN s_cnt s USING (b)
        LEFT JOIN t_cnt t USING (b)
        GROUP BY d.doc_id
    )
    SELECT c.doc_id,
           round(c.core + c.n_toks * (ln(tot.s_tot + 1024) - ln(tot.t_tot + 1024)),
                 4) AS dsir_weight
    FROM core c, tot
    ORDER BY dsir_weight DESC, c.doc_id
    LIMIT 20
    """,
)
def mix_dsir_importance_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): rank documents by the hashed-n-gram log importance weight
    log p_target / p_source, with the 'en' slice as the target and
    the whole corpus as the source. Features are word unigrams hashed
    to 1024 buckets via the portable md5 family (so DuckDB reproduces
    every bucket); probabilities are add-one smoothed. The scale
    shape is what matters: both bucket tables are BOUNDED at 1024
    rows (broadcast joins), the totals are one scalar aggregate, and
    the per-doc weight is a map-side-combinable sum — the 100 TB
    corpus is scanned once however big it is. Selecting top-k by
    weight IS the resampling step's deterministic skeleton (DSIR
    proper adds Gumbel noise; seeded noise drops into the same ORDER
    BY)."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        hash64,
    )

    B = 1024
    d = load_table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        "lang",
        F.explode(T.tokens(T.normalize_text("text"))).alias("w"),
    ).select(
        "doc_id", "lang", F.pmod(hash64(F.col("w")), F.lit(B)).alias("b")
    )
    s_cnt = feats.groupBy("b").agg(F.count(F.lit(1)).alias("s_c"))
    t_cnt = (
        feats.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("t_c"))
    )
    tot = feats.agg(
        F.count(F.lit(1)).alias("s_tot"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("t_tot"),
    )
    doc_b = feats.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    core = (
        doc_b.join(F.broadcast(s_cnt), "b")
        .join(F.broadcast(t_cnt), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("c")
                * (
                    F.log(F.coalesce(F.col("t_c"), F.lit(0)) + F.lit(1))
                    - F.log(F.col("s_c") + F.lit(1))
                )
            ).alias("core"),
            F.sum("c").alias("n_toks"),
        )
    )
    return (
        core.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.col("core")
                + F.col("n_toks")
                * (
                    F.log(F.col("s_tot") + F.lit(B))
                    - F.log(F.col("t_tot") + F.lit(B))
                ),
                4,
            ).alias("dsir_weight"),
        )
        .orderBy(F.desc("dsir_weight"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "pack_greedy_bins",
    f"""
    WITH RECURSIVE counted AS (
        SELECT doc_id, lang AS shard,
               CAST(len({_TOKS.format(x=_NORM)}) AS BIGINT) AS tok_cnt
        FROM documents
    ),
    ordered AS (
        SELECT shard, doc_id, tok_cnt,
               row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM counted
    ),
    packed(shard, rn, doc_id, tok_cnt, bin_id, bin_fill) AS (
        SELECT shard, rn, doc_id, tok_cnt, CAST(0 AS BIGINT), tok_cnt
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.doc_id, o.tok_cnt,
               CASE WHEN p.bin_fill > 0 AND p.bin_fill + o.tok_cnt > 256
                    THEN p.bin_id + 1 ELSE p.bin_id END,
               CASE WHEN p.bin_fill > 0 AND p.bin_fill + o.tok_cnt > 256
                    THEN o.tok_cnt ELSE p.bin_fill + o.tok_cnt END
        FROM packed p JOIN ordered o
          ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT shard, doc_id, tok_cnt AS n_tokens, bin_id, bin_fill
    FROM packed
    """,
)
def pack_greedy_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT greedy sequence packing (operators/pack.py): documents
    never straddle a bin — a bin closes when the next document no
    longer fits, and an over-budget document gets a bin of its own.
    Complements pack_sequences_by_token_budget, whose contiguous
    floor-cumsum fill SPLITS documents across sequence boundaries
    (the packed-pretraining discipline); this is the
    sample-integrity discipline (SFT/eval batches, where a document
    must stay whole). Sharded by lang: one hash shuffle, then each
    shard packs in ONE ordered Arrow pass (applyInPandas) — shards
    are the parallelism unit at scale. The oracle replays the greedy
    recurrence as a DuckDB recursive CTE."""
    from vector_databases___hydrate_chroma_db_collection_spark.operators.pack import (
        pack_greedy,
    )

    d = load_table(spark, sf_dir, "documents")
    counted = d.select(
        "doc_id",
        F.col("lang").alias("shard"),
        T.token_count(T.normalize_text("text")).alias("tok_cnt"),
    )
    return pack_greedy(
        counted, id_col="doc_id", size_col="tok_cnt", shard_col="shard", budget=256
    ).select("shard", "doc_id", "n_tokens", "bin_id", "bin_fill")


@query(
    "curation_host_quality",
    """
    WITH base AS (
        SELECT doc_id,
               source || '.example.com' AS host,
               n_chars,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
        FROM documents
    ),
    stats AS (
        SELECT host,
               count(*) AS host_docs,
               round(avg(n_chars), 4) AS host_avg_chars,
               round(avg(is_en), 4) AS host_en_frac
        FROM base
        GROUP BY 1
    )
    SELECT b.doc_id, b.host, s.host_docs, s.host_avg_chars, s.host_en_frac,
           (s.host_en_frac >= 0.44 AND s.host_avg_chars >= 280.0) AS host_pass
    FROM base b JOIN stats s USING (host)
    """,
)
def curation_host_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level quality lists — the web-curation pass between URL
    canonicalization and document filters (CCNet/RefinedWeb style):
    aggregate per-HOST statistics (doc count, mean length, fraction
    English) and join them back onto every document as features plus
    a host-level gate, so a spammy domain fails as a UNIT even when
    individual pages slip per-doc filters. The host is recovered
    THROUGH the real URL parser from a constructed URL (fixture has
    no URL column — same construct-then-verify pattern as
    scalar_url_parse / dedup_canonical_url).

    100 TB shape: one map-side-combinable groupBy on host (host
    cardinality is ~10^7 for the web — millions of times smaller than
    the doc count) and one join back that AQE plans broadcast-side
    when the host table fits, shuffle otherwise; per-host skew
    (one host with 10^9 docs) is aggregate-side partial-combine plus
    AQE skew-join on the join back. No UDF, no window."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
    )
    base = d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        "n_chars",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("is_en"),
    )
    stats = base.groupBy("host").agg(
        F.count(F.lit(1)).alias("host_docs"),
        F.round(F.avg("n_chars"), 4).alias("host_avg_chars"),
        F.round(F.avg("is_en"), 4).alias("host_en_frac"),
    )
    return base.join(stats, "host").select(
        "doc_id",
        "host",
        "host_docs",
        "host_avg_chars",
        "host_en_frac",
        (
            (F.col("host_en_frac") >= 0.44) & (F.col("host_avg_chars") >= 280.0)
        ).alias("host_pass"),
    )
