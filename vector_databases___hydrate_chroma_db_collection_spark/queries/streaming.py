"""Structured Streaming twins: windows, joins, CDC hydration, stateful ops.

Split from the original single-file registry (r8); every query keeps
its exact name, body, and oracle — `tools/parity_local.py` guards the
registry contract across the split.
"""

from __future__ import annotations

from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    W,
    _CMS64_BUCKET_SQL,
    load_table,
    query,
)


@query(
    "stream_tumbling_event_stats",
    """
    SELECT strftime(to_timestamp((epoch_us(ts) // 1000000 // 21600) * 21600),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS cnt,
           round(sum(value), 4) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return W.tumbling_event_stats(e, window="6 hours")


@query(
    "stream_sliding_user_activity",
    """
    WITH buckets AS (
        SELECT user_id, ts,
               (epoch_us(ts) // 1000000 // 21600) * 21600 AS b
        FROM events
    ), expanded AS (
        SELECT user_id, to_timestamp(b) AS window_start FROM buckets
        UNION ALL
        SELECT user_id, to_timestamp(b - 21600) AS window_start FROM buckets
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           user_id, count(*) AS cnt
    FROM expanded
    GROUP BY 1, 2
    """,
)
def stream_sliding_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12h windows sliding by 6h: every event lands in exactly two
    windows (its bucket's window and the one starting 6h earlier) —
    which is what the UNION ALL oracle enumerates."""
    e = load_table(spark, sf_dir, "events")
    return W.sliding_user_activity(e, window="12 hours", slide="6 hours")


@query(
    "stream_session_windows",
    """
    WITH ordered AS (
        SELECT user_id, value, epoch_us(ts) AS us FROM events
    ), flagged AS (
        SELECT user_id, us, value,
               CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 300000000
                    OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ), sessions AS (
        SELECT user_id, us, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(to_timestamp(min(us) // 1000000), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(to_timestamp((max(us) + 300000000) // 1000000), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS events,
           round(sum(value), 4) AS value_sum
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (gap 5 min). The oracle reproduces
    F.session_window with classic lag+cumsum sessionization over
    microsecond epochs; session end = last event + gap."""
    e = load_table(spark, sf_dir, "events")
    return W.session_windows(e, gap="5 minutes")


@query(
    "stream_dedup_by_id",
    """
    SELECT count(*) AS total, count(DISTINCT event_id) AS distinct_ids
    FROM events
    """,
)
def stream_dedup_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of dropDuplicatesWithinWatermark: dedup by id then
    count (fixture ids are unique, so total == distinct_ids — the
    streaming test exercises the duplicate path with injected dups)."""
    e = load_table(spark, sf_dir, "events")
    deduped = W.dedup_within_watermark(e)
    return deduped.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("event_id").alias("distinct_ids"),
    )


@query(
    "stream_attribution_join",
    """
    SELECT t.user_id, t.event_id AS trigger_id, c.event_id AS conversion_id,
           round((epoch_us(c.ts) - epoch_us(t.ts)) / 1000000.0, 6) AS gap_seconds
    FROM events t
    JOIN events c
      ON c.user_id = t.user_id
     AND c.ts > t.ts
     AND c.ts <= t.ts + INTERVAL 30 MINUTE
    WHERE t.event_type = 'click' AND c.event_type = 'purchase'
    """,
)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream attribution join (the streaming
    variant with watermark state eviction is exercised in
    tests/test_streaming.py with exact parity to this plan)."""
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.joins import (
        attributed_events,
    )

    e = load_table(spark, sf_dir, "events")
    out = attributed_events(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
        within="30 minutes",
    )
    return out.select(
        "user_id",
        "trigger_id",
        "conversion_id",
        F.round("gap_seconds", 6).alias("gap_seconds"),
    )


@query(
    "stream_static_join_nation",
    """
    SELECT n.n_name AS nation, count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
    WHERE e.event_type IN ('click', 'view', 'purchase')
    GROUP BY 1
    """,
)
def stream_static_join_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static join: each (streaming) event
    enriched against a broadcast static dimension, then aggregated.
    In Structured Streaming the static side is re-broadcast per
    micro-batch with no state store involved — the standard
    dimension-enrichment topology; tests/test_streaming.py drives the
    identical plan through readStream and diffs against this twin.
    sum(value) stays deterministic at 2 decimals because each group
    sums ~hundreds of doubles (error ~1e-10, far under the
    rounding)."""
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.joins import (
        enrich_with_static,
    )

    e = load_table(spark, sf_dir, "events")
    n = load_table(spark, sf_dir, "nation")
    return enrich_with_static(
        e, n, key_expr=lambda f: f["user_id"] % 25, dim_key="n_nationkey"
    )


@query(
    "stream_cms_event_users",
    f"""
    WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j)
    SELECT j AS hash_row,
           {_CMS64_BUCKET_SQL.format(key='user_id')} AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events CROSS JOIN js
    GROUP BY 1, 2
    """,
)
def stream_cms_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sketch maintenance END-TO-END: the events table is
    replayed as a file stream in forced micro-batches, each batch's
    CMS delta is merged into versioned pointer-swapped state
    (streaming/sketches.py::stream_cms_counters), and the FINAL merged
    counter table is returned. The oracle is the plain batch sketch
    in SQL — CMS linearity (sketch of union = cellwise sum of
    sketches) is exactly what makes a streaming sketch correct, so
    the hash-equality here IS the merge-correctness proof, on top of
    the pytest two-batch twin. State stays ≤ depth·width rows no
    matter how many users the stream ever sees."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.streaming.sketches import (
        read_cms_state,
        stream_cms_counters,
    )

    e = load_table(spark, sf_dir, "events").select("user_id")
    root = tempfile.mkdtemp(prefix="vdb_stream_cms_")
    in_dir = f"{root}/in"
    # two replay files -> two micro-batches via maxFilesPerTrigger
    e.filter(F.col("user_id") % 2 == 0).write.parquet(f"{in_dir}/b0")
    e.filter(F.col("user_id") % 2 == 1).write.parquet(f"{in_dir}/b1")
    stream = (
        spark.readStream.schema(e.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = stream_cms_counters(
        stream,
        "user_id",
        state_dir=f"{root}/state",
        checkpoint_dir=f"{root}/ckpt",
        depth=4,
        width=64,
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError(
            "stream_cms_event_users: availableNow stream did not drain "
            "within 300s — partial state would corrupt the oracle compare"
        )
    return read_cms_state(spark, f"{root}/state")


from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: F401,E402
    D,
    _BAND_H,
    _MINHASH_BASE,
    _MINHASH_SIG,
    _NORM,
    _SHINGLES_CTE,
    _TOKS,
)


@query(
    "stream_neardup_novelty_gate",
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
    ref AS (SELECT DISTINCT b, h FROM buckets WHERE doc_id % 10 <> 0),
    inc AS (SELECT doc_id, b, h FROM buckets WHERE doc_id % 10 = 0),
    hits AS (
        SELECT i.doc_id, count(*) AS c
        FROM inc i JOIN ref r ON i.b = r.b AND i.h = r.h
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_bands,
           coalesce(h.c, 0) = 0 AS novel
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 10 = 0
    """,
)
def stream_neardup_novelty_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming novelty gate
    (streaming/neardup_stream.py): documents with doc_id % 10 == 0
    play the incoming stream, the rest are the already-ingested
    corpus whose LSH band table is the static side. The micro-batch
    function IS this batch operator, so the streaming parity test
    (tests/test_streaming.py) and this oracle check the same plan."""
    d = load_table(spark, sf_dir, "documents")
    reference = d.filter(F.col("doc_id") % 10 != 0)
    incoming = d.filter(F.col("doc_id") % 10 == 0)
    ref_bands = D.lsh_band_rows(reference, id_col="doc_id", text_col="text")
    return D.novelty_gate(incoming, ref_bands, id_col="doc_id", text_col="text")


@query(
    "stream_novelty_ingest_loop",
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
    ref1 AS (SELECT DISTINCT b, h FROM buckets WHERE doc_id % 10 NOT IN (0, 5)),
    inc1 AS (SELECT doc_id, b, h FROM buckets WHERE doc_id % 10 = 0),
    hits1 AS (
        SELECT i.doc_id, count(*) AS c
        FROM inc1 i JOIN ref1 r ON i.b = r.b AND i.h = r.h
        GROUP BY 1
    ),
    out1 AS (
        SELECT d.doc_id,
               CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_bands,
               coalesce(h.c, 0) = 0 AS novel
        FROM documents d LEFT JOIN hits1 h ON h.doc_id = d.doc_id
        WHERE d.doc_id % 10 = 0
    ),
    ref2 AS (
        SELECT b, h FROM ref1
        UNION
        SELECT b, h FROM buckets
        WHERE doc_id IN (SELECT doc_id FROM out1 WHERE novel)
    ),
    inc2 AS (
        SELECT doc_id + 5 AS doc_id, b, h FROM buckets WHERE doc_id % 10 = 0
    ),
    hits2 AS (
        SELECT i.doc_id, count(*) AS c
        FROM inc2 i JOIN ref2 r ON i.b = r.b AND i.h = r.h
        GROUP BY 1
    ),
    out2 AS (
        SELECT d.doc_id + 5 AS doc_id,
               CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_bands,
               coalesce(h.c, 0) = 0 AS novel
        FROM documents d LEFT JOIN hits2 h ON h.doc_id = d.doc_id + 5
        WHERE d.doc_id % 10 = 0
    )
    SELECT doc_id, n_hit_bands, novel, 1 AS batch FROM out1
    UNION ALL
    SELECT doc_id, n_hit_bands, novel, 2 AS batch FROM out2
    """,
)
def stream_novelty_ingest_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental ingest loop END-TO-END across two micro-batches
    — the full production cycle the r8 pieces only proved separately:

      batch 1: gate incoming docs (doc_id % 10 == 0) against a
               PERSISTED bucketed band index built from a hydrated
               collection (doc_id % 10 not in (0, 5));
               hydrate the docs that gated NOVEL into the collection;
               ``band_index_append`` them into the index, asserting
               the ``expected_prev_etag`` fence (the only collection
               mutation since the index stamp is this loop's own
               hydrate) — the index transitions stale -> fresh
               without a rebuild;
      batch 2: gate VERBATIM COPIES of every batch-1 doc (ids + 5)
               against the re-read index.

    The loop's consistency proof is in the verdicts: a doc that gated
    novel in batch 1 MUST gate duplicate (all 8 bands hit) in batch
    2, because — and only because — batch 1's ingest appended it; a
    batch-1 suspect's copy keeps its batch-1 hit count (its hits come
    from the original corpus, not the append). Batch-1 verdicts are
    eagerly materialized (localCheckpoint) BEFORE the append so the
    returned plan can never lazily re-read post-append index state.
    The oracle replays both rounds brute-force in SQL (ref2 = corpus
    buckets UNION novel batch-1 buckets). Output: one row per
    (incoming doc, batch)."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_append,
        band_index_bucket_keys,
        band_index_build,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_etag,
        read_collection,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_ingest_loop_")
    cfg = HydrationConfig(
        collection_name="loop",
        root=root,
        id_col="doc_id",
        text_col="text",
        embedding_col="embedding",
    )
    corpus = d.filter((F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 10 != 5))
    hydrate(spark, corpus.join(e, corpus.doc_id == e.vec_id), cfg)
    idx = f"{root}/loop/_bands"
    band_index_build(
        read_collection(spark, root, "loop"),
        idx,
        id_col="id",
        text_col="document",
        source=(root, "loop"),
    )
    etag0 = collection_etag(root, "loop")

    b1 = d.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    gated1 = D.novelty_gate(
        b1, band_index_bucket_keys(spark, idx), id_col="doc_id", text_col="text"
    )
    out1 = gated1.localCheckpoint(eager=True)
    D.release_cache(gated1)

    novel1 = b1.join(out1.filter("novel").select("doc_id"), "doc_id")
    hydrate(spark, novel1.join(e, novel1.doc_id == e.vec_id), cfg)
    band_index_append(
        spark, idx, novel1, id_col="doc_id", text_col="text",
        expected_prev_etag=etag0,
    )

    b2 = b1.select((F.col("doc_id") + 5).alias("doc_id"), "text")
    out2 = D.novelty_gate(
        b2, band_index_bucket_keys(spark, idx), id_col="doc_id", text_col="text"
    )
    return out1.withColumn("batch", F.lit(1)).unionByName(
        out2.withColumn("batch", F.lit(2))
    )


from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: E402,F401
    _COS_SQL,
)


@query(
    "stream_ivf_ingest_loop",
    f"""
    WITH corpus AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS id, e.embedding AS emb,
               d.doc_id % 10 AS m
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), q AS (SELECT emb AS qe FROM corpus WHERE id = '7'),
    r1 AS (
        SELECT c.id, {_COS_SQL} AS cos_sim
        FROM corpus c, q WHERE c.id <> '7' AND c.m <> 5
    ),
    r2 AS (
        SELECT c.id, {_COS_SQL} AS cos_sim
        FROM corpus c, q WHERE c.id <> '7'
    ),
    t1 AS (SELECT id, cos_sim, 1 AS batch FROM r1 ORDER BY cos_sim DESC, id LIMIT 3),
    t2 AS (SELECT id, cos_sim, 2 AS batch FROM r2 ORDER BY cos_sim DESC, id LIMIT 3)
    SELECT * FROM t1 UNION ALL SELECT * FROM t2
    """,
)
def stream_ivf_ingest_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VECTOR incremental-ingest loop end-to-end across two
    micro-batches — the embedding twin of stream_novelty_ingest_loop:
    hydrate the base corpus (doc_id % 10 not in (0, 5)), persist a
    stamped IVF index; batch 1 hydrates the %10==0 docs and
    ``ivf_append``s their vectors under the ``expected_prev_etag``
    fence (stale -> fresh with no k-means rebuild), then serves top-3
    for doc 7's vector through the just-extended index probing ALL
    cells; batch 2 repeats with the %10==5 docs. A vector ingested in
    batch N must be rankable in batch N's own results — the oracle
    replays both rounds brute-force over the corresponding corpus
    prefixes, so the result only matches if every appended vector is
    genuinely servable the moment its batch commits. The
    true-streaming form (stream_vector_ingest through the
    exactly-once foreachBatch harness) is parity-pinned in
    tests/test_streaming.py."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_append,
        ivf_build,
        ivf_read,
        ivf_search,
        ivf_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        collection_etag,
        read_collection,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_ivf_loop_")
    cfg = HydrationConfig(
        collection_name="vloop",
        root=root,
        id_col="doc_id",
        text_col="text",
        embedding_col="embedding",
    )
    mod = F.col("doc_id") % 10
    base = d.filter(~mod.isin(0, 5))
    hydrate(spark, base.join(e, base.doc_id == e.vec_id), cfg)
    coll = read_collection(spark, root, "vloop")
    assigned, C = ivf_build(coll, n_centroids=8, seed=42)
    idx = f"{root}/vloop/_ivf"
    ivf_write(
        assigned, C, idx, metric="cosine", source=(root, "vloop"),
        build={"metric": "l2", "seed": 42, "sample_fraction": None},
    )
    qvec = list(coll.filter(F.col("id") == "7").first()["embedding"])

    def serve() -> DataFrame:
        a, c, _m = ivf_read(spark, idx)  # staleness-checked: append re-stamped
        return ivf_search(
            a.filter(F.col("id") != "7"), c, qvec, k=3, nprobe=8,
            metric="cosine", score_decimals=4,
        ).withColumnRenamed("score", "cos_sim")

    out = []
    for i, m in enumerate((0, 5), start=1):
        etag = collection_etag(root, "vloop")
        batch = d.filter(mod == m)
        hydrate(spark, batch.join(e, batch.doc_id == e.vec_id), cfg)
        vecs = read_collection(spark, root, "vloop").filter(
            F.col("id").cast("bigint") % 10 == m
        ).select("id", "embedding")
        ivf_append(spark, idx, vecs, expected_prev_etag=etag)
        out.append(
            serve().withColumn("batch", F.lit(i)).localCheckpoint(eager=True)
        )
    return out[0].unionByName(out[1])


from vector_databases___hydrate_chroma_db_collection_spark.queries._shared import (  # noqa: E402,F401
    _COS_DOUBLE,
)

# the one shared oracle-cosine macro — a local copy would drift
_B_COS = _COS_DOUBLE.format(a="b.emb", b="c.emb")


@query(
    "stream_semantic_ingest_loop",
    f"""
    WITH base AS (
        SELECT CAST(d.doc_id AS VARCHAR) AS id, e.embedding AS emb
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        WHERE d.doc_id % 10 NOT IN (0, 5)
    ),
    batch AS (
        SELECT d.doc_id, d.doc_id % 10 AS m,
               CASE WHEN (d.doc_id // 10) % 2 = 0 THEN e2.embedding
                    ELSE e.embedding END AS emb
        FROM documents d
        JOIN embeddings e ON e.vec_id = d.doc_id
        JOIN embeddings e2 ON e2.vec_id = d.doc_id + 1
        WHERE d.doc_id % 10 IN (0, 5)
    ),
    s1 AS (
        SELECT b.doc_id, round(max({_B_COS}), 4) AS best_score
        FROM (SELECT * FROM batch WHERE m = 0) b, base c
        GROUP BY 1
    ),
    v1 AS (
        SELECT doc_id, best_score, best_score < 0.99 AS novel, 1 AS batch
        FROM s1
    ),
    corpus2 AS (
        SELECT id, emb FROM base
        UNION ALL
        SELECT CAST(b.doc_id AS VARCHAR), b.emb
        FROM batch b JOIN v1 ON v1.doc_id = b.doc_id
        WHERE v1.novel
    ),
    s2 AS (
        SELECT b.doc_id, round(max({_B_COS}), 4) AS best_score
        FROM (SELECT * FROM batch WHERE m = 5) b, corpus2 c
        GROUP BY 1
    ),
    v2 AS (
        SELECT doc_id, best_score, best_score < 0.99 AS novel, 2 AS batch
        FROM s2
    )
    SELECT * FROM v1 UNION ALL SELECT * FROM v2
    """,
)
def stream_semantic_ingest_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEMANTIC-gated vector-ingest loop end-to-end across two
    micro-batches, driving the REAL foreachBatch body
    (streaming/neardup_stream.py::_semantic_ingest_batch_fn — the
    exact function stream_semantic_ingest runs): hydrate the base
    corpus (doc_id %% 10 not in (0, 5)), persist a stamped IVF index;
    batch 1 gates the %%10==0 docs — every (doc_id DIV 10)-even doc
    carries the STORED embedding of its doc_id+1 neighbor under its
    own different text (a paraphrase/re-encode the text gate cannot
    see; must gate duplicate at cosine 1.0), the rest carry their own
    embeddings (novel) — hydrates + tag-appends the novel ones, and
    publishes (id, best_score, novel); batch 2 repeats with the
    %%10==5 docs, whose gate now runs against base PLUS batch 1's
    novel additions (a vector ingested in batch 1 must gate
    duplicates in batch 2). nprobe == n_centroids makes the gate
    exhaustive-exact, so the oracle can replay both rounds as
    brute-force max-cosine over the corresponding corpus prefixes.
    The true-streaming form and crash-replay stability are pinned in
    tests/test_streaming.py."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_build,
        ivf_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.neardup_stream import (
        _semantic_ingest_batch_fn,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_sem_loop_")
    cfg = HydrationConfig(
        collection_name="semloop",
        root=root,
        id_col="doc_id",
        text_col="text",
        embedding_col="embedding",
    )
    mten = F.col("doc_id") % 10
    base = d.filter(~mten.isin(0, 5))
    hydrate(spark, base.join(e, base.doc_id == e.vec_id), cfg)
    coll = read_collection(spark, root, "semloop")
    assigned, C = ivf_build(coll, n_centroids=8, seed=42)
    idx = f"{root}/semloop/_ivf"
    ivf_write(
        assigned, C, idx, metric="cosine", source=(root, "semloop"),
        build={"metric": "l2", "seed": 42, "sample_fraction": None},
    )

    b_all = (
        d.join(
            e.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("_own")),
            "doc_id",
        )
        .join(
            e.select(
                (F.col("vec_id") - 1).alias("doc_id"),
                F.col("embedding").alias("_plant"),
            ),
            "doc_id",  # batch rows REQUIRE the +1 neighbor (oracle mirrors)
        )
        .filter(mten.isin(0, 5))
        .select(
            "doc_id",
            "text",
            F.when(F.expr("(doc_id DIV 10) % 2 = 0"), F.col("_plant"))
            .otherwise(F.col("_own"))
            .alias("embedding"),
        )
    )
    ingest = _semantic_ingest_batch_fn(
        idx, cfg, "sem_loop_sink", threshold=0.99, nprobe=8, score_decimals=4
    )
    out = []
    for i, m in enumerate((0, 5), start=1):
        out.append(
            ingest(b_all.filter(mten == m), i)
            .withColumn("batch", F.lit(i))
            .localCheckpoint(eager=True)
        )
    return out[0].unionByName(out[1])


@query(
    "stream_novelty_maintained_loop",
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
    ref1 AS (SELECT DISTINCT b, h FROM buckets WHERE doc_id % 10 = 1),
    inc1 AS (SELECT doc_id, b, h FROM buckets WHERE doc_id % 10 IN (2, 3)),
    hits1 AS (
        SELECT i.doc_id, count(*) AS c
        FROM inc1 i JOIN ref1 r ON i.b = r.b AND i.h = r.h
        GROUP BY 1
    ),
    out1 AS (
        SELECT d.doc_id,
               CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_bands,
               coalesce(h.c, 0) = 0 AS novel
        FROM documents d LEFT JOIN hits1 h ON h.doc_id = d.doc_id
        WHERE d.doc_id % 10 IN (2, 3)
    ),
    ref2 AS (
        SELECT b, h FROM ref1
        UNION
        SELECT b, h FROM buckets
        WHERE doc_id IN (SELECT doc_id FROM out1 WHERE novel)
    ),
    inc2 AS (
        SELECT doc_id, b, h FROM buckets WHERE doc_id % 10 IN (4, 5, 6)
    ),
    hits2 AS (
        SELECT i.doc_id, count(*) AS c
        FROM inc2 i JOIN ref2 r ON i.b = r.b AND i.h = r.h
        GROUP BY 1
    ),
    out2 AS (
        SELECT d.doc_id,
               CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_bands,
               coalesce(h.c, 0) = 0 AS novel
        FROM documents d LEFT JOIN hits2 h ON h.doc_id = d.doc_id
        WHERE d.doc_id % 10 IN (4, 5, 6)
    ),
    ref3 AS (
        SELECT b, h FROM ref2
        UNION
        SELECT b, h FROM buckets
        WHERE doc_id IN (SELECT doc_id FROM out2 WHERE novel)
    ),
    inc3 AS (
        SELECT doc_id + 1000000 AS doc_id, b, h FROM buckets
        WHERE doc_id % 10 = 4
    ),
    hits3 AS (
        SELECT i.doc_id, count(*) AS c
        FROM inc3 i JOIN ref3 r ON i.b = r.b AND i.h = r.h
        GROUP BY 1
    ),
    out3 AS (
        SELECT d.doc_id + 1000000 AS doc_id,
               CAST(coalesce(h.c, 0) AS BIGINT) AS n_hit_bands,
               coalesce(h.c, 0) = 0 AS novel
        FROM documents d LEFT JOIN hits3 h ON h.doc_id = d.doc_id + 1000000
        WHERE d.doc_id % 10 = 4
    )
    SELECT doc_id, n_hit_bands, novel, 0 AS batch FROM out1
    UNION ALL
    SELECT doc_id, n_hit_bands, novel, 1 AS batch FROM out2
    UNION ALL
    SELECT doc_id, n_hit_bands, novel, 2 AS batch FROM out3
    """,
)
def stream_novelty_maintained_loop(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The audit-driven maintenance lifecycle end-to-end, driving the
    REAL foreachBatch body (``_novelty_ingest_batch_fn`` with a
    ``MaintenancePolicy(every=1)``) — the r11 "appends forever" gap
    closed and proven against the oracle:

      build: band index over docs %10 == 1 — the id-guard filter is
             sized for 4x that id count (the sidecar-recorded
             capacity the audit measures against);
      batch 0: ingest %10 in (2, 3) — the post-batch audit reads
             ~0.3n of 0.4n capacity: no compaction (asserted);
      batch 1: ingest %10 in (4, 5, 6) — the id set (~0.6n) now
             exceeds capacity, the audit flips compact_recommended,
             and the loop compacts EXACTLY ONCE (asserted by the
             bucket_keys location swapping here and only here; the
             compactor re-sizes the filter so the audit reads clean
             after);
      batch 2: VERBATIM COPIES of every %10 == 4 doc (ids +1000000)
             gate through the COMPACTED index — all their verdicts
             must replay the oracle's brute-force recompute, which is
             blind to compaction: content-identical serving across
             the swap is exactly what the atomic-commit design
             promises.

    The oracle replays all three gating rounds in SQL (ref grows by
    each round's novel docs); the in-query EngineError assertions pin
    the operational half (when compaction fired) that SQL cannot
    see."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        EngineError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_audit,
        band_index_build,
        band_index_meta,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.maintenance import (
        MaintenancePolicy,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.neardup_stream import (
        _novelty_ingest_batch_fn,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_maint_loop_")
    cfg = HydrationConfig(
        collection_name="mloop",
        root=root,
        id_col="doc_id",
        text_col="text",
        embedding_col="embedding",
    )
    corpus = d.filter(F.col("doc_id") % 10 == 1)
    hydrate(spark, corpus.join(e, corpus.doc_id == e.vec_id), cfg)
    idx = f"{root}/mloop/_bands"
    band_index_build(
        read_collection(spark, root, "mloop"),
        idx,
        id_col="id",
        text_col="document",
        source=(root, "mloop"),
    )
    ingest = _novelty_ingest_batch_fn(
        idx, cfg, "mloop_sink", maintenance=MaintenancePolicy(every=1)
    )

    def keys_loc() -> str:
        return band_index_meta(idx)["locations"]["bucket_keys"]

    def with_emb(docs: DataFrame) -> DataFrame:
        # copies carry ids +1000000; the embedding rides from the
        # source doc (the text gate never reads it — hydration does)
        return docs.join(
            e, (docs.doc_id % 1000000) == e.vec_id
        ).select("doc_id", "text", "embedding")

    mod = F.col("doc_id") % 10
    loc0 = keys_loc()
    out0 = (
        ingest(with_emb(d.filter(mod.isin(2, 3)).select("doc_id", "text")), 0)
        .withColumn("batch", F.lit(0))
        .localCheckpoint(eager=True)
    )
    if keys_loc() != loc0:
        raise EngineError("compaction fired below capacity (batch 0)")
    out1 = (
        ingest(
            with_emb(d.filter(mod.isin(4, 5, 6)).select("doc_id", "text")), 1
        )
        .withColumn("batch", F.lit(1))
        .localCheckpoint(eager=True)
    )
    loc1 = keys_loc()
    if loc1 == loc0:
        raise EngineError(
            "capacity overflow did not trigger compaction (batch 1)"
        )
    copies = d.filter(mod == 4).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    out2 = (
        ingest(with_emb(copies), 2)
        .withColumn("batch", F.lit(2))
        .localCheckpoint(eager=True)
    )
    if keys_loc() != loc1:
        raise EngineError("a second compaction fired on a clean index")
    if band_index_audit(spark, idx).first()["compact_recommended"]:
        raise EngineError("audit still recommends compaction after the tick")
    return out0.unionByName(out1).unionByName(out2)


@query(
    "stream_cdc_ingest_loop",
    """
    WITH docs0 AS (
        SELECT doc_id, doc_id % 5 AS m5, doc_id % 7 AS m7 FROM documents
    ),
    b1 AS (
        SELECT doc_id,
               CASE WHEN m7 = 3 THEN 'delete'
                    WHEN m5 = 0 THEN 'insert'
                    WHEN m7 = 1 THEN 'update' END AS op,
               m5 <> 0 AS ex
        FROM docs0 WHERE m7 = 3 OR m5 = 0 OR m7 = 1
    ),
    v1 AS (
        SELECT 1 AS batch, CAST(doc_id AS VARCHAR) AS id, op,
               CASE WHEN op = 'insert' THEN
                        CASE WHEN ex THEN 'skipped_existing'
                             ELSE 'applied_insert' END
                    WHEN op = 'update' THEN
                        CASE WHEN ex THEN 'applied_update'
                             ELSE 'skipped_missing' END
                    ELSE
                        CASE WHEN ex THEN 'applied_delete'
                             ELSE 'skipped_missing' END END AS outcome
        FROM b1
    ),
    b2 AS (
        SELECT doc_id, m7,
               CASE WHEN m7 = 3 THEN 'insert'
                    WHEN m7 = 4 THEN 'delete'
                    ELSE 'update' END AS op,
               m7 <> 3 AS ex
        FROM docs0 WHERE m7 IN (3, 4, 5, 6)
    ),
    v2 AS (
        SELECT 2 AS batch, CAST(doc_id AS VARCHAR) AS id, op,
               CASE WHEN op = 'insert' THEN
                        CASE WHEN ex THEN 'skipped_existing'
                             ELSE 'applied_insert' END
                    WHEN op = 'update' THEN
                        -- %7==6 docs got (seq 1, delete) first: the
                        -- net-state replay applies the delete, so the
                        -- latest event (update) finds the id gone
                        CASE WHEN m7 = 6 THEN 'skipped_missing'
                             WHEN ex THEN 'applied_update'
                             ELSE 'skipped_missing' END
                    ELSE
                        CASE WHEN ex THEN 'applied_delete'
                             ELSE 'skipped_missing' END END AS outcome
        FROM b2
    )
    SELECT * FROM v1 UNION ALL SELECT * FROM v2
    """,
)
def stream_cdc_ingest_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming CDC loop end-to-end across two micro-batches,
    driving the REAL foreachBatch body
    (streaming/cdc_stream.py::cdc_ingest_batch_fn — exactly what
    ``stream_cdc_ingest`` runs): hydrate the base corpus
    (doc_id % 5 != 0) behind a stamped IVF index, then

    - batch 1: DELETE every %7==3 doc (applied where hydrated,
      skipped_missing for the %5==0 slice that was never inserted),
      INSERT the remaining %5==0 docs (applied), UPDATE the %7==1
      docs to reversed embeddings (applied);
    - batch 2: re-INSERT the %7==3 docs (RESURRECTION — their ids are
      tombstoned in the index, so this exercises the upsert path a
      plain append would refuse), DELETE %7==4, UPDATE %7==5, and for
      %7==6 send TWO events per doc — (seq 1, delete) then (seq 2,
      update) — pinning the in-batch NET-STATE replay: the delete
      applies first, so the published op is 'update' (the latest
      event is the batch identity) with outcome 'skipped_missing'
      (the id is gone by the time the update replays) and the doc is
      net-deleted.

    Every published ``(batch, id, op, outcome)`` row is recomputed by
    the oracle from pure membership arithmetic over the fixture —
    Chroma's insert/update/delete semantics against the evolving
    collection state. The stores themselves (collection content,
    index masks, fences) are pinned by ``collection_cdc_apply_indexed``
    and tests/test_cdc_stream.py (replay stability, crash healing,
    true-streaming form)."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_build,
        ivf_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.cdc_stream import (
        cdc_ingest_batch_fn,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_cdcloop_")
    cfg = HydrationConfig(
        collection_name="cdcloop",
        root=root,
        id_col="id",
        text_col="text",
        embedding_col="embedding",
    )
    base = d.filter(F.col("doc_id") % 5 != 0)
    hydrate(
        spark,
        base.join(e, base.doc_id == e.vec_id).select(
            F.col("doc_id").cast("string").alias("id"), "text", "embedding"
        ),
        cfg,
    )
    coll = read_collection(spark, root, "cdcloop")
    assigned, C = ivf_build(coll, n_centroids=8, seed=42)
    idx = f"{root}/cdcloop/_ivf"
    ivf_write(
        assigned, C, idx, metric="cosine", source=(root, "cdcloop"),
        build={"metric": "l2", "seed": 42, "sample_fraction": None},
    )
    fn = cdc_ingest_batch_fn(idx, cfg, "cdc_loop")

    m5 = F.col("doc_id") % 5
    m7 = F.col("doc_id") % 7
    de = d.join(e, d.doc_id == e.vec_id)
    op1 = (
        F.when(m7 == 3, "delete")
        .when(m5 == 0, "insert")
        .when(m7 == 1, "update")
    )
    ev1 = (
        de.select(
            op1.alias("op"),
            F.lit(1).cast("long").alias("seq"),
            F.col("doc_id").cast("string").alias("id"),
            "text",
            F.when(op1 == "update", F.reverse("embedding"))
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
        .filter(F.col("op").isNotNull())
    )
    v1 = fn(ev1, 0).select(
        F.lit(1).alias("batch"), "id", "op", "outcome"
    ).localCheckpoint(eager=True)

    op2 = (
        F.when(m7 == 3, "insert")
        .when(m7 == 4, "delete")
        .when(m7.isin(5, 6), "update")
    )
    ev2_main = (
        de.filter(m7.isin(3, 4, 5))
        .select(
            op2.alias("op"),
            F.lit(1).cast("long").alias("seq"),
            F.col("doc_id").cast("string").alias("id"),
            "text",
            F.when(op2 == "update", F.reverse("embedding"))
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    )
    six = de.filter(m7 == 6)
    ev2_six = (
        six.select(
            F.lit("delete").alias("op"),
            F.lit(1).cast("long").alias("seq"),
            F.col("doc_id").cast("string").alias("id"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("array<float>").alias("embedding"),
        )
        .unionByName(
            six.select(
                F.lit("update").alias("op"),
                F.lit(2).cast("long").alias("seq"),
                F.col("doc_id").cast("string").alias("id"),
                "text",
                F.reverse("embedding").alias("embedding"),
            )
        )
    )
    v2 = fn(ev2_main.unionByName(ev2_six), 1).select(
        F.lit(2).alias("batch"), "id", "op", "outcome"
    )
    return v1.unionByName(v2)


_DUAL_TOKS = _TOKS.format(x=_NORM)


@query(
    "stream_cdc_dual_index_loop",
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
    toks AS (SELECT doc_id, is_ref, {_DUAL_TOKS} AS t FROM src),
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
def stream_cdc_dual_index_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DUAL-INDEX CDC capstone: one collection carrying BOTH a
    persisted IVF index and a near-dup band index at the same path,
    mutated end-to-end through the streaming CDC batch body
    (``streaming/cdc_stream.py::cdc_ingest_batch_fn``,
    ``band_text_mode='defer'`` — the streaming default) with DOCUMENT
    UPDATES in the event stream, the exact surface the r12 front door
    refused:

    - INSERT verbatim copies of the %7==2 docs under new ids (+1M,
      reversed embeddings): hydrate + ``ivf_upsert`` on the vector
      side, ``band_index_append`` on the text side — both immediate;
    - UPDATE every %7==1 doc (text + ' updated', reversed embedding):
      the IVF cell rewrites surgically, the band text change rides
      the DEFERRED queue (``band_index_defer_updates`` — the honest
      window, audited below);
    - DELETE every %7==3 doc: tombstones + retired keys on both.

    ``band_index_audit`` must flip ``compact_recommended`` while the
    queue is pending (asserted internally — the maintenance loop's
    trigger), and ``band_index_compact`` then drains the queue in its
    one part rewrite. The returned rows are the post-drain novelty
    gate over four probe families (deleted text, updated docs' OLD
    text, updated docs' NEW text, inserted copies' text), and the
    oracle replays the full MinHash band arithmetic over the FINAL
    corpus — the ``dedup_band_index_apply_gate`` discipline, reached
    here through the streaming CDC + defer + compact path instead of
    a direct apply. The IVF side is asserted internally against the
    same mutations (count, a reversed-update vector, a masked
    delete); any drift raises and fails the row entirely."""
    import tempfile

    from vector_databases___hydrate_chroma_db_collection_spark.errors import (
        EngineError,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
        ivf_build,
        ivf_read,
        ivf_write,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
        band_index_audit,
        band_index_bucket_keys,
        band_index_build,
        band_index_compact,
        band_index_meta,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        novelty_gate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
        HydrationConfig,
        hydrate,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
        read_collection,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.streaming.cdc_stream import (
        cdc_ingest_batch_fn,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="vdb_cdcdual_")
    cfg = HydrationConfig(
        collection_name="cdcdual",
        root=root,
        id_col="id",
        text_col="text",
        embedding_col="embedding",
    )
    de = d.join(e, d.doc_id == e.vec_id)
    hydrate(
        spark,
        de.select(
            F.col("doc_id").cast("string").alias("id"), "text", "embedding"
        ),
        cfg,
    )
    coll = read_collection(spark, root, "cdcdual")
    assigned, C = ivf_build(coll, n_centroids=8, seed=42)
    idx = f"{root}/cdcdual/_dual"
    ivf_write(
        assigned, C, idx, metric="cosine", source=(root, "cdcdual"),
        build={"metric": "l2", "seed": 42, "sample_fraction": None},
    )
    band_index_build(
        coll.select("id", F.col("document").alias("text")),
        idx,
        id_col="id",
        text_col="text",
        source=(root, "cdcdual"),
    )
    m7 = F.col("doc_id") % 7
    ev = (
        de.filter(m7 == 2).select(
            F.lit("insert").alias("op"),
            F.lit(1).cast("long").alias("seq"),
            (F.col("doc_id") + 1000000).cast("string").alias("id"),
            "text",
            F.reverse("embedding").alias("embedding"),
        )
        .unionByName(
            de.filter(m7 == 1).select(
                F.lit("update").alias("op"),
                F.lit(1).cast("long").alias("seq"),
                F.col("doc_id").cast("string").alias("id"),
                F.concat(F.col("text"), F.lit(" updated")).alias("text"),
                F.reverse("embedding").alias("embedding"),
            )
        )
        .unionByName(
            de.filter(m7 == 3).select(
                F.lit("delete").alias("op"),
                F.lit(1).cast("long").alias("seq"),
                F.col("doc_id").cast("string").alias("id"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast("array<float>").alias("embedding"),
            )
        )
    )
    fn = cdc_ingest_batch_fn(idx, cfg, "cdc_dual_loop", band_text_mode="defer")
    fn(ev, 0)
    # the honest window's maintenance trigger: the queue is pending
    aud = band_index_audit(spark, idx).first()
    if not (aud["deferred_updates"] > 0 and aud["compact_recommended"]):
        raise EngineError(
            "dual-index CDC: the deferred text-update queue must "
            "recommend compaction while pending"
        )
    band_index_compact(spark, idx)  # the drain
    # IVF side followed every mutation surgically (masked read passes
    # the etag fence because each mutation re-stamped)
    n_all = d.count()
    n_ins = d.filter(m7 == 2).count()
    n_del = d.filter(m7 == 3).count()
    a, _, _metric = ivf_read(spark, idx)
    if a.count() != n_all + n_ins - n_del:
        raise EngineError("dual-index CDC: IVF row count drifted")
    probe_id = d.filter(m7 == 1).agg(F.min("doc_id")).first()[0]
    want_vec = [
        float(x)
        for x in reversed(
            e.filter(F.col("vec_id") == probe_id).first()["embedding"]
        )
    ]
    got_vec = [
        float(x)
        for x in a.filter(F.col("id") == str(probe_id)).first()["embedding"]
    ]
    if got_vec != want_vec:
        raise EngineError("dual-index CDC: updated vector not served")
    gone = d.filter(m7 == 3).agg(F.min("doc_id")).first()[0]
    if a.filter(F.col("id") == str(gone)).count() != 0:
        raise EngineError("dual-index CDC: deleted vector still served")
    # post-drain novelty gate over the four probe families
    meta = band_index_meta(idx)
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
