"""Two measurements the r10 verdict asked for, in one solo run:

1. **Durability/guard tax decomposition of the 1M band-index write**
   (`synth1m_novelty_index_write` drifted 3.1 -> 5.7 s in r10 when
   guard-last `ids` writes + pending markers + fsync sidecar commits
   landed, and r11 adds the id-guard Bloom build): monkeypatch timers
   around every part write, the Bloom build, and the sidecar commit,
   so the entry's wall-clock is attributed line by line.

2. **Append cost vs corpus size** (the corpus-independence proof for
   the r11 Bloom guard): build indexes over 100k and 1M docs, then
   time `band_index_append` of identical fresh 2k batches into each —
   min-of-3 over disjoint batches. Before r11 the guard anti-joined
   every batch against the FULL persisted id set (cost grows with the
   corpus); with the filter prescreen the two numbers should be ~equal.

Same synthetic corpus and session discipline as bench.py
(session.get_spark(); ad-hoc builders gave non-comparable numbers in
the r10 MinHash A/B). Prints JSON lines; does not touch
BENCH_LOCAL.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators import (
        band_index as bi,
        idguard,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        lsh_band_rows,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="probe-append-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def synth_docs(n: int, offset: int = 0):
        text = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(24)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("id").cast("string"), j.cast("string")),
                        F.lit(50_000),
                    ).cast("string"),
                ),
            ),
        )
        return (
            spark.range(n)
            .repartition(cpus)
            .select((F.col("id") + offset).alias("doc_id"), text.alias("text"))
        )

    # ---- 1. decomposed 1M write --------------------------------------
    docs1m = synth_docs(1_000_000).cache()
    docs1m.count()
    bands1m = lsh_band_rows(docs1m, id_col="doc_id", text_col="text").cache()
    bands1m.count()

    parts: dict[str, float] = {}
    real_write_part = bi._write_new_part
    real_bloom_build = idguard.bloom_build
    real_bloom_write = idguard.bloom_write
    real_sidecar = bi._sidecar_write

    def timed_write_part(df, path, part, nb):
        t0 = time.perf_counter()
        out = real_write_part(df, path, part, nb)
        parts[f"part:{part}"] = parts.get(f"part:{part}", 0.0) + (
            time.perf_counter() - t0
        )
        return out

    def timed_bloom_build(df, col, m, k):
        t0 = time.perf_counter()
        out = real_bloom_build(df, col, m, k)
        parts["bloom_build"] = parts.get("bloom_build", 0.0) + (
            time.perf_counter() - t0
        )
        return out

    def timed_bloom_write(p, f, w, m, k):
        t0 = time.perf_counter()
        real_bloom_write(p, f, w, m, k)
        parts["bloom_write_fsync"] = parts.get("bloom_write_fsync", 0.0) + (
            time.perf_counter() - t0
        )

    def timed_sidecar(p, meta):
        t0 = time.perf_counter()
        real_sidecar(p, meta)
        parts["sidecar_fsync"] = parts.get("sidecar_fsync", 0.0) + (
            time.perf_counter() - t0
        )

    bi._write_new_part = timed_write_part
    idguard.bloom_build = timed_bloom_build
    idguard.bloom_write = timed_bloom_write
    bi._sidecar_write = timed_sidecar
    try:
        d1m = tempfile.mkdtemp(prefix="probe_bidx_1m_")
        t0 = time.perf_counter()
        bi.band_index_write(bands1m, d1m, id_col="doc_id", num_buckets=32)
        total = round(time.perf_counter() - t0, 3)
    finally:
        bi._write_new_part = real_write_part
        idguard.bloom_build = real_bloom_build
        idguard.bloom_write = real_bloom_write
        bi._sidecar_write = real_sidecar
    print(
        json.dumps(
            {
                "probe": "synth1m_novelty_index_write_decomposed",
                "total": total,
                "parts": {k: round(v, 3) for k, v in sorted(parts.items())},
            }
        )
    )

    # ---- 2. append cost vs corpus size -------------------------------
    docs100k = synth_docs(100_000, offset=5_000_000).cache()
    docs100k.count()
    bands100k = lsh_band_rows(docs100k, id_col="doc_id", text_col="text")
    d100k = tempfile.mkdtemp(prefix="probe_bidx_100k_")
    bi.band_index_write(bands100k, d100k, id_col="doc_id", num_buckets=32)

    def batch(base: int):
        return synth_docs(2_000, offset=base)

    out = {}
    for label, idx in (("100k", d100k), ("1m", d1m)):
        ts = []
        for i in range(3):
            b = batch(40_000_000 + (0 if label == "100k" else 10_000_000) + i * 10_000)
            t0 = time.perf_counter()
            n = bi.band_index_append(spark, idx, b)
            ts.append(round(time.perf_counter() - t0, 3))
            assert n == 2_000, n
        out[label] = {"trials": ts, "min": min(ts)}
    print(
        json.dumps(
            {"probe": "band_index_append_2k_vs_corpus_size", "by_corpus": out}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
