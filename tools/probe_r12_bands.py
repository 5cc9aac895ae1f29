"""Re-record the two bench bands the r11 verdict flagged as stale.

- ``synth1m_ivfpq_build``: the recorded band (11.5-12.6 s) is the r6
  reading and predates the r11 id-guard filter build inside
  ``ivf_pq_write``... which this entry does NOT call — the bench entry
  times ``ivf_pq_build`` (train + encode) + a noop write only, so the
  r11 12.9 s reading needs a fresh idle band at current HEAD rather
  than an adjudication against r6 every round.
- ``synth1m_novelty_index_write``: three provenances disagree (7.09
  local suite / 5.97 driver suite / 13.4-15.2 solo-instrumented); the
  BASELINE row must state which one the band uses. This probe is the
  canonical one: bench.py's exact setup (same synthetic corpus, same
  cached band table, same ``get_spark()`` session bench uses — an
  ad-hoc builder measured ~2x slower on the r10 MinHash A/B), run
  SOLO, min-of-3.

Usage: python tools/probe_r12_bands.py [ivfpq_build] [index_write]
Prints one JSON line per probe; does not touch BENCH_LOCAL.json.
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
    which = set(sys.argv[1:]) or {"ivfpq_build", "index_write"}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="probe-r12-bands")

    def trials(fn, n: int = 3) -> list[float]:
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        return ts

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    if "ivfpq_build" in which:
        from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
            ivf_pq_build,
        )

        n1m, dim = 1_000_000, 64
        vec = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (
                F.pmod(
                    F.xxhash64(
                        F.concat(
                            F.col("id").cast("string"),
                            F.lit("#"),
                            j.cast("string"),
                        )
                    ),
                    F.lit(2000),
                )
                - 1000
            ).cast("float")
            / 1000.0,
        )
        corpus1m = (
            spark.range(n1m)
            .repartition(cpus)
            .select("id", vec.alias("embedding"))
            .cache()
        )
        corpus1m.count()

        def build() -> None:
            e, _, _ = ivf_pq_build(
                corpus1m,
                id_col="id",
                n_centroids=256,
                m=8,
                n_codes=256,
                seed=42,
                sample_fraction=0.02,
            )
            run_noop(e)

        ts = trials(build)
        print(json.dumps({"probe": "synth1m_ivfpq_build", "trials": ts,
                          "min": min(ts)}))
        corpus1m.unpersist()

    if "index_write" in which:
        from vector_databases___hydrate_chroma_db_collection_spark.operators.band_index import (
            band_index_write,
        )
        from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
            lsh_band_rows,
            release_cache,
        )

        n_docs = 1_000_000
        dup_base = F.when(
            F.col("id") % 500 == 0, F.col("id") + 1
        ).otherwise(F.col("id"))
        doc_text = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(24)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(dup_base.cast("string"), j.cast("string")),
                        F.lit(50_000),
                    ).cast("string"),
                ),
            ),
        )
        docs1m = (
            spark.range(n_docs)
            .repartition(cpus)
            .select(F.col("id").alias("doc_id"), doc_text.alias("text"))
            .cache()
        )
        docs1m.count()
        bands = lsh_band_rows(docs1m, id_col="doc_id", text_col="text").cache()
        bands.count()
        release_cache(bands)
        bidx = tempfile.mkdtemp(prefix="probe_bandidx_")

        def write() -> None:
            band_index_write(bands, bidx, id_col="doc_id", num_buckets=32)

        ts = trials(write)
        print(json.dumps({"probe": "synth1m_novelty_index_write",
                          "trials": ts, "min": min(ts)}))
        bands.unpersist()
        docs1m.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
