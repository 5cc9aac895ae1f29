"""Solo idle-host re-measure of synth200k_pq_encode (the r10->r11
flagged entry): replicates bench.py's exact setup — same synthetic
corpus, same pq_train sample, same noop-write measurement, same
engine session (session.get_spark(): ad-hoc builders with different
driver memory produced ~2x-slower, non-comparable numbers in the r10
MinHash A/B) — but runs it ALONE, min-of-3, so the number is free of
in-suite cache pressure and concurrent host load.

Usage: python tools/probe_pq_encode.py
Prints one JSON line; does not touch BENCH_LOCAL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
        pq_encode,
        pq_train,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="probe-pq-encode")
    spark.sparkContext.setLogLevel("ERROR")

    n, dim = 200_000, 64
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(
                F.xxhash64(
                    F.concat(
                        F.col("id").cast("string"), F.lit("#"), j.cast("string")
                    )
                ),
                F.lit(2000),
            )
            - 1000
        ).cast("float")
        / 1000.0,
    )
    corpus = (
        spark.range(n)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select("id", vec.alias("embedding"))
        .cache()
    )
    corpus.count()

    def run() -> None:
        cb = pq_train(
            corpus.sample(0.1, 42),
            embedding_col="embedding",
            m=8,
            n_codes=256,
            seed=42,
            normalize=True,
        )
        pq_encode(corpus, cb, id_col="id", normalize=True).write.format(
            "noop"
        ).mode("overwrite").save()

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {"probe": "synth200k_pq_encode_solo", "trials": ts, "min": min(ts)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
