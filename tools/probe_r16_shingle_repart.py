"""r16 probe: is the unconditional `repartition(target)` in
`_shingle_rows`' Arrow path (and the exact-substring tokenizers) worth
its exchange when the input is ALREADY well-partitioned?

The repartition exists so a single-file parquet input does not
serialize the heavy Arrow pass onto one or two cores — but a cached,
32-partition corpus (every bench synth corpus; any well-laid-out
production table) pays a full round-robin exchange of the corpus TEXT
for nothing. A/B at 1M docs, warm, min-of-N, noop-sunk:

  with_repart     select -> repartition(32) -> mapInArrow -> md5
  without_repart  select -> mapInArrow -> md5  (input already 32 parts)

Run on an IDLE host: python tools/probe_r16_shingle_repart.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _tree_cpu_delta, _tree_cpu_sample  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    trials = int(os.environ.get("PROBE_TRIALS", "3"))

    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.functions.hashes import (
        MINHASH_P,
        hash64,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        normalize_text,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        _shingle_arrow_fn,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import get_spark

    spark = get_spark(app_name="probe-r16-shingle-repart")
    spark.sparkContext.setLogLevel("ERROR")
    target = spark.sparkContext.defaultParallelism

    doc_text = F.concat_ws(
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
    docs = (
        spark.range(n_docs)
        .repartition(target)
        .select(F.col("id").alias("doc_id"), doc_text.alias("text"))
        .cache()
    )
    docs.count()

    def pipe(repart: bool):
        base = docs.select(
            F.col("doc_id").alias("_id"),
            normalize_text(F.col("text")).alias("_norm"),
        )
        if repart:
            base = base.repartition(target)
        flat = base.mapInArrow(
            _shingle_arrow_fn(3), schema="_id bigint, shingle string"
        )
        return flat.withColumn(
            "h", F.pmod(hash64(F.col("shingle")), F.lit(MINHASH_P))
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name, repart in (("with_repart", True), ("without_repart", False)):
        df = pipe(repart)
        noop(df)  # warm
        ws, cs = [], []
        for _ in range(trials):
            s0 = _tree_cpu_sample()
            t0 = time.perf_counter()
            noop(df)
            ws.append(time.perf_counter() - t0)
            cs.append(_tree_cpu_delta(s0, _tree_cpu_sample()))
        print(
            f"{name}: wall_min {min(ws):.2f}s (all {[round(w, 2) for w in ws]}), "
            f"cpu_min {min(cs):.1f} (all {[round(c, 1) for c in cs]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
