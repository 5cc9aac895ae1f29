"""r16 probe [V5]: first-plan JIT/allocation storms vs codegen configs.

r15 measured the FIRST execution of a fresh plan shape at 400-1000
cpu-s (990 first vs 151 warm on an Arrow shingle noop) — C2 compile
threads and allocation faults are inside the bench's process tree, so
every cold entry pays it. Hypothesis: Spark's generated whole-stage
methods on the widest plans (16-perm minhash aggregate) exceed
HotSpot's 8000-byte HugeMethodLimit, are interpreted until OSR kicks
in, and drag a C2 storm behind them; lowering
`spark.sql.codegen.hugeMethodLimit` to 8000 makes Spark fall back to
interpreted/split paths for exactly those fragments.

Method: run THIS script once per config in a FRESH process (cold JVM),
execute the minhash entry twice at 200k docs, report cold and warm
wall + process-tree CPU. Parent mode spawns the children serially.

    python tools/probe_r16_jit.py            # parent: run all configs
    python tools/probe_r16_jit.py <conf.json>  # child (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "default": {},
    "hugeMethod8000": {"spark.sql.codegen.hugeMethodLimit": "8000"},
    "methodSplit1024": {"spark.sql.codegen.methodSplitThreshold": "512"},
}


def child(conf: dict) -> None:
    from bench import _tree_cpu_delta, _tree_cpu_sample

    from pyspark.sql import SparkSession, functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-r16-jit")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from vector_databases___hydrate_chroma_db_collection_spark.session import (
        _pin_loaded_blas_threads,
    )

    for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(_v, "1")
    _pin_loaded_blas_threads()
    from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
        minhash_lsh_pairs,
        release_cache,
    )

    n_docs = 200_000
    dup_base = F.when(F.col("id") % 500 == 0, F.col("id") + 1).otherwise(F.col("id"))
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
    docs = (
        spark.range(n_docs)
        .repartition(int(cpus))
        .select(F.col("id").alias("doc_id"), doc_text.alias("text"))
        .cache()
    )
    docs.count()

    def run():
        res = minhash_lsh_pairs(docs, id_col="doc_id", text_col="text")
        n = res.count()
        release_cache(res)
        assert n == n_docs // 500, n

    out = []
    for tag in ("cold", "warm1", "warm2"):
        s0 = _tree_cpu_sample()
        t0 = time.perf_counter()
        run()
        out.append(
            (tag, round(time.perf_counter() - t0, 2),
             round(_tree_cpu_delta(s0, _tree_cpu_sample()), 1))
        )
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1:
        child(json.loads(sys.argv[1]))
        return
    for name, conf in CONFIGS.items():
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), json.dumps(conf)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        print(f"{name}: {line[0][7:] if line else 'FAILED: ' + p.stderr[-300:]}")


if __name__ == "__main__":
    main()
