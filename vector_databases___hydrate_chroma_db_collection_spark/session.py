"""SparkSession factory with scale-oriented defaults.

The reference bootstraps a CAS session + Chroma client per run
(reference sas:75-128). Our equivalent is a SparkSession tuned for
large scans:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the
  static shuffle-partition guess is always wrong somewhere.
- Arrow enabled for the few pandas-UDF paths (vector ops fallback,
  multimodal plumbing).
- shuffle partitions sized to the local test harness; on a real
  cluster AQE coalesces these upward/downward from the 2048 initial.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _pin_loaded_blas_threads() -> None:
    """Apply the BLAS-thread env contract to an ALREADY-LOADED
    OpenBLAS via its runtime API. The env vars above only work when
    they are set before the library loads, but callers routinely
    import operator modules (-> numpy -> OpenBLAS) before calling
    ``get_spark`` — bench.py does — and then every DRIVER-side numpy
    GEMM (k-means/PQ trainers, serve-path LUTs) spins a full
    thread-pool per call: one 15-iteration Lloyd fit on a 26k x 8
    slice measured 32.8 cpu-s for 1.59 s wall (~20 spin-wait threads)
    with the loaded-too-late env, vs ~1.6 cpu-s pinned. Workers are
    unaffected either way (they spawn after the env is set). No-op
    when numpy is not loaded yet or the BLAS exposes no such API."""
    import sys

    if "numpy" not in sys.modules:
        return  # env alone will govern the eventual load
    try:
        import ctypes

        with open("/proc/self/maps") as maps:
            libs = sorted(
                {
                    line.split()[-1]
                    for line in maps
                    if "openblas" in line.lower() or "mkl_rt" in line.lower()
                }
            )
        n = int(os.environ.get("OPENBLAS_NUM_THREADS", "1"))
        for path in libs:
            lib = ctypes.CDLL(path)
            # numpy's bundled OpenBLAS uses 64-suffixed (ILP64) symbols;
            # declare the argtype explicitly rather than relying on
            # ctypes' default c_int + SysV register zero-fill (r15
            # ADVICE). MKL-linked numpy (conda defaults) is covered by
            # mkl_set_num_threads through the same loop.
            for sym, argt in (
                ("openblas_set_num_threads", ctypes.c_int),
                ("openblas_set_num_threads64_", ctypes.c_int64),
                ("mkl_set_num_threads", None),  # takes int* by ref
            ):
                try:
                    fn = getattr(lib, sym)
                except AttributeError:
                    continue
                if sym == "mkl_set_num_threads":
                    fn.argtypes = [ctypes.POINTER(ctypes.c_int)]
                    fn(ctypes.byref(ctypes.c_int(n)))
                else:
                    fn.argtypes = [argt]
                    fn(argt(n))
                break
    except Exception:
        pass  # never let thread pinning break session creation


def get_spark(
    app_name: str = "vdb-hydrate-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    On a production cluster ``master`` comes from spark-submit; the
    local default follows the test harness contract
    (local[$SPARK_GRAFT_CPUS]).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else int(cpus)

    # Single-threaded BLAS in every numpy context (driver AND the
    # Python UDF workers, which inherit this env through the JVM):
    # Spark already parallelizes across `cpus` workers, so per-worker
    # BLAS threads only OVERSUBSCRIBE the box — and OpenBLAS's idle
    # threads SPIN-WAIT, burning real CPU while doing nothing. Measured
    # on the 200k pq_encode entry (32 workers x numpy GEMMs): unset ->
    # 5.3-14.2 s wall / 127-386 cpu-s run-to-run; =1 -> 3.7 s wall /
    # 35 cpu-s, stable. That spin was the recurring "host load drift"
    # on every Arrow/pandas-heavy bench entry since r4. setdefault:
    # an operator who sized BLAS deliberately keeps their setting.
    for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(_v, "1")
    _pin_loaded_blas_threads()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Split whole-stage-codegen output into smaller methods than
        # the 1024-unit default: HotSpot never JIT-compiles methods
        # over 8000 bytecode bytes (DontCompileHugeMethods), so the
        # widest generated plans (16-aggregate minhash signatures,
        # multi-column window lattices) otherwise run interpreted
        # FOREVER. Measured (tools/probe_r16_jit.py, fresh JVM per
        # config, both run orders): warm minhash entry 78-86 cpu-s at
        # default vs 54-65 at 512 (wall 5.7-6.1 -> 4.7-5.0); cold
        # first-plan cost unchanged (~170-190 — the storm is compile
        # attempts + allocation, not the split). Data-independent and
        # portable (a property of generated-code size, not of this
        # host); env-overridable for experiments.
        .config(
            "spark.sql.codegen.methodSplitThreshold",
            os.environ.get("SPARK_GRAFT_CODEGEN_SPLIT", "512"),
        )
        # Keep timestamps comparable with external oracles (DuckDB).
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) (events.ts) is read as raw int64;
        # sources/parquet.py converts it to a microsecond timestamp.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
