"""r15 optimization probe: the Python boundary cost of the per-row
``np.stack([np.asarray(e) for e in pdf[col]])`` pattern (13 sites in
the operators) vs a zero-copy Arrow flat-buffer reshape.

Workload = the ``_assign_to_centroids`` shape: 1M x 64 float corpus,
256 centroids, cosine. Three variants, identical outputs asserted:

  v0_mapInPandas_rowloop   the current per-row np.asarray conversion
  v1_mapInPandas_vstack    np.vstack over the object column (pandas,
                           C-level concat of per-row arrays)
  v2_mapInArrow_flat       mapInArrow: values buffer -> one reshape,
                           no per-row Python objects either direction

Run on an IDLE host: python tools/probe_r15_arrow.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from bench import _tree_cpu_delta, _tree_cpu_sample  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = 64
    trials = int(os.environ.get("PROBE_TRIALS", "3"))

    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.session import get_spark

    spark = get_spark(app_name="probe-r15-arrow")
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(
                F.xxhash64(F.concat(F.col("id").cast("string"), F.lit("#"), j.cast("string"))),
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

    rng = np.random.RandomState(42)
    C = rng.randn(256, dim)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    base = corpus.select(F.col("id").alias("_id"), F.col("embedding").alias("_e"))

    import pandas as pd

    def v0(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["_e"]])
            Eu = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-300)
            cell = np.argmax(Eu @ Cn.T, axis=1)
            yield pd.DataFrame({"id": pdf["_id"], "ivf_cell": cell.astype("int32")})

    def v1(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.vstack(pdf["_e"].to_numpy()).astype(np.float64)
            Eu = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-300)
            cell = np.argmax(Eu @ Cn.T, axis=1)
            yield pd.DataFrame({"id": pdf["_id"], "ivf_cell": cell.astype("int32")})

    import pyarrow as pa

    def v2(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            col = rb.column(1)  # _e
            # list<float> -> flat child values, one zero-copy reshape
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            flat = np.asarray(arr.values, dtype=np.float32).reshape(rb.num_rows, dim)
            E = flat.astype(np.float64)
            Eu = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-300)
            cell = np.argmax(Eu @ Cn.T, axis=1)
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), pa.array(cell.astype("int32"))],
                names=["id", "ivf_cell"],
            )

    def run_pd(fn):
        base.mapInPandas(fn, schema="id bigint, ivf_cell int").write.format(
            "noop"
        ).mode("overwrite").save()

    def run_arrow(fn):
        base.mapInArrow(fn, schema="id bigint, ivf_cell int").write.format(
            "noop"
        ).mode("overwrite").save()

    def timed(name, fn):
        ws, cs = [], []
        for _ in range(trials):
            c0 = _tree_cpu_sample()
            t0 = time.perf_counter()
            fn()
            ws.append(time.perf_counter() - t0)
            cs.append(_tree_cpu_delta(c0, _tree_cpu_sample()))
        print(
            f"{name}: wall min {min(ws):.2f}s (all {[round(w, 2) for w in ws]}) "
            f"cpu min {min(cs):.1f}s (all {[round(c, 1) for c in cs]})",
            flush=True,
        )

    # correctness: identical assignments across variants
    got0 = sorted(
        (r["id"], r["ivf_cell"])
        for r in base.limit(0).sparkSession.createDataFrame([], "id bigint").collect()
    )
    small = base.filter(F.col("_id") < 5000)
    a0 = {r["id"]: r["ivf_cell"] for r in small.mapInPandas(v0, "id bigint, ivf_cell int").collect()}
    a1 = {r["id"]: r["ivf_cell"] for r in small.mapInPandas(v1, "id bigint, ivf_cell int").collect()}
    a2 = {r["id"]: r["ivf_cell"] for r in small.mapInArrow(v2, "id bigint, ivf_cell int").collect()}
    assert a0 == a1 == a2, "variant outputs diverge"
    print(f"outputs identical on 5k-row check ({len(a0)} rows)")

    for name, fn in [("v0_mapInPandas_rowloop", lambda: run_pd(v0)),
                     ("v1_mapInPandas_vstack", lambda: run_pd(v1)),
                     ("v2_mapInArrow_flat", lambda: run_arrow(v2))]:
        spark.sparkContext.setJobDescription(name)
        # warm once (Arrow serializer init), then time
        fn()
        timed(name, fn)

    spark.stop()


if __name__ == "__main__":
    main()
