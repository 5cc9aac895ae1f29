"""Delete cost vs corpus size — the r12 tombstone-delete scale claim,
measured.

``ivf_delete`` is O(batch + tombstones) bookkeeping PLUS one id-column
scan of the cells dataset (the deleted ids are filter-positive in the
id-guard Bloom by construction, so the exact intersect cannot be
prescreened away); ``band_index_delete`` additionally scans the bands
part once to compute the retired keys. Neither rewrites data. This
probe builds 100k- and 1M-row indexes (IVF and band) and times a
2k-id delete into each, min-of-3 over disjoint batches — the slope
between the two readings is the id/bands-scan term, and the gap to a
full rebuild (ivf_refresh / band_index_refresh, the pre-r12 remedy)
is the feature's value.

Same synthetic corpus and session discipline as bench.py. Prints JSON
lines; does not touch BENCH_LOCAL.json.
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
        ann,
        band_index as bi,
    )
    from vector_databases___hydrate_chroma_db_collection_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="probe-delete-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def synth_vecs(n: int):
        # deterministic 16-dim vectors, same expression family as
        # bench.py's synthetic ANN corpora
        return (
            spark.range(n)
            .repartition(cpus)
            .select(
                F.col("id").cast("string").alias("id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(16)),
                    lambda j: (
                        F.pmod(F.col("id") * j + j * j, F.lit(97)).cast(
                            "float"
                        )
                        / F.lit(97.0)
                    ),
                ).alias("embedding"),
            )
        )

    def synth_docs(n: int):
        # 24-token docs over a bounded vocab (bench.py's band corpus)
        return (
            spark.range(n)
            .repartition(cpus)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(24)),
                        lambda j: F.concat(
                            F.lit("w"),
                            F.pmod(F.col("id") * 131 + j * 17, F.lit(5000)),
                        ),
                    ),
                ).alias("text"),
            )
        )

    out = {}
    for n, tag in ((100_000, "100k"), (1_000_000, "1m")):
        root = tempfile.mkdtemp(prefix=f"probe_del_{tag}_")
        # ---- IVF ----
        vecs = synth_vecs(n).localCheckpoint(eager=True)
        assigned, C = ann.ivf_build(vecs, n_centroids=64, seed=42)
        ivf_path = os.path.join(root, "ivf")
        ann.ivf_write(assigned, C, ivf_path, metric="cosine")
        times = []
        for k in range(3):  # disjoint 2k batches, min-of-3
            ids = [str(i) for i in range(k * 2000, (k + 1) * 2000)]
            t0 = time.time()
            got = ann.ivf_delete(spark, ivf_path, ids)
            times.append(time.time() - t0)
            assert got == 2000, got
        out[f"ivf_delete_2k_{tag}"] = round(min(times), 3)
        # ---- band ----
        docs = synth_docs(n).localCheckpoint(eager=True)
        band_path = os.path.join(root, "band")
        bi.band_index_build(docs, band_path)
        times = []
        for k in range(3):  # disjoint in-corpus 2k slices, min-of-3
            ids = list(range(k * 2000, (k + 1) * 2000))
            t0 = time.time()
            got = bi.band_index_delete(spark, band_path, ids)
            times.append(time.time() - t0)
            assert got == 2000, got
        out[f"band_delete_2k_{tag}"] = round(min(times), 3)
        print(json.dumps({k: v for k, v in out.items() if tag in k}))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
