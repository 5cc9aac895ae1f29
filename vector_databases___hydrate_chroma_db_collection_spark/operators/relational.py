"""Scale-robustness join strategies.

Catalyst + AQE already pick broadcast vs sort-merge and split skewed
partitions; these helpers cover the two cases that still need an
explicit physical choice at 100 TB:

- ``salted_join`` — extreme key skew on the build side of a shuffle
  join (one key holding a double-digit percentage of rows). AQE's
  skew-join splits oversized *partitions*; salting splits the *key
  itself*: the skewed side gets a random salt in [0, buckets), the
  small side is exploded x buckets, and the join key becomes
  (key, salt). Shuffle output is balanced by construction.

- ``bucketed tables`` — recurring joins on the same key. Writing both
  sides bucketed by the key (``write_bucketed``) lets Spark plan a
  sort-merge join with NO exchange on either side: co-located
  bucket files join one-to-one. At 100 TB this converts the
  dominant shuffle of every pipeline run into a pure scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    buckets: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed[on]`` has heavy key skew and ``small``
    is too big to broadcast. The salt column is dropped on output.

    Row multiplication happens only on ``small`` (x buckets), so use
    the smallest side that still can't broadcast. Deterministic given
    the seed (rand(seed) is reproducible per partition lineage).
    """
    salt = (F.rand(seed) * buckets).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins and aggregations on ``bucket_col`` between tables bucketed
    with the same bucket count plan without an Exchange."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed managed tables on their bucket key —
    plans as exchange-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
