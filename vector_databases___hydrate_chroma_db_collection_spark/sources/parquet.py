"""Parquet sources.

The reference's only source is a named CAS table bound via
``conn.CASTable(name, caslib)`` and then fully collected to driver
pandas (reference sas:143-147, 161). Here a source is a distributed
Parquet scan: column pruning and predicate pushdown reach the file
reader through Catalyst, and nothing is ever collected to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession

from vector_databases___hydrate_chroma_db_collection_spark.errors import TableNotFoundError

# The fixture star schema (TESTDATA.md) plus the vector-domain tables.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Engine-required session confs, set idempotently at read time:
    the harness may hand us a SparkSession built without our factory
    (session.py), and without these every events query would fail on
    the nanosecond timestamp (PARQUET_TYPE_ILLEGAL) or drift from the
    UTC-based oracle formatting. Both are runtime-settable SQLConfs."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # read-only conf in exotic environments; reads may still work


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Mirrors the reference's caslib+name
    resolution (sas:143-147) with a typed error instead of a SAS
    error flag (sas:452-466)."""
    _ensure_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        raise TableNotFoundError(f"table {name!r} not found at {path}")
    df = spark.read.parquet(path)
    # events.ts is Parquet TIMESTAMP(NANOS); Spark reads it as int64
    # (spark.sql.legacy.parquet.nanosAsLong) — convert to a proper
    # microsecond timestamp. `div` keeps the math in integers (a
    # double round-trip would lose precision above 2^53 ns).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views so ``spark.sql`` works
    over them — the engine's equivalent of `caslib _ALL_ assign`
    (reference sas:13-14)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
