"""Query inventory — the engine's operator coverage, executable.

Every operator surface from SURVEY.md §2 gets a named query here:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL can
express it) an ANSI-SQL oracle string run by DuckDB over the same
parquet fixtures. The driver hash-compares both sides (row count,
schema, order-insensitive value hash with columns sorted by name),
so every computed column is aliased identically on both sides and
floating-point results are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import knn_query
from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is the DuckDB-SQL twin."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Flagship (M1): exact top-5 cosine neighbors of document 1's vector.
# Plan: corpus scan -> distance expression (codegen) ->
# TakeOrderedAndProject. No shuffle; scales linearly with corpus.
# --------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
scored AS (
    SELECT
        e.vec_id,
        round(
            list_sum(list_transform(list_zip(e.embedding, q.qe),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (
                sqrt(list_sum(list_transform(e.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(q.qe,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            ), 4) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 1
)
SELECT vec_id, cos_sim
FROM scored
ORDER BY cos_sim DESC, vec_id
LIMIT 5
"""


@query("knn_top5_cosine", _FLAGSHIP_ORACLE)
def knn_top5_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 1).select("embedding").first()["embedding"]
    return (
        knn_query(
            emb.filter(F.col("vec_id") != 1),
            list(qvec),
            k=5,
            id_col="vec_id",
            embedding_col="embedding",
            metric="cosine",
            score_decimals=4,
        )
        .withColumnRenamed("score", "cos_sim")
    )
