from vector_databases___hydrate_chroma_db_collection_spark.sources.parquet import (
    TABLES,
    load_table,
    register_views,
)
from vector_databases___hydrate_chroma_db_collection_spark.sources.wide import (
    assemble_embedding,
    pattern_columns,
    read_wide_embeddings,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "pattern_columns",
    "assemble_embedding",
    "read_wide_embeddings",
]
