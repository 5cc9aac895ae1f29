from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
    CollectionManifest,
    get_or_create_collection,
    read_collection,
)

__all__ = ["CollectionManifest", "get_or_create_collection", "read_collection"]
