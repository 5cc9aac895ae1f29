from vector_databases___hydrate_chroma_db_collection_spark.plans.collection import (
    CollectionManifest,
    collection_count,
    collection_etag,
    collection_versions,
    create_collection,
    delete_collection,
    get_or_create_collection,
    list_collections,
    load_manifest,
    modify_collection,
    read_collection,
)

__all__ = [
    "CollectionManifest",
    "collection_count",
    "collection_etag",
    "collection_versions",
    "create_collection",
    "delete_collection",
    "get_or_create_collection",
    "list_collections",
    "load_manifest",
    "modify_collection",
    "read_collection",
]
