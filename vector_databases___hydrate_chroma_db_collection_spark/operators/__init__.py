from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
    HydrationConfig,
    HydrationReport,
    build_hydration_input,
    hydrate,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
    knn_join,
    knn_join_gemm,
    knn_query,
)

__all__ = [
    "HydrationConfig",
    "HydrationReport",
    "build_hydration_input",
    "hydrate",
    "knn_query",
    "knn_join",
    "knn_join_gemm",
]
