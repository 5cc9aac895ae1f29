from vector_databases___hydrate_chroma_db_collection_spark.operators.ann import (
    add_lsh_buckets,
    ivf_build,
    ivf_delete,
    ivf_knn_join,
    ivf_read,
    ivf_search,
    ivf_tombstoned_ids,
    ivf_upsert,
    ivf_write,
    lsh_knn_query,
    mllib_lsh_similarity_join,
    mllib_minhash_dedup_join,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
    embedding_neardup_pairs,
    embedding_neardup_pairs_gemm,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.dedup import (
    dup_ngram_fraction,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.graph import (
    connected_components,
    pagerank,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.hydrate import (
    HydrationConfig,
    HydrationReport,
    build_hydration_input,
    hydrate,
    mirror_to_chroma,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.knn import (
    knn_join,
    knn_join_gemm,
    knn_query,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.pq import (
    ivf_pq_build,
    ivf_pq_delete,
    ivf_pq_read,
    ivf_pq_upsert,
    ivf_pq_search,
    ivf_pq_write,
    pq_encode,
    pq_knn_query,
    pq_train,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.sketch import (
    cms_counters,
    cms_estimate,
)
from vector_databases___hydrate_chroma_db_collection_spark.operators.relational import (
    bucketed_join,
    salted_join,
    write_bucketed,
)

__all__ = [
    "add_lsh_buckets",
    "ivf_build",
    "ivf_delete",
    "ivf_tombstoned_ids",
    "ivf_upsert",
    "ivf_knn_join",
    "ivf_read",
    "ivf_search",
    "ivf_write",
    "lsh_knn_query",
    "mllib_lsh_similarity_join",
    "mllib_minhash_dedup_join",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_gemm",
    "exact_dedup",
    "jaccard_pairs",
    "dup_ngram_fraction",
    "connected_components",
    "pagerank",
    "cms_counters",
    "cms_estimate",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "HydrationConfig",
    "HydrationReport",
    "build_hydration_input",
    "hydrate",
    "mirror_to_chroma",
    "knn_join",
    "knn_join_gemm",
    "knn_query",
    "ivf_pq_build",
    "ivf_pq_delete",
    "ivf_pq_upsert",
    "ivf_pq_read",
    "ivf_pq_search",
    "ivf_pq_write",
    "pq_encode",
    "pq_knn_query",
    "pq_train",
    "bucketed_join",
    "salted_join",
    "write_bucketed",
]
