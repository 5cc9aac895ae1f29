from vector_databases___hydrate_chroma_db_collection_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
)
from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
    char_count,
    language_id,
    normalize_text,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_ratio,
    token_count,
    tokens,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "normalize_text",
    "tokens",
    "token_count",
    "char_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "language_id",
    "rolling_fingerprint",
]
