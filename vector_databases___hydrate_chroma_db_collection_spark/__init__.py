"""PySpark-native vector-collection hydration + query engine.

A from-scratch engine with the capabilities of the reference
`SundareshSankaran/Vector-Databases---Hydrate-Chroma-DB-Collection`
(a SAS Studio custom step that hydrates a Chroma collection from a
CAS table — see SURVEY.md), re-expressed as idiomatic PySpark:

- sources: Parquet scans + the reference's wide-embedding input shape
  (pattern-projected columns -> ARRAY<FLOAT>, reference sas:156-163).
- operators: collection hydration, exact/approx kNN, dedup family
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
  text analysis, relational query surface.
- plans: collection manifests (get-or-create semantics, sas:132).
- streaming: incremental hydration + windowed aggregation.

Everything is DataFrame-first: the engine composes Catalyst logical
plans and lets Spark choose physical strategies (broadcast vs
shuffle joins, hash aggregation, AQE skew handling). Python UDFs are
avoided in hot paths; where Python is unavoidable the engine uses
Arrow-batched pandas UDFs.
"""

from vector_databases___hydrate_chroma_db_collection_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
