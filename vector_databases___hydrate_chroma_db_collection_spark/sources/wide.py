"""Reference-shaped wide-embedding input.

The reference discovers embedding columns by a name-substring pattern
(`scoredTable.filter(like=embedding_pattern)`, reference sas:156-161)
and assembles each row's vector with a row-wise pandas apply that
drops NaNs *inside* the vector (`row.dropna().tolist()`, sas:162 —
quirk Q1 in SURVEY.md §1.2). That is a single-threaded Python loop
over a driver-side copy of the whole table.

Spark-native translation:

- pattern projection is driver-side schema introspection (schemas are
  known before planning; no data is touched),
- vector assembly is a Catalyst expression — ``array(*cols)`` plus a
  null policy — which runs inside whole-stage codegen on executors;
  the scan only reads the matched columns (column pruning).

Null policy (Q1) is an explicit choice instead of a silent behavior:

- ``strict`` (default): any null in an embedding cell fails the load
  with row accounting. Fixed-dimension collections reject ragged
  vectors, so the reference's literal behavior is a data bug.
- ``drop_nulls``: reproduce the reference literally — nulls removed
  from within the vector (``array_compact``), yielding shorter rows.
- ``skip_row``: drop rows containing any null embedding cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.errors import (
    EmbeddingDimensionError,
    PatternMatchError,
)

NULL_POLICIES = ("strict", "drop_nulls", "skip_row")


PATTERN_MODES = ("substring", "regex")


def pattern_columns(
    df: DataFrame, pattern: str, mode: str = "substring"
) -> list[str]:
    """Columns whose name matches ``pattern``, in schema order.

    - ``substring`` (default): the semantics of pandas
      ``filter(like=...)`` — the reference's live code path
      (sas:161).
    - ``regex``: ``re.search`` semantics — the reference's
      commented-out alternative (sas:148,
      ``filter(lambda x: re.search(r'_Col', x), ...)``); unanchored,
      so ``_Col`` matches anywhere in the name, and full regex syntax
      (``_Col\\d+$`` etc.) is available.

    Raises instead of silently producing 0-dim vectors."""
    if mode not in PATTERN_MODES:
        raise ValueError(f"pattern mode must be one of {PATTERN_MODES}, got {mode!r}")
    if mode == "regex":
        import re

        rx = re.compile(pattern)
        cols = [c for c in df.columns if rx.search(c)]
    else:
        cols = [c for c in df.columns if pattern in c]
    if not cols:
        raise PatternMatchError(
            f"embedding pattern {pattern!r} ({mode}) matched no columns among {df.columns}"
        )
    return cols


def assemble_embedding(cols: list[str], null_policy: str = "strict") -> Column:
    """Wide columns -> ARRAY<FLOAT> under the chosen null policy.

    Pure expression tree — stays in whole-stage codegen; no UDF.
    """
    if null_policy not in NULL_POLICIES:
        raise ValueError(f"null_policy must be one of {NULL_POLICIES}")
    arr = F.array(*[F.col(c).cast("float") for c in cols])
    if null_policy == "drop_nulls":
        # Literal reference behavior (sas:162): nulls vanish from
        # within the vector; downstream dimension checks will flag it.
        return F.array_compact(arr)
    return arr


def read_wide_embeddings(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    embedding_pattern: str,
    metadata_col: str | None = None,
    null_policy: str = "strict",
    pattern_mode: str = "substring",
) -> DataFrame:
    """Reference-shaped table -> canonical hydration input.

    Output schema: ``id STRING, document STRING, embedding
    ARRAY<FLOAT>[, metadata_value STRING]``. Ids are stringified via
    ``cast(string)`` of the stored type (quirk Q2, SURVEY.md §1.2:
    the reference's ``str(i)`` over CAS doubles yields "1.0"; we
    document the divergence for integer-typed ids instead of forcing
    doubles).
    """
    cols = pattern_columns(df, embedding_pattern, pattern_mode)
    emb = assemble_embedding(cols, null_policy)

    selected = [
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).cast("string").alias("document"),
        emb.alias("embedding"),
    ]
    if metadata_col is not None:
        selected.append(F.col(metadata_col).cast("string").alias("metadata_value"))
    out = df.select(*selected)

    if null_policy == "strict":
        # Eager validation probe: limit(1) short-circuits on the first
        # offending row, but a CLEAN corpus pays one full upstream
        # pass here before the caller's own action — inherent to
        # fail-BEFORE-return semantics (an observe() inside the
        # caller's job could only fail AFTER rows were consumed).
        # Callers that cannot afford the extra pass use 'skip_row',
        # whose filter rides the consuming job. exists() keeps the
        # probe in codegen.
        has_null = F.exists("embedding", lambda x: x.isNull())
        bad = out.filter(has_null).limit(1).count()
        if bad:
            raise EmbeddingDimensionError(
                "null embedding cells under strict policy; use "
                "null_policy='skip_row' or 'drop_nulls'"
            )
        return out
    if null_policy == "skip_row":
        return out.filter(~F.exists("embedding", lambda x: x.isNull()))
    return out
