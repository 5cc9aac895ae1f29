"""Reference-shaped wide-embedding input (FIXTURES.md §2): pattern
projection (sas:161), per-row null policies (Q1, sas:162), id
stringification (Q2, sas:178). Includes a hypothesis property test:
drop_nulls assembly == pandas dropna().tolist() oracle (the
reference's literal implementation)."""

from __future__ import annotations

import math
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vector_databases___hydrate_chroma_db_collection_spark.errors import (
    EmbeddingDimensionError,
    PatternMatchError,
)
from vector_databases___hydrate_chroma_db_collection_spark.sources.wide import (
    pattern_columns,
    read_wide_embeddings,
)

WIDE_SCHEMA = (
    "__unique_id_ double, Text_Review string, Target_Rating double, "
    "_Col1 float, _Col2 float, _Col3 float, decoy_column string"
)


def make_wide(spark, rows):
    return spark.createDataFrame(rows, WIDE_SCHEMA)


@pytest.fixture()
def wide(spark):
    return make_wide(
        spark,
        [
            (1.0, "great product", 5.0, 0.1, 0.2, 0.3, "x"),
            (2.0, "bad product", 1.0, 0.4, None, 0.6, "y"),
            (3.0, "ok product", 3.0, 0.7, 0.8, 0.9, "z"),
        ],
    )


def test_pattern_projection_excludes_decoy(wide):
    assert pattern_columns(wide, "_Col") == ["_Col1", "_Col2", "_Col3"]


def test_pattern_no_match_raises(wide):
    with pytest.raises(PatternMatchError):
        pattern_columns(wide, "Embedding_")


def test_strict_policy_raises_on_null(wide):
    with pytest.raises(EmbeddingDimensionError):
        read_wide_embeddings(
            wide,
            id_col="__unique_id_",
            text_col="Text_Review",
            embedding_pattern="_Col",
            null_policy="strict",
        )


def test_skip_row_policy_drops_null_rows(wide):
    out = read_wide_embeddings(
        wide,
        id_col="__unique_id_",
        text_col="Text_Review",
        embedding_pattern="_Col",
        null_policy="skip_row",
    )
    rows = {r["id"]: list(r["embedding"]) for r in out.collect()}
    assert set(rows) == {"1.0", "3.0"}  # Q2: double ids -> "1.0"
    assert len(rows["1.0"]) == 3


def test_drop_nulls_policy_shortens_vector(wide):
    # the reference's literal behavior (sas:162)
    out = read_wide_embeddings(
        wide,
        id_col="__unique_id_",
        text_col="Text_Review",
        embedding_pattern="_Col",
        null_policy="drop_nulls",
    )
    rows = {r["id"]: list(r["embedding"]) for r in out.collect()}
    assert len(rows["2.0"]) == 2  # null dropped from within


def test_metadata_column_passthrough(wide):
    out = read_wide_embeddings(
        wide,
        id_col="__unique_id_",
        text_col="Text_Review",
        embedding_pattern="_Col",
        metadata_col="Target_Rating",
        null_policy="skip_row",
    )
    assert out.filter("id = '1.0'").first()["metadata_value"] == "5.0"


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.floats(-10, 10, allow_nan=False),
            st.booleans(),
            st.floats(-10, 10, allow_nan=False),
            st.booleans(),
            st.floats(-10, 10, allow_nan=False),
            st.booleans(),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_drop_nulls_matches_pandas_oracle(spark, cells):
    import pandas as pd

    rows = []
    for i, (v1, n1, v2, n2, v3, n3) in enumerate(cells):
        rows.append(
            (
                float(i),
                "t",
                0.0,
                None if n1 else v1,
                None if n2 else v2,
                None if n3 else v3,
                "d",
            )
        )
    df = make_wide(spark, rows)
    out = read_wide_embeddings(
        df,
        id_col="__unique_id_",
        text_col="Text_Review",
        embedding_pattern="_Col",
        null_policy="drop_nulls",
    )
    got = {r["id"]: [float(x) for x in r["embedding"]] for r in out.collect()}

    # the reference's implementation: pandas row.dropna().tolist()
    pdf = pd.DataFrame(rows, columns=[c.split()[0] for c in WIDE_SCHEMA.split(", ")])
    emb = pdf.filter(like="_Col").astype("float32")
    for i, row in emb.iterrows():
        expect = [float(x) for x in row.dropna().tolist()]
        key = str(pdf["__unique_id_"][i])
        assert len(got[key]) == len(expect)
        for a, b in zip(got[key], expect):
            assert math.isclose(a, b, rel_tol=1e-6)


def test_pattern_regex_mode(wide):
    # sas:148 — the commented-out re.search variant: unanchored search,
    # full regex syntax available
    assert pattern_columns(wide, r"_Col\d+", mode="regex") == [
        "_Col1",
        "_Col2",
        "_Col3",
    ]
    # anchored regex excludes nothing here but proves syntax passes through
    assert pattern_columns(wide, r"^_Col[13]$", mode="regex") == ["_Col1", "_Col3"]


def test_pattern_regex_no_match_raises(wide):
    with pytest.raises(PatternMatchError):
        pattern_columns(wide, r"^Embedding_\d+$", mode="regex")


def test_pattern_bad_mode_raises(wide):
    with pytest.raises(ValueError):
        pattern_columns(wide, "_Col", mode="glob")


def test_read_wide_regex_matches_substring(spark, wide):
    a = read_wide_embeddings(
        wide,
        id_col="__unique_id_",
        text_col="Text_Review",
        embedding_pattern="_Col",
        null_policy="skip_row",
    ).collect()
    b = read_wide_embeddings(
        wide,
        id_col="__unique_id_",
        text_col="Text_Review",
        embedding_pattern=r"_Col\d",
        null_policy="skip_row",
        pattern_mode="regex",
    ).collect()
    assert a == b
