"""Replicates the driver's DuckDB-oracle gate locally: for every
registered query with an oracle, run the Spark side and the SQL side
on sf0.01 and compare row count, schema (column names), and values
(columns sorted by name, rows sorted, exact equality after the
rounding both sides already apply)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vector_databases___hydrate_chroma_db_collection_spark import queries as registry

from .conftest import SF_CORRECT


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # lists/arrays -> tuples so they sort/compare
            pdf[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            ok = (
                np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            )
        else:
            ok = av == bv
            ok = np.where(pd.isna(av) & pd.isna(bv), True, ok)
        if not np.all(ok):
            bad = np.flatnonzero(~ok)[:5]
            raise AssertionError(
                f"{name}: column {c!r} differs at rows {bad.tolist()}: "
                f"spark={av[bad].tolist()} duck={bv[bad].tolist()}"
            )


ORACLE_NAMES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle(spark, duck, name):
    spark_df = registry.QUERIES[name](spark, SF_CORRECT)
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck.execute(registry.ORACLES[name]).fetchdf()
    compare(spark_pdf, duck_pdf, name)


def test_all_queries_run_and_return_rows(spark):
    # Queries without oracles still must run (rows-only driver check).
    for name, fn in registry.QUERIES.items():
        df = fn(spark, SF_CORRECT)
        assert df.count() >= 0, name


def test_redact_pii_all_categories(spark):
    """Each PII category is replaced by its typed tag, in the
    documented email -> ipv4 -> phone order."""
    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    rows = [
        ("write a.user+tag@sub.example.co.uk from 192.168.001.42 "
         "or call +44 20 7946 0958 today",),
        ("no pii at all here",),
    ]
    df = spark.createDataFrame(rows, "t string")
    got = df.select(
        redact_pii("t").alias("red"), pii_counts("t").alias("c")
    ).collect()
    assert got[0]["red"] == (
        "write [EMAIL] from [IPV4] or call [PHONE] today"
    )
    assert got[0]["c"].asDict() == {"n_email": 1, "n_ipv4": 1, "n_phone": 1}
    assert got[1]["red"] == "no pii at all here"
    assert got[1]["c"].asDict() == {"n_email": 0, "n_ipv4": 0, "n_phone": 0}


def test_redact_pii_idempotent_and_leak_free(spark):
    """Properties: redaction is idempotent (tags contain no PII
    shapes), and no category's pattern matches the redacted text."""
    from pyspark.sql import functions as F

    from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
        PII_PATTERNS,
        redact_pii,
    )

    rows = [
        ("a@b.co and c.d+e@f-g.org twice",),
        ("ips 1.2.3.4 10.200.30.7 and phone 555 123 4567",),
        ("+1 800-555-0100 ext x 192.168.0.1 u@v.io",),
        ("clean text stays clean",),
    ]
    df = spark.createDataFrame(rows, "t string")
    once = df.select(redact_pii("t").alias("r1"))
    twice = once.select(
        F.col("r1"), redact_pii("r1").alias("r2"),
        *[
            F.regexp_count("r1", F.lit(p)).alias(f"left_{k}")
            for k, p in PII_PATTERNS.items()
        ],
    ).collect()
    for r in twice:
        assert r["r1"] == r["r2"]  # idempotent
        for k in PII_PATTERNS:
            assert r[f"left_{k}"] == 0  # nothing left to match
