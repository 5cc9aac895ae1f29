"""Portable hash expressions for dedup + fingerprinting.

Two families:

- ``hash64`` — md5-derived 60-bit integers. Slower than xxhash but
  *portable*: DuckDB computes the identical value with
  ``CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)``, so MinHash
  signatures and SimHash values are oracle-checkable bit-for-bit.
- ``fast_hash64`` — Spark's built-in xxhash64 (JVM, no md5 cost).
  The production default for 100 TB runs where no external oracle
  needs to reproduce the values; same APIs accept either.

All shingling/minhash/simhash below are pure Catalyst higher-order
functions (transform/aggregate/sequence): no UDFs, no shuffle — they
run inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.functions.text import (
    normalize_text,
    tokens,
)


def hash64(c: Column) -> Column:
    """First 15 hex digits of md5 as a (positive, 60-bit) bigint —
    reproducible in DuckDB for oracle checks."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")


def fast_hash64(c: Column) -> Column:
    """xxhash64 — the fast, Spark-only variant."""
    return F.xxhash64(c)


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """n-word shingles over normalized tokens. Documents shorter than
    n tokens produce a single (short) shingle so they still
    participate. Returns ARRAY<STRING> (with duplicates; wrap in
    array_distinct for set semantics)."""
    t = tokens(normalize_text(text))
    count = F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), count), lambda i: F.concat_ws(" ", F.slice(t, i, n))
    )


def minhash_signature(
    shingles: Column, num_hashes: int = 16, portable: bool = True
) -> Column:
    """MinHash signature: for seed j, min over shingles of
    hash(shingle || '#' || j). Returns ARRAY<BIGINT>[num_hashes].

    Classic estimator: P(sig_a[j] == sig_b[j]) = Jaccard(a, b).
    """
    h = hash64 if portable else fast_hash64

    def one(j: Column) -> Column:
        return F.array_min(
            F.transform(
                shingles,
                lambda s: h(F.concat(s, F.lit("#"), j.cast("string"))),
            )
        )

    return F.transform(F.sequence(F.lit(0), F.lit(num_hashes - 1)), one)


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature for LSH: hash each contiguous slice of
    ``rows_per_band`` values; docs sharing any banded value become
    candidate pairs. Returns ARRAY<STRUCT<band INT, h BIGINT>>."""

    def one(b: Column) -> Column:
        piece = F.slice(signature, b * rows_per_band + 1, rows_per_band)
        joined = F.array_join(F.transform(piece, lambda v: v.cast("string")), ",")
        return F.struct(
            b.cast("int").alias("band"), hash64(joined).alias("h")
        )

    return F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), one)


def simhash16(text: Column | str, portable: bool = True) -> Column:
    """16-bit SimHash over whitespace tokens: bit j is the sign of
    sum over tokens of (2*bit_j(hash(token)) - 1). Near-duplicate
    documents land at small Hamming distance. Pure expression; the
    bit extraction uses integer division so DuckDB reproduces it."""
    h = hash64 if portable else fast_hash64
    tok_hashes = F.transform(tokens(normalize_text(text)), lambda t: h(t))

    # Bits unrolled statically (16 terms) so extraction is exact
    # bitwise math — no float division on 60-bit hashes.
    def votes_for(mask: Column) -> Column:
        return F.aggregate(
            tok_hashes,
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + F.when(v.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    out = F.lit(0).cast("bigint")
    for j in range(16):
        mask = F.lit(1 << j).cast("bigint")
        out = out + F.when(votes_for(mask) > 0, mask).otherwise(
            F.lit(0).cast("bigint")
        )
    return out
