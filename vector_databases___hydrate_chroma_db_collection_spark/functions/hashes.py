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
    n tokens (but non-empty) produce a single (short) shingle so they
    still participate; EMPTY/whitespace-only documents produce ZERO
    shingles — the earlier single-''-shingle behavior made every
    empty doc a mutual jaccard-1.0 duplicate of every other and put
    them all in one corpus-wide posting list (the quadratic
    mega-bucket pathology). Returns ARRAY<STRING> (with duplicates;
    wrap in array_distinct for set semantics)."""
    t = tokens(normalize_text(text))
    count = F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))
    return F.when(F.size(t) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
    )


# Universal-hash family over the Mersenne prime 2^31-1: one md5 per
# shingle, then h_j(x) = (A[j]*x + B[j]) mod P. Constants frozen so
# the DuckDB oracle embeds the identical family (seeded once,
# hardcoded — regenerating them would silently break oracle parity).
MINHASH_P = 2147483647
MINHASH_A = [1608637543, 1273642420, 1935803229, 787846415, 996406379,
             1201263688, 423734973, 415968277, 670094951, 1914837114,
             669991379, 429389015, 249467211, 1972458955, 1572714584,
             1433267573]
MINHASH_B = [434285667, 613608295, 893664919, 648061058, 88409749,
             242285876, 2018247425, 953477463, 1427830251, 1883569565,
             911989541, 3344769, 780932287, 2114032571, 787716372,
             504579232]


def minhash_signature(
    shingles: Column, num_hashes: int = 16, portable: bool = True
) -> Column:
    """MinHash signature as ARRAY<BIGINT>[num_hashes].

    Each shingle is hashed ONCE (md5-derived for the portable/oracle
    path, xxhash64 otherwise), then ``num_hashes`` permutations come
    from the affine family (A[j]*h + B[j]) mod (2^31-1) — integer
    math that costs ~nothing next to the string hash, keeping the
    signature a single pass over the shingle set. Base hashes stay
    < 2^31 so A[j]*h fits in a bigint without ANSI overflow.

    Classic estimator: P(sig_a[j] == sig_b[j]) = Jaccard(a, b).
    """
    return minhash_from_base(shingle_base_hashes(shingles, portable), num_hashes)


def shingle_base_hashes(shingles: Column, portable: bool = True) -> Column:
    """One string hash per shingle, reduced mod 2^31-1. Materialize
    (and cache) this column before fanning out to the permutations —
    as a raw expression it would be re-evaluated once per permutation."""
    h = hash64 if portable else fast_hash64
    return F.transform(shingles, lambda s: F.pmod(h(s), F.lit(MINHASH_P)))


def minhash_from_base(base_hashes: Column, num_hashes: int = 16) -> Column:
    """Permutation mins over precomputed base hashes — pure integer
    math, one pass per permutation over an int array."""
    if num_hashes > len(MINHASH_A):
        raise ValueError(f"num_hashes must be <= {len(MINHASH_A)}")

    def one(j: int) -> Column:
        return F.array_min(
            F.transform(
                base_hashes,
                lambda x: F.pmod(
                    F.lit(MINHASH_A[j]) * x + F.lit(MINHASH_B[j]), F.lit(MINHASH_P)
                ),
            )
        )

    return F.array(*[one(j) for j in range(num_hashes)])


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

    # ONE aggregate whose accumulator packs all 16 vote counters (an
    # array<bigint>), so every token is md5-hashed exactly ONCE. The
    # earlier form ran one aggregate per bit — and interpreted
    # higher-order functions get no subexpression elimination, so each
    # token paid 16 md5 evaluations. Bit masks stay static Python
    # ints, so extraction is exact bitwise math — no float division
    # on 60-bit hashes.
    votes = F.aggregate(
        tok_hashes,
        F.array(*[F.lit(0).cast("bigint") for _ in range(16)]),
        lambda acc, v: F.array(
            *[
                F.element_at(acc, j + 1)
                + F.when(v.bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
                for j in range(16)
            ]
        ),
    )
    masks = F.array(*[F.lit(1 << j).cast("bigint") for j in range(16)])
    bits = F.zip_with(
        votes,
        masks,
        lambda vote, m: F.when(vote > 0, m).otherwise(F.lit(0).cast("bigint")),
    )
    return F.aggregate(bits, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


ROLLING_BASE = 131


def rolling_hash(toks: Column, *, base: int = ROLLING_BASE, portable: bool = True) -> Column:
    """Polynomial (Rabin–Karp-style) rolling hash over a token array:
    acc_i = (acc_{i-1} * base + h(tok_i)) mod P, P = 2^31 - 1.
    Order-SENSITIVE — unlike the md5/SimHash fingerprints, permuting
    tokens changes the value, so it fingerprints documents as
    sequences. acc stays < P and base*P + P < 2^63, so the math is
    exact in BIGINT on any engine; with ``portable`` the per-token
    hash is the md5 family, making it DuckDB-oracle-checkable
    (list_reduce seeded by the first element equals our 0-init fold
    because h(tok) < P). Per-row O(tokens), no shuffle — at 100 TB
    this is a pure scan; the lambda is interpreted, so for hot paths
    explode + groupBy aggregation is the flat alternative."""
    h = hash64 if portable else fast_hash64
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: F.pmod(
            acc * F.lit(base) + F.pmod(h(t), F.lit(MINHASH_P)), F.lit(MINHASH_P)
        ),
    )


def minhash_signature_onepass(
    shingles: Column, num_hashes: int = 16, portable: bool = True
) -> Column:
    """MinHash signature as a PURE PER-ROW expression — the shape
    Structured Streaming needs (no aggregate, so it is legal in any
    streaming projection) and the shape ``minhash_from_base`` cannot
    deliver efficiently: Catalyst's CollapseProject inlines a base
    column referenced by N permutations back into each of them, so
    the md5 runs N times per shingle. Here ONE ``F.aggregate`` pass
    carries all ``num_hashes`` running minima in an array accumulator
    (the same trick as ``simhash16``'s packed vote counters), so each
    shingle is hashed exactly once regardless of permutation count.

    Returns NULL for rows with zero shingles (empty/whitespace text)
    — the aggregate's init value is a sentinel that never survives a
    non-empty pass, and NULL keeps the "empty docs produce no bands"
    contract when the caller explodes the banded signature.

    Values are IDENTICAL to ``minhash_signature`` / the DuckDB oracle
    family (same base hash, same affine permutations)."""
    if num_hashes > len(MINHASH_A):
        raise ValueError(f"num_hashes must be <= {len(MINHASH_A)}")
    h = hash64 if portable else fast_hash64
    init = F.array(*[F.lit(MINHASH_P).cast("bigint") for _ in range(num_hashes)])
    sig = F.aggregate(
        shingles,
        init,
        lambda acc, s: (
            lambda base: F.array(
                *[
                    F.least(
                        F.element_at(acc, j + 1),
                        F.pmod(
                            F.lit(MINHASH_A[j]) * base + F.lit(MINHASH_B[j]),
                            F.lit(MINHASH_P),
                        ),
                    )
                    for j in range(num_hashes)
                ]
            )
        )(F.pmod(h(s), F.lit(MINHASH_P))),
    )
    return F.when(F.size(shingles) > 0, sig)
