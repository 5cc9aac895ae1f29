"""Vector math as Catalyst expressions.

The reference stores vectors but never computes on them — similarity
is motivated (reference README.md:5) yet delegated to Chroma. Here
distance math is a first-class expression so it participates in
whole-stage codegen: no Python in the loop, no shuffle introduced.

All arithmetic is carried out in DOUBLE regardless of the stored
element type (fixtures use ARRAY<FLOAT>) so results match a
double-precision oracle bit-for-bit up to summation order.

For very high dimensions (1000s, reference README.md:75) the
expression form's per-element lambda overhead grows; ``pandas_dot``
provides an Arrow-vectorized numpy alternative behind the same
signature. Benchmarks at dim=64 favor the expression form (no
serialization), so it is the default everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(x: Column) -> Column:
    return x.cast("double")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sum_i a[i]*b[i] in double precision, left-to-right order."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _as_double(x) * _as_double(x))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a|*|b|); NULL-safe only in that null arrays
    propagate NULL (Catalyst semantics)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(a, b, lambda x, y: _as_double(x) - _as_double(y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x * x))


# ---------------------------------------------------------------------------
# Literal-query variants: statically UNROLLED expressions for the serve
# path where one side is a driver-known Python list. The higher-order
# forms above (zip_with/aggregate) are CodegenFallback in Spark — the
# plan says `*(n) Project` but the lambda chain inside evaluates
# INTERPRETED, per element, through megamorphic Expression.eval call
# sites. Measured on a 1M x 64 corpus (BASELINE.md r15): the HOF cosine
# scan is bimodal, 13 <-> 584 process-tree cpu-s on byte-identical
# trials (GC and JIT-compile time both trivial — the storms are HotSpot
# deopt/recompile cycles on those megamorphic sites), while the
# unrolled form is flat. Unrolling replaces the lambda chain with
# dim-many try_element_at + multiply-add terms that whole-stage codegen
# compiles like any other arithmetic — stable trial-to-trial, no Arrow,
# no Python workers.
#
# Bit-identity with the HOF forms (so oracle hashes cannot move): every
# fold below runs in the SAME left-to-right IEEE-double order as the
# aggregate() it replaces, and the query-side norm is folded in Python
# floats (IEEE doubles) in that same order. Equality is pinned by
# tests/test_vector.py::test_literal_scores_bit_identical.
#
# Semantics at the edges: a corpus row SHORTER than the query yields
# NULL either way (try_element_at past the end is NULL and poisons the
# sum, exactly like zip_with's NULL padding). A row LONGER than the
# query diverges — the HOF form NULLs (zip_with pads the query side),
# the unrolled form scores the first dim elements — so callers gate on
# uniform-dim corpora (every serve corpus here is); _LITERAL_DIM_CAP
# bounds the expression tree (past it, fall back to the HOF form
# rather than stress Janino's method-size splitter).
# ---------------------------------------------------------------------------

_LITERAL_DIM_CAP = 512


def _q_norm(qs: list[float]) -> float:
    import math

    acc = 0.0
    for x in qs:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def dot_product_literal(a: Column | str, qs: list[float]) -> Column:
    """``dot_product(a, lit(qs))`` unrolled to codegen-able terms:
    ((0.0 + a[1]*q0) + a[2]*q1) + ... — the aggregate()'s own fold
    order."""
    a = F.col(a) if isinstance(a, str) else a
    dot = F.lit(0.0)
    for i, qv in enumerate(qs):
        dot = dot + F.try_element_at(a, F.lit(i + 1)).cast("double") * F.lit(
            float(qv)
        )
    return dot


def cosine_similarity_literal(a: Column | str, qs: list[float]) -> Column:
    """``cosine_similarity(a, lit(qs))`` unrolled; the query norm is
    a Python-folded constant (same IEEE order), the row norm unrolls
    over the query's dim (uniform-dim corpora only — see module
    comment)."""
    a = F.col(a) if isinstance(a, str) else a
    dot = F.lit(0.0)
    nrm = F.lit(0.0)
    for i, qv in enumerate(qs):
        e = F.try_element_at(a, F.lit(i + 1)).cast("double")
        dot = dot + e * F.lit(float(qv))
        nrm = nrm + e * e
    return dot / (F.sqrt(nrm) * F.lit(_q_norm(qs)))


def l2_distance_literal(a: Column | str, qs: list[float]) -> Column:
    """``l2_distance(a, lit(qs))`` unrolled — (a[i]-qi)^2 summed in
    the zip_with/aggregate fold order."""
    a = F.col(a) if isinstance(a, str) else a
    acc = F.lit(0.0)
    for i, qv in enumerate(qs):
        d = F.try_element_at(a, F.lit(i + 1)).cast("double") - F.lit(float(qv))
        acc = acc + d * d
    return F.sqrt(acc)


def hamming_distance_literal(x: Column | str, words: list[int]) -> Column:
    """``hamming_distance(x, lit(words))`` unrolled: popcount(xor)
    per packed word, summed in fold order with the HOF form's
    coalesce-to-0 on missing words."""
    x = F.col(x) if isinstance(x, str) else x
    acc = F.lit(0)
    for i, w in enumerate(words):
        term = F.bit_count(
            F.try_element_at(x, F.lit(i + 1)).bitwiseXOR(
                F.lit(int(w)).cast("long")
            )
        )
        acc = acc + F.coalesce(term, F.lit(0))
    return acc


def maxabs_scale(a: Column | str) -> Column:
    """Per-vector max-abs — the scale factor for symmetric int8
    quantization."""
    a = F.col(a) if isinstance(a, str) else a
    return F.array_max(F.transform(a, lambda x: F.abs(_as_double(x))))


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """Symmetric int8 quantization: q_i = floor(x_i/scale*127 + 0.5),
    so values land in [-127, 127] (zero vectors quantize to zeros).
    floor(v + 0.5) rather than round() because round-half tie rules
    differ across engines while floor is IEEE-exact everywhere.

    The scale story: ARRAY<FLOAT> → ARRAY<TINYINT>+1 double cuts
    embedding storage ~4x (100 TB → ~25 TB at rest), and scan+filter
    pipelines decode only when distance math needs it. Dequantized
    error is bounded by scale/254 per element."""
    a = F.col(a) if isinstance(a, str) else a
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    return F.transform(
        a, lambda x: F.floor(_as_double(x) / safe * 127.0 + 0.5).cast("byte")
    )


def dequantize_int8(q: Column | str, scale: Column) -> Column:
    q = F.col(q) if isinstance(q, str) else q
    return F.transform(q, lambda v: _as_double(v) * scale / 127.0)


def maxsim_score(doc: Column | str, query: Column | str, m: int) -> Column:
    """Late-interaction (ColBERT-style) MaxSim: both vectors are
    treated as ``m`` contiguous sub-vectors ("token" slots), and the
    score is sum over QUERY slots of the max cosine against any DOC
    slot. Captures partial/many-to-one matches a single pooled cosine
    flattens away. Pure Catalyst HOF expression — no UDF, no shuffle;
    at production scale pre-split the slots into columns at ingest
    (``maxsim_presplit_slots``) so the inner lambda is not re-sliced
    per pair.

    Assumes each array's size is divisible by ``m`` (trailing
    elements of a non-divisible array are silently dropped by the
    integer slot width). Each side's slot width is derived from ITS
    OWN size, so same-width slots never misalign whatever the total
    lengths are — but the per-slot cosine REQUIRES the two slot
    widths to be equal: ``zip_with`` pads the shorter array with
    NULLs, which poison the dot-product aggregate, so mismatched
    widths yield a NULL score (sorting nulls-last), not a truncated
    one. Keep ``size(doc) == size(query)`` (or at least equal
    ``size/m``) — the repo's queries use equal-dim corpora.

    Implementation: exactly ``maxsim_score_presplit`` over
    ``split_slots`` of each side — one definition of the slot math
    and one of the scoring lattice."""
    d = F.col(doc) if isinstance(doc, str) else doc
    q = F.col(query) if isinstance(query, str) else query
    return maxsim_score_presplit(split_slots(d, m), split_slots(q, m))


def split_slots(a: Column | str, m: int) -> Column:
    """``ARRAY<FLOAT>`` -> ``ARRAY<ARRAY<FLOAT>>`` of ``m``
    contiguous sub-vector slots — the INGEST-side half of MaxSim.
    Project this ONCE per row (at write time, or in the select
    feeding the scorer) and score with ``maxsim_score_presplit``:
    slicing then costs m slices per ROW instead of 2·m² slices per
    PAIR inside ``maxsim_score``'s inner lambda — the difference
    between O(corpus) and O(corpus × queries) slice work, which is
    the production layout the ``maxsim_score`` docstring promises.
    Same m-divisibility assumption as ``maxsim_score``."""
    a = F.col(a) if isinstance(a, str) else a
    sub_len = (F.size(a) / m).cast("int")
    return F.transform(
        F.sequence(F.lit(1), F.lit(m)),
        lambda i: F.slice(a, (i - 1) * sub_len + 1, sub_len),
    )


def maxsim_score_presplit(
    doc_slots: Column | str, query_slots: Column | str
) -> Column:
    """MaxSim over PRE-SPLIT slot arrays (``split_slots`` output):
    sum over query slots of the max cosine against any doc slot —
    identical scores to ``maxsim_score`` on the unsplit vectors, but
    the expression contains ZERO slice calls; the per-pair work is
    exactly the m×m cosine lattice. Slot COUNTS may differ between
    query and doc (the score sums over the query's slots against all
    doc slots), but slot WIDTHS must be equal — ``zip_with`` inside
    the cosine pads the shorter slot with NULLs, which poison the
    aggregate and null the whole score. Pure Catalyst HOF — no UDF,
    no shuffle."""
    d = F.col(doc_slots) if isinstance(doc_slots, str) else doc_slots
    q = F.col(query_slots) if isinstance(query_slots, str) else query_slots
    per_q = F.transform(
        q,
        lambda qs: F.array_max(
            F.transform(d, lambda ds: cosine_similarity(qs, ds))
        ),
    )
    return F.aggregate(per_q, F.lit(0.0), lambda acc, x: acc + x)


def binary_quantize(a: Column | str) -> Column:
    """1-bit (sign) quantization: ``ARRAY<FLOAT>`` ->
    ``ARRAY<BIGINT>`` of 32-bit words, bit = (x > 0), packed
    big-endian-within-word via a Horner fold (``acc*2 + bit`` — no
    shift builtin needed, and 32 bits per word keeps every value
    < 2^32 so it is overflow-exact in BOTH Spark, which would wrap
    silently at 64 bits, and DuckDB, which would raise).

    The 100 TB story: a 768-dim float32 embedding (3 KB) becomes 24
    words (192 B as BIGINTs; 96 B of true bit payload after parquet
    bit-packing) — 16-32x smaller at rest and in cache — and
    candidate generation becomes xor+popcount
    (``hamming_distance``) — the standard binary-prescreen + exact
    rerank serving shape (e.g. faiss IndexBinaryFlat front-ends).
    Sign quantization preserves angular neighborhoods: Hamming on
    sign bits estimates angle via the SimHash bound (Charikar 2002,
    STOC — same identity ``operators/dedup.simhash`` uses on text
    features). Nulls inside the vector count as <= 0 (bit 0);
    trailing positions past ``size(a)`` in the last word are 0 (the
    index is bounds-guarded BEFORE ``element_at`` — Spark 4's
    default ANSI mode raises on out-of-range element_at, so a
    dim % 32 != 0 corpus must never evaluate the overhang). A
    zero-length (or NULL-sized) input yields an EMPTY word array —
    without the guard, ``sequence(0, n_words-1)`` with n_words=0 is
    the DESCENDING [0, -1] and word -1's idx<=0 would reach
    element_at and raise under ANSI."""
    a = F.col(a) if isinstance(a, str) else a
    n = F.size(a)
    n_words = F.ceil(n / F.lit(32)).cast("int")

    def word(w: Column) -> Column:
        def bit(acc: Column, b: Column) -> Column:
            idx = (w * 32 + b + 1).cast("int")
            in_range = (idx >= 1) & (idx <= n)
            return acc * 2 + F.when(
                in_range & (F.element_at(a, F.when(in_range, idx).otherwise(F.lit(1))) > 0),
                F.lit(1),
            ).otherwise(F.lit(0)).cast("long")

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(31)), F.lit(0).cast("long"), bit
        )

    return (
        F.when(a.isNull(), F.lit(None).cast("array<bigint>"))
        .when(n_words > 0, F.transform(F.sequence(F.lit(0), n_words - 1), word))
        .otherwise(F.array().cast("array<bigint>"))
    )


def hamming_distance(x: Column | str, y: Column | str) -> Column:
    """Hamming distance between two packed bit vectors
    (``binary_quantize`` output): sum of ``bit_count(xor(word))``.
    Pure codegen — xor + popcount per word, no UDF. Arrays of
    different word counts compare over the shorter (zip_with NULLs
    are skipped via coalesce-to-0)."""
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    per_word = F.zip_with(
        x, y, lambda p, q: F.bit_count(p.bitwiseXOR(q))
    )
    return F.aggregate(
        per_word,
        F.lit(0),
        lambda acc, v: acc + F.coalesce(v, F.lit(0)),
    )
