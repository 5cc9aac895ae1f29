"""Corpus-independent double-ingest guard: a Bloom filter over an
index's indexed-id set, kept as a binary sidecar next to the index's
JSON sidecar.

Why: ``band_index_append`` and ``ivf_append`` guard replays by
anti-joining each incoming batch against the FULL persisted id set —
one column, but corpus-sized: at 10^9 indexed docs that is a multi-GB
scan per 2k-doc micro-batch, the same cost class the bucket_keys
append shed in r10. With the Bloom sidecar the guard becomes:

1. probe the batch's ids against the filter (one Arrow-batched pass
   over the BATCH — the filter rides along as a Spark broadcast,
   corpus IO: zero);
2. ids the filter rejects are DEFINITELY new (a Bloom filter has no
   false negatives) — no exact check needed;
3. ids the filter accepts (true replays + false positives) fall back
   to the exact anti-join, restricted to that accepted subset.

At steady state (genuinely new ids) the accepted set is ~fp_rate *
|batch| ~ 0 and the append touches no corpus data at all; a full
replay pays one exact scan — rare by construction and always correct.

Durability contract (why the filter is written BEFORE the data):
correctness requires the committed filter to be a SUPERSET of the
indexed ids — a missing id would make its replay skip the exact check
and double-ingest. Supersets are safe (extra bits only cause false
positives, absorbed by the exact fallback), so every append merges
the WHOLE batch's ids into the filter and persists it before the
first data write: a crash at any later point leaves the replayed
batch bloom-positive, which routes it into the exact/heal path the
appends already have.

Filter math: standard Bloom with double hashing (Kirsch &
Mitzenmacher 2006): positions ``(h1 + i*h2) mod m`` for ``i < k``,
with ``h1 = xxhash64(id)``, ``h2 = xxhash64(id, salt)`` — both
computed JVM-side by Catalyst on BOTH the build and probe paths, so
there is exactly one hash implementation to keep consistent. The
driver only ORs 64-bit words. At 10 bits/id the false-positive rate
is ~0.8% (k=7); sizing is recorded in the index sidecar and the
filter is resized from the current id count at compaction.

Scale note: filter bytes are proportional to CAPACITY, not to the
batch — 10^9 ids at 10 bits/id is ~1.2 GB, which is driver-memory
and broadcast-sized, not scan-sized; shard by id-hash prefix before
that point if driver memory is the binding constraint. The probe
cost per batch is |batch| rows through one vectorized pandas UDF.

Reference provenance: the reference's hydration step (sas:126-193)
re-runs are guarded only by Chroma's upsert semantics; a Spark
ingest loop owns its own exactly-once story, and this is the piece
that keeps it corpus-independent.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_MAGIC = b"SGIDBLM1"
_SALT = "spark-graft-idguard-h2"
HASH_SPEC = "xxhash64-double-v1"
# design density of every id-guard filter (bloom_params default, the
# audit's capacity math, and the oracle's documented sizing formula
# all derive from this one constant)
BITS_PER_ID = 10


def batch_digest(df: DataFrame, id_col: str) -> str:
    """Order-independent content identity of a batch's id set (count
    + xor of per-id hashes under TWO independent seeds) — one tiny
    aggregation, stable across replay attempts. Streaming callers
    fold this into their append tags so a tag can never collide
    across DIFFERENT content: a restarted stream (fresh checkpoint,
    same sink/batch ids) must gate as a FRESH batch, not as a replay
    of the old run's batch — replay-as-equality-of-(tag, content),
    never tag alone. A single xor is a weak set hash (two disjoint
    pairs with equal pairwise xor collide — constructible); colliding
    BOTH independently-seeded xors simultaneously is not. Two xors
    rather than a modular sum because BIGINT sums overflow-raise
    under ANSI; xor cannot. ``batch_digests`` additionally returns
    the pre-r12 single-xor LEGACY form (derived from the SAME one
    aggregation) so streaming callers can match a batch recorded by
    the old format across a code upgrade — without it, a checkpoint
    replay spanning the upgrade would gate as a fresh batch and
    silently flip its republished verdicts (the stores stay
    exactly-once either way; this is about verdict stability)."""
    return batch_digests(df, id_col)[0]


def batch_digests(df: DataFrame, id_col: str) -> tuple[str, str]:
    """(current two-seed digest, legacy single-xor digest) from ONE
    aggregation — see ``batch_digest`` for the contract."""
    r = (
        df.select(F.col(id_col).cast("string").alias("_s"))
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.expr("bit_xor(xxhash64(_s))").alias("x"),
            F.expr(
                "bit_xor(xxhash64(_s, 'spark-graft-digest-h2'))"
            ).alias("x2"),
        )
        .first()
    )
    return f"{r['c']}:{r['x']}:{r['x2']}", f"{r['c']}:{r['x']}"


def bloom_params(
    expected_ids: int, *, bits_per_id: int | None = None
) -> tuple[int, int]:
    """Size a filter for ``expected_ids`` at ``bits_per_id``: returns
    (m bits, k hashes) with m rounded up to whole 64-bit words and k
    the optimal ``m/n * ln 2`` clamped to [1, 8]. The floor (2^16
    bits = 8 KiB) keeps tiny test indexes honest without special
    cases."""
    if bits_per_id is None:
        bits_per_id = BITS_PER_ID
    expected = max(int(expected_ids), 1)
    m = max(1 << 16, expected * bits_per_id)
    m = (m + 63) // 64 * 64
    k = max(1, min(8, round(m / expected * 0.6931)))
    return m, k


def _bit_positions(id_str: Column, m: int, k: int) -> list[Column]:
    """The k probe positions for one id, as Catalyst expressions —
    the single source of truth for the hash family (build and probe
    both call this; the pandas probe only tests bits). ``h1``/``h2``
    are reduced mod m BEFORE combining so ``b1 + i*step < 9m`` never
    overflows a BIGINT (ANSI mode raises on overflow)."""
    b1 = F.pmod(F.xxhash64(id_str), F.lit(m))
    step = F.pmod(F.xxhash64(id_str, F.lit(_SALT)), F.lit(m))
    return [F.pmod(b1 + F.lit(i) * step, F.lit(m)) for i in range(k)]


def bloom_build(df: DataFrame, id_str: Column, m: int, k: int) -> np.ndarray:
    """Aggregate a DataFrame's ids into filter words: explode each
    id's k bit positions, fold them into (word index, OR of bit
    values) with one map-side-combinable ``bit_or`` groupBy, and
    assemble the (sparse) result into a dense word array on the
    driver. The collect is bounded by the FILTER size (m/64 words),
    never by the row count."""
    pos = df.select(
        F.explode(F.array(*_bit_positions(id_str, m, k))).alias("pos")
    )
    # Arrow transfer, not .collect(): the result is up to m/64 rows
    # (625k words for a 4M-id filter), and row-at-a-time py4j
    # deserialization of that was the write path's single biggest
    # line item (~4 s at 1M ids; ~1 s via Arrow).
    pdf = (
        pos.select(
            F.shiftright("pos", 6).alias("w"),
            # SQL form: pyspark's shiftleft() only takes a literal count
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("v"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(v)").alias("v"))
        .toPandas()
    )
    words = np.zeros(m // 64, dtype=np.uint64)
    if len(pdf):
        idx = pdf["w"].to_numpy(dtype=np.int64)
        vals = pdf["v"].to_numpy(dtype=np.int64).view(np.uint64)
        words[idx] = vals
    return words


def bloom_or(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.shape != b.shape:
        raise ValueError(
            f"cannot merge Bloom filters of different sizes "
            f"({a.shape} vs {b.shape}); rebuild with one capacity"
        )
    return np.bitwise_or(a, b)


def bloom_write(p: str, fname: str, words: np.ndarray, m: int, k: int) -> None:
    """Durable binary write (temp + fsync + rename), same discipline
    as the JSON sidecar writer: a reader never sees a torn filter."""
    tmp = os.path.join(p, fname + ".tmp")
    header = _MAGIC + np.array([m, k], dtype="<u8").tobytes()
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(words.astype("<u8").tobytes())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(p, fname))
    try:
        dfd = os.open(p, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass


def bloom_read(p: str, fname: str) -> tuple[np.ndarray, int, int]:
    with open(os.path.join(p, fname), "rb") as f:
        raw = f.read()
    if raw[:8] != _MAGIC:
        raise ValueError(f"{fname!r} is not an id-guard Bloom sidecar")
    m, k = (int(x) for x in np.frombuffer(raw[8:24], dtype="<u8"))
    words = np.frombuffer(raw[24:], dtype="<u8").astype(np.uint64)
    if words.size != m // 64:
        raise ValueError(
            f"{fname!r} is truncated: {words.size} words for m={m}"
        )
    return words, m, k


def bloom_might_contain(
    df: DataFrame,
    id_str: Column,
    words: np.ndarray,
    m: int,
    k: int,
    *,
    broadcast=None,
) -> Column:
    """Boolean membership-probe column: true = the id MIGHT be
    indexed (replay or false positive — confirm with the exact
    fallback), false = DEFINITELY new. Bit positions are computed
    JVM-side by the same expressions the build used; the filter ships
    to executors once as a Spark broadcast and the test itself is one
    vectorized numpy pass per Arrow batch — over the BATCH, never the
    corpus. Pass ``broadcast`` (a ``sc.broadcast`` of
    ``words.tobytes()``) to keep the broadcast's lifecycle in the
    caller's hands — ``bloom_split`` does, and unpersists it as soon
    as its eager checkpoint has materialized, so a long-running
    ingest loop never accumulates one filter-sized broadcast per
    micro-batch (at the module's 10^9-id design point each is
    ~1.2 GB)."""
    bc = (
        broadcast
        if broadcast is not None
        else df.sparkSession.sparkContext.broadcast(words.tobytes())
    )

    @pandas_udf("boolean")
    def _mc(pos: pd.Series) -> pd.Series:
        w = np.frombuffer(bc.value, dtype=np.uint64)
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        P = np.stack(pos.to_numpy())  # (n, k) int64, all in [0, m)
        bits = (w[P >> 6] >> (P & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    return _mc(F.array(*_bit_positions(id_str, m, k)))


def bloom_split(
    df: DataFrame, p: str, bloom_meta: dict, id_name: str
) -> tuple[DataFrame, DataFrame | None, tuple]:
    """Prescreen a (deduplicated) batch against the persisted filter:
    returns ``(definitely_new, maybe, state)``. ``definitely_new``
    rows are filter-negative — indexable with zero corpus IO;
    ``maybe`` (None when EVERY id is negative, the steady-state
    common case) is the filter-positive subset the caller must settle
    with its exact anti-join; ``state = (words, m, k)`` feeds
    ``bloom_extend``. The batch is materialized once
    (localCheckpoint) so the probe never re-executes upstream
    lineage."""
    words, m, k = bloom_read(p, bloom_meta["location"])
    bc = df.sparkSession.sparkContext.broadcast(words.tobytes())
    probed = df.withColumn(
        "_ig_maybe",
        bloom_might_contain(
            df, F.col(id_name).cast("string"), words, m, k, broadcast=bc
        ),
    ).localCheckpoint(eager=True)
    # the eager checkpoint has materialized every probe result — drop
    # the filter-sized broadcast NOW, or a foreachBatch loop
    # accumulates one per micro-batch until Python GC
    bc.unpersist()
    maybe = probed.filter("_ig_maybe").drop("_ig_maybe")
    if not maybe.take(1):
        return probed.drop("_ig_maybe"), None, (words, m, k)
    return (
        probed.filter(~F.col("_ig_maybe")).drop("_ig_maybe"),
        maybe,
        (words, m, k),
    )


def bloom_extend(
    p: str,
    meta: dict,
    state: tuple | None,
    batch_ids: DataFrame,
    fallback_ids: DataFrame | None = None,
) -> None:
    """Fold a batch's WHOLE id set into the index's filter and
    persist it to a fresh versioned file, setting ``meta['id_bloom']``
    (the caller commits the sidecar). Call BEFORE the first data
    write: a committed filter must stay a superset of the indexed ids
    — supersets are safe (false positives fall back to the exact
    check), a subset would let a replay double-ingest. ``state`` is
    ``bloom_split``'s loaded filter; for a pre-filter index pass
    ``state=None`` and ``fallback_ids`` (the existing indexed ids) —
    the one-time migration scan that makes every later append
    corpus-independent. Both id frames must be single-column,
    string-typed."""
    bcol = F.col(batch_ids.columns[0])
    prev_bloom = meta.get("id_bloom") or {}
    if state is not None:
        words, m, k = state
        words = bloom_or(words, bloom_build(batch_ids, bcol, m, k))
        # merging into the SAME (m, k): capacity is a property of the
        # sizing moment and carries forward unchanged (legacy sidecars
        # without one fall back to the design-density equivalent)
        capacity = int(prev_bloom.get("capacity") or m // BITS_PER_ID)
    else:
        all_ids = (
            fallback_ids.toDF(batch_ids.columns[0])
            .unionByName(batch_ids)
            .distinct()
        )
        capacity = max(4 * all_ids.count(), 1)
        m, k = bloom_params(capacity)
        words = bloom_build(all_ids, bcol, m, k)
    fname = fresh_bloom_file(p, prev_bloom.get("location"))
    bloom_write(p, fname, words, m, k)
    meta["id_bloom"] = {
        "location": fname,
        "m": m,
        "k": k,
        "capacity": capacity,
        "hash": HASH_SPEC,
    }


def fresh_bloom_file(
    p: str, prev: str | None = None, base: str = "ids_bloom"
) -> str:
    """Next versioned filter file name (``ids_bloom_v1.bin``, ...) —
    appends never overwrite the filter a concurrent reader may be
    loading; the sidecar's pointer is swapped by the caller's commit.
    ``prev`` (the sidecar's CURRENT location) makes versions
    MONOTONIC: GC removes superseded files, so a filesystem scan
    alone would recycle version names and a reader holding an older
    sidecar could open a same-named file with different content."""
    v = 0
    if prev:
        try:
            v = int(prev.rsplit("_v", 1)[1].split(".")[0])
        except (IndexError, ValueError):
            v = 0
    v += 1
    while os.path.exists(os.path.join(p, f"{base}_v{v}.bin")):
        v += 1
    return f"{base}_v{v}.bin"


# every index sidecar that may reference an id-guard filter: an IVF
# and an IVF-PQ index (and in principle a band index) can legally
# cohabit one directory — each has its own sidecar name and
# collision-free versioned data dirs — so GC must keep EVERY
# sidecar's committed filter, not just the calling index's.
_SIDECARS = ("ivf_index.json", "ivf_pq_index.json", "band_index.json")


def filter_usable(bloom_meta: dict | None) -> bool:
    """A filter is only probe-safe when its recorded hash spec matches
    this module's: probing a filter built by a DIFFERENT hash family
    yields false NEGATIVES — ids wrongly classified 'definitely new'
    skip the exact check and double-ingest, the one failure mode the
    durability contract forbids. Callers treat an unusable filter
    exactly like a missing one (exact path now, fresh filter rebuilt
    by the next append/compact)."""
    return bool(bloom_meta) and bloom_meta.get("hash") == HASH_SPEC


def rebuild_filter(
    ids_df: DataFrame,
    id_str: Column,
    p: str,
    prev_location: str | None,
    *,
    expected_ids: int | None = None,
) -> dict:
    """Build-from-scratch path shared by every index write and
    compaction: size a fresh filter from the id count (4x headroom
    for appends unless ``expected_ids`` overrides), aggregate, write
    it durably under the next monotonic version after
    ``prev_location``, and return the sidecar ``id_bloom`` dict —
    ONE implementation, so sizing or hash-spec changes cannot drift
    between the band / IVF / IVF-PQ lifecycles. The id count the
    filter was SIZED for is recorded as ``capacity`` — audits report
    consumption against it directly, instead of re-deriving it from
    the global density constant (wrong for ``expected_ids``-sized
    filters, whose m/k no longer follow that density)."""
    capacity = (
        int(expected_ids) if expected_ids else max(4 * ids_df.count(), 1)
    )
    m, k = bloom_params(capacity)
    words = bloom_build(ids_df, id_str, m, k)
    fname = fresh_bloom_file(p, prev_location)
    bloom_write(p, fname, words, m, k)
    return {
        "location": fname,
        "m": m,
        "k": k,
        "capacity": capacity,
        "hash": HASH_SPEC,
    }


def gc_bloom_files(p: str, keep: set, base: str = "ids_bloom") -> None:
    """Remove superseded filter files: everything versioned under
    ``base`` that neither the caller's keep set NOR any committed
    sidecar in the directory references (two index kinds can cohabit
    one directory; deleting a sibling's filter would brick its
    appends). Run only after a sidecar commit; a crash before it
    leaks a file, never breaks a reader."""
    import json

    keep = set(keep)
    for sc in _SIDECARS:
        fp = os.path.join(p, sc)
        if os.path.exists(fp):
            try:
                with open(fp) as f:
                    loc = (json.load(f).get("id_bloom") or {}).get("location")
            except (OSError, ValueError):
                continue
            if loc:
                keep.add(loc)
    for fname in os.listdir(p):
        if (
            fname.startswith(base + "_v")
            and fname.endswith(".bin")
            and fname not in keep
        ):
            try:
                os.remove(os.path.join(p, fname))
            except OSError:
                pass


__all__ = [
    "BITS_PER_ID",
    "HASH_SPEC",
    "batch_digest",
    "batch_digests",
    "bloom_params",
    "bloom_build",
    "bloom_or",
    "bloom_read",
    "bloom_write",
    "bloom_might_contain",
    "bloom_split",
    "bloom_extend",
    "filter_usable",
    "rebuild_filter",
    "fresh_bloom_file",
    "gc_bloom_files",
]
