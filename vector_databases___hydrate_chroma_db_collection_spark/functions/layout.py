"""Data-layout keys: Z-order (Morton) interleaving for multi-dim
clustering.

Sorting or range-partitioning 100 TB by a single column only prunes
scans filtered on THAT column; writing files clustered by a Z-order
key over the 2-4 most-filtered columns gives every one of them
locality, so min/max footer stats (or a sort-partitioned layout) prune
on any of the interleaved dimensions — the technique behind
Databricks' OPTIMIZE ZORDER BY and Iceberg's zorder rewrite strategy.

The key is a pure integer expression (shift/mask/add), fully inside
whole-stage codegen and reproducible in any engine with 64-bit
integer ops — no UDF, no driver work.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column.

    Bit ``i`` of column ``j`` lands at output position ``i*n + j``
    (n = number of columns), so equal prefixes of the key correspond
    to aligned hyper-rectangles in the input space. ``n * bits`` must
    fit in 63 bits. Columns must already be non-negative integers —
    map/clamp domain values first (e.g. ``pmod``, cents, epoch
    buckets)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed int64")
    masked = [c.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1)) for c in cols]
    terms = [
        F.shiftright(c, i).bitwiseAND(F.lit(1)) * F.lit(1 << (i * n + j))
        for j, c in enumerate(masked)
        for i in range(bits)
    ]
    return reduce(add, terms)


def zorder_key_sql(exprs: list[str], *, bits: int = 16) -> str:
    """The identical key as portable SQL text (DuckDB/ANSI `>>`/`&`),
    for oracle twins and cross-engine layout jobs."""
    n = len(exprs)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed int64")
    # fully parenthesized: engines disagree on &/>> precedence
    parts = [
        f"((((({e}) & {(1 << bits) - 1}) >> {i}) & 1) * {1 << (i * n + j)})"
        for j, e in enumerate(exprs)
        for i in range(bits)
    ]
    return "(" + " + ".join(parts) + ")"
