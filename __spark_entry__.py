"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the
``vector_databases___hydrate_chroma_db_collection_spark`` package;
this module is a thin adapter over its query registry.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from vector_databases___hydrate_chroma_db_collection_spark import queries as _registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exact top-5 cosine neighbors of document 1's embedding — the
    retrieval query the reference hydrates Chroma to serve
    (reference README.md:5).
    """
    return _registry.QUERIES["knn_top5_cosine"](spark, SMOKE_SF_DIR)


# The driver checks a budgeted subset per round (50/round so far) in
# iteration order, so queries() sorts riskiest-first from the committed
# CORRECTNESS_r{N}.json artifacts themselves (no hand-frozen sets):
#   1. failed-last-check — latest driver row is red (err or any mismatch);
#   2. never-checked — no driver row in any round yet;
#   3. green — least-recently-checked first, so every entry's latest row
#      stays fresh across rounds.
# Local parity for all entries is committed in PARITY_LOCAL.json.
def _driver_history() -> dict[str, tuple[int, bool]]:
    """name -> (latest round checked, latest row green?) from CORRECTNESS files."""
    history: dict[str, tuple[int, bool]] = {}
    root = Path(__file__).resolve().parent
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            green = bool(
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                # rows-only checks (no oracle SQL) report hash_match=None;
                # treat them as green unless explicitly False.
                and row.get("hash_match") is not False
            )
            prev = history.get(name)
            if prev is None or rnd >= prev[0]:
                history[name] = (rnd, green)
    return history


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    riskiest-first: failed-last-check, then never-checked, then stalest."""
    history = _driver_history()

    def rank(item: tuple[str, object]) -> tuple[int, int]:
        name = item[0]
        if name not in history:
            return (1, 0)
        rnd, green = history[name]
        return (2, rnd) if green else (0, rnd)

    return dict(sorted(_registry.QUERIES.items(), key=rank))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-checkable query."""
    return dict(_registry.ORACLES)
