"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``iceberg_matrix_spark`` package; this module
only adapts its registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_matrix_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _driver_history() -> tuple[dict[str, int], set[str]]:
    """(latest_green_round, seen) across prior CORRECTNESS_r*.json files.

    The driver samples ~50 of the registered queries per round following
    dict order, so ``queries()`` orders by certification staleness:
    formerly-red rows (seen but never green) FIRST, then never-sampled
    rows, then green rows ascending by the LATEST round they were green —
    so re-certification rotates through the registry instead of pinning
    the same front block every round.
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest_green: dict[str, int] = {}
    seen: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            seen.add(name)
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                latest_green[name] = max(latest_green.get(name, 0), rnd)
    return latest_green, seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered least-recently-certified first: formerly-red rows, then
    never-sampled rows, then green rows by staleness (oldest green round
    first; registry order breaks ties). See _driver_history.
    """
    latest_green, seen = _driver_history()
    order = {n: i for i, n in enumerate(QUERIES)}
    names = sorted(
        QUERIES,
        key=lambda n: (
            n in latest_green,        # red/never-sampled before any green
            n not in seen,            # formerly-red before never-sampled
            latest_green.get(n, 0),   # stalest green first
            order[n],
        ),
    )
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return dict(ORACLES)
