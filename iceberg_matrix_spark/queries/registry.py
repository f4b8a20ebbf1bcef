"""Registry mapping query names → (spark, sf_dir) callables + DuckDB oracles.

Contract (driver, /root/repo/__spark_entry__.py): each query is a callable
``(SparkSession, sf_dir) -> DataFrame``; the oracle is ANSI SQL DuckDB runs
over the same parquet tables (pre-registered views). Column names must match
between the two — the comparison sorts columns by name before hashing.
Queries without an oracle get a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
F = TypeVar("F", bound=QueryFn)

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[F], F]:
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: F) -> F:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Shared oracle-SQL fragments (load-bearing parity invariants — keep ONE
# copy so a change can't silently leave some module's oracle behind)
# --------------------------------------------------------------------------

# Exact decimal sum surfaced as a double: DuckDB's decimal→double direct
# cast divides in float (inexact); routing through VARCHAR gives the
# correctly-rounded value Spark's BigDecimal.doubleValue() produces.
DEC_SUM_SQL = "CAST(CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)"

# Whitespace tokens, matching functions/text.py:tokens() exactly
# (collapse-then-trim avoids phantom empty tokens on tab/newline padding).
TOKS_SQL = "regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
