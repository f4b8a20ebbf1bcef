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
