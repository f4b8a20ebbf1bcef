"""Constant-matrix literal columns without per-element py4j calls.

The literal codebook/plane matrices (``F.array(*[F.array(*[F.lit(x) ...``)
cost one Python→JVM round-trip PER ELEMENT: a 32×64 plane matrix is ~2,100
py4j calls ≈ 1.2 s of pure driver-side plan construction, paid on EVERY
query that embeds the matrix (measured round 11; the r7 ``_pq_books_lit``
fix removed the *Catalyst* cost of unrolled fold subtrees but kept the
per-element py4j construction). Rendering the matrix as ONE SQL array
literal and parsing it JVM-side (``F.expr``) is a single round-trip; the
parsed tree constant-folds to the identical ``Literal`` the old column
produced, so plans and results are bit-identical (pinned in
tests/test_plans.py: repr round-trip + equality vs the per-element form).

Exactness: ``repr(float)`` emits the shortest decimal that round-trips
under correctly-rounded parsing, and Spark's double literal parse
(Java ``Double.parseDouble``) is correctly rounded — so every finite
double survives bit-exactly. Non-finite values never occur in these
matrices (asserted here, loudly).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column


def _render_double(x: float) -> str:
    if not math.isfinite(x):
        raise ValueError(f"non-finite literal {x!r} cannot round-trip via SQL")
    return repr(float(x)) + "D"


def double_vector_sql(vec: list[float]) -> str:
    return "array(" + ",".join(_render_double(x) for x in vec) + ")"


def double_matrix_sql(mat: list[list[float]]) -> str:
    return "array(" + ",".join(double_vector_sql(v) for v in mat) + ")"


def const_double_matrix(mat: list[list[float]]) -> Column:
    """``array<array<double>>`` literal column, one py4j call."""
    return F.expr(double_matrix_sql(mat))


def const_double_cube(cube: list[list[list[float]]]) -> Column:
    """``array<array<array<double>>>`` literal column (PQ codebooks)."""
    return F.expr("array(" + ",".join(double_matrix_sql(m) for m in cube) + ")")


def const_long_array(vals: list[int]) -> Column:
    """``array<bigint>`` literal column, one py4j call."""
    return F.expr(
        "array(" + ",".join(str(int(v)) + "L" for v in vals) + ")"
    )
