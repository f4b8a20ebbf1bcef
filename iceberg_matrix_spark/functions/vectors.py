"""Vector column functions over ``array<float|double>`` embeddings.

All pure Catalyst expressions (``zip_with`` + ``aggregate`` folds) — no
Python UDFs, so the similarity hot path stays in whole-stage codegen.

Determinism note (load-bearing for oracle parity): the fold accumulates
left-to-right in DOUBLE, which bit-matches DuckDB's
``list_cosine_similarity(CAST(a AS DOUBLE[]), CAST(b AS DOUBLE[]))``
(verified empirically — both are sequential double accumulation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    av, bv = to_double_array(a), to_double_array(b)
    return F.aggregate(
        F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column | str) -> Column:
    av = to_double_array(a)
    return F.sqrt(F.aggregate(av, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; bit-compatible with DuckDB list_cosine_similarity."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
