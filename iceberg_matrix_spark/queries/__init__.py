"""Query inventory: every operator exposed to the correctness harness.

Importing this package populates the registry from all query modules.
"""

from iceberg_matrix_spark.queries.registry import ORACLES, QUERIES, register

# Modules self-register on import (order defines report order).
from iceberg_matrix_spark.queries import relational  # noqa: E402,F401
from iceberg_matrix_spark.queries import sqlcov as _sqlcov  # noqa: E402,F401
from iceberg_matrix_spark.queries import matrix as _matrix  # noqa: E402,F401
from iceberg_matrix_spark.queries import streaming_q as _streaming  # noqa: E402,F401
from iceberg_matrix_spark.operators import text as _text  # noqa: E402,F401
from iceberg_matrix_spark.operators import dedup as _dedup  # noqa: E402,F401
from iceberg_matrix_spark.operators import graph as _graph  # noqa: E402,F401
from iceberg_matrix_spark.operators import pipeline as _pipeline  # noqa: E402,F401
from iceberg_matrix_spark.operators import similarity as _similarity  # noqa: E402,F401
from iceberg_matrix_spark.operators import multimodal as _multimodal  # noqa: E402,F401
from iceberg_matrix_spark.operators import scale as _scale  # noqa: E402,F401
from iceberg_matrix_spark.operators import asof as _asof  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
