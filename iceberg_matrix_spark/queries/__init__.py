"""Query inventory: every operator exposed to the correctness harness.

Accessing ``QUERIES``/``ORACLES`` populates the registry from all query
modules on first use (PEP 562 lazy export). Population must NOT happen at
package-import time: operator modules import
``iceberg_matrix_spark.queries.registry``, which executes this __init__ —
if this __init__ eagerly imported the operator modules back, any direct
``import iceberg_matrix_spark.operators.X`` would re-enter X mid-
initialization (circular import) whenever another query module depends
on it (e.g. graph -> dedup).
"""

from iceberg_matrix_spark.queries.registry import register  # noqa: F401

_POPULATED = False


def _populate() -> None:
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    # Modules self-register on import (order defines report order).
    from iceberg_matrix_spark.operators import asof  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import dedup  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import fuzzy  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import graph  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import lines  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import multimodal  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import pipeline  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import retrieval  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import scale  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import similarity  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import spans  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import text  # noqa: F401, PLC0415
    from iceberg_matrix_spark.operators import timeseries  # noqa: F401, PLC0415
    from iceberg_matrix_spark.queries import matrix  # noqa: F401, PLC0415
    from iceberg_matrix_spark.queries import relational  # noqa: F401, PLC0415
    from iceberg_matrix_spark.queries import sqlcov  # noqa: F401, PLC0415
    from iceberg_matrix_spark.queries import tpch_breadth  # noqa: F401, PLC0415
    from iceberg_matrix_spark.queries import udf_surface  # noqa: F401, PLC0415
    from iceberg_matrix_spark.queries import streaming_q  # noqa: F401, PLC0415


def __getattr__(name: str):
    if name in ("QUERIES", "ORACLES"):
        _populate()
        from iceberg_matrix_spark.queries import registry  # noqa: PLC0415

        return getattr(registry, name)
    raise AttributeError(name)


__all__ = ["QUERIES", "ORACLES", "register"]
