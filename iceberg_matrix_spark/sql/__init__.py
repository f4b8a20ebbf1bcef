"""SQL string front-end over IceLite (see facade.py)."""

from iceberg_matrix_spark.sql.facade import IceLiteSQL, UnsupportedSQLError

__all__ = ["IceLiteSQL", "UnsupportedSQLError"]
