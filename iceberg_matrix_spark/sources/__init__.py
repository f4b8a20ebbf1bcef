from iceberg_matrix_spark.sources.batch_source import register_batch_source
from iceberg_matrix_spark.sources.testdata import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_batch_source", "register_views"]
