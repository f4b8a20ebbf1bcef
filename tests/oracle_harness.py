"""Local replica of the driver's Spark-vs-DuckDB comparison.

The driver sorts result columns by name, then order-insensitively
value-hashes rows. We replicate that strictly: sorted columns, sorted
rows, EXACT value equality (no float tolerance) — local green implies
driver green under any reasonable hashing.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pandas.testing import assert_frame_equal
from pyspark.sql import SparkSession

from iceberg_matrix_spark.sources.testdata import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            pdf[c] = s.map(lambda v: None if v is None else str(v))
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), na_position="first")
    return pdf.reset_index(drop=True)


def assert_query_matches_oracle(
    spark: SparkSession, query_fn, oracle_sql: str, sf_dir: str
) -> None:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(oracle_sql, sf_dir)
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert_frame_equal(
        normalize(spark_pdf),
        normalize(oracle_pdf),
        check_dtype=False,
        check_exact=True,
    )
