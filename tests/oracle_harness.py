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


def _type_class(s: pd.Series) -> str:
    """Coarse type class used to catch driver-hash type mismatches locally.

    The driver value-hashes typed Arrow values, so Spark BIGINT vs DuckDB
    HUGEINT/DECIMAL hash differently even when numerically equal (this bit
    q_conditional_agg in round 1). Classify each column and require the
    classes to match — numeric width within a class is fine, crossing
    int/float/decimal is not.
    """
    import datetime
    import decimal

    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "timestamp"
    non_null = s.dropna()
    if non_null.empty:
        return "empty"
    v = non_null.iloc[0]
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, bytes):
        return "bytes"
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "array"
    return type(v).__name__


def assert_type_classes_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> None:
    for c in sorted(spark_pdf.columns):
        sc, oc = _type_class(spark_pdf[c]), _type_class(oracle_pdf[c])
        if "empty" in (sc, oc):
            continue
        assert sc == oc, (
            f"column {c!r}: spark type class {sc!r} != oracle {oc!r} "
            f"(spark dtype {spark_pdf[c].dtype}, oracle dtype {oracle_pdf[c].dtype}) — "
            f"the driver's value-hash would mismatch; CAST the oracle column"
        )


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
    assert_type_classes_match(spark_pdf, oracle_pdf)
    assert_frame_equal(
        normalize(spark_pdf),
        normalize(oracle_pdf),
        check_dtype=False,
        check_exact=True,
    )
