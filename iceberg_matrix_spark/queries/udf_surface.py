"""The Python-UDF surface, done the only way it should be at 100 TB:
Arrow-vectorized pandas UDFs (SURVEY §2.17 / SNIPPETS [3] pattern).

Three UDF shapes exist in Spark; this repo exercises all of them:
- mapInPandas (batch iterator) → operators/multimodal.py
- applyInPandasWithState (stateful streaming) → streaming/windows.py
- scalar + grouped-aggregate pandas_udf → HERE, oracle-checked.

The registered UDFs compute exact integer results (byte counts, integer
sums), so DuckDB reproduces them bit-for-bit — proving the Arrow
transfer itself is lossless, not just "approximately working". Row-at-a-
time Python UDFs appear nowhere in this repo; the 10-100× Arrow batching
advantage is the point (pyspark_guide.md).

The UDFs are constructed inside the query function: ``@pandas_udf``
resolves its return type against the ACTIVE session, so module-level
decoration would break imports in session-less processes (the driver
imports the registry before building Spark).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — must be module-global: pandas_udf
# resolves the (stringified, PEP 563) type hints via the function's
# __globals__, so 'pd.Series' must be importable from here
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_matrix_spark.queries.registry import register
from iceberg_matrix_spark.sources.testdata import load_table


def _make_udfs():
    import re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def normalized_len(texts: pd.Series) -> pd.Series:
        # scalar pandas UDF: length of whitespace-collapsed, trimmed,
        # lowercased text — vectorized over each Arrow batch. re.ASCII:
        # Python's \s is Unicode-wide by default, but the DuckDB oracle's
        # RE2 \s (and the JVM regexes everywhere else in this repo) are
        # ASCII-only — the classes must agree on non-ASCII whitespace
        ws = re.compile(r"\s+", re.ASCII)
        # .strip(" ") not .strip(): bare strip is Unicode-wide, DuckDB's
        # trim() removes 0x20 spaces only
        return texts.map(lambda t: len(ws.sub(" ", t).strip(" ").lower()))

    @pandas_udf("long")
    def sum_of_squares(v: pd.Series) -> int:  # GROUPED_AGG: Series -> scalar
        # grouped-aggregate pandas UDF: exact int64 sum of squares
        return int((v.astype("int64") ** 2).sum())

    @pandas_udf("long")
    def int_sum(v: pd.Series) -> int:  # GROUPED_AGG
        return int(v.astype("int64").sum())

    return normalized_len, sum_of_squares, int_sum


@register(
    "q_pandas_udf_surface",
    oracle="""
    WITH t AS (
      SELECT lang,
             length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS nlen,
             len(regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_toks
      FROM documents
    )
    SELECT lang,
           CAST(SUM(nlen) AS BIGINT) AS total_norm_len,
           CAST(SUM(n_toks * n_toks) AS BIGINT) AS token_sq_sum,
           COUNT(*) AS n_docs
    FROM t GROUP BY lang
    """,
)
def q_pandas_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (per-row normalized length) + grouped-aggregate
    pandas UDF (sum of squared token counts) in one aggregation — both
    exact, so the Arrow round-trip gets a value-level oracle.

    Scale: the scalar UDF runs on Arrow batches inside the scan stage;
    the grouped agg ships (lang, n_tokens) — 2 small columns — through
    one shuffle. Python never sees row-at-a-time traffic.
    """
    from iceberg_matrix_spark.functions.text import token_count

    normalized_len, sum_of_squares, int_sum = _make_udfs()
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        normalized_len("text").alias("nlen"),
        token_count("text").alias("n_toks"),
        F.lit(1).alias("one"),
    )
    # Spark forbids mixing GROUPED_AGG pandas UDFs with JVM aggregates in
    # one aggregation — so every aggregate here is a pandas UDF
    return per_doc.groupBy("lang").agg(
        int_sum(F.col("nlen")).alias("total_norm_len"),
        sum_of_squares(F.col("n_toks")).alias("token_sq_sum"),
        int_sum(F.col("one")).alias("n_docs"),
    )
