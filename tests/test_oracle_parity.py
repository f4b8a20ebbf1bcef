"""Every registered query with an oracle must exactly match DuckDB.

This is the local mirror of the driver's CORRECTNESS gate (t2): runs at
sf0.001 by default for speed; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to mirror the driver's scale exactly.
"""

from __future__ import annotations

import pytest

from iceberg_matrix_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import assert_query_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, QUERIES[name], ORACLES[name], sf_dir)


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
