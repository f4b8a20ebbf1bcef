"""Connected components: hand-built graphs + the registered dedup chain."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_matrix_spark.operators.graph import (
    connected_components,
    neardup_components,
)
from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.sources.testdata import load_table


def _cc(spark, edges, nodes):
    e = local_df(spark, edges, "id1 bigint, id2 bigint")
    n = local_df(spark, [(x,) for x in nodes], "node bigint")
    rows = connected_components(e, n).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_two_components_and_singleton(spark):
    # chain 1-2-3-4 (diameter 3, needs multiple rounds), pair 10-11,
    # isolated 20
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (11, 10)], [1, 2, 3, 4, 10, 11, 20])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_edge_order_and_duplicates_irrelevant(spark):
    got = _cc(spark, [(5, 3), (3, 5), (5, 3), (7, 5)], [3, 5, 7])
    assert got == {3: 3, 5: 3, 7: 3}


def test_long_chain_converges(spark):
    # 12-node path: worst-case diameter for the iteration bound
    edges = [(i, i + 1) for i in range(12)]
    got = _cc(spark, edges, list(range(13)))
    assert set(got.values()) == {0}


def test_neardup_components_cover_all_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    comp = neardup_components(docs)
    assert comp.count() == docs.count()  # every doc labeled exactly once
    # component ids are members: min(doc_id) per component == component
    bad = (
        comp.groupBy("component")
        .agg(F.min("doc_id").alias("m"))
        .filter(F.col("m") != F.col("component"))
        .count()
    )
    assert bad == 0
