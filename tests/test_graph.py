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


def test_deep_chain_converges_in_log_rounds(spark):
    """Pointer doubling pin (round 12): a 64-node path has diameter 63,
    so plain min-label propagation needs 63 rounds — with the per-round
    jump through the previous labels, coverage doubles per round and a
    max_iter of 12 (≫ log2(63)+slack, ≪ 63) must suffice. Plain
    propagation would raise the non-convergence RuntimeError here."""
    e = local_df(
        spark, [(i, i + 1) for i in range(63)], "id1 bigint, id2 bigint"
    )
    n = local_df(spark, [(x,) for x in range(64)], "node bigint")
    rows = connected_components(e, n, max_iter=12).collect()
    assert {r["component"] for r in rows} == {0}
    assert len(rows) == 64


def test_cc_drops_edges_outside_nodes(spark):
    """Precondition screen (ADVICE r11): an edge endpoint outside
    ``nodes`` must never become a component label — the round-0 shortcut
    emits labels straight off the edge list, so the src side is
    semi-joined against nodes up front."""
    # src 1 sorts BELOW every real node, so an unscreened round-0
    # shortcut would adopt it as the winning min-label
    got = _cc(spark, [(1, 2), (2, 3)], [2, 3])
    # 1 must never appear as a component label (the dst side may still
    # surface as an extra output row — the documented precondition is
    # that ``nodes`` covers every vertex)
    assert 1 not in set(got.values())
    assert got[2] == 2 and got[3] == 2


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


def test_canonical_by_quality_keeps_longest_not_min_id(spark):
    from iceberg_matrix_spark.operators.graph import canonical_by_quality
    from iceberg_matrix_spark.session import local_df

    shared = " ".join(f"s{i}" for i in range(30))
    docs = local_df(
        spark,
        [
            (1, shared),                                     # truncation
            (2, shared + " extra0 extra1 extra2 extra3"),    # longest copy
            (9, "totally unrelated text about nothing"),     # singleton
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in canonical_by_quality(docs).collect()
    }
    # docs 1 and 2 cluster under min-id label 1, but the LONGER doc 2 is
    # the kept canonical — the quality rule overrides min-id
    assert got[1] == (1, False)
    assert got[2] == (1, True)
    assert got[9] == (9, True)


def test_canonical_by_quality_ties_break_to_lower_id(spark):
    from iceberg_matrix_spark.operators.graph import canonical_by_quality
    from iceberg_matrix_spark.session import local_df

    shared = " ".join(f"t{i}" for i in range(20))
    docs = local_df(
        spark,
        [(5, shared), (7, shared)],  # identical → equal token counts
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in canonical_by_quality(docs).collect()}
    assert got == {5: True, 7: False}


def test_pagerank_ranks_hub_above_fringe(spark):
    """On a star (hub connected to 5 leaves) the hub must outrank every
    leaf, ranks must be deterministic across runs, and total rank mass
    must stay bounded by teleport + damped redistribution."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.graph import (
        PR_SCALE,
        pagerank_centrality,
    )
    from iceberg_matrix_spark.session import local_df

    edges = local_df(
        spark, [(0, i) for i in range(1, 6)], "id1 bigint, id2 bigint"
    )
    nodes = local_df(spark, [(i,) for i in range(7)], "node bigint")  # 6 isolated
    a = {r.node: r.rank_fp for r in pagerank_centrality(edges, nodes).collect()}
    b = {r.node: r.rank_fp for r in pagerank_centrality(edges, nodes).collect()}
    assert a == b
    hub, leaf = a[0], a[1]
    assert hub > leaf > 0
    assert all(a[i] == a[1] for i in range(2, 6))  # symmetric leaves tie
    # isolated node: teleport mass only
    assert a[6] == PR_SCALE * 15 // 100
    assert sum(a.values()) <= 7 * PR_SCALE
