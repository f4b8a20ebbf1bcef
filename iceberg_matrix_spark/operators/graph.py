"""Distributed connected components over the near-duplicate pair graph.

The missing piece between "find near-dup pairs" and "produce a deduped
training corpus" is clustering: pairs (a,b),(b,c) must collapse to ONE
canonical document, not two independent removals. That requires connected
components over the similarity graph.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round, a node adopts the minimum label among itself
and its neighbors; fixpoint = every node carries the minimum id of its
component. Rounds needed = graph diameter, and near-dup clusters are
near-cliques (diameter ≲ 3), so convergence is fast in practice; a
max_iter bound guards pathological chains. Per round the plan is one
shuffle (join labels onto edges by src) + one shuffle (groupBy node) —
both on the same key, so AQE/exchange-reuse keeps it to one physical
exchange per side at scale.

Scale notes (100 TB):
- The label frame is (node, component) — two longs per document, orders
  of magnitude smaller than the corpus; the edge list is bounded by the
  near-dup pair count which the upstream doc-frequency cap keeps linear.
- Each round ends in ``localCheckpoint(eager=True)`` — iterative
  algorithms MUST truncate lineage or the plan tree (and task binary)
  grows linearly in rounds. On a real cluster with a checkpoint dir,
  ``df.checkpoint()`` gives the same truncation with fault tolerance.
- Convergence is detected with a 1-row aggregate (labels only ever
  decrease, so ``sum(component)`` is strictly monotone until fixpoint) —
  no extra join, one cheap action per round. Driver-side iteration with
  per-round actions is how Spark's own iterative frameworks (GraphX,
  ML ALS) operate; the per-round data never lands on the driver.

Reference parity: the reference has no graph operator — this is part of
the beyond-reference training-pipeline surface (brief: dedup is a
first-class component). The DuckDB oracle computes the same components
with a recursive CTE, so the whole pipeline (shingles → capped Jaccard
pairs → components → canonical filter) is exactly checked end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_matrix_spark.operators.dedup import (
    _DOC_SHINGLES_CAPPED_SQL,
    MAX_DOC_FREQ,
    ngram_jaccard_pairs,
)
from iceberg_matrix_spark.queries.registry import TOKS_SQL, register
from iceberg_matrix_spark.sources.testdata import load_table


def _observed_sum(obs, labels: DataFrame, timeout_s: float = 60.0):
    """Fetch the Observation's ``s`` metric with a BOUNDED wait.

    ``Observation.get`` blocks with no timeout; if a Spark version change
    (or a failed/cancelled checkpoint job) ever stops the metrics from
    firing, an unbounded wait would hang the CC loop. The eager
    localCheckpoint has already executed by the time this is called, so
    the metric is normally available immediately; on timeout we degrade
    to the old explicit 1-row aggregate over the checkpointed labels
    (slower by one job, never wrong)."""
    import threading  # noqa: PLC0415

    box: dict[str, object] = {}

    def _fetch() -> None:
        try:
            box["m"] = obs.get["s"]
        except Exception as ex:  # noqa: BLE001 — surfaced via fallback
            box["err"] = ex

    th = threading.Thread(target=_fetch, daemon=True)
    th.start()
    th.join(timeout=timeout_s)
    if "m" in box:
        return box["m"]
    return labels.agg(F.sum("component").alias("s")).collect()[0]["s"]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) where component = min node id in the connected
    component. ``edges`` needs columns id1/id2 (undirected, any order);
    ``nodes`` needs column ``node`` and must cover every vertex
    (isolated nodes become singleton components).
    """
    from pyspark.sql import Observation  # noqa: PLC0415

    e = edges.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # enforce the documented precondition (edge endpoints ⊆ nodes) once,
    # up front: the round-0 shortcut below emits (dst, src) straight off
    # the edge list, so without this screen a src outside ``nodes`` could
    # become (and propagate as) a component label on precondition-
    # violating input. One semi-join before the loop — strictly cheaper
    # than the per-round labels join that used to provide the filter
    # implicitly.
    sym = sym.join(
        nodes.select(F.col("node").alias("src")), "src", "left_semi"
    )
    sym = sym.localCheckpoint(eager=True)

    labels = nodes.select("node", F.col("node").alias("component"))
    prev_sum = None
    for rnd in range(max_iter):
        if rnd == 0:
            # round 1 under identity labels: label(src) == src, so the
            # labels-onto-edges join is an identity mapping — emit the
            # neighbor contributions straight off the edge list (one
            # stage fewer; the min-aggregate below is unchanged, so the
            # round's output labels are identical by construction)
            nbr = sym.select(
                F.col("dst").alias("node"), F.col("src").alias("component")
            )
        else:
            nbr = sym.join(
                labels.withColumnRenamed("node", "src"), "src"
            ).select(F.col("dst").alias("node"), "component")
        mins = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        if rnd > 0:
            # pointer doubling: jump each new label through the PREVIOUS
            # round's (checkpointed) labels — component ← L_prev(component).
            # L_prev(y) ≤ y always, so the jump only ever lowers labels and
            # coverage roughly doubles per round: O(log diameter) rounds
            # instead of O(diameter) on chain-shaped graphs. Joining the
            # previous labels (not the current mins) keeps the min-step
            # computed ONCE per round and the round at one action. At any
            # fixpoint the jump is an identity, so the fixpoint is exactly
            # the min-propagation fixpoint (= connected components).
            # Left join + coalesce: a label value with no row in labels
            # (impossible under the precondition) simply doesn't jump.
            jump = labels.select(
                F.col("node").alias("component"),
                F.col("component").alias("__c2"),
            )
            mins = mins.join(jump, "component", "left").select(
                "node", F.coalesce("__c2", "component").alias("component")
            )
        # convergence metric rides the checkpoint's own materialization
        # job (labels only ever decrease ⇒ sum(component) is strictly
        # monotone until fixpoint): one action per round instead of two
        # — Observation metrics fire when the eager localCheckpoint
        # executes, so the separate 1-row aggregate job is gone
        obs = Observation()
        labels = mins.observe(
            obs, F.sum("component").alias("s")
        ).localCheckpoint(eager=True)
        cur_sum = _observed_sum(obs, labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        # min-label propagation needs one round per graph-diameter hop;
        # returning the intermediate labels would silently split one
        # cluster into several "canonical" components
        raise RuntimeError(
            f"connected components did not converge in {max_iter} rounds "
            f"(graph diameter exceeds max_iter — raise it)"
        )
    return labels


def neardup_components(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
) -> DataFrame:
    """(doc_id, component) for EVERY document: near-dup clusters share a
    component id (the min member id); unique docs are their own component.
    Edges come from the doc-frequency-capped exact-Jaccard pair operator,
    so the full chain is deterministic and SQL-oracle-able."""
    pairs = ngram_jaccard_pairs(
        docs, id_col, text_col, k=3, threshold=threshold, max_doc_freq=MAX_DOC_FREQ
    ).select("id1", "id2")
    nodes = docs.select(F.col(id_col).alias("node"))
    comp = connected_components(pairs, nodes)
    return comp.select(F.col("node").alias("doc_id"), "component")


# DuckDB twin: recursive CTE closing the undirected reachability relation,
# then min reachable id per node. `jac` comes from the shared capped
# shingle-Jaccard CTE chain (identical to the Spark operator's edges).
_COMPONENTS_SQL = f"""
    WITH RECURSIVE {_DOC_SHINGLES_CAPPED_SQL},
    edges AS (SELECT id1, id2 FROM jac WHERE jaccard >= 0.2),
    undirected AS (
      SELECT id1 AS src, id2 AS dst FROM edges
      UNION
      SELECT id2, id1 FROM edges
    ),
    reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT u.dst, r.lbl FROM reach r JOIN undirected u ON u.src = r.node
    ),
    comp AS (SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node)
"""


@register(
    "q_dedup_cluster_components",
    oracle=_COMPONENTS_SQL + "SELECT doc_id, component FROM comp",
)
def q_dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph (Jaccard ≥ 0.2,
    skew-capped): every document labeled with its cluster's min doc id."""
    docs = load_table(spark, sf_dir, "documents")
    return neardup_components(docs)


@register(
    "q_dedup_filtered_corpus",
    oracle=_COMPONENTS_SQL
    + """
    SELECT component AS doc_id, COUNT(*) AS cluster_size
    FROM comp GROUP BY component
    """,
)
def q_dedup_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduped corpus: one canonical doc (min id) per near-dup
    cluster, with the number of documents it absorbed. This is the actual
    training-data filter step — downstream joins `doc_id` back to the
    corpus to materialize the kept text."""
    docs = load_table(spark, sf_dir, "documents")
    comp = neardup_components(docs)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    ).select(F.col("component").alias("doc_id"), "cluster_size")


def canonical_by_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
) -> DataFrame:
    """Quality-aware canonical selection: within every near-dup cluster,
    KEEP the member with the most tokens (ties → lower id) instead of
    blindly keeping the min id — the production rule (RefinedWeb keeps
    the longest member of a duplicate group, arXiv:2306.01116 §4.3;
    a near-dup's shorter copies are usually truncations). Emits one row
    per document: (doc_id, component, n_tokens, keep).

    Plan: the component labels (two longs per doc) join back to a token
    count that is one narrow projection; the selection is a per-component
    rank window — state bounded by the largest cluster, which the
    upstream doc-frequency cap keeps small. Fully deterministic, so the
    recursive-CTE oracle reproduces the verdicts exactly."""
    from pyspark.sql import Window  # noqa: PLC0415

    from iceberg_matrix_spark.functions.text import token_count  # noqa: PLC0415

    comp = neardup_components(docs, id_col, text_col, threshold)
    sizes = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    labeled = comp.join(sizes, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    return labeled.select(
        "doc_id",
        "component",
        "n_tokens",
        (F.row_number().over(w) == 1).alias("keep"),
    )


@register(
    "q_dedup_canonical_quality",
    oracle=_COMPONENTS_SQL
    + f"""
    , qsizes AS (SELECT doc_id, CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens
                FROM documents)
    SELECT c.doc_id, c.component, s.n_tokens,
           ROW_NUMBER() OVER (PARTITION BY c.component
                              ORDER BY s.n_tokens DESC, c.doc_id) = 1 AS keep
    FROM comp c JOIN qsizes s USING (doc_id)
    """,
)
def q_dedup_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster, keep the LONGEST member (ties to the lower
    id) — quality-aware canonical selection over the component labels."""
    docs = load_table(spark, sf_dir, "documents")
    return canonical_by_quality(docs)


# ---------------------------------------------------------------------------
# PageRank centrality over the near-dup graph (fixed-point integer ranks)
# ---------------------------------------------------------------------------

PR_ITERS = 5
PR_SCALE = 1_000_000          # ranks in integer micro-units
_PR_DAMP_NUM = 85             # damping 0.85 as a rational: every rank
_PR_DAMP_DEN = 100            # update is pure BIGINT arithmetic
_PR_TELEPORT = PR_SCALE * (_PR_DAMP_DEN - _PR_DAMP_NUM) // _PR_DAMP_DEN


def pagerank_centrality(
    edges: DataFrame, nodes: DataFrame, iters: int = PR_ITERS
) -> DataFrame:
    """(node, rank_fp): ``iters`` fixed-point PageRank sweeps over the
    undirected graph, ranks in integer micro-units.

    Why integers: a float PageRank's per-node Σ contrib depends on the
    shuffle's reduction order — not hash-reproducible across engines.
    Fixed-point contributions ``(r·85) div (100·deg)`` are BIGINTs whose
    sum is order-independent, so a fixed iteration count is exactly
    SQL-oracle-able (the same reason the PQ family's ADC is integer).
    Dangling mass (isolated nodes keep only teleport) and the fixed
    sweep count are the documented simplifications — this ranks near-dup
    cluster members, it does not chase the stationary distribution.

    Scale: per sweep one join of the (node, rank) pair-of-longs frame
    onto the edge list + one groupBy — the connected_components shape,
    same lineage-truncation contract (localCheckpoint per sweep).
    """
    e = edges.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("long").alias("__r"))
    for _ in range(iters):
        contrib = (
            sym.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(__r * {_PR_DAMP_NUM}) DIV ({_PR_DAMP_DEN} * __deg)").alias(
                    "__c"
                ),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(_PR_TELEPORT) + F.coalesce("__s", F.lit(0)))
                .cast("long")
                .alias("__r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("__r").alias("rank_fp"))


def canonical_by_centrality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
) -> DataFrame:
    """Centrality-aware canonical selection: within every near-dup
    cluster keep the HIGHEST-PageRank member (ties → lower id) — the
    member most similar to the rest of its cluster, a hub rather than a
    fringe variant (complements canonical_by_quality's longest-member
    rule). Emits (doc_id, component, rank_fp, keep)."""
    from pyspark.sql import Window  # noqa: PLC0415

    pairs = ngram_jaccard_pairs(
        docs, id_col, text_col, k=3, threshold=threshold, max_doc_freq=MAX_DOC_FREQ
    ).select("id1", "id2")
    pairs = pairs.localCheckpoint(eager=True)  # edges reused by both passes
    nodes = docs.select(F.col(id_col).alias("node"))
    comp = connected_components(pairs, nodes).select(
        F.col("node").alias("doc_id"), "component"
    )
    pr = pagerank_centrality(pairs, nodes).select(
        F.col("node").alias("doc_id"), "rank_fp"
    )
    labeled = comp.join(pr, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("rank_fp"), F.asc("doc_id")
    )
    return labeled.select(
        "doc_id",
        "component",
        "rank_fp",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def _pagerank_sql(iters: int) -> str:
    """The oracle's PageRank: the same integer sweeps, loop-unrolled into
    one CTE pair (contribs, ranks) per iteration."""
    ctes = [
        "deg AS (SELECT src AS node, COUNT(*) AS deg FROM undirected GROUP BY src)",
        f"pr0 AS (SELECT doc_id AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM documents)",
    ]
    for i in range(iters):
        ctes.append(
            f"""pc{i} AS (
      SELECT u.dst AS node,
             SUM((p.r * {_PR_DAMP_NUM}) // ({_PR_DAMP_DEN} * d.deg)) AS s
      FROM undirected u
      JOIN pr{i} p ON p.node = u.src
      JOIN deg d ON d.node = u.src
      GROUP BY u.dst)"""
        )
        ctes.append(
            f"""pr{i + 1} AS (
      SELECT n.node, CAST({_PR_TELEPORT} + COALESCE(c.s, 0) AS BIGINT) AS r
      FROM pr0 n LEFT JOIN pc{i} c USING (node))"""
        )
    return ", ".join(ctes)


@register(
    "q_dedup_canonical_centrality",
    oracle=_COMPONENTS_SQL
    + ", "
    + _pagerank_sql(PR_ITERS)
    + f"""
    SELECT c.doc_id, c.component, p.r AS rank_fp,
           ROW_NUMBER() OVER (PARTITION BY c.component
                              ORDER BY p.r DESC, c.doc_id) = 1 AS keep
    FROM comp c JOIN pr{PR_ITERS} p ON p.node = c.doc_id
    """,
)
def q_dedup_canonical_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster, keep the highest-PageRank member (5
    fixed-point integer sweeps over the Jaccard-0.2 pair graph; ties to
    the lower id)."""
    docs = load_table(spark, sf_dir, "documents")
    return canonical_by_centrality(docs)
