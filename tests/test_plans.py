"""Plan-quality invariants: pushdown, pruning, broadcast, shuffle budget.

These pin the physical-plan shapes the 100 TB design depends on — a
refactor that silently drops a pushed filter, widens a scan, or converts
a broadcast join into a sort-merge join fails here, not in production.
"""

from __future__ import annotations

from iceberg_matrix_spark.plans import (
    broadcast_join_count,
    data_shuffle_count,
    round_robin_shuffle_count,
    explain_formatted,
    pushed_filters,
    scan_columns,
    shuffle_count,
    sort_merge_join_count,
)
from iceberg_matrix_spark.queries import QUERIES


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["q2_filter_pushdown"](spark, sf_dir)
    [filters] = pushed_filters(df)
    text = " ".join(filters)
    assert "l_shipdate" in text and "GreaterThan(l_quantity" in text
    assert shuffle_count(df) == 0  # pure scan+filter+project


def test_column_pruning_reads_only_needed_columns(spark, sf_dir):
    df = QUERIES["q2_filter_pushdown"](spark, sf_dir)
    [cols] = scan_columns(df)
    # lineitem has 16 columns; the query needs exactly these 4
    assert cols == {"l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"}


def test_q1_aggregation_is_single_shuffle(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    # partial hash agg map-side, one DATA exchange on the group keys,
    # final agg (round 11: a round-robin compute-parallelism exchange —
    # absent at scale — sits under the agg and is excluded by design)
    assert data_shuffle_count(df) == 1
    # the exclusion must cover ONLY the scale helper's exchange: a later
    # unrelated repartition(n) may not hide inside it (ADVICE r11)
    assert round_robin_shuffle_count(df) <= 1
    [cols] = scan_columns(df)
    assert "l_comment" not in cols  # wide columns never leave the scan


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    df = QUERIES["q5_local_supplier_volume"](spark, sf_dir)
    assert broadcast_join_count(df) >= 4  # nation/region/customer/supplier
    assert sort_merge_join_count(df) == 0
    # only the final aggregation DATA exchange (round-robin excluded,
    # same rationale as q1 above)
    assert data_shuffle_count(df) <= 1
    assert round_robin_shuffle_count(df) <= 1


def test_point_lookup_pushes_equality(spark, sf_dir):
    df = QUERIES["q_point_lookup"](spark, sf_dir)
    text = " ".join(f for fs in pushed_filters(df) for f in fs)
    assert "EqualTo" in text


def test_matrix_grid_joins_stay_broadcast(spark, sf_dir):
    df = QUERIES["q_matrix_filtered_grid"](spark, sf_dir)
    assert sort_merge_join_count(df) == 0


def test_dedup_ngram_shuffle_budget(spark, sf_dir):
    # exactly two DATA shuffles: postings groupBy + pair-count groupBy.
    # The round-11 slim pair rows add two size joins AFTER counting,
    # but they build from the persisted 16-byte sizes parquet and stay
    # broadcast at this scale — a third data shuffle appearing here
    # means the denominator join regressed to exchanging pairs
    df = QUERIES["q_dedup_ngram_threshold"](spark, sf_dir)
    assert data_shuffle_count(df) == 2
    assert round_robin_shuffle_count(df) <= 1


def test_curation_ops_stay_narrow(spark, sf_dir):
    for name in ("q_pii_redaction", "q_text_repetition", "q_text_chunk"):
        df = QUERIES[name](spark, sf_dir)
        assert shuffle_count(df) == 0, name
        [cols] = scan_columns(df)
        assert cols <= {"doc_id", "text"}, name
    df = QUERIES["q_sample_stratified"](spark, sf_dir)
    assert shuffle_count(df) == 1  # only the summary aggregate
    [cols] = scan_columns(df)
    assert cols == {"doc_id", "lang"}  # the coin never reads text


def test_pack_sequences_has_no_corpus_wide_window(spark, sf_dir):
    # the global prefix sum must come from range-repartition + local
    # windows + a broadcast offsets join — never a corpus-wide
    # single-partition Window.orderBy
    df = QUERIES["q_pack_sequences"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan.replace(
        "Exchange SinglePartition", "", 1
    )  # at most the tiny offsets frame collapses to one partition
    assert broadcast_join_count(df) >= 1  # offsets joined by broadcast
    assert sort_merge_join_count(df) == 0


def test_exists_subquery_decorrelates_to_semi_anti_joins(spark, sf_dir):
    # EXISTS/NOT EXISTS must decorrelate into semi/anti hash joins — a
    # per-row subquery plan would be quadratic at scale
    df = QUERIES["q_exists_subquery"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_text_ops_are_shuffle_free(spark, sf_dir):
    for name in ("q_text_quality", "q_text_token_stats", "q_text_bpe_token_count",
                 "q_text_fingerprint_winnow"):
        df = QUERIES[name](spark, sf_dir)
        # winnow may carry a round-robin repartition from
        # ensure_compute_parallelism on small local inputs — zero DATA
        # shuffles is the invariant that holds at 100 TB
        assert data_shuffle_count(df) == 0, name
        assert round_robin_shuffle_count(df) <= 1, name
        [cols] = scan_columns(df)
        assert cols <= {"doc_id", "text"}, name


def test_tpch_breadth_decorrelation_and_scan_budget(spark, sf_dir):
    # Q4/Q21: correlated (NOT) EXISTS must become semi/anti hash joins
    plan4 = QUERIES["q4_priority_returns"](spark, sf_dir)
    p4 = plan4._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p4

    plan21 = QUERIES["q21_sole_return_suppliers"](spark, sf_dir)
    p21 = plan21._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p21 and "LeftAnti" in p21

    # Q13: LEFT OUTER survives (customers with zero orders must appear),
    # exactly the two semantic shuffles (per-customer agg, histogram agg)
    df13 = QUERIES["q13_order_count_distribution"](spark, sf_dir)
    p13 = df13._jdf.queryExecution().executedPlan().toString()
    assert "LeftOuter" in p13 or "BuildRight" in p13
    assert data_shuffle_count(df13) <= 2

    # Q11: lineitem scanned ONCE — the global threshold re-aggregates the
    # per-part frame instead of re-reading the fact table
    df11 = QUERIES["q11_important_parts"](spark, sf_dir)
    scans = scan_columns(df11)
    lineitem_scans = [c for c in scans if "l_extendedprice" in c]
    assert len(lineitem_scans) == 1, scans

    # Q22: anti join against the date-filtered orders slice, with the
    # filter pushed to the scan
    df22 = QUERIES["q22_dormant_customers"](spark, sf_dir)
    p22 = df22._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in p22
    text = " ".join(f for fs in pushed_filters(df22) for f in fs)
    assert "o_orderdate" in text


def test_python_stays_arrow_vectorized(spark, sf_dir):
    """Python only ever touches data through Arrow: the pandas-UDF query
    plans ArrowEvalPython / AggregateInPandas nodes, and NO query plans a
    row-at-a-time BatchEvalPython anywhere."""
    udf_plan = (
        QUERIES["q_pandas_udf_surface"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in udf_plan
    assert "ArrowAggregatePython" in udf_plan
    assert "BatchEvalPython" not in udf_plan

    for name in ("q_text_quality", "q1_pricing_summary", "q_dedup_minhash_lsh"):
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan, name


def test_text_ops_run_inside_codegen(spark, sf_dir):
    """The narrow text operators compile into whole-stage codegen — the
    expression work stays JVM-side and fused (the brief's 'widen the
    WholeStageCodegen spans' check, mechanized)."""
    from iceberg_matrix_spark.plans import codegen_stage_count

    for name in ("q_text_quality", "q_text_token_stats"):
        assert codegen_stage_count(QUERIES[name](spark, sf_dir)) >= 1, name


def test_geo_queries_stay_jvm_and_codegen(spark, sf_dir):
    """The WKB codec must stay inside whole-stage codegen (the first
    implementation silently fell out at janino's 64 KB method limit and
    ran interpreted, ~150x slower) and must never touch Python."""
    from iceberg_matrix_spark.plans import codegen_stage_count

    df = QUERIES["q_geo_bbox"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # codegen_stage_count inspects the executed plan's codegen wrapping;
    # a 64 KB bailout would leave zero codegen stages
    assert codegen_stage_count(df) >= 1


def test_spatial_join_is_bucketed_not_cartesian(spark, sf_dir):
    """Grid bucketing must plan an equi-join on the cell id — an
    inequality-only distance join would degrade to a cartesian product
    (the O(n^2) plan the oracle uses, fatal at scale)."""
    df = QUERIES["q_geo_distance_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # (the only nested-loop node allowed is the 9-row offsets broadcast
    # cross; the point-pair candidate join itself must be an equi-join)
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_q20_two_shuffle_aggregate_chain(spark, sf_dir):
    """Q20's decorrelated plan: the supply aggregate shuffles lineitem on
    (partkey, suppkey) once; the per-part re-aggregate works on already-
    aggregated pairs; the part-name filter reaches the part scan."""
    df = QUERIES["q20_excess_stock_suppliers"](spark, sf_dir)
    text = " ".join(f for fs in pushed_filters(df) for f in fs)
    assert "p_name" in text  # LIKE 'small%' pushed to the part scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan  # the IN-list became a semi join


def test_substring_spans_plan_shape(spark, sf_dir):
    """The span pipeline's scale contract: the scan reads only (doc_id,
    text); no Python appears anywhere in the row path; the posting-list
    group-by + semi-join + per-doc window cost a bounded shuffle budget
    (grams shuffle, postings agg, doc window — NOT corpus-wide sorts)."""
    from iceberg_matrix_spark.plans import explain_formatted

    df = QUERIES["q_substring_dup_spans"](spark, sf_dir)
    for cols in scan_columns(df):  # grams feed both postings and the join
        assert cols == {"doc_id", "text"}
    plan = explain_formatted(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert shuffle_count(df) <= 5  # grams→agg, grams→join, doc window, sort
    assert sort_merge_join_count(df) <= 1  # postings semi-join may SMJ at scale


def test_span_ratio_groupby_reuses_doc_partitioning(spark, sf_dir):
    """groupBy(doc_id, island) after the doc_id window must NOT add an
    exchange — hashpartitioning(doc_id) already clusters the keys."""
    from iceberg_matrix_spark.operators.spans import duplicate_spans
    from iceberg_matrix_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicate_spans(docs, "doc_id", "text")
    unsorted_shuffles = shuffle_count(spans)
    # window (1 on doc_id) + grams/postings (2); island groupBy adds none
    assert unsorted_shuffles <= 4


def test_corpus_pipeline_single_dag_with_span_gate(spark, sf_dir):
    """The curation capstone composes gopher gate + span-duplication gate
    + exact dedup + stratified sample + rollup as ONE Catalyst DAG: no
    Python in the row path, documents scanned with pruned columns only,
    and the span gate adds its bounded posting-list shuffles (grams agg,
    postings join, doc window) — not a corpus-wide sort or cartesian."""
    from iceberg_matrix_spark.plans import explain_formatted

    df = QUERIES["q_corpus_pipeline"](spark, sf_dir)
    plan = explain_formatted(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    for cols in scan_columns(df):
        assert cols <= {"doc_id", "lang", "source", "text"}
    # gopher+sample are narrow; dedup adds 2 (fingerprint agg + semi
    # join); span gate adds its ≤5; final rollup 1 — keep a hard ceiling
    # so a regression to corpus-wide shuffling fails loudly
    assert shuffle_count(df) <= 10


def test_incremental_dedup_plan_shape(spark, sf_dir):
    """The incremental-ingest contract: both queries scan only (doc_id,
    text), keep the whole pipeline JVM-side, and never go cartesian —
    batch-vs-index work is equi-joins on fingerprint / shingle only."""
    from iceberg_matrix_spark.plans import explain_formatted

    for name, budget in (
        ("q_dedup_incremental", 5),
        ("q_dedup_incremental_ngram", 8),
    ):
        df = QUERIES[name](spark, sf_dir)
        plan = explain_formatted(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        for cols in scan_columns(df):
            # text scans stay (doc_id, text); the round-11 persisted
            # hashed shingle-set parquet re-scans carry only the 8-byte
            # hash arrays + sizes — text still never rides a join
            assert cols <= {"doc_id", "text"} or cols <= {
                "doc_id", "sh_hashed", "n_sh"
            }, cols
        assert shuffle_count(df) <= budget, name


def test_neardup_lsh_dedup_is_shuffle_free(spark, sf_dir):
    """The multi-probe candidate stage's scale contract: pair dedup is the
    inline first-colliding-band filter, NOT a distinct — so the plan has
    no aggregate over (id1, id2) and the only exchanges are the
    parallelism repartition, the band join sides, and the vector
    re-joins. Python never appears; both vector joins broadcast."""
    from iceberg_matrix_spark.plans import explain_formatted
    from iceberg_matrix_spark.queries import QUERIES

    df = QUERIES["q_dedup_semantic"](spark, sf_dir)
    plan = explain_formatted(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # a regression back to .distinct() shows up as HashAggregate keyed by
    # the candidate ids
    assert "HashAggregate(keys=[id1" not in plan.replace("#", "").replace(
        " ", ""
    ).replace("L", "")
    assert shuffle_count(df) <= 5


def test_line_dedup_plan_shape(spark, sf_dir):
    """Line dedup's 100 TB contract: the scan is pruned to (doc_id,
    text), joins/groups key on the 8-byte line hash (no string-keyed
    aggregate), nothing runs in Python, and no cartesian appears."""
    from iceberg_matrix_spark.plans import explain_formatted

    df = QUERIES["q_line_dedup"](spark, sf_dir)
    plan = explain_formatted(df)
    for cols in scan_columns(df):  # freq agg + occ window sides re-scan
        assert cols <= {"doc_id", "text"}
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_pq_ann_stays_jvm_with_broadcast_queries(spark, sf_dir):
    """PQ ADC's scale contract: the corpus side is one codegen projection
    over a (vec_id, embedding)-pruned scan; the tiny query frame joins by
    BROADCAST (never a shuffled cartesian); the only exchange is the
    per-query top-k window; zero Python."""
    from iceberg_matrix_spark.plans import explain_formatted

    df = QUERIES["q_ann_pq_topk"](spark, sf_dir)
    plan = explain_formatted(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or broadcast_join_count(df) >= 1
    assert shuffle_count(df) <= 2  # parallelism repartition + topk window


def test_dsir_vote_join_is_hash_keyed(spark, sf_dir):
    """The vote join keys on xxhash64(token) (8-byte keys), the scan
    prunes to (doc_id, text, lang), and the vote sum partial-aggregates
    — no Python, no cartesian."""
    from iceberg_matrix_spark.plans import explain_formatted

    df = QUERIES["q_dsir_domain_vote"](spark, sf_dir)
    plan = explain_formatted(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    for cols in scan_columns(df):
        assert cols <= {"doc_id", "text", "lang"}


def test_quality_buckets_no_corpus_global_sort(spark, sf_dir):
    """Exact tertiles WITHOUT ranking the corpus: the only window runs
    over the bounded permille-count frame (≤1001 rows), the bucket map
    broadcasts back, and nothing corpus-sized sorts globally — bounded
    shuffle count, no Python."""
    from iceberg_matrix_spark.plans import explain_formatted

    df = QUERIES["q_quality_buckets"](spark, sf_dir)
    plan = explain_formatted(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert broadcast_join_count(df) >= 1  # the bucket-map join
    assert shuffle_count(df) <= 6


def test_doc_chunks_is_shuffle_free_and_prunes_columns(spark, sf_dir):
    """Chunking must stay one generate stage: zero data shuffles (chunk
    rows are born and die in their input partition) and the scan reads
    only (doc_id, text)."""
    df = QUERIES["q_doc_chunks"](spark, sf_dir)
    assert data_shuffle_count(df) == 0
    [cols] = scan_columns(df)
    assert cols <= {"doc_id", "text"}


def test_media_neardup_join_is_banded_equi_not_cartesian(spark, sf_dir):
    """The near-dup candidate join must reach the engine as an equi-join
    on the (band, key) blocking columns — a nested-loop/cartesian would
    be the all-pairs scale-killer the banding exists to avoid."""
    df = QUERIES["q_multimodal_neardup"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_chunk_dedup_prunes_columns_and_avoids_cartesian(spark, sf_dir):
    """The chunk-dedup composition must scan documents with only
    (doc_id, text) (everything else is derived), keep every join
    equi-keyed (fingerprint / ckey / shingle — a nested-loop anywhere
    would be the all-pairs scale-killer), and stay off Python workers."""
    df = QUERIES["q_chunk_dedup"](spark, sf_dir)
    for cols in scan_columns(df):
        # documents scans stay (doc_id, text); the round-11 persisted
        # key projections — (doc_id, n_sh) Jaccard sizes, (ckey) exact
        # keepers, (ckey) near-dup drop set — are ≤16-byte rows, the
        # joins' stat-broadcast build sides
        assert (
            cols <= {"doc_id", "text"}
            or cols <= {"doc_id", "n_sh"}
            or cols <= {"ckey"}
        ), cols
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    fplan = explain_formatted(df)
    assert "BatchEvalPython" not in fplan and "ArrowEvalPython" not in fplan


def test_ivfpq_rerank_fetch_is_broadcast_and_bounded(spark, sf_dir):
    """The rerank stage must fetch full vectors via BROADCAST joins of
    the fixed-size shortlist back against the corpus scan — if either
    the shortlist or the query frame ever arrives by shuffle, the
    rerank would exchange the corpus instead of |queries|·R rows."""
    df = QUERIES["q_ann_ivfpq_rerank"](spark, sf_dir)
    assert broadcast_join_count(df) >= 2  # shortlist fetch + query vecs
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_scoped_decontamination_join_is_broadcast_equi(spark, sf_dir):
    """The scoped decontamination candidate join must reach the engine
    as a BROADCAST equi-join on the cluster id (the eval probe side is
    tiny by definition) — a nested-loop/cartesian would be the dense
    |corpus|x|eval| shape the scoping exists to avoid — and the corpus
    scan must carry only (vec_id, embedding)."""
    df = QUERIES["q_decontaminate_semantic_scoped"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert broadcast_join_count(df) >= 1
    for cols in scan_columns(df):
        assert cols <= {"vec_id", "embedding"}, cols


def test_const_literal_sql_round_trip_is_bit_exact(spark):
    """functions/lits.py renders constant matrices as SQL array literals
    (one py4j call instead of one per element — round-11 build-phase
    fix). The rendered literal must evaluate bit-identically to the
    per-element F.lit form for every finite double, including the
    awkward reprs (negative zero, subnormals, exponent forms, exact
    integers, shortest-repr 17-digit survivors)."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.functions.lits import (
        const_double_matrix,
        const_long_array,
    )

    tricky = [
        0.0, -0.0, 1.0, -1.5, 0.1, 1 / 3, 2**53 - 1.0, 1e16, 1e-5,
        6.1e-05, 1e-300, 5e-324, 1.7976931348623157e308,
        0.30000000000000004, -2.2250738585072014e-308,
    ]
    mat = [tricky, list(reversed(tricky))]
    df = spark.range(1)
    [via_sql] = df.select(const_double_matrix(mat).alias("m")).collect()
    [via_lit] = df.select(
        F.array(*[F.array(*[F.lit(x) for x in row]) for row in mat]).alias("m")
    ).collect()
    import struct

    bits = lambda v: struct.pack("<d", v)  # noqa: E731  -0.0 vs 0.0 differ
    assert [[bits(x) for x in row] for row in via_sql["m"]] == [
        [bits(x) for x in row] for row in via_lit["m"]
    ]

    longs = [0, 1, -1, 2**63 - 1, -(2**63), 42]
    [via_sql_l] = df.select(const_long_array(longs).alias("a")).collect()
    assert via_sql_l["a"] == longs

    import math
    import pytest

    from iceberg_matrix_spark.functions.lits import double_vector_sql

    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError):
            double_vector_sql([bad])


def test_lsh_sql_rendered_builders_match_dsl(spark):
    """similarity.py renders the banded chunk array and the
    first-collision test as SQL strings (one parse instead of one py4j
    round-trip per shift/mask node — round 11). The parsed expressions
    must be SEMANTICALLY IDENTICAL to the DSL listcomp forms they
    replaced: same optimized expression tree (modulo expr ids), same
    values on adversarial signatures."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.similarity import (
        _BANDS,
        _N_PLANES,
        _chunks_sql,
        _first_collision_sql,
        _rot1_sql,
    )

    bands = _BANDS
    rows = _N_PLANES // bands
    mask = (1 << rows) - 1

    # adversarial signatures: all-zero, all-one, alternating, sign bits,
    # plus pseudo-random 32-bit values
    df = spark.range(0, 5000).select(
        F.xxhash64("id").bitwiseAND(F.lit((1 << 32) - 1)).alias("__sig")
    )
    edge = spark.createDataFrame(
        [(v,) for v in [0, 1, (1 << 32) - 1, 0x55555555, 0xAAAAAAAA,
                        0x80000000, 0x7FFFFFFF, 3, 0xC0000000]],
        "__sig long",
    )
    src = df.unionByName(edge)

    # --- chunk array ---
    sig = F.col("__sig")
    rot = F.shiftrightunsigned(sig, 1).bitwiseOR(
        F.shiftleft(sig.bitwiseAND(F.lit(1)), _N_PLANES - 1)
    )
    dsl_chunks = F.array(
        *[F.shiftrightunsigned(sig, i * rows).bitwiseAND(F.lit(mask))
          for i in range(bands)],
        *[F.shiftrightunsigned(rot, i * rows).bitwiseAND(F.lit(mask))
          for i in range(bands)],
    )
    sql_chunks = F.expr(_chunks_sql(bands, rows))
    n = src.filter(sql_chunks != dsl_chunks).count()
    assert n == 0

    # --- first collision (aligned + rotated), DSL reference inline ---
    def dsl_fc(z):
        return F.array_position(
            F.array(*[
                F.shiftrightunsigned(z, j * rows).bitwiseAND(F.lit(mask))
                == F.lit(0)
                for j in range(bands)
            ]),
            F.lit(True),
        )

    z = F.col("__sig")  # stands in for the pair XOR
    zr = F.shiftrightunsigned(z, 1).bitwiseOR(
        F.shiftleft(z.bitwiseAND(F.lit(1)), _N_PLANES - 1)
    )
    sql_fc1 = F.expr(_first_collision_sql("__sig", bands, rows))
    sql_fc2 = F.expr(_first_collision_sql(_rot1_sql("__sig"), bands, rows))
    assert src.filter(sql_fc1 != dsl_fc(z)).count() == 0
    assert src.filter(sql_fc2 != dsl_fc(zr)).count() == 0

    # --- optimized expression trees are identical modulo expr ids ---
    import re

    def norm(df_):
        plan = df_._jdf.queryExecution().optimizedPlan().toString()
        return re.sub(r"#\d+", "#", plan)

    assert norm(src.select(sql_chunks.alias("c"))) == norm(
        src.select(dsl_chunks.alias("c"))
    )
    assert norm(src.select(sql_fc1.alias("f"))) == norm(
        src.select(dsl_fc(z).alias("f"))
    )
