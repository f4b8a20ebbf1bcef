#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Unlike the correctness harness, bench runs with AQE ON (runtime
coalescing/skew handling — the production configuration). Each query is
forced end-to-end with a noop sink (no driver collect bottleneck, no
count() short-circuit that would let Catalyst prune the work).

Round 9: timings are reported raw AND host-calibrated. Two fixed probes
(pure-codegen CPU loop + lineitem scan) measure the host each run;
"queries_normalized" divides by the probe ratio vs pinned reference
values, so a slow host day rescales instead of reading as a regression.
Each run appends its normalized series to BENCH_HISTORY.jsonl.

Round 11: the one-line artifact additionally carries
"queries_normalized_median" / "value_normalized_median" — per-query
trailing medians over the last 5 same-SF history runs including this
one (VERDICT r10 #6: the recorded r10 artifact was the slowest of three
same-code runs; the median is the number a single slow hour can't
define).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_matrix_spark import get_spark
from iceberg_matrix_spark.queries import QUERIES

# Headline set: one per operator family, weighted toward the shapes that
# dominate at 100 TB (scan+agg, star join, window, inverted-index join).
HEADLINE = [
    "q1_pricing_summary",
    "q2_filter_pushdown",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_conditional_agg",
    "q_window_topk_per_group",
    "q_sessionize",
    "q_text_quality",
    "q_dedup_ngram_topk",
    "q_dedup_minhash_lsh",
    "q_ann_bruteforce_topk",
    "q_text_fingerprint_winnow",
    "q_multimodal_decode",
    "q_stream_window_agg",
    # round 2 additions: iterative clustering + distributed prefix sum
    "q_dedup_filtered_corpus",
    "q_pack_sequences",
    # round 2, second wave: multi-EXISTS decorrelation, broadcast n-gram
    # decontamination, posexplode quantization, dense-grid rollup
    "q21_sole_return_suppliers",
    "q_decontaminate",
    "q_embedding_quantize",
    "q_time_rollup_gapfill",
    # round 3: keep every formerly-red query's plan watched (the rest of
    # the nine — q_conditional_agg / q_sessionize / q_stream_window_agg
    # are already above)
    "q_top1_latest",
    "q_window_running",
    "q_json_extract",
    "q_date_trunc_agg",
    "q_session_window_batch",
    "q_variant_parse_extract",
    # round 3 additions: SQL-string MERGE against a real table, WKB
    # geometry codec round-trip, grid-bucketed spatial join, Q20's
    # double-decorrelated aggregate chain
    "q_merge_sql",
    "q_geo_bbox",
    "q_geo_distance_join",
    "q20_excess_stock_suppliers",
    # round 3, second wave: token-level posting-list pipeline (the
    # heaviest new shuffle shape — one row per token position)
    "q_substring_dup_spans",
    # round 4: branch write+suffix read through the SQL front-end, and
    # the sort-rewrite clustering-effect audit (table build + rewrite +
    # metadata self-check — end-to-end by design, like q_merge_sql)
    "q_branch_read_sql",
    "q_zorder_effect",
    # round 4, second wave: incremental ingest dedup — the
    # batch-vs-fingerprint-index verdicts and the cross-side shared
    # inverted index (shuffle ∝ batch, never the corpus)
    "q_dedup_incremental",
    "q_dedup_incremental_ngram",
    # round 4, third wave: SemDeDup-style verdicts over the multi-probe
    # LSH candidate join (ids-only dedup + vector re-join — the widest
    # candidate fan-out in the suite, kept honest here) and its
    # batch-vs-corpus incremental form (two cross-side candidate joins
    # against the reusable banded-signature index)
    "q_dedup_semantic",
    "q_dedup_semantic_incremental",
    # round 5: write-audit-publish end-to-end (branch stage + audit gate
    # + fast_forward publish) and the cluster-scoped SemDeDup form (the
    # linear-at-scale candidate path — watching it keeps the scoping
    # join's plan honest)
    "q_wap_publish",
    "q_dedup_semantic_scoped",
    # round 6: corpus-LM quality filter (two-agg skew-free plan) and
    # SSL-prototype pruning (narrow assignment + per-cluster rank window)
    "q_lm_rare_trigram_filter",
    "q_prototype_prune",
    # round 7: C4-style line dedup (hash-keyed frequency join + per-doc
    # reassembly) and PQ ANN (compressed-code scan + integer ADC)
    "q_line_dedup_clean",
    "q_ann_pq_topk",
    # round 7, second wave: binary-signature ANN (integer Hamming pool +
    # inline cosine rerank), BM25 (term-filtered postings + fixed-order
    # mix + TakeOrderedAndProject), blocked-Levenshtein fuzzy matching,
    # and joinless Bloom decontamination (1 KiB literal filter)
    "q_ann_hamming_topk",
    "q_bm25_topk",
    "q_fuzzy_title_pairs",
    "q_decontaminate_bloom",
    "q_hll_distinct_sketch",
    # round 7, third wave: robust embedding outlier screen (per-dim rank
    # windows over a fixed 64-key space — the suite's only fixed-
    # parallelism window shape) and the strict-order funnel. PageRank
    # canonical stays OUT: 5 localCheckpoint sweeps are ~13 s of
    # deliberate iterative work at sf0.1 — it would read as a headline
    # regression while measuring nothing the parity suite doesn't.
    "q_embedding_outliers",
    "q_event_funnel",
    # round 8: PQ over Lloyd-TRAINED codebooks — the production index
    # form. Training (2 fixed-point refinements, two bounded collects)
    # is index-build work a deployment runs once at ingest, so the
    # per-query split reports it as setup (like q_merge_sql's CTAS).
    "q_ann_pq_trained",
    # round 9: the sampled-training deployment path next to the
    # full-train form — setup (Lloyd on the fixed-hash 1/3 slice) reads
    # ~2x cheaper than q_ann_pq_trained's at equal recall (the seed
    # TopK pass and fixed per-iteration overhead bound the gap at tiny
    # SF; the iteration SCAN itself is the 1/3 term that wins at scale)
    "q_ann_pq_trained_sampled",
    # round 9: the production retrieval composition — ADC shortlist +
    # exact rerank (quantizers/index warm via the query's caches, so
    # this measures the per-query search+rerank path)
    "q_ann_ivfpq_rerank",
    # round 10: the scoped decontamination path (assignment scan +
    # broadcast eval probes — the 100 TB form next to the dense
    # q_decontaminate_semantic baseline, which stays out of the
    # headline; trained quantizer warm via the cache, so this measures
    # the per-screen scoped join)
    "q_decontaminate_semantic_scoped",
]


# --- host calibration (VERDICT r8 #1) -------------------------------------
# Round 8's common-50 wall drifted 1.38x with ZERO code change — pure host
# degradation — so raw seconds are no longer a trustworthy round-over-round
# signal. Two fixed probes measure the host itself each run:
#   * cpu: 8B-row pure-codegen range scan+agg (CPU/scheduler throughput)
#   * scan: 3-column lineitem sum at sf0.1 (parquet decode + IO)
# Every query is reported raw AND normalized (raw / host_factor, where
# host_factor = mean of the probe ratios vs the pinned reference values).
# Reference values pinned 2026-08-16 (round 9) on the then-current host;
# the absolute anchor is arbitrary — only the normalized series' stability
# across hosts matters.
_CALIB_REF_CPU_S = 2.78          # 8B-row probe; pinned round 9
_CALIB_REF_SCAN_S = 0.26
_CALIB_RUNS = 3                  # per phase; probes run BEFORE and AFTER
#                                  the query loop and the min of all six
#                                  samples wins — a short probe's own
#                                  scheduler noise otherwise INJECTS more
#                                  normalized variance than it removes
#                                  (first cut: min-of-3 pre-only varied
#                                  22% run-to-run while raw totals held
#                                  within 5%)


def _calib_probes(spark, sf_dir: str) -> tuple[list[float], list[float]]:
    from iceberg_matrix_spark.sources.testdata import load_table  # noqa: PLC0415

    def cpu() -> float:
        start = time.perf_counter()
        spark.range(0, 8_000_000_000, 1, 32).selectExpr(
            "sum(id % 1000) as a",
            "avg(id % 7) as b",
            "count(if(id % 11 = 0, 1, null)) as c",
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    def scan() -> float:
        start = time.perf_counter()
        load_table(spark, sf_dir, "lineitem").selectExpr(
            "sum(l_extendedprice * (1 - l_discount)) as rev",
            "sum(l_quantity) as q",
            "count(*) as n",
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    return (
        [cpu() for _ in range(_CALIB_RUNS)],
        [scan() for _ in range(_CALIB_RUNS)],
    )


def _calibration_from(samples: list[tuple[list[float], list[float]]],
                      sf: float | None) -> dict:
    cpu_s = min(t for cpus, _ in samples for t in cpus)
    scan_s = min(t for _, scans in samples for t in scans)
    # the factor uses the CPU probe ONLY: the scan probe's min halves
    # between a fresh session and a post-bench one (page cache + JIT
    # state — measured 0.26 cold-pin vs 0.131 post-loop), so folding it
    # in made the factor depend on session history, not the host. It
    # stays in the output as an IO diagnostic.
    factor = cpu_s / _CALIB_REF_CPU_S
    return {
        "cpu_s": round(cpu_s, 3),
        "scan_s": round(scan_s, 3),
        "ref_cpu_s": _CALIB_REF_CPU_S,
        "ref_scan_s": _CALIB_REF_SCAN_S,
        "host_factor": round(factor, 4),
    }


_MEDIAN_WINDOW = 5  # current run + up to 4 trailing same-SF history runs


def _trailing_medians(
    prior_runs: list[dict],
    current: dict[str, float],
    window: int = _MEDIAN_WINDOW,
) -> tuple[dict[str, float], float]:
    """Noise-robust headline statistic (VERDICT r10 #6): the official
    per-round artifact is ONE run, and round 10's was the slowest of
    three same-code runs — the recorded number moved 36% on host mood
    alone. So alongside the raw run, bench emits each query's MEDIAN
    normalized time over the trailing ``window`` same-SF runs
    (including this one), and their sum as ``value_normalized_median``
    — the statistic a one-hour host excursion cannot define, because a
    single outlier run never moves a median over ≥3 samples. A query
    with no history yet reports its current value (median of one).

    Pure function over history dicts — unit-pinned in
    tests/test_bench_tooling.py."""
    import statistics  # noqa: PLC0415

    meds: dict[str, float] = {}
    for q, v in current.items():
        hist = [
            r["queries_normalized"][q]
            for r in prior_runs
            if q in r.get("queries_normalized", {})
        ]
        series = (hist + [v])[-window:]
        meds[q] = round(statistics.median(series), 3)
    return meds, round(sum(meds.values()), 3)


def _history_path() -> str:
    """Repo-root BENCH_HISTORY.jsonl, overridable for tests/ops via
    SPARK_GRAFT_BENCH_HISTORY."""
    return os.environ.get(
        "SPARK_GRAFT_BENCH_HISTORY",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_HISTORY.jsonl"),
    )


def _append_history(record: dict) -> None:
    """Per-query normalized history (BENCH_HISTORY.jsonl, repo root):
    lets any round assert 'normalized delta < X%' against prior runs
    instead of eyeballing raw seconds across host moods."""
    path = _history_path()
    try:
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass  # bench output is the contract; history is best-effort


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="imx-bench", adaptive=True)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a tiny scale so per-query timings measure the
    # plan, not first-run JIT.
    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    calib_pre = _calib_probes(spark, sf_dir)

    # Three timed passes per query, report the min: at bench SF the data
    # is tiny and wall-clock is dominated by scheduling overhead + host
    # noise (observed 1.5x run-to-run spread on identical code); min-of-3
    # warm timings measures the plan, not the noise (raised from
    # min-of-2 in round 9 — VERDICT r8 #1).
    # Table-building DML queries measure setup (CTAS) and the DML itself
    # separately, so a MERGE regression can't hide inside CTAS noise. The
    # "queries" entry stays the end-to-end time (comparable with earlier
    # rounds); "splits" carries the breakdown.
    from iceberg_matrix_spark.queries.relational import (  # noqa: PLC0415
        _branch_sql_exec,
        _branch_sql_setup,
        _merge_sql_exec,
        _merge_sql_setup,
        _wap_publish_exec,
        _wap_publish_setup,
        _zorder_effect_exec,
        _zorder_effect_setup,
    )

    from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
        _pq_sampled_exec,
        _pq_sampled_setup,
        _pq_trained_exec,
        _pq_trained_setup,
        _semantic_incremental_exec,
        _semantic_incremental_setup,
        _semantic_scoped_exec,
        _semantic_scoped_setup,
    )

    SPLIT_DML = {
        "q_merge_sql": (_merge_sql_setup, _merge_sql_exec),
        "q_branch_read_sql": (_branch_sql_setup, _branch_sql_exec),
        "q_zorder_effect": (_zorder_effect_setup, _zorder_effect_exec),
        # setup = two CTAS table builds; query = the WAP protocol itself
        # (branch + insert + audit count + fast_forward + 3 reads) — the
        # CTAS noise polluted the headline as a phantom 1.67x r8→r9
        # "regression" (VERDICT r9 What's-wrong #3)
        "q_wap_publish": (_wap_publish_setup, _wap_publish_exec),
        # not DML, same amortization honesty: setup = corpus signature
        # index build (ingest-side, persisted across batches in a real
        # pipeline), query = per-batch dedup against the warm index
        "q_dedup_semantic_incremental": (
            _semantic_incremental_setup,
            _semantic_incremental_exec,
        ),
        # setup = coarse-quantizer (centroid) build — a once-per-corpus
        # index, amortized across every scoped-dedup query in production
        "q_dedup_semantic_scoped": (
            _semantic_scoped_setup,
            _semantic_scoped_exec,
        ),
        # setup = Lloyd codebook training — once-per-corpus index work
        "q_ann_pq_trained": (_pq_trained_setup, _pq_trained_exec),
        # setup = SAMPLED Lloyd training (the deployment build path)
        "q_ann_pq_trained_sampled": (_pq_sampled_setup, _pq_sampled_exec),
    }

    timings: dict[str, float] = {}
    splits: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        if name in SPLIT_DML:
            setup_fn, exec_fn = SPLIT_DML[name]
            # headline number = min over runs of the SAME run's end-to-end
            # time (comparable with pre-split rounds); mixing min(setup)
            # and min(query) from different runs would report a time no
            # actual run achieved
            best_total = float("inf")
            best_split: dict[str, float] = {}
            for _ in range(3):
                start = time.perf_counter()
                handle = setup_fn(spark, sf_dir)
                setup_s = time.perf_counter() - start
                start = time.perf_counter()
                exec_fn(handle).write.format("noop").mode("overwrite").save()
                query_s = time.perf_counter() - start
                if setup_s + query_s < best_total:
                    best_total = setup_s + query_s
                    best_split = {
                        "setup_s": round(setup_s, 3),
                        "query_s": round(query_s, 3),
                    }
            splits[name] = best_split
            timings[name] = round(best_total, 3)
            continue
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    calib_post = _calib_probes(spark, sf_dir)
    calibration = _calibration_from([calib_pre, calib_post], sf)
    host_factor = calibration["host_factor"]

    total = round(sum(timings.values()), 3)
    normalized = {n: round(t / host_factor, 3) for n, t in timings.items()}
    total_norm = round(sum(normalized.values()), 3)
    try:
        prior = [
            json.loads(line) for line in open(_history_path()) if line.strip()
        ]
    except OSError:
        prior = []
    med_q, med_total = _trailing_medians(
        [r for r in prior if r.get("sf") == sf], normalized
    )
    out = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_normalized": normalized,
        "value_normalized": total_norm,
        # the robust statistic (VERDICT r10 #6): per-query trailing
        # medians over the last 5 same-SF runs incl. this one — read
        # THIS for round-over-round comparisons, not the single run
        "queries_normalized_median": med_q,
        "value_normalized_median": med_total,
        "calibration": calibration,
        "splits": splits,
        "sf": sf,
    }
    print(json.dumps(out))
    import datetime  # noqa: PLC0415

    _append_history(
        {
            "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"
            ),
            "sf": sf,
            "calibration": calibration,
            "value": total,
            "value_normalized": total_norm,
            "value_normalized_median": med_total,
            "queries_normalized": normalized,
        }
    )
    spark.stop()


def scale_sweep() -> None:
    """Empirical 1×/10×/100× sweep of the dedup/ANN families
    (operators/sweep.py): wall-clock + shuffle bytes + peak stage tasks
    per (family, factor). Feeds SCALING.md; not part of the driver's
    one-line bench contract (plain `python bench.py` is unchanged)."""
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    factors = tuple(
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SWEEP_FACTORS", "1,10,100").split(",")
    )
    spark = get_spark(
        app_name="imx-scale-sweep",
        adaptive=True,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4057",
            # Measured round 10 (chunk_dedup @100×): heap 8g → 92 s wall
            # with 3.5 GB disk spill; 16g → 147 s / 3.0 GB; 24g → 192 s /
            # 0.1 GB; 48g → 248 s spill-free. The "spill" is the
            # sort-aggregation's working set rotating through disk
            # (collect_list falls back to sort-based past 128 keys —
            # spark.sql.objectHashAggregate.sortBased.fallbackThreshold),
            # and forcing it resident just trades cheap sequential disk
            # for GC pressure: the spilly default is 2.5× FASTER. So the
            # sweep keeps the default heap and REPORTS spill per row
            # instead of hiding it; override to reproduce the trade.
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_SWEEP_MEM",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_matrix_spark.operators.sweep import run_scale_sweep  # noqa: PLC0415

    fams = os.environ.get("SPARK_GRAFT_SWEEP_FAMILIES")
    with tempfile.TemporaryDirectory(prefix="imx-sweep-") as workdir:
        rows = run_scale_sweep(
            spark,
            sf_dir,
            workdir,
            factors,
            families=fams.split(",") if fams else None,
        )
    print(
        json.dumps(
            {
                "metric": "scale_sweep",
                "unit": "mixed",
                "sf": sf,
                "factors": list(factors),
                "rows": rows,
            }
        )
    )
    spark.stop()


def _per_query_flags(
    runs: list[dict], ratio: float = 2.0, min_history: int = 2
) -> dict[str, dict]:
    """Per-query drift localization (VERDICT r9 #3): the compound
    TOTAL-level gate passes a single query doubling inside a flat
    total, so each query is also compared to its OWN trailing median.

    A query flags only when, in EACH of the last two runs, its time
    exceeded ``ratio``× the median of all strictly-earlier same-SF runs
    in BOTH views — normalized (host-corrected) and raw (normalized ×
    that run's host_factor). The two-consecutive-runs persistence
    requirement is what separates a real regression from the documented
    same-code noise (per-query spread up to 2.6× in ONE run, but two
    independent ≥2× excursions of the same query back-to-back is not a
    host mood); the both-views requirement keeps a probe overshoot
    (normalized doubles while raw is flat) from false-alarming, same as
    the total gate. Needs ≥ ``min_history`` prior runs per gated run —
    with a short history the gate is silently inactive (the total-level
    compound gate still applies)."""
    import statistics  # noqa: PLC0415

    flags: dict[str, dict] = {}
    if len(runs) < min_history + 2:
        return flags

    def norm(run: dict, q: str):
        return run.get("queries_normalized", {}).get(q)

    def raw(run: dict, q: str):
        v = norm(run, q)
        f = run.get("calibration", {}).get("host_factor", 1.0)
        return None if v is None else v * f

    for q in runs[-1].get("queries_normalized", {}):
        ratios = []
        for idx in (len(runs) - 2, len(runs) - 1):
            cur_n, cur_r = norm(runs[idx], q), raw(runs[idx], q)
            prior_n = [v for r in runs[:idx] if (v := norm(r, q)) is not None]
            prior_r = [v for r in runs[:idx] if (v := raw(r, q)) is not None]
            if cur_n is None or len(prior_n) < min_history:
                ratios = []
                break
            med_n, med_r = statistics.median(prior_n), statistics.median(prior_r)
            if not (med_n > 0 and med_r > 0
                    and cur_n > ratio * med_n and cur_r > ratio * med_r):
                ratios = []
                break
            ratios.append((round(cur_n / med_n, 2), round(cur_r / med_r, 2)))
        if ratios:
            flags[q] = {
                "normalized_x_median": ratios[-1][0],
                "raw_x_median": ratios[-1][1],
                "runs_flagged": 2,
            }
    return flags


def check_drift(threshold_pct: float = 10.0) -> None:
    """Compare the last two BENCH_HISTORY.jsonl entries at the same SF.

    COMPOUND gate (the assertion VERDICT r8 #1 wanted, hardened): a real
    code regression slows the common-query total in BOTH views — RAW
    (same host) and NORMALIZED (host-corrected) — so the check fails
    only when BOTH regressed past ``threshold_pct``. Either view alone
    false-alarms: raw fails on a genuinely slower host day (the r8
    1.38x drift), normalized fails when the host SPEEDS UP between runs
    and the CPU probe over-responds relative to the scheduler-bound
    tiny-SF queries (observed: raw −14% read as normalized +28%).
    Known limit: a regression exactly masked by a same-size host
    improvement passes once and surfaces in the next normalized pair.
    Runnable without a Spark session:
    ``python bench.py --check-drift [pct]``."""
    entries = [json.loads(line) for line in open(_history_path()) if line.strip()]
    by_sf: dict[float, list[dict]] = {}
    for e in entries:
        by_sf.setdefault(e.get("sf"), []).append(e)
    sf, runs = max(by_sf.items(), key=lambda kv: len(kv[1]))
    if len(runs) < 2:
        print(json.dumps({"metric": "bench_drift", "error": "need 2 runs"}))
        sys.exit(2)

    def totals(run):
        norm = run["queries_normalized"]
        f = run["calibration"]["host_factor"]
        return norm, {q: v * f for q, v in norm.items()}

    (pn, pr), (cn, cr) = totals(runs[-2]), totals(runs[-1])
    common = sorted(set(pn) & set(cn))

    def delta(prev, cur):
        tp = sum(prev[q] for q in common)
        tc = sum(cur[q] for q in common)
        return tp, tc, ((tc - tp) / tp * 100 if tp else 0.0)

    np_, nc_, norm_delta = delta(pn, cn)
    _, _, raw_delta = delta(pr, cr)
    worst = sorted(
        ((q, (cn[q] - pn[q]) / pn[q] * 100 if pn[q] else 0.0)
         for q in common),
        key=lambda x: -abs(x[1]),
    )[:5]
    per_query = _per_query_flags(runs)
    total_ok = norm_delta <= threshold_pct or raw_delta <= threshold_pct
    ok = total_ok and not per_query
    print(json.dumps({
        "metric": "bench_drift",
        "sf": sf,
        "n_common": len(common),
        "normalized_total_prev_s": round(np_, 3),
        "normalized_total_cur_s": round(nc_, 3),
        "normalized_delta_pct": round(norm_delta, 2),
        "raw_delta_pct": round(raw_delta, 2),
        "threshold_pct": threshold_pct,
        "ok": ok,
        "per_query_flags": per_query,
        "worst_queries": {q: round(d, 1) for q, d in worst},
    }))
    sys.exit(0 if ok else 1)


def check_test_drift(ratio: float = 2.0) -> None:
    """Flag pytest FILES whose duration is ballooning (VERDICT r9 #8).

    Reads TEST_DURATIONS.jsonl (written per full-suite run by
    tests/conftest.py). A file flags only when, in the latest run, BOTH
    its absolute seconds AND its seconds RELATIVE TO THE REST OF THE
    SUITE (secs / (total − secs) — unbounded, unlike a share of total)
    exceed ``ratio``× their trailing medians over the prior runs. The
    relative signal is host-invariant — a slow host inflates every file
    equally, leaving the ratio untouched, while a genuinely ballooning
    family shifts it — the same two-signal structure as the bench gate.
    Needs ≥3 runs; silently OK below that. ``python bench.py
    --check-test-drift [ratio]``."""
    import statistics  # noqa: PLC0415

    path = os.environ.get(
        "SPARK_GRAFT_TEST_DURATIONS",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "TEST_DURATIONS.jsonl"),
    )
    try:
        runs = [json.loads(line) for line in open(path) if line.strip()]
    except OSError:
        print(json.dumps({"metric": "test_drift", "error": "no history"}))
        sys.exit(2)
    if len(runs) < 3:
        print(json.dumps({"metric": "test_drift", "ok": True,
                          "n_runs": len(runs), "note": "need 3 runs"}))
        sys.exit(0)
    cur, prior = runs[-1], runs[:-1]

    def rel(run: dict, f: str):
        rest = run.get("total_s", 0) - run["files"][f]
        return run["files"][f] / rest if rest > 0 else None

    flags = {}
    for f, secs in cur["files"].items():
        hist = [r["files"][f] for r in prior if f in r.get("files", {})]
        hist_rel = [
            v
            for r in prior
            if f in r.get("files", {}) and (v := rel(r, f)) is not None
        ]
        cur_rel = rel(cur, f)
        if len(hist) < 2 or len(hist_rel) < 2 or cur_rel is None:
            continue
        med, med_rel = statistics.median(hist), statistics.median(hist_rel)
        if med > 0 and med_rel > 0 and secs > ratio * med and \
                cur_rel > ratio * med_rel:
            flags[f] = {
                "seconds": secs,
                "x_median": round(secs / med, 2),
                "rel_x_median": round(cur_rel / med_rel, 2),
            }
    print(json.dumps({
        "metric": "test_drift",
        "n_runs": len(runs),
        "total_s": cur.get("total_s"),
        "ratio": ratio,
        "ok": not flags,
        "flags": flags,
    }))
    sys.exit(0 if not flags else 1)


if __name__ == "__main__":
    if "--scale-sweep" in sys.argv[1:]:
        scale_sweep()
    elif "--check-drift" in sys.argv[1:]:
        args = [a for a in sys.argv[1:] if a != "--check-drift"]
        check_drift(float(args[0]) if args else 10.0)
    elif "--check-test-drift" in sys.argv[1:]:
        args = [a for a in sys.argv[1:] if a != "--check-test-drift"]
        check_test_drift(float(args[0]) if args else 2.0)
    else:
        main()
