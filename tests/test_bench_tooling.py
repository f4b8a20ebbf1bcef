"""The bench's measurement contract (round 9): calibration math and the
drift gate are part of the harness's trustworthiness — pin them without
a Spark session."""

from __future__ import annotations

import json
import subprocess
import sys


def _hist_entry(utc, queries, factor):
    return {
        "utc": utc,
        "sf": 0.1,
        "calibration": {"cpu_s": round(2.78 * factor, 3), "ref_cpu_s": 2.78,
                        "host_factor": factor},
        "value": round(sum(queries.values()) * factor, 3),
        "value_normalized": round(sum(queries.values()), 3),
        "queries_normalized": queries,
    }


def _run_drift(tmp_path, entries, pct="10"):
    import os

    hist = tmp_path / "BENCH_HISTORY.jsonl"
    hist.write_text("".join(json.dumps(e) + "\n" for e in entries))
    out = subprocess.run(
        [sys.executable, "bench.py", "--check-drift", pct],
        capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_BENCH_HISTORY": str(hist)},
    )
    assert out.stdout.strip(), out.stderr
    return out.returncode, json.loads(out.stdout.strip().splitlines()[-1])


def test_check_drift_passes_inside_threshold(tmp_path):
    a = _hist_entry("2026-08-16T10:00:00+00:00", {"q1": 10.0, "q2": 5.0}, 1.0)
    b = _hist_entry("2026-08-16T11:00:00+00:00", {"q1": 10.5, "q2": 5.2}, 1.0)
    rc, rep = _run_drift(tmp_path, [a, b])
    assert rc == 0 and rep["ok"] and abs(rep["normalized_delta_pct"]) < 10
    assert rep["n_common"] == 2


def test_check_drift_fails_when_both_views_regress(tmp_path):
    """Same host factor, +37% on every query: raw AND normalized agree
    it is a code regression — the compound gate must fire."""
    a = _hist_entry("2026-08-16T10:00:00+00:00", {"q1": 10.0, "q2": 5.0}, 1.0)
    b = _hist_entry("2026-08-16T11:00:00+00:00", {"q1": 14.0, "q2": 6.5}, 1.0)
    rc, rep = _run_drift(tmp_path, [a, b])
    assert rc == 1 and not rep["ok"]
    assert rep["normalized_delta_pct"] > 10 and rep["raw_delta_pct"] > 10
    assert "q1" in rep["worst_queries"]


def test_check_drift_tolerates_host_speedup_probe_overshoot(tmp_path):
    """The observed false-alarm shape: the host speeds up, the CPU probe
    over-responds (factor 1.0 → 0.69) so NORMALIZED reads +28% while
    RAW actually improved — one healthy view must keep the gate green."""
    a = _hist_entry("2026-08-16T10:00:00+00:00", {"q1": 10.0, "q2": 5.0}, 1.0)
    b = _hist_entry("2026-08-16T11:00:00+00:00",
                    {"q1": 12.6, "q2": 6.6}, 0.69)  # raw = norm*0.69 < prev
    rc, rep = _run_drift(tmp_path, [a, b])
    assert rc == 0 and rep["ok"]
    assert rep["normalized_delta_pct"] > 10 and rep["raw_delta_pct"] < 0


def test_check_drift_compares_common_queries_only(tmp_path):
    """A query added or removed between runs must not poison the delta —
    only the intersection is compared (the round-9 headline grew by 3
    queries; without this the gate would read growth as regression)."""
    a = _hist_entry("2026-08-16T10:00:00+00:00", {"q1": 10.0}, 1.0)
    b = _hist_entry("2026-08-16T11:00:00+00:00",
                    {"q1": 10.1, "q_new": 99.0}, 1.0)
    rc, rep = _run_drift(tmp_path, [a, b])
    assert rc == 0 and rep["ok"] and rep["n_common"] == 1


def _history_runs(series_by_query, factors=None):
    """Build chronological history entries from per-query time series:
    series_by_query = {"q1": [t0, t1, ...], ...}; factors optionally
    gives each run's host_factor (default 1.0)."""
    n = len(next(iter(series_by_query.values())))
    factors = factors or [1.0] * n
    return [
        _hist_entry(
            f"2026-08-16T{10 + i:02d}:00:00+00:00",
            {q: s[i] for q, s in series_by_query.items()},
            factors[i],
        )
        for i in range(n)
    ]


def test_per_query_gate_trips_on_persistent_single_query_regression(tmp_path):
    """VERDICT r9 #3's target shape: ONE query doubles while the total
    stays flat (another query shrinks to mask it) — the total-level
    compound gate alone would pass; the per-query gate must trip."""
    runs = _history_runs({
        "q_slow": [2.0, 2.1, 1.9, 2.0, 5.0, 5.2],   # >2x its median, twice
        "q_big":  [20.0, 19.8, 20.2, 20.0, 17.0, 16.8],  # masks the total
    })
    rc, rep = _run_drift(tmp_path, runs)
    assert rc == 1 and not rep["ok"]
    assert "q_slow" in rep["per_query_flags"]
    assert "q_big" not in rep["per_query_flags"]
    assert rep["normalized_delta_pct"] < 10  # total gate alone was green


def test_per_query_gate_ignores_one_run_noise_spike(tmp_path):
    """The documented same-code noise shape (per-query spread up to
    2.6x in a single run): a spike that does NOT persist across two
    consecutive runs must not trip the gate."""
    runs = _history_runs({
        "q_noisy": [2.0, 2.1, 1.9, 2.0, 5.2, 2.0],  # spike, then back
        "q_big":   [20.0, 19.8, 20.2, 20.0, 20.1, 19.9],
    })
    rc, rep = _run_drift(tmp_path, runs)
    assert rc == 0 and rep["ok"] and rep["per_query_flags"] == {}


def test_per_query_gate_ignores_probe_overshoot_profile(tmp_path):
    """Replayed host-noise profile: the host speeds up (factor 1.0 →
    0.45) and the probe over-responds, so NORMALIZED times double while
    raw seconds are flat — normalized-only excursions must not trip
    (both views are required, same as the total gate)."""
    runs = _history_runs(
        {
            "q1": [2.0, 2.1, 1.9, 2.0, 4.4, 4.5],  # normalized doubles...
            "q2": [5.0, 5.1, 4.9, 5.0, 11.0, 11.1],
        },
        factors=[1.0, 1.0, 1.0, 1.0, 0.45, 0.45],  # ...but raw is flat
    )
    rc, rep = _run_drift(tmp_path, runs)
    assert rep["per_query_flags"] == {}


def test_per_query_gate_inactive_on_short_history(tmp_path):
    """With fewer than 4 same-SF runs there is no trailing median to
    trust — the per-query gate stays silent and the total-level
    compound gate is the only arbiter (backward compatible with the
    existing two-entry histories)."""
    runs = _history_runs({"q1": [2.0, 2.1], "q2": [5.0, 5.1]})
    rc, rep = _run_drift(tmp_path, runs)
    assert rc == 0 and rep["ok"] and rep["per_query_flags"] == {}


def _run_test_drift(tmp_path, runs, ratio=None):
    import os

    hist = tmp_path / "TEST_DURATIONS.jsonl"
    hist.write_text("".join(json.dumps(r) + "\n" for r in runs))
    cmd = [sys.executable, "bench.py", "--check-test-drift"]
    if ratio:
        cmd.append(str(ratio))
    out = subprocess.run(
        cmd, capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_TEST_DURATIONS": str(hist)},
    )
    return out.returncode, json.loads(out.stdout.strip().splitlines()[-1])


def _test_run(files):
    return {"utc": "2026-08-16T10:00:00+00:00",
            "total_s": round(sum(files.values()), 2), "files": files}


def test_test_drift_flags_ballooning_file(tmp_path):
    """A file that doubles while the rest of the suite holds must flag:
    both its seconds and its suite share exceed 2x their medians."""
    runs = [
        _test_run({"tests/test_a.py": 100.0, "tests/test_b.py": 50.0}),
        _test_run({"tests/test_a.py": 105.0, "tests/test_b.py": 48.0}),
        _test_run({"tests/test_a.py": 98.0, "tests/test_b.py": 52.0}),
        _test_run({"tests/test_a.py": 101.0, "tests/test_b.py": 160.0}),
    ]
    rc, rep = _run_test_drift(tmp_path, runs)
    assert rc == 1 and not rep["ok"]
    assert "tests/test_b.py" in rep["flags"]
    assert "tests/test_a.py" not in rep["flags"]


def test_test_drift_ignores_uniform_host_slowdown(tmp_path):
    """The round 8->9 shape (25m -> 17m41s on identical code): every
    file scaling together is host health, not a ballooning family — the
    share signal stays flat, so nothing flags even when absolute
    seconds exceed 2x."""
    runs = [
        _test_run({"tests/test_a.py": 100.0, "tests/test_b.py": 50.0}),
        _test_run({"tests/test_a.py": 102.0, "tests/test_b.py": 49.0}),
        _test_run({"tests/test_a.py": 98.0, "tests/test_b.py": 51.0}),
        _test_run({"tests/test_a.py": 250.0, "tests/test_b.py": 125.0}),
    ]
    rc, rep = _run_test_drift(tmp_path, runs)
    assert rc == 0 and rep["ok"] and rep["flags"] == {}


def test_test_drift_silent_on_short_history(tmp_path):
    runs = [
        _test_run({"tests/test_a.py": 100.0}),
        _test_run({"tests/test_a.py": 300.0}),
    ]
    rc, rep = _run_test_drift(tmp_path, runs)
    assert rc == 0 and rep["ok"]


def test_trailing_median_is_outlier_proof(tmp_path):
    """VERDICT r10 #6: the official artifact must be a statistic one
    slow host hour cannot define. Pin the math: per-query median over
    the trailing window (history + current), sum as the headline; a
    single 3x outlier run leaves the median untouched; a new query with
    no history reports its current value; only the last `window` runs
    count (an old regime ages out)."""
    from bench import _trailing_medians

    hist = [
        _hist_entry("t0", {"q1": 10.0, "q2": 4.0}, 1.0),
        _hist_entry("t1", {"q1": 10.2, "q2": 4.2}, 1.0),
        _hist_entry("t2", {"q1": 9.8, "q2": 3.8}, 1.0),
    ]
    # current run is a broad 3x excursion -> medians hold at history
    meds, total = _trailing_medians(hist, {"q1": 30.0, "q2": 12.0})
    assert meds == {"q1": 10.1, "q2": 4.1}
    assert total == 14.2
    # a brand-new query reports its own value (median of one)
    meds, _ = _trailing_medians(hist, {"q_new": 7.5})
    assert meds == {"q_new": 7.5}
    # windowing: with window=3, the two oldest runs age out ->
    # median of (9.8, 30.0 current) on a 2-sample series
    meds, _ = _trailing_medians(
        hist, {"q1": 30.0}, window=2
    )
    assert meds == {"q1": 19.9}  # median of [9.8, 30.0]
    # and the median NEVER invents a value below every observation
    meds, _ = _trailing_medians([], {"q1": 2.5})
    assert meds == {"q1": 2.5}
