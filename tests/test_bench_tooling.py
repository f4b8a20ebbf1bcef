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
