from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_matrix_spark import get_spark  # noqa: E402

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="imx-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return ORACLE_SF_DIR


# ---------------------------------------------------------- jvm flake retry
# A long-lived local JVM very rarely throws java.io.OptionalDataException
# inside task deserialization when a streaming trigger thread races
# main-thread job submission (observed once ~9 000 stages into round 7's
# shared session, COVERAGE.md "Known flake"; green on every fresh run).
# Tests marked @pytest.mark.jvm_flake_retry get ONE rerun, and only when
# the failure text carries that exact signature — any other failure in
# the same tests still fails the suite on the first attempt.
_JVM_FLAKE_SIG = "OptionalDataException"


def pytest_runtest_protocol(item, nextitem):
    if item.get_closest_marker("jvm_flake_retry") is None:
        return None
    from _pytest.runner import runtestprotocol

    item.ihook.pytest_runtest_logstart(
        nodeid=item.nodeid, location=item.location
    )
    reports = runtestprotocol(item, nextitem=nextitem, log=False)
    flaked = any(
        r.failed and _JVM_FLAKE_SIG in (getattr(r, "longreprtext", "") or "")
        for r in reports
    )
    if flaked:
        import sys

        print(
            f"\n[jvm-flake] {item.nodeid}: {_JVM_FLAKE_SIG} in the shared "
            "JVM (known artifact) — healing data-source wrappers + one "
            "fresh retry",
            file=sys.stderr,
        )
        # HEAL before retrying (round-10 diagnosis): the artifact can be
        # a PERMANENTLY corrupted shared env-vars map inside a Python
        # data source's JVM wrapper — re-running against the same wrapper
        # just fails again (observed: 3 tail-source tests failing through
        # their retries in one run). Re-registration replaces the wrapper.
        try:
            from iceberg_matrix_spark.session import reregister_data_sources

            spark = item.funcargs.get("spark")
            if spark is not None:
                healed = reregister_data_sources(spark)
                print(f"[jvm-flake] re-registered: {healed}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — healing is best-effort
            print(f"[jvm-flake] heal skipped: {e}", file=sys.stderr)
        reports = runtestprotocol(item, nextitem=nextitem, log=False)
    for r in reports:
        item.ihook.pytest_runtest_logreport(report=r)
    item.ihook.pytest_runtest_logfinish(
        nodeid=item.nodeid, location=item.location
    )
    return True


# ---------------------------------------------------------------- budget
# Wall-clock budget watch (VERDICT r5 #7): the suite must stay inside the
# reference's 30-min CI envelope. The slowest-10 report is always printed
# (pytest.ini adds --durations=10); past the SOFT budget the summary
# carries a loud warning so growth is visible rounds before it busts the
# envelope. A soft warning, not a failure: a busy host's noise must not
# turn a green suite red.
_SUITE_BUDGET_S = 25 * 60
_suite_t0: float | None = None


def pytest_sessionstart(session):
    import time

    global _suite_t0
    _suite_t0 = time.monotonic()


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    import time

    if _suite_t0 is None:
        return
    elapsed = time.monotonic() - _suite_t0
    line = f"suite wall-clock: {elapsed / 60:.1f} min (soft budget 25 min)"
    if elapsed > _SUITE_BUDGET_S:
        terminalreporter.write_sep(
            "!", f"BUDGET EXCEEDED — {line}; trim fixtures before adding more"
        )
    else:
        terminalreporter.write_sep("-", line)


# ------------------------------------------------- per-file duration history
# VERDICT r9 #8: the suite wall swung 25m → 17m41s across rounds on
# identical code purely with host health, so absolute suite time can't
# distinguish a genuinely ballooning test family from a slow day. Record
# per-FILE durations per run into TEST_DURATIONS.jsonl (repo root,
# override via SPARK_GRAFT_TEST_DURATIONS); `python bench.py
# --check-test-drift` flags a file whose duration AND suite share both
# exceed 2× their trailing medians — the share signal is host-invariant
# (a slow host scales every file; a ballooning family changes its share),
# the same two-signal idea as the bench's raw+normalized gate. Recording
# triggers only on full-suite-sized runs (≥20 files) so targeted
# developer invocations don't pollute the history.
_file_durations: dict[str, float] = {}


def pytest_runtest_logreport(report):
    if report.when in ("setup", "call", "teardown"):
        path = report.nodeid.split("::", 1)[0]
        _file_durations[path] = _file_durations.get(path, 0.0) + (
            report.duration or 0.0
        )


def pytest_sessionfinish(session, exitstatus):
    import datetime
    import json

    if len(_file_durations) < 20 and not os.environ.get(
        "SPARK_GRAFT_TEST_DURATIONS_FORCE"
    ):
        return
    path = os.environ.get(
        "SPARK_GRAFT_TEST_DURATIONS",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "TEST_DURATIONS.jsonl",
        ),
    )
    record = {
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "total_s": round(sum(_file_durations.values()), 2),
        "files": {f: round(s, 2) for f, s in sorted(_file_durations.items())},
    }
    try:
        with open(path, "a") as fh:
            fh.write(json.dumps(record) + "\n")
    except OSError:
        pass  # history is best-effort; the suite result is the contract
