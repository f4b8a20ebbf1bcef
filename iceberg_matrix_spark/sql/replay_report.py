"""One-shot runner for all five reference-suite verbatim replays.

``python -m iceberg_matrix_spark.sql.replay_report`` executes the
reference's own statements — the Spark suite's 200 ``spark.sql``
literals, the ClickHouse suite's Spark fixtures + ``icebergLocal``
reads, the Flink suite's batch `_run_sql` lists, the Redshift suite's
Data-API statement lists, and the DuckDB suite's ``con.execute``
statements — through :class:`~iceberg_matrix_spark.sql.facade.
IceLiteSQL`, each checked against that suite's OWN asserts (golden
outcome maps / marker matchers / substring checks / fetched values),
and writes ``replay_report.json`` + ``replay_report.md``.

The per-suite exclusion lists (functions not replayed, each with its
reason — streaming runtimes, engine-default divergences, loop-variable
statement lists, env-blocked fixtures) are part of the report, so the
scope is auditable rather than implied.
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import SparkSession


def run_replays(spark: SparkSession) -> dict:
    from iceberg_matrix_spark.sql import (  # noqa: PLC0415
        replay,
        replay_clickhouse,
        replay_duckdb,
        replay_flink,
        replay_redshift,
    )
    from iceberg_matrix_spark.tables.catalog import IceLiteCatalog  # noqa: PLC0415

    suites: dict[str, dict] = {}

    s = replay.replay_all(
        spark, IceLiteCatalog(spark, tempfile.mkdtemp(prefix="replay-wh-"))
    )
    suites["spark"] = {
        "statements": s["replayed"],
        "ok": s["ok"],
        "expected_rejections": s["rejected"],
        "skipped_nonliteral": s["skipped_nonliteral"],
        "unexpected": [
            (o.func, o.version, o.index, o.status, o.detail)
            for o in s["unexpected"]
        ],
        "unaccounted": [],
        "excluded": {},
    }

    s = replay_clickhouse.replay_all(
        spark, tempfile.mkdtemp(prefix="ch-replay-wh-")
    )
    suites["clickhouse"] = {
        "functions": s["functions"],
        "statements": s["ch_statements"],
        "unexpected": s["mismatches"],
        "unaccounted": [],
        "excluded": {},
    }

    s = replay_flink.replay_all(
        spark, IceLiteCatalog(spark, tempfile.mkdtemp(prefix="flink-wh-"))
    )
    suites["flink"] = {
        "functions": s["functions"],
        "statements": s["batches_replayed"],
        "unexpected": s["mismatches"],
        "unaccounted": s["unaccounted"],
        "excluded": dict(replay_flink.EXCLUDED),
    }

    s = replay_redshift.replay_all(
        spark, IceLiteCatalog(spark, tempfile.mkdtemp(prefix="rs-wh-"))
    )
    suites["redshift"] = {
        "functions": s["functions"],
        "statements": s["batches_replayed"],
        "unexpected": s["mismatches"],
        "unaccounted": s["unaccounted"],
        "excluded": dict(replay_redshift.EXCLUDED),
    }

    s = replay_duckdb.replay_all(spark, tempfile.mkdtemp(prefix="dk-wh-"))
    suites["duckdb"] = {
        "functions": s["functions"],
        "statements": s["statements_replayed"],
        "unexpected": s["mismatches"],
        "unaccounted": s["unaccounted"],
        "skipped_nonliteral": s["skipped_nonliteral"],
        "excluded": dict(replay_duckdb.EXCLUDED),
    }

    # the verdict covers COVERAGE too: a reference function that is
    # neither replayed nor excluded-with-reason must fail the report —
    # "on golden" may never mean "silently not replayed"
    ok = all(
        not v["unexpected"] and not v["unaccounted"] for v in suites.values()
    )
    return {"ok": ok, "suites": suites}


def render_markdown(report: dict) -> str:
    lines = [
        "# Reference-suite verbatim replay",
        "",
        "| Suite | Statements replayed | Off-golden | Unaccounted | Excluded functions |",
        "|---|---|---|---|---|",
    ]
    for name, s in report["suites"].items():
        lines.append(
            f"| {name} | {s['statements']} | {len(s['unexpected'])} "
            f"| {len(s['unaccounted'])} | {len(s['excluded'])} |"
        )
    lines.append("")
    for name, s in report["suites"].items():
        if s["excluded"]:
            lines.append(f"## {name}: excluded (with reasons)")
            for func, why in s["excluded"].items():
                lines.append(f"- `{func}` — {why}")
            lines.append("")
        if s["unexpected"]:
            lines.append(f"## {name}: OFF GOLDEN")
            for row in s["unexpected"]:
                lines.append(f"- {row}")
            lines.append("")
        if s["unaccounted"]:
            lines.append(f"## {name}: UNACCOUNTED reference functions")
            for func in s["unaccounted"]:
                lines.append(f"- `{func}` — neither replayed nor excluded")
            lines.append("")
    lines.append("**" + ("ALL SUITES ON GOLDEN" if report["ok"] else "MISMATCHES PRESENT") + "**")
    return "\n".join(lines)


def main() -> int:
    from iceberg_matrix_spark import get_spark

    spark = get_spark(app_name="icelite-replay", shuffle_partitions=8)
    try:
        report = run_replays(spark)
    finally:
        spark.stop()
    with open("replay_report.json", "w") as f:
        json.dump(report, f, indent=2, default=str)
    with open("replay_report.md", "w") as f:
        f.write(render_markdown(report))
    totals = {
        name: s["statements"] for name, s in report["suites"].items()
    }
    print(json.dumps(totals) + (" OK" if report["ok"] else " FAILED"))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
