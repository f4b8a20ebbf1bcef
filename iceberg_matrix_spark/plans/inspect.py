"""Physical-plan inspection: the feedback loop for plan quality.

Every operator in this repo is held to plan-shape invariants — filters
reach the parquet scan, projections prune the read schema, dimension
joins broadcast, shuffles are counted — and tests/test_plans.py pins
them so a refactor that silently de-optimizes a plan fails CI. This is
the `.explain("formatted")` loop from the build brief, mechanized.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (what
    df.explain("formatted") prints).

    maxMetadataStringLength is raised for the call: the 100-char default
    truncates ReadSchema to "... N more fields", which would make
    negative pruning assertions ("l_comment not read") pass vacuously."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    spark.conf.set(key, "10000")
    try:
        jvm = spark._jvm
        return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    finally:
        spark.conf.set(key, old)


def _split_top_level(body: str) -> list[str]:
    """Split a filter list on commas outside BOTH parens and brackets —
    In(col, [1,3,5]) must stay one entry."""
    out, start, pd, bd = [], 0, 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            pd += 1
        elif ch == ")":
            pd -= 1
        elif ch == "[":
            bd += 1
        elif ch == "]":
            bd -= 1
        elif ch == "," and pd == 0 and bd == 0:
            out.append(body[start:i].strip())
            start = i + 1
    tail = body[start:].strip()
    if tail:
        out.append(tail)
    return out


def pushed_filters(df: DataFrame) -> list[list[str]]:
    """Per-scan PushedFilters lists, in plan order. Bracket-aware: an
    In(col, [v1,v2,...]) filter contains ']' and commas, so the list is
    taken to the line's LAST bracket and split at top level only."""
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*)\]", explain_formatted(df)):
        body = m.group(1).strip()
        out.append([] if not body else _split_top_level(body))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Per-scan ReadSchema struct strings, in plan order."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", explain_formatted(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan set of column names actually read from parquet."""
    cols = []
    for schema in read_schemas(df):
        cols.append(set(re.findall(r"(\w+):", schema[len("struct<") :])))
    return cols


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = explain_formatted(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE))


def data_shuffle_count(df: DataFrame) -> int:
    """Shuffle exchanges excluding round-robin repartitions.

    Round-robin exchanges come from ensure_compute_parallelism
    (operators/scale.py): they exist only when a small local input plans
    fewer splits than cores, and vanish at real scale. The *data*
    shuffles — hash/range exchanges required by the operator semantics —
    are the ones the 100 TB shuffle budget counts.
    """
    plan = explain_formatted(df)
    rr = len(re.findall(r"Arguments: RoundRobinPartitioning", plan))
    total = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE))
    return total - rr  # one planning pass, not a second via shuffle_count


def round_robin_shuffle_count(df: DataFrame) -> int:
    """Round-robin repartition exchanges only (the ones
    data_shuffle_count excludes). Budget tests pair the two: a plan is
    allowed its data shuffles plus AT MOST the compute-parallelism
    round-robin — an unrelated repartition(n) someone adds later must
    not hide inside the exclusion (ADVICE r11)."""
    return len(
        re.findall(r"Arguments: RoundRobinPartitioning", explain_formatted(df))
    )


def broadcast_join_count(df: DataFrame) -> int:
    return len(
        re.findall(r"^\(\d+\) BroadcastHashJoin", explain_formatted(df), re.MULTILINE)
    )


def sort_merge_join_count(df: DataFrame) -> int:
    return len(
        re.findall(r"^\(\d+\) SortMergeJoin", explain_formatted(df), re.MULTILINE)
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages in the plan."""
    ids = set(re.findall(r"codegen id : (\d+)", explain_formatted(df)))
    return len(ids)
