"""Event-analytics operators: funnel ordering semantics."""

from __future__ import annotations

import datetime

from iceberg_matrix_spark.operators.timeseries import event_funnel
from iceberg_matrix_spark.session import local_df


def test_funnel_requires_strict_order(spark):
    """A user whose purchase precedes their signup must not convert past
    step 1; equal timestamps are defined non-conversions (strict >)."""
    t = datetime.datetime(2026, 1, 1)
    rows = [
        # user 1: full ordered funnel
        (1, 1, t, "signup"),
        (2, 1, t + datetime.timedelta(minutes=1), "click"),
        (3, 1, t + datetime.timedelta(minutes=2), "purchase"),
        # user 2: purchase BEFORE signup → stops at step 1
        (4, 2, t, "purchase"),
        (5, 2, t + datetime.timedelta(minutes=1), "signup"),
        # user 3: click at the SAME instant as signup → tie is not after
        (6, 3, t, "signup"),
        (7, 3, t, "click"),
    ]
    ev = local_df(
        spark,
        rows,
        "event_id bigint, user_id bigint, ts timestamp, event_type string",
    )
    got = {r.step_name: r.n_users for r in event_funnel(ev).collect()}
    assert got == {"signup": 3, "click": 1, "purchase": 1}


def test_event_analytics_plan_shapes(spark, sf_dir):
    """Funnel: every stage's event-type filter must reach its scan
    (PushedFilters) — each step reads only its own events. Cohort: the
    per-user firsts frame joins broadcast. Paths: top-20 is
    TakeOrderedAndProject, never a global sort exchange."""
    from iceberg_matrix_spark.plans import (
        broadcast_join_count,
        pushed_filters,
    )
    from iceberg_matrix_spark.queries import QUERIES

    funnel = QUERIES["q_event_funnel"](spark, sf_dir)
    pushed = [f for scan in pushed_filters(funnel) for f in scan]
    assert any("event_type" in f for f in pushed), pushed

    cohort = QUERIES["q_cohort_retention"](spark, sf_dir)
    assert broadcast_join_count(cohort) >= 1

    paths = QUERIES["q_event_paths"](spark, sf_dir)
    plan = paths._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # VERDICT r7 #2: the rank-≤5 filter must run BEFORE the per-user
    # aggregate (WindowGroupLimit prunes each partition to 5 rows per
    # user pre-exchange) so a hot key can never build its full event
    # array. Tree strings print parents first, so the limit appearing
    # AFTER the aggregate means it executes below (earlier than) it.
    assert "WindowGroupLimit" in plan, plan
    agg_at = plan.index("ObjectHashAggregate")
    assert plan.index("WindowGroupLimit") > agg_at, plan


def test_windowed_funnel_enforces_deadline(spark):
    """A conversion 61 minutes after the prior step must not count; one
    at exactly the deadline counts (inclusive <=)."""
    import datetime

    from iceberg_matrix_spark.operators.timeseries import event_funnel_windowed
    from iceberg_matrix_spark.session import local_df

    t = datetime.datetime(2026, 1, 1)
    rows = [
        (1, 1, t, "signup"),
        (2, 1, t + datetime.timedelta(minutes=61), "click"),   # too late
        (3, 2, t, "signup"),
        (4, 2, t + datetime.timedelta(minutes=60), "click"),   # at deadline
    ]
    ev = local_df(
        spark, rows,
        "event_id bigint, user_id bigint, ts timestamp, event_type string",
    )
    got = {r.step_name: r.n_users for r in event_funnel_windowed(ev).collect()}
    assert got == {"signup": 2, "click": 1, "purchase": 0}
