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
