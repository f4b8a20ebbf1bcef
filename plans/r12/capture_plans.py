#!/usr/bin/env python
"""Capture .explain("formatted") for every headline query → plans/r12/.

Round 12: identical instrument to r11 (same split-DML handling); the
MERGE write-job plans are captured separately by the _write_data_files
patch (q_merge_sql_write_{before,after}.txt).

Usage: python plans/r12/capture_plans.py [before|after] [query ...]
Writes plans/r12/<query>_<tag>.txt. Split-DML queries capture the
exec-phase plan (the timed query side); setup plans go to
<query>_setup_<tag>.txt only when cheap to build.
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from iceberg_matrix_spark import get_spark  # noqa: E402


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.abspath(__file__))

    import bench  # noqa: E402
    from iceberg_matrix_spark.queries import QUERIES  # noqa: E402

    spark = get_spark(app_name="imx-plan-capture", adaptive=True)
    spark.sparkContext.setLogLevel("ERROR")

    # mirror bench.py's SPLIT_DML handling: capture the exec-phase plan
    from iceberg_matrix_spark.queries.relational import (  # noqa: E402
        _branch_sql_exec, _branch_sql_setup, _merge_sql_exec, _merge_sql_setup,
        _wap_publish_exec, _wap_publish_setup, _zorder_effect_exec,
        _zorder_effect_setup,
    )
    from iceberg_matrix_spark.operators.similarity import (  # noqa: E402
        _pq_sampled_exec, _pq_sampled_setup, _pq_trained_exec,
        _pq_trained_setup, _semantic_incremental_exec,
        _semantic_incremental_setup, _semantic_scoped_exec,
        _semantic_scoped_setup,
    )

    split_dml = {
        "q_merge_sql": (_merge_sql_setup, _merge_sql_exec),
        "q_branch_read_sql": (_branch_sql_setup, _branch_sql_exec),
        "q_zorder_effect": (_zorder_effect_setup, _zorder_effect_exec),
        "q_wap_publish": (_wap_publish_setup, _wap_publish_exec),
        "q_dedup_semantic_incremental": (
            _semantic_incremental_setup, _semantic_incremental_exec),
        "q_dedup_semantic_scoped": (
            _semantic_scoped_setup, _semantic_scoped_exec),
        "q_ann_pq_trained": (_pq_trained_setup, _pq_trained_exec),
        "q_ann_pq_trained_sampled": (_pq_sampled_setup, _pq_sampled_exec),
    }

    for name in bench.HEADLINE:
        if only and name not in only:
            continue
        try:
            if name in split_dml:
                setup_fn, exec_fn = split_dml[name]
                handle = setup_fn(spark, sf_dir)
                df = exec_fn(handle)
            else:
                df = QUERIES[name](spark, sf_dir)
            text = formatted(df)
        except Exception as ex:  # noqa: BLE001
            text = f"ERROR: {type(ex).__name__}: {ex}\n"
        with open(os.path.join(here, f"{name}_{tag}.txt"), "w") as f:
            f.write(text)
        print(name, "ok" if not text.startswith("ERROR") else "ERROR")
    spark.stop()


if __name__ == "__main__":
    main()
