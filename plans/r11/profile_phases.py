#!/usr/bin/env python
"""Per-query phase profiler: where does wall-clock go at bench SF?

For each query: time (a) DataFrame construction (Python-side plan
building), (b) first noop execution (analysis + optimization + codegen +
run), (c) two warm re-executions (plan cached per identical DF — build a
FRESH DataFrame per run so re-analysis cost is included, exactly like
bench.py does).

Usage: python plans/r11/profile_phases.py q_ann_pq_topk [more...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from iceberg_matrix_spark import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench  # noqa: E402,F401  (path setup)
    from iceberg_matrix_spark.queries import QUERIES  # noqa: E402

    spark = get_spark(app_name="imx-phase-profile", adaptive=True)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = QUERIES[name]
        rec = {"build_s": [], "exec_s": []}
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rec["build_s"].append(round(t1 - t0, 3))
            rec["exec_s"].append(round(t2 - t1, 3))
        out[name] = rec
        print(name, json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
