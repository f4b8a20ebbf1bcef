"""In-job compaction alongside a running streaming query.

The reference runs Flink's embedded maintenance tasks while a streaming
INSERT commits appends, asserting a "replace" snapshot appears among them
(/root/reference/tests/flink_feature_tests.py:1100-1172). Spark has no
one-config analog (SURVEY §2.10), so this is the documented pattern: a
driver-side scheduler thread that periodically CALLs rewrite_data_files
against the same table. Safe concurrency comes from IceLite's optimistic
commit loop — the same Iceberg commit-retry contract that lets Flink's
maintenance share the table with the writer (their JDBC lock maps to our
atomic version-file rename).
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession

from iceberg_matrix_spark.tables.maintenance import rewrite_data_files
from iceberg_matrix_spark.tables.table import IceLiteTable


class CompactionScheduler:
    """Periodically compacts a table while streaming writes land.

    Usage::

        sched = CompactionScheduler(spark, location, interval_s=5)
        sched.start()
        ... streaming query runs ...
        sched.stop()
        assert sched.rewrites >= 1
    """

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        interval_s: float = 5.0,
        min_files: int = 4,
    ):
        self.spark = spark
        self.location = location
        self.interval_s = interval_s
        self.min_files = min_files
        self.rewrites = 0
        self.errors: list[Exception] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                table = IceLiteTable(self.spark, self.location)
                head = table._current_snapshot()
                if head is None or len(head.data_files) < self.min_files:
                    continue
                rewrite_data_files(table)
                self.rewrites += 1
            except Exception as e:  # keep compacting; surface at stop()
                self.errors.append(e)

    def start(self) -> "CompactionScheduler":
        self._thread.start()
        return self

    def stop(self, timeout: float = 30.0, raise_errors: bool = True) -> None:
        """Stop the loop and SURFACE accumulated failures: a compaction
        loop that errored every interval must not look like it worked.
        Pass ``raise_errors=False`` to inspect ``self.errors`` manually
        (e.g. when some failed attempts are expected under contention)."""
        self._stop.set()
        self._thread.join(timeout)
        if self._thread.is_alive():
            raise TimeoutError(
                f"compaction thread did not stop within {timeout}s"
            )
        if raise_errors and self.errors and self.rewrites == 0:
            # every attempt failed — nothing was ever compacted
            raise RuntimeError(
                f"compaction never succeeded: {len(self.errors)} failure(s); "
                f"last: {self.errors[-1]!r}"
            ) from self.errors[-1]
