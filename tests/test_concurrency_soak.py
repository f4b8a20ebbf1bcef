"""Randomized multi-writer soak (VERDICT r4 #8): N threads run
fixed-seed schedules of append / delete / upsert / compaction against ONE
table through the optimistic-commit loop. Thread schedules are
row-disjoint (thread i owns ids [i*10_000, i*10_000+9_999]), so the
expected final row-set is the per-thread serial replay of each schedule
— order-independent across threads — while the METADATA commits still
conflict on every interleaving (each commit retries against the moved
head; compaction rewrites every file, forcing the CoW-conflict restart
path). Asserts: zero writer errors, final row-set == model, linear
parent chain, and every committed operation accounted for."""

from __future__ import annotations

import random
import threading

import pytest

from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.tables.catalog import IceLiteCatalog
from iceberg_matrix_spark.tables.table import IceLiteTable

N_THREADS = 5
OPS_PER_THREAD = 5
SEED = 20260815


@pytest.fixture()
def catalog(spark, tmp_path):
    c = IceLiteCatalog(spark, str(tmp_path / "wh"))
    c.create_namespace("soak")
    return c


def _schedule(i: int) -> list[tuple]:
    """Deterministic op list for thread i over its own id range."""
    rng = random.Random(SEED + i)
    base = i * 10_000
    ops: list[tuple] = [("append", [(base + k, 0) for k in range(10)])]
    cursor = 10
    for _ in range(OPS_PER_THREAD - 1):
        kind = rng.choice(["append", "delete", "upsert", "rewrite"])
        if kind == "append":
            ids = [base + cursor + k for k in range(rng.randint(3, 8))]
            cursor += len(ids)
            ops.append(("append", [(x, rng.randint(0, 9)) for x in ids]))
        elif kind == "delete":
            m = rng.randint(2, 5)
            ops.append(("delete", f"id >= {base} AND id < {base + 10_000} AND id % {m} = 0"))
        elif kind == "upsert":
            keys = rng.sample(range(base, base + cursor), k=min(4, cursor))
            ops.append(("upsert", [(x, rng.randint(10, 99)) for x in keys]))
        else:
            ops.append(("rewrite",))
    return ops


def _model_replay(ops: list[tuple]) -> dict[int, int]:
    rows: dict[int, int] = {}
    for op in ops:
        if op[0] == "append":
            for x, v in op[1]:
                rows[x] = v
        elif op[0] == "delete":
            m = int(op[1].rsplit("% ", 1)[1].split(" ")[0])
            rows = {x: v for x, v in rows.items() if x % m != 0}
        elif op[0] == "upsert":
            for x, v in op[1]:
                rows[x] = v
        # rewrite: row-set preserving
    return rows


def test_concurrent_writer_soak(spark, catalog):
    from iceberg_matrix_spark.tables import maintenance as maint

    t = catalog.create_table("soak.t", "id bigint, v bigint")
    schedules = [_schedule(i) for i in range(N_THREADS)]
    errs: list = []

    def worker(i: int) -> None:
        try:
            mine = IceLiteTable(spark, t.location)
            for op in schedules[i]:
                if op[0] == "append":
                    mine.append(
                        local_df(spark, op[1], "id bigint, v bigint"),
                        extra_summary={"soak_tag": f"w{i}"},
                    )
                elif op[0] == "delete":
                    mine.delete(op[1])
                elif op[0] == "upsert":
                    mine.upsert(
                        local_df(spark, op[1], "id bigint, v bigint"), ["id"]
                    )
                else:
                    maint.rewrite_data_files(mine)
        except Exception as e:  # noqa: BLE001
            errs.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(N_THREADS)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == [], errs

    final = IceLiteTable(spark, t.location)
    got = {r["id"]: r["v"] for r in final.df().collect()}
    want: dict[int, int] = {}
    for ops in schedules:
        want.update(_model_replay(ops))
    assert got == want

    # the committed log is one linear chain; every op committed exactly once
    snaps = final.meta.snapshots
    for prev, cur in zip(snaps, snaps[1:]):
        assert cur.parent_id == prev.snapshot_id
    assert len(snaps) == sum(len(s) for s in schedules)
    # appends are taggable; each thread's appends all landed
    tags = [s.summary.get("soak_tag") for s in snaps if s.summary.get("soak_tag")]
    for i, ops in enumerate(schedules):
        assert tags.count(f"w{i}") == sum(1 for op in ops if op[0] == "append")
