"""Metamorphic fuzzing of the table layer: random DML histories.

The SQL facade is differentially fuzzed in test_sql_facade_properties.py;
this does the same for the TABLE layer. Hypothesis generates a random
history of append / delete / update / upsert / rollback operations,
applies it both to a real IceLiteTable (CoW and MoR) and to a trivial
in-memory row model, and asserts the scan matches the model after the
full history — so snapshot chaining, MoR delete-file scoping, upsert
equality deletes, and rollback interactions are machine-searched rather
than hand-enumerated. Model states are keyed by the table's ACTUAL head
snapshot id, so the model never has to guess which operations commit.
"""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from iceberg_matrix_spark.tables.catalog import IceLiteCatalog
from iceberg_matrix_spark.session import local_df

from tests.hypcfg import DERANDOMIZE, n_examples

SETTINGS = dict(
    deadline=None,
    max_examples=n_examples(5, 10),
    derandomize=DERANDOMIZE,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

key = st.integers(min_value=0, max_value=9)
val = st.integers(min_value=-100, max_value=100)


@st.composite
def operations(draw):
    """A DML history of 2-6 steps over schema (id BIGINT, v BIGINT)."""
    ops = []
    for _ in range(draw(st.integers(min_value=2, max_value=6))):
        kind = draw(
            st.sampled_from(["append", "delete", "update", "upsert", "rollback"])
        )
        if kind == "append":
            ops.append(("append", draw(st.lists(st.tuples(key, val), min_size=1, max_size=4))))
        elif kind == "delete":
            ops.append(("delete", draw(key)))
        elif kind == "update":
            ops.append(("update", draw(key), draw(val)))
        elif kind == "upsert":
            # unique keys within a batch: in-batch last-wins is a separate
            # contract (covered in test_streaming.py), not modeled here
            ops.append(
                ("upsert", draw(
                    st.lists(
                        st.tuples(key, val), min_size=1, max_size=3,
                        unique_by=lambda r: r[0],
                    )
                ))
            )
        else:
            ops.append(("rollback",))
    return ops


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    return IceLiteCatalog(spark, str(tmp_path_factory.mktemp("fuzz-tbl-wh")))


def _run_history(spark, cat, ops, mode: str):
    name = f"fz.t_{uuid.uuid4().hex[:10]}"
    try:
        cat.create_namespace("fz")
    except Exception:
        pass
    t = cat.create_table(name, "id bigint, v bigint")
    if mode == "mor":
        t.set_properties(
            {"write.delete.mode": "merge-on-read", "write.update.mode": "merge-on-read"}
        )

    def df_of(rows):
        return local_df(spark, 
            [(int(k), int(v)) for k, v in rows], "id bigint, v bigint"
        )

    def head():
        return t.meta.current_snapshot_id

    # seed commit: DML on a never-written table raises by contract
    # (tables/table.py "delete on empty table"), so every history starts
    # from one seeded snapshot
    seed = [(0, 0), (5, 50)]
    t.append(df_of(seed))
    model: list[tuple[int, int]] = list(seed)
    by_head: dict[int | None, list[tuple[int, int]]] = {head(): model}

    for op in ops:
        if op[0] == "append":
            t.append(df_of(op[1]))
            model = model + list(op[1])
        elif op[0] == "delete":
            t.delete(f"id = {op[1]}")
            model = [r for r in model if r[0] != op[1]]
        elif op[0] == "update":
            t.update({"v": str(op[2])}, where=f"id = {op[1]}")
            model = [(k, op[2]) if k == op[1] else (k, v) for k, v in model]
        elif op[0] == "upsert":
            t.upsert(df_of(op[1]), key_columns=["id"])
            keys = {k for k, _ in op[1]}
            model = [r for r in model if r[0] not in keys] + list(op[1])
        elif op[0] == "rollback":
            chain = t.ancestors_of()
            if len(chain) >= 2:
                parent = chain[1][0]
                t.rollback_to_snapshot(parent)
                model = by_head[parent]
            # else: nothing to roll back — no-op in both table and model
        by_head[head()] = model

    got = sorted((r["id"], r["v"]) for r in t.df().collect())
    return got, sorted(model)


@settings(**SETTINGS)
@given(ops=operations())
def test_dml_history_matches_model_cow_and_mor(spark, cat, ops):
    """One drawn history drives BOTH write modes (r9 suite-budget fix:
    formerly two tests drawing disjoint histories — same table-build
    count bought half the cross-mode coverage). CoW and MoR must each
    match the model AND therefore each other on the identical history —
    the differential the separate tests never actually asserted."""
    got_cow, want = _run_history(spark, cat, ops, "cow")
    assert got_cow == want, ("cow", ops)
    got_mor, want_mor = _run_history(spark, cat, ops, "mor")
    assert got_mor == want_mor, ("mor", ops)
    assert got_cow == got_mor, ops
