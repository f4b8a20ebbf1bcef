"""Blocked Levenshtein fuzzy matching: semantics + plan shape."""

from __future__ import annotations

from iceberg_matrix_spark.operators.fuzzy import fuzzy_title_pairs
from iceberg_matrix_spark.sources.testdata import load_table


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_match_python_reference(spark, sf_dir):
    """Every emitted pair's distance equals the classic O(m·n) DP on the
    normalized titles (the thresholded DP must never distort a kept
    distance), and every blocked pair within the cap is emitted."""
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "lang", "text").collect()
    titles = {
        r.doc_id: (r.lang, " ".join((r.text or "").split()).lower()[:32])
        for r in rows
    }
    want = {}
    ids = sorted(titles)
    for i, d1 in enumerate(ids):
        l1, t1 = titles[d1]
        for d2 in ids[i + 1 :]:
            l2, t2 = titles[d2]
            if l1 == l2 and t1[:8] == t2[:8]:
                d = _lev(t1, t2)
                if d <= 8:
                    want[(d1, d2)] = d
    got = {(r.id1, r.id2): r.dist for r in fuzzy_title_pairs(docs).collect()}
    assert got == want


def test_fuzzy_join_is_equi_join_not_cartesian(spark, sf_dir):
    """The blocking key must reach the join as an equi-condition — a
    cartesian (BroadcastNestedLoop) would be the quadratic scale-killer
    this operator exists to avoid."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        fuzzy_title_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
