"""BM25 keyword retrieval: scoring semantics + idf-surrogate equivalence."""

from __future__ import annotations

import math

from iceberg_matrix_spark.operators.retrieval import _BM25_TERMS, bm25_topk
from iceberg_matrix_spark.sources.testdata import load_table


def test_bm25_single_term_rank_invariant_under_idf_form(spark, sf_dir):
    """For a single-term query, idf is a per-query constant, so the
    rational Robertson odds and the ln-damped textbook idf produce the
    IDENTICAL document ranking — the precise sense in which the
    registered deterministic form is a faithful BM25 surrogate."""
    docs = load_table(spark, sf_dir, "documents")
    rat = bm25_topk(docs, ("vector",), k=15, log_idf=False).collect()
    log = bm25_topk(docs, ("vector",), k=15, log_idf=True).collect()
    assert [r.doc_id for r in rat] == [r.doc_id for r in log]
    assert [r.rank for r in rat] == [r.rank for r in log]


def test_bm25_matches_python_reference(spark, sf_dir):
    """Row-level recompute of the rational-idf BM25 on the collected
    corpus (independent of both Spark and DuckDB expression trees)."""
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "text").collect()
    toks = {
        r.doc_id: " ".join((r.text or "").split()).split(" ")
        for r in rows
    }
    n_docs = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    avgdl = sum_dl / n_docs
    k1, b = 1.2, 0.75
    scores = {}
    for term in _BM25_TERMS:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = (n_docs - df + 0.5) / (df + 0.5)
        for doc_id, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            c = idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(t) / avgdl))))
            scores[doc_id] = scores.get(doc_id, 0.0) + c
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = bm25_topk(docs, _BM25_TERMS, k=20).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r.score, s, rel_tol=1e-9), (r.doc_id, r.score, s)


def test_bm25_topk_plan_has_no_global_sort_exchange(spark, sf_dir):
    """The final top-k must be TakeOrderedAndProject (per-partition heaps
    + driver k-merge), never a full-corpus sort exchange."""
    docs = load_table(spark, sf_dir, "documents")
    plan = bm25_topk(docs, _BM25_TERMS, k=20)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
