"""Exact-substring span dedup (operators/spans.py) — hand-checked
semantics on crafted corpora; oracle parity runs in test_oracle_parity
via the registry."""

from __future__ import annotations

from iceberg_matrix_spark.operators.spans import duplicate_spans, span_dup_ratio
from iceberg_matrix_spark.session import local_df


def _docs(spark, rows):
    return local_df(spark, rows, "doc_id bigint, text string")


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_span_is_found_and_maximal(spark):
    shared = _words("s", 12)  # 12-token verbatim overlap
    docs = _docs(
        spark,
        [
            (1, _words("a", 5) + " " + shared + " " + _words("b", 4)),
            (2, _words("c", 3) + " " + shared),
            (3, _words("z", 20)),  # unique doc: no spans
        ],
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(docs, "doc_id", "text", k=8).collect()
    }
    # doc 1: shared occupies tokens 6..17; doc 2: tokens 4..15
    assert spans == {(1, 6, 17, 12), (2, 4, 15, 12)}


def test_two_separate_spans_do_not_merge(spark):
    s1, s2 = _words("x", 8), _words("y", 8)
    gap = _words("g", 10)  # > k tokens between the two shared spans
    docs = _docs(
        spark,
        [
            (1, s1 + " " + gap + " " + s2),
            (2, s1 + " " + _words("h", 10) + " " + s2),
        ],
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in duplicate_spans(docs, "doc_id", "text", k=8).collect()
    )
    assert got == [(1, 1, 8), (1, 19, 8), (2, 1, 8), (2, 19, 8)]


def test_doc_freq_cap_drops_stop_grams(spark):
    common = _words("w", 8)
    docs = _docs(spark, [(i, common + " " + _words(f"u{i}_", 5)) for i in range(4)])
    # the 8-gram appears in 4 docs; cap=3 excludes it entirely
    assert duplicate_spans(docs, "doc_id", "text", k=8, max_doc_freq=3).count() == 0
    assert duplicate_spans(docs, "doc_id", "text", k=8, max_doc_freq=4).count() == 4


def test_ratio_reports_zero_for_clean_docs(spark):
    shared = _words("s", 10)
    docs = _docs(
        spark,
        [(1, shared), (2, shared), (3, _words("q", 10))],
    )
    rows = {r["doc_id"]: r for r in span_dup_ratio(docs, "doc_id", "text", k=8).collect()}
    assert rows[1]["dup_tokens"] == 10 and rows[1]["dup_ratio"] == 1.0
    assert rows[2]["dup_tokens"] == 10
    assert rows[3]["dup_tokens"] == 0 and rows[3]["dup_ratio"] == 0.0
    assert rows[3]["n_tokens"] == 10


def test_clean_corpus_strips_exactly_the_spans(spark):
    shared = _words("s", 10)
    tail = _words("t", 5)
    docs = _docs(
        spark,
        [(1, shared + " " + tail), (2, shared), (3, _words("q", 9))],
    )
    from iceberg_matrix_spark.operators.spans import span_deduped_corpus

    rows = {
        r["doc_id"]: r
        for r in span_deduped_corpus(docs, "doc_id", "text", k=8).collect()
    }
    assert rows[1]["clean_text"] == tail and rows[1]["n_tokens_kept"] == 5
    assert rows[2]["clean_text"] == "" and rows[2]["n_tokens_kept"] == 0
    assert rows[3]["clean_text"] == _words("q", 9)
    assert rows[3]["n_tokens"] == 9
