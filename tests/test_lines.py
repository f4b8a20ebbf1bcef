"""Line-level dedup (operators/lines.py) — hand-checked semantics on
crafted corpora; oracle parity of the registered queries runs in
test_oracle_parity via the registry."""

from __future__ import annotations

from iceberg_matrix_spark.operators.lines import (
    doc_lines,
    line_dedup_verdicts,
    line_deduped_corpus,
)
from iceberg_matrix_spark.session import local_df


def _docs(spark, rows):
    return local_df(spark, rows, "doc_id bigint, text string")


def _line(prefix, n=4):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_segmentation_is_fixed_width_with_short_tail(spark):
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10)))])
    got = sorted(
        (r["line_no"], r["line"])
        for r in doc_lines(docs, line_tokens=4).collect()
    )
    assert got == [
        (1, "t0 t1 t2 t3"),
        (2, "t4 t5 t6 t7"),
        (3, "t8 t9"),  # short tail line
    ]


def test_boilerplate_line_dropped_everywhere(spark):
    boiler = _line("b")
    docs = _docs(
        spark,
        [
            (1, boiler + " " + _line("x")),
            (2, boiler + " " + _line("y")),
            (3, _line("z") + " " + boiler),
        ],
    )
    v = {
        (r["doc_id"], r["line_no"]): (r["corpus_df"], r["keep"])
        for r in line_dedup_verdicts(docs, line_tokens=4).collect()
    }
    # the boilerplate line (df=3) is dropped in ALL three docs
    assert v[(1, 1)] == (3, False)
    assert v[(2, 1)] == (3, False)
    assert v[(3, 2)] == (3, False)
    # unique lines survive
    assert v[(1, 2)] == (1, True)
    assert v[(3, 1)] == (1, True)


def test_within_doc_repeat_keeps_first_only(spark):
    rep = _line("r")
    docs = _docs(
        spark,
        [(1, rep + " " + _line("m") + " " + rep)],
    )
    v = {
        r["line_no"]: r["keep"]
        for r in line_dedup_verdicts(docs, line_tokens=4).collect()
    }
    assert v == {1: True, 2: True, 3: False}


def test_clean_reassembly_and_fully_boilerplate_doc(spark):
    boiler = _line("b")
    docs = _docs(
        spark,
        [
            (1, boiler),  # fully boilerplate → empty clean_text
            (2, boiler + " " + _line("u")),
            (3, boiler),
        ],
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_lines_kept"], r["clean_text"])
        for r in line_deduped_corpus(docs, line_tokens=4).collect()
    }
    assert got[1] == (1, 0, "")
    assert got[3] == (1, 0, "")
    assert got[2] == (2, 1, _line("u"))


def test_clean_preserves_line_order(spark):
    docs = _docs(
        spark,
        [(7, _line("a") + " " + _line("b") + " " + _line("c"))],
    )
    row = line_deduped_corpus(docs, line_tokens=4).collect()[0]
    assert row["clean_text"] == _line("a") + " " + _line("b") + " " + _line("c")


def test_min_doc_freq_threshold(spark):
    shared = _line("s")
    docs = _docs(
        spark,
        [(1, shared), (2, shared)],
    )
    # at min_doc_freq=3 a df=2 line is NOT boilerplate
    v = {
        r["doc_id"]: r["keep"]
        for r in line_dedup_verdicts(
            docs, line_tokens=4, min_doc_freq=3
        ).collect()
    }
    assert v == {1: True, 2: True}


def test_incremental_matches_full_dedup_on_batch(spark):
    """Incremental verdicts over a prebuilt index == the full-corpus
    verdict rule restricted to batch docs (disjoint doc sets ⇒ union
    df = corpus_df + batch_df)."""
    from iceberg_matrix_spark.operators.lines import (
        incremental_line_verdicts,
        line_dedup_verdicts,
        line_frequency_index,
    )

    boiler, uniq = _line("b"), _line("u")
    corpus = _docs(spark, [(1, boiler), (2, boiler + " " + _line("c"))])
    batch = _docs(spark, [(10, boiler + " " + uniq), (11, uniq + " " + uniq)])
    idx = line_frequency_index(corpus, line_tokens=4)
    got = {
        (r["doc_id"], r["line_no"]): (r["total_df"], r["keep"])
        for r in incremental_line_verdicts(
            batch, line_tokens=4, corpus_index=idx
        ).collect()
    }
    # boiler: corpus_df 2 + batch_df 1 = 3 -> dropped in batch
    assert got[(10, 1)] == (3, False)
    # uniq: df 2 within the batch alone -> boilerplate too
    assert got[(10, 2)] == (2, False)
    assert got[(11, 1)] == (2, False)
    assert got[(11, 2)] == (2, False)
    # cross-check against the full rule on corpus+batch
    full = {
        (r["doc_id"], r["line_no"]): (r["corpus_df"], r["keep"])
        for r in line_dedup_verdicts(
            corpus.unionByName(batch), line_tokens=4
        ).collect()
        if r["doc_id"] >= 10
    }
    assert full == got
