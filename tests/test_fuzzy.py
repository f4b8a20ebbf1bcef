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


def _final_blocks(titles: dict) -> dict:
    """Python mirror of the cap-promotion ladder: doc_id → (lvl, blk)."""
    from collections import Counter

    prefixes = (8, 16, 32)
    counts = [
        Counter((lang, t[:p]) for lang, t in titles.values()) for p in prefixes
    ]
    out = {}
    for doc_id, (lang, t) in titles.items():
        for i, p in enumerate(prefixes):
            if i == len(prefixes) - 1 or counts[i][(lang, t[:p])] <= 64:
                out[doc_id] = (i, t[:p])
                break
    return out


def test_fuzzy_pairs_match_python_reference(spark, sf_dir):
    """Every emitted pair's distance equals the classic O(m·n) DP on the
    normalized titles (the thresholded DP must never distort a kept
    distance), and exactly the final-block pairs within the cap are
    emitted — the hierarchical promotion mirrored independently."""
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "lang", "text").collect()
    titles = {
        r.doc_id: (r.lang, " ".join((r.text or "").split()).lower()[:32])
        for r in rows
    }
    blocks = _final_blocks(titles)
    want = {}
    ids = sorted(titles)
    for i, d1 in enumerate(ids):
        l1, t1 = titles[d1]
        for d2 in ids[i + 1 :]:
            l2, t2 = titles[d2]
            if l1 == l2 and blocks[d1] == blocks[d2]:
                d = _lev(t1, t2)
                if d <= 8:
                    want[(d1, d2)] = d
    got = {(r.id1, r.id2): r.dist for r in fuzzy_title_pairs(docs).collect()}
    assert got == want


def test_fuzzy_hot_blocks_promote_to_longer_prefixes(spark):
    """A hot 8-char prefix (cap+ docs opening with the same long word)
    must promote its rows to the 16-char level so candidate volume stays
    Σ min(n_b)²-capped — the quadratic wall the 100× sweep found in the
    single-level form."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.fuzzy import _with_final_block
    from iceberg_matrix_spark.session import local_df

    # 100 docs share the first word "customers!" (10 chars); their 16-char
    # prefixes split into 10 sub-blocks of 10
    rows = [
        (i, "en", f"customers! g{i % 10:03d} body text {i}") for i in range(100)
    ] + [(1000 + i, "en", f"tiny{i} row") for i in range(5)]
    docs = local_df(spark, rows, "doc_id bigint, lang string, text string")
    t = docs.select(
        "doc_id",
        "lang",
        F.substring(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), 1, 32
        ).alias("__title"),
    )
    fin = _with_final_block(t, ("lang",)).collect()
    hot = [r for r in fin if r.doc_id < 1000]
    cold = [r for r in fin if r.doc_id >= 1000]
    assert all(r["__lvl"] == 1 for r in hot), hot[:3]
    assert len({r["__blk"] for r in hot}) == 10
    assert all(r["__lvl"] == 0 for r in cold)


def test_fuzzy_join_is_equi_join_not_cartesian(spark, sf_dir):
    """The blocking key must reach the join as an equi-condition — a
    cartesian (BroadcastNestedLoop) would be the quadratic scale-killer
    this operator exists to avoid."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        fuzzy_title_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_incremental_fuzzy_verdicts_consistent_with_batch_membership(spark, sf_dir):
    """Every dup_of_corpus verdict must have a within-cap corpus title at
    the corpus row's own blocking level (spot-verified in python), and
    verdicts cover exactly the batch."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.fuzzy import incremental_fuzzy_verdicts
    from iceberg_matrix_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    got = {r.doc_id: r.verdict for r in incremental_fuzzy_verdicts(batch, corpus).collect()}
    assert set(got) == {r.doc_id for r in batch.select("doc_id").collect()}
    assert set(got.values()) <= {"dup_of_corpus", "dup_in_batch", "kept"}
    # flagged docs exist on this corpus (near-exact titles recur) and a
    # dup_of_corpus doc really has a close corpus title
    flagged = [d for d, v in got.items() if v == "dup_of_corpus"]
    if flagged:
        titles = {
            r.doc_id: (r.lang, " ".join((r.text or "").split()).lower()[:32])
            for r in docs.select("doc_id", "lang", "text").collect()
        }
        d = flagged[0]
        l1, t1 = titles[d]
        assert any(
            l2 == l1 and _lev(t1, t2) <= 8
            for did, (l2, t2) in titles.items()
            if did % 5 != 0
        )


def test_incremental_oracle_ladder_levels_over_corpus_slice(spark, sf_dir, tmp_path):
    """Regression (ADVICE r7 #1): when a block's population straddles the
    cap — within cap over the corpus slice alone (60 ≤ 64) but over it
    with the batch rows added (70 > 64) — the operator ladders the corpus
    index over the CORPUS ALONE. The oracle must do the same: laddering
    the corpus slice against all-documents populations promotes the block
    to the full-title level and silently flips every dup_of_corpus
    verdict to kept."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_matrix_spark.queries import ORACLES, QUERIES
    from iceberg_matrix_spark.sources.testdata import TABLES
    from tests.oracle_harness import assert_query_matches_oracle

    corpus_ids = [i for i in range(1, 90) if i % 5 != 0][:60]
    batch_ids = [5 * j for j in range(1, 11)]
    rows = [(i, "en", f"commonpr corpus {n:03d}") for n, i in enumerate(corpus_ids)]
    rows += [(i, "en", f"commonpr corpus {900 + j}x") for j, i in enumerate(batch_ids)]
    rows.append((55, "en", "zzz unique batch only row"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
        }
    )
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", tmp_path / f"{t}.parquet")
    pq.write_table(tbl, tmp_path / "documents.parquet")
    assert_query_matches_oracle(
        spark,
        QUERIES["q_fuzzy_incremental"],
        ORACLES["q_fuzzy_incremental"],
        str(tmp_path),
    )
    got = {
        r.doc_id: r.verdict
        for r in QUERIES["q_fuzzy_incremental"](spark, str(tmp_path)).collect()
    }
    assert all(got[i] == "dup_of_corpus" for i in batch_ids), got
    assert got[55] == "kept"


def test_union_pass_adds_prefix_edit_recall(spark):
    """A pair differing only inside the first 8 chars (reordered opening
    words) must be MISSED by the prefix pass and CAUGHT by the
    sorted-token pass — the reason the union exists."""
    from iceberg_matrix_spark.operators.fuzzy import (
        fuzzy_title_pairs,
        fuzzy_union_pairs,
    )
    from iceberg_matrix_spark.session import local_df

    rows = [
        (1, "en", "big data table scan fast"),
        (2, "en", "data big table scan fast"),   # opening words swapped
        (3, "en", "unrelated totally different words"),
    ]
    docs = local_df(spark, rows, "doc_id bigint, lang string, text string")
    prefix = {(r.id1, r.id2) for r in fuzzy_title_pairs(docs).collect()}
    union = {(r.id1, r.id2) for r in fuzzy_union_pairs(docs).collect()}
    assert (1, 2) not in prefix
    assert (1, 2) in union
    assert prefix <= union
