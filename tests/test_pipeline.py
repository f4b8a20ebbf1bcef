"""Curation-pipeline operators: sampling determinism, PII redaction on
synthetic PII, repetition math on known inputs."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_matrix_spark.operators.pipeline import (
    hash_stratified_sample,
    redact_pii,
    repetition_signals,
)
from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.sources.testdata import load_table


def test_sample_is_deterministic_and_rate_shaped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in hash_stratified_sample(docs).select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_stratified_sample(docs).select("doc_id").collect()}
    assert a == b  # same rows every run — no RNG
    per_lang = dict(
        hash_stratified_sample(docs)
        .groupBy("lang")
        .count()
        .collect()
    )
    totals = dict(docs.groupBy("lang").count().collect())
    # en down-sampled to ~40%, unlisted languages kept at 100%
    assert per_lang["en"] < totals["en"]
    for lang in totals:
        if lang not in ("en", "zh"):
            assert per_lang[lang] == totals[lang]


def test_redact_pii_scrubs_known_strings(spark):
    df = local_df(spark, 
        [
            (1, "mail me at jane.doe+x@example.co.uk or call +1 555 867-5309 now"),
            (2, "no pii here at all"),
            (3, "two mails: a@b.io c@d.org and line 555-123-4567"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert "<EMAIL>" in rows[1]["redacted"] and "<PHONE>" in rows[1]["redacted"]
    assert "jane" not in rows[1]["redacted"] and "5309" not in rows[1]["redacted"]
    assert rows[2]["redacted"] == "no pii here at all"
    assert rows[3]["n_emails"] == 2 and rows[3]["n_phones"] == 1


def test_repetition_signals_known_values(spark):
    df = local_df(spark, 
        [
            (1, "a a a a"),          # all dup tokens; "a a" 2-gram = 3/3
            (2, "w x y z"),          # no repetition
            (3, "solo"),             # 1 token, no 2-grams
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rows[1]["dup_token_frac"] == 0.75 and rows[1]["top2gram_frac"] == 1.0
    assert rows[2]["dup_token_frac"] == 0.0 and rows[2]["top2gram_frac"] == 1 / 3
    assert rows[3]["n_tokens"] == 1 and rows[3]["top2gram_frac"] == 0.0


def test_repetition_plan_is_narrow(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = repetition_signals(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # shuffle-free narrow projection


def test_decontaminate_counts_shared_ngrams(spark):
    from iceberg_matrix_spark.operators.pipeline import decontaminate

    bench = local_df(spark, 
        [(100, "alpha beta gamma delta epsilon")], "doc_id bigint, text string"
    )
    corpus = local_df(spark, 
        [
            # shares two distinct 3-grams with the benchmark doc
            (1, "alpha beta gamma delta zeta"),
            # shares none
            (2, "one two three four five"),
            # shares exactly one ("gamma delta epsilon")
            (3, "x y gamma delta epsilon q"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r["n_overlap_ngrams"] for r in decontaminate(corpus, bench).collect()}
    assert rows == {1: 2, 3: 1}  # doc 2 absent — nothing shared


def test_gopher_rules_known_verdicts(spark):
    from iceberg_matrix_spark.operators.pipeline import gopher_rules

    long_ok = "the quick brown fox jumps over a fence " + " ".join(
        "word" + "abcdefghij"[i % 10] for i in range(60)
    ) + " and that have with to of be"
    rows = {
        r["doc_id"]: r
        for r in gopher_rules(
            local_df(spark, 
                [
                    (1, long_ok),                    # passes everything
                    (2, "too short to keep the a"),  # fails word count only
                    (3, long_ok + " ##### ... ... ... ... ... ... " * 4),  # symbols
                ],
                "doc_id bigint, text string",
            )
        ).collect()
    }
    assert rows[1]["keep"] is True
    assert rows[2]["ok_word_count"] is False and rows[2]["keep"] is False
    assert rows[2]["ok_stopwords"] is True
    assert rows[3]["ok_symbol_ratio"] is False and rows[3]["keep"] is False


def test_gopher_plan_is_narrow(spark, sf_dir):
    from iceberg_matrix_spark.operators.pipeline import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # shuffle-free narrow projection


def test_bloom_decontaminate_supersets_exact_with_bounded_fp(spark, sf_dir):
    """The Bloom candidate stage must never miss a truly contaminated doc
    (no false negatives by construction: a present n-gram's bits are all
    set), and its false-positive doc count must stay well under the
    corpus size (m=8192, k=3 → per-gram FP ≈ (1-e^(-3n/8192))³)."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.pipeline import (
        DECON_BENCH_MOD,
        bloom_words_from,
        decontaminate,
        decontaminate_bloom,
    )
    from iceberg_matrix_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % DECON_BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
    exact = {r.doc_id: r.n_overlap_ngrams for r in decontaminate(corpus, bench).collect()}
    words = bloom_words_from(bench)
    bloom = {
        r.doc_id: r.n_bloom_hits
        for r in decontaminate_bloom(corpus, words).collect()
    }
    # superset: every exact-contaminated doc flagged, with >= the count
    for doc_id, n in exact.items():
        assert doc_id in bloom and bloom[doc_id] >= n, (doc_id, n, bloom.get(doc_id))
    # bounded FPs: flagged-but-clean docs a small fraction of the corpus
    n_corpus = corpus.count()
    fps = len(set(bloom) - set(exact))
    assert fps <= max(5, n_corpus // 10), (fps, n_corpus)
    # the filter itself is tiny and typed: 256 packed 32-bit words
    assert len(words) == 256 and all(0 <= w < 2**32 for w in words)


def test_incremental_report_folds_without_rescanning_corpus(spark, sf_dir):
    """VERDICT r8 #8: the incremental report must (a) equal the
    from-scratch report row-for-row after folding a batch, and (b) get
    the corpus's contribution from the persisted STATE parquet — its
    plan may scan documents only for the batch slice."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.pipeline import (
        corpus_report,
        corpus_report_from_state,
        corpus_report_state,
        corpus_report_state_cached,
        fold_report_state,
    )
    from iceberg_matrix_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    state = corpus_report_state_cached(corpus, sf_dir + "#plan-test")
    folded = corpus_report_from_state(
        fold_report_state(state, corpus_report_state(batch))
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(folded) == rows(corpus_report(docs))
    plan = folded._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1, (
        "fold re-read the corpus text:\n" + plan
    )
    assert "report-state-" in plan  # the persisted state scan


def test_stream_fold_reads_state_parquet_per_batch(spark, sf_dir):
    """VERDICT r9 #5 + r10 #2: the foreachBatch production sink must
    (a) run one fold per arriving file (3 micro-batches), (b) take the
    cross-batch corpus contribution from persisted BUCKETED state
    parquet — every fold plan scans state generation dirs and the
    staged batch counters, never the original corpus file — and (c)
    land at a final state whose rendered report equals the from-scratch
    batch report."""
    from iceberg_matrix_spark.operators.pipeline import (
        corpus_report,
        corpus_report_from_state,
    )
    from iceberg_matrix_spark.queries.streaming_q import stream_report_fold
    from iceberg_matrix_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    final_state, plans, n_batches, store = stream_report_fold(spark, docs)
    assert n_batches == 3
    assert len(plans) == 3
    for i, plan in enumerate(plans):
        assert "documents.parquet" not in plan, plan  # never the corpus file
        if i > 0:  # fold 0 starts from empty state; later folds must
            assert "state_v" in plan, plan  # scan persisted generations
    # every fold's batch_id was recorded — the at-least-once guard
    assert store.applied == {0, 1, 2}

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(corpus_report_from_state(final_state)) == rows(
        corpus_report(docs)
    )


def test_bucketed_fold_touches_only_batch_buckets(spark, sf_dir):
    """VERDICT r10 #2 — the scale pin: folding a TINY batch into a
    full-corpus state must read and rewrite only the buckets the batch
    touches. Pins (a) the new generation dir contains exactly the
    touched ``__bkt=`` partition dirs, (b) the fold plan partition-
    prunes the prior state scan to those buckets, (c) the folded state
    renders the from-scratch report, and (d) retraction gets the same
    treatment, including a fingerprint's last copy leaving the state."""
    import os
    import tempfile

    from iceberg_matrix_spark.operators.pipeline import (
        BucketedReportState,
        corpus_report,
        corpus_report_from_state,
        corpus_report_state,
    )
    from iceberg_matrix_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id").isin(10, 20))
    root = tempfile.mkdtemp(prefix="bucketed-state-")
    store = BucketedReportState(
        spark, root, template=corpus_report_state(docs.limit(0)),
        n_buckets=64,
    )
    assert store.fold(corpus_report_state(corpus), batch_id=0)

    n_state_buckets = len(store.latest)
    assert store.fold(corpus_report_state(batch), batch_id=1)
    gen_dir = os.path.join(root, "state_v2")
    written = {d for d in os.listdir(gen_dir) if d.startswith("__bkt=")}
    assert 0 < len(written) <= 2  # ≤ one bucket per distinct fingerprint
    # the fold plan prunes the v1 state scan to the touched buckets
    assert "state_v1" in store.plans[1]
    assert "__bkt" in store.plans[1]  # the partition filter survived

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    both = corpus.unionByName(batch)
    assert rows(corpus_report_from_state(store.current())) == rows(
        corpus_report(both)
    )
    # untouched buckets still resolve to the v1 generation
    v1 = os.path.join(root, "state_v1")
    assert sum(1 for p in store.latest.values() if p == v1) >= (
        n_state_buckets - 2
    )

    # at-least-once replay: re-delivering batch_id=1 must be a no-op
    assert not store.fold(corpus_report_state(batch), batch_id=1)
    assert store.gen == 2
    assert rows(corpus_report_from_state(store.current())) == rows(
        corpus_report(both)
    )

    # retraction: delete the batch again — only its buckets rewrite,
    # zeroed keys drop out, and the report equals the corpus-only one
    assert store.retract(corpus_report_state(batch), batch_id=2)
    gen3 = os.path.join(root, "state_v3")
    w3 = {d for d in os.listdir(gen3) if d.startswith("__bkt=")}
    assert len(w3) <= 2
    assert rows(corpus_report_from_state(store.current())) == rows(
        corpus_report(corpus)
    )
