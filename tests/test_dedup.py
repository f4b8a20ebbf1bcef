"""Dedup operators: exact semantics + approximate ops vs exact ground truth."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_matrix_spark.operators.dedup import (
    dedup_exact,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from iceberg_matrix_spark.sources.testdata import load_table


def _with_dups(spark, sf_dir):
    """Documents plus injected exact + near duplicates."""
    docs = load_table(spark, sf_dir, "documents")
    exact = docs.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    near = (
        docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10))
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra tail token")))
    )
    return docs.unionByName(exact).unionByName(near)


def test_dedup_exact_removes_injected_dups(spark, sf_dir):
    df = _with_dups(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    kept = dedup_exact(df, "doc_id", "text")
    # 5 exact duplicates collapse; 5 near-dups survive (text differs)
    assert kept.count() == n_docs + 5
    # representative is the min id — originals survive, clones don't
    assert kept.filter(F.col("doc_id") >= 100000).filter(F.col("doc_id") < 200000).count() == 0


def test_minhash_subset_and_recall_of_exact_jaccard(spark, sf_dir):
    df = _with_dups(spark, sf_dir)
    exact = {
        (r.id1, r.id2)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    approx = {
        (r.id1, r.id2)
        for r in minhash_neardup_pairs(df, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    assert approx <= exact, "minhash output must be exact-verified (no false positives)"
    assert exact, "injected near-dups must produce high-jaccard pairs"
    recall = len(approx) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_simhash_finds_injected_neardups(spark, sf_dir):
    df = _with_dups(spark, sf_dir)
    pairs = {
        (r.id1, r.id2) for r in simhash_neardup_pairs(df, "doc_id", "text", 8).collect()
    }
    # exact clones have identical token multisets → hamming 0
    expected_exact = {(i, i + 100000) for i in range(5)}
    assert expected_exact <= pairs
    # near clones differ by 3 tokens → low hamming, should mostly appear
    near_hits = sum(1 for i in range(5, 10) if (i, i + 200000) in pairs)
    assert near_hits >= 3


def test_incremental_dedup_verdicts(spark, sf_dir):
    """Batch-vs-index dedup: corpus clones → dup_of_corpus, in-batch
    clones → dup_in_batch, fresh docs → kept; kept+index covers exactly
    the distinct fingerprints."""
    from iceberg_matrix_spark.operators.dedup import (
        exact_dedup_groups,
        incremental_dedup_exact,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200).cache()
    corpus = docs.filter(F.col("doc_id") < 100)
    # batch: 5 corpus clones, 2×3 in-batch clone pairs, the rest fresh
    fresh = docs.filter(F.col("doc_id") >= 100).withColumn(
        "doc_id", F.col("doc_id") + 500000
    )
    corpus_clones = corpus.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 600000
    )
    batch_clones = fresh.filter(F.col("doc_id") < 500103).withColumn(
        "doc_id", F.col("doc_id") + 700000
    )
    batch = fresh.unionByName(corpus_clones).unionByName(batch_clones)

    index = exact_dedup_groups(corpus, "doc_id", "text").select("fingerprint")
    out = incremental_dedup_exact(batch, index, "doc_id", "text")
    by_verdict = {r["verdict"]: r["n"] for r in out.groupBy("verdict").agg(F.count("*").alias("n")).collect()}
    assert by_verdict.get("dup_of_corpus", 0) == 5
    assert by_verdict.get("dup_in_batch", 0) == 3
    rows = {r.doc_id: r.verdict for r in out.collect()}
    # clone of corpus doc 0 → flagged against the index
    assert rows[600000] == "dup_of_corpus"
    # in-batch clone keeps the min-id copy
    assert rows[500100] == "kept" and rows[1200100] == "dup_in_batch"
    docs.unpersist()


def test_dsir_votes_follow_target_skew(spark):
    """Tokens overrepresented in the target slice vote +1, raw-skewed
    tokens -1; document scores sum occurrence votes."""
    from iceberg_matrix_spark.operators.text import dsir_domain_votes
    from iceberg_matrix_spark.session import local_df
    import pyspark.sql.functions as F

    docs = local_df(
        spark,
        [
            # target slice: 'good' dominates
            (1, "good good good shared", "en"),
            (2, "good shared", "en"),
            # raw slice: 'bad' dominates
            (3, "bad bad bad shared", "fr"),
            (4, "bad shared mixed", "de"),
        ],
        "doc_id bigint, text string, lang string",
    )
    got = {
        r["doc_id"]: r["dsir_vote"]
        for r in dsir_domain_votes(docs).collect()
    }
    # target corpus: 6 tokens (good x4, shared x2); raw: 7 (bad x4,
    # shared x2, mixed x1). good: ct*nr=4*7 > cr*nt=0 -> +1.
    # bad: 0 < 4*6 -> -1. shared: 2*7=14 > 2*6=12 -> +1.
    # mixed: 0*7 < 1*6 -> -1.
    assert got[1] == 3 + 1          # 3 good + 1 shared
    assert got[2] == 1 + 1
    assert got[3] == -3 + 1         # 3 bad + 1 shared
    assert got[4] == -1 + 1 - 1     # bad + shared + mixed


def test_doc_chunks_boundaries_and_reassembly(spark):
    """Chunk arithmetic at the edges: a doc at/below one chunk emits
    exactly one chunk; an exact-stride-multiple doc emits no redundant
    suffix chunk; every consecutive chunk pair overlaps by exactly the
    configured overlap, and stitching de-overlapped chunks reproduces
    the original token stream."""
    from iceberg_matrix_spark.operators.text import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        doc_chunks,
    )
    from iceberg_matrix_spark.session import local_df

    step = CHUNK_SIZE - CHUNK_OVERLAP
    def words(n): return " ".join(f"w{i}" for i in range(n))
    rows = [
        (1, words(CHUNK_SIZE)),          # exactly one chunk
        (2, words(5)),                   # short doc
        (3, words(CHUNK_SIZE + step)),   # exact stride multiple: 2 chunks
        (4, words(CHUNK_SIZE + step + 7)),  # ragged tail: 3rd short chunk
    ]
    docs = local_df(spark, rows, "doc_id bigint, text string")
    got = {}
    for r in doc_chunks(docs).collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
    assert len(got[1]) == 1 and len(got[1][0]) == CHUNK_SIZE
    assert len(got[2]) == 1 and len(got[2][0]) == 5
    assert len(got[3]) == 2
    assert len(got[4]) == 3 and len(got[4][2]) == CHUNK_OVERLAP + 7
    for doc_id, chunks in got.items():
        n = {1: CHUNK_SIZE, 2: 5, 3: CHUNK_SIZE + step, 4: CHUNK_SIZE + step + 7}[doc_id]
        for k in range(len(chunks) - 1):
            assert chunks[k][step:] == chunks[k + 1][: CHUNK_SIZE - step]
        stitched = chunks[0] + [
            t for k in range(1, len(chunks)) for t in chunks[k][CHUNK_OVERLAP:]
        ]
        assert stitched == words(n).split(" "), doc_id


def test_chunk_dedup_drops_exact_and_near_chunks_and_deoverlaps(spark):
    """VERDICT r8 #5 semantics pin on a crafted corpus: an untouched
    doc keeps every chunk and kept_tokens equals its EXACT token count
    (the de-overlap accounting is lossless); a byte-identical doc loses
    all chunks to the exact pass; a one-token-edited doc loses its
    edited chunk to the NEAR-dup pass (3-gram Jaccard ≈ 0.91 ≥ 0.6)
    and its untouched chunk to the exact pass; every doc still emits a
    row (absent-means-zero)."""
    from iceberg_matrix_spark.operators.text import (
        CHUNK_SIZE,
        chunk_dedup_summary,
    )
    from iceberg_matrix_spark.session import local_df

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    base = words(100)  # chunks: 0 (64 toks) + 1 (52 toks), overlap 16
    edited = base.split(" ")
    edited[10] = "EDITED"  # inside chunk 0 only (chunk 1 = toks 48..99)
    rows = [
        (1, base),
        (2, base),                  # exact dup of doc 1
        (3, " ".join(edited)),      # chunk 0 near-dup, chunk 1 exact-dup
        (4, words(CHUNK_SIZE)),     # unrelated single-chunk doc... but
    ]
    # doc 4's first 64 tokens equal doc 1's chunk 0 → exact-dup of it;
    # use distinct words instead so it survives untouched
    rows[3] = (4, " ".join(f"u{i}" for i in range(CHUNK_SIZE)))
    docs = local_df(spark, rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_tokens)
        for r in chunk_dedup_summary(docs).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == (2, 2, 100)   # lossless de-overlap: 64 + 52 - 16
    assert got[2] == (2, 0, 0)     # exact pass drops everything
    assert got[3] == (2, 0, 0)     # near-dup chunk 0, exact-dup chunk 1
    assert got[4] == (1, 1, CHUNK_SIZE)


def test_shingle_hash_is_injective_on_test_corpora(spark):
    """The n-gram postings key is xxhash64(shingle) (VERDICT r9 #1 —
    8-byte BIGINT shuffle rows instead of ~KB shingle strings). Jaccard
    over hashed shingles equals Jaccard over strings iff the hash is
    injective on the corpus's distinct shingles; this pins that at BOTH
    parity scales (sf0.001 test + sf0.01 oracle gate), over documents
    AND the chunk texts q_chunk_dedup shingles, so the string-shingle
    DuckDB oracles remain hash-exact."""
    from iceberg_matrix_spark.operators.dedup import shingle_sets
    from iceberg_matrix_spark.operators.text import chunks_with_ckey

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(spark, sf, "documents")
        frames = [
            shingle_sets(docs, "doc_id", "text", 3),
            shingle_sets(
                chunks_with_ckey(docs), "ckey", "chunk_text", 3
            ),
        ]
        for sets_ in frames:
            row = (
                sets_.select(F.explode("shingles").alias("s"))
                .agg(
                    F.countDistinct("s").alias("n_str"),
                    F.countDistinct(F.xxhash64("s")).alias("n_hash"),
                )
                .collect()[0]
            )
            assert row["n_str"] == row["n_hash"] > 0, (sf, row)


def test_prefix_filtered_pairs_equal_baseline(spark, sf_dir):
    """ngram_jaccard_pairs_prefix must produce EXACTLY the baseline
    operator's thresholded output — same pairs, same common counts, same
    jaccard — across thresholds, cap settings, and an injected-near-dup
    corpus (the prefix bound, the capped-common semantics, and the
    canonical-order candidate lemma all have off-by-one failure modes
    this diff would catch)."""
    from iceberg_matrix_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    docs = _with_dups(spark, sf_dir)
    for threshold, cap in [(0.5, 64), (0.2, 64), (0.6, None), (0.9, 16)]:
        base = {
            (r.id1, r.id2): (r.common, round(r.jaccard, 12))
            for r in ngram_jaccard_pairs(
                docs, threshold=threshold, max_doc_freq=cap
            ).collect()
        }
        pref = {
            (r.id1, r.id2): (r.common, round(r.jaccard, 12))
            for r in ngram_jaccard_pairs_prefix(
                docs, threshold=threshold, max_doc_freq=cap
            ).collect()
        }
        assert pref == base, (threshold, cap,
                              set(base) ^ set(pref) or "value mismatch")
        if threshold == 0.5:
            assert base, "fixture produced no near-dup pairs to compare"


def test_chunk_index_retract_equals_rebuild_on_survivors(spark, sf_dir):
    """VERDICT r10 #5: the refcounted chunk-fingerprint state after a
    negative fold of the deleted docs must equal a from-scratch count
    of the survivors' chunks — including fingerprints whose last copy
    left (gone) and ones shared with survivors (refcount decremented,
    still present) — and a replayed retraction batch_id must be a
    no-op."""
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.text import (
        chunk_fingerprint_counts,
        chunk_fingerprint_store_cached,
    )
    from iceberg_matrix_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    store = chunk_fingerprint_store_cached(docs, sf_dir + "::retract-pin")
    deleted = docs.filter(F.col("doc_id") % 10 == 0)
    assert store.retract(chunk_fingerprint_counts(deleted), batch_id=1)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    survivors = docs.filter(F.col("doc_id") % 10 != 0)
    assert rows(store.current()) == rows(chunk_fingerprint_counts(survivors))
    # at-least-once: replaying the retraction must not double-subtract
    assert not store.retract(chunk_fingerprint_counts(deleted), batch_id=1)
    assert rows(store.current()) == rows(chunk_fingerprint_counts(survivors))


def test_normalized_text_xxhash_is_injective_on_test_corpora(spark):
    """chunk_dedup_summary's exact pass now groups on xx_fingerprint
    (8-byte xxhash64 of the normalized chunk text) instead of the
    md5 string (round 11 — half the exact-pass wire bytes). The keep
    set equals the md5-keyed one iff the hash is injective on the
    corpus's distinct normalized texts; pin that at both parity scales
    for documents AND chunk texts."""
    from iceberg_matrix_spark.functions.text import md5_fingerprint, xx_fingerprint
    from iceberg_matrix_spark.operators.text import chunks_with_ckey

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(spark, sf, "documents")
        for frame, col in (
            (docs, "text"),
            (chunks_with_ckey(docs), "chunk_text"),
        ):
            row = frame.agg(
                F.countDistinct(md5_fingerprint(col)).alias("n_md5"),
                F.countDistinct(xx_fingerprint(col)).alias("n_xx"),
            ).collect()[0]
            assert row["n_md5"] == row["n_xx"] > 0, (sf, col, row)
