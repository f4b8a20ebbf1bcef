"""Line-level exact deduplication (C4 / RefinedWeb-style).

The most common LLM-curation operation after document-level dedup:
remove BOILERPLATE LINES that repeat across the corpus ("Sign in",
cookie banners, nav bars — RefinedWeb/MassiveText's most-frequent-line
removal) and WITHIN-DOCUMENT repeated lines (C4 keeps one copy of any
repeated span), then reassemble the cleaned corpus. Complements the
span family (operators/spans.py): spans find verbatim k-gram overlap at
arbitrary offsets; this family works at line granularity with a
frequency rule, which is what production web-corpus cleaning actually
runs first (Penedo et al. 2023, arXiv:2306.01116 §4.2; Raffel et al.
2020, arXiv:1910.10683 §2.2).

Rules (deterministic, oracle-able):

- corpus rule: a line whose text occurs in ``min_doc_freq``+ DISTINCT
  documents is boilerplate — every occurrence is removed;
- document rule: of identical lines within one document, only the
  first (lowest line_no) survives;
- a line is kept iff both rules pass; cleaned text is the kept lines
  re-joined in order.

Line segmentation: real corpora split on ``\\n``; the test corpus is
single-line, so the registered queries segment each document into
fixed ``LINE_TOKENS``-token windows — the same whitespace tokenizer as
every other text operator (functions/text.py:24), expressed identically
in the DuckDB oracles.

Scale shape (the 100 TB contract):

- one row per line (∝ corpus tokens / line width), exploded from a
  pruned (doc_id, text) scan — no Python row path anywhere;
- lines join and group on an 8-byte xxhash64 key; the line STRING never
  leaves the row it was built in (the spans-family contract — the
  oracle joins on the string, equal output absent 2⁻⁶⁴ collisions);
- the doc-frequency aggregate is two-phase (partial map-side); a
  boilerplate line appearing in 10⁹ documents contributes one row per
  (hash, doc) to phase 1 — spread keys — and df pre-aggregated counts
  to phase 2;
- the verdict join left side is skewed on hot boilerplate hashes by
  construction; the frequency side has ONE row per key, so AQE's skew
  split handles it (same posture as the n-gram family's capped joins);
- the only window is per (doc_id, line hash) — state bounded by one
  document, never the corpus;
- reassembly groups by doc_id, per-document state only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_matrix_spark.functions.text import tokens
from iceberg_matrix_spark.queries.registry import TOKS_SQL, register
from iceberg_matrix_spark.sources.testdata import load_table

# Registered-query parameters (the oracles apply identical values).
LINE_TOKENS = 10
LINE_MIN_DOC_FREQ = 2


def doc_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = LINE_TOKENS,
) -> DataFrame:
    """(doc_id, line_no, line): each document segmented into fixed
    ``line_tokens``-token windows (1-based line_no; the last line may be
    short). With newline-delimited corpora, substitute a split on
    ``\\n`` — everything downstream only sees (doc_id, line_no, line)."""
    # tokenize + fixed-window segmentation is the family's map-side CPU
    # and a single-file corpus plans it as ONE task (round 11:
    # q_line_dedup_clean measured 13 single-task stages); round-robin on
    # the slim (doc_id, text) projection — no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    slim = ensure_compute_parallelism(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
    )
    toks_df = slim.select("doc_id", tokens("__t").alias("toks"))
    n_lines = F.ceil(F.size("toks") / F.lit(float(line_tokens)))
    lines_arr = F.transform(
        F.sequence(F.lit(1).cast("long"), n_lines),
        lambda i: F.array_join(
            F.slice(
                "toks",
                ((i - 1) * line_tokens + 1).cast("int"),
                line_tokens,
            ),
            " ",
        ),
    )
    return toks_df.select(
        "doc_id", F.posexplode(lines_arr).alias("idx", "line")
    ).select("doc_id", (F.col("idx") + 1).cast("long").alias("line_no"), "line")


def line_dedup_verdicts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = LINE_TOKENS,
    min_doc_freq: int = LINE_MIN_DOC_FREQ,
) -> DataFrame:
    """Per-line keep verdicts: (doc_id, line_no, line, corpus_df, keep).

    ``corpus_df`` = distinct documents containing the line's exact text;
    ``keep`` = corpus_df < min_doc_freq AND this is the first occurrence
    of the line within its document."""
    lines = doc_lines(docs, id_col, text_col, line_tokens).withColumn(
        "__h", F.xxhash64("line")
    )
    freq = lines.groupBy("__h").agg(
        F.countDistinct("doc_id").alias("corpus_df")
    )
    w = Window.partitionBy("doc_id", "__h").orderBy("line_no")
    return (
        lines.withColumn("__occ", F.row_number().over(w))
        .join(freq, "__h")
        .select(
            "doc_id",
            "line_no",
            "line",
            "corpus_df",
            (
                (F.col("corpus_df") < min_doc_freq) & (F.col("__occ") == 1)
            ).alias("keep"),
        )
    )


def line_deduped_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = LINE_TOKENS,
    min_doc_freq: int = LINE_MIN_DOC_FREQ,
) -> DataFrame:
    """The removal capstone: (doc_id, n_lines, n_lines_kept, clean_text)
    with every boilerplate / repeated line stripped and the survivors
    re-joined in line order. A fully-boilerplate document comes back with
    an empty clean_text — the drop signal (same contract as
    spans.span_deduped_corpus)."""
    verdicts = line_dedup_verdicts(
        docs, id_col, text_col, line_tokens, min_doc_freq
    )
    sizes = verdicts.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    cleaned = (
        verdicts.filter("keep")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return sizes.join(cleaned, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce(F.col("n_lines_kept"), F.lit(0))
        .cast("long")
        .alias("n_lines_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------

# Shared oracle CTE chain: identical tokenization (TOKS_SQL), identical
# fixed-width segmentation (DuckDB slices are 1-based inclusive and clamp
# at the array end, matching F.slice), frequency + first-occurrence rules
# on the line STRING where Spark uses its xxhash64.
_LINES_SQL = f"""
  toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
  lines AS (
    -- zipped parallel unnests over the same generate_series list
    -- (lateral generate_series with column args is unsupported)
    SELECT doc_id,
           CAST(unnest(generate_series(1, CAST(ceil(len(t) / {LINE_TOKENS}.0) AS BIGINT))) AS BIGINT) AS line_no,
           unnest(list_transform(generate_series(1, CAST(ceil(len(t) / {LINE_TOKENS}.0) AS BIGINT)),
                  i -> array_to_string(t[(i-1)*{LINE_TOKENS}+1:(i-1)*{LINE_TOKENS}+{LINE_TOKENS}], ' '))) AS line
    FROM toks
  ),
  freq AS (
    SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS corpus_df
    FROM lines GROUP BY line
  ),
  occ AS (
    SELECT doc_id, line_no, line,
           ROW_NUMBER() OVER (PARTITION BY doc_id, line ORDER BY line_no) AS occ_no
    FROM lines
  ),
  verdicts AS (
    SELECT o.doc_id, o.line_no, o.line, f.corpus_df,
           (f.corpus_df < {LINE_MIN_DOC_FREQ} AND o.occ_no = 1) AS keep
    FROM occ o JOIN freq f USING (line)
  )
"""


@register(
    "q_line_dedup",
    oracle=f"""
    WITH {_LINES_SQL}
    SELECT doc_id, line_no, line, corpus_df, keep
    FROM verdicts
    ORDER BY doc_id, line_no
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb line-dedup verdicts: per {LINE_TOKENS}-token line,
    its corpus document frequency and whether it survives the
    boilerplate (df ≥ {LINE_MIN_DOC_FREQ} distinct docs → drop all
    copies) and within-document first-occurrence rules."""
    docs = load_table(spark, sf_dir, "documents")
    return line_dedup_verdicts(docs, "doc_id", "text").orderBy(
        "doc_id", "line_no"
    )


@register(
    "q_line_dedup_clean",
    oracle=f"""
    WITH {_LINES_SQL},
    kept AS (SELECT doc_id, line_no, line FROM verdicts WHERE keep),
    cleaned AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
             string_agg(line, ' ' ORDER BY line_no) AS clean_text
      FROM kept GROUP BY doc_id
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lines GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_lines,
           COALESCE(c.n_lines_kept, 0) AS n_lines_kept,
           COALESCE(c.clean_text, '') AS clean_text
    FROM sizes s LEFT JOIN cleaned c USING (doc_id)
    ORDER BY doc_id
    """,
)
def q_line_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned-corpus reassembly: every boilerplate/repeated line
    stripped, survivors re-joined per document in line order."""
    docs = load_table(spark, sf_dir, "documents")
    return line_deduped_corpus(docs, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Incremental ingest form
# ---------------------------------------------------------------------------


def line_frequency_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = LINE_TOKENS,
) -> DataFrame:
    """The persisted INGEST INDEX for incremental line dedup: one row per
    distinct line hash with its corpus document frequency. Built once at
    ingest (and updated per accepted batch in production); per-batch
    dedup then never re-reads the corpus text."""
    lines = doc_lines(corpus, id_col, text_col, line_tokens).withColumn(
        "__h", F.xxhash64("line")
    )
    return lines.groupBy("__h").agg(
        F.countDistinct("doc_id").alias("corpus_df")
    )


def incremental_line_verdicts(
    batch: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = LINE_TOKENS,
    min_doc_freq: int = LINE_MIN_DOC_FREQ,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Per-BATCH-line verdicts with the already-ingested corpus as
    context: a batch line is boilerplate when its document frequency
    across corpus+batch reaches ``min_doc_freq`` (doc sets are disjoint,
    so total df = indexed corpus_df + batch df — the result equals
    running the full :func:`line_dedup_verdicts` over corpus ∪ batch and
    keeping the batch rows, which is exactly what the oracle does).

    Scale shape (mirrors the exact/ngram/semantic incremental family):
    the corpus side is the REUSABLE frequency index (``corpus_index`` =
    :func:`line_frequency_index` output, persisted at ingest); the index
    is first pruned by a broadcast semi-join on the batch's line hashes
    (a LEFT join cannot broadcast its preserved side, so prune-then-
    broadcast is the pattern), after which every per-batch stage is
    map-side over the small batch frame — zero corpus-side shuffle."""
    bl = doc_lines(batch, id_col, text_col, line_tokens).withColumn(
        "__h", F.xxhash64("line")
    )
    idx = (
        corpus_index
        if corpus_index is not None
        else line_frequency_index(corpus, id_col, text_col, line_tokens)
    )
    hits = idx.join(
        F.broadcast(bl.select("__h").distinct()), "__h", "left_semi"
    )
    bdf = bl.groupBy("__h").agg(F.countDistinct("doc_id").alias("batch_df"))
    w = Window.partitionBy("doc_id", "__h").orderBy("line_no")
    return (
        bl.withColumn("__occ", F.row_number().over(w))
        .join(bdf, "__h")
        .join(F.broadcast(hits), "__h", "left")
        .select(
            "doc_id",
            "line_no",
            "line",
            (
                F.coalesce(F.col("corpus_df"), F.lit(0)) + F.col("batch_df")
            ).alias("total_df"),
            (
                (
                    F.coalesce(F.col("corpus_df"), F.lit(0))
                    + F.col("batch_df")
                    < min_doc_freq
                )
                & (F.col("__occ") == 1)
            ).alias("keep"),
        )
    )


@register(
    "q_line_dedup_incremental",
    oracle=f"""
    WITH {_LINES_SQL}
    SELECT doc_id, line_no, line,
           corpus_df AS total_df, keep
    FROM verdicts
    WHERE doc_id % 5 = 0
    ORDER BY doc_id, line_no
    """,
)
def q_line_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental line dedup: documents with doc_id % 5 == 0 play the
    incoming batch, the rest the ingested corpus whose line-frequency
    index the batch is checked against. Deterministic split, so the
    full-corpus oracle restricted to batch docs reproduces the verdicts
    (disjoint doc sets ⇒ union df = corpus_df + batch_df)."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_line_verdicts(batch, corpus).orderBy(
        "doc_id", "line_no"
    )
