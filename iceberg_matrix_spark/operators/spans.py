"""Exact-substring (span-level) duplicate detection.

Beyond-reference operator family for the training-data pipeline: find the
maximal token spans that are duplicated VERBATIM across documents — the
operation behind suffix-array exact-substring dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", 2022) —
re-expressed as a distributed k-gram posting-list pipeline instead of a
monolithic suffix array:

1. tokenize each document (whitespace tokens, shared with the other text
   operators — functions/text.py:24);
2. hash every positional k-gram to a long (xxhash64 — 8-byte join keys,
   the string gram never leaves the row it was built in);
3. one shuffle groups grams by hash to find hashes appearing in ≥2
   DISTINCT documents, with a doc-frequency cap so stop-phrase grams
   ("in the of the …") can't emit O(df) posting rows onto one reducer
   at 100 TB — the same skew cap as the n-gram Jaccard pipeline
   (operators/dedup.py MAX_DOC_FREQ);
4. a per-document window merges overlapping duplicated k-gram starts
   into maximal spans (gaps-and-islands; state bounded by document
   length, never by corpus size).

Scale shape: shuffle volume ∝ total tokens (one 16-byte row per token
position), the group-by is partially aggregated map-side, and the only
window is per-document. No collect, no Python row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_matrix_spark.functions.text import tokens
from iceberg_matrix_spark.queries.registry import TOKS_SQL, register
from iceberg_matrix_spark.sources.testdata import load_table

# Registered-query parameters: k-gram width and the stop-gram cap (the
# oracle applies identical values, so capped Spark output == capped
# DuckDB output exactly).
SPAN_K = 8
SPAN_MAX_DOC_FREQ = 100


def _token_frame(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # the tokenize + per-gram hash work downstream is the family's
    # dominant CPU and a single-file corpus plans it as ONE task
    # (round 11: q_substring_dup_spans measured 8 stages / 11 tasks,
    # 2.2 s exec — near-serial); the round-robin exchange moves only
    # (doc_id, text) and is a no-op at scale (≥ cores scan splits)
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    slim = ensure_compute_parallelism(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
    )
    return slim.select("doc_id", tokens("__t").alias("toks"))


def _gram_starts(
    toks_df: DataFrame, k: int, max_doc_freq: int
) -> DataFrame:
    """(doc_id, pos) of every k-gram start whose gram appears in 2..cap
    distinct documents. pos is 1-based (matches DuckDB generate_series).

    The gram frame feeds BOTH the doc-frequency aggregate and the semi-
    join, so Catalyst scans the corpus twice (the plan test pins both
    scans to (doc_id, text) only). That is the deliberate trade-off: at
    100 TB, persisting the exploded gram frame costs ~16 bytes × total
    tokens of executor storage, while recomputing it is one extra pruned
    columnar scan + codegen pass — measured here (and typical for
    hash-only derivations), recompute is the same speed or faster, and
    it never risks eviction thrash. Callers that iterate over the grams
    repeatedly can persist `_token_frame` upstream instead."""
    grams = (
        toks_df.filter(F.size("toks") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - F.lit(k - 1)),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice("toks", i, k))),
                )
            ).alias("pos0", "h"),
        )
        .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "h")
    )
    dup_hashes = (
        grams.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df_"))
        .filter((F.col("df_") >= 2) & (F.col("df_") <= max_doc_freq))
        .select("h")
    )
    return grams.join(dup_hashes, "h", "left_semi").select("doc_id", "pos")


def duplicate_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = SPAN_K,
    max_doc_freq: int = SPAN_MAX_DOC_FREQ,
) -> DataFrame:
    """Maximal cross-document duplicated token spans per document:
    (doc_id, span_start, span_end, span_len), token positions 1-based
    inclusive. Two duplicated k-gram starts merge into one span when
    their windows overlap or touch (gap ≤ k)."""
    hits = _gram_starts(_token_frame(docs, id_col, text_col), k, max_doc_freq)
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(
        F.lit(1)
    )
    islands = hits.withColumn("brk", brk).withColumn(
        "island", F.sum("brk").over(w)
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_len"),
        )
    )


def span_dup_ratio(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = SPAN_K,
    max_doc_freq: int = SPAN_MAX_DOC_FREQ,
) -> DataFrame:
    """Per-document duplication profile: (doc_id, n_tokens, dup_tokens,
    dup_ratio). Documents with no duplicated span report 0/0.0 — the
    curation decision input ("drop docs >80% duplicated")."""
    toks_df = _token_frame(docs, id_col, text_col)
    sizes = toks_df.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    per_doc = (
        duplicate_spans(docs, id_col, text_col, k, max_doc_freq)
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("dup_tokens"))
    )
    return sizes.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        (
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("dup_ratio"),
    )


def span_deduped_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = SPAN_K,
    max_doc_freq: int = SPAN_MAX_DOC_FREQ,
) -> DataFrame:
    """The removal step: strip every duplicated span from every document
    and re-assemble the cleaned text — (doc_id, n_tokens, n_tokens_kept,
    clean_text). Fully-duplicated documents come back with an empty
    clean_text, the signal to drop them.

    Scale shape: covered positions explode to one row per DUPLICATED
    token (∝ contamination, not corpus), the anti-join is an equi-join
    on (doc_id, pos), and re-assembly groups by doc_id — per-document
    state only. The whole thing is one Catalyst DAG with the span
    pipeline fused in front."""
    toks_df = _token_frame(docs, id_col, text_col)
    sizes = toks_df.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens")
    )
    covered = duplicate_spans(docs, id_col, text_col, k, max_doc_freq).select(
        "doc_id", F.explode(F.sequence("span_start", "span_end")).alias("pos")
    )
    toks_pos = toks_df.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok")
    kept = toks_pos.join(covered, ["doc_id", "pos"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return sizes.join(cleaned, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_tokens_kept"), F.lit(0)).cast("long").alias("n_tokens_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# Registered queries + oracles
# ---------------------------------------------------------------------------

# Shared oracle CTE chain: identical tokenization (TOKS_SQL), 1-based
# positional k-grams, the same 2..cap doc-frequency keep rule, and the
# same gaps-and-islands merge. DuckDB joins on the gram STRING where
# Spark joins on its xxhash64 — equal outputs absent hash collisions
# (2^-64 per pair; the same contract as the n-gram Jaccard oracles).
_SPANS_SQL = f"""
  toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
  grams AS (
    -- zipped parallel unnests over the same scalar generate_series list
    -- (lateral generate_series with column args is unsupported)
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(t) - {SPAN_K - 1})) AS BIGINT) AS pos,
           unnest(list_transform(generate_series(1, len(t) - {SPAN_K - 1}),
                  i -> array_to_string(t[i:i+{SPAN_K - 1}], ' '))) AS gram
    FROM toks WHERE len(t) >= {SPAN_K}
  ),
  kept AS (
    SELECT gram FROM grams GROUP BY gram
    HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {SPAN_MAX_DOC_FREQ}
  ),
  hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN kept USING (gram)),
  isl AS (
    SELECT doc_id, pos,
           CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     <= {SPAN_K}
                THEN 0 ELSE 1 END AS brk
    FROM hits
  ),
  isl2 AS (
    SELECT doc_id, pos,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM isl
  ),
  spans AS (
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {SPAN_K - 1} AS BIGINT) AS span_end
    FROM isl2 GROUP BY doc_id, island
  )
"""


@register(
    "q_substring_dup_spans",
    oracle=f"""
    WITH {_SPANS_SQL}
    SELECT doc_id, span_start, span_end,
           span_end - span_start + 1 AS span_len
    FROM spans
    ORDER BY doc_id, span_start
    """,
)
def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every maximal cross-document duplicated token span (k=8 verbatim
    token windows, stop-gram doc-frequency cap on)."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, "doc_id", "text").orderBy(
        "doc_id", "span_start"
    )


@register(
    "q_substring_dup_ratio",
    oracle=f"""
    WITH {_SPANS_SQL},
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           COALESCE(p.dup_tokens, 0) AS dup_tokens,
           CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE) / len(t.t) AS dup_ratio
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc_id
    """,
)
def q_substring_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document verbatim-duplication ratio — the gate input for
    span-level corpus filtering."""
    docs = load_table(spark, sf_dir, "documents")
    return span_dup_ratio(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "q_substring_dedup_clean",
    oracle=f"""
    WITH {_SPANS_SQL},
    covered AS (
      SELECT doc_id, unnest(generate_series(span_start, span_end)) AS pos
      FROM spans
    ),
    toks_pos AS (
      SELECT doc_id,
             CAST(unnest(generate_series(1, len(t))) AS BIGINT) AS pos,
             unnest(t) AS tok
      FROM toks
    ),
    kept_toks AS (
      SELECT tp.doc_id, tp.pos, tp.tok
      FROM toks_pos tp
      WHERE NOT EXISTS (
        SELECT 1 FROM covered c
        WHERE c.doc_id = tp.doc_id AND c.pos = tp.pos
      )
    ),
    cleaned AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens_kept,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text
      FROM kept_toks GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           COALESCE(c.n_tokens_kept, 0) AS n_tokens_kept,
           COALESCE(c.clean_text, '') AS clean_text
    FROM toks t LEFT JOIN cleaned c USING (doc_id)
    ORDER BY doc_id
    """,
)
def q_substring_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal capstone: every duplicated span stripped, cleaned text
    re-assembled per document (empty text marks a fully-duplicated doc)."""
    docs = load_table(spark, sf_dir, "documents")
    return span_deduped_corpus(docs, "doc_id", "text").orderBy("doc_id")
