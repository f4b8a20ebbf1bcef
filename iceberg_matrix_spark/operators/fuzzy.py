"""Blocked fuzzy matching (entity-resolution-style near-exact dedup).

The curation op between exact dedup and MinHash: catch records whose
normalized titles differ by a few character edits (OCR noise, trailing
punctuation, small rewrites) that n-gram Jaccard over-fragments and
exact hashing misses entirely.

Shape (the classic blocking + verify ER plan, e.g. Christen 2012):
project each document to a 32-char normalized title, equi-join on a
deterministic BLOCKING KEY — (lang, 8-char title prefix) — and verify
candidates with Levenshtein under a distance cap. Spark-first: the
block join is a plain shuffled equi-join (AQE splits skewed blocks),
and the verify uses Spark's thresholded ``levenshtein(l, r, cap)``
whose DP early-exits at the cap: O(cap·min(m,n)) per pair instead of
O(m·n), with exact distances for every pair that passes.

Scale: candidates are Σ_b n_b² over BLOCKS, not corpus²; the prefix key
bounds n_b structurally (it fragments with corpus growth the way the
scoped-dedup cluster ids do). Production recipe for recall: union
several redundant blocking passes (prefix, suffix, sorted-token key) —
each is this same plan; the pairs union cheaply because each pass emits
only verified (id1, id2) rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_matrix_spark.functions.text import norm_text
from iceberg_matrix_spark.queries.registry import register
from iceberg_matrix_spark.sources.testdata import load_table

_TITLE_LEN = 32
_BLOCK_PREFIX = 8
_MAX_DIST = 8


def fuzzy_title_pairs(
    docs: DataFrame,
    max_dist: int = _MAX_DIST,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """(id1, id2, dist) for document pairs whose normalized 32-char
    titles are within ``max_dist`` edits, candidate-blocked on
    (*block_cols, 8-char title prefix); id1 < id2, ordered output ids.

    Integer edit distances under identical DP definitions on both
    engines make the whole operator exactly SQL-oracle-able.
    """
    t = docs.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.substring(norm_text(text_col), 1, _TITLE_LEN).alias("__title"),
    ).withColumn("__blk", F.substring("__title", 1, _BLOCK_PREFIX))
    a = t.select(
        F.col(id_col).alias("id1"),
        *[F.col(c).alias(f"__a_{c}") for c in block_cols],
        F.col("__title").alias("__t1"),
        F.col("__blk").alias("__blk1"),
    )
    b = t.select(
        F.col(id_col).alias("id2"),
        *[F.col(c).alias(f"__b_{c}") for c in block_cols],
        F.col("__title").alias("__t2"),
        F.col("__blk").alias("__blk2"),
    )
    cond = (F.col("__blk1") == F.col("__blk2")) & (F.col("id1") < F.col("id2"))
    for c in block_cols:
        cond = cond & (F.col(f"__a_{c}") == F.col(f"__b_{c}"))
    # thresholded levenshtein: the DP abandons a pair once its running
    # distance exceeds the cap (returns -1), so per-pair cost is
    # O(cap·min(len)) — the exact distance survives for every kept pair
    dist = F.levenshtein(F.col("__t1"), F.col("__t2"), max_dist)
    return (
        a.join(b, cond)
        .select("id1", "id2", dist.alias("dist"))
        .filter(F.col("dist") >= 0)
        .select("id1", "id2", F.col("dist").cast("int").alias("dist"))
    )


@register(
    "q_fuzzy_title_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                    1, {_TITLE_LEN}) AS title
      FROM documents
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(levenshtein(a.title, b.title) AS INT) AS dist
    FROM t a JOIN t b
      ON a.lang = b.lang
     AND substr(a.title, 1, {_BLOCK_PREFIX}) = substr(b.title, 1, {_BLOCK_PREFIX})
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.title, b.title) <= {_MAX_DIST}
    """,
)
def q_fuzzy_title_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact title duplicates: pairs within 8 edits over 32-char
    normalized titles, blocked on (lang, 8-char prefix)."""
    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_title_pairs(docs)
