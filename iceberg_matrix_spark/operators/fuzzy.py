"""Blocked fuzzy matching (entity-resolution-style near-exact dedup).

The curation op between exact dedup and MinHash: catch records whose
normalized titles differ by a few character edits (OCR noise, trailing
punctuation, small rewrites) that n-gram Jaccard over-fragments and
exact hashing misses entirely.

Shape (the classic blocking + verify ER plan, e.g. Christen 2012):
project each document to a 32-char normalized title, equi-join on a
deterministic BLOCKING KEY, and verify candidates with Levenshtein
under a distance cap. Spark-first: the block join is a plain shuffled
equi-join (AQE splits skewed blocks), and the verify uses Spark's
thresholded ``levenshtein(l, r, cap)`` whose DP early-exits at the cap:
O(cap·min(m,n)) per pair instead of O(m·n), with exact distances for
every pair that passes.

Blocking is HIERARCHICAL with a population cap — the lesson the 100×
sweep taught the first (single-level) version of this operator: an
8-char prefix alone goes quadratic the moment many documents open with
the same ≥8-char word ("customer…", boilerplate headers — the sweep's
amplified corpus hit exactly this and walled 323 s at 100×). Each
(lang, 8-char-prefix) block whose population exceeds the cap promotes
its rows to a 16-char prefix; still-hot 16-blocks promote to the full
32-char title. Pairs must share their FINAL block, so candidate volume
is Σ_b min(n_b, structure)² with every non-degenerate block capped —
the recall trade (hot-prefix pairs now need a longer shared prefix) is
deterministic and documented, and the degenerate floor (more than cap
documents sharing one full 32-char title) is exact-duplicate mass that
belongs to the exact-dedup family upstream.

Scale: candidates are Σ_b n_b² over FINAL blocks, not corpus²; the
level counts are three narrow window aggregations over ~50-byte rows.
Production recipe for recall: union several redundant blocking passes
(prefix, suffix, sorted-token key) — each is this same plan; the pairs
union cheaply because each pass emits only verified (id1, id2) rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_matrix_spark.functions.text import norm_text
from iceberg_matrix_spark.queries.registry import register
from iceberg_matrix_spark.sources.testdata import load_table

_TITLE_LEN = 32
_BLOCK_PREFIXES = (8, 16, _TITLE_LEN)  # promotion ladder
_BLOCK_CAP = 64                        # max docs per non-final block
_MAX_DIST = 8


def _with_final_block(
    t: DataFrame, block_cols: tuple[str, ...]
) -> DataFrame:
    """Assign each row its final (level, block) under the cap-promotion
    ladder: stay at the shortest prefix whose block population is within
    ``_BLOCK_CAP``; the full-title level is terminal (never promoted)."""
    out = t
    for i, p in enumerate(_BLOCK_PREFIXES):
        out = out.withColumn(f"__p{i}", F.substring("__title", 1, p))
        w = Window.partitionBy(*block_cols, f"__p{i}")
        out = out.withColumn(f"__n{i}", F.count(F.lit(1)).over(w))
    last = len(_BLOCK_PREFIXES) - 1
    level = F.lit(last)
    blk = F.col(f"__p{last}")
    for i in range(last - 1, -1, -1):
        level = F.when(F.col(f"__n{i}") <= _BLOCK_CAP, F.lit(i)).otherwise(level)
        blk = F.when(F.col(f"__n{i}") <= _BLOCK_CAP, F.col(f"__p{i}")).otherwise(blk)
    return out.select(
        *t.columns, level.alias("__lvl"), blk.alias("__blk")
    )


def fuzzy_title_pairs(
    docs: DataFrame,
    max_dist: int = _MAX_DIST,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """(id1, id2, dist) for document pairs whose normalized 32-char
    titles are within ``max_dist`` edits and share a final
    cap-promoted block (see module docstring); id1 < id2.

    Integer edit distances under identical DP definitions on both
    engines make the whole operator exactly SQL-oracle-able.
    """
    # the per-pair thresholded Levenshtein DP is the operator's CPU and
    # a single-file corpus plans the probe side as ONE task (round 11:
    # 5 single-task stages measured); round-robin the slim projection —
    # no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    t = ensure_compute_parallelism(
        docs.select(F.col(id_col), *[F.col(c) for c in block_cols], F.col(text_col))
    ).select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.substring(norm_text(text_col), 1, _TITLE_LEN).alias("__title"),
    )
    t = _with_final_block(t, block_cols)
    a = t.select(
        F.col(id_col).alias("id1"),
        *[F.col(c).alias(f"__a_{c}") for c in block_cols],
        F.col("__title").alias("__t1"),
        F.col("__lvl").alias("__lvl1"),
        F.col("__blk").alias("__blk1"),
    )
    b = t.select(
        F.col(id_col).alias("id2"),
        *[F.col(c).alias(f"__b_{c}") for c in block_cols],
        F.col("__title").alias("__t2"),
        F.col("__lvl").alias("__lvl2"),
        F.col("__blk").alias("__blk2"),
    )
    cond = (
        (F.col("__lvl1") == F.col("__lvl2"))
        & (F.col("__blk1") == F.col("__blk2"))
        & (F.col("id1") < F.col("id2"))
    )
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


def _oracle_levels_sql() -> str:
    """The cap-promotion ladder in SQL: per level, the block prefix and
    its (lang-scoped) population; final level = shortest within-cap."""
    prefix_cols = ", ".join(
        f"substr(title, 1, {p}) AS p{i}" for i, p in enumerate(_BLOCK_PREFIXES)
    )
    count_cols = ", ".join(
        f"COUNT(*) OVER (PARTITION BY lang, p{i}) AS n{i}"
        for i in range(len(_BLOCK_PREFIXES))
    )
    last = len(_BLOCK_PREFIXES) - 1
    lvl = f"{last}"
    blk = f"p{last}"
    for i in range(last - 1, -1, -1):
        lvl = f"CASE WHEN n{i} <= {_BLOCK_CAP} THEN {i} ELSE {lvl} END"
        blk = f"CASE WHEN n{i} <= {_BLOCK_CAP} THEN p{i} ELSE {blk} END"
    return f"""
    t AS (
      SELECT doc_id, lang,
             substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                    1, {_TITLE_LEN}) AS title
      FROM documents
    ),
    lp AS (
      SELECT doc_id, lang, title, {prefix_cols} FROM t
    ),
    lc AS (
      SELECT *, {count_cols} FROM lp
    ),
    fin AS (
      SELECT doc_id, lang, title, ({lvl}) AS lvl, ({blk}) AS blk FROM lc
    )"""


@register(
    "q_fuzzy_title_pairs",
    oracle=f"""
    WITH {_oracle_levels_sql()}
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(levenshtein(a.title, b.title) AS INT) AS dist
    FROM fin a JOIN fin b
      ON a.lang = b.lang AND a.lvl = b.lvl AND a.blk = b.blk
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.title, b.title) <= {_MAX_DIST}
    """,
)
def q_fuzzy_title_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact title duplicates: pairs within 8 edits over 32-char
    normalized titles, hierarchically blocked on (lang, 8→16→32-char
    prefix, cap 64)."""
    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_title_pairs(docs)


def incremental_fuzzy_verdicts(
    batch: DataFrame,
    corpus: DataFrame,
    max_dist: int = _MAX_DIST,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    corpus_titles: DataFrame | None = None,
) -> DataFrame:
    """Incremental-ingest fuzzy dedup: verdict per BATCH document —
    ``dup_of_corpus`` when an already-ingested title is within
    ``max_dist`` edits under the corpus' final blocking, else
    ``dup_in_batch`` when a LOWER-id batch title matches (the family's
    min-id representative rule), else ``kept``.

    Scale contract (mirrors incremental_dedup_exact /
    incremental_semantic_verdicts): the corpus side's titled+blocked
    frame is the REUSABLE INDEX (pass the prebuilt frame as
    ``corpus_titles``; ~60 B/doc, built once at ingest, persisted); per
    batch the work is batch titles + one broadcast block join per side.
    Block levels are the CORPUS index's (the batch adopts the block its
    title falls into at the corpus' promotion level — a batch must not
    re-level the index), so per-batch cost is bounded by the capped
    block populations.
    """
    ct = (
        corpus_titles
        if corpus_titles is not None
        else _with_final_block(
            corpus.select(
                F.col(id_col),
                *[F.col(c) for c in block_cols],
                F.substring(norm_text(text_col), 1, _TITLE_LEN).alias("__title"),
            ),
            block_cols,
        )
    )
    bt = batch.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.substring(norm_text(text_col), 1, _TITLE_LEN).alias("__title"),
    )
    dist = F.levenshtein(F.col("__bt"), F.col("__ct"), max_dist)

    def _batch_side(prefix_len_idx: int) -> DataFrame:
        return bt.select(
            F.col(id_col).alias("__bid"),
            *[F.col(c).alias(f"__b_{c}") for c in block_cols],
            F.col("__title").alias("__bt"),
            F.substring(
                "__title", 1, _BLOCK_PREFIXES[prefix_len_idx]
            ).alias("__bblk"),
            F.lit(prefix_len_idx).alias("__blvl"),
        )

    batch_keyed = _batch_side(0)
    for i in range(1, len(_BLOCK_PREFIXES)):
        batch_keyed = batch_keyed.unionByName(_batch_side(i))
    corpus_keyed = ct.select(
        F.col(id_col).alias("__cid"),
        *[F.col(c).alias(f"__c_{c}") for c in block_cols],
        F.col("__title").alias("__ct"),
        F.col("__blk").alias("__cblk"),
        F.col("__lvl").alias("__clvl"),
    )
    cond = (
        (F.col("__blvl") == F.col("__clvl"))
        & (F.col("__bblk") == F.col("__cblk"))
    )
    for c in block_cols:
        cond = cond & (F.col(f"__b_{c}") == F.col(f"__c_{c}"))
    of_corpus = (
        F.broadcast(batch_keyed)
        .join(corpus_keyed, cond)
        .filter(dist >= 0)
        .select(F.col("__bid").alias(id_col))
        .distinct()
        .withColumn("__of_corpus", F.lit(True))
    )
    # batch × batch under the BATCH's own promotion (batches are small)
    in_batch = (
        fuzzy_title_pairs(batch, max_dist, id_col, text_col, block_cols)
        .select(F.col("id2").alias(id_col))
        .distinct()
        .withColumn("__in_batch", F.lit(True))
    )
    return (
        batch.select(id_col)
        .join(of_corpus, id_col, "left")
        .join(in_batch, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__of_corpus"), F.lit("dup_of_corpus"))
            .when(F.col("__in_batch"), F.lit("dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )


def _oracle_ladder_sql(src_sql: str) -> str:
    """Cap-promotion ladder over an arbitrary (doc_id, lang, title)
    source, as one inline SQL subquery. The ladder MUST be computed over
    exactly the rows it blocks — laddering a slice against the full
    corpus' populations changes promotion decisions near the cap (the
    latent parity bug ADVICE r7 #1 found in q_fuzzy_incremental's
    oracle, which leveled the corpus slice over ALL documents while the
    operator levels over the corpus alone)."""
    last = len(_BLOCK_PREFIXES) - 1
    lvl = f"{last}"
    blk = f"p{last}"
    for i in range(last - 1, -1, -1):
        lvl = f"CASE WHEN n{i} <= {_BLOCK_CAP} THEN {i} ELSE {lvl} END"
        blk = f"CASE WHEN n{i} <= {_BLOCK_CAP} THEN p{i} ELSE {blk} END"
    prefixes = ", ".join(
        f"substr(title, 1, {p}) AS p{i}" for i, p in enumerate(_BLOCK_PREFIXES)
    )
    counts = ", ".join(
        f"COUNT(*) OVER (PARTITION BY lang, substr(title, 1, {p})) AS n{i}"
        for i, p in enumerate(_BLOCK_PREFIXES)
    )
    return f"""
      SELECT doc_id, lang, title, ({lvl}) AS lvl, ({blk}) AS blk
      FROM (
        SELECT doc_id, lang, title, {prefixes}, {counts}
        FROM ({src_sql})
      )"""


@register(
    "q_fuzzy_incremental",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                    1, {_TITLE_LEN}) AS title
      FROM documents
    ),
    cfin AS ({_oracle_ladder_sql("SELECT doc_id, lang, title FROM t WHERE doc_id % 5 <> 0")}),
    bt AS (SELECT doc_id, lang, title FROM t WHERE doc_id % 5 = 0),
    ofc AS (
      SELECT DISTINCT b.doc_id FROM bt b JOIN cfin c
        ON b.lang = c.lang
       AND substr(b.title, 1, CASE c.lvl WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 32 END) = c.blk
       AND levenshtein(b.title, c.title) <= {_MAX_DIST}
    ),
    bfin AS ({_oracle_ladder_sql("SELECT doc_id, lang, title FROM bt")}),
    ibb AS (
      SELECT DISTINCT b.doc_id FROM bfin a JOIN bfin b
        ON a.lang = b.lang AND a.lvl = b.lvl AND a.blk = b.blk
       AND a.doc_id < b.doc_id
       AND levenshtein(a.title, b.title) <= {_MAX_DIST}
    )
    SELECT b.doc_id,
           CASE WHEN o.doc_id IS NOT NULL THEN 'dup_of_corpus'
                WHEN i.doc_id IS NOT NULL THEN 'dup_in_batch'
                ELSE 'kept' END AS verdict
    FROM bt b
    LEFT JOIN ofc o ON o.doc_id = b.doc_id
    LEFT JOIN ibb i ON i.doc_id = b.doc_id
    """,
)
def q_fuzzy_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental fuzzy dedup: documents with doc_id % 5 == 0 play the
    incoming batch, checked against the remaining corpus' blocked title
    index (verdicts per batch doc)."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_fuzzy_verdicts(batch, corpus)


def fuzzy_title_pairs_sorted_tokens(
    docs: DataFrame,
    max_dist: int = _MAX_DIST,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    n_tokens: int = 3,
) -> DataFrame:
    """The module docstring's RECALL recipe materialized: a second
    blocking pass keyed on the title's first ``n_tokens`` tokens SORTED
    alphabetically — pairs whose edits fall inside the 8-char prefix
    (which the prefix pass can't see) still share this key when the
    edit only reorders/retouches words. Verify is the identical
    thresholded Levenshtein; output shape matches
    :func:`fuzzy_title_pairs` so the passes union directly.

    The key is capped at ``_BLOCK_CAP`` the degenerate way (oversized
    sorted-token blocks drop — they are headline boilerplate the prefix
    pass, with its promotion ladder, still covers), keeping this pass a
    strict recall ADD-ON rather than a second quadratic surface.
    """
    t = docs.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.substring(norm_text(text_col), 1, _TITLE_LEN).alias("__title"),
    ).withColumn(
        "__key",
        F.concat_ws(
            " ", F.sort_array(F.slice(F.split("__title", " "), 1, n_tokens))
        ),
    )
    w = Window.partitionBy(*block_cols, "__key")
    t = t.withColumn("__n", F.count(F.lit(1)).over(w)).filter(
        F.col("__n") <= _BLOCK_CAP
    )
    a = t.select(
        F.col(id_col).alias("id1"),
        *[F.col(c).alias(f"__a_{c}") for c in block_cols],
        F.col("__title").alias("__t1"),
        F.col("__key").alias("__k1"),
    )
    b = t.select(
        F.col(id_col).alias("id2"),
        *[F.col(c).alias(f"__b_{c}") for c in block_cols],
        F.col("__title").alias("__t2"),
        F.col("__key").alias("__k2"),
    )
    cond = (F.col("__k1") == F.col("__k2")) & (F.col("id1") < F.col("id2"))
    for c in block_cols:
        cond = cond & (F.col(f"__a_{c}") == F.col(f"__b_{c}"))
    dist = F.levenshtein(F.col("__t1"), F.col("__t2"), max_dist)
    return (
        a.join(b, cond)
        .select("id1", "id2", dist.alias("dist"))
        .filter(F.col("dist") >= 0)
        .select("id1", "id2", F.col("dist").cast("int").alias("dist"))
    )


def fuzzy_union_pairs(docs: DataFrame, **kw) -> DataFrame:
    """Union of the prefix-ladder and sorted-token blocking passes —
    each pass emits only verified pairs, so the union is one cheap
    distinct over (id1, id2, dist) rows (dist is a property of the
    titles, identical whichever pass found the pair)."""
    return (
        fuzzy_title_pairs(docs, **kw)
        .unionByName(fuzzy_title_pairs_sorted_tokens(docs, **kw))
        .distinct()
    )


@register(
    "q_fuzzy_union_pairs",
    oracle=f"""
    WITH {_oracle_levels_sql()},
    prefix_pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(levenshtein(a.title, b.title) AS INT) AS dist
      FROM fin a JOIN fin b
        ON a.lang = b.lang AND a.lvl = b.lvl AND a.blk = b.blk
       AND a.doc_id < b.doc_id
      WHERE levenshtein(a.title, b.title) <= {_MAX_DIST}
    ),
    keyed AS (
      SELECT doc_id, lang, title,
             array_to_string(list_sort(list_slice(
               regexp_split_to_array(title, ' '), 1, 3)), ' ') AS k
      FROM t
    ),
    capped AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY lang, k) AS n FROM keyed
      ) WHERE n <= {_BLOCK_CAP}
    ),
    token_pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(levenshtein(a.title, b.title) AS INT) AS dist
      FROM capped a JOIN capped b
        ON a.lang = b.lang AND a.k = b.k AND a.doc_id < b.doc_id
      WHERE levenshtein(a.title, b.title) <= {_MAX_DIST}
    )
    SELECT DISTINCT id1, id2, dist FROM (
      SELECT * FROM prefix_pairs UNION ALL SELECT * FROM token_pairs
    )
    """,
)
def q_fuzzy_union_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass fuzzy matching: prefix-ladder pairs ∪ sorted-token-key
    pairs (the recall recipe — prefix edits that fool pass 1 still share
    pass 2's reordered-token key)."""
    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_union_pairs(docs)
