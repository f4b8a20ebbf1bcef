"""Keyword retrieval over the documents corpus: BM25 ranking.

The classic training-data curation companion to dedup — score documents
against a keyword query with an inverted-index-shaped plan (Robertson &
Zaragoza 2009). Spark-first: tokenize → explode → term-filtered postings
→ per-(doc, term) tf aggregate → tiny df/corpus-stats broadcasts → one
fixed-order score mix; the final top-k is ``orderBy().limit(k)`` so the
physical plan is TakeOrderedAndProject (per-partition heaps + a k-row
driver merge), never a global sort.

Determinism contract (exact-oracle requirement — the driver compares
bit-exact): the registered query uses the RATIONAL Robertson idf
``(N − df + 0.5)/(df + 0.5)`` rather than its logarithm. Per term this
is monotone-identical to the standard ``ln``-damped BM25 idf (same
document ranking for any single term — pinned by a pytest); it trades
the log's cross-term damping for cross-engine bit-determinism, the same
surrogate pattern as the integer-deterministic CCNet filter
(operators/text.py:lm_rare_trigram_verdicts). ``log_idf=True`` gives the
textbook scoring for production use.

Scale: postings shuffle is ∝ occurrences of the QUERY terms only (the
``IN`` filter reaches the scan side of the explode); df and the corpus
length stats are a ≤|terms|-row and a 1-row broadcast; nothing in the
plan grows with corpus width.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_matrix_spark.functions.text import token_count, tokens
from iceberg_matrix_spark.queries.registry import TOKS_SQL, register
from iceberg_matrix_spark.sources.testdata import load_table

_K1 = 1.2
_B = 0.75
_BM25_TERMS = ("vector", "stream", "merge")
_BM25_TOPK = 20


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = _BM25_TOPK,
    k1: float = _K1,
    b: float = _B,
    id_col: str = "doc_id",
    text_col: str = "text",
    log_idf: bool = False,
) -> DataFrame:
    """Top-``k`` documents by BM25 against a fixed keyword query.

    Returns (doc_id, score, rank) over documents matching ≥1 term.
    Every floating-point step is a fixed op sequence: per-(doc, term)
    contributions are single rows (so the conditional per-term sums are
    single-element), and the score mixes the terms in the tuple's order
    via left-associated addition — bit-reproducible by the SQL oracle.
    """
    # corpus stats: one 1-row aggregate (n_docs, total token length).
    # The tokenize pass (feeding BOTH stats and postings) is the
    # operator's map-side CPU and a single-file corpus plans it as ONE
    # task (round 11: 9 single-task stages measured); round-robin on the
    # slim projection — no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    slim = ensure_compute_parallelism(
        docs.select(F.col(id_col), F.col(text_col).alias("__t"))
    )
    with_dl = slim.select(
        F.col(id_col), tokens("__t").alias("__toks"), token_count("__t").alias("__dl")
    )
    stats = with_dl.agg(
        F.count(F.lit(1)).alias("__n_docs"), F.sum("__dl").alias("__sum_dl")
    )
    # postings for the query terms only — the IN filter rides the explode
    tf = (
        with_dl.select(id_col, "__dl", F.explode("__toks").alias("tok"))
        .filter(F.col("tok").isin(*terms))
        .groupBy(id_col, "__dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_t), "tok").crossJoin(F.broadcast(stats))
    n, dfc = F.col("__n_docs"), F.col("df")
    odds = ((n - dfc).cast("double") + F.lit(0.5)) / (
        dfc.cast("double") + F.lit(0.5)
    )
    idf = F.log(F.lit(1.0) + odds) if log_idf else odds
    dl_norm = F.lit(1.0) - F.lit(b) + (
        F.lit(b) * (F.col("__dl").cast("double") / (F.col("__sum_dl").cast("double") / n.cast("double")))
    )
    tfd = F.col("tf").cast("double")
    contrib = idf * ((tfd * F.lit(k1 + 1.0)) / (tfd + F.lit(k1) * dl_norm))
    per_term = scored.select(id_col, F.col("tok"), contrib.alias("__c"))
    # fixed-order mix: one conditional single-element sum per term, then
    # left-associated addition in tuple order (never a float SUM whose
    # order the shuffle picks)
    agg = per_term.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("tok") == t, F.col("__c"))).alias(f"__c{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    ranked = (
        agg.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", "score"
    )


def _bm25_oracle(terms: tuple[str, ...], k: int) -> str:
    term_list = ", ".join(f"'{t}'" for t in terms)
    conds = [
        f"SUM(CASE WHEN tok = '{t}' THEN c END) AS c{i}"
        for i, t in enumerate(terms)
    ]
    mix = " + ".join(f"COALESCE(c{i}, 0.0)" for i in range(len(terms)))
    return f"""
    WITH toked AS (
      SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ),
    with_dl AS (
      SELECT doc_id, toks, len(toks) AS dl FROM toked
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM with_dl
    ),
    tf AS (
      SELECT doc_id, dl, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM with_dl)
      WHERE tok IN ({term_list})
      GROUP BY doc_id, dl, tok
    ),
    dft AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ),
    contrib AS (
      SELECT tf.doc_id, tf.tok,
             ((CAST(s.n_docs - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * {_K1 + 1.0}) /
                (CAST(tf.tf AS DOUBLE) + {_K1} *
                 (1.0 - {_B} + ({_B} * (CAST(tf.dl AS DOUBLE) /
                  (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))) AS c
      FROM tf JOIN dft d USING (tok) CROSS JOIN stats s
    ),
    mixed AS (
      SELECT doc_id, {", ".join(conds)} FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY ({mix}) DESC, doc_id) AS INT) AS rank,
           ({mix}) AS score
    FROM mixed
    ORDER BY score DESC, doc_id
    LIMIT {k}
    """


@register("q_bm25_topk", oracle=_bm25_oracle(_BM25_TERMS, _BM25_TOPK))
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for the fixed 3-term keyword query
    ('vector', 'stream', 'merge') — rational-idf deterministic form."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=_BM25_TOPK)


_SIG_TOPK = 5


@register(
    "q_source_signature_terms",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({TOKS_SQL}) AS tok FROM documents
    ),
    tf AS (
      SELECT source, tok, COUNT(*) AS tf FROM toks GROUP BY source, tok
    ),
    df_t AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ),
    ns AS (SELECT COUNT(DISTINCT source) AS n_sources FROM documents),
    scored AS (
      SELECT t.source, t.tok,
             CAST(t.tf AS DOUBLE) *
             ((CAST(s.n_sources - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
               AS score
      FROM tf t JOIN df_t d USING (tok) CROSS JOIN ns s
    )
    SELECT source, tok, CAST(rank AS INT) AS rank, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY score DESC, tok) AS rank
      FROM scored
    ) WHERE rank <= {_SIG_TOPK}
    """,
)
def q_source_signature_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic terms per source: top-5 tokens by per-source tf ×
    rational cross-source idf ((N−df+0.5)/(df+0.5) over source-level
    document frequency) — the "what makes this source different"
    profile. One explode, two aggregates, a tiny df/broadcast and a
    per-source rank window (WindowGroupLimit-pruned); the score is a
    single float PRODUCT per (source, term) — no float summation — so
    it is engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens("text")).alias("tok"))
    tf = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ns = docs.agg(F.countDistinct("source").alias("n_sources"))
    scored = tf.join(F.broadcast(df_t), "tok").crossJoin(F.broadcast(ns)).select(
        "source",
        "tok",
        (
            F.col("tf").cast("double")
            * (
                ((F.col("n_sources") - F.col("df")).cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            )
        ).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _SIG_TOPK)
        .select("source", "tok", F.col("rank").cast("int").alias("rank"), "score")
    )
