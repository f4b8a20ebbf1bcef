"""Deduplication operators for the document pipeline (north-star surface).

Four families, all shuffle-lean and designed for 100 TB:

- **Exact**: hash-groupBy on a text fingerprint. One shuffle on the
  fingerprint; map-side combine collapses duplicates before the exchange.
- **N-gram Jaccard**: inverted-index self-join on distinct k-word
  shingles (NOT an O(n²) cross join) → common-shingle counts → Jaccard.
  A document-frequency cap drops stop-shingles before the join — at scale
  the hottest shingle otherwise dominates one reducer.
- **MinHash + LSH**: per-doc signatures (K min-hashes over shingle
  hashes), banded into buckets; candidate pairs come from equi-joins on
  (band, bucket) — shuffle proportional to candidates, not pairs.
- **SimHash**: 64-bit weighted-bit signature; near-dup pairs via banded
  chunk join + Hamming-distance filter.

MinHash/SimHash signatures use Spark's xxhash64 (not reproducible in
DuckDB), so their queries carry no SQL oracle; tests/test_dedup.py instead
verifies them against the exact-Jaccard ground truth computed by the
oracle-checked n-gram operator.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_matrix_spark.functions.text import md5_fingerprint, tokens, word_shingles
from iceberg_matrix_spark.queries.registry import register
from iceberg_matrix_spark.sources.testdata import load_table

# Deterministic MinHash permutation parameters (seeded; module constants so
# every run — and every executor — agrees).
_MERSENNE = (1 << 61) - 1
_NUM_HASHES = 32
_LSH_BANDS = 16  # 2 rows/band → P(candidate | j=0.5) ≈ 0.99
_rng = random.Random(42)
_HASH_AB = [(_rng.randrange(1, 1 << 31), _rng.randrange(0, 1 << 31)) for _ in range(_NUM_HASHES)]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical (normalized) texts: fingerprint → representative id
    (min) + duplicate count. The representative-selection idiom is the
    scalable one: min() aggregate, not a window over the full corpus."""
    return (
        df.select(F.col(id_col).alias("doc_id"), md5_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per identical text (the min-id representative).

    The fingerprint is materialized as a column once, so the
    normalization regex + md5 runs a single time per row — joining on a
    recomputed ``md5_fingerprint(text_col)`` expression would charge it
    on both sides of the semi-join."""
    with_fp = df.withColumn("__fp", md5_fingerprint(text_col))
    w_min = (
        with_fp.select(F.col(id_col).alias("__id"), "__fp")
        .groupBy("__fp")
        .agg(F.min("__id").alias("__keep"))
    )
    return with_fp.join(
        w_min,
        (with_fp.__fp == w_min.__fp) & (F.col(id_col) == w_min.__keep),
        "left_semi",
    ).drop("__fp")


def incremental_dedup_exact(
    batch: DataFrame, index: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Dedup a NEW document batch against an EXISTING corpus fingerprint
    index — the incremental-corpus-update shape. At 100 TB you never
    re-dedup the whole corpus per ingest; you keep a fingerprint index
    table (16-byte rows, ~1/1000 of corpus bytes) and check each batch
    against it.

    ``index`` needs a ``fingerprint`` column (e.g. the output of
    :func:`exact_dedup_groups` on the existing corpus, or an IceLite
    fingerprint table maintained across ingests). Returns one row per
    batch document: (doc_id, fingerprint, verdict) with verdict ∈
    {'kept', 'dup_of_corpus', 'dup_in_batch'} — 'kept' rows are the ones
    to append to both the corpus and the index.

    Scale: batch-side work shuffles ∝ |batch| (one fingerprint agg +
    joins on fingerprint); the index side ships only its fingerprint
    column, and AQE broadcasts it when a partition-pruned index slice
    fits. For co-located repeat ingests, bucket the index table by
    fingerprint so this join never reshuffles the index. The MinHash
    index composes the same way (signatures stored per corpus doc; batch
    band-buckets joined against the stored buckets).
    """
    fp = batch.select(
        F.col(id_col).alias("doc_id"), md5_fingerprint(text_col).alias("fingerprint")
    )
    firsts = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("__first_id"))
    known = index.select("fingerprint").distinct().withColumn("__in_corpus", F.lit(1))
    return (
        fp.join(firsts, "fingerprint")
        .join(known, "fingerprint", "left")
        .select(
            "doc_id",
            "fingerprint",
            F.when(F.col("__in_corpus").isNotNull(), F.lit("dup_of_corpus"))
            .when(F.col("doc_id") != F.col("__first_id"), F.lit("dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard (inverted-index join; SQL-oracle-able)
# ---------------------------------------------------------------------------


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(doc_id, shingles array, n_sh) for docs with ≥ k tokens."""
    from iceberg_matrix_spark.operators.scale import ensure_compute_parallelism

    slim = ensure_compute_parallelism(df.select(id_col, text_col))
    return (
        slim.select(
            F.col(id_col).alias("doc_id"),
            word_shingles(text_col, k).alias("shingles"),
        )
        .filter(F.size("shingles") > 0)
        .withColumn("n_sh", F.size("shingles"))
    )


def persisted_shingle_sets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> tuple[DataFrame, int]:
    """Materialize the hashed shingle-set projection (doc_id, sh_hashed,
    n_sh) to parquet ONCE and return (re-scan, materialized bytes).

    Why (round 11, measured): tokenize → shingle → distinct → xxhash64 is
    the family's dominant map-side CPU, and every consumer used to
    re-derive it per branch — ngram_jaccard_pairs ran it twice (postings
    + the sizes projection), minhash_neardup_pairs three times
    (signatures + both verify sides). Persist-and-rescan runs it exactly
    once per operator invocation; every branch reads the 8-byte hash
    arrays back column-pruned. At sf0.1 this cut the warm per-call wall
    of the pair operator ~25% (one ~0.9 s tokenize pass removed) and the
    LSH operator more (two passes removed). At 100 TB this is the shape
    the docstrings always promised ("a production ingest persists the
    full shingle-set projection once and feeds both branches") — the
    write is one linear pass, and re-scans prune to the columns each
    branch needs. The returned byte size lets callers make
    persisted_small_hint-style TRUE-size join-strategy decisions for
    frames derived from the re-scan without a second materialization.
    """
    import os  # noqa: PLC0415

    from iceberg_matrix_spark.storage import scratch_dir  # noqa: PLC0415

    sets_ = hashed_shingle_sets(df, id_col, text_col, k)
    path = scratch_dir("shingle-sets-") + "/sets.parquet"
    sets_.write.parquet(path)
    out = df.sparkSession.read.parquet(path)
    size = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    return out, size


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.0,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs (id1 < id2) with shingle-Jaccard ≥ threshold.

    Plan shape: explode distinct shingles → group postings by shingle
    (ONE shuffle of the inverted index — a self-equi-join would shuffle
    it twice and re-evaluate the shingle expressions per branch) →
    emit in-list pairs with an array comprehension → count common per
    pair → join back doc sizes. ``max_doc_freq`` drops shingles occurring
    in more than N docs — the skew guard that keeps the hottest posting
    list (d² pair blow-up) off a single reducer at 100 TB.

    The postings key is ``xxhash64(shingle)`` — an 8-byte BIGINT — not
    the shingle STRING (VERDICT r9 #1; measured effect: ~25% lower wire
    bytes — LZ4 already compressed the strings well — and much cheaper
    postings sorts/compares; the DOMINANT shuffle is the pair-count
    exchange, see SCALING.md Round-10 for the decomposition). Shingle
    strings exist only map-side, pre-shuffle. Jaccard over hashed
    shingles equals Jaccard over strings whenever the hash is injective
    on the corpus's distinct shingles — a 64-bit collision among n
    distinct shingles has probability ~n²/2⁶⁵ (≈3e-6 even at 10⁷
    shingles), and tests/test_dedup.py pins injectivity on the actual
    test corpora (documents + chunk texts), so the string-shingle DuckDB
    oracles stay hash-exact.
    """
    # ONE tokenize/shingle/hash pass for the whole operator: both the
    # postings branch and the sizes branch read the persisted hashed
    # projection back (round 11 — previously each branch re-derived it)
    sets_, sets_bytes = persisted_shingle_sets(df, id_col, text_col, k)
    # posting entries carry (doc_id, n_sh): the pair emission then has
    # both set sizes in hand, so Jaccard needs NO size joins afterwards —
    # the whole operator is exactly two shuffles (postings, pair counts).
    # array_sort on structs orders by the first field = doc_id.
    ex = sets_.select(
        F.explode("sh_hashed").alias("shingle"),
        F.struct(F.col("doc_id").alias("id"), F.col("n_sh").alias("n")).alias("e"),
    )
    postings = ex.groupBy("shingle").agg(F.array_sort(F.collect_list("e")).alias("ids"))
    if max_doc_freq is not None:
        postings = postings.filter(F.size("ids") <= max_doc_freq)
    # all ordered pairs within one posting list: (ids[i], ids[j]) for i<j.
    # With a positive threshold, prune at EMISSION by the size bound
    # J ≤ min(n1,n2)/max(n1,n2): a pair whose sizes are too lopsided can
    # never reach θ, so don't shuffle it — the pair-count exchange, not
    # the postings, is the operator's dominant shuffle (measured round
    # 10: ~250 of ~290 MB at the 6× probe). The −0.5 slack keeps the
    # float comparison conservative at integer boundaries; the exact
    # jaccard filter below is unchanged, so semantics are identical.
    size_guard = (
        f" AND least(x.n, y.n) >= {threshold} * greatest(x.n, y.n) - 0.5"
        if threshold > 0
        else ""
    )
    # the pair-occurrence row is the operator's dominant shuffle term
    # (measured round 10: ~85% of bytes), so it carries ONLY the two
    # ids — 16 data bytes, not 32 (VERDICT r10 #1). The set sizes the
    # Jaccard denominator needs ride the emission-time guard (x.n/y.n
    # are in hand map-side) and are joined back AFTER counting, onto
    # the far smaller DISTINCT-pair frame, from the (doc_id, n_sh)
    # slice of the persisted shingle-sets parquet — persist-and-rescan
    # because the join strategy must come from the sizes frame's TRUE
    # size: planned off the un-materialized subtree (whose estimate is
    # the full text scan), Catalyst picks a sort-merge join that
    # shuffles the distinct-pair frame twice — measured at the 100×
    # sweep point as a net LOSS (3,444 MB vs the old 48-byte rows'
    # 2,185); off the materialized parquet it broadcasts (1,569 MB,
    # −28% bytes, −10% wall), and at corpus scales past broadcast the
    # planner falls back to SMJ on distinct pairs — on REAL
    # (dup-sparse) corpora those are ≪ the occurrence exchange this
    # slimming shrinks.
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(filter(slice(ids, i + 2, size(ids)), "
        f"y -> true{size_guard}), "
        "y -> struct(x.id AS id1, y.id AS id2))))"
    )
    common = (
        postings.select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.id1").alias("id1"),
            F.col("p.id2").alias("id2"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        persisted_small_hint,
    )

    # join strategy decided off the MATERIALIZED size (see
    # persisted_small_hint): the 10 MB session default is tuned for
    # arbitrary wide rows, not a 16-byte (doc_id, n_sh) projection —
    # at chunk granularity the frame sits just past it and silently
    # flips to a sort-merge join that re-shuffles the distinct-pair
    # frame twice. Past the cutoff (billions of docs) the planner's
    # SMJ on distinct pairs is the right call and the hint stays off.
    # The sizes projection reads from the persisted sets parquet
    # (column-pruned — no re-tokenize); when the FULL sets file is
    # already under the cutoff the narrow (doc_id, n_sh) slice is a
    # fortiori broadcastable and the second materialization is skipped.
    sizes_proj = sets_.select("doc_id", "n_sh")
    if sets_bytes < 64 * 1024 * 1024:
        sizes = F.broadcast(sizes_proj)
    else:
        sizes = persisted_small_hint(sizes_proj, "ngram-sizes-")
    return (
        common.join(
            sizes.select(
                F.col("doc_id").alias("id1"), F.col("n_sh").alias("n1")
            ),
            "id1",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("id2"), F.col("n_sh").alias("n2")
            ),
            "id2",
        )
        .withColumn(
            "jaccard", F.col("common") / (F.col("n1") + F.col("n2") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "common", "jaccard")
    )


def incremental_ngram_neardup(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.0,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs BETWEEN an incoming batch and the existing corpus
    (batch_id, corpus_id, common, jaccard) — the n-gram companion to
    :func:`incremental_dedup_exact`. Both sides share ONE inverted index
    (side-tagged postings, one shuffle); per shingle only cross-side
    pairs are emitted, so in-corpus pairs — already adjudicated by past
    ingests — cost nothing. The doc-frequency cap counts batch+corpus
    occurrences together, same as the one-sided operator's semantics at
    100 TB: a stop-shingle is a stop-shingle regardless of which side
    it appears on. Postings are keyed by ``xxhash64(shingle)`` BIGINTs,
    not shingle strings — same rationale and collision guarantee as
    :func:`ngram_jaccard_pairs`. Each side's hashed sets feed two
    branches (postings + the size join) and are persisted once per side
    (round 11, see persisted_shingle_sets)."""
    # the two persists are INDEPENDENT Spark jobs (different inputs,
    # different output dirs); submit them from a 2-thread pool so the
    # second job's tasks back-fill executors freed by the first's tail
    # (guide §2.6) — A/B measured 3.19 → 2.57 s on the warm operator
    # wall at sf0.1, and strictly better overlap at scale. Results are
    # the same parquet frames either way.
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    from iceberg_matrix_spark.operators.scale import gather_futures  # noqa: PLC0415

    with ThreadPoolExecutor(max_workers=2) as pool:
        fb = pool.submit(persisted_shingle_sets, batch, id_col, text_col, k)
        fc = pool.submit(persisted_shingle_sets, corpus, id_col, text_col, k)
        (sb, _), (sc_, _) = gather_futures(fb, fc)

    def _explode(side: DataFrame, flag: int) -> DataFrame:
        return side.select(
            F.explode("sh_hashed").alias("shingle"),
            F.struct(
                F.col("doc_id").alias("id"),
                F.col("n_sh").alias("n"),
                F.lit(flag).alias("b"),
            ).alias("e"),
        )

    ex = _explode(sb, 1).unionByName(_explode(sc_, 0))
    postings = (
        ex.groupBy("shingle")
        .agg(F.collect_list("e").alias("es"))
        .select(
            F.expr("filter(es, x -> x.b = 1)").alias("bids"),
            F.expr("filter(es, x -> x.b = 0)").alias("cids"),
            F.size("es").alias("df_total"),
        )
        .filter((F.size("bids") > 0) & (F.size("cids") > 0))
    )
    if max_doc_freq is not None:
        postings = postings.filter(F.col("df_total") <= max_doc_freq)
    # same emission-time size-bound prune as ngram_jaccard_pairs: with a
    # positive threshold, cross-side pairs that cannot reach θ by the
    # J ≤ min/max bound never enter the pair-count exchange
    size_guard = (
        f" AND least(x.n, y.n) >= {threshold} * greatest(x.n, y.n) - 0.5"
        if threshold > 0
        else ""
    )
    # ids-only pair rows + post-count size joins — same slimming as
    # ngram_jaccard_pairs (the pair-count exchange is the measured
    # dominant term); batch sizes join from the small batch projection,
    # corpus sizes from the corpus one (AQE picks broadcast locally)
    pair_expr = F.expr(
        "flatten(transform(bids, x -> transform("
        f"filter(cids, y -> true{size_guard}), "
        "y -> struct(x.id AS batch_id, y.id AS corpus_id))))"
    )
    common = (
        postings.select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.batch_id").alias("batch_id"),
            F.col("p.corpus_id").alias("corpus_id"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(
            sb.select(
                F.col("doc_id").alias("batch_id"), F.col("n_sh").alias("n1")
            ),
            "batch_id",
        )
        .join(
            sc_.select(
                F.col("doc_id").alias("corpus_id"), F.col("n_sh").alias("n2")
            ),
            "corpus_id",
        )
        .withColumn(
            "jaccard", F.col("common") / (F.col("n1") + F.col("n2") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "common", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def hashed_shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(doc_id, sh_hashed array<long>, n_sh): shingles xxhash64'd to longs.

    Everything downstream (signatures, LSH, Jaccard verification) works on
    the 8-byte hashes, never re-shuffling shingle strings. 64-bit
    collisions perturb a Jaccard count with probability ~n²/2⁶⁴ per pair —
    noise at any realistic corpus size.
    """
    return shingle_sets(df, id_col, text_col, k).select(
        "doc_id",
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("sh_hashed"),
        "n_sh",
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(doc_id, signature array<long>[_NUM_HASHES]).

    Base hash = pmod(xxhash64(shingle), 2^31); permutation i is
    (a_i·h + b_i) mod (2^61−1). Products stay < 2^62, so the arithmetic
    can't overflow ANSI bigint. Signatures are pure array expressions —
    K ``array_min(transform(...))`` passes per row inside whole-stage
    codegen — so the whole signature stage is SHUFFLE-FREE (the earlier
    formulation exploded shingles and re-grouped by doc, shuffling the
    entire corpus shingle set just to take per-doc minimums).
    """
    return _minhash_from_hashed(hashed_shingle_sets(df, id_col, text_col, k))


def _perm_lambda(a: int, b: int):
    # closure factory: PySpark infers transform's lambda arity from the
    # Python signature, so captured constants must NOT ride as defaults
    return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE))


def _minhash_from_hashed(sets_h: DataFrame) -> DataFrame:
    base = sets_h.withColumn(
        "__base", F.transform("sh_hashed", lambda h: F.pmod(h, F.lit(1 << 31)))
    )
    sig = F.array(
        *[
            F.array_min(F.transform("__base", _perm_lambda(a, b)))
            for a, b in _HASH_AB
        ]
    )
    return base.select("doc_id", sig.alias("signature"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = _LSH_BANDS) -> DataFrame:
    """Candidate pairs from banded LSH: hash each band slice to a bucket,
    equi-join on (band, bucket). Never compares all pairs."""
    rows = _NUM_HASHES // bands
    band_hash = F.array(
        *[
            F.xxhash64(
                F.lit(i), *[F.col("signature")[i * rows + r] for r in range(rows)]
            )
            for i in range(bands)
        ]
    )
    buckets = signatures.select(
        "doc_id", F.posexplode(band_hash).alias("band", "bucket")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates verified with EXACT shingle Jaccard ≥ threshold.

    Output ⊆ the exact n-gram pairs; LSH only prunes the search space
    (recall at j=0.5 is ≈0.99 with 16 bands × 2 rows). Verification joins
    the hashed shingle arrays back per candidate — cost ∝ candidates, not
    pairs, and the shuffled payload is 8-byte hashes, not shingle text.

    The hashed shingle sets feed three branches (signatures + both
    verify sides) LAZILY — measured in round 11: persisting them once
    (persisted_shingle_sets) and re-scanning was ~0.4 s SLOWER at sf0.1
    and a wash at the 10× amplification (13.4/9.0 s lazy vs 13.3/10.2 s
    persisted), because the verify join — not shingle derivation —
    dominates this operator; the write job buys nothing the three
    parallel map passes don't already overlap. The pair/incremental
    operators, where the persist IS a measured win, use it.
    """
    sets_ = hashed_shingle_sets(df, id_col, text_col, k)
    cands = lsh_candidate_pairs(_minhash_from_hashed(sets_))
    s1 = sets_.select(
        F.col("doc_id").alias("id1"), F.col("sh_hashed").alias("sh1"), F.col("n_sh").alias("n1")
    )
    s2 = sets_.select(
        F.col("doc_id").alias("id2"), F.col("sh_hashed").alias("sh2"), F.col("n_sh").alias("n2")
    )
    inter = F.size(F.array_intersect("sh1", "sh2"))
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("common", inter)
        .withColumn("jaccard", F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


# SimHash bit width: 60 bits = 15 hex chars of md5, the widest slice that
# fits a SIGNED bigint identically in Spark (conv base16→10) and DuckDB
# (('0x'||hex)::BIGINT) — making the whole operator SQL-oracle-able.
_SIMHASH_BITS = 60
_SIMHASH_BANDS = 4
_SIMHASH_BAND_BITS = _SIMHASH_BITS // _SIMHASH_BANDS  # 15


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash over whitespace tokens (token multiplicity weights).

    Per-bit majority vote: explode tokens, ±1 per bit from the md5-derived
    token hash, one groupBy(doc) with 60 small sum aggregates, reassemble
    the bits. The hash is md5 (not xxhash64) so DuckDB computes the exact
    same signatures — all JVM-side either way.
    """
    ex = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok")
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    bit_sums = ex.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(_SIMHASH_BITS)
        ]
    )
    sig = bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(
                    F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
                ).otherwise(F.lit(0).cast("long"))
                for j in range(_SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via 4×15-bit band join.

    Pigeonhole: distance ≤ 8 doesn't guarantee an identical 15-bit chunk
    in general (it does for ≤ 3); the band join is the standard recall/
    cost trade — candidates share at least one exact chunk, then the
    popcount filter is exact. The oracle mirrors BOTH steps (the band
    candidacy and the Hamming filter), so the comparison is exact.
    """
    sig = simhash_signatures(df, id_col, text_col)
    mask = (1 << _SIMHASH_BAND_BITS) - 1
    chunk = lambda c, i: F.shiftrightunsigned(F.col(c), i * _SIMHASH_BAND_BITS).bitwiseAND(F.lit(mask))  # noqa: E731
    banded = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*[chunk("simhash", i) for i in range(_SIMHASH_BANDS)])).alias("band", "chunk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.bit_count(xor).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

# Doc-frequency cap for the REGISTERED n-gram queries: a shingle occurring
# in more than this many documents is a stop-shingle whose posting list
# would emit O(df²) pairs onto one reducer at 100 TB. The oracle applies
# the same cap, so capped Spark output == capped DuckDB output exactly.
MAX_DOC_FREQ = 100

_DOC_SHINGLES_SQL = """
  docs AS (
    SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') toks
    FROM documents
  ),
  sets_ AS (
    SELECT doc_id,
      list_distinct(list_transform(generate_series(1, len(toks)-2),
        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) shingles
    FROM docs WHERE len(toks) >= 3
  ),
  sizes AS (SELECT doc_id, len(shingles) n_sh FROM sets_),
  sh AS (SELECT doc_id, unnest(shingles) shingle FROM sets_),
  pairs AS (
    SELECT a.doc_id id1, b.doc_id id2, count(*) common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ),
  jac AS (
    SELECT id1, id2, common,
           CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) AS jaccard
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = id1
    JOIN sizes s2 ON s2.doc_id = id2
  )
"""

# Same CTE chain with the doc-frequency cap applied to the inverted index
# (the HAVING mirrors Spark's `size(ids) <= MAX_DOC_FREQ` postings filter).
_DOC_SHINGLES_CAPPED_SQL = f"""
  docs AS (
    SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') toks
    FROM documents
  ),
  sets_ AS (
    SELECT doc_id,
      list_distinct(list_transform(generate_series(1, len(toks)-2),
        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) shingles
    FROM docs WHERE len(toks) >= 3
  ),
  sizes AS (SELECT doc_id, len(shingles) n_sh FROM sets_),
  sh AS (SELECT doc_id, unnest(shingles) shingle FROM sets_),
  kept AS (
    SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {MAX_DOC_FREQ}
  ),
  sh_capped AS (SELECT sh.* FROM sh JOIN kept USING (shingle)),
  pairs AS (
    SELECT a.doc_id id1, b.doc_id id2, count(*) common
    FROM sh_capped a JOIN sh_capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ),
  jac AS (
    SELECT id1, id2, common,
           CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) AS jaccard
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = id1
    JOIN sizes s2 ON s2.doc_id = id2
  )
"""


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           MIN(doc_id) AS rep_doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, "doc_id", "text")


@register(
    "q_dedup_incremental",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
    ),
    batch AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
    idx AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 5 <> 0),
    firsts AS (SELECT fingerprint, MIN(doc_id) AS first_id FROM batch GROUP BY 1)
    SELECT b.doc_id, b.fingerprint,
           CASE WHEN i.fingerprint IS NOT NULL THEN 'dup_of_corpus'
                WHEN b.doc_id <> f.first_id THEN 'dup_in_batch'
                ELSE 'kept' END AS verdict
    FROM batch b
    LEFT JOIN idx i ON i.fingerprint = b.fingerprint
    JOIN firsts f ON f.fingerprint = b.fingerprint
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: documents with doc_id % 5 == 0 play the
    incoming batch; the rest are the already-ingested corpus whose
    fingerprint index the batch is checked against (deterministic split
    so the oracle reproduces it)."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    index = exact_dedup_groups(corpus, "doc_id", "text").select("fingerprint")
    return incremental_dedup_exact(batch, index, "doc_id", "text")


@register(
    "q_dedup_incremental_ngram",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') toks
      FROM documents
    ),
    sets_ AS (
      SELECT doc_id,
        list_distinct(list_transform(generate_series(1, len(toks)-2),
          i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) shingles
      FROM docs WHERE len(toks) >= 3
    ),
    sizes AS (SELECT doc_id, len(shingles) n_sh FROM sets_),
    sh AS (SELECT doc_id, unnest(shingles) shingle FROM sets_),
    kept AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {MAX_DOC_FREQ}
    ),
    sh_capped AS (SELECT sh.* FROM sh JOIN kept USING (shingle)),
    pairs AS (
      SELECT a.doc_id batch_id, b.doc_id corpus_id, count(*) common
      FROM sh_capped a JOIN sh_capped b ON a.shingle = b.shingle
      WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      GROUP BY 1, 2
    )
    SELECT batch_id, corpus_id, common,
           CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) AS jaccard
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = batch_id
    JOIN sizes s2 ON s2.doc_id = corpus_id
    WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.05
    """,
)
def q_dedup_incremental_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-side near-dup check for the same batch/corpus split as
    q_dedup_incremental: which incoming docs are ≥ 0.05 3-shingle Jaccard
    similar to an already-ingested doc (doc-frequency cap ON, counted
    across both sides — the oracle applies the identical cap)."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_ngram_neardup(
        batch, corpus, "doc_id", "text", k=3, threshold=0.05, max_doc_freq=MAX_DOC_FREQ
    )


@register(
    "q_dedup_ngram_topk",
    oracle=f"""
    WITH {_DOC_SHINGLES_CAPPED_SQL}
    SELECT id1, id2, common, jaccard
    FROM jac
    ORDER BY jaccard DESC, id1, id2
    LIMIT 20
    """,
)
def q_dedup_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar document pairs by 3-shingle Jaccard, with the
    doc-frequency skew cap ON (the 100 TB-safe registered path; the
    oracle applies the same cap)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(docs, "doc_id", "text", k=3, max_doc_freq=MAX_DOC_FREQ)
        .orderBy(F.desc("jaccard"), F.asc("id1"), F.asc("id2"))
        .limit(20)
    )


@register(
    "q_dedup_ngram_threshold",
    oracle=f"""
    WITH {_DOC_SHINGLES_CAPPED_SQL}
    SELECT id1, id2, common, jaccard FROM jac WHERE jaccard >= 0.2
    """,
)
def q_dedup_ngram_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with 3-shingle Jaccard ≥ 0.2 (near-dup clusters),
    doc-frequency skew cap ON (oracle applies the same cap)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.2, max_doc_freq=MAX_DOC_FREQ
    )


@register(
    "q_dedup_minhash_lsh",
    oracle=f"""
    WITH {_DOC_SHINGLES_SQL}
    SELECT id1, id2, jaccard FROM jac WHERE jaccard >= 0.2
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard-verified at ≥ 0.2.

    The candidate step is Spark-specific (xxhash64 signatures), but the
    VERIFIED output is a deterministic subset of the exact-Jaccard pairs;
    at 16 bands × 2 rows the recall at j=0.5 is ≈0.99 and in practice the
    output equals the exact uncapped pair set — so the oracle IS the
    exact n-gram SQL. tests/test_dedup.py additionally asserts the
    subset + recall relation at both scales."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_neardup_pairs(docs, "doc_id", "text", k=3, threshold=0.2)


def _simhash_oracle_sql(max_hamming: int) -> str:
    """DuckDB replica of the full SimHash pipeline — identical md5-derived
    bit votes, identical 4×15-bit band candidacy, exact Hamming filter."""
    bits = _SIMHASH_BITS
    band_bits = _SIMHASH_BAND_BITS
    bit_sums = ",\n        ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    sig_expr = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)" for j in range(bits)
    )
    chunks = ", ".join(
        f"((sig >> {i * band_bits}) & {(1 << band_bits) - 1}) AS c{i}"
        for i in range(_SIMHASH_BANDS)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS band, c{i} AS chunk, sig FROM sigs"
        for i in range(_SIMHASH_BANDS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS tok
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ),
    votes AS (
      SELECT doc_id,
        {bit_sums}
      FROM hashed GROUP BY doc_id
    ),
    sigs0 AS (SELECT doc_id, {sig_expr} AS sig FROM votes),
    sigs AS (SELECT doc_id, sig, {chunks} FROM sigs0),
    banded AS ({band_union}),
    cands AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
             a.sig AS sig1, b.sig AS sig2
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    )
    SELECT id1, id2, bit_count(xor(sig1, sig2)) AS hamming
    FROM cands WHERE bit_count(xor(sig1, sig2)) <= {max_hamming}
    """


@register("q_dedup_simhash", oracle=_simhash_oracle_sql(12))
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 12 over 60-bit md5-derived
    signatures). The DuckDB oracle replicates the full pipeline — bit
    votes, band candidacy, Hamming filter — so the check is exact."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=12)


# ---------------------------------------------------------------------------
# Prefix-filtered thresholded Jaccard (round 10) — the candidate-volume
# cut for the operator family's DOMINANT shuffle
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exactly :func:`ngram_jaccard_pairs` output (pairs with Jaccard ≥
    ``threshold``; requires threshold > 0) via PREFIX FILTERING — the
    classic set-similarity-join optimization (Chaudhuri et al. 2006;
    Xiao et al. 2008 PPJoin): the round-10 stage decomposition showed
    the PAIR-COUNT exchange carries ~85% of the baseline's shuffle, and
    prefix filtering replaces it with a far smaller candidate join.

    Derivation of the prefix bound under THIS operator's semantics
    (common counts doc-frequency-CAPPED shingles, Jaccard divides by
    FULL set sizes): J(a,b) ≥ θ forces common ≥ θ/(1+θ)·(n1+n2), and
    the size bound J ≤ min/max forces n2 ≥ θ·n1, so common ≥ θ·n1 (and
    symmetrically ≥ θ·n2). Order each doc's capped shingle set
    canonically (ascending 64-bit hash); with α_a = max(1, ⌊θ·n1⌋) ≤
    guaranteed-overlap, the SMALLEST common element must sit inside
    both docs' (|set| − α + 1)-prefixes (if it sat among a's last
    α_a − 1 elements, so would every larger common element, capping the
    overlap below α_a). floor, not ceil: a float boundary error then
    only LENGTHENS a prefix — never drops a qualifying candidate.

    Plan shape: postings (one entries shuffle, the df-cap applied) →
    regroup to per-doc capped sorted arrays (second entries shuffle) →
    explode PREFIXES only (~(1−θ) of entries) → candidate pairs with
    the size guard, deduped → verify by joining the two arrays back and
    intersecting (shuffle ∝ candidates + two array-frame exchanges).
    Every stage is ∝ corpus entries or ∝ candidate pairs — the
    baseline's pair-occurrence exchange (one row per shared shingle per
    pair) never happens.

    MEASURED VERDICT (round 10 — the honest one, after sweeping both):
    the baseline wins this benchmark family AT SCALE, and by a lot.
    At a 6× amplification of sf0.1 documents prefix led 74 MB / 9.7 s
    vs 265 MB / 14.1 s (θ=0.5, cap 64) — but at the sweep's 100× point
    the baseline holds 2.2 GB / 55 s while prefix explodes to 22 GB /
    383 s, and the chunk-granularity form is similar (17.6 vs 2.8 GB).
    Root cause: the VERIFY join ships each candidate's full shingle
    ARRAY (KBs/doc) through two exchanges, so its cost is
    |candidates| × |set|, and candidate pairs (any shared capped prefix
    shingle + size-compatible) grow ∝ corpus on natural-language
    shingle distributions even when true near-dups are rare — while the
    baseline's pair-occurrence exchange is 32-byte rows with map-side
    combine. The prefix form remains correct and certified
    (q_dedup_ngram_prefix, equality-pinned across thresholds/caps) and
    is the right shape only when candidates — not merely matches — are
    sparse (very high θ on diverse corpora, or with a stronger
    secondary filter before the verify join); every production
    composition in this repo stays on the baseline.
    """
    if threshold <= 0:
        raise ValueError("prefix filtering requires a positive threshold")
    sets_ = hashed_shingle_sets(df, id_col, text_col, k)
    ex = sets_.select(
        F.explode("sh_hashed").alias("sh"),
        F.struct(F.col("doc_id").alias("id"), F.col("n_sh").alias("n")).alias(
            "e"
        ),
    )
    posts = ex.groupBy("sh").agg(F.collect_list("e").alias("es"))
    if max_doc_freq is not None:
        posts = posts.filter(F.size("es") <= max_doc_freq)
    # per-doc CAPPED shingle arrays in canonical (hash-ascending) order
    capped = (
        posts.select(F.col("sh"), F.explode("es").alias("e"))
        .groupBy(F.col("e.id").alias("doc_id"), F.col("e.n").alias("n_sh"))
        .agg(F.array_sort(F.collect_list("sh")).alias("arr"))
        .withColumn("n_c", F.size("arr"))
    )
    alpha = F.greatest(
        F.lit(1), F.floor(F.lit(threshold) * F.col("n_sh")).cast("int")
    )
    plen = F.greatest(F.lit(0), F.col("n_c") - alpha + F.lit(1))
    pref = capped.select(
        F.explode(F.slice("arr", F.lit(1), plen)).alias("sh"),
        F.struct(F.col("doc_id").alias("id"), F.col("n_sh").alias("n")).alias(
            "e"
        ),
    )
    ppost = pref.groupBy("sh").agg(
        F.array_sort(F.collect_list("e")).alias("ids")
    )
    size_guard = (
        f" AND least(x.n, y.n) >= {threshold} * greatest(x.n, y.n) - 0.5"
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(filter(slice(ids, i + 2, size(ids)), "
        f"y -> true{size_guard}), "
        "y -> struct(x.id AS id1, x.n AS n1, y.id AS id2, y.n AS n2))))"
    )
    cand = (
        ppost.select(F.explode(pair_expr).alias("p"))
        .select("p.id1", "p.n1", "p.id2", "p.n2")
        .distinct()
    )
    a1 = capped.select(
        F.col("doc_id").alias("id1"), F.col("arr").alias("__a1")
    )
    a2 = capped.select(
        F.col("doc_id").alias("id2"), F.col("arr").alias("__a2")
    )
    verified = (
        cand.join(a1, "id1")
        .join(a2, "id2")
        .withColumn(
            "common", F.size(F.array_intersect("__a1", "__a2")).cast("long")
        )
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id1", "id2", "common", "jaccard")


@register(
    "q_dedup_ngram_prefix",
    oracle=f"""
    WITH {_DOC_SHINGLES_CAPPED_SQL}
    SELECT id1, id2, common, jaccard FROM jac WHERE jaccard >= 0.5
    """,
)
def q_dedup_ngram_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded near-dup pairs (3-shingle Jaccard ≥ 0.5, doc-freq cap
    ON) through the PREFIX-FILTERED plan — the sparse-corpus production
    path (see ngram_jaccard_pairs_prefix's measured regime guidance).
    Output-identical to the baseline operator, so the oracle is the same
    capped exact-Jaccard SQL; the certification here is that the prefix
    candidate generation (canonical-order prefix lemma + size guard +
    capped-common verify) misses nothing and invents nothing."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", k=3, threshold=0.5, max_doc_freq=MAX_DOC_FREQ
    )
