"""Similarity search over embedding columns (north-star surface).

Two paths:

- **Brute-force top-k** (the correctness baseline): broadcast the query
  vectors, compute cosine JVM-side (functions/vectors.py), rank with a
  per-query window. At 100 TB the corpus side streams through codegen —
  the only shuffle is the final per-query top-k (WindowGroupLimit prunes
  to k rows per partition before the exchange).
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures →
  multi-probe bucket join → exact re-rank within candidates. Shuffle is
  proportional to bucket collisions, not |corpus| × |queries|.

Cosine here bit-matches DuckDB's
``list_cosine_similarity(CAST(x AS DOUBLE[]), ...)`` (sequential double
fold on both sides), so brute-force queries carry exact SQL oracles.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_matrix_spark.functions.lits import (
    const_double_cube,
    const_double_matrix,
    double_matrix_sql,
)
from iceberg_matrix_spark.functions.vectors import cosine, dot, l2_norm
from iceberg_matrix_spark.queries.registry import register
from iceberg_matrix_spark.sources.testdata import load_table

_DIM = 64
_N_PLANES = 32
_rng = random.Random(7)
# Deterministic random hyperplanes (module constants → identical on every
# executor and every run). 32 planes banded as 16 bands × 2 bits: one
# layout's per-pair miss probability at cosine 0.4 is (1 - p²)¹⁶ ≈ 3e-4
# with p = 1 - arccos(0.4)/π ≈ 0.63; the near-dup path probes a SECOND,
# bit-rotated band layout, driving the joint miss to ≈1e-7 — so
# LSH-candidates + exact verification reproduces the exact result
# (asserted in tests and by the DuckDB oracles below).
_PLANES = [[_rng.gauss(0.0, 1.0) for _ in range(_DIM)] for _ in range(_N_PLANES)]
_BANDS = 16


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine.

    ``queries`` is expected to be small (it is broadcast); ties broken by
    neighbor id for a total order.
    """
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    # norms are per-row quantities: compute each side's ONCE and score
    # with dot/(n_c·n_q) — one fold per pair instead of three,
    # bit-identical to cosine() (the _lsh_verified_pairs trick).
    # ensure_compute_parallelism: the |corpus|×|queries| scoring is the
    # heavy projection and a single-file corpus otherwise runs it as ONE
    # task up to the top-k exchange (round 11; no-op at scale)
    c = ensure_compute_parallelism(corpus.select(id_col, vec_col)).select(
        F.col(id_col), F.col(vec_col), l2_norm(vec_col).alias("__cn")
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        l2_norm(query_vec_col).alias("__qn"),
    )
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        (dot(vec_col, query_vec_col) / (F.col("__cn") * F.col("__qn"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """All pairs (id1 < id2) with cosine ≥ threshold — the O(n²) theta-join
    ORACLE BASELINE. Tests verify :func:`embedding_neardup_lsh` (the
    registered, scale-safe path) equals this at test scale; don't run this
    one at 100 TB.
    """
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", cosine("v1", "v2").alias("score"))
        .filter(F.col("score") >= threshold)
    )


def embedding_neardup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    bands: int = _BANDS,
) -> DataFrame:
    """Near-dup pairs via LSH candidates + exact cosine verification.

    Candidates come from an equi-join on (band, 2-bit chunk) of the
    32-plane signature — shuffle ∝ bucket collisions, never a theta join.
    TWO band decompositions are probed: the aligned 16×2 layout and the
    same layout over the bit-rotated signature. One 16-band layout alone
    misses ≈3e-4 of threshold pairs — observed as 2/920 lost pairs at
    sf0.1 — and the two layouts' misses are independent, so together the
    per-pair miss is ≈1e-7: the exact-cosine-verified output EQUALS the
    all-pairs result at any realistic scale (oracle-checked at sf0.01
    AND sf0.1). Cost: 2× candidate-join input, the standard multi-probe
    trade.

    COST MODEL (be honest about what a 0.4 threshold costs): a band with
    ``r`` bits splits n rows into 2^r buckets, so band-collision volume
    is ≈ 2·bands·n²/2^r joined rows — the low threshold forces coarse
    buckets (r=2 here; finer buckets lose recall at 63% per-bit match
    probability, and no wider signature fixes it — see SCALING.md's
    amplification-gap math), so global exact near-dup stays
    near-quadratic in COMPUTE. What it is no longer quadratic in is
    SHUFFLE: candidates are verified INLINE in the band join on carried
    vectors (:func:`_lsh_verified_pairs`), so the only exchanged data is
    the 2·bands linear banded rows — the near-quadratic pair set exists
    in-flight only. At corpus scale the quadratic compute term is
    removed by SCOPING, not by more bands: assign IVF cluster ids first
    (:func:`ivf_build_centroids`) and run this within cluster —
    SemDeDup's design (arXiv:2303.09540), :func:`cluster_scoped_neardup`.
    The global form here is the oracle-reproducible variant for the
    registered queries.
    """
    banded = _banded_signatures(df, id_col, vec_col, bands, carry_vec=True)
    return _lsh_verified_pairs(
        banded, banded, bands, ordered=True, id_col=id_col, threshold=threshold
    )


def cluster_scoped_neardup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_clusters: int = 16,
    nprobe: int = 2,
    bands: int = _BANDS,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup's cluster-scoped near-dup pairs (arXiv:2303.09540 §3):
    IVF coarse clusters bound the candidate space, banded LSH + exact
    cosine run WITHIN shared clusters only — the concrete form of the
    scoping path :func:`embedding_neardup_lsh`'s cost model prescribes.

    Candidate volume drops from Σ n²/2^r (global) to Σ_c n_c²/2^r; with
    cluster count grown ∝ corpus (bounded n_c), the whole operator is
    linear in the corpus. Every row probes its ``nprobe`` nearest
    centroids, so near-threshold pairs straddling one boundary are still
    found; a pair sharing several probed clusters is kept once via the
    smallest-shared-cluster rule computed inline in the join (no distinct
    exchange — the scope-dimension analogue of the first-colliding-band
    filter).

    ``n_clusters`` is bounded (≤ ~64) by the inline-expression assignment
    (:func:`_nearest_clusters` unrolls k dot products into the plan; past
    that, janino's method limit ends codegen). At corpus scale, cluster
    the cluster-assignment itself: persist cid alongside the embedding at
    ingest (it IS the index, like ann_ivf_topk's note) and pass
    ``centroids`` precomputed."""
    if centroids is None:
        centroids = ivf_build_centroids(
            df, k=n_clusters, id_col=id_col, vec_col=vec_col
        )
    scoped = scoped_signature_index(
        df, centroids, id_col, vec_col, nprobe, bands
    )
    return _lsh_verified_pairs(
        scoped,
        scoped,
        bands,
        ordered=True,
        id_col=id_col,
        threshold=threshold,
        scope_col="__cid",
        scope_set_col="__cids",
    )


def semantic_dedup_scoped(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_clusters: int = 16,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup keep-verdicts from cluster-scoped candidates: drop every
    embedding with a LOWER-id cosine-≥threshold neighbor found within a
    shared coarse cluster (the paper's semantics — pruning is defined
    within clusters). Same min-id representative rule as
    :func:`semantic_dedup_verdicts`."""
    pairs = cluster_scoped_neardup(
        df, id_col, vec_col, threshold, n_clusters, nprobe, centroids=centroids
    )
    return _verdicts_from_pairs(df, pairs, id_col)


def scoped_signature_index(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    bands: int = _BANDS,
) -> DataFrame:
    """The persisted-cid INGEST INDEX for scoped semantic dedup: banded
    signatures (with carried vectors) joined to the row's ``nprobe``
    probed cluster ids — one row per (vector × band × probe). Built once
    per corpus at ingest (it IS the index: persist/write it next to the
    embeddings) and reused by every incremental batch, so per-batch work
    is a plain equi-join on (band, chunk, __cid) with zero corpus-side
    recompute — the deployment path SCALING.md's semantic-family cost
    model prescribes.

    Built in ONE narrow pass: signature, probe set, band explode, and
    probe explode are all projections over the scan (one generator per
    select, no id-join — the earlier sig⋈probes build exchanged the
    whole banded frame once, 130 MB at the sweep's 100× point, for
    nothing)."""
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    rows = _N_PLANES // bands
    mask = (1 << rows) - 1
    base = ensure_compute_parallelism(df.select(F.col(id_col), F.col(vec_col)))
    with_sig = base.select(
        F.col(id_col),
        hyperplane_signature(vec_col).alias("__sig"),
        F.col(vec_col).alias("__v"),
        l2_norm(vec_col).alias("__n"),
        F.array_sort(_nearest_clusters(vec_col, centroids, nprobe)).alias(
            "__cids"
        ),
    )
    sig = F.col("__sig")
    rot = F.shiftrightunsigned(sig, 1).bitwiseOR(
        F.shiftleft(sig.bitwiseAND(F.lit(1)), _N_PLANES - 1)
    )
    chunks = F.array(
        *[
            F.shiftrightunsigned(sig, i * rows).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ],
        *[
            F.shiftrightunsigned(rot, i * rows).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ],
    )
    banded = with_sig.select(
        F.col(id_col),
        F.col("__sig"),
        F.posexplode(chunks).alias("band", "chunk"),
        F.col("__v"),
        F.col("__n"),
        F.col("__cids"),
    )
    return banded.select("*", F.explode("__cids").alias("__cid"))


def incremental_semantic_verdicts_scoped(
    batch: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    nprobe: int = 2,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Cluster-scoped incremental SemDeDup: the verdict contract of
    :func:`incremental_semantic_verdicts` (dup_of_corpus / dup_in_batch /
    kept under the min-id rule) with candidates restricted to pairs that
    share a probed IVF cluster (arXiv:2303.09540 §3 — pruning is defined
    within clusters). Candidate volume per batch drops from
    batch×corpus×P(band collision) to Σ_c batch_c×corpus_c×P — ≈ nprobe²/k
    of the unscoped form — and both joins stay map-side over the
    persisted index (``corpus_index`` = :func:`scoped_signature_index`
    output; the batch side broadcasts)."""
    bi = scoped_signature_index(batch, centroids, id_col, vec_col, nprobe)
    ci = (
        corpus_index
        if corpus_index is not None
        else scoped_signature_index(corpus, centroids, id_col, vec_col, nprobe)
    )
    of_corpus = _lsh_verified_pairs(
        bi,
        ci,
        _BANDS,
        ordered=False,
        id_col=id_col,
        threshold=threshold,
        scope_col="__cid",
        scope_set_col="__cids",
        broadcast_left=True,
    )
    dup_corpus = (
        of_corpus.select(F.col("id1").alias(id_col))
        .distinct()
        .withColumn("__of_corpus", F.lit(True))
    )
    in_batch = _lsh_verified_pairs(
        bi,
        bi,
        _BANDS,
        ordered=True,
        id_col=id_col,
        threshold=threshold,
        scope_col="__cid",
        scope_set_col="__cids",
    )
    dup_batch = (
        in_batch.select(F.col("id2").alias(id_col))
        .distinct()
        .withColumn("__in_batch", F.lit(True))
    )
    return (
        batch.select(id_col)
        .join(dup_corpus, id_col, "left")
        .join(dup_batch, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__of_corpus"), F.lit("dup_of_corpus"))
            .when(F.col("__in_batch"), F.lit("dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )


def _rot1_sql(z: str) -> str:
    """SQL for the 1-bit right rotation of ``z`` over _N_PLANES bits."""
    return (
        f"(shiftrightunsigned({z}, 1) | "
        f"shiftleft(({z} & 1), {_N_PLANES - 1}))"
    )


def _chunks_sql(bands: int, rows: int) -> str:
    """SQL for the 2·bands chunk array over ``__sig`` (aligned layout
    then the bit-rotated layout) — one parse instead of one py4j
    round-trip per shift/mask node (round 11; tree unchanged)."""
    mask = (1 << rows) - 1
    rot = _rot1_sql("__sig")
    parts = [
        f"(shiftrightunsigned(__sig, {i * rows}) & {mask})" for i in range(bands)
    ] + [
        f"(shiftrightunsigned({rot}, {i * rows}) & {mask})" for i in range(bands)
    ]
    return "array(" + ",".join(parts) + ")"


def _first_collision_sql(z: str, bands: int, rows: int) -> str:
    """SQL for the 1-based index of the first all-zero ``rows``-bit chunk
    of ``z`` (0 = none) — array_position over the per-band zero tests,
    the same expression the DSL listcomp built, rendered driver-side for
    one parse instead of ~450 py4j round-trips per call site (round 11;
    a branch-free bit-twiddle replacement WAS tried and measured slower
    in the join stage — certified negative result, OPTIMIZATION_r11.md)."""
    mask = (1 << rows) - 1
    tests = ",".join(
        f"((shiftrightunsigned({z}, {j * rows}) & {mask}) = 0)"
        for j in range(bands)
    )
    return f"array_position(array({tests}), true)"


def _banded_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bands: int = _BANDS,
    carry_vec: bool = False,
) -> DataFrame:
    """(id, __sig, band, chunk[, __v]) — one row per (row × multi-probe
    band).

    The 32-dot-product signature is aliased ONCE and chunked from the
    COLUMN: inlining it per chunk (32 syntactic copies) blows the
    generated method past janino's limit and silently drops the whole
    stage out of codegen (~50× slower — the functions/geo.py lesson).
    ensure_compute_parallelism: a single-file corpus otherwise plans the
    32-dot-product projection AND the downstream candidate join as ONE
    task (no-op at scale, where the scan already has ≥cores splits).
    Bands [0, bands) are the aligned layout; bands [bands, 2·bands) chunk
    the bit-rotated signature, so the second layout's band boundaries
    split every pair of planes the first keeps together.

    ``carry_vec=True`` keeps the embedding on every band row (as
    ``__v``), which is what lets the candidate join verify exact cosine
    INLINE — the rows are ~288 B instead of ~24 B (linear in the corpus,
    2·bands rows per vector), in exchange for never materializing or
    re-joining the near-quadratic candidate set (the r5 sweep measured
    that verify re-join at 26.5 GB of shuffle at the 100× point). The
    row also carries the vector's L2 NORM (``__n``, +8 B): the
    per-candidate verify is then one dot-product fold instead of the
    full three-fold cosine (dot + both norms recomputed per PAIR) —
    norms are per-row quantities, so computing them n times instead of
    ~n²·candidate-fraction times cut the sf0.1 verify wall ~2×
    (measured 4.5 → 2.1 s; scores stay bit-identical because
    dot/(n₁·n₂) is the same IEEE op sequence cosine() evaluates)."""
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    rows = _N_PLANES // bands
    base = ensure_compute_parallelism(df.select(F.col(id_col), F.col(vec_col)))
    keep = [F.col(id_col), hyperplane_signature(vec_col).alias("__sig")]
    if carry_vec:
        keep.append(F.col(vec_col).alias("__v"))
        keep.append(l2_norm(vec_col).alias("__n"))
    with_sig = base.select(*keep)
    # chunk array as ONE pre-rendered SQL parse instead of 2·bands
    # py4j-built shift/mask subtrees (round 11: the listcomp cost ~540
    # py4j round-trips ≈ 0.25 s of driver plan construction per banded
    # frame; the parsed tree is the same shift/mask expression list —
    # analyzed-plan equality pinned in tests/test_plans.py)
    chunks = F.expr(_chunks_sql(bands, rows))
    out = [F.col(id_col), F.col("__sig"), F.posexplode(chunks).alias("band", "chunk")]
    if carry_vec:
        out.append(F.col("__v"))
        out.append(F.col("__n"))
    return with_sig.select(*out)


def _lsh_verified_pairs(
    left: DataFrame,
    right: DataFrame,
    bands: int,
    ordered: bool,
    id_col: str,
    threshold: float,
    scope_col: str | None = None,
    scope_set_col: str | None = None,
    broadcast_left: bool = False,
) -> DataFrame:
    """Exact-cosine-verified (id1, id2, score) pairs from two banded
    frames built with ``carry_vec=True`` — candidates and verification in
    ONE join stage.

    Dedup without a distinct: a pair colliding in k bands is emitted k
    times by the equi-join, but each copy can see, from the two 8-byte
    signatures alone, every band the pair collides in — so the inline
    filter keeps exactly the copy whose band is the FIRST collision
    (bit ops on sig XOR in the join's own codegen stage; rotation
    commutes with XOR, so layout 2's collisions read off rot(x)).

    Verify without a re-join: both vectors ride the banded rows (``__v``),
    so the surviving copy's exact cosine is computed in the SAME stage.
    The r1–r5 design shipped ids-only candidates re-joined to vectors —
    that re-join's wide intermediate (candidate + 272 B vector, shuffled
    again for the second side) measured 26.5 GB at the sweep's 100× point
    because τ=0.4 banding dedups rather than prunes (candidate fraction
    ≈ 1 for an isotropic corpus — and no wider signature fixes that: the
    amplification gap between p=0.63 at τ=0.4 and q≈0.53 for background
    pairs needs ~22-bit bands and ~10⁵ bands for recall, see SCALING.md).
    Carrying vectors costs 2·bands·288 B per row — LINEAR — and the
    near-quadratic candidate set now exists only in-flight inside the
    join stage, never in an exchange. Filter order matters: the cheap
    first-collision bit test guards the 200-flop cosine, so the cosine
    runs once per distinct candidate, not per band collision.

    ``ordered=True`` restricts to id1 < id2 (self-join near-dup);
    ``ordered=False`` keeps every cross pair once (batch × corpus).
    ``broadcast_left=True`` hints the left side broadcast — the
    incremental form's fixed-size batch — making the whole dedup one
    map-side stage over the corpus index (zero shuffle of the corpus
    side; with a shuffle join the corpus side still moves only its
    linear banded rows).

    ``scope_col`` (with ``scope_set_col``) adds cluster scoping: rows
    carry one exploded scope id per probe plus the full probe-id array;
    the join adds scope equality, and a pair probing the same two scopes
    keeps only the copy in their SMALLEST shared scope — the same
    shuffle-free inline-dedup idea as the first-colliding-band filter,
    extended to the scope dimension (both probe arrays are already on
    the joined row)."""
    rows = _N_PLANES // bands
    a = F.broadcast(left.alias("a")) if broadcast_left else left.alias("a")
    b = right.alias("b")
    # first-collision tests over the signature XOR (and its rotation),
    # rendered as TWO SQL parses instead of ~900 py4j round-trips of
    # per-band DSL subtrees (round 11): same array_position expression,
    # analyzed-plan equality pinned in tests/test_plans.py
    x_sql = "(a.__sig ^ b.__sig)"
    band = F.col("a.band")
    first1 = F.expr(_first_collision_sql(x_sql, bands, rows))
    first2 = F.expr(_first_collision_sql(_rot1_sql(x_sql), bands, rows))
    is_first = F.when(band < bands, band == first1 - 1).otherwise(
        (first1 == 0) & (band - bands == first2 - 1)
    )
    cond = (F.col("a.band") == F.col("b.band")) & (
        F.col("a.chunk") == F.col("b.chunk")
    )
    if scope_col is not None:
        cond = cond & (F.col(f"a.{scope_col}") == F.col(f"b.{scope_col}"))
    if ordered:
        cond = cond & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    keep = is_first
    if scope_col is not None:
        smallest_shared = F.array_min(
            F.array_intersect(
                F.col(f"a.{scope_set_col}"), F.col(f"b.{scope_set_col}")
            )
        )
        keep = keep & (F.col(f"a.{scope_col}") == smallest_shared)
    # the WHEN guard is load-bearing: a single conjunct would be split
    # and could be reordered/pushed into the join condition, evaluating
    # the cosine on every band COLLISION (~8× per pair); WHEN
    # structurally evaluates the cheap bit test first, so the cosine
    # runs once per distinct pair (and a second time, on the surviving
    # few, in the projection).
    # score = dot/(n₁·n₂) on the CARRIED norms, not cosine(a, b): norms
    # are per-row quantities the banded frame already computed once, so
    # the per-candidate verify is one fold instead of three (measured
    # 2× on the sf0.1 wall). Bit-identical to cosine() — same IEEE op
    # sequence, the norms just evaluated earlier — so the DuckDB
    # list_cosine_similarity oracles still hash-match (asserted
    # pairwise-exact in tests/test_similarity.py).
    score = dot("a.__v", "b.__v") / (F.col("a.__n") * F.col("b.__n"))
    verified = F.when(keep, score >= F.lit(threshold)).otherwise(F.lit(False))
    return (
        a.join(b, cond)
        .filter(verified)
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            score.alias("score"),
        )
    )


_PLANES_SQL = double_matrix_sql(_PLANES)  # rendered once; planes are fixed


def _plane_array_expr() -> F.Column:
    # ONE py4j call (F.expr over the pre-rendered SQL literal) instead of
    # ~2,100 (F.lit per element): the per-element form cost ~1.2 s of
    # driver-side plan construction on EVERY query embedding the planes
    # (round-11 phase profile: q_dedup_semantic build_s 1.74 of 3.9 wall).
    # The parsed tree constant-folds to the identical Literal — results
    # and plans are bit-identical (tests/test_plans.py pins equality).
    return F.expr(_PLANES_SQL)


def _fold_dot(v: F.Column, p: F.Column) -> F.Column:
    """Sequential double-fold dot of two (already double) arrays — the
    same op sequence as functions/vectors.dot."""
    return F.aggregate(
        F.zip_with(v, p, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_signature(vec_col: str) -> F.Column:
    """Random-hyperplane LSH signature: bit i = sign(v · plane_i).

    The planes enter the plan as ONE literal array<array<double>> column
    under nested HOFs, and the bits assemble by a doubling fold over the
    reversed bit array (acc·2 + bit, bit 31 first ⇒ Σ bitᵢ·2ⁱ — the
    same long the former per-plane `when(d>0, 1<<i)` sum produced,
    bit-identically). Rewritten from 32 separately-unrolled fold
    subtrees: expression-tree size is a PER-CALL driver planning cost —
    the PQ lesson — and this tree serves every LSH/dedup/ANN query
    (planning measured 2.3→~1 s on q_dedup_semantic at sf0.1).

    Round 11 note: a full SQL render of this expression (one parse, zero
    lambda py4j calls) was tried and measured SLOWER end-to-end — the
    parsed named-lambda form analyzes ~0.15 s worse than the DSL lambda
    form per call site, exceeding the ~0.1 s construction saving. DSL
    kept; only the flat shift/mask builders moved to SQL (see
    :func:`_chunks_sql` / :func:`_first_collision_sql`)."""
    planes = _plane_array_expr()
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = F.transform(
        planes,
        lambda p: F.when(_fold_dot(v, p) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(
        F.reverse(bits),
        F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b,
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    bands: int = _BANDS,
) -> DataFrame:
    """Approximate top-k: candidates share at least one signature band
    (2 bits at the default 16 bands over 32 planes) with the query; exact
    cosine re-rank within candidates. At this banding the miss probability
    for any top-10 neighbor is small enough that the result matches brute
    force at test scale (oracle-checked).

    Scale: corpus signatures are computed once (cache/materialize in a
    real pipeline); the join is on (band, chunk) — no full scan per query.
    """
    rows = _N_PLANES // bands
    mask = (1 << rows) - 1

    def banded(df: DataFrame, idc: str, vc: str) -> DataFrame:
        # alias the 32-dot-product signature ONCE and chunk from the
        # COLUMN (the _banded_signatures janino lesson: 16 inlined copies
        # silently drop the stage out of codegen); candidates then carry
        # ONLY ids — the distinct over rows with two ~512-byte vectors
        # multiplied the exchange ~60× (the pre-r6 candidate-pairs lesson)
        with_sig = df.select(F.col(idc), hyperplane_signature(vc).alias("__sig"))
        sig = F.col("__sig")
        chunks = F.array(
            *[
                F.shiftrightunsigned(sig, i * rows).bitwiseAND(F.lit(mask))
                for i in range(bands)
            ]
        )
        return with_sig.select(F.col(idc), F.posexplode(chunks).alias("band", "chunk"))

    cb = banded(corpus, id_col, vec_col)
    qb = banded(queries, query_id_col, query_vec_col)
    cands = (
        cb.join(
            F.broadcast(qb),
            (cb.band == qb.band) & (cb.chunk == qb.chunk) & (F.col(id_col) != F.col(query_id_col)),
        )
        .select(query_id_col, id_col)
        .distinct()
    )
    scored = (
        cands.join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col),
                    F.col(query_vec_col),
                    l2_norm(query_vec_col).alias("__qn"),
                )
            ),
            query_id_col,
        )
        .join(
            corpus.select(
                F.col(id_col), F.col(vec_col), l2_norm(vec_col).alias("__cn")
            ),
            id_col,
        )
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            (
                dot(vec_col, query_vec_col) / (F.col("__cn") * F.col("__qn"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _centroid_scored(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """array<struct<d, cid>> of dot products against every centroid —
    centroids as ONE literal array column under a transform (plan-size
    lesson: k separately-unrolled dot subtrees were pure per-call
    planning cost). Bit-identical to the unrolled form: same fold ops,
    same struct shape (d double, cid int)."""
    cents = const_double_matrix(centroids)  # one py4j call, not k×64
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return F.transform(
        cents,
        lambda c, i: F.struct(_fold_dot(v, c).alias("d"), i.alias("cid")),
    )


def _nearest_clusters(vec_col: str, centroids: list[list[float]], n: int) -> F.Column:
    """Array of the n nearest centroid ids (by dot product — inputs are
    ~unit-norm embeddings, so dot ≈ cosine) as a JVM-side expression."""
    top = F.slice(
        F.reverse(F.array_sort(_centroid_scored(vec_col, centroids))), 1, n
    )
    return F.transform(top, lambda s: s["cid"])


def ivf_build_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """k centroids: deterministic seeds (k smallest xxhash64(id) rows — a
    uniform pseudo-random sample that every run agrees on) refined by
    ``iters`` distributed Lloyd steps.

    Each step is one assignment pass (JVM expression, no Python) and one
    per-(cluster, dim) average — explode is over dims, so the shuffle is
    k·dim rows regardless of corpus size. Only the k×dim centroid matrix
    ever reaches the driver.
    """
    seeds = (
        corpus.select(vec_col, F.xxhash64(F.col(id_col).cast("string")).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    for _ in range(iters):
        assigned = corpus.select(
            F.element_at(_nearest_clusters(vec_col, centroids, 1), 1).alias("cid"),
            F.col(vec_col),
        )
        means = (
            assigned.select("cid", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep position
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cid"], {})[r["dim"]] = r["m"]
        for cid, dims in by_cid.items():
            new[cid] = [dims[d] for d in sorted(dims)]
        centroids = new
    return centroids


# Centroid cache: the coarse quantizer IS the index — build it once per
# (corpus, params), not per query call (k-means re-ran 2 Lloyd collects on
# every q_ann_ivf_topk invocation in round 1). Keyed by a caller-supplied
# corpus key (e.g. the sf_dir path); tests assert one build per key.
_IVF_CENTROID_CACHE: dict[tuple, list[list[float]]] = {}
IVF_BUILD_COUNT = {"n": 0}


def ivf_centroids_cached(
    corpus: DataFrame,
    corpus_key: str,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    key = (corpus_key, k, iters, id_col, vec_col)
    if key not in _IVF_CENTROID_CACHE:
        IVF_BUILD_COUNT["n"] += 1
        _IVF_CENTROID_CACHE[key] = ivf_build_centroids(
            corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        )
    return _IVF_CENTROID_CACHE[key]


def ivf_seed_centroids(
    corpus: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The SQL-EXPRESSIBLE coarse quantizer: centroids are the embeddings
    of the k LOWEST ids, verbatim — zero Lloyd iterations. Clustering
    quality is below the k-means form (:func:`ivf_build_centroids`, the
    production quantizer), but the whole pipeline — assignment = top-nprobe
    by dot product (ties to the higher cid, matching
    :func:`_nearest_clusters`'s reversed array_sort), scoped pairs, min-id
    verdicts — becomes reproducible by plain DuckDB SQL
    (``list_dot_product`` + ``ROW_NUMBER``), which is what lets the
    cluster-scoped SemDeDup path carry a hash-checked oracle."""
    seeds = corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    return [[float(x) for x in r[vec_col]] for r in seeds]


def ivf_seed_centroids_cached(
    corpus: DataFrame,
    corpus_key: str,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    key = ("seed", corpus_key, k, id_col, vec_col)
    if key not in _IVF_CENTROID_CACHE:
        IVF_BUILD_COUNT["n"] += 1
        _IVF_CENTROID_CACHE[key] = ivf_seed_centroids(
            corpus, k=k, id_col=id_col, vec_col=vec_col
        )
    return _IVF_CENTROID_CACHE[key]


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN: assign the corpus to coarse clusters once, search each
    query only in its ``nprobe`` nearest clusters, exact cosine re-rank.

    Scale: the cluster assignment is a narrow projection (materialize it
    alongside the embedding column in a real pipeline — it IS the index);
    the candidate join shuffles |corpus|/k · nprobe · |queries| rows, not
    |corpus| · |queries|.
    """
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    if centroids is None:
        centroids = ivf_build_centroids(corpus, k=n_clusters, id_col=id_col, vec_col=vec_col)
    # row-local assignment projection (k dots/row) — spread a single-file
    # scan over cores (round 11; no-op at scale). NOTE: the centroid
    # BUILD above is deliberately untouched — its float avg() is
    # summation-order-sensitive, so repartitioning it could move the
    # trained centroids by an ulp and change candidate sets.
    indexed = ensure_compute_parallelism(corpus.select(id_col, vec_col)).select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(vec_col).alias("__cn"),
        F.element_at(_nearest_clusters(vec_col, centroids, 1), 1).alias("cid"),
    )
    probes = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        l2_norm(query_vec_col).alias("__qn"),
        F.explode(_nearest_clusters(query_vec_col, centroids, nprobe)).alias("cid"),
    )
    cands = indexed.join(F.broadcast(probes), "cid").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cands.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        (dot(vec_col, query_vec_col) / (F.col("__cn") * F.col("__qn"))).alias(
            "score"
        ),
    ).distinct()  # a neighbor can surface via several probed clusters
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )


# ---------------------------------------------------------------------------
# Registered queries (embeddings table)
# ---------------------------------------------------------------------------

_QUERY_IDS = (0, 1, 2, 3, 4)


def _query_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@register(
    "q_ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id query_id, CAST(embedding AS DOUBLE[]) query_vec
      FROM embeddings WHERE vec_id IN {_QUERY_IDS}
    ), scored AS (
      SELECT q.query_id, e.vec_id neighbor_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.query_vec) score
      FROM embeddings e, q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 fixed query vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _query_vectors(spark, sf_dir), k=10)


@register(
    "q_embedding_neardup",
    oracle="""
    SELECT a.vec_id id1, b.vec_id id2,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) score
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs at cosine ≥ 0.4, computed the
    scale-safe way: LSH band-join candidates + exact cosine verification
    (no theta join in the plan). The oracle is the all-pairs SQL — the
    verified multi-probe output equals it (per-pair miss ≈1e-7 at the
    threshold; checked exact at sf0.01 and sf0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_lsh(emb, threshold=0.4)


def _verdicts_from_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """keep-verdict per row from (id1, id2) dup pairs under the min-id
    representative rule: id2 (the higher id) is dropped, everything else
    kept. Shared by the global and cluster-scoped dedup so the rule
    cannot drift between them."""
    dropped = pairs.select(F.col("id2").alias(id_col)).distinct().withColumn(
        "__dup", F.lit(True)
    )
    return (
        df.select(id_col)
        .join(dropped, id_col, "left")
        .select(
            id_col,
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
        )
    )


def semantic_dedup_verdicts(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023,
    arXiv:2303.09540): one row per embedding with ``keep`` = false when a
    LOWER-id embedding is cosine-similar at ≥ threshold — the
    deterministic min-id representative rule the exact-dedup family uses.

    Scale path: candidate pairs come from the banded hyperplane LSH join
    (:func:`embedding_neardup_lsh` — shuffle ∝ bucket collisions, never a
    theta join), then exact-cosine verification. SemDeDup's k-means
    cluster-scoping is the same shape with learned buckets
    (:func:`ivf_build_centroids` supplies those); the hyperplane buckets
    are used here because they are deterministic, which keeps the verdict
    column exactly reproducible by the all-pairs oracle."""
    pairs = embedding_neardup_lsh(df, id_col, vec_col, threshold=threshold)
    return _verdicts_from_pairs(df, pairs, id_col)


@register(
    "q_dedup_semantic",
    oracle="""
    WITH dropped AS (
      SELECT DISTINCT b.vec_id
      FROM embeddings a
      JOIN embeddings b
        ON a.vec_id < b.vec_id
       AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) >= 0.4
    )
    SELECT e.vec_id, (d.vec_id IS NULL) AS keep
    FROM embeddings e LEFT JOIN dropped d ON d.vec_id = e.vec_id
    """,
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup verdict per embedding: drop every row with a
    lower-id cosine-≥0.4 neighbor, keep the rest. Computed via LSH
    candidates + exact verify; the oracle recomputes the same verdicts
    from the all-pairs join."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_verdicts(emb, "vec_id", "embedding", threshold=0.4)


@register(
    "q_dedup_semantic_scoped",
    oracle="""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
             CAST(embedding AS DOUBLE[]) AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    probes AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn <= 2
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM embeddings a
      JOIN embeddings b ON a.vec_id < b.vec_id
      JOIN probes pa ON pa.vec_id = a.vec_id
      JOIN probes pb ON pb.vec_id = b.vec_id AND pb.cid = pa.cid
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) >= 0.4
    )
    SELECT e.vec_id, (d.vec_id IS NULL) AS keep
    FROM embeddings e LEFT JOIN dropped d ON d.vec_id = e.vec_id
    """,
)
def q_dedup_semantic_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup paper-faithful verdicts: pruning decided WITHIN coarse
    IVF clusters only (arXiv:2303.09540 §3) — the linear-at-corpus-scale
    form of q_dedup_semantic (candidates Σ_c n_c² instead of n²).

    The registered form fixes the coarse quantizer to the SQL-expressible
    seed rule (centroids = the 16 lowest-id embeddings, zero Lloyd steps —
    :func:`ivf_seed_centroids`), so assignment, scoping, and verdicts are
    all reproducible by the DuckDB oracle: dot-product ranking ties to the
    higher cid exactly like :func:`_nearest_clusters`. The production
    quantizer stays :func:`ivf_build_centroids` (Lloyd-refined; pytest
    model-certified in test_similarity.py::test_cluster_scoped_pairs_match_model)
    — same plan, better clusters, not hash-checkable. Centroids come from
    the per-corpus cache — the coarse quantizer is a build-once index,
    like q_ann_ivf_topk's."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_seed_centroids_cached(emb, sf_dir)
    return semantic_dedup_scoped(
        emb, "vec_id", "embedding", threshold=0.4, centroids=cents
    )


PROTO_DROP_K = 10


def prototype_prune(
    df: DataFrame,
    centroids: list[list[float]],
    drop_per_cluster: int = PROTO_DROP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SSL-prototype pruning (Sorscher et al. 2022, arXiv:2206.14486):
    rank every embedding by similarity to its assigned cluster centroid
    (its "prototypicality") and DROP the ``drop_per_cluster`` most
    prototypical rows per cluster — the paper's finding is that in the
    abundant-data regime pruning the easiest (most typical) examples
    beats random pruning.

    Plan: assignment + score is one narrow projection (the k dot
    products of :func:`_nearest_clusters`, keeping the winning struct's
    score); the only shuffle is the per-cluster rank window — k groups,
    skew-bounded because cluster sizes are bounded by the quantizer.
    Deterministic total order (score desc, id asc), so with seed
    centroids the whole operator is SQL-oracle-reproducible."""
    top = F.element_at(
        F.reverse(F.array_sort(_centroid_scored(vec_col, centroids))), 1
    )
    # the k-centroid assignment scan is the operator's CPU and a
    # single-file corpus plans it as ONE task (round 11: 3 single-task
    # stages measured); round-robin the slim projection — no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    assigned = ensure_compute_parallelism(
        df.select(F.col(id_col), F.col(vec_col))
    ).select(
        F.col(id_col),
        top["cid"].alias("cid"),
        top["d"].alias("proto_score"),
    )
    w = Window.partitionBy("cid").orderBy(F.desc("proto_score"), F.asc(id_col))
    return assigned.select(
        id_col,
        "cid",
        "proto_score",
        F.row_number().over(w).alias("rank"),
    ).withColumn("keep", F.col("rank") > drop_per_cluster)


@register(
    "q_prototype_prune",
    oracle=f"""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
             CAST(embedding AS DOUBLE[]) AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    assigned AS (
      SELECT vec_id, cid, d AS proto_score FROM (
        SELECT e.vec_id, c.cid,
               list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec) AS d,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    )
    SELECT vec_id, cid, proto_score,
           ROW_NUMBER() OVER (PARTITION BY cid
                              ORDER BY proto_score DESC, vec_id) AS rank,
           ROW_NUMBER() OVER (PARTITION BY cid
                              ORDER BY proto_score DESC, vec_id)
             > {PROTO_DROP_K} AS keep
    FROM assigned
    """,
)
def q_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype pruning over the embeddings corpus: drop the
    {PROTO_DROP_K} most centroid-similar rows per coarse cluster. Uses
    the same SQL-expressible seed quantizer (and per-corpus centroid
    cache) as q_dedup_semantic_scoped, so assignment, scores, ranks, and
    verdicts are hash-reproducible by the DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_seed_centroids_cached(emb, sf_dir)
    return prototype_prune(emb, cents)


KNN_K = 5


def seed_half_centroids(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[list[float]]]:
    """Two half-dimension seed codebooks (low dims / high dims of the k
    lowest-id embeddings) for :func:`product_cid`."""
    seeds = corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    half = _DIM // 2
    lo = [[float(x) for x in r[vec_col][:half]] for r in seeds]
    hi = [[float(x) for x in r[vec_col][half:]] for r in seeds]
    return lo, hi


def product_cid(
    vec_col: str,
    cents_lo: list[list[float]],
    cents_hi: list[list[float]],
) -> F.Column:
    """Composite coarse-cluster id from two half-dimension quantizers:
    ``argmax_lo · |hi| + argmax_hi`` — k_lo·k_hi effective clusters from
    only k_lo+k_hi unrolled half-width dot products. This sidesteps the
    single-quantizer expression-unroll cap (~64 clusters before janino
    ends codegen, the _nearest_clusters note), which is what lets
    CLUSTER COUNT grow ∝ corpus with bounded per-cluster population —
    the linear-scale contract of the kNN/scoped families (measured in
    operators/sweep.py's knn rows). Ties break to the higher sub-cid on
    each half (reversed array_sort, same rule as _nearest_clusters)."""
    half = _DIM // 2

    def _argmax(v: F.Column, cents: list[list[float]]) -> F.Column:
        lits = const_double_matrix(cents)  # one py4j call, not k×32
        vd = F.transform(v, lambda x: x.cast("double"))
        scored = F.transform(
            lits,
            lambda c, i: F.struct(
                _fold_dot(vd, c).alias("d"), i.alias("cid")
            ),
        )
        return F.element_at(F.reverse(F.array_sort(scored)), 1)["cid"]

    lo = F.slice(F.col(vec_col), 1, half)
    hi = F.slice(F.col(vec_col), half + 1, half)
    return _argmax(lo, cents_lo) * F.lit(len(cents_hi)) + _argmax(hi, cents_hi)


def knn_label_consistency(
    df: DataFrame,
    centroids: list[list[float]] | None,
    k: int = KNN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    cid_expr: F.Column | None = None,
) -> DataFrame:
    """kNN label-noise detection (the curation op behind Confident
    Learning / cleanlab's kNN filter, Northcutt et al. 2021,
    arXiv:1911.00068): for every embedding, the majority label among its
    k nearest neighbors — neighbors searched WITHIN its assigned IVF
    cluster (argmax assignment, the standard same-cluster scoping for
    noise detection: no probe explosion, every in-cluster pair unique by
    construction) — and an ``agree`` verdict against its own label.
    Disagreements are the mislabel candidates a pipeline routes to
    review.

    Deterministic end to end (score ties → lower neighbor id; majority
    ties → lower label), so with seed centroids the whole operator is
    SQL-oracle-reproducible. Scale: candidate volume is Σ_c n_c², linear
    with cluster count grown ∝ corpus — pass ``cid_expr`` (e.g.
    :func:`product_cid`, which grows cluster count past the unroll cap)
    to scope by any precomputed/composite cluster id; the top-k window
    prunes to k rows per partition before the final exchange
    (WindowGroupLimit). Neighbor scores verify on carried per-row norms
    (one dot fold per pair, the _lsh_verified_pairs trick; bit-identical
    to cosine())."""
    cid = (
        cid_expr
        if cid_expr is not None
        else F.element_at(_nearest_clusters(vec_col, centroids, 1), 1)
    )
    probes = df.select(
        F.col(id_col),
        F.col(label_col),
        F.col(vec_col).alias("__v"),
        l2_norm(vec_col).alias("__n"),
        cid.alias("__cid"),
    )
    a, b = probes.alias("a"), probes.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__cid") == F.col("b.__cid"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    )
    scored = pairs.select(
        F.col(f"a.{id_col}").alias(id_col),
        F.col(f"b.{id_col}").alias("nbr_id"),
        F.col(f"b.{label_col}").alias("nbr_label"),
        (dot("a.__v", "b.__v") / (F.col("a.__n") * F.col("b.__n"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("nbr_id"))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    counts = topk.groupBy(id_col, "nbr_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wm = Window.partitionBy(id_col).orderBy(
        F.desc("votes"), F.asc("nbr_label")
    )
    majority = (
        counts.withColumn("mrn", F.row_number().over(wm))
        .filter(F.col("mrn") == 1)
        .select(id_col, F.col("nbr_label").alias("knn_label"))
    )
    return (
        df.select(id_col, label_col)
        .join(majority, id_col, "left")
        .select(
            id_col,
            label_col,
            "knn_label",
            (
                F.col("knn_label").isNotNull()
                & (F.col("knn_label") == F.col(label_col))
            ).alias("agree"),
        )
    )


@register(
    "q_knn_label_consistency",
    oracle=f"""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
             CAST(embedding AS DOUBLE[]) AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    probes AS (
      SELECT vec_id, label, embedding, cid FROM (
        SELECT e.vec_id, e.label, e.embedding, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id, b.vec_id AS nbr_id, b.label AS nbr_label,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS score
      FROM probes a JOIN probes b
        ON a.cid = b.cid AND a.vec_id <> b.vec_id
    ),
    topk AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY score DESC, nbr_id) rn
        FROM pairs
      ) WHERE rn <= {KNN_K}
    ),
    majority AS (
      SELECT vec_id, nbr_label AS knn_label FROM (
        SELECT vec_id, nbr_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY COUNT(*) DESC, nbr_label) mrn
        FROM topk GROUP BY vec_id, nbr_label
      ) WHERE mrn = 1
    )
    SELECT e.vec_id, e.label, m.knn_label,
           (m.knn_label IS NOT NULL AND m.knn_label = e.label) AS agree
    FROM embeddings e LEFT JOIN majority m ON m.vec_id = e.vec_id
    """,
)
def q_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel-candidate detection over the embeddings corpus: own label
    vs the majority label of the {KNN_K} nearest same-cluster neighbors.
    Same cached seed quantizer as the scoped-dedup family."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_seed_centroids_cached(emb, sf_dir)
    return knn_label_consistency(emb, cents)


def _semantic_scoped_setup(spark: SparkSession, sf_dir: str):
    """Bench split: the coarse-quantizer build is INDEX work a real
    pipeline runs once per corpus — measure it as setup so the headline
    reflects the amortized per-query cost (same honesty split as the
    incremental family's signature index)."""
    emb = load_table(spark, sf_dir, "embeddings")
    _IVF_CENTROID_CACHE.pop(("seed", sf_dir, 16, "vec_id", "embedding"), None)
    cents = ivf_seed_centroids_cached(emb, sf_dir)
    return (emb, cents)


def _semantic_scoped_exec(handle) -> DataFrame:
    emb, cents = handle
    return semantic_dedup_scoped(
        emb, "vec_id", "embedding", threshold=0.4, centroids=cents
    )


def incremental_semantic_verdicts(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    corpus_banded: DataFrame | None = None,
) -> DataFrame:
    """Incremental-ingest SemDeDup: verdict per BATCH embedding —
    ``dup_of_corpus`` when a cosine-≥threshold neighbor already exists in
    the ingested corpus, else ``dup_in_batch`` when a LOWER-id batch
    embedding is similar (the same min-id representative rule the exact
    incremental dedup uses, dedup.py:incremental_dedup_exact), else
    ``kept``.

    Scale contract (mirrors the exact/ngram incremental family): the
    corpus side's banded signatures+vectors are the REUSABLE INDEX — in
    a real pipeline they are computed once at ingest and persisted (pass
    the prebuilt ``carry_vec=True`` frame as ``corpus_banded``); per
    batch, the work is batch signatures + two candidate joins. The batch
    side is BROADCAST (an ingest batch is small by contract), so the
    batch×corpus join is one map-side stage over the corpus index — zero
    corpus-side shuffle — and both joins dedup candidates with the
    shuffle-free first-colliding-band filter and verify exact cosine
    INLINE on the carried vectors (the ids-only candidates + vector
    re-join this replaces measured 26.5 GB of wide-intermediate shuffle
    at the r5 sweep's 100× point), so the verdicts equal the all-pairs
    oracle's."""
    bb = _banded_signatures(batch, id_col, vec_col, _BANDS, carry_vec=True)
    cb = (
        corpus_banded
        if corpus_banded is not None
        else _banded_signatures(corpus, id_col, vec_col, _BANDS, carry_vec=True)
    )
    # batch × corpus: every cross pair once (no id ordering)
    of_corpus = _lsh_verified_pairs(
        bb,
        cb,
        _BANDS,
        ordered=False,
        id_col=id_col,
        threshold=threshold,
        broadcast_left=True,
    )
    dup_corpus = (
        of_corpus.select(F.col("id1").alias(id_col))
        .distinct()
        .withColumn("__of_corpus", F.lit(True))
    )
    # batch × batch: lower-id representative rule
    in_batch = _lsh_verified_pairs(
        bb, bb, _BANDS, ordered=True, id_col=id_col, threshold=threshold
    )
    dup_batch = (
        in_batch.select(F.col("id2").alias(id_col))
        .distinct()
        .withColumn("__in_batch", F.lit(True))
    )
    return (
        batch.select(id_col)
        .join(dup_corpus, id_col, "left")
        .join(dup_batch, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__of_corpus"), F.lit("dup_of_corpus"))
            .when(F.col("__in_batch"), F.lit("dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )


@register(
    "q_dedup_semantic_incremental",
    oracle="""
    WITH batch AS (SELECT * FROM embeddings WHERE vec_id % 5 = 0),
    corpus AS (SELECT * FROM embeddings WHERE vec_id % 5 <> 0),
    ofc AS (
      SELECT DISTINCT b.vec_id FROM batch b JOIN corpus c
        ON list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                  CAST(c.embedding AS DOUBLE[])) >= 0.4
    ),
    ibb AS (
      SELECT DISTINCT b.vec_id FROM batch b JOIN batch a
        ON a.vec_id < b.vec_id
       AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) >= 0.4
    )
    SELECT e.vec_id,
           CASE WHEN o.vec_id IS NOT NULL THEN 'dup_of_corpus'
                WHEN i.vec_id IS NOT NULL THEN 'dup_in_batch'
                ELSE 'kept' END AS verdict
    FROM batch e
    LEFT JOIN ofc o ON o.vec_id = e.vec_id
    LEFT JOIN ibb i ON i.vec_id = e.vec_id
    """,
)
def q_dedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental semantic dedup: embeddings with vec_id % 5 == 0 play
    the incoming batch, the rest the already-ingested corpus whose banded
    signature index the batch is checked against (deterministic split so
    the all-pairs oracle reproduces it)."""
    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    return incremental_semantic_verdicts(
        batch, corpus, "vec_id", "embedding", threshold=0.4
    )


_LAST_SEMANTIC_IDX: DataFrame | None = None


def _semantic_incremental_setup(spark: SparkSession, sf_dir: str):
    """Bench split: building + persisting the corpus signature index is
    INGEST-side work a real pipeline amortizes across batches — measure
    it as setup so index (re)build noise can't mask a regression in the
    per-batch dedup itself."""
    global _LAST_SEMANTIC_IDX
    if _LAST_SEMANTIC_IDX is not None:
        _LAST_SEMANTIC_IDX.unpersist()
    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    idx = _banded_signatures(
        corpus, "vec_id", "embedding", _BANDS, carry_vec=True
    ).persist()
    idx.count()  # materialize the index
    _LAST_SEMANTIC_IDX = idx
    return (batch, corpus, idx)


def _semantic_incremental_exec(handle) -> DataFrame:
    batch, corpus, idx = handle
    return incremental_semantic_verdicts(
        batch, corpus, "vec_id", "embedding", threshold=0.4, corpus_banded=idx
    )


@register(
    "q_ann_lsh_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id query_id, CAST(embedding AS DOUBLE[]) query_vec
      FROM embeddings WHERE vec_id IN {_QUERY_IDS}
    ), scored AS (
      SELECT q.query_id, e.vec_id neighbor_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.query_vec) score
      FROM embeddings e, q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-10 for the same 5 queries (scale path). At
    16 bands × 2 bits the candidates contain every true top-10 neighbor,
    so the exact re-rank reproduces brute force — the oracle IS the exact
    top-k SQL. Recall floor additionally asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, _query_vectors(spark, sf_dir), k=10)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for the same 5 queries (coarse-quantizer scale
    path). Centroids are built ONCE per (sf_dir, params) and cached — the
    quantizer is the index, not per-query work. Recall vs brute force
    asserted in tests/test_similarity.py.

    Deliberately NOT in the query registry: nprobe=4 of 16 clusters is
    intentionally approximate, so no SQL oracle can certify it; the full
    IVF plan is oracle-certified via q_ann_ivf_exhaustive (nprobe=all),
    and this function's recall is pinned by pytest instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids_cached(emb, corpus_key=sf_dir, k=16)
    return ann_ivf_topk(emb, _query_vectors(spark, sf_dir), k=10, centroids=cents)


@register(
    "q_ann_ivf_exhaustive",
    oracle=f"""
    WITH q AS (
      SELECT vec_id query_id, CAST(embedding AS DOUBLE[]) query_vec
      FROM embeddings WHERE vec_id IN {_QUERY_IDS}
    ), scored AS (
      SELECT q.query_id, e.vec_id neighbor_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.query_vec) score
      FROM embeddings e, q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q_ann_ivf_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe = all clusters: the SAME partitioned plan as
    q_ann_ivf_topk (cluster-id equi-join, per-cluster candidate sets,
    exact re-rank) but probing every cluster, which makes the result
    exactly the brute-force top-k — so the full IVF machinery gets a SQL
    oracle. q_ann_ivf_topk (nprobe=4) remains the approximate scale path,
    recall-tested in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids_cached(emb, corpus_key=sf_dir, k=16)
    return ann_ivf_topk(
        emb, _query_vectors(spark, sf_dir), k=10, centroids=cents, nprobe=len(cents)
    )


# ---------------------------------------------------------------------------
# PQ (product quantization) ANN — the compressed-index scale path
# ---------------------------------------------------------------------------

_PQ_M = 8        # subquantizers (64 dims → 8 subvectors of 8)
_PQ_DSUB = _DIM // _PQ_M
_PQ_K = 16       # codewords per subquantizer
_PQ_SCALE = 1_000_000  # fixed-point scale for the integer ADC


def pq_seed_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """``codebooks[j][c]`` = the j-th 8-dim subvector of the c-th seed
    embedding (the ``_PQ_K`` lowest ids — the same SQL-expressible seed
    rule as :func:`ivf_seed_centroids`, sliced per subquantizer). Zero
    k-means iterations, so a DuckDB oracle reproduces the codebooks
    verbatim from the table; a production deployment would Lloyd-refine
    each subquantizer independently (Jégou et al. 2011, §III) with the
    same downstream plan."""
    seeds = corpus.select(id_col, vec_col).orderBy(id_col).limit(_PQ_K).collect()
    cents = [[float(x) for x in r[vec_col]] for r in seeds]
    return [
        [c[j * _PQ_DSUB : (j + 1) * _PQ_DSUB] for c in cents]
        for j in range(_PQ_M)
    ]


def _pq_books_lit(codebooks: list[list[list[float]]]) -> F.Column:
    """The codebooks as ONE literal array<array<array<double>>> column.
    Load-bearing for plan size: codewords enter the plan as literal DATA
    indexed by nested HOFs, not as 8×16 separately-unrolled fold
    subtrees — the unrolled form cost ~9 s of pure Catalyst
    planning/codegen per call at ANY data size (measured 10.4 → 1.5 s
    at sf0.1 with identical output)."""
    # ONE py4j call (SQL literal parsed JVM-side) instead of ~1,100
    # (F.lit per element) — the round-11 twin of the unroll fix: the
    # tree was already one literal array, but BUILDING it cost ~0.65 s
    # of py4j round-trips per call (phase profile: q_ann_pq_topk
    # build_s 2.55 of 4.1 wall, two books builds per query).
    return const_double_cube(codebooks)


def _pq_dist2(sub: F.Column, w: F.Column) -> F.Column:
    """Squared L2 between an (already double) subvector slice and a
    codeword, as a sequential double fold. Bit-identical to the oracle's
    unrolled left-associated 8-term sum: the fold seeds 0.0 and squared
    terms are never −0.0, so ``0.0 + t₁`` ≡ ``t₁`` exactly."""
    return F.aggregate(
        F.zip_with(sub, w, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _pq_codes_expr(
    vec_col: str, codebooks: list[list[list[float]]]
) -> F.Column:
    """The ``_PQ_M`` codeword ids of a vector as one Column: per
    subquantizer, argmin over the ``_PQ_K`` codeword subdistances (ties
    to the lower codeword — the array_sort struct order, matching the
    oracle's ORDER BY d, cid), expressed as nested HOFs over the literal
    codebook column (:func:`_pq_books_lit` — plan-size lesson there)."""
    books = _pq_books_lit(codebooks)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
        lambda j: F.element_at(
            F.array_sort(
                F.transform(
                    F.element_at(books, (j + 1).cast("int")),
                    lambda w, ci: F.struct(
                        _pq_dist2(
                            F.slice(
                                v, (j * _PQ_DSUB + 1).cast("int"), _PQ_DSUB
                            ),
                            w,
                        ).alias("d"),
                        ci.alias("c"),
                    ),
                )
            ),
            1,
        )["c"],
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): each vector compressed to ``_PQ_M`` codeword ids —
    the PQ INDEX (8 bytes/vector vs 256 for the raw float32 embedding, a
    32× compression); one narrow projection, built once at ingest and
    persisted in production."""
    return df.select(
        F.col(id_col), _pq_codes_expr(vec_col, codebooks).alias("codes")
    )


def _pq_dtab_expr(
    query_vec_col: str, codebooks: list[list[list[float]]]
) -> F.Column:
    """The per-query ADC lookup table (``_PQ_M × _PQ_K`` exact
    query-to-codeword subdistances) as one Column on the query frame."""
    books = _pq_books_lit(codebooks)
    qv = F.transform(F.col(query_vec_col), lambda x: x.cast("double"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
        lambda j: F.transform(
            F.element_at(books, (j + 1).cast("int")),
            lambda w: _pq_dist2(
                F.slice(qv, (j * _PQ_DSUB + 1).cast("int"), _PQ_DSUB), w
            ),
        ),
    )


def _pq_adc_expr() -> F.Column:
    """Fixed-point integer ADC over (codes, __dtab): 8 lookups, each
    floored at 10⁶, summed as BIGINTs — order-independent, hash-exact."""
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("__dtab"),
            lambda c, tab: F.floor(
                F.element_at(tab, c + F.lit(1)) * F.lit(_PQ_SCALE)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """PQ ANN top-k by asymmetric distance (ADC, Jégou et al. 2011):
    per query, a ``_PQ_M × _PQ_K`` table of exact query-to-codeword
    subdistances is computed ONCE (broadcast with the query row); each
    corpus vector's approximate distance is then ``_PQ_M`` table lookups
    on its 8-byte code — never a touch of the raw embedding.

    The ADC is INTEGER-deterministic: each subdistance is fixed-pointed
    (``floor(d · 10⁶)`` — bit-identical per term because the unrolled
    double expression matches the oracle's) and summed as BIGINTs, so
    the total is independent of summation order and the ranking carries
    an exact DuckDB oracle. Ties break to the lower neighbor id.

    Scale: the corpus side streams (vec_id, codes) — the compressed
    index — through one codegen projection; the only shuffle is the
    per-query top-k window (WindowGroupLimit prunes to k rows per
    partition pre-exchange, the brute_force_topk shape) over rows of
    ~16 bytes instead of ~280."""
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    # encode + ADC are the compute-heavy projections; a single-file
    # corpus otherwise runs them as ONE task up to the top-k exchange
    # (round 11; no-op at scale — row-local ops, so parallelism cannot
    # change the ranking, and the top-k tie-break is a total order)
    codes = pq_encode(
        ensure_compute_parallelism(corpus.select(id_col, vec_col)),
        codebooks, id_col, vec_col,
    )
    q = queries.select(
        F.col(query_id_col),
        _pq_dtab_expr(query_vec_col, codebooks).alias("__dtab"),
    )
    adc = _pq_adc_expr()
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            adc.alias("adc"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "adc")
    )


def _pq_dist2_sql(arr_expr: str, w_expr: str, j_expr: str) -> str:
    """The oracle's spelling of :func:`_pq_sub_dist2` — same 8 terms,
    same left-associated order, with the subvector offset given as a SQL
    expression (``s.j*8``) so one CTE covers every subquantizer."""
    terms = []
    for i in range(_PQ_DSUB):
        e = f"(CAST({arr_expr}[{j_expr}*{_PQ_DSUB} + {i + 1}] AS DOUBLE) - {w_expr}[{i + 1}])"
        terms.append(f"{e} * {e}")
    return "(" + " + ".join(terms) + ")"


_PQ_CODEBOOK_CACHE: dict[str, list[list[list[float]]]] = {}


def pq_seed_codebooks_cached(
    corpus: DataFrame, corpus_key: str
) -> list[list[list[float]]]:
    if corpus_key not in _PQ_CODEBOOK_CACHE:
        _PQ_CODEBOOK_CACHE[corpus_key] = pq_seed_codebooks(corpus)
    return _PQ_CODEBOOK_CACHE[corpus_key]


@register(
    "q_ann_pq_topk",
    oracle=f"""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
             CAST(embedding AS DOUBLE[]) AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {_PQ_K})
    ),
    subcw AS (
      SELECT cid, j, cvec[j*{_PQ_DSUB}+1 : (j+1)*{_PQ_DSUB}] AS w
      FROM cents CROSS JOIN generate_series(0, {_PQ_M - 1}) AS t(j)
    ),
    codes AS (
      SELECT vec_id, j, cid AS code FROM (
        SELECT e.vec_id, s.j, s.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, s.j
                 ORDER BY {_pq_dist2_sql("e.embedding", "s.w", "s.j")}, s.cid) rn
        FROM embeddings e JOIN subcw s ON TRUE
      ) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id IN {_QUERY_IDS}
    ),
    dtab AS (
      SELECT q.query_id, s.j, s.cid,
             {_pq_dist2_sql("q.qv", "s.w", "s.j")} AS d
      FROM q JOIN subcw s ON TRUE
    ),
    adc AS (
      SELECT d.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(FLOOR(d.d * {_PQ_SCALE}) AS BIGINT)) AS BIGINT) AS adc
      FROM codes c JOIN dtab d ON d.j = c.j AND d.cid = c.code
      WHERE c.vec_id <> d.query_id
      GROUP BY d.query_id, c.vec_id
    )
    SELECT query_id, neighbor_id, rank, adc FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc, neighbor_id) rank
      FROM adc
    ) WHERE rank <= 10
    """,
)
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-10 for the fixed 5 queries over the seed codebooks —
    the compressed-index scale path (8-byte codes, integer ADC). The
    oracle recomputes codebooks, encoding, distance tables, and the
    fixed-point ADC ranking in plain SQL; recall vs the exact top-k is
    pinned separately in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_seed_codebooks_cached(emb, sf_dir)
    return ann_pq_topk(emb, _query_vectors(spark, sf_dir), books, k=10)


def ann_ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ (Jégou et al. 2011 §V — the FAISS IVFPQ composition): the
    coarse quantizer restricts each query to its ``nprobe`` nearest
    clusters' inverted lists, and candidates rank by the integer ADC on
    8-byte PQ codes — both index structures this module already builds,
    composed. The corpus-side index is ONE narrow projection (cid +
    codes, persisted at ingest in production); the probe frame (query ×
    nprobe, carrying the ADC table) broadcasts, so the candidate join is
    map-side with |corpus|·nprobe/k_clusters joined rows and a corpus row
    has exactly one cid — no multi-probe duplicate pairs, no distinct.

    Fully deterministic (seed centroids, argmax ties to higher cid like
    :func:`_nearest_clusters`; integer ADC; id tie-breaks), so even the
    APPROXIMATE nprobe<k form carries an exact SQL oracle — the oracle
    mirrors the algorithm, not the brute-force answer; recall vs the
    exact top-k is pinned separately in pytest.

    Pass ``corpus_index`` (a prebuilt/persisted (id, cid, codes) frame,
    :func:`ivfpq_index`) to skip the encode projection — the production
    path, and ALSO the robustness path: the inline cid/codes
    expressions are plan literals over the embedding column, and
    Catalyst's constraint propagation has been observed (round 8, plan-
    state-dependent) to infer a cross-side filter from the cid join
    equivalence that mis-binds the corpus scan's embedding attribute on
    the broadcast probe side — an INTERNAL_ERROR at execution. A
    materialized index is a plain leaf, so there is no alias constraint
    to mis-rewrite."""
    enc = corpus_index
    if enc is None:
        enc = corpus.select(
            F.col(id_col),
            F.element_at(_nearest_clusters(vec_col, centroids, 1), 1).alias(
                "cid"
            ),
            _pq_codes_expr(vec_col, codebooks).alias("codes"),
        )
    probes = queries.select(
        F.col(query_id_col),
        F.explode(
            _nearest_clusters(query_vec_col, centroids, nprobe)
        ).alias("cid"),
        _pq_dtab_expr(query_vec_col, codebooks).alias("__dtab"),
    )
    cands = enc.join(F.broadcast(probes), "cid").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cands.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        _pq_adc_expr().alias("adc"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "adc")
    )


def ann_ivfpq_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """ADC shortlist → EXACT-cosine rerank → top-k: the production
    retrieval form (every real PQ deployment reranks the compressed-
    domain top-R with exact distances — Jégou et al. 2011 §V.C; the
    honest cost of skipping it was the r8 recall@10 of ~0.3).

    Plan shape at scale: the shortlist is |queries|·R rows → BROADCAST
    back against the corpus scan, so fetching the full vectors for
    rerank is one map-side semi-join over the corpus (no corpus
    shuffle); the exact cosine is the certified brute-force spelling
    (one dot fold / precomputed norms) evaluated on ≤ |queries|·R rows;
    the final top-k window sees the same tiny frame. Deterministic end
    to end (integer ADC shortlist, id tie-breaks both stages), so the
    composition carries an exact SQL oracle."""
    short = ann_ivfpq_topk(
        corpus,
        queries,
        centroids,
        codebooks,
        k=shortlist,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        corpus_index=corpus_index,
    ).select(query_id_col, "neighbor_id")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col),
        l2_norm(vec_col).alias("__cn"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        l2_norm(query_vec_col).alias("__qn"),
    )
    fetched = c.join(F.broadcast(short), "neighbor_id").join(
        F.broadcast(q), query_id_col
    )
    scored = fetched.select(
        F.col(query_id_col),
        F.col("neighbor_id"),
        (dot(vec_col, query_vec_col) / (F.col("__cn") * F.col("__qn"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )


_IVFPQ_NPROBE = 4

# Persisted (vec_id, cid, codes) IVF-PQ indexes per (corpus, quantizer
# generation) — written to parquet once and read back, exactly what a
# production ingest does. Persist-and-rescan (NOT cache/localCheckpoint)
# is load-bearing: LogicalRDD-style truncation preserves the encode
# Project's alias constraints, whose defining expressions reference the
# now-pruned embedding column — Catalyst's constraint propagation then
# infers a join filter carrying that dangling attribute onto the probe
# side (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at execution, observed
# round 8, plan-state-dependent). A fresh file scan carries no
# constraints, so nothing can dangle.
_IVFPQ_INDEX_CACHE: dict[tuple, DataFrame] = {}


def _books_digest(*mats) -> str:
    """Content digest of centroid/codebook matrices for cache keys:
    a reused (corpus_key, tag) with DIFFERENT quantizers must miss the
    cache, not silently serve an index built from the old generation
    (ADVICE r8). repr() of Python floats round-trips exactly, so equal
    digests ⇔ equal matrices."""
    import hashlib  # noqa: PLC0415

    h = hashlib.sha256()
    for m in mats:
        h.update(repr(m).encode())
    return h.hexdigest()[:16]


def ivfpq_index_cached(
    corpus: DataFrame,
    corpus_key: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    tag: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    key = ("ivfpq", corpus_key, tag, _books_digest(centroids, codebooks))
    if key not in _IVFPQ_INDEX_CACHE:
        from iceberg_matrix_spark.storage import state_dir  # noqa: PLC0415

        path = state_dir("ivfpq-index-") + "/index.parquet"
        # parallelize the encode AND the index layout: a single-file
        # corpus otherwise encodes on ONE task and writes ONE parquet
        # file, so every later ADC scan of the index is also single-task
        # (round 11: q_ann_ivfpq_rerank measured 10 single-task stages);
        # round-robin no-op at scale, per-row projection unaffected
        from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
            ensure_compute_parallelism,
        )

        ensure_compute_parallelism(
            corpus.select(F.col(id_col), F.col(vec_col))
        ).select(
            F.col(id_col),
            F.element_at(_nearest_clusters(vec_col, centroids, 1), 1).alias(
                "cid"
            ),
            _pq_codes_expr(vec_col, codebooks).alias("codes"),
        ).write.parquet(path)
        _IVFPQ_INDEX_CACHE[key] = corpus.sparkSession.read.parquet(path)
    return _IVFPQ_INDEX_CACHE[key]


@register(
    "q_ann_ivfpq_topk",
    oracle=f"""
    WITH cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
             CAST(embedding AS DOUBLE[]) AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {_PQ_K})
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    subcw AS (
      SELECT cid, j, cvec[j*{_PQ_DSUB}+1 : (j+1)*{_PQ_DSUB}] AS w
      FROM cents CROSS JOIN generate_series(0, {_PQ_M - 1}) AS t(j)
    ),
    codes AS (
      SELECT vec_id, j, cid AS code FROM (
        SELECT e.vec_id, s.j, s.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, s.j
                 ORDER BY {_pq_dist2_sql("e.embedding", "s.w", "s.j")}, s.cid) rn
        FROM embeddings e JOIN subcw s ON TRUE
      ) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id IN {_QUERY_IDS}
    ),
    qprobes AS (
      SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_dot_product(CAST(q.qv AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM q CROSS JOIN cents c
      ) WHERE rn <= {_IVFPQ_NPROBE}
    ),
    dtab AS (
      SELECT q.query_id, s.j, s.cid,
             {_pq_dist2_sql("q.qv", "s.w", "s.j")} AS d
      FROM q JOIN subcw s ON TRUE
    ),
    adc AS (
      SELECT d.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(FLOOR(d.d * {_PQ_SCALE}) AS BIGINT)) AS BIGINT) AS adc
      FROM assign a
      JOIN qprobes p ON p.cid = a.cid
      JOIN codes c ON c.vec_id = a.vec_id
      JOIN dtab d ON d.query_id = p.query_id
                 AND d.j = c.j AND d.cid = c.code
      WHERE a.vec_id <> p.query_id
      GROUP BY d.query_id, c.vec_id
    )
    SELECT query_id, neighbor_id, rank, adc FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc, neighbor_id) rank
      FROM adc
    ) WHERE rank <= 10
    """,
)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-10 for the fixed 5 queries: nprobe={_IVFPQ_NPROBE} of
    {_PQ_K} seed clusters, integer ADC on 8-byte codes within the probed
    inverted lists. The oracle mirrors the full algorithm — probes,
    assignment, codes, fixed-point ADC — so the approximate form itself
    is hash-certified."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_seed_centroids_cached(emb, sf_dir)
    books = pq_seed_codebooks_cached(emb, sf_dir)
    idx = ivfpq_index_cached(emb, sf_dir, cents, books, tag="seed")
    return ann_ivfpq_topk(
        emb,
        _query_vectors(spark, sf_dir),
        cents,
        books,
        k=10,
        nprobe=_IVFPQ_NPROBE,
        corpus_index=idx,
    )


# ---------------------------------------------------------------------------
# Trained (Lloyd-refined) quantizers — VERDICT r7 #4
#
# The seed quantizers (k lowest ids, zero Lloyd iterations) exist to be
# SQL-reproducible; their recall is the documented cost. This trainer
# closes the gap WITHOUT giving up the oracle: a fixed-iteration Lloyd
# refinement whose every step is engine-exact —
#   * assignment distances are per-term fixed-pointed BIGINTs
#     (floor((x−w)²·10¹⁰) summed — order-free, so a SQL GROUP BY SUM
#     reproduces the Spark fold bit-for-bit), argmin ties to the lower
#     codeword id (integer compare);
#   * codeword means are BIGINT nano-unit sums divided back to double
#     (CAST(Σ round(x·10⁹) AS DOUBLE)/n/10⁹ — identical correctly-
#     rounded doubles on both engines);
#   * the oracle loop-unrolls the iterations as CTE chains, the same
#     trick as the PageRank oracle (operators/graph.py:_pagerank_sql).
# IVF is the m=1 special case of the PQ trainer (one "subquantizer"
# spanning all dims), so one trainer serves both codebooks.
# ---------------------------------------------------------------------------

_TRAIN_ITERS = 2
_TRAIN_FP = 1_000_000_000        # codeword-mean fixed point (nano-units)
_TRAIN_DFP = 10_000_000_000      # per-term assignment-distance fixed point

# Engine-exactness bound (bounded-collect-style contract): the
# nano-unit sum s per (dim, codeword) cell must stay < 2^53. DuckDB
# computes CAST(s AS DOUBLE)/n (s rounded to double FIRST), Python
# computes the correctly-rounded s/n from exact integers — identical
# only while s is exactly representable. With |x| ≲ 0.125 nano-units
# are ≲ 1.25e8 per vector, so the bound trips around ~7e7 vectors in
# ONE cell; train_codebooks_fp asserts and fails loudly instead of
# drifting the oracle (a 100-TB build trains on a sample anyway — see
# train_codebooks_sampled).
_TRAIN_SUM_BOUND = 2**53


def _dist2_fp(sub: F.Column, w: F.Column) -> F.Column:
    """Integer-stable squared L2: each term floored at ``_TRAIN_DFP``
    then summed as BIGINTs — independent of summation order, so the
    oracle's unordered GROUP BY SUM matches this fold exactly."""
    return F.aggregate(
        F.zip_with(
            sub,
            w,
            lambda x, y: F.floor(
                (x - y) * (x - y) * F.lit(float(_TRAIN_DFP))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def _codes_fp_expr(vec_col: str, books_py: list[list[list[float]]]) -> F.Column:
    """Per-subquantizer argmin codeword ids under the INTEGER distance
    (ties to the lower codeword) — the training-time twin of
    :func:`_pq_codes_expr`, generic over (m, dsub) so the IVF (m=1)
    and PQ (m=8) trainers share it."""
    m, dsub = len(books_py), len(books_py[0][0])
    books = _pq_books_lit(books_py)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.element_at(
            F.array_sort(
                F.transform(
                    F.element_at(books, (j + 1).cast("int")),
                    lambda w, ci: F.struct(
                        _dist2_fp(
                            F.slice(v, (j * dsub + 1).cast("int"), dsub), w
                        ).alias("d"),
                        ci.alias("c"),
                    ),
                )
            ),
            1,
        )["c"],
    )


def train_codebooks_fp(
    corpus: DataFrame,
    books: list[list[list[float]]],
    iters: int = _TRAIN_ITERS,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """``iters`` engine-exact Lloyd refinements of ``books`` (shape
    m×k×dsub). Per iteration: one distributed assignment pass (JVM
    expression over the literal current books) and one
    (dim, codeword) fixed-point mean aggregate — the collect is the
    m·k·dsub codeword matrix (≤1 024 doubles here), the centroid-build
    bounded-collect contract. Codewords whose cell goes empty keep
    their previous value (the standard Lloyd empty-cluster rule, and
    the oracle's COALESCE)."""
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    dsub = len(books[0][0])
    # the assignment pass is the compute-heavy projection (m·k fixed-point
    # subdistances per vector); a single-file corpus otherwise plans it as
    # ONE task (round 11: the 2-iteration sf0.1 wall measured 4.1 → 1.8 s
    # with the scan spread over cores). No-op at scale (≥cores splits);
    # integer sums/counts are summation-order-free, so partitioning
    # cannot change the trained books.
    src = ensure_compute_parallelism(corpus.select(F.col(vec_col)))
    for _ in range(iters):
        enc = src.select(
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
            _codes_fp_expr(vec_col, books).alias("__codes"),
        )
        cells = enc.select(
            F.posexplode("__v").alias("dim", "x"), "__codes"
        ).select(
            "dim",
            "x",
            F.element_at(
                "__codes", (F.col("dim") / dsub).cast("int") + 1
            ).alias("cid"),
        )
        rows = (
            cells.groupBy("dim", "cid")
            .agg(
                F.sum(
                    F.round(F.col("x") * F.lit(float(_TRAIN_FP))).cast("long")
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = [[list(w) for w in sub] for sub in books]
        for r in rows:
            if abs(r["s"]) >= _TRAIN_SUM_BOUND:
                raise AssertionError(
                    f"fixed-point mean sum {r['s']} exceeds 2^53 for "
                    f"(dim={r['dim']}, cid={r['cid']}): the DuckDB oracle's "
                    "double division would no longer be bit-exact — train "
                    "on a sample (train_codebooks_sampled) at this scale"
                )
            j, d = r["dim"] // dsub, r["dim"] % dsub
            new[j][r["cid"]][d] = r["s"] / r["n"] / float(_TRAIN_FP)
        books = new
    return books


# Deterministic fixed-hash training sample (VERDICT r8 #3): at 100 TB
# the full-corpus Lloyd pass is 2 complete scans for a ≤1 KiB artifact;
# production trains on a slice. The slice must be ENGINE-EXACT so the
# oracle reproduces it verbatim: h = (id · 2654435761) mod (10⁹+7)
# (odd Knuth multiplier, prime modulus UNRELATED to the multiplier —
# a modulus near the multiplier degenerates to a linear map whose
# residues mod S are constant), keep h % S == 0 — pure BIGINT
# arithmetic on both engines. Bound: id · 2654435761 must stay below
# 2^63 ⇒ id < 3.47e9; fine for any per-shard id space, and the
# multiply fails loudly under ANSI mode if ever exceeded.
_TRAIN_SAMPLE_MOD = 3            # keep ~1/3 of the corpus
_SAMPLE_A = 2654435761
_SAMPLE_P = 1_000_000_007


def corpus_hash_sample(
    corpus: DataFrame, mod: int = _TRAIN_SAMPLE_MOD, id_col: str = "vec_id"
) -> DataFrame:
    h = (F.col(id_col) * F.lit(_SAMPLE_A)) % F.lit(_SAMPLE_P)
    return corpus.filter(h % F.lit(mod) == 0)


def _sample_pred_sql(mod: int = _TRAIN_SAMPLE_MOD, id_col: str = "vec_id") -> str:
    return f"(({id_col} * {_SAMPLE_A}) % {_SAMPLE_P}) % {mod} = 0"


def train_codebooks_sampled(
    corpus: DataFrame,
    iters: int = _TRAIN_ITERS,
    vec_col: str = "embedding",
    mod: int = _TRAIN_SAMPLE_MOD,
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """The DEPLOYMENT path of :func:`train_codebooks_fp`: Lloyd-refine
    on the fixed-hash sample only, so the index build costs ``iters``
    scans of corpus/``mod`` instead of the full corpus (and
    each cell's nano-unit sum shrinks ``mod``× — more headroom under
    the 2^53 engine-exactness bound). Same fixed-point arithmetic; the
    oracle runs the same loop-unrolled CTEs over the sampled slice.
    Recall parity vs full training is pinned in tests/test_similarity.py
    (≥95% of full-train recall@10 at sf0.1)."""
    sample = corpus_hash_sample(corpus, mod, id_col)
    # seeds come from the FULL corpus (one TopK-by-id pass — cheap; the
    # ITERATIONS are what scan twice): sharing the full trainer's seeds
    # keeps both Lloyd runs descending from the same start, which is
    # what makes the recall-parity pin tight (sample-local seeds landed
    # a different local optimum, measured 0.66x full-train recall)
    return train_codebooks_fp(
        sample, pq_seed_codebooks(corpus, id_col, vec_col), iters, vec_col
    )


def _train_oracle_ctes(
    m: int,
    k: int,
    dsub: int,
    iters: int = _TRAIN_ITERS,
    prefix: str = "",
    src: str = "embeddings",
    seed_src: str | None = None,
) -> tuple[str, str]:
    """The trainer loop-unrolled as DuckDB CTEs. Returns (ctes_sql,
    final_books_cte): the final CTE is (j, c, d, w) — subquantizer,
    codeword id, within-subvector dim, trained double value. Every
    arithmetic step mirrors :func:`train_codebooks_fp`'s exactly (see
    the section comment for why each is engine-exact). ``prefix``
    namespaces the CTE names so two trainers (e.g. the IVF-PQ coarse +
    fine quantizers) can share one WITH chain. ``src`` is the training
    relation the ITERATIONS scan (a prior CTE name for SAMPLED
    training); ``seed_src`` (default: src) is where the k seed rows
    come from — the sampled trainer seeds from the FULL corpus."""
    P = prefix
    seed_src = seed_src or src
    dim = m * dsub
    ctes = [
        f"""{P}ex AS (
      SELECT vec_id, (i-1) // {dsub} AS j, (i-1) % {dsub} AS d,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM {src}, unnest(generate_series(1, {dim})) AS t(i)
    )""",
        f"""{P}b0 AS (
      SELECT (i-1) // {dsub} AS j, r.c, (i-1) % {dsub} AS d,
             CAST(embedding[i] AS DOUBLE) AS w
      FROM (SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
            FROM (SELECT * FROM {seed_src} ORDER BY vec_id LIMIT {k})) r,
           unnest(generate_series(1, {dim})) AS t(i)
    )""",
    ]
    for t in range(1, iters + 1):
        prev = f"{P}b{t - 1}"
        ctes.append(
            f"""{P}d{t} AS (
      SELECT e.vec_id, e.j, b.c,
             SUM(CAST(floor((e.x - b.w) * (e.x - b.w) * {float(_TRAIN_DFP)}) AS BIGINT)) AS dfp
      FROM {P}ex e JOIN {prev} b ON b.j = e.j AND b.d = e.d
      GROUP BY e.vec_id, e.j, b.c
    )"""
        )
        ctes.append(
            f"""{P}a{t} AS (
      SELECT vec_id, j, c FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dfp, c) rk
        FROM {P}d{t}) WHERE rk = 1
    )"""
        )
        ctes.append(
            f"""{P}m{t} AS (
      SELECT a.j, a.c, e.d,
             SUM(CAST(round(e.x * {float(_TRAIN_FP)}) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM {P}a{t} a JOIN {P}ex e ON e.vec_id = a.vec_id AND e.j = a.j
      GROUP BY a.j, a.c, e.d
    )"""
        )
        ctes.append(
            f"""{P}b{t} AS (
      SELECT p.j, p.c, p.d,
             COALESCE(CAST(m.s AS DOUBLE) / m.n / {float(_TRAIN_FP)}, p.w) AS w
      FROM {prev} p LEFT JOIN {P}m{t} m ON m.j = p.j AND m.c = p.c AND m.d = p.d
    )"""
        )
    return ",\n    ".join(ctes), f"{P}b{iters}"


_TRAINED_BOOK_CACHE: dict[tuple, list[list[list[float]]]] = {}


def pq_trained_codebooks_cached(
    corpus: DataFrame, corpus_key: str
) -> list[list[list[float]]]:
    # seeds are re-derived (one k-row collect) so the key carries their
    # digest: a corpus_key reused for a different corpus misses instead
    # of returning books trained from the OLD seeds (ADVICE r8)
    seeds = pq_seed_codebooks(corpus)
    key = ("pq", corpus_key, _TRAIN_ITERS, _books_digest(seeds))
    if key not in _TRAINED_BOOK_CACHE:
        _TRAINED_BOOK_CACHE[key] = train_codebooks_fp(corpus, seeds)
    return _TRAINED_BOOK_CACHE[key]


def ivf_trained_centroids_cached(
    corpus: DataFrame, corpus_key: str, k: int = _PQ_K
) -> list[list[float]]:
    """Trained coarse centroids: the m=1 instance of the PQ trainer —
    one 'subquantizer' spanning all dims, seeded like
    :func:`ivf_seed_centroids`. Cache key carries the seed digest, same
    rationale as :func:`pq_trained_codebooks_cached`."""
    seeds = [ivf_seed_centroids(corpus, k=k)]
    key = ("ivf", corpus_key, k, _TRAIN_ITERS, _books_digest(seeds))
    if key not in _TRAINED_BOOK_CACHE:
        _TRAINED_BOOK_CACHE[key] = train_codebooks_fp(corpus, seeds)
    return _TRAINED_BOOK_CACHE[key][0]


def _pq_adc_tail_sql(bfin: str) -> str:
    """The ADC search over FULL embeddings given trained books in CTE
    ``bfin`` — shared by the full-train and sampled-train oracles (the
    search is identical; only where the books came from differs)."""
    return f"""subcw AS (
      SELECT c AS cid, j, list(w ORDER BY d) AS w
      FROM {bfin} GROUP BY j, c
    ),
    codes AS (
      SELECT vec_id, j, cid AS code FROM (
        SELECT e.vec_id, s.j, s.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, s.j
                 ORDER BY {_pq_dist2_sql("e.embedding", "s.w", "s.j")}, s.cid) rn
        FROM embeddings e JOIN subcw s ON TRUE
      ) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id IN {_QUERY_IDS}
    ),
    dtab AS (
      SELECT q.query_id, s.j, s.cid,
             {_pq_dist2_sql("q.qv", "s.w", "s.j")} AS d
      FROM q JOIN subcw s ON TRUE
    ),
    adc AS (
      SELECT d.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(FLOOR(d.d * {_PQ_SCALE}) AS BIGINT)) AS BIGINT) AS adc
      FROM codes c JOIN dtab d ON d.j = c.j AND d.cid = c.code
      WHERE c.vec_id <> d.query_id
      GROUP BY d.query_id, c.vec_id
    )
    SELECT query_id, neighbor_id, rank, adc FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc, neighbor_id) rank
      FROM adc
    ) WHERE rank <= 10"""


def _trained_pq_oracle() -> str:
    ctes, bfin = _train_oracle_ctes(_PQ_M, _PQ_K, _PQ_DSUB)
    return f"""
    WITH {ctes},
    {_pq_adc_tail_sql(bfin)}
    """


def _sampled_pq_oracle() -> str:
    ctes, bfin = _train_oracle_ctes(
        _PQ_M, _PQ_K, _PQ_DSUB, src="smp", seed_src="embeddings"
    )
    return f"""
    WITH smp AS (SELECT * FROM embeddings WHERE {_sample_pred_sql()}),
    {ctes},
    {_pq_adc_tail_sql(bfin)}
    """


def pq_sampled_codebooks_cached(
    corpus: DataFrame, corpus_key: str
) -> list[list[list[float]]]:
    # seeds from the FULL corpus, refinement on the sample — must stay
    # in lockstep with train_codebooks_sampled (the digest keys on the
    # same full-corpus seeds)
    seeds = pq_seed_codebooks(corpus)
    key = (
        "pq-sampled",
        corpus_key,
        _TRAIN_ITERS,
        _TRAIN_SAMPLE_MOD,
        _books_digest(seeds),
    )
    if key not in _TRAINED_BOOK_CACHE:
        _TRAINED_BOOK_CACHE[key] = train_codebooks_sampled(corpus)
    return _TRAINED_BOOK_CACHE[key]


def _pq_sampled_setup(spark: SparkSession, sf_dir: str):
    """Bench split: SAMPLED codebook training — the deployment build
    path, iters scans of ~corpus/3 instead of the full corpus. Fresh
    each run (no cache) so the headline shows the real build cost
    next to q_ann_pq_trained's full-train setup."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (spark, sf_dir, emb, train_codebooks_sampled(emb))


def _pq_sampled_exec(handle) -> DataFrame:
    spark, sf_dir, emb, books = handle
    return ann_pq_topk(emb, _query_vectors(spark, sf_dir), books, k=10)


@register("q_ann_pq_trained_sampled", oracle=_sampled_pq_oracle())
def q_ann_pq_trained_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-10 over codebooks Lloyd-trained on the FIXED-HASH
    sample (~1/3 of the corpus, _TRAIN_SAMPLE_MOD) — the deployment form
    of q_ann_pq_trained: at 100 TB the full-train path burns 2 complete
    corpus scans for a ≤1 KiB artifact (VERDICT r8 #3), the sampled
    path pays 2 scans of a fixed fraction with recall parity pinned in
    pytest (≥95% of full-train recall@10). The search over the FULL
    corpus is unchanged; the oracle re-derives the sampled slice with
    the same BIGINT hash predicate and loop-unrolls the same Lloyd
    CTEs over it."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_sampled_codebooks_cached(emb, sf_dir)
    return ann_pq_topk(emb, _query_vectors(spark, sf_dir), books, k=10)


def _pq_trained_setup(spark: SparkSession, sf_dir: str):
    """Bench split: codebook TRAINING is index-build work a deployment
    runs once per corpus (two distributed passes + two ≤1 KiB collects)
    — measured as setup, fresh each run (no cache), so the headline
    reflects the amortized per-query ADC cost."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_codebooks_fp(emb, pq_seed_codebooks(emb))
    return (spark, sf_dir, emb, books)


def _pq_trained_exec(handle) -> DataFrame:
    spark, sf_dir, emb, books = handle
    return ann_pq_topk(emb, _query_vectors(spark, sf_dir), books, k=10)


@register("q_ann_pq_trained", oracle=_trained_pq_oracle())
def q_ann_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-10 over LLOYD-TRAINED codebooks ({_TRAIN_ITERS}
    engine-exact refinements of the seed books): the production form —
    same 8-byte codes, same integer ADC, better codewords. The oracle
    re-derives the trained books from the table (loop-unrolled Lloyd
    CTEs), re-encodes, and replays the ADC ranking; the recall gain
    over the seed books is pinned in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_trained_codebooks_cached(emb, sf_dir)
    return ann_pq_topk(emb, _query_vectors(spark, sf_dir), books, k=10)


def _trained_ivf_oracle() -> str:
    ctes, bfin = _train_oracle_ctes(1, _PQ_K, _DIM)
    return f"""
    WITH {ctes},
    cents AS (
      SELECT c AS cid, list(w ORDER BY d) AS cw
      FROM {bfin} GROUP BY c
    ),
    dist AS (
      SELECT e.vec_id, c.cid,
             SUM(CAST(floor((CAST(e.embedding[t.i] AS DOUBLE) - c.cw[t.i])
                            * (CAST(e.embedding[t.i] AS DOUBLE) - c.cw[t.i])
                            * {float(_TRAIN_DFP)}) AS BIGINT)) AS dfp
      FROM embeddings e CROSS JOIN cents c,
           unnest(generate_series(1, {_DIM})) AS t(i)
      GROUP BY e.vec_id, c.cid
    )
    SELECT vec_id, CAST(cid AS INT) AS cid FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dfp, cid) rk
      FROM dist
    ) WHERE rk = 1
    """


@register("q_ivf_trained_assignments", oracle=_trained_ivf_oracle())
def q_ivf_trained_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cluster assignments under LLOYD-TRAINED coarse centroids
    (the IVF index a production deployment persists at ingest): each
    vector's integer-stable argmin cell over the {_PQ_K} trained
    centroids. Oracle-certifies the TRAINER itself — the exhaustive-
    probe query certifies the search plan, this row certifies that both
    engines derive the identical trained quantizer; the nprobe recall
    gain over seed centroids is pinned in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_trained_centroids_cached(emb, sf_dir)
    return emb.select(
        "vec_id",
        F.element_at(_codes_fp_expr("embedding", [cents]), 1)
        .cast("int")
        .alias("cid"),
    )


def _scoped_trained_oracle() -> str:
    ctes, fin = _train_oracle_ctes(1, 16, _DIM)
    return f"""
    WITH {ctes},
    cents AS (
      SELECT c AS cid, list(w ORDER BY d) AS cvec FROM {fin} GROUP BY c
    ),
    probes AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn <= 2
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM embeddings a
      JOIN embeddings b ON a.vec_id < b.vec_id
      JOIN probes pa ON pa.vec_id = a.vec_id
      JOIN probes pb ON pb.vec_id = b.vec_id AND pb.cid = pa.cid
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) >= 0.4
    )
    SELECT e.vec_id, (d.vec_id IS NULL) AS keep
    FROM embeddings e LEFT JOIN dropped d ON d.vec_id = e.vec_id
    """


@register("q_dedup_semantic_scoped_trained", oracle=_scoped_trained_oracle())
def q_dedup_semantic_scoped_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the TRAINED coarse quantizer — the production combo
    q_dedup_semantic_scoped's docstring used to call 'not hash-checkable':
    the round-8 fixed-point Lloyd trainer makes the learned clusters
    themselves SQL-derivable, so scoping, assignment, and verdicts under
    the trained quantizer all carry the exact oracle. Same plan as the
    seed form, better clusters."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_trained_centroids_cached(emb, sf_dir)
    return semantic_dedup_scoped(
        emb, "vec_id", "embedding", threshold=0.4, centroids=cents
    )



def _trained_ivfpq_with_chain(nprobe: int = _IVFPQ_NPROBE) -> str:
    """WITH chain deriving trained cents+books, the persisted-index
    shape (assign/codes), the probe set, and the ADC scores — shared by
    the plain trained IVF-PQ oracle and the rerank oracle (which differ
    only in what they do after ``adc``). ``nprobe`` parameterizes the
    probe fan-out: the rerank pipeline runs wider probes than the plain
    ADC form (see _RERANK_NPROBE)."""
    iv_ctes, iv_fin = _train_oracle_ctes(1, _PQ_K, _DIM, prefix="iv_")
    pq_ctes, pq_fin = _train_oracle_ctes(_PQ_M, _PQ_K, _PQ_DSUB, prefix="pq_")
    return f"""
    WITH {iv_ctes},
    {pq_ctes},
    cents AS (
      SELECT c AS cid, list(w ORDER BY d) AS cvec FROM {iv_fin} GROUP BY c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    subcw AS (
      SELECT c AS cid, j, list(w ORDER BY d) AS w FROM {pq_fin} GROUP BY j, c
    ),
    codes AS (
      SELECT vec_id, j, cid AS code FROM (
        SELECT e.vec_id, s.j, s.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, s.j
                 ORDER BY {_pq_dist2_sql("e.embedding", "s.w", "s.j")}, s.cid) rn
        FROM embeddings e JOIN subcw s ON TRUE
      ) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id IN {_QUERY_IDS}
    ),
    qprobes AS (
      SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_dot_product(CAST(q.qv AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM q CROSS JOIN cents c
      ) WHERE rn <= {nprobe}
    ),
    dtab AS (
      SELECT q.query_id, s.j, s.cid,
             {_pq_dist2_sql("q.qv", "s.w", "s.j")} AS d
      FROM q JOIN subcw s ON TRUE
    ),
    adc AS (
      SELECT d.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(FLOOR(d.d * {_PQ_SCALE}) AS BIGINT)) AS BIGINT) AS adc
      FROM assign a
      JOIN qprobes p ON p.cid = a.cid
      JOIN codes c ON c.vec_id = a.vec_id
      JOIN dtab d ON d.query_id = p.query_id
                 AND d.j = c.j AND d.cid = c.code
      WHERE a.vec_id <> p.query_id
      GROUP BY d.query_id, c.vec_id
    )"""


def _trained_ivfpq_oracle() -> str:
    return f"""{_trained_ivfpq_with_chain()}
    SELECT query_id, neighbor_id, rank, adc FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc, neighbor_id) rank
      FROM adc
    ) WHERE rank <= 10
    """


# Round-10 knee (VERDICT r9 #6): the r9 pipeline ran nprobe=4, R=50 at
# recall@10 0.74–0.80. The sweep over nprobe {{4,8,16}} × R {{50..400}}
# (SCALING.md) showed the dominant lever is SHORTLIST DEPTH, not probe
# count — the 8-byte ADC is a weak ranker, so at fixed R=50 widening
# probes POLLUTES the shortlist and recall drops (0.80→0.74 at sf0.01);
# deepening R lets the exact rerank recover what ADC misranks. Knee:
# nprobe=8, R=400 → recall@10 0.90 (sf0.01) / 0.94 (sf0.1), floor ≥0.85
# pinned in pytest. Cost at scale: probes scan nprobe/k of the encoded
# corpus (2× the r9 ADC pass); the rerank stays |queries|·R broadcast
# rows — still fixed per query, still map-side.
_RERANK_SHORTLIST = 400
_RERANK_NPROBE = 8


def _ivfpq_rerank_oracle() -> str:
    return f"""{_trained_ivfpq_with_chain(_RERANK_NPROBE)},
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc, neighbor_id) rk
        FROM adc
      ) WHERE rk <= {_RERANK_SHORTLIST}
    ),
    rr AS (
      SELECT s.query_id, s.neighbor_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[])) AS score
      FROM short s
      JOIN embeddings e ON e.vec_id = s.neighbor_id
      JOIN q ON q.query_id = s.query_id
    )
    SELECT query_id, neighbor_id, rank, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) rank
      FROM rr
    ) WHERE rank <= 10
    """


@register("q_ann_ivfpq_trained", oracle=_trained_ivfpq_oracle())
def q_ann_ivfpq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ over the fully TRAINED index — Lloyd-refined coarse
    centroids (m=1 trainer) scoping the probes, Lloyd-refined PQ
    codebooks ranking by integer ADC inside the probed inverted lists.
    Completes the trained index menu: both trainers share one oracle
    WITH chain (prefixed CTE namespaces), so the production composition
    is hash-certified end-to-end like its seed-quantizer twin."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_trained_centroids_cached(emb, sf_dir)
    books = pq_trained_codebooks_cached(emb, sf_dir)
    idx = ivfpq_index_cached(emb, sf_dir, cents, books, tag="trained")
    return ann_ivfpq_topk(
        emb,
        _query_vectors(spark, sf_dir),
        cents,
        books,
        k=10,
        nprobe=_IVFPQ_NPROBE,
        corpus_index=idx,
    )


def _ivfpq_recall_audit_oracle() -> str:
    """The rerank chain + the exact brute-force chain + the audit join,
    all in one WITH chain — the oracle replays the full index-quality
    measurement."""
    return f"""{_trained_ivfpq_with_chain(_RERANK_NPROBE)},
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc, neighbor_id) rk
        FROM adc
      ) WHERE rk <= {_RERANK_SHORTLIST}
    ),
    rr AS (
      SELECT s.query_id, s.neighbor_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qv AS DOUBLE[])) AS score
      FROM short s
      JOIN embeddings e ON e.vec_id = s.neighbor_id
      JOIN q ON q.query_id = s.query_id
    ),
    approx AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) rank
        FROM rr
      ) WHERE rank <= 10
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(q.qv AS DOUBLE[])) DESC,
                          e.vec_id) rk
        FROM embeddings e, q WHERE e.vec_id <> q.query_id
      ) WHERE rk <= 10
    ),
    hits AS (
      SELECT a.query_id, a.rank
      FROM approx a JOIN exact x
        ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
    )
    SELECT q.query_id,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(h.n, 0) AS DOUBLE) / 10 AS recall_at_10,
           COALESCE(1.0 / h.first_rank, 0.0) AS mrr
    FROM q
    LEFT JOIN (
      SELECT query_id, COUNT(*) AS n, MIN(rank) AS first_rank
      FROM hits GROUP BY query_id
    ) h ON h.query_id = q.query_id
    """


def ann_recall_audit(
    approx: DataFrame,
    exact: DataFrame,
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, n_hits, recall_at_<k>, mrr) — the index-quality audit
    a deployment runs after every index build: ``approx`` and ``exact``
    are (query_id, neighbor_id, rank) top-k frames; recall is overlap/k,
    MRR is 1/rank of the first approx result that is exact-relevant
    (0 when none). The recall column is named after the actual ``k``
    (ADVICE r9 — a k≠10 caller used to get a mislabeled recall_at_10).
    All frames here are |queries|·k rows — driver-free, broadcast-size,
    exact on both engines (small-integer division)."""
    hits = approx.join(
        exact.select(query_id_col, "neighbor_id"),
        [query_id_col, "neighbor_id"],
    )
    per_q = hits.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("rank").alias("__first"),
    )
    return (
        queries.select(query_id_col)
        .join(per_q, query_id_col, "left")
        .select(
            query_id_col,
            F.coalesce("__n", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("__n", F.lit(0)).cast("double") / k).alias(
                f"recall_at_{k}"
            ),
            F.coalesce(
                F.lit(1.0) / F.col("__first"), F.lit(0.0)
            ).alias("mrr"),
        )
    )


@register("q_ann_recall_audit", oracle=_ivfpq_recall_audit_oracle())
def q_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality audit of the production retrieval composition:
    recall@10 and MRR of the trained IVF-PQ shortlist+rerank pipeline
    against exact brute force, per query — the measurement a deployment
    gates every index rebuild on. Both the approximate chain (trained
    quantizers → persisted index → ADC top-50 → exact rerank) and the
    exact baseline are deterministic, so the AUDIT itself carries an
    exact oracle — the recall numbers pytest pins are now also
    hash-certified."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vectors(spark, sf_dir)
    cents = ivf_trained_centroids_cached(emb, sf_dir)
    books = pq_trained_codebooks_cached(emb, sf_dir)
    idx = ivfpq_index_cached(emb, sf_dir, cents, books, tag="trained")
    approx = ann_ivfpq_rerank(
        emb, q, cents, books, k=10, shortlist=_RERANK_SHORTLIST,
        nprobe=_RERANK_NPROBE, corpus_index=idx,
    )
    exact = brute_force_topk(emb, q, k=10)
    return ann_recall_audit(approx, exact, q, k=10)


@register("q_ann_ivfpq_rerank", oracle=_ivfpq_rerank_oracle())
def q_ann_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained IVF-PQ shortlist (ADC top-R) → exact-cosine rerank →
    top-10: the production retrieval composition (VERDICT r8 #4). The
    compressed-domain ADC is only a preranker; reranking its top-R with
    exact distances recovers the recall the 8-byte codes gave up.
    Round 10 moved the operating point to the measured knee — nprobe=8,
    R=400 (see the _RERANK_SHORTLIST comment: shortlist depth, not
    probe count, is the dominant recall lever) — recall@10 0.90/0.94 at
    sf0.01/sf0.1, floor ≥0.85 pinned in pytest (raw ADC@10 is ~0.3).
    The shortlist broadcasts back against the corpus scan, so the
    vector fetch is map-side; the oracle replays the whole chain —
    trained quantizers, persisted-index shape, ADC shortlist, exact
    rerank — as one WITH chain."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_trained_centroids_cached(emb, sf_dir)
    books = pq_trained_codebooks_cached(emb, sf_dir)
    idx = ivfpq_index_cached(emb, sf_dir, cents, books, tag="trained")
    return ann_ivfpq_rerank(
        emb,
        _query_vectors(spark, sf_dir),
        cents,
        books,
        k=10,
        shortlist=_RERANK_SHORTLIST,
        nprobe=_RERANK_NPROBE,
        corpus_index=idx,
    )


# ---------------------------------------------------------------------------
# Vector quantization (int8 per-dimension scaling)
# ---------------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-dimension int8 quantization: codes = floor((x - min_d) · 255 /
    (max_d - min_d)), clamped to [0, 255], with (min_d, max_d) computed
    per dimension over the corpus — the storage-compression step an
    embedding store runs before ANN serving (4× smaller than float32).

    Plan: posexplode (narrow) → per-dimension MIN/MAX (64 groups, partial
    aggs combine map-side) → broadcast the 64-row stats → per-vector code
    aggregation (one shuffle on vec_id). Float min/max are EXACT (no
    accumulation), and the code expression is the same IEEE op sequence
    on both engines, so codes are bit-identical cross-engine.
    """
    ex = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    stats = ex.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    coded = ex.join(F.broadcast(stats), "pos").withColumn(
        "code",
        # constant dimensions (mn == mx) would divide by zero — an ANSI
        # error on Spark 4; code them as 0 explicitly (same CASE in the
        # oracle so both engines stay expression-identical)
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint")).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("x") - F.col("mn")) * 255 / (F.col("mx") - F.col("mn"))
                    ),
                ),
            )
        ),
    )
    return coded.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.sum("code").alias("sum_codes"),
        F.min("code").alias("min_code"),
        F.max("code").alias("max_code"),
    )


@register(
    "q_embedding_quantize",
    oracle="""
    WITH ex AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    stats AS (
      SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY pos
    ),
    coded AS (
      SELECT vec_id,
             CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
                  ELSE least(255, greatest(0, CAST(floor((x - mn) * 255 / (mx - mn)) AS BIGINT)))
             END AS code
      FROM ex JOIN stats USING (pos)
    )
    SELECT vec_id, COUNT(*) AS n_dims, CAST(SUM(code) AS BIGINT) AS sum_codes,
           MIN(code) AS min_code, MAX(code) AS max_code
    FROM coded GROUP BY vec_id
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization codes per vector (count/sum/min/max summary)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_embeddings(emb)


# ---------------------------------------------------------------------------
# Binary sign-bit signatures + Hamming ANN (completes the index menu:
# LSH / IVF / PQ / IVF-PQ / binary)
# ---------------------------------------------------------------------------

_BIN_WORDS = 2                    # 64 sign bits packed as 2×32-bit words
_BIN_WBITS = _DIM // _BIN_WORDS   # bits per word (kept < 63: no sign-bit
#                                   overflow in either engine's BIGINT)
_BIN_RERANK = 50                  # Hamming candidate pool per query


def sign_signature(vec_col: str = "embedding") -> F.Column:
    """The vector's 64 sign bits packed as ``array<bigint>`` of
    ``_BIN_WORDS`` words (binary quantization — the 1-bit analogue of
    :func:`quantize_embeddings`; 16 B/vector vs 256 for raw float32).

    Word w = Σ_{i<32} (v[w·32+i] ≥ 0) · 2^i, built as a pure-integer
    ``acc·2 + bit`` fold over the REVERSED subslice — no shifts, no
    doubles, so DuckDB's ``list_reduce`` reproduces every word exactly.
    """
    v = F.col(vec_col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(_BIN_WORDS - 1)),
        lambda w: F.aggregate(
            F.reverse(F.slice(v, (w * _BIN_WBITS + 1).cast("int"), _BIN_WBITS)),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2
            + F.when(x >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
    )


def _hamming(a: F.Column, b: F.Column) -> F.Column:
    """Hamming distance between two packed signatures: per-word
    xor + popcount, summed as an integer fold (order-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = _BIN_RERANK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Binary-signature ANN: per query, the ``rerank`` Hamming-nearest
    sign signatures are the candidate pool; exact cosine re-ranks the
    pool to top-k. Both stages are fully deterministic (integer Hamming,
    ties to the lower id; then the sequential-fold cosine, ties to the
    lower id), so the whole operator carries an exact DuckDB oracle.

    Scale: the signature is a 16-byte narrow projection computed in one
    codegen pass and persisted at ingest in production (the same
    index contract as the banded-LSH and PQ families). The query side is
    broadcast; Hamming is integer xor+popcount inside whole-stage
    codegen; the per-query candidate window exchanges only the pruned
    top-``rerank`` rows per partition (WindowGroupLimit), which carry
    their vectors so the exact rerank never re-joins the corpus — the
    round-6 inline-verify lesson (similarity.py:_lsh_verified_pairs).
    """
    # signature + per-candidate Hamming/cosine is the corpus-side CPU;
    # a single-file corpus plans it as ONE task (round 11: 5 single-task
    # stages measured) — round-robin the slim projection, no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    c = ensure_compute_parallelism(
        corpus.select(F.col(id_col), F.col(vec_col))
    ).select(
        F.col(id_col),
        F.col(vec_col),
        sign_signature(vec_col).alias("__sig"),
        l2_norm(vec_col).alias("__cn"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        sign_signature(query_vec_col).alias("__qsig"),
        l2_norm(query_vec_col).alias("__qn"),
    )
    cand = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            _hamming(F.col("__sig"), F.col("__qsig")).alias("hamming"),
            vec_col,
            query_vec_col,
            "__cn",
            "__qn",
        )
    )
    wh = Window.partitionBy(query_id_col).orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    # exact cosine only AFTER the Hamming pool filter — the pre-filter
    # projection is integer-only, and the pooled rows carry their vectors
    # through the (WindowGroupLimit-pruned) exchange
    pool = (
        cand.withColumn("hrank", F.row_number().over(wh))
        .filter(F.col("hrank") <= rerank)
        .select(
            F.col(query_id_col),
            "neighbor_id",
            "hamming",
            (
                dot(vec_col, query_vec_col)
                / (F.col("__cn") * F.col("__qn"))
            ).alias("score"),
        )
    )
    wr = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        pool.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "hamming", "score")
    )


# One word of the packed signature, as the same integer fold in DuckDB.
_SIG_WORD_SQL = (
    "list_reduce(list_reverse(list_transform("
    "{arr}[{lo}:{hi}], x -> CASE WHEN CAST(x AS DOUBLE) >= 0 "
    "THEN 1::BIGINT ELSE 0::BIGINT END)), (acc, b) -> acc * 2 + b)"
)


def _sig_words_sql(arr: str) -> str:
    """``[word0, word1]`` — the oracle spelling of :func:`sign_signature`."""
    words = [
        _SIG_WORD_SQL.format(
            arr=arr, lo=w * _BIN_WBITS + 1, hi=(w + 1) * _BIN_WBITS
        )
        for w in range(_BIN_WORDS)
    ]
    return "[" + ", ".join(words) + "]"


@register(
    "q_ann_hamming_topk",
    oracle=f"""
    WITH c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_sig_words_sql('embedding')} AS sig
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv, sig AS qsig
      FROM c WHERE vec_id IN {_QUERY_IDS}
    ),
    cand AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             bit_count(xor(c.sig[1], q.qsig[1]))
               + bit_count(xor(c.sig[2], q.qsig[2])) AS hamming,
             list_cosine_similarity(c.v, q.qv) AS score
      FROM c, q WHERE c.vec_id <> q.query_id
    ),
    pool AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming, neighbor_id) hrank
        FROM cand
      ) WHERE hrank <= {_BIN_RERANK}
    )
    SELECT query_id, neighbor_id, rank, hamming, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) rank
      FROM pool
    ) WHERE rank <= 10
    """,
)
def q_ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN: top-10 by exact cosine over each query's 50
    Hamming-nearest sign signatures (5 fixed queries, the ANN-family
    fixture)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_hamming_topk(emb, _query_vectors(spark, sf_dir), k=10)


# ---------------------------------------------------------------------------
# Embedding outlier screening (robust per-dimension modified z-score)
# ---------------------------------------------------------------------------

_OUTLIER_Z = 3.5  # Iglewicz–Hoaglin's recommended modified-z cutoff


def embedding_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cutoff: float = _OUTLIER_Z,
) -> DataFrame:
    """(vec_id, max_mod_z, is_outlier): per-dimension MODIFIED z-scores
    (Iglewicz & Hoaglin 1993 — 0.6745·|x−median|/MAD, robust to the very
    outliers being hunted), maxed over dimensions per vector. The
    embedding-quality screen a curation pipeline runs before kNN/dedup:
    a corrupted vector (NaN-ish spikes, wrong scale) shows up as a huge
    deviation in SOME dimension.

    Determinism (the reason this uses medians, not mean/std): the
    location/scale estimates are ORDER STATISTICS — lower-median picked
    by rank over (value, id), so every estimate is an actual element,
    no float accumulation anywhere; the only arithmetic is one
    subtraction/division per element and an order-free MAX. A mean/std
    screen would need float power sums whose decimal-cast rounding is
    not engine-exact on arbitrary floats.

    Scale: two rank windows per dimension slot over the exploded
    (pos, x) rows — shuffle ∝ corpus cells on the 64-partition pos key,
    the quantize_embeddings shape; the per-dim (median, MAD) frame is
    64 rows, broadcast back.
    """
    # the exploded-cell projection feeds FOUR plan branches (median,
    # dev, MAD, MeanAD) and each recompute ran on the single scan split
    # (round 11: 9 single-task stages measured); round-robin the slim
    # (id, vec) projection — no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    ex = ensure_compute_parallelism(
        emb.select(F.col(id_col), F.col(vec_col))
    ).select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    n_w = Window.partitionBy("pos")
    rk_w = Window.partitionBy("pos").orderBy("x", id_col)
    med = (
        ex.withColumn("__n", F.count(F.lit(1)).over(n_w))
        .withColumn("__rk", F.row_number().over(rk_w))
        .filter(F.col("__rk") == F.expr("(__n + 1) DIV 2"))
        .select("pos", F.col("x").alias("med"))
    )
    dev = ex.join(F.broadcast(med), "pos").withColumn(
        "__d", F.abs(F.col("x") - F.col("med"))
    )
    mad_rk = Window.partitionBy("pos").orderBy("__d", id_col)
    mad = (
        dev.withColumn("__n", F.count(F.lit(1)).over(n_w))
        .withColumn("__rk", F.row_number().over(mad_rk))
        .filter(F.col("__rk") == F.expr("(__n + 1) DIV 2"))
        .select("pos", F.col("__d").alias("mad"))
    )
    # MAD == 0 fallback (ADVICE r7 #4): when more than half the corpus
    # shares one value in a dimension, MAD collapses to 0 and a genuine
    # spike there would be masked. Standard Iglewicz–Hoaglin falls back
    # to the MeanAD: z = 0.7979·|x−med|/MeanAD. A float mean is
    # order-dependent, so for engine-exact parity the MeanAD is carried
    # as an integer nano-unit sum (round(d·1e9) per element, BIGINT
    # sum — order-free and bit-identical across engines); the ~1e-9
    # quantization is far below any screening threshold.
    meanad = dev.groupBy("pos").agg(
        F.sum(F.round(F.col("__d") * F.lit(1e9)).cast("bigint")).alias("__sm"),
        F.count(F.lit(1)).alias("__nn"),
    )
    scored = (
        dev.join(F.broadcast(mad), "pos")
        .join(F.broadcast(meanad), "pos")
        .select(
            F.col(id_col),
            F.when(
                (F.col("mad") == 0.0) & (F.col("__sm") > 0),
                F.lit(0.7979) * F.col("__d") * F.col("__nn") * F.lit(1e9)
                / F.col("__sm"),
            )
            .when(F.col("mad") == 0.0, F.lit(0.0))
            .otherwise(F.lit(0.6745) * F.col("__d") / F.col("mad"))
            .alias("__z"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.max("__z").alias("max_mod_z"),
    ).select(
        id_col,
        "max_mod_z",
        (F.col("max_mod_z") > F.lit(cutoff)).alias("is_outlier"),
    )


@register(
    "q_embedding_outliers",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    ranked AS (
      SELECT *, COUNT(*) OVER (PARTITION BY pos) AS n,
             ROW_NUMBER() OVER (PARTITION BY pos ORDER BY x, vec_id) AS rk
      FROM ex
    ),
    med AS (
      SELECT pos, x AS med FROM ranked WHERE rk = (n + 1) // 2
    ),
    dev AS (
      SELECT e.vec_id, e.pos, abs(e.x - m.med) AS d
      FROM ex e JOIN med m USING (pos)
    ),
    dranked AS (
      SELECT *, COUNT(*) OVER (PARTITION BY pos) AS n,
             ROW_NUMBER() OVER (PARTITION BY pos ORDER BY d, vec_id) AS rk
      FROM dev
    ),
    mad AS (
      SELECT pos, d AS mad FROM dranked WHERE rk = (n + 1) // 2
    ),
    meanad AS (
      SELECT pos, SUM(CAST(round(d * 1e9) AS BIGINT)) AS sm, COUNT(*) AS nn
      FROM dev GROUP BY pos
    ),
    scored AS (
      SELECT v.vec_id,
             CASE WHEN m.mad = 0.0 AND a.sm > 0
                  THEN 0.7979 * v.d * a.nn * 1e9 / a.sm
                  WHEN m.mad = 0.0 THEN 0.0
                  ELSE 0.6745 * v.d / m.mad END AS z
      FROM dev v JOIN mad m USING (pos) JOIN meanad a USING (pos)
    )
    SELECT vec_id, MAX(z) AS max_mod_z,
           MAX(z) > {_OUTLIER_Z} AS is_outlier
    FROM scored GROUP BY vec_id
    """,
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust embedding-quality screen: max per-dimension modified
    z-score (median/MAD order statistics — see embedding_outliers)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_outliers(emb)


# ---------------------------------------------------------------------------
# Embedding-space benchmark decontamination (round 9)
# ---------------------------------------------------------------------------

_SEMDECON_MOD = 20      # vec_id % 20 == 0 plays the benchmark/eval set
_SEMDECON_TAU = 0.4     # flag threshold (matches the SemDeDup family)


@register(
    "q_decontaminate_semantic",
    oracle=f"""
    WITH bench AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % {_SEMDECON_MOD} = 0
    ),
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % {_SEMDECON_MOD} <> 0
    ),
    sims AS (
      SELECT c.vec_id, MAX(list_cosine_similarity(c.v, b.v)) AS max_sim
      FROM corpus c CROSS JOIN bench b
      GROUP BY c.vec_id
    )
    SELECT vec_id, max_sim, max_sim >= {_SEMDECON_TAU} AS contaminated
    FROM sims
    """,
)
def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-space benchmark decontamination — the semantic twin of
    the n-gram q_decontaminate: every training vector's max cosine to
    the (broadcast) eval/benchmark set, flagged at τ=0.4. Catches
    paraphrased eval leakage the token-overlap screens can't see; the
    exact-cosine form here is the certified baseline (dot / norms — the
    brute-force spelling, hash-identical to list_cosine_similarity),
    and at 100 TB the scale path is the banded-LSH / cluster-scoped
    candidate machinery already certified for SemDeDup
    (q_dedup_semantic_incremental with the eval set as the batch) — the
    eval side is tiny either way, so the join is one map-side stage
    over the corpus scan."""
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % _SEMDECON_MOD == 0).select(
        F.col("vec_id").alias("__bid"),
        F.col("embedding").alias("__bv"),
        l2_norm("embedding").alias("__bn"),
    )
    # |corpus|·|bench| cosines against the broadcast eval set ran as ONE
    # task off the single-file scan (round 11); round-robin no-op at
    # scale, MAX per vec_id order-independent
    corpus = ensure_compute_parallelism(
        emb.filter(F.col("vec_id") % _SEMDECON_MOD != 0).select(
            "vec_id", "embedding"
        )
    ).select("vec_id", "embedding", l2_norm("embedding").alias("__cn"))
    sims = (
        corpus.crossJoin(F.broadcast(bench))
        .select(
            "vec_id",
            (
                dot("embedding", "__bv") / (F.col("__cn") * F.col("__bn"))
            ).alias("__sim"),
        )
        .groupBy("vec_id")
        .agg(F.max("__sim").alias("max_sim"))
    )
    return sims.select(
        "vec_id",
        "max_sim",
        (F.col("max_sim") >= F.lit(_SEMDECON_TAU)).alias("contaminated"),
    )


def decontaminate_semantic_scoped(
    corpus: DataFrame,
    evalset: DataFrame,
    centroids: list[list[float]],
    threshold: float = _SEMDECON_TAU,
    nprobe: int = 8,
    corpus_nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The 100 TB decontamination path (VERDICT r9 #2): instead of
    dense cosines against every eval vector, each corpus vector is
    scored only against eval vectors sharing a probed coarse-quantizer
    cluster — the SemDeDup scoping machinery with the eval set as the
    probe side.

    Plan shape: the corpus side carries its ``corpus_nprobe`` nearest
    cluster ids (at ingest these are stored columns — the
    scoped_signature_index contract, which also probes 2); the eval
    side explodes its ``nprobe`` nearest clusters and BROADCASTS (eval
    sets are small by definition); candidates join map-side on cid; MAX
    cosine per corpus vector is idempotent, so a pair sharing several
    probed clusters needs no distinct. Corpus-side cost is the
    assignment scan, not |corpus|·|eval| cosines; shuffle is the
    per-vector max rows.

    Probe fan-outs are the ROUND-10 MEASURED KNEE (tests pin it): at
    τ=0.4 the flagged pairs are only WEAKLY similar, so — unlike the
    high-similarity SemDeDup regime — they often straddle clusters, and
    the (1 corpus × 2 eval) first cut recalled just 0.40 of the
    brute-force flags at sf0.1. The sweep over corpus×eval fan-outs:
    (1×2)=0.40, (2×2)=0.54, (2×4)=0.73, (2×8)=0.95, (4×4)=0.93,
    (4×8)=1.00.

    THE HONEST COST MODEL (measured round 10, k-dial MEASURED round 11
    — this operator is a recall/cost DIAL, not a free win): candidate
    volume ≈ pair-coverage ρ = 1 − (1 − corpus_nprobe/k)^nprobe of the
    dense |corpus|·|eval| cosines, and the measured candidate counts
    track the formula (sf0.1, seed quantizers, measured ρ vs predicted:
    0.76/0.66 at k=16 (2×8); 0.23/0.22, 0.43/0.40, 0.74/0.64 at k=64
    (2×8)/(2×16)/(2×32) — slightly above prediction from non-uniform
    cluster population).

    ROUND-10's k∝corpus SCALING ARGUMENT, MEASURED AND REFUTED at this
    scale (VERDICT r10 #3): the model promised ρ ≈ 0.22 at k=64 under
    fixed (2×8) fan-outs — and candidates indeed fall to 0.23 — but
    RECALL COLLAPSES WITH THEM (0.92 → 0.61 at sf0.1): at τ=0.4 recall
    tracks pair COVERAGE ρ, not cluster granularity. Re-kneeing k=64
    for recall (the measured sf0.1 dial: (2×16) ρ=0.43 recall 0.82;
    (2×24) ρ≈0.59 recall ~0.95; (2×32) ρ=0.74 recall 0.99) lands the
    equal-recall cost roughly back where k=16 sits (recall≈0.92 costs
    ρ≈0.76 at k=16 and ρ≈0.55-0.6 at k=64; recall≈0.99 costs ρ≈0.96 at
    k=16 (4×8) and ρ≈0.74 at k=64 (2×32)) — growing k 4× buys ~20-25%
    at matched recall, NOT the 3× the naive formula promised. Low-τ
    screening is intrinsically hard to scope: weakly similar vectors
    co-cluster weakly, so the pair space must be covered almost
    regardless of how finely it is partitioned. Whether tighter
    clusters at truly large corpora bend this curve is explicitly
    unmeasured beyond this scale. k=64 re-kneed floor (2×32, recall ≥
    0.85 at the sf0.01 oracle gate) pinned in tests/test_similarity.py.
    For a SMALL eval set the dense broadcast baseline is already cheap
    and simpler — that is what q_stream_decontaminate ships per ingest
    batch.

    Output: EVERY corpus vector — (vec_id, max_sim, contaminated), with
    NULL max_sim / false for vectors no eval probe reaches. Scoped
    max_sim ≤ the brute-force max (candidates are a subset), so flagged
    rows are a subset of q_decontaminate_semantic's; the recall of that
    subset is pinned in tests/test_similarity.py."""
    # the per-vector assignment (k centroid dots) + per-candidate cosine
    # verify is the corpus-side CPU, and a single-file corpus plans it as
    # ONE task (round 11: 7 single-task stages, 2.1 s exec); round-robin
    # on the slim (id, vec) projection — no-op at scale, and MAX cosine
    # per vec_id is order-independent so results are unchanged
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    c = ensure_compute_parallelism(
        corpus.select(F.col(id_col), F.col(vec_col))
    ).select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(vec_col).alias("__cn"),
        F.explode(
            _nearest_clusters(vec_col, centroids, corpus_nprobe)
        ).alias("__cid"),
    )
    probes = evalset.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bv"),
        l2_norm(vec_col).alias("__bn"),
        F.explode(_nearest_clusters(vec_col, centroids, nprobe)).alias(
            "__cid"
        ),
    )
    sims = (
        c.join(F.broadcast(probes), "__cid")
        .select(
            F.col(id_col),
            (dot(vec_col, "__bv") / (F.col("__cn") * F.col("__bn"))).alias(
                "__sim"
            ),
        )
        .groupBy(id_col)
        .agg(F.max("__sim").alias("max_sim"))
    )
    return (
        corpus.select(id_col)
        .join(sims, id_col, "left")
        .select(
            id_col,
            "max_sim",
            F.coalesce(
                F.col("max_sim") >= F.lit(threshold), F.lit(False)
            ).alias("contaminated"),
        )
    )


def _semdecon_scoped_oracle() -> str:
    ctes, fin = _train_oracle_ctes(1, _PQ_K, _DIM)
    return f"""
    WITH {ctes},
    cents AS (
      SELECT c AS cid, list(w ORDER BY d) AS cvec FROM {fin} GROUP BY c
    ),
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % {_SEMDECON_MOD} <> 0
    ),
    bench AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % {_SEMDECON_MOD} = 0
    ),
    cassign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.cvec) DESC, c.cid DESC) rn
        FROM corpus e CROSS JOIN cents c
      ) WHERE rn <= 2
    ),
    bprobes AS (
      SELECT vec_id, cid FROM (
        SELECT b.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY list_dot_product(b.v, c.cvec) DESC, c.cid DESC) rn
        FROM bench b CROSS JOIN cents c
      ) WHERE rn <= 8
    ),
    sims AS (
      SELECT c.vec_id, MAX(list_cosine_similarity(c.v, b.v)) AS max_sim
      FROM corpus c
      JOIN cassign a ON a.vec_id = c.vec_id
      JOIN bprobes p ON p.cid = a.cid
      JOIN bench b ON b.vec_id = p.vec_id
      GROUP BY c.vec_id
    )
    SELECT c.vec_id, s.max_sim,
           COALESCE(s.max_sim >= {_SEMDECON_TAU}, FALSE) AS contaminated
    FROM corpus c LEFT JOIN sims s ON s.vec_id = c.vec_id
    """


@register("q_decontaminate_semantic_scoped", oracle=_semdecon_scoped_oracle())
def q_decontaminate_semantic_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding decontamination through the TRAINED coarse quantizer's
    scoped candidates (VERDICT r9 #2 — the deployment form whose
    corpus-side cost is the index/assignment scan, not dense cosines
    against the eval set): eval vectors probe their 8 nearest trained
    clusters and broadcast; corpus vectors carry their 2 stored cluster
    ids and are scored only against probes landing in one of them —
    the measured (2×8) probe knee (see decontaminate_semantic_scoped:
    low-τ pairs straddle clusters, so fan-out is the recall lever;
    0.40 → 0.95 recall at sf0.1 vs the 1×2 first cut). Same (vec_id,
    max_sim, contaminated) contract as q_decontaminate_semantic with
    NULL/false where no probe reaches; flagged rows are a provable
    subset of the brute-force flags, recall pinned in pytest. The
    oracle re-derives the trained centroids (loop-unrolled Lloyd CTEs)
    and replays assignment, probes, and scoped max-cosine exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_trained_centroids_cached(emb, sf_dir)
    return decontaminate_semantic_scoped(
        emb.filter(F.col("vec_id") % _SEMDECON_MOD != 0),
        emb.filter(F.col("vec_id") % _SEMDECON_MOD == 0),
        cents,
    )


# ---------------------------------------------------------------------------
# Incremental IVF-PQ index maintenance (round 10, VERDICT r9 #7)
# ---------------------------------------------------------------------------

_INC_INDEX_CACHE: dict[tuple, str] = {}  # cache key -> index parquet path


def ivfpq_encode(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The narrow (id, cid, codes) index projection — what an ingest
    persists next to the embeddings. One codegen pass, no shuffle."""
    return df.select(
        F.col(id_col),
        F.element_at(_nearest_clusters(vec_col, centroids, 1), 1)
        .cast("int")
        .alias("cid"),
        _pq_codes_expr(vec_col, codebooks).alias("codes"),
    )


def ivfpq_index_with_ingest(
    corpus: DataFrame,
    batch: DataFrame,
    corpus_key: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    n_ingests: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """Incremental index maintenance (VERDICT r9 #7): the corpus index
    is encoded and persisted ONCE; an arriving batch is encoded under
    the FROZEN quantizer generation and APPENDED to the same index
    parquet — the ingest never re-encodes the corpus (the
    chunk-fingerprint-index pattern, operators/text.py). Append is
    sound because the index row is a pure per-vector projection under a
    fixed quantizer: encode(corpus ∪ batch) ≡ encode(corpus) ∪
    encode(batch), which q_ann_index_incremental's oracle certifies by
    rebuilding from scratch. Cache key carries the quantizer digest —
    a new generation misses and re-ingests (the _books_digest rule).
    ``n_ingests`` splits the batch into that many sequential appends
    (disjoint id slices) — the multi-ingest file history the compaction
    maintenance pass (ivfpq_index_compact) exists to clean up. The
    cache key carries content signatures of BOTH frames (ADVICE r10): a
    changed batch under a reused corpus_key with unchanged quantizers
    must miss, not serve the stale appended index."""
    return corpus.sparkSession.read.parquet(
        ivfpq_index_ingest_path(
            corpus, batch, corpus_key, centroids, codebooks, n_ingests, id_col
        )
    )


def ivfpq_index_ingest_path(
    corpus: DataFrame,
    batch: DataFrame,
    corpus_key: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    n_ingests: int = 1,
    id_col: str = "vec_id",
) -> str:
    """Path-returning core of :func:`ivfpq_index_with_ingest` — the
    retraction and rotation lifecycle passes need the index's physical
    location, not just a frame over it."""
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        df_content_key,
    )

    key = (
        "ivfpq-ingest",
        corpus_key,
        df_content_key(corpus),
        df_content_key(batch),
        n_ingests,
        _books_digest(centroids, codebooks),
    )
    if key not in _INC_INDEX_CACHE:
        from iceberg_matrix_spark.storage import state_dir  # noqa: PLC0415

        path = state_dir("ivfpq-inc-index-") + "/index.parquet"
        ivfpq_encode(corpus, centroids, codebooks).write.parquet(path)
        # the per-ingest step: batch-only encode, parquet append — one
        # append per arriving slice. Hash-mod slicing (not id % k) so
        # the slices PARTITION any batch id distribution — an id-range
        # assumption here would silently drop rows from the index.
        for i in range(n_ingests):
            slice_i = (
                batch.filter(
                    F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_ingests))
                    == F.lit(i)
                )
                if n_ingests > 1
                else batch
            )
            ivfpq_encode(slice_i, centroids, codebooks).write.mode(
                "append"
            ).parquet(path)
        _INC_INDEX_CACHE[key] = path
    return _INC_INDEX_CACHE[key]


def _index_incremental_oracle() -> str:
    iv_ctes, iv_fin = _train_oracle_ctes(
        1, _PQ_K, _DIM, prefix="iv_", src="corp"
    )
    pq_ctes, pq_fin = _train_oracle_ctes(
        _PQ_M, _PQ_K, _PQ_DSUB, prefix="pq_", src="corp"
    )
    return f"""
    WITH corp AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 0),
    {iv_ctes},
    {pq_ctes},
    cents AS (
      SELECT c AS cid, list(w ORDER BY d) AS cvec FROM {iv_fin} GROUP BY c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    subcw AS (
      SELECT c AS cid, j, list(w ORDER BY d) AS w FROM {pq_fin} GROUP BY j, c
    ),
    codes AS (
      SELECT vec_id, j, cid AS code FROM (
        SELECT e.vec_id, s.j, s.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, s.j
                 ORDER BY {_pq_dist2_sql("e.embedding", "s.w", "s.j")}, s.cid) rn
        FROM embeddings e JOIN subcw s ON TRUE
      ) WHERE rn = 1
    )
    SELECT a.vec_id, CAST(a.cid AS INT) AS cid,
           CAST(SUM(CAST(c.code AS BIGINT) << (4 * c.j)) AS BIGINT) AS code_key
    FROM assign a JOIN codes c ON c.vec_id = a.vec_id
    GROUP BY a.vec_id, a.cid
    """


@register("q_ann_index_incremental", oracle=_index_incremental_oracle())
def q_ann_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN ingest path (VERDICT r9 #7): the persisted
    IVF-PQ index of the already-ingested corpus (vec_id % 10 != 0,
    quantizers trained on it and then FROZEN) plus an arriving batch
    (vec_id % 10 == 0) encoded batch-only and parquet-APPENDED — never
    a from-scratch rebuild. Output is every indexed vector's (vec_id,
    cid, code_key) with the 8 PQ nibbles packed into one BIGINT; the
    oracle re-derives the frozen quantizer from the corpus slice
    (loop-unrolled Lloyd CTEs) and encodes ALL vectors from scratch, so
    the hash match proves append ≡ rebuild under a fixed quantizer
    generation. tests/test_similarity.py additionally pins row-level
    equality with an explicit rebuild and the near-flat ingest sweep is
    the ann_index_inc family."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    key = sf_dir + "::inc-corpus"
    cents = ivf_trained_centroids_cached(corpus, key)
    books = pq_trained_codebooks_cached(corpus, key)
    idx = ivfpq_index_with_ingest(corpus, batch, key, cents, books)
    return idx.select(
        "vec_id",
        "cid",
        F.expr("aggregate(reverse(codes), 0L, (acc, c) -> acc * 16 + c)")
        .cast("bigint")
        .alias("code_key"),
    )


def ivfpq_index_compact(
    index: DataFrame, n_files: int = 4
) -> tuple[DataFrame, str]:
    """Index MAINTENANCE for the append-based ingest path: after many
    batch appends the index parquet accumulates one small file per
    ingest; compaction rewrites it as ``n_files`` files RANGE-CLUSTERED
    on cid (each file covers a contiguous cid range, parquet min/max
    footer stats disjoint), so a probe-scoped read — ``cid IN
    (probed...)`` — skips whole files instead of scanning every ingest
    generation. The rewrite is a pure physical reorganization:
    repartitionByRange(cid) + sortWithinPartitions(cid, vec_id), same
    rows in, same rows out (q_ann_index_compact's oracle is the same
    from-scratch rebuild as the incremental query's — content is
    invariant under compaction). The sort-rewrite twin of
    tables/maintenance.py's z-order rewrite, specialized to the ANN
    index's one-dimensional cluster key.

    Returns (compacted index DataFrame reading the new generation, its
    path)."""
    from iceberg_matrix_spark.storage import scratch_dir  # noqa: PLC0415

    path = scratch_dir("ivfpq-compact-") + "/index.parquet"
    (
        index.repartitionByRange(n_files, F.col("cid"))
        .sortWithinPartitions("cid", "vec_id")
        .write.parquet(path)
    )
    spark = index.sparkSession
    return spark.read.parquet(path), path


_COMPACT_CACHE: dict[tuple, DataFrame] = {}


@register("q_ann_index_compact", oracle=_index_incremental_oracle())
def q_ann_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance pass over the incrementally-built ANN index:
    compact the corpus-build + batch-append parquet generations into
    cid-range-clustered files (see ivfpq_index_compact) and read the
    index back from the compacted generation. The oracle is the SAME
    from-scratch rebuild that certifies q_ann_index_incremental —
    compaction must be content-invariant, so a dropped/duplicated row
    or a corrupted code hash-mismatches; the physical claims (fewer
    files, disjoint per-file cid ranges, probe-scoped file skipping)
    are pinned in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    key = sf_dir + "::inc-corpus"
    cents = ivf_trained_centroids_cached(corpus, key)
    books = pq_trained_codebooks_cached(corpus, key)
    # a 3-ingest history (1 corpus body + 3 appended generations) is
    # what the compaction pass exists to clean up
    appended = ivfpq_index_with_ingest(
        corpus, batch, key, cents, books, n_ingests=3
    )
    ckey = ("compact", key, _books_digest(cents, books))
    if ckey not in _COMPACT_CACHE:
        _COMPACT_CACHE[ckey] = ivfpq_index_compact(appended, n_files=2)[0]
    return _COMPACT_CACHE[ckey].select(
        "vec_id",
        "cid",
        F.expr("aggregate(reverse(codes), 0L, (acc, c) -> acc * 16 + c)")
        .cast("bigint")
        .alias("code_key"),
    )


# ---------------------------------------------------------------------------
# ANN index retraction + quantizer-generation rotation (round 11,
# VERDICT r10 #4/#5 — the lifecycle halves the append-only index lacked:
# deletes, and the eventual retrain the frozen-quantizer assumption defers)
# ---------------------------------------------------------------------------


def ivfpq_index_retract(
    spark: SparkSession,
    index_path: str,
    deleted_ids: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Merge-on-read DELETE for the append-only ANN index: the deleted
    ids are appended as a TOMBSTONE parquet next to the index body
    (``<index>.deletes``) — an O(|deleted|) write that never touches
    the index files (tests pin the body's file listing unchanged) — and
    the live view anti-joins tombstones at read. Same MoR shape as the
    table layer's position/equality deletes (tables/table.py),
    specialized to the index's id key. Between compactions the
    tombstone set is bounded by delete traffic, so AQE plans the
    anti-join as a broadcast at realistic sizes; compaction
    (:func:`ivfpq_index_compact` over the live view) applies tombstones
    physically and resets the set. Without this, removed documents left
    stale index rows serving stale ANN hits — the round-10 lifecycle
    asymmetry."""
    deleted_ids.select(id_col).write.mode("append").parquet(
        index_path + ".deletes"
    )
    return ivfpq_index_live(spark, index_path, id_col)


def ivfpq_index_live(
    spark: SparkSession, index_path: str, id_col: str = "vec_id"
) -> DataFrame:
    """The index's LIVE view: body rows minus tombstoned ids. Reads the
    tombstone parquet only if any retraction has happened."""
    import os  # noqa: PLC0415

    body = spark.read.parquet(index_path)
    deletes_path = index_path + ".deletes"
    if not os.path.isdir(deletes_path):
        return body
    dels = spark.read.parquet(deletes_path).distinct()
    return body.join(dels, id_col, "left_anti")


def _index_retract_oracle() -> str:
    # rebuild-on-survivors: the incremental oracle (frozen quantizer
    # trained on the corpus slice, every vector encoded from scratch)
    # restricted to the ids the retraction left alive
    return f"""
    SELECT * FROM ({_index_incremental_oracle()}) t
    WHERE t.vec_id % 5 <> 0
    """


@register("q_ann_index_retract", oracle=_index_retract_oracle())
def q_ann_index_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE support for the incrementally-built ANN index (VERDICT
    r10 #5): the corpus-build + batch-append index (same build as
    q_ann_index_incremental, quantizers frozen) absorbs a delete of
    every ``vec_id % 5 == 0`` vector as an appended tombstone set —
    the index body is never rewritten (pinned) — and returns the LIVE
    view. The oracle rebuilds the index from scratch ON THE SURVIVORS
    under the same frozen quantizer derivation, so the hash match
    proves append+retract ≡ rebuild; without retraction these rows
    would keep serving stale ANN hits. Deletes are applied physically
    at the next compaction (pinned in tests/test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    key = sf_dir + "::inc-corpus"
    cents = ivf_trained_centroids_cached(corpus, key)
    books = pq_trained_codebooks_cached(corpus, key)
    # NOTE: a fresh corpus_key — the tombstone append mutates the index
    # dir, so the retraction query must not share the cached body with
    # q_ann_index_incremental/compact (their reads would see it too if
    # they read the live view; they read the body, but isolation keeps
    # the lifecycle stages independently certifiable)
    path = ivfpq_index_ingest_path(
        corpus, batch, key + "::retract", cents, books
    )
    deleted = emb.filter(F.col("vec_id") % 5 == 0)
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    # idempotent under re-run: the tombstone append is the operation
    # under test, so reset any prior tombstone generation first
    if os.path.isdir(path + ".deletes"):
        shutil.rmtree(path + ".deletes")
    live = ivfpq_index_retract(spark, path, deleted)
    return live.select(
        "vec_id",
        "cid",
        F.expr("aggregate(reverse(codes), 0L, (acc, c) -> acc * 16 + c)")
        .cast("bigint")
        .alias("code_key"),
    )


_ROTATE_CACHE: dict[tuple, tuple[str, list[list[str]]]] = {}


def ivfpq_index_rotation(
    corpus: DataFrame,
    corpus_key: str,
    old_centroids: list[list[float]],
    old_codebooks: list[list[list[float]]],
    new_centroids: list[list[float]],
    new_codebooks: list[list[list[float]]],
    n_slices: int = 3,
    id_col: str = "vec_id",
) -> tuple[str, list[list[str]]]:
    """STAGED quantizer-generation rotation (VERDICT r10 #4): the
    frozen-quantizer contract the append path relies on eventually
    meets drift, and the retrain must not stop ingest or re-encode the
    corpus in one shot. Layout: the index root holds ``gen=0`` (the
    existing body under the old books) and ``gen=1`` (the new
    generation); migration appends one hash-mod slice of the corpus at
    a time, re-encoded under the NEW books, into ``gen=1`` — each
    batch touches |corpus|/n_slices rows (pinned per-slice in tests;
    no single batch re-encodes the full corpus). Mid-migration the
    index stays fully queryable via :func:`ivfpq_rotation_view`, which
    serves migrated ids from gen-1 and unmigrated ones from gen-0 BY
    THE SLICE PREDICATE (``xxhash64(id) % n < done``) — no anti-join,
    both generations queried side by side, each row's codes decoded
    under its own generation's books. When the last slice lands, gen-0
    is dropped and the new generation IS the index
    (:func:`ivfpq_rotation_finish`).

    Returns (root, per-slice file lists) — the file lists let tests
    pin per-batch row counts."""
    import os  # noqa: PLC0415

    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        df_content_key,
    )

    key = (
        "ivfpq-rotate",
        corpus_key,
        df_content_key(corpus),
        n_slices,
        _books_digest(old_centroids, old_codebooks),
        _books_digest(new_centroids, new_codebooks),
    )
    if key not in _ROTATE_CACHE:
        from iceberg_matrix_spark.storage import state_dir  # noqa: PLC0415

        root = state_dir("ivfpq-rotate-") + "/index"
        gen0 = os.path.join(root, "gen=0")
        ivfpq_encode(corpus, old_centroids, old_codebooks, id_col).write.parquet(
            gen0
        )
        gen1 = os.path.join(root, "gen=1")
        slices: list[list[str]] = []
        for s in range(n_slices):
            before = (
                set(os.listdir(gen1)) if os.path.isdir(gen1) else set()
            )
            slice_s = corpus.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_slices)) == F.lit(s)
            )
            ivfpq_encode(
                slice_s, new_centroids, new_codebooks, id_col
            ).write.mode("append").parquet(gen1)
            slices.append(
                sorted(
                    os.path.join(gen1, f)
                    for f in set(os.listdir(gen1)) - before
                    if f.endswith(".parquet")
                )
            )
        _ROTATE_CACHE[key] = (root, slices)
    return _ROTATE_CACHE[key]


def ivfpq_rotation_view(
    spark: SparkSession,
    root: str,
    n_slices: int,
    done: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """The mid-migration live view: after ``done`` of ``n_slices``
    migration batches, ids in a migrated hash-mod slice read from
    gen-1, the rest from gen-0 — a pure partition-pruned filter, no
    join. ``done == n_slices`` serves everything from gen-1."""
    idx = spark.read.parquet(root)
    migrated = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_slices)) < F.lit(done)
    return idx.filter(
        ((F.col("gen") == 1) & migrated) | ((F.col("gen") == 0) & ~migrated)
    )


def ivfpq_rotation_finish(spark: SparkSession, root: str) -> DataFrame:
    """Complete the rotation: drop the old generation's files; the new
    generation is now the whole index."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    gen0 = os.path.join(root, "gen=0")
    if os.path.isdir(gen0):
        shutil.rmtree(gen0)
    return spark.read.parquet(root).drop("gen")


def _index_retrain_oracle() -> str:
    # from-scratch rebuild of the CORPUS index under the NEW
    # (Lloyd-trained) generation's books — what the staged migration
    # must land at exactly
    iv_ctes, iv_fin = _train_oracle_ctes(1, _PQ_K, _DIM, prefix="iv_", src="corp")
    pq_ctes, pq_fin = _train_oracle_ctes(
        _PQ_M, _PQ_K, _PQ_DSUB, prefix="pq_", src="corp"
    )
    return f"""
    WITH corp AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 0),
    {iv_ctes},
    {pq_ctes},
    cents AS (
      SELECT c AS cid, list(w ORDER BY d) AS cvec FROM {iv_fin} GROUP BY c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           c.cvec) DESC,
                          c.cid DESC) rn
        FROM corp e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    subcw AS (
      SELECT c AS cid, j, list(w ORDER BY d) AS w FROM {pq_fin} GROUP BY j, c
    ),
    codes AS (
      SELECT vec_id, j, cid AS code FROM (
        SELECT e.vec_id, s.j, s.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, s.j
                 ORDER BY {_pq_dist2_sql("e.embedding", "s.w", "s.j")}, s.cid) rn
        FROM corp e JOIN subcw s ON TRUE
      ) WHERE rn = 1
    )
    SELECT a.vec_id, CAST(a.cid AS INT) AS cid,
           CAST(SUM(CAST(c.code AS BIGINT) << (4 * c.j)) AS BIGINT) AS code_key
    FROM assign a JOIN codes c ON c.vec_id = a.vec_id
    GROUP BY a.vec_id, a.cid
    """


@register("q_ann_index_retrain", oracle=_index_retrain_oracle())
def q_ann_index_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer-generation ROTATION for the ANN index (VERDICT r10
    #4): the corpus index built under the SEED quantizer generation is
    migrated to the Lloyd-TRAINED generation in 3 staged hash-mod
    batches — each re-encodes only its slice (no batch touches the
    full corpus; per-slice row counts pinned), the index remains
    queryable across both generations mid-migration
    (ivfpq_rotation_view), and the old generation is dropped when the
    last slice lands. Returns the migrated index; the oracle rebuilds
    the corpus index from scratch under the trained books (loop-
    unrolled Lloyd CTEs), so the hash match proves staged migration ≡
    from-scratch retrain."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    key = sf_dir + "::inc-corpus"
    old_cents = ivf_seed_centroids(corpus, k=_PQ_K)
    old_books = pq_seed_codebooks(corpus)
    new_cents = ivf_trained_centroids_cached(corpus, key)
    new_books = pq_trained_codebooks_cached(corpus, key)
    root, _slices = ivfpq_index_rotation(
        corpus, key, old_cents, old_books, new_cents, new_books
    )
    final = ivfpq_rotation_finish(spark, root)
    return final.select(
        "vec_id",
        "cid",
        F.expr("aggregate(reverse(codes), 0L, (acc, c) -> acc * 16 + c)")
        .cast("bigint")
        .alias("code_key"),
    )
