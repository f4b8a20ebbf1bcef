"""Empirical scale sweep for the LLM-pipeline operator families.

The dedup/similarity operators carry *design* scale arguments (inverted
indexes, banded LSH, skew caps — see each docstring). This module
*measures* them: a deterministic corpus amplifier grows the test tables
10× / 100×, and a sweep harness runs each family at every factor
recording wall-clock, shuffle-write/read bytes, and peak stage task
count from Spark's status REST API. Super-linear shuffle growth is the
red flag the plan-pins can't see.

Amplification must not change the *problem shape*: naive row replication
makes every document an exact duplicate of its replicas, so the TRUE
answer (duplicate pairs) grows quadratically in the factor and any
algorithm would look quadratic. Instead each replica is re-keyed AND
content-salted so within-replica structure is preserved exactly while
cross-replica matches are destroyed:

- documents: every whitespace token gets a replica suffix (an injective
  token map, so token-shingle Jaccard within a replica is unchanged and
  token sets across replicas are disjoint); doc_id → doc_id·factor + r.
- embeddings: every vector is multiplied by a replica-specific
  deterministic ±1 sign pattern (cosine within a replica is invariant
  under a shared sign flip; cross-replica cosines become ≈random);
  vec_id → vec_id·factor + r. Replica 0 is the identity, so factor=1
  reproduces the source corpus bit-for-bit.

  Caveat that shapes the sweep design: "≈random" in the test corpus'
  dim=64 still leaves a background P(cos ≥ 0.4) ≈ 5e-4 (cos of random
  unit vectors ~ N(0, 1/dim)); a SELF-JOIN near-dup over f replicas
  therefore has Θ(f²·n²·5e-4) true cross-replica pairs — quadratic in
  the factor for ANY correct algorithm, an artifact of the small test
  dimensionality (at a real 768-dim the background is ~1e-28). The
  semantic family is consequently swept in its production incremental
  form (fixed batch × growing corpus — linear true output), and the
  amplifier's job is only to keep within-replica structure exact.

Everything is seed-free-deterministic (fixed integer mixing, no RNG), so
sweeps are reproducible run-to-run.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_matrix_spark.session import local_df
from iceberg_matrix_spark.sources.testdata import load_table

__all__ = [
    "amplify_documents",
    "amplify_embeddings",
    "amplify_events",
    "amplify_corpus",
    "StageMetrics",
    "run_scale_sweep",
]


def _replicated(df: DataFrame, id_col: str, factor: int) -> DataFrame:
    """factor copies of every row, re-keyed id·factor + replica (unique
    and deterministic; replica 0 keeps the source ids' ORDER)."""
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r"), "*"
    ).withColumn(id_col, F.col(id_col) * factor + F.col("__r"))


def amplify_documents(docs: DataFrame, factor: int) -> DataFrame:
    """Deterministically amplify a documents frame ``factor``×.

    Token map t → t⁀"ᵣ<r>" is injective per replica (same suffix for all
    tokens), so every token-level relation (shingles, k-gram spans,
    minhash) within a replica is isomorphic to the source corpus; token
    vocabularies of different replicas are disjoint.
    """
    if factor <= 1:
        return docs
    rep = _replicated(docs, "doc_id", factor)
    salted = F.when(F.col("__r") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1ᵣ"), F.col("__r").cast("string")),
        )
    )
    return (
        rep.withColumn("text", salted)
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("__r")
    )


def _sign_rows(factor: int, dim: int) -> list[tuple[int, list[float]]]:
    """Deterministic Rademacher ±1 pattern per (replica, dimension).

    Fixed integer mixing (Knuth multiplicative constants) — no RNG, no
    time dependence. Replica 0 is all +1 (identity)."""
    rows = []
    for r in range(factor):
        if r == 0:
            rows.append((0, [1.0] * dim))
            continue
        signs = [
            1.0 if ((r * 2654435761 + i * 40503 + 12345) % 7919) % 2 == 0 else -1.0
            for i in range(dim)
        ]
        rows.append((r, signs))
    return rows


def amplify_embeddings(
    spark: SparkSession, emb: DataFrame, factor: int
) -> DataFrame:
    """Deterministically amplify an embeddings frame ``factor``×.

    A shared sign-flip leaves every within-replica cosine exactly equal
    to the source corpus' (cos(s⊙a, s⊙b) = cos(a, b)); cross-replica
    cosines decorrelate, so near-dup structure scales linearly."""
    if factor <= 1:
        return emb
    dim = len(emb.select("embedding").first()["embedding"])
    signs = local_df(
        spark,
        _sign_rows(factor, dim),
        "__r int, __signs array<float>",
    )
    rep = _replicated(emb, "vec_id", factor)
    return (
        rep.join(F.broadcast(signs), "__r")
        .withColumn(
            "embedding",
            F.zip_with(
                "embedding", "__signs", lambda a, b: (a * b).cast("float")
            ),
        )
        .drop("__r", "__signs")
    )


def amplify_events(events: DataFrame, factor: int) -> DataFrame:
    """Deterministically amplify an events frame ``factor``× by USER
    re-keying: every replica re-keys user_id and event_id
    (id·factor + r) and keeps ts/event_type/value untouched, so each
    replica user's event history — and therefore their funnel
    conversion, path string, and session structure — is identical to
    the source user's. Users (the aggregation key space) grow ∝ factor;
    per-user state does NOT grow, which is exactly the claim the event
    sweep must verify (the hot-key hazard is per-user volume, tested
    separately by the q_event_paths pre-exchange prune pin)."""
    if factor <= 1:
        return events
    rep = events.select(
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r"), "*"
    )
    return (
        rep.withColumn("user_id", F.col("user_id") * factor + F.col("__r"))
        .withColumn("event_id", F.col("event_id") * factor + F.col("__r"))
        .drop("__r")
    )


def amplify_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str, factor: int
) -> dict[str, str]:
    """Write amplified documents+embeddings+events parquet under out_dir.

    Returns {"documents": path, "embeddings": path, "events": path}
    readable with spark.read.parquet. Partition count scales with the
    factor so the amplified corpus never degrades to single-task
    stages."""
    paths = {}
    n_parts = max(4, min(64, 4 * factor))
    docs = amplify_documents(load_table(spark, sf_dir, "documents"), factor)
    p = os.path.join(out_dir, f"documents_x{factor}.parquet")
    docs.repartition(n_parts, "doc_id").write.mode("overwrite").parquet(p)
    paths["documents"] = p
    emb = amplify_embeddings(
        spark, load_table(spark, sf_dir, "embeddings"), factor
    )
    p = os.path.join(out_dir, f"embeddings_x{factor}.parquet")
    emb.repartition(n_parts, "vec_id").write.mode("overwrite").parquet(p)
    paths["embeddings"] = p
    ev = amplify_events(load_table(spark, sf_dir, "events"), factor)
    p = os.path.join(out_dir, f"events_x{factor}.parquet")
    ev.repartition(n_parts, "user_id").write.mode("overwrite").parquet(p)
    paths["events"] = p
    return paths


class StageMetrics:
    """Shuffle/task metrics per measured block, from the status REST API.

    Requires the session to run with spark.ui.enabled=true. Stage rows
    expose shuffleWriteBytes / shuffleReadBytes / numCompleteTasks
    (completed stages only; a measured block diffs the stage set before
    vs after)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        base = spark.sparkContext.uiWebUrl
        if not base:
            raise RuntimeError(
                "scale sweep needs the Spark UI (pass spark.ui.enabled=true)"
            )
        app_id = spark.sparkContext.applicationId
        self.url = f"{base}/api/v1/applications/{app_id}/stages"

    def _stages(self) -> list[dict]:
        with urllib.request.urlopen(self.url + "?status=complete") as r:
            return json.loads(r.read().decode())

    def _settled_stages(self) -> list[dict]:
        """Stage list after the status store stops changing: the store is
        fed by an async listener queue, so reading immediately after an
        action returns can miss the job's final stages (they would then
        be misattributed to the NEXT measured block). Poll until two
        consecutive snapshots agree (bounded wait)."""
        prev = self._stages()
        for _ in range(20):
            time.sleep(0.15)
            cur = self._stages()
            if {(s["stageId"], s["attemptId"]) for s in cur} == {
                (s["stageId"], s["attemptId"]) for s in prev
            }:
                return cur
            prev = cur
        return prev

    def measure(self, fn) -> dict:
        """Run fn() and return wall/shuffle/task metrics of the new
        completed stages it produced."""
        before = {(s["stageId"], s["attemptId"]) for s in self._settled_stages()}
        start = time.perf_counter()
        fn()
        wall = time.perf_counter() - start
        new = [
            s
            for s in self._settled_stages()
            if (s["stageId"], s["attemptId"]) not in before
        ]
        return {
            "wall_s": round(wall, 3),
            "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in new),
            "shuffle_read_bytes": sum(s["shuffleReadBytes"] for s in new),
            # spill is the sweep's red flag: a linear-shuffle family that
            # spills at the top factor is under-partitioned or carrying
            # too-wide rows for executor memory at that scale
            "spill_memory_bytes": sum(
                s.get("memoryBytesSpilled", 0) for s in new
            ),
            "spill_disk_bytes": sum(s.get("diskBytesSpilled", 0) for s in new),
            "peak_stage_tasks": max(
                (s["numCompleteTasks"] for s in new), default=0
            ),
            "stages": len(new),
            # per-task write-bytes quantiles of the heaviest shuffle
            # stage (round 12): the skew statistic VERDICT r11 #6 asked
            # the sweep to watch — p99/p50 ≈ 1 means the exchange is
            # balanced; a hot key shows up here long before it walls a
            # stage. None when the block produced no shuffle.
            **self._heavy_stage_write_quantiles(new),
        }

    def _heavy_stage_write_quantiles(self, new: list[dict]) -> dict:
        heavy = max(new, key=lambda s: s["shuffleWriteBytes"], default=None)
        if not heavy or heavy["shuffleWriteBytes"] == 0:
            return {"heavy_write_p50": None, "heavy_write_p99": None}
        url = (
            f"{self.url}/{heavy['stageId']}/{heavy['attemptId']}/taskSummary"
            f"?quantiles=0.5,0.99"
        )
        try:
            with urllib.request.urlopen(url) as r:
                q = json.loads(r.read().decode())
            p50, p99 = q["shuffleWriteMetrics"]["writeBytes"]
        except Exception:
            return {"heavy_write_p50": None, "heavy_write_p99": None}
        return {"heavy_write_p50": int(p50), "heavy_write_p99": int(p99)}


def _family_frames(spark: SparkSession, paths: dict[str, str]):
    docs = spark.read.parquet(paths["documents"])
    emb = spark.read.parquet(paths["embeddings"])
    ev = spark.read.parquet(paths["events"])
    return docs, emb, ev


def _replica0(emb: DataFrame, factor: int) -> DataFrame:
    """Replica-0 rows (the identity copies of the base corpus):
    amplified ids are base_id·factor + replica."""
    if factor <= 1:
        return emb
    return emb.filter(F.col("vec_id") % factor == 0)


def _fixed_queries(emb: DataFrame, factor: int) -> DataFrame:
    """16 fixed query vectors — the SAME 16 base vectors (replica-0
    copies) at every factor, so the ANN sweep holds query load constant
    and scales only the corpus. Without the replica-0 filter, orderBy
    .limit at factor f would pick sign-flipped replicas of only the
    ~16/f lowest base ids — a query workload that changes with the
    factor."""
    return (
        _replica0(emb, factor)
        .orderBy("vec_id")
        .limit(16)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )


def family_runners() -> dict:
    """family → fn(spark, docs, emb, ev, factor) -> DataFrame (forced via noop)."""
    from iceberg_matrix_spark.operators.dedup import (  # noqa: PLC0415
        minhash_neardup_pairs,
        ngram_jaccard_pairs,
    )
    from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
        ann_lsh_topk,
        incremental_semantic_verdicts,
        incremental_semantic_verdicts_scoped,
        ivf_seed_centroids,
        knn_label_consistency,
        product_cid,
        prototype_prune,
        scoped_signature_index,
        seed_half_centroids,
    )
    from iceberg_matrix_spark.operators.spans import (  # noqa: PLC0415
        duplicate_spans,
    )

    def semantic(spark, docs, emb, ev, factor):
        # the production semantic-dedup path: a FIXED-size ingest batch
        # against the growing corpus (incremental form). The self-join
        # form's candidate volume is near-quadratic by its documented
        # cost model (similarity.py:embedding_neardup_lsh — coarse
        # banding at threshold 0.4); per-batch cost is the quantity a
        # 100 TB pipeline actually pays, and it must stay ∝ corpus, not
        # corpus². Batch = 500 replica-0 vectors re-keyed out of the
        # corpus id space, so every batch row has a corpus twin
        # (guaranteed dup_of_corpus matches at any factor).
        return incremental_semantic_verdicts(
            _sweep_batch(emb, factor), emb, "vec_id", "embedding", threshold=0.4
        )

    def _sweep_batch(emb, factor):
        # 500 replica-0 vectors re-keyed out of the corpus id space, so
        # every batch row has a corpus twin (guaranteed dup_of_corpus
        # matches at any factor)
        return (
            _replica0(emb, factor)
            .orderBy("vec_id")
            .limit(500)
            .withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000_000))
        )

    def semantic_scoped(spark, docs, emb, ev, factor):
        # the persisted-cid deployment path (VERDICT r5 #3): cluster ids
        # are assigned ONCE per corpus at ingest (scoped_signature_index
        # — the index; built here in-measure, like the unscoped family
        # builds its signature index, so rows compare like-for-like) and
        # candidates require a shared probed cluster in the join, cutting
        # candidate volume ≈ nprobe²/k of the unscoped form. k is fixed
        # at 64 (the local expression-unroll cap) so n_c grows with the
        # corpus here; production grows k ∝ corpus instead (bounded n_c),
        # which only shrinks per-cluster work further.
        cents = ivf_seed_centroids(emb, k=64)
        idx = scoped_signature_index(emb, cents, nprobe=2)
        return incremental_semantic_verdicts_scoped(
            _sweep_batch(emb, factor),
            emb,
            cents,
            threshold=0.4,
            nprobe=2,
            corpus_index=idx,
        )

    def knn(spark, docs, emb, ev, factor):
        # the docstring's linear-scale contract MEASURED: cluster count
        # grows ∝ corpus (product_cid composes two half-dim quantizers,
        # so k_lo·k_hi cells from k_lo+k_hi unrolled dots — 16/144/1600
        # cells at 1×/10×/100×) keeping per-cluster population ~bounded;
        # in-cluster candidate volume Σ_c n_c² then grows ∝ corpus and
        # the top-k WindowGroupLimit prunes to k rows per id before the
        # final exchange. The registered query's k=16 argmax quantizer is
        # the oracle-pinned SMALL-corpus form of the same plan.
        k_each = {1: 4, 10: 12, 100: 40}.get(factor) or max(
            4, round(4 * factor**0.5)
        )
        lo, hi = seed_half_centroids(emb, k_each)
        return knn_label_consistency(
            emb, None, cid_expr=product_cid("embedding", lo, hi)
        )

    def lines(spark, docs, emb, ev, factor):
        # token salting keeps within-replica line structure isomorphic
        # and cross-replica line vocabularies disjoint, so true
        # boilerplate lines (and the verdict row count) grow ∝ factor
        from iceberg_matrix_spark.operators.lines import (  # noqa: PLC0415
            line_dedup_verdicts,
        )

        return line_dedup_verdicts(docs)

    def pq(spark, docs, emb, ev, factor):
        # corpus side = one codegen projection over 8-byte codes; the
        # only exchange is the per-query top-k window (16 fixed queries)
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            ann_pq_topk,
            pq_seed_codebooks,
        )

        books = pq_seed_codebooks(emb)
        return ann_pq_topk(emb, _fixed_queries(emb, factor), books, k=10)

    def fuzzy(spark, docs, emb, ev, factor):
        # the pair-shaped family to watch: candidates are Σ_b n_b² over
        # (lang, title-prefix) blocks. Token salting gives replicas
        # disjoint title prefixes, so blocks fragment with the factor
        # and per-block population stays put — candidate volume must
        # grow ∝ factor, not factor²
        from iceberg_matrix_spark.operators.fuzzy import (  # noqa: PLC0415
            fuzzy_title_pairs,
        )

        return fuzzy_title_pairs(docs)

    def hamming(spark, docs, emb, ev, factor):
        # corpus side = one integer-signature projection (16 B/vec);
        # exchanges are the two per-query windows over WindowGroupLimit-
        # pruned rows — the ann family's cost shape with smaller rows
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            ann_hamming_topk,
        )

        return ann_hamming_topk(emb, _fixed_queries(emb, factor), k=10)

    def bm25(spark, docs, emb, ev, factor):
        # inverted-index shape: explode ∝ corpus tokens, postings ∝ hits
        # of the 3 query terms, df/stats broadcasts constant, top-k via
        # TakeOrderedAndProject — nothing pair-shaped
        from iceberg_matrix_spark.operators.retrieval import (  # noqa: PLC0415
            _BM25_TERMS,
            bm25_topk,
        )

        return bm25_topk(docs, _BM25_TERMS, k=20)

    def outliers(spark, docs, emb, ev, factor):
        # per-dimension rank windows: the partition key space is FIXED
        # (64 pos values), so parallelism is capped at 64 tasks and each
        # task sorts corpus/64 rows — the sweep watches that per-task
        # sort staying n·log n (wall ~linear) rather than blowing memory;
        # at true 100 TB the recipe is a range-partitioned sort within
        # pos or a partial-rank prune, same plan shape
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            embedding_outliers,
        )

        return embedding_outliers(emb)

    def prototype(spark, docs, emb, ev, factor):
        # one narrow assignment+score projection, one per-cluster rank
        # window; k=64 (the unroll cap) so per-cluster window partitions
        # grow with the corpus but stay sort-bounded — the point the
        # sweep verifies is that NOTHING here is quadratic
        cents = ivf_seed_centroids(emb, k=64)
        return prototype_prune(emb, cents)

    def funnel(spark, docs, emb, ev, factor):
        # per-step frontier joins: each step shuffles only its own event
        # type ∝ corpus; the frontier is two longs per user. User
        # re-keying grows the key space ∝ factor with per-user state
        # fixed, so the measured claim is shuffle ∝ events, never
        # events×steps or users²
        from iceberg_matrix_spark.operators.timeseries import (  # noqa: PLC0415
            event_funnel,
        )

        return event_funnel(ev)

    def paths(spark, docs, emb, ev, factor):
        # the row_number()≤5 pre-exchange prune (VERDICT r7 #2) bounds
        # per-user state at 5 structs; the sweep watches the aggregate's
        # shuffle staying ∝ users, not ∝ events
        from iceberg_matrix_spark.operators.timeseries import (  # noqa: PLC0415
            user_event_paths,
        )

        return user_event_paths(ev)

    def components(spark, docs, emb, ev, factor):
        # iterative min-label propagation: edges come from the capped
        # ngram pair operator (∝ corpus under token salting — replicas'
        # vocabularies are disjoint, so true pairs ∝ factor); each sweep
        # is one join + one groupBy over the edge list, and localCheckpoint
        # truncates lineage per sweep. The measured claim: per-sweep
        # shuffle ∝ edges, sweeps bounded by cluster diameter (constant
        # here — cluster structure is replica-isomorphic to the base).
        from iceberg_matrix_spark.operators.graph import (  # noqa: PLC0415
            neardup_components,
        )

        return neardup_components(docs)

    def pagerank(spark, docs, emb, ev, factor):
        # fixed-point PageRank (5 sweeps, BIGINT micro-units) over the
        # same ∝-corpus edge list, then the per-component centrality
        # window — the full q_dedup_canonical_centrality composition
        from iceberg_matrix_spark.operators.graph import (  # noqa: PLC0415
            canonical_by_centrality,
        )

        return canonical_by_centrality(docs)

    def chunks(spark, docs, emb, ev, factor):
        # explode ∝ tokens, zero shuffle: the sweep verifies the chunk
        # generator stays a pure map stage as the corpus grows
        from iceberg_matrix_spark.operators.text import doc_chunks  # noqa: PLC0415

        return doc_chunks(docs)

    def chunk_dedup(spark, docs, emb, ev, factor):
        # composition: zero-shuffle chunk generate + exact fingerprint
        # agg + capped-postings near-dup + per-doc window — every stage
        # individually swept-linear; this row proves the chunk-level
        # composition inherits it (chunk rows ∝ tokens ∝ factor)
        from iceberg_matrix_spark.operators.text import (  # noqa: PLC0415
            chunk_dedup_summary,
        )

        return chunk_dedup_summary(docs)

    def chunk_dedup_inc(spark, docs, emb, ev, factor):
        # per-ingest shape: a FIXED batch chunk-checked against the
        # growing corpus's fingerprint index — batch-side work fixed,
        # index side ships 16-byte rows, so wall should track the index
        # build scan, shuffle ∝ corpus fingerprints. Amplified ids are
        # id·factor + r (dense), so a plain % 10 slice would GROW with
        # the factor (ADVICE r9); % (10·factor) == 0 selects exactly the
        # replica-0 copies of the original % 10 slice — fixed size, the
        # semdecon spelling
        from iceberg_matrix_spark.operators.dedup import (  # noqa: PLC0415
            incremental_dedup_exact,
        )
        from iceberg_matrix_spark.functions.text import (  # noqa: PLC0415
            md5_fingerprint,
        )
        from iceberg_matrix_spark.operators.text import (  # noqa: PLC0415
            chunks_with_ckey,
        )

        batch = chunks_with_ckey(
            docs.filter(F.col("doc_id") % (10 * factor) == 0)
        )
        index = (
            chunks_with_ckey(docs.filter(F.col("doc_id") % 10 != 0))
            .select(md5_fingerprint("chunk_text").alias("fingerprint"))
            .distinct()
        )
        return incremental_dedup_exact(batch, index, "ckey", "chunk_text")

    def media_neardup(spark, docs, emb, ev, factor):
        # banded-exact feature blocking: amplified ids produce disjoint
        # payload populations, so true pairs (each original × its
        # perturbed re-encode) grow ∝ factor and block populations stay
        # tiny (4-byte exact keys) — candidate volume must track factor.
        # Exactly ∝ since the circular metric: no mod-256 wraparound
        # loss on the perturbed dim (ADVICE r8 fix)
        from iceberg_matrix_spark.operators.multimodal import (  # noqa: PLC0415
            attach_media,
            media_neardup_pairs,
        )

        m = attach_media(docs)
        perturbed = attach_media(docs).select(
            (F.col("doc_id") + F.lit(10_000_000_000)).alias("doc_id"),
            "media_type",
            "media_meta",
            F.concat(
                F.expr("substring(payload, 1, length(payload) - 1)").cast(
                    "string"
                ),
                F.lit("z"),
            )
            .cast("binary")
            .alias("payload"),
        )
        return media_neardup_pairs(m.unionByName(perturbed))

    def pq_train(spark, docs, emb, ev, factor):
        # the index BUILD itself: 2 fixed-point Lloyd iterations — each
        # is one codegen assignment pass + one (dim, cid) integer agg
        # whose output is CONSTANT-size (m·k·dsub rows) regardless of
        # corpus; wall must grow ∝ corpus, shuffle stays ~constant
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            pq_seed_codebooks,
            train_codebooks_fp,
        )

        books = train_codebooks_fp(emb, pq_seed_codebooks(emb))
        # return a frame so the harness's noop write has a plan to force
        return spark.createDataFrame(
            [(j, c) for j in range(len(books)) for c in range(len(books[0]))],
            "j int, c int",
        )

    def _rerank_quantizers(emb):
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            ivf_seed_centroids,
            pq_seed_codebooks,
        )

        return ivf_seed_centroids(emb, k=16), pq_seed_codebooks(emb)

    def ivfpq_rerank_prepare(spark, docs, emb, ev, factor):
        # index build = the INGEST-side cost, run outside the measured
        # block (round 12): the registered q_ann_ivfpq_rerank probes a
        # PERSISTED (vec_id, cid, codes) index maintained at ingest —
        # the old runner re-encoded the corpus inline per measurement,
        # so the "rerank" rows were dominated by encode CPU (measured
        # at 100×: inline encode 12.8 s of a 16.2 s warm wall) and the
        # retrieval path the family exists to watch was invisible.
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            ivfpq_index_cached,
        )

        cents, books = _rerank_quantizers(emb)
        ivfpq_index_cached(emb, f"sweep-x{factor}", cents, books, tag="sweep")

    def ivfpq_rerank(spark, docs, emb, ev, factor):
        # the production retrieval composition over the PREBUILT index
        # (same shape as the registered query): ADC shortlist (map-side
        # probe join over the persisted codes) + exact rerank of the
        # |queries|·50 shortlist broadcast back against the corpus scan
        # — rerank volume is FIXED per query, so wall must track the
        # probe scan (∝ corpus) with a flat rerank tail
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            ann_ivfpq_rerank,
            ivfpq_index_cached,
        )

        cents, books = _rerank_quantizers(emb)
        idx = ivfpq_index_cached(
            emb, f"sweep-x{factor}", cents, books, tag="sweep"
        )
        return ann_ivfpq_rerank(
            emb,
            _fixed_queries(emb, factor),
            cents,
            books,
            k=10,
            corpus_index=idx,
        )

    ivfpq_rerank.prepare = ivfpq_rerank_prepare

    def semdecon(spark, docs, emb, ev, factor):
        # embedding decontamination: the BENCH side is fixed (replica
        # 0's vec_id % 20 slice — eval sets don't grow with the
        # corpus), broadcast against the growing corpus scan — one
        # map-side stage, wall ∝ corpus, shuffle ≈ per-vector max rows
        from iceberg_matrix_spark.functions.vectors import (  # noqa: PLC0415
            dot,
            l2_norm,
        )

        # amplified ids are id·factor + r (dense), so a plain % 20 slice
        # GROWS with the corpus and turns the sweep quadratic (first cut
        # timed out at 100x); % (20·factor) == 0 selects exactly the
        # replica-0 copies of the original % 20 bench — fixed size
        bench = emb.filter(F.col("vec_id") % (20 * factor) == 0).select(
            F.col("vec_id").alias("__bid"),
            F.col("embedding").alias("__bv"),
            l2_norm("embedding").alias("__bn"),
        )
        corpus = emb.filter(F.col("vec_id") % 20 != 0).select(
            "vec_id", "embedding", l2_norm("embedding").alias("__cn")
        )
        return (
            corpus.crossJoin(F.broadcast(bench))
            .select(
                "vec_id",
                (dot("embedding", "__bv") / (F.col("__cn") * F.col("__bn"))).alias("__s"),
            )
            .groupBy("vec_id")
            .agg(F.max("__s").alias("max_sim"))
        )

    def semdecon_scoped(spark, docs, emb, ev, factor):
        # the deployment decontamination path (VERDICT r9 #2): corpus
        # vectors carry their 2 nearest cluster ids (at ingest these are
        # stored columns), the FIXED bench set probes 8 clusters and
        # broadcasts — the operator's measured (2 corpus × 8 eval) knee
        # (ADVICE r10: this comment previously said 1×2, misdescribing
        # the default plan shape)
        # — corpus-side cost must track the assignment scan (∝ corpus),
        # shuffle ≈ per-vector max rows, like the unscoped family but
        # with candidate volume cut to the shared-cluster pairs
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            decontaminate_semantic_scoped,
            ivf_seed_centroids,
        )

        cents = ivf_seed_centroids(emb, k=16)
        bench = emb.filter(F.col("vec_id") % (20 * factor) == 0)
        corpus = emb.filter(F.col("vec_id") % 20 != 0)
        return decontaminate_semantic_scoped(corpus, bench, cents)

    def ann_index_inc(spark, docs, emb, ev, factor):
        # incremental index maintenance: a FIXED batch (replica-0's
        # % 10 slice) encoded under the frozen seed quantizer and
        # appended to the corpus index — corpus-side work is one narrow
        # codegen encode + parquet write (∝ corpus, no shuffle), the
        # per-ingest batch tail is flat; the returned combined index is
        # a plain file scan. Seed quantizers keep the quantizer build
        # out of the row (Lloyd training is the pq_train family).
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            ivf_seed_centroids,
            ivfpq_index_with_ingest,
            pq_seed_codebooks,
        )

        cents = ivf_seed_centroids(emb, k=16)
        books = pq_seed_codebooks(emb)
        corpus = emb.filter(F.col("vec_id") % (10 * factor) != 0)
        batch = emb.filter(F.col("vec_id") % (10 * factor) == 0)
        return ivfpq_index_with_ingest(
            corpus, batch, f"sweep-inc-{factor}", cents, books
        )

    def pq_train_sampled(spark, docs, emb, ev, factor):
        # the DEPLOYMENT build: same 2 Lloyd iterations but over the
        # fixed-hash ~1/3 slice — wall should grow ∝ corpus/3 (the seed
        # TopK pass still reads everything once), shuffle ~constant
        from iceberg_matrix_spark.operators.similarity import (  # noqa: PLC0415
            train_codebooks_sampled,
        )

        books = train_codebooks_sampled(emb)
        return spark.createDataFrame(
            [(j, c) for j in range(len(books)) for c in range(len(books[0]))],
            "j int, c int",
        )

    def capstone(spark, docs, emb, ev, factor):
        # the composed curation DAG (gopher gate + span gate + exact
        # dedup + stratified sample + rollup) end-to-end: every stage is
        # individually swept-linear; this row proves the COMPOSITION
        # inherits it (no barrier-stage blowup when Catalyst plans the
        # whole pipeline as one DAG)
        from iceberg_matrix_spark.operators.pipeline import (  # noqa: PLC0415
            corpus_pipeline_summary,
        )

        return corpus_pipeline_summary(docs)

    return {
        "ngram": lambda spark, docs, emb, ev, factor: ngram_jaccard_pairs(
            docs, threshold=0.5, max_doc_freq=64
        ),
        # ngram_jaccard_pairs_prefix was swept here once (round 10:
        # 22/259/22 165 MB at 1×/10×/100× vs the baseline's
        # 24/223/2 185) and REMOVED from the default family list on the
        # result — the verify join's per-candidate array shipping loses
        # to the baseline's combining pair-count exchange at scale; the
        # measured decomposition lives in the operator's docstring and
        # SCALING.md Round-10.
        "knn": knn,
        "prototype": prototype,
        "fuzzy": fuzzy,
        "hamming": hamming,
        "bm25": bm25,
        "outliers": outliers,
        "lines": lines,
        "pq": pq,
        "minhash": lambda spark, docs, emb, ev, factor: minhash_neardup_pairs(
            docs, threshold=0.5
        ),
        "spans": lambda spark, docs, emb, ev, factor: duplicate_spans(
            docs, "doc_id", "text"
        ),
        "semantic": semantic,
        "semantic_scoped": semantic_scoped,
        "ann": lambda spark, docs, emb, ev, factor: ann_lsh_topk(
            emb, F.broadcast(_fixed_queries(emb, factor)), k=10
        ),
        "funnel": funnel,
        "paths": paths,
        "components": components,
        "pagerank": pagerank,
        "capstone": capstone,
        "chunks": chunks,
        "media_neardup": media_neardup,
        "pq_train": pq_train,
        "pq_train_sampled": pq_train_sampled,
        "ivfpq_rerank": ivfpq_rerank,
        "chunk_dedup": chunk_dedup,
        "chunk_dedup_inc": chunk_dedup_inc,
        "semdecon": semdecon,
        "semdecon_scoped": semdecon_scoped,
        "ann_index_inc": ann_index_inc,
    }


def run_scale_sweep(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    factors: tuple[int, ...] = (1, 10, 100),
    families: list[str] | None = None,
) -> list[dict]:
    """Measure every family at every amplification factor.

    Returns one row per (family, factor) with wall-clock and stage
    metrics; amplification time is excluded from family rows (recorded
    separately as family="_amplify")."""
    metrics = StageMetrics(spark)
    runners = family_runners()
    if families:
        runners = {k: runners[k] for k in families}
    out: list[dict] = []
    for factor in factors:
        t0 = time.perf_counter()
        paths = amplify_corpus(spark, sf_dir, workdir, factor)
        docs, emb, ev = _family_frames(spark, paths)
        n_docs, n_emb = docs.count(), emb.count()
        out.append(
            {
                "family": "_amplify",
                "factor": factor,
                "docs": n_docs,
                "embeddings": n_emb,
                "wall_s": round(time.perf_counter() - t0, 3),
            }
        )
        for fam, fn in runners.items():
            prepare = getattr(fn, "prepare", None)
            if prepare is not None:
                # ingest-side setup (e.g. the persisted ANN index) runs
                # OUTSIDE the measured block — the family row measures
                # the steady-state query path, not the one-time build
                prepare(spark, docs, emb, ev, factor)
            row = metrics.measure(
                lambda: fn(spark, docs, emb, ev, factor)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            row.update({"family": fam, "factor": factor, "docs": n_docs, "embeddings": n_emb})
            out.append(row)
    return out
