"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star surface (BASELINE.json): a 100 TB training-data pipeline keeps
media as ``binary`` columns with a typed metadata struct, and runs
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages. The image/audio codec libraries are NOT in this
container, so the codec step is STUBBED — ``_decode_bytes`` falls back to
a deterministic fake decoder (and ``resize_images(..., require_codec=True)``
raises NotImplementedError) — while everything Spark-side is real and
tested: schemas, Arrow batch shapes, partition behavior, explode logic.

Scale notes:
- media payloads never pass through Python row-at-a-time paths: one
  ``mapInPandas`` stage per transform, Arrow-batched;
- frame sampling is a JVM-side ``explode(sequence(...))`` on metadata —
  the payload column is carried, not copied per frame (Tungsten keeps a
  reference within the row batch);
- metadata-only analytics (the common case) never touch the binary
  column at all — column pruning drops it at the parquet scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_matrix_spark.queries.registry import register
from iceberg_matrix_spark.sources.testdata import load_table

MEDIA_TYPES = ["image", "audio", "video"]

# ---------------------------------------------------------------------------
# Synthetic media attachment (testdata has no binary columns; payload and
# metadata are DETERMINISTIC functions of doc_id so oracles can reproduce
# everything except the bytes themselves)
# ---------------------------------------------------------------------------


def attach_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents → media rows: (doc_id, media_type, meta struct, payload).

    payload = repeat(md5(doc_id), copies) as binary — deterministic,
    size-varying, and reproducible in SQL (length checks only).
    """
    # payload synthesis (md5 + repeat per row) and every downstream
    # decode/fingerprint stage inherit the scan's split count; a
    # single-file corpus plans ONE task (round 11) — round-robin the
    # id projection, no-op at scale
    from iceberg_matrix_spark.operators.scale import (  # noqa: PLC0415
        ensure_compute_parallelism,
    )

    docs = ensure_compute_parallelism(docs.select(F.col(id_col)))
    did = F.col(id_col)
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (did % 3 + 1).cast("int")
    )
    width = (F.lit(64) + (did % 16) * 32).cast("int")
    height = (F.lit(64) + (did % 9) * 32).cast("int")
    duration_ms = ((did % 50) * 700 + 1000).cast("bigint")
    sample_rate = F.when(media_type == "audio", F.lit(16000)).cast("int")
    copies = (did % 7 + 1).cast("int")
    return docs.select(
        did.alias("doc_id"),
        media_type.alias("media_type"),
        F.struct(
            F.when(media_type != "audio", width).alias("width"),
            F.when(media_type != "audio", height).alias("height"),
            F.when(media_type != "image", duration_ms).alias("duration_ms"),
            sample_rate.alias("sample_rate"),
            F.lit("stub-codec-v1").alias("codec"),
        ).alias("media_meta"),
        F.repeat(F.md5(did.cast("string")), copies).cast("binary").alias("payload"),
    )


# ---------------------------------------------------------------------------
# Codec stub
# ---------------------------------------------------------------------------


def _codec_available() -> bool:
    try:  # pragma: no cover - PIL is absent in this container
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_bytes(payload: bytes, width: int, height: int) -> dict:
    """STUB decoder: a real build calls PIL/ffmpeg here. The fake is
    deterministic in the payload bytes so tests can assert exact values."""
    total = sum(payload)
    return {
        "n_bytes": len(payload),
        "checksum": total % (1 << 31),
        "mean_intensity": (total / len(payload)) if payload else 0.0,
        "decoded_width": width,
        "decoded_height": height,
    }


# ---------------------------------------------------------------------------
# mapInPandas stages
# ---------------------------------------------------------------------------

_DECODE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, checksum bigint, "
    "mean_intensity double, decoded_width int, decoded_height int"
)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: binary payload → per-item decode stats.

    The pandas iterator shape is the real contract: each batch arrives as
    a DataFrame slice, payloads as Python bytes, and the stage may emit a
    different row count than it received (here 1:1)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["media_meta"]
            decoded = [
                _decode_bytes(
                    payload,
                    int(m["width"]) if m["width"] is not None else 0,
                    int(m["height"]) if m["height"] is not None else 0,
                )
                for payload, m in zip(pdf["payload"], meta)
            ]
            out = pd.DataFrame(decoded)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(decode, schema=_DECODE_SCHEMA)


_FEATURE_DIM = 16
_FEATURES_SCHEMA = f"doc_id bigint, features array<float>"


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stage: payload → fixed-dim float vector.

    A real build runs a vision/audio encoder per batch; the stub hashes
    byte windows. Everything around it — Arrow transfer, fixed-dim
    array<float> output, downstream ANN compatibility — is the real
    pipeline shape."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            vecs = []
            for payload in pdf["payload"]:
                # Vectorized even in the stub (the shape a real codec
                # stage should take): window sums via reshape, windows
                # past the payload end read as zero like the slice sum.
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                # ceil-sized: floor would TRUNCATE the trailing
                # len % _FEATURE_DIM bytes (two payloads differing only
                # in the tail would collide) instead of zero-padding
                window = max(1, -(-len(arr) // _FEATURE_DIM))
                buf = np.zeros(_FEATURE_DIM * window, dtype=np.int64)
                n = min(len(arr), buf.size)
                buf[:n] = arr[:n]
                vec = (buf.reshape(_FEATURE_DIM, window).sum(axis=1) % 256) / 255.0
                vecs.append(vec.astype("float64").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": vecs})

    return media.mapInPandas(feats, schema=_FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, target_width: int, target_height: int, require_codec: bool = False
) -> DataFrame:
    """Resize stage. Without a codec library this is a metadata-only
    transform (new width/height recorded, payload passed through); with
    ``require_codec=True`` it refuses to pretend."""
    if require_codec and not _codec_available():
        raise NotImplementedError(
            "image resize needs a codec library (PIL/opencv) not present "
            "in this environment; run with require_codec=False for the "
            "metadata-only stub"
        )
    return media.filter(F.col("media_type") == "image").select(
        "doc_id",
        "media_type",
        F.col("media_meta").withField("width", F.lit(target_width)).withField(
            "height", F.lit(target_height)
        ).alias("media_meta"),
        "payload",
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for videos: one row per sampled timestamp.

    JVM-side explode over ``sequence(0, duration, step)`` — no Python in
    the hot path; the (stubbed) per-frame decode would be a later
    mapInPandas stage over the exploded rows."""
    vids = media.filter(F.col("media_type") == "video")
    return vids.select(
        "doc_id",
        F.posexplode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.col("media_meta.duration_ms"),
                F.lit(every_ms).cast("bigint"),
            )
        ).alias("frame_idx", "frame_ts_ms"),
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

_MEDIA_SQL = """
  media AS (
    SELECT doc_id,
           ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           CAST(64 + (doc_id % 16) * 32 AS INT) AS width,
           CAST(64 + (doc_id % 9) * 32 AS INT) AS height,
           CAST((doc_id % 50) * 700 + 1000 AS BIGINT) AS duration_ms,
           CAST(doc_id % 7 + 1 AS INT) AS copies
    FROM documents
  )
"""


@register(
    "q_multimodal_meta_stats",
    oracle=f"""
    WITH {_MEDIA_SQL}
    SELECT media_type,
           COUNT(*) AS n_items,
           CAST(SUM(copies * 32) AS BIGINT) AS total_bytes,
           CAST(MAX(CASE WHEN media_type <> 'audio' THEN width END) AS INT) AS max_width,
           CAST(SUM(CASE WHEN media_type <> 'image' THEN duration_ms ELSE 0 END) AS BIGINT)
             AS total_duration_ms
    FROM media GROUP BY media_type
    """,
)
def q_multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only analytics over the media table — the binary column is
    pruned at the scan (check ReadSchema in .explain)."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max("media_meta.width").alias("max_width"),
        F.sum(F.coalesce(F.col("media_meta.duration_ms"), F.lit(0))).alias(
            "total_duration_ms"
        ),
    )


@register(
    "q_multimodal_frame_sample",
    oracle=f"""
    WITH {_MEDIA_SQL}
    SELECT doc_id,
           CAST(unnest(generate_series(0, CAST(duration_ms // 1000 AS INT))) AS INT)
             AS frame_idx,
           CAST(unnest(generate_series(0, CAST(duration_ms // 1000 AS INT))) * 1000 AS BIGINT)
             AS frame_ts_ms
    FROM media WHERE media_type = 'video'
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: explode sampled timestamps per video."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, every_ms=1000)


@register(
    "q_multimodal_decode",
    # The codec is a stub, but a DETERMINISTIC one: payload =
    # repeat(md5(doc_id), copies) as ASCII hex, so n_bytes/checksum/mean
    # are exact functions of doc_id that DuckDB can recompute — the
    # Arrow-batched mapInPandas stage gets a full value oracle, not just
    # a rows-only check. (A real codec build would drop back to
    # rows-only + golden-file tests.)
    oracle="""
    WITH m AS (
      SELECT doc_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             CAST(doc_id % 7 + 1 AS BIGINT) AS copies,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    s AS (
      SELECT doc_id, media_type, copies,
             CAST(list_sum(list_transform(generate_series(1, 32),
                                          i -> ascii(substring(h, i, 1)))) AS BIGINT) AS s32
      FROM m
    )
    SELECT doc_id, media_type,
           CAST(copies * 32 AS INT) AS n_bytes,
           (copies * s32) % 2147483648 AS checksum,
           CAST(copies * s32 AS DOUBLE) / (copies * 32) AS mean_intensity,
           CAST(CASE WHEN media_type <> 'audio' THEN 64 + (doc_id % 16) * 32 ELSE 0 END AS INT)
             AS decoded_width,
           CAST(CASE WHEN media_type <> 'audio' THEN 64 + (doc_id % 9) * 32 ELSE 0 END AS INT)
             AS decoded_height
    FROM s
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode stage over every media item (stub codec)."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return decode_media(media)


@register(
    "q_multimodal_dedup",
    oracle="""
    WITH allm AS (
      SELECT doc_id, doc_id AS orig FROM documents
      UNION ALL
      SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), doc_id
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             ['image', 'audio', 'video'][CAST(orig % 3 + 1 AS INT)]
               AS media_type,
             md5(repeat(md5(CAST(orig AS VARCHAR)),
                        CAST(orig % 7 + 1 AS INT))) AS fp
      FROM allm
    )
    SELECT doc_id, media_type,
           doc_id = MIN(doc_id) OVER (PARTITION BY media_type, fp) AS keep
    FROM hashed
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over binary media payloads: a re-crawl batch
    (same payload bytes under re-keyed ids) unions with the original
    corpus and every item keeps only if it is the lowest id for its
    (media_type, md5-of-payload) group — byte-identical media detected
    WITHOUT decoding, the first dedup pass every multimodal pipeline
    runs. The hash is one JVM-side projection over the binary column
    (never a Python worker); the only shuffle is the per-fingerprint
    window, rows ∝ corpus. The oracle reconstructs the deterministic
    payload string and hashes it with the same md5 (binary payloads here
    are ASCII by construction, multimodal.py:attach_media). The re-key
    offset is max(doc_id)+1 — collision-free at ANY scale factor (a
    fixed 1e6 offset silently aliased re-crawl ids onto real ids once
    the corpus outgrew it, ADVICE r7 #3); the 1-row max fetch is the
    family's documented bounded driver collect."""
    docs = load_table(spark, sf_dir, "documents")
    off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    m1 = attach_media(docs)
    recrawl = attach_media(docs).withColumn(
        "doc_id", F.col("doc_id") + F.lit(off)
    )
    allm = m1.unionByName(recrawl)
    fp = F.md5(F.col("payload"))
    w = Window.partitionBy("media_type", fp)
    return allm.select(
        "doc_id",
        "media_type",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Perceptual (near-dup) media dedup — VERDICT r7 #6
# ---------------------------------------------------------------------------

_ND_BANDS = 4                                # bands over the 16 feature dims
_ND_BAND_DIMS = _FEATURE_DIM // _ND_BANDS    # dims per band
_ND_L1_MAX = 128                             # verify threshold (integer L1)


def media_feature_codes(media: DataFrame) -> DataFrame:
    """(doc_id, iq): each media item's INTEGER feature vector — the
    :func:`extract_features` Arrow stage's floats mapped back to their
    exact byte-sum values (features are k/255 by construction, so
    ``round(f·255)`` recovers the integer k losslessly). Integer codes
    are what make the near-dup verify and its DuckDB oracle hash-exact."""
    return extract_features(media).select(
        "doc_id",
        F.transform(
            "features", lambda f: F.round(f * F.lit(255.0)).cast("int")
        ).alias("iq"),
    )


def media_neardup_pairs(
    media: DataFrame, l1_max: int = _ND_L1_MAX
) -> DataFrame:
    """(id1, id2, l1) for media whose decoded feature vectors are within
    ``l1_max`` total byte-distance — perceptual near-dup, the pass AFTER
    content-hash dedup (byte-identical payloads belong to
    q_multimodal_dedup upstream).

    Blocking is banded-exact, never all-pairs: the 16 integer dims split
    into 4 bands of 4 (``_ND_BANDS`` × ``_ND_BAND_DIMS``); candidates
    must agree EXACTLY on some whole band. Deterministic recall floor by
    pigeonhole: a near-dup whose perturbation touches ≤3 dims leaves at
    least one band untouched and is guaranteed a candidate. Random
    (non-dup) features agree on a 4-byte band with p ≈ 2⁻³², so block
    populations stay tiny and the verify load ∝ true dups; degenerate
    identical-payload mass is the upstream exact pass's job, mirroring
    the fuzzy family's cap rationale. Verify is one integer zip_with
    fold (order-free, engine-exact).

    Distance is CIRCULAR per dim — min(|a−b|, 256−|a−b|) — because the
    features live on ℤ/256 (byte-sums mod 256): a small byte edit that
    wraps the sum past 0/255 is still a small perceptual move, and a
    plain |a−b| would score it near 256 and lose the pair (the round-8
    wraparound bug: a +20..+74 last-byte delta on a dim valued ≥ 256−δ
    read as L1 182..236 > the threshold)."""
    iq = media_feature_codes(media)
    banded = iq.select(
        "doc_id",
        "iq",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice(
                            "iq", b * _ND_BAND_DIMS + 1, _ND_BAND_DIMS
                        ).alias("key"),
                    )
                    for b in range(_ND_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "iq", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(
        F.col("doc_id").alias("id1"),
        F.col("iq").alias("__q1"),
        "band",
        "key",
    )
    b = banded.select(
        F.col("doc_id").alias("id2"),
        F.col("iq").alias("__q2"),
        "band",
        "key",
    )
    l1 = F.aggregate(
        F.zip_with(
            "__q1",
            "__q2",
            lambda x, y: F.least(
                F.abs(x - y), F.lit(256) - F.abs(x - y)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", l1.cast("int").alias("l1"))
        .filter(F.col("l1") <= l1_max)
        .distinct()
    )


# the oracle's exact reconstruction of the Python feature stub: payload
# is repeat(md5(id), copies) ASCII (attach_media), so integer feature d
# is the byte-sum of positions d·window .. d·window+window−1 mod 256,
# window = len/16 = 2·copies (length is divisible by 16, no padding)
_ND_IQ_SQL = """
      SELECT doc_id, (pos - 1) // (2 * copies) AS d,
             CAST(SUM(ascii(substr(payload, pos, 1))) % 256 AS INT) AS q
      FROM (
        SELECT doc_id, copies,
               repeat(md5(CAST(orig AS VARCHAR)), copies) AS payload
        FROM {src}
      ), unnest(generate_series(1, 32 * copies)) AS t(pos)
      GROUP BY doc_id, (pos - 1) // (2 * copies)
"""


@register(
    "q_multimodal_neardup",
    oracle=f"""
    WITH src AS (
      SELECT doc_id, doc_id AS orig, CAST(doc_id % 7 + 1 AS INT) AS copies,
             FALSE AS perturbed
      FROM documents
      UNION ALL
      SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), doc_id,
             CAST(doc_id % 7 + 1 AS INT), TRUE
      FROM documents
    ),
    cells AS (
      SELECT doc_id, (pos - 1) // (2 * copies) AS d,
             CAST(SUM(CASE WHEN perturbed AND pos = 32 * copies
                           THEN 122  -- ascii('z'): the perturbed last byte
                           ELSE ascii(substr(payload, pos, 1)) END)
                  % 256 AS INT) AS q
      FROM (
        SELECT doc_id, copies, perturbed,
               repeat(md5(CAST(orig AS VARCHAR)), copies) AS payload
        FROM src
      ), unnest(generate_series(1, 32 * copies)) AS t(pos)
      GROUP BY doc_id, (pos - 1) // (2 * copies)
    ),
    iq AS (
      SELECT doc_id, list(q ORDER BY d) AS iq FROM cells GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, iq, b.band,
             iq[b.band * {_ND_BAND_DIMS} + 1 : (b.band + 1) * {_ND_BAND_DIMS}] AS key
      FROM iq CROSS JOIN generate_series(0, {_ND_BANDS - 1}) AS b(band)
    ),
    pairs AS (
      SELECT x.doc_id AS id1, y.doc_id AS id2,
             CAST(list_sum(list_transform(
               list_zip(x.iq, y.iq),
               p -> least(abs(p[1] - p[2]), 256 - abs(p[1] - p[2])))) AS INT) AS l1
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
    )
    SELECT DISTINCT id1, id2, l1 FROM pairs WHERE l1 <= {_ND_L1_MAX}
    """,
)
def q_multimodal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup over media features: the corpus unions a
    deterministic re-encode of every payload (same bytes except the last
    one — a stand-in for lossy re-encoding), features run through the
    REAL Arrow extract_features stage, and banded-exact blocking + an
    integer circular-L1 verify emit each item's near-dup pairs. Every
    original pairs with its re-encode: one feature dim moves by a raw
    +20..+74, which under the circular metric is ≤74 < the 128
    threshold even when the mod-256 sum wraps (3 of 4 bands untouched
    guarantee the candidate); random cross-pairs sit at circular L1
    ≈ 1 000 (E|a−b|_circ = 64/dim × 16). Re-key offset is
    max(doc_id)+1, the q_multimodal_dedup rule."""
    docs = load_table(spark, sf_dir, "documents")
    off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    m1 = attach_media(docs)
    # deterministic "re-encode": last payload byte → 'z' (hex never ends
    # in z, so the edit always lands and always moves exactly one byte)
    perturbed = attach_media(docs).select(
        (F.col("doc_id") + F.lit(off)).alias("doc_id"),
        "media_type",
        "media_meta",
        F.concat(
            F.expr("substring(payload, 1, length(payload) - 1)").cast("string"),
            F.lit("z"),
        )
        .cast("binary")
        .alias("payload"),
    )
    return media_neardup_pairs(m1.unionByName(perturbed))
