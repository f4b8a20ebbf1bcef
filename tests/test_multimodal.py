"""Multimodal plumbing tests: schemas, Arrow batch shape, determinism,
stub gating. The codec itself is stubbed (no PIL/ffmpeg in this env) —
these tests pin down everything around it."""

from __future__ import annotations

import hashlib

import pytest

from iceberg_matrix_spark.operators.multimodal import (
    _FEATURE_DIM,
    attach_media,
    decode_media,
    extract_features,
    resize_images,
    sample_frames,
)
from iceberg_matrix_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return attach_media(load_table(spark, sf_dir, "documents"))


def test_media_schema_and_payload_determinism(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["media_meta"].startswith("struct<width:int")
    row = media.filter("doc_id = 4").collect()[0]
    # payload = md5('4') hex repeated (4 % 7 + 1) = 5 times
    expect = hashlib.md5(b"4").hexdigest().encode() * 5
    assert bytes(row["payload"]) == expect
    assert row["media_type"] == "audio"  # 4 % 3 == 1
    assert row["media_meta"]["sample_rate"] == 16000
    assert row["media_meta"]["width"] is None  # audio has no dimensions


def test_decode_media_matches_python_ground_truth(media):
    out = decode_media(media.filter("doc_id IN (3, 4)")).collect()
    by_id = {r["doc_id"]: r for r in out}
    payload = hashlib.md5(b"3").hexdigest().encode() * 4  # 3 % 7 + 1 = 4
    assert by_id[3]["n_bytes"] == len(payload)
    assert by_id[3]["checksum"] == sum(payload) % (1 << 31)
    assert by_id[3]["mean_intensity"] == pytest.approx(sum(payload) / len(payload))
    # image row decodes its metadata dimensions: doc_id 3 → image
    assert by_id[3]["decoded_width"] == 64 + (3 % 16) * 32
    assert by_id[4]["decoded_width"] == 0  # audio: no dimensions


def test_decode_is_deterministic_across_runs(media):
    one = sorted(map(tuple, decode_media(media).limit(50).collect()))
    two = sorted(map(tuple, decode_media(media).limit(50).collect()))
    assert one == two


def test_extract_features_fixed_dim_float_vectors(media):
    out = extract_features(media.limit(20))
    assert dict(out.dtypes)["features"] == "array<float>"
    rows = out.collect()
    assert rows and all(len(r["features"]) == _FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])


def test_resize_requires_codec_or_stub(media):
    with pytest.raises(NotImplementedError, match="codec"):
        resize_images(media, 224, 224, require_codec=True)
    out = resize_images(media, 224, 224)
    rows = out.limit(5).collect()
    assert rows
    assert all(r["media_type"] == "image" for r in rows)
    assert all(
        r["media_meta"]["width"] == 224 and r["media_meta"]["height"] == 224
        for r in rows
    )


def test_sample_frames_counts_follow_duration(media):
    out = sample_frames(media, every_ms=1000)
    rows = out.filter("doc_id = 2").collect()  # 2 % 3 == 2 → video
    duration = (2 % 50) * 700 + 1000  # 2400 ms → frames at 0,1000,2000
    assert [r["frame_ts_ms"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [
        0,
        1000,
        2000,
    ]
    assert all(r["frame_idx"] == r["frame_ts_ms"] // 1000 for r in rows)


def test_neardup_finds_planted_perturbations_and_skips_strangers(spark):
    """Planted perceptual near-dups: payloads differing in ≤3 feature
    windows must pair (the banded-exact blocking's pigeonhole recall
    floor — ≤3 touched dims of 16 leave a whole band intact), unrelated
    payloads must not, and the emitted l1 must equal the exact integer
    feature distance computed independently in Python."""
    import numpy as np
    import pyspark.sql.functions as F

    from iceberg_matrix_spark.operators.multimodal import (
        _FEATURE_DIM,
        media_neardup_pairs,
    )
    from iceberg_matrix_spark.session import local_df

    base = b"0123456789abcdef" * 8  # 128 bytes → window 8
    tweak1 = base[:-1] + b"z"  # 1 window touched
    # +1 edits at bytes 8/48/88 → dims 1, 6, 11 (bands 0, 1, 2) touched;
    # band 3 intact — the pigeonhole case with THREE perturbed dims
    t = bytearray(base)
    for p in (8, 48, 88):
        t[p] += 1
    tweak3 = bytes(t)
    stranger = bytes((i * 37 + 11) % 256 for i in range(128))
    rows = [
        (1, "image", bytearray(base)),
        (2, "image", bytearray(tweak1)),
        (3, "image", bytearray(tweak3)),
        (4, "image", bytearray(stranger)),
    ]
    media = local_df(
        spark, rows, "doc_id bigint, media_type string, payload binary"
    )
    got = {(r.id1, r.id2): r.l1 for r in media_neardup_pairs(media).collect()}

    def iq(p: bytes) -> list[int]:
        arr = np.frombuffer(p, dtype=np.uint8)
        w = len(arr) // _FEATURE_DIM
        return [int(arr[d * w : (d + 1) * w].sum() % 256) for d in range(_FEATURE_DIM)]

    def l1(a: bytes, b: bytes) -> int:
        # circular per-dim distance on Z/256, matching the operator
        return sum(
            min(abs(x - y), 256 - abs(x - y)) for x, y in zip(iq(a), iq(b))
        )

    assert (1, 2) in got and got[(1, 2)] == l1(base, tweak1)
    assert (1, 3) in got and got[(1, 3)] == l1(base, tweak3)
    assert all(4 not in pair for pair in got), got


def test_neardup_survives_mod256_wraparound(spark):
    """ADVICE r8 regression: a perturbation that wraps a feature dim past
    255 must still pair. Payload engineered so the last dim's byte-sum
    is 250; the +δ edit wraps it to a small value — plain |a−b| reads
    ~246 (> the 128 threshold) and loses the pair, the circular metric
    reads ≤ δ and keeps it."""
    from iceberg_matrix_spark.operators.multimodal import (
        _FEATURE_DIM,
        _ND_L1_MAX,
        media_neardup_pairs,
    )
    from iceberg_matrix_spark.session import local_df

    # 128-byte payload of zeros except the last window sums to 250
    base = bytearray(128)
    base[-1] = 250  # dim 15 byte-sum = 250
    tweak = bytearray(base)
    tweak[-1] = (250 + 60) % 256  # raw delta +60 wraps: 250 → 54
    rows = [(1, "image", base), (2, "image", bytes(tweak))]
    media = local_df(
        spark, rows, "doc_id bigint, media_type string, payload binary"
    )
    got = {(r.id1, r.id2): r.l1 for r in media_neardup_pairs(media).collect()}
    assert (1, 2) in got, "wrapped near-dup lost — circular metric broken"
    assert got[(1, 2)] == min(60, 256 - 60) <= _ND_L1_MAX
    assert _FEATURE_DIM == 16
