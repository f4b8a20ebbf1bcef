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
