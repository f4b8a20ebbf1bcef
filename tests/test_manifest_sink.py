"""Manifest sink: local backend end-to-end, S3 backend via client double."""

from __future__ import annotations

import os
import tempfile

import pytest

from iceberg_matrix_spark.sinks import (
    LocalObjectStore,
    S3ObjectStore,
    publish_manifest,
    read_manifest,
    store_for_uri,
)


def test_local_roundtrip_and_atomic_overwrite():
    uri = f"file://{tempfile.mkdtemp()}/sub/dir/manifest.json"
    m1 = {"fixtures": {"a": {"created": True}}, "n": 1}
    assert publish_manifest(m1, uri) == uri
    assert read_manifest(uri) == m1
    m2 = {"fixtures": {}, "n": 2}
    publish_manifest(m2, uri)  # overwrite goes through temp+rename
    assert read_manifest(uri) == m2
    # no temp litter left behind
    d = os.path.dirname(uri.removeprefix("file://"))
    assert [f for f in os.listdir(d) if f.startswith(".manifest-")] == []


def test_store_dispatch():
    assert isinstance(store_for_uri("file:///x/y.json"), LocalObjectStore)
    assert isinstance(store_for_uri("/x/y.json"), LocalObjectStore)
    # s3:// dispatches to the boto3 store (boto3 is importable here; only
    # the network call itself is environment-blocked)
    assert isinstance(store_for_uri("s3://bucket/key.json"), S3ObjectStore)


class _FakeS3Client:
    def __init__(self):
        self.objects: dict[tuple[str, str], tuple[bytes, str]] = {}

    def put_object(self, Bucket, Key, Body, ContentType):
        self.objects[(Bucket, Key)] = (Body, ContentType)

    def get_object(self, Bucket, Key):
        body, _ = self.objects[(Bucket, Key)]
        import io

        return {"Body": io.BytesIO(body)}


def test_s3_store_request_shape_with_client_double():
    client = _FakeS3Client()
    store = S3ObjectStore(client=client)
    m = {"fixtures": {"redshift": {"created": False}}}
    publish_manifest(m, "s3://caps-bucket/manifests/run1.json", store=store)
    body, ctype = client.objects[("caps-bucket", "manifests/run1.json")]
    assert ctype == "application/json"
    assert read_manifest("s3://caps-bucket/manifests/run1.json", store=store) == m
    with pytest.raises(ValueError):
        store.put_object("file:///nope", b"x", "application/json")
