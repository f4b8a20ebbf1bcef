"""Metadata-location sink: publish a JSON manifest to an object-store URI.

The reference's capability-manifest sink serializes a result dict and
``put_object``s it at a URI (behavioral reference:
/root/reference/tests/aws/redshift_fixtures.py:224-233). This is
driver-side plumbing, not a Spark operator — so the implementation is a
small pluggable object-store protocol:

- :class:`LocalObjectStore` handles ``file://`` URIs and bare paths
  (atomically: temp file + rename, so a reader never sees a torn
  manifest) — fully exercisable in the sandbox.
- :class:`S3ObjectStore` is the boto3 path, import-gated: constructing it
  without boto3 raises with a clear message. Its request shape mirrors
  the reference (Bucket/Key/Body/ContentType) and is unit-testable via a
  client double; the network call itself is environment-blocked here.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Protocol
from urllib.parse import urlparse


class ObjectStore(Protocol):
    def put_object(self, uri: str, body: bytes, content_type: str) -> None: ...

    def get_object(self, uri: str) -> bytes: ...


class LocalObjectStore:
    """file:// (or bare-path) object store with atomic publication."""

    @staticmethod
    def _path(uri: str) -> str:
        parsed = urlparse(uri)
        if parsed.scheme in ("", "file"):
            return parsed.path or uri
        raise ValueError(f"LocalObjectStore cannot handle {uri!r}")

    def put_object(self, uri: str, body: bytes, content_type: str) -> None:
        path = self._path(uri)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", prefix=".manifest-")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(body)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, path)  # atomic: readers see old or new, never torn
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def get_object(self, uri: str) -> bytes:
        with open(self._path(uri), "rb") as fh:
            return fh.read()


class S3ObjectStore:
    """boto3-backed store; the client is injectable for offline tests."""

    def __init__(self, client=None):
        if client is None:
            try:
                import boto3  # noqa: PLC0415
            except ImportError as exc:  # pragma: no cover - boto3 absent here
                raise RuntimeError(
                    "S3ObjectStore requires boto3 (not installed in this "
                    "environment); use LocalObjectStore or inject a client"
                ) from exc
            client = boto3.client("s3")
        self.client = client

    def put_object(self, uri: str, body: bytes, content_type: str) -> None:
        parsed = urlparse(uri)
        if parsed.scheme != "s3":
            raise ValueError(f"S3ObjectStore cannot handle {uri!r}")
        self.client.put_object(
            Bucket=parsed.netloc,
            Key=parsed.path.lstrip("/"),
            Body=body,
            ContentType=content_type,
        )

    def get_object(self, uri: str) -> bytes:
        parsed = urlparse(uri)
        obj = self.client.get_object(Bucket=parsed.netloc, Key=parsed.path.lstrip("/"))
        return obj["Body"].read()


def store_for_uri(uri: str) -> ObjectStore:
    return S3ObjectStore() if urlparse(uri).scheme == "s3" else LocalObjectStore()


def publish_manifest(manifest: dict, uri: str, store: ObjectStore | None = None) -> str:
    """Serialize ``manifest`` and publish it at ``uri``; returns the URI."""
    store = store or store_for_uri(uri)
    body = json.dumps(manifest, indent=2, sort_keys=True).encode()
    store.put_object(uri, body, "application/json")
    return uri


def read_manifest(uri: str, store: ObjectStore | None = None) -> dict:
    store = store or store_for_uri(uri)
    return json.loads(store.get_object(uri).decode())
