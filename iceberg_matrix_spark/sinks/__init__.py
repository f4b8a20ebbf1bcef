"""Sinks: publishing results to object stores (see sinks/manifest.py)."""

from iceberg_matrix_spark.sinks.manifest import (
    LocalObjectStore,
    S3ObjectStore,
    publish_manifest,
    read_manifest,
    store_for_uri,
)

__all__ = [
    "LocalObjectStore",
    "S3ObjectStore",
    "publish_manifest",
    "read_manifest",
    "store_for_uri",
]
