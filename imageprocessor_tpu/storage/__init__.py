"""Persistence backends behind small interfaces.

Mirrors the reference's repository layer (reference:
internal/repository/image/cloud/minio/minio.go — blobs;
internal/repository/image/db/postgres/postgres.go — metadata) with
pluggable backends selected by config:

* object store: local filesystem (default, zero-dependency) or any
  S3-compatible endpoint (MinIO included) via a built-in SigV4 client;
* metadata store: SQLite (default) or PostgreSQL (requires a driver,
  gated — the wire semantics match the reference's schema and queries).
"""

from imageprocessor_tpu.storage.object_store import ObjectStore, build_object_store
from imageprocessor_tpu.storage.localfs import LocalFSObjectStore
from imageprocessor_tpu.storage.metadata import MetadataStore, build_metadata_store
from imageprocessor_tpu.storage.sqlite_meta import SQLiteMetadataStore

__all__ = [
    "ObjectStore",
    "LocalFSObjectStore",
    "MetadataStore",
    "SQLiteMetadataStore",
    "build_object_store",
    "build_metadata_store",
]
