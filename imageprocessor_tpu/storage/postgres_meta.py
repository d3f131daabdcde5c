"""PostgreSQL metadata store.

Implements the same interface/queries as the SQLite backend against the
reference's schema (reference: migrations/001_create_images_table.sql;
query semantics postgres.go:29-298), over the built-in zero-dependency
wire-protocol driver (storage/pgwire.py) — no psycopg needed. Covered by
the shared MetadataStore contract tests (tests/test_storage.py) running
against an in-process wire-compatible stub server, and usable against
real Postgres (trust/password/md5/SCRAM auth).
"""

from __future__ import annotations

import contextlib
import datetime as _dt
import threading
import uuid

from imageprocessor_tpu.domain import Image, ImageStatus, OperationType, ProcessedImage
from imageprocessor_tpu.storage import pgwire
from imageprocessor_tpu.storage.metadata import (
    MetadataStore,
    NotFound,
    row_to_image,
    row_to_processed,
)

MIGRATION_SQL = """
CREATE TABLE IF NOT EXISTS images (
    id VARCHAR(36) PRIMARY KEY,
    original_filename VARCHAR(255) NOT NULL,
    original_size BIGINT NOT NULL,
    mime_type VARCHAR(100) NOT NULL,
    status VARCHAR(20) NOT NULL DEFAULT 'uploaded',
    original_path VARCHAR(500) NOT NULL,
    bucket VARCHAR(100) NOT NULL,
    created_at TIMESTAMP NOT NULL DEFAULT NOW(),
    updated_at TIMESTAMP NOT NULL DEFAULT NOW()
);
CREATE TABLE IF NOT EXISTS processed_images (
    id VARCHAR(36) PRIMARY KEY,
    image_id VARCHAR(36) NOT NULL REFERENCES images(id) ON DELETE CASCADE,
    operation VARCHAR(50) NOT NULL,
    parameters TEXT,
    path VARCHAR(500) NOT NULL,
    size BIGINT NOT NULL,
    mime_type VARCHAR(100) NOT NULL,
    format VARCHAR(10) NOT NULL,
    status VARCHAR(20) NOT NULL DEFAULT 'processing',
    created_at TIMESTAMP NOT NULL DEFAULT NOW()
);
CREATE INDEX IF NOT EXISTS idx_images_status ON images(status);
CREATE INDEX IF NOT EXISTS idx_processed_images_image_id
    ON processed_images(image_id);
CREATE INDEX IF NOT EXISTS idx_processed_images_operation
    ON processed_images(operation);
"""

# See sqlite_meta: dedup runs only when the unique-index creation fails
# on a legacy database with pre-upsert duplicates, so the full-table
# scan happens at most once per database.
_DEDUP_SQL = """
DELETE FROM processed_images WHERE id NOT IN (
    SELECT MIN(id) FROM processed_images
    GROUP BY image_id, operation, path)
"""
_REPLAY_INDEX_SQL = """
CREATE UNIQUE INDEX IF NOT EXISTS idx_processed_images_replay
    ON processed_images(image_id, operation, path)
"""


def _ts(v) -> _dt.datetime:
    """Timestamps arrive as datetime from the wire driver; tolerate text
    (e.g. test doubles that don't type their columns). Postgres TIMESTAMP
    (no tz) strips tzinfo on the round-trip — re-attach UTC so read-back
    entities render identically to freshly created ones ("Z" suffix) and
    aware/naive comparisons can't raise."""
    if not isinstance(v, _dt.datetime):
        v = _dt.datetime.fromisoformat(str(v))
    if v.tzinfo is None:
        v = v.replace(tzinfo=_dt.timezone.utc)
    return v


class PostgresMetadataStore(MetadataStore):
    def __init__(self, cfg):
        self._dsn = cfg.dsn()
        self._conn = pgwire.connect(self._dsn)
        self._conn.autocommit = True
        # pgwire.Connection is a single socket with no internal locking;
        # the store contract is internal thread-safety (the pipelined
        # worker calls save_processed_image/update_status from several
        # stage threads concurrently), so serialize every query here —
        # exactly like SQLiteMetadataStore does.
        self._lock = threading.Lock()
        with self._cursor() as cur:
            cur.execute(MIGRATION_SQL)
        try:
            with self._cursor() as cur:
                cur.execute(_REPLAY_INDEX_SQL)
        except pgwire.PgError:
            # legacy DB with pre-upsert duplicates: dedup once, retry
            with self._cursor() as cur:
                cur.execute(_DEDUP_SQL)
            with self._cursor() as cur:
                cur.execute(_REPLAY_INDEX_SQL)

    @contextlib.contextmanager
    def _cursor(self):
        with self._lock:
            if self._conn._broken:
                # a mid-protocol I/O error poisoned the old session; the
                # failed call already surfaced a PgError (retried at the
                # usecase layer) — later calls get a fresh connection.
                self._conn = pgwire.connect(self._dsn)
                self._conn.autocommit = True
            with self._conn.cursor() as cur:
                yield cur

    def save_image(self, image: Image) -> None:
        with self._cursor() as cur:
            cur.execute(
                "INSERT INTO images (id, original_filename, original_size,"
                " mime_type, status, original_path, bucket, created_at,"
                " updated_at) VALUES (%s,%s,%s,%s,%s,%s,%s,%s,%s)",
                (image.id, image.original_filename, image.original_size,
                 image.mime_type, str(image.status), image.original_path,
                 image.bucket, image.created_at, image.updated_at))

    def get_image(self, image_id: str) -> Image:
        with self._cursor() as cur:
            cur.execute(
                "SELECT id, original_filename, original_size, mime_type,"
                " status, original_path, bucket, created_at, updated_at"
                " FROM images WHERE id = %s AND status != 'deleted'",
                (image_id,))
            row = cur.fetchone()
        if row is None:
            raise NotFound(image_id)
        return row_to_image(row, _ts)

    def update_status(self, image_id: str, status: ImageStatus) -> None:
        # Soft delete is FINAL (see sqlite_meta): late worker callbacks
        # must not resurrect a deleted image.
        with self._cursor() as cur:
            cur.execute(
                "UPDATE images SET status = %s, updated_at = %s"
                " WHERE id = %s AND status != 'deleted'",
                (str(status), _dt.datetime.now(_dt.timezone.utc), image_id))
            if cur.rowcount == 0:
                raise NotFound(image_id)

    def save_processed_image(self, processed: ProcessedImage) -> None:
        with self._cursor() as cur:
            # Idempotent under at-least-once replay (see sqlite_meta):
            # an atomic UPSERT on idx_processed_images_replay — two
            # workers replaying the same lease-expired message (the
            # autocommit connection gives delete+insert no transaction
            # to hide in) cannot produce duplicate rows.
            cur.execute(
                "INSERT INTO processed_images (id, image_id, operation,"
                " parameters, path, size, mime_type, format, status,"
                " created_at) VALUES (%s,%s,%s,%s,%s,%s,%s,%s,%s,%s)"
                " ON CONFLICT (image_id, operation, path) DO UPDATE SET"
                " parameters=excluded.parameters, size=excluded.size,"
                " mime_type=excluded.mime_type, format=excluded.format,"
                " status=excluded.status, created_at=excluded.created_at",
                (processed.id or str(uuid.uuid4()), processed.image_id,
                 str(processed.operation), processed.parameters,
                 processed.path, processed.size, processed.mime_type,
                 str(processed.format), processed.status,
                 processed.created_at))

    def get_processed_by_operation(self, image_id: str,
                                   operation: str) -> ProcessedImage | None:
        with self._cursor() as cur:
            cur.execute(
                "SELECT id, image_id, operation, parameters, path, size,"
                " mime_type, format, status, created_at FROM processed_images"
                " WHERE image_id = %s AND operation = %s"
                " ORDER BY created_at DESC LIMIT 1", (image_id, operation))
            row = cur.fetchone()
        if row is None:
            return None
        return row_to_processed(row, _ts)

    def list_processed(self, image_id: str) -> list[ProcessedImage]:
        with self._cursor() as cur:
            cur.execute(
                "SELECT id, image_id, operation, parameters, path, size,"
                " mime_type, format, status, created_at FROM processed_images"
                " WHERE image_id = %s ORDER BY created_at", (image_id,))
            rows = cur.fetchall()
        return [row_to_processed(r, _ts) for r in rows]

    def delete_processed_images(self, image_id: str) -> None:
        with self._cursor() as cur:
            cur.execute("DELETE FROM processed_images WHERE image_id = %s",
                        (image_id,))

    def list_images(self, limit: int = 50, offset: int = 0) -> list[Image]:
        with self._cursor() as cur:
            cur.execute(
                "SELECT id, original_filename, original_size, mime_type,"
                " status, original_path, bucket, created_at, updated_at"
                " FROM images WHERE status != 'deleted'"
                " ORDER BY created_at DESC LIMIT %s OFFSET %s",
                (limit, offset))
            rows = cur.fetchall()
        return [row_to_image(r, _ts) for r in rows]

    def close(self) -> None:
        # Serialize against in-flight queries like every other method:
        # an unlocked Terminate mid-response desyncs the single pgwire
        # socket and loses the other thread's write.
        with self._lock:
            self._conn.close()
