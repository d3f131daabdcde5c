"""PostgreSQL metadata store (driver-gated).

Implements the same interface/queries as the SQLite backend against the
reference's schema (reference: migrations/001_create_images_table.sql;
query semantics postgres.go:29-298). This environment ships no Postgres
driver, so construction raises a clear error unless `psycopg2`/`psycopg`
is importable; the SQL below is the contract and is covered by the shared
interface test suite when a driver is present.
"""

from __future__ import annotations

import datetime as _dt
import uuid

from imageprocessor_tpu.domain import Image, ImageStatus, OperationType, ProcessedImage
from imageprocessor_tpu.storage.metadata import MetadataError, MetadataStore, NotFound

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


def _driver():
    try:
        import psycopg  # psycopg3

        return psycopg
    except ImportError:
        pass
    try:
        import psycopg2

        return psycopg2
    except ImportError:
        pass
    raise MetadataError(
        "postgres metadata backend requires psycopg/psycopg2, which is not "
        "installed in this environment; use METADATA_BACKEND=sqlite")


class PostgresMetadataStore(MetadataStore):
    def __init__(self, cfg):
        drv = _driver()
        self._conn = drv.connect(cfg.dsn())
        self._conn.autocommit = True
        with self._conn.cursor() as cur:
            cur.execute(MIGRATION_SQL)

    def save_image(self, image: Image) -> None:
        with self._conn.cursor() as cur:
            cur.execute(
                "INSERT INTO images (id, original_filename, original_size,"
                " mime_type, status, original_path, bucket, created_at,"
                " updated_at) VALUES (%s,%s,%s,%s,%s,%s,%s,%s,%s)",
                (image.id, image.original_filename, image.original_size,
                 image.mime_type, str(image.status), image.original_path,
                 image.bucket, image.created_at, image.updated_at))

    def get_image(self, image_id: str) -> Image:
        with self._conn.cursor() as cur:
            cur.execute(
                "SELECT id, original_filename, original_size, mime_type,"
                " status, original_path, bucket, created_at, updated_at"
                " FROM images WHERE id = %s AND status != 'deleted'",
                (image_id,))
            row = cur.fetchone()
        if row is None:
            raise NotFound(image_id)
        return Image(id=row[0], original_filename=row[1], original_size=row[2],
                     mime_type=row[3], status=ImageStatus(row[4]),
                     original_path=row[5], bucket=row[6], created_at=row[7],
                     updated_at=row[8])

    def update_status(self, image_id: str, status: ImageStatus) -> None:
        with self._conn.cursor() as cur:
            cur.execute(
                "UPDATE images SET status = %s, updated_at = %s WHERE id = %s",
                (str(status), _dt.datetime.now(_dt.timezone.utc), image_id))
            if cur.rowcount == 0:
                raise NotFound(image_id)

    def save_processed_image(self, processed: ProcessedImage) -> None:
        with self._conn.cursor() as cur:
            cur.execute(
                "INSERT INTO processed_images (id, image_id, operation,"
                " parameters, path, size, mime_type, format, status,"
                " created_at) VALUES (%s,%s,%s,%s,%s,%s,%s,%s,%s,%s)",
                (processed.id or str(uuid.uuid4()), processed.image_id,
                 str(processed.operation), processed.parameters,
                 processed.path, processed.size, processed.mime_type,
                 str(processed.format), processed.status,
                 processed.created_at))

    def get_processed_by_operation(self, image_id: str,
                                   operation: str) -> ProcessedImage | None:
        with self._conn.cursor() as cur:
            cur.execute(
                "SELECT id, image_id, operation, parameters, path, size,"
                " mime_type, format, status, created_at FROM processed_images"
                " WHERE image_id = %s AND operation = %s"
                " ORDER BY created_at DESC LIMIT 1", (image_id, operation))
            row = cur.fetchone()
        if row is None:
            return None
        return ProcessedImage(id=row[0], image_id=row[1],
                              operation=OperationType(row[2]),
                              parameters=row[3] or "", path=row[4],
                              size=row[5], mime_type=row[6], format=row[7],
                              status=row[8], created_at=row[9])

    def list_processed(self, image_id: str) -> list[ProcessedImage]:
        with self._conn.cursor() as cur:
            cur.execute(
                "SELECT id, image_id, operation, parameters, path, size,"
                " mime_type, format, status, created_at FROM processed_images"
                " WHERE image_id = %s ORDER BY created_at", (image_id,))
            rows = cur.fetchall()
        return [ProcessedImage(id=r[0], image_id=r[1],
                               operation=OperationType(r[2]),
                               parameters=r[3] or "", path=r[4], size=r[5],
                               mime_type=r[6], format=r[7], status=r[8],
                               created_at=r[9]) for r in rows]

    def delete_processed_images(self, image_id: str) -> None:
        with self._conn.cursor() as cur:
            cur.execute("DELETE FROM processed_images WHERE image_id = %s",
                        (image_id,))

    def list_images(self, limit: int = 50, offset: int = 0) -> list[Image]:
        with self._conn.cursor() as cur:
            cur.execute(
                "SELECT id, original_filename, original_size, mime_type,"
                " status, original_path, bucket, created_at, updated_at"
                " FROM images WHERE status != 'deleted'"
                " ORDER BY created_at DESC LIMIT %s OFFSET %s",
                (limit, offset))
            rows = cur.fetchall()
        return [Image(id=r[0], original_filename=r[1], original_size=r[2],
                      mime_type=r[3], status=ImageStatus(r[4]),
                      original_path=r[5], bucket=r[6], created_at=r[7],
                      updated_at=r[8]) for r in rows]

    def close(self) -> None:
        self._conn.close()
