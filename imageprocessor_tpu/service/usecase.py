"""Image usecase: the business logic between HTTP and storage/queue.

Behavior parity with the reference's ImageUsecase (reference:
internal/usecase/image/image.go):
* upload: size gate -> 512-byte magic sniff must be image/* -> store blob
  (cleanup on later error) -> metadata row -> task to queue keyed by image
  id -> status uploaded->processing (:38-113);
* get: original when operation empty, else processed-by-operation with
  ProcessedImageNotFound while still processing (:115-149);
* delete: blob + processed blobs + processed rows + soft delete (:165-192)
  — with the reference's prefix bug FIXED: it deleted "processed/{id}/"
  which matches nothing under the actual "processed/{op}/{id}/" layout
  (SURVEY.md §3.5); we delete each recorded artifact path and every
  per-op prefix.
"""

from __future__ import annotations

import uuid

from imageprocessor_tpu.domain import (
    DEFAULT_MAX_UPLOAD_SIZE,
    Image,
    ImageStatus,
    KAFKA_TOPIC_PROCESSING,
    OperationParams,
    ProcessingTask,
)
from imageprocessor_tpu.errors import (
    DatabaseError,
    FileTooLargeError,
    ImageNotFoundError,
    InvalidFileFormatError,
    MessageQueueError,
    ProcessedImageNotFoundError,
    StorageError,
)
from imageprocessor_tpu.runtime.codecs import detect_content_type, format_from_content_type
from imageprocessor_tpu.storage.metadata import MetadataStore, NotFound
from imageprocessor_tpu.storage.object_store import ObjectNotFound, ObjectStore
from imageprocessor_tpu.utils import RetryStrategy, get_logger, retry_sync

log = get_logger("usecase")

# Retryable = transient I/O; NotFound/ObjectNotFound are definitive answers
# (the reference applies its retry.Strategy inside the repository layer the
# same way — wbf dbpg/kafka wrap every call, postgres.go:36 etc.).
_def_retryable = (lambda exc: not isinstance(exc, (NotFound, ObjectNotFound)))

# Derived from the path scheme's single source of truth so a newly added
# operation can never be silently skipped by delete_image's prefix sweep.
from imageprocessor_tpu.runtime.paths import op_path_prefixes

_OP_PREFIXES = op_path_prefixes()


class ImageUsecase:
    def __init__(self, meta: MetadataStore, store: ObjectStore, broker,
                 processing_topic: str = KAFKA_TOPIC_PROCESSING,
                 retries: RetryStrategy | None = None):
        self.meta = meta
        self.store = store
        self.broker = broker
        self.topic = processing_topic
        self.retries = retries or RetryStrategy()

    def _retry(self, fn):
        """Exponential-backoff retry around one storage/queue call
        (reference: wbf retry.Strategy on every repo call)."""
        return retry_sync(self.retries, fn, retryable=_def_retryable)

    def upload_image(self, data: bytes, filename: str, content_type: str,
                     operations: list[OperationParams]) -> Image:
        # content_type (the client-declared header) is intentionally
        # ignored: like the reference, stored type/format come from the
        # 512-byte magic sniff (image/image.go:44-54) — the declared
        # value is untrusted. The parameter stays for handler-API parity.
        if len(data) > DEFAULT_MAX_UPLOAD_SIZE:
            raise FileTooLargeError(
                f"file too large: max size is {DEFAULT_MAX_UPLOAD_SIZE} bytes")
        detected = detect_content_type(data[:512])
        if not detected.startswith("image/"):
            raise InvalidFileFormatError(
                "invalid file format: file is not an image")

        image_id = str(uuid.uuid4())
        original_path = ""
        try:
            try:
                original_path = self._retry(
                    lambda: self.store.save_original(filename, data, detected))
            except Exception as exc:
                raise StorageError(str(exc)) from exc

            img = Image(
                id=image_id, original_filename=filename,
                original_size=len(data), mime_type=detected,
                status=ImageStatus.UPLOADED, original_path=original_path,
                bucket="images")
            try:
                self._retry(lambda: self.meta.save_image(img))
            except Exception as exc:
                raise DatabaseError(str(exc)) from exc

            task = ProcessingTask(
                id=str(uuid.uuid4()), image_id=image_id,
                original_path=original_path, bucket="images",
                operations=operations,
                format=str(format_from_content_type(detected)))
            try:
                self._retry(lambda: self.broker.produce(
                    self.topic, image_id.encode(), task.to_json()))
            except Exception as exc:
                try:
                    self.meta.update_status(image_id, ImageStatus.FAILED)
                except Exception:
                    log.error("Failed to update status to failed",
                              image_id=image_id)
                raise MessageQueueError(str(exc)) from exc

            try:
                self._retry(lambda: self.meta.update_status(
                    image_id, ImageStatus.PROCESSING))
                img.status = ImageStatus.PROCESSING
            except Exception:
                # Reference keeps status=uploaded on this failure (:105-110)
                log.error("Failed to update status to processing",
                          image_id=image_id)
            log.info("Image uploaded and queued", image_id=image_id,
                     filename=filename)
            return img
        except Exception:
            if original_path:
                try:
                    self.store.delete_object(original_path)
                except Exception:
                    log.error("Failed to cleanup original after error",
                              path=original_path)
            raise

    def get_image(self, image_id: str, operation: str = ""
                  ) -> tuple[Image, bytes, str]:
        """Returns (metadata, blob, served_path)."""
        try:
            img = self._retry(lambda: self.meta.get_image(image_id))
        except NotFound:
            raise ImageNotFoundError(image_id) from None
        except Exception as exc:
            raise DatabaseError(str(exc)) from exc

        if not operation:
            try:
                return img, self._retry(
                    lambda: self.store.get_object(img.original_path)), \
                    img.original_path
            except Exception as exc:
                # ObjectNotFound included: a recorded-but-missing blob is
                # a storage inconsistency (500), matching the reference's
                # ErrStorage mapping (image/image.go:129-136).
                raise StorageError(str(exc)) from exc

        try:
            processed = self._retry(
                lambda: self.meta.get_processed_by_operation(image_id, operation))
        except Exception as exc:
            raise DatabaseError(str(exc)) from exc
        if processed is None:
            raise ProcessedImageNotFoundError(f"{image_id}/{operation}")
        try:
            return img, self._retry(
                lambda: self.store.get_object(processed.path)), processed.path
        except Exception as exc:
            # ObjectNotFound included — see the comment above.
            raise StorageError(str(exc)) from exc

    def get_status(self, image_id: str) -> ImageStatus:
        try:
            return self._retry(lambda: self.meta.get_image(image_id)).status
        except NotFound:
            raise ImageNotFoundError(image_id) from None
        except Exception as exc:
            raise DatabaseError(str(exc)) from exc

    def delete_image(self, image_id: str) -> None:
        # Every repo call retries transient errors like the other
        # usecase methods — a hiccup mid-delete must not strand an image
        # with its blobs gone but status still visible.
        try:
            img = self._retry(lambda: self.meta.get_image(image_id))
        except NotFound:
            raise ImageNotFoundError(image_id) from None
        except Exception as exc:
            raise DatabaseError(str(exc)) from exc

        try:
            self._retry(lambda: self.store.delete_object(img.original_path))
        except Exception:
            log.error("Failed to delete original blob",
                      path=img.original_path)
        # Delete recorded artifacts exactly, then sweep every per-op prefix
        # (fixes the reference's dead "processed/{id}/" prefix, SURVEY §3.5).
        try:
            for processed in self._retry(
                    lambda: self.meta.list_processed(image_id)):
                try:
                    self._retry(lambda p=processed.path:
                                self.store.delete_object(p))
                except Exception:
                    log.error("Failed to delete processed blob",
                              path=processed.path)
        except Exception:
            log.error("Failed to enumerate processed rows", image_id=image_id)
        for op_prefix in _OP_PREFIXES:
            try:
                self._retry(lambda pref=op_prefix:
                            self.store.delete_objects_with_prefix(
                                f"processed/{pref}/{image_id}/"))
            except Exception:
                log.error("Failed prefix delete", image_id=image_id,
                          prefix=op_prefix)
        try:
            self._retry(lambda: self.meta.delete_processed_images(image_id))
        except Exception:
            log.error("Failed to delete processed rows", image_id=image_id)
        try:
            self._retry(lambda: self.meta.update_status(
                image_id, ImageStatus.DELETED))
        except NotFound:
            # A concurrent delete (client retry race) soft-deleted it
            # between our get_image and this update: propagate as
            # not-found so the handler answers 404, not a 500.
            raise ImageNotFoundError(image_id)
        except Exception as exc:
            raise DatabaseError(str(exc)) from exc
        log.info("Image deleted", image_id=image_id)

    def list_images(self, limit: int = 50, offset: int = 0) -> list[Image]:
        try:
            return self._retry(lambda: self.meta.list_images(limit, offset))
        except Exception as exc:
            raise DatabaseError(str(exc)) from exc
