"""Usecase + worker behavior tests (fast, no HTTP layer)."""

import io
import uuid

import numpy as np
import pytest
from PIL import Image as PILImage

from imageprocessor_tpu.broker.memory import MemoryBroker
from imageprocessor_tpu.config import load as load_config
from imageprocessor_tpu.domain import (
    ImageStatus,
    OperationParams,
    OperationType,
    ProcessingResult,
    ProcessingTask,
)
from imageprocessor_tpu.errors import (
    FileTooLargeError,
    ImageNotFoundError,
    InvalidFileFormatError,
    MessageQueueError,
    ProcessedImageNotFoundError,
)
from imageprocessor_tpu.service.usecase import ImageUsecase
from imageprocessor_tpu.service.worker import Worker
from imageprocessor_tpu.storage import LocalFSObjectStore, SQLiteMetadataStore

RNG = np.random.default_rng(9)


def png_bytes(h=60, w=80):
    arr = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    bio = io.BytesIO()
    PILImage.fromarray(arr).save(bio, format="PNG")
    return bio.getvalue()


DEFAULT_OPS = [OperationParams(OperationType.THUMBNAIL,
                               {"size": 32, "crop_to_fit": True})]


from imageprocessor_tpu.utils import RetryStrategy

_FAST_RETRIES = RetryStrategy(attempts=2, delay_ms=1)


@pytest.fixture()
def stack(tmp_path):
    meta = SQLiteMetadataStore(":memory:")
    store = LocalFSObjectStore(str(tmp_path / "objects"))
    broker = MemoryBroker()
    return (ImageUsecase(meta, store, broker, retries=_FAST_RETRIES),
            meta, store, broker)


def test_upload_happy_path(stack):
    uc, meta, store, broker = stack
    img = uc.upload_image(png_bytes(), "a.png", "image/png", DEFAULT_OPS)
    assert img.status is ImageStatus.PROCESSING
    assert img.mime_type == "image/png"
    # blob stored
    assert store.get_object(img.original_path)
    # task queued with Go wire shape, keyed by image id
    msgs = broker.poll("image-processing", "g", max_n=1)
    assert msgs and msgs[0].key == img.id.encode()
    task = ProcessingTask.from_json(msgs[0].value)
    assert task.image_id == img.id
    assert task.format == "png"


def test_upload_rejects_non_image_content(stack):
    uc, _meta, store, broker = stack
    with pytest.raises(InvalidFileFormatError):
        uc.upload_image(b"plain text not an image", "a.png", "image/png",
                        DEFAULT_OPS)
    assert broker.depth("image-processing", "g") == 0


def test_upload_rejects_oversize(stack):
    uc, *_ = stack
    with pytest.raises(FileTooLargeError):
        uc.upload_image(b"\xff" * ((32 << 20) + 1), "big.png", "image/png",
                        DEFAULT_OPS)


def test_upload_rolls_back_blob_on_queue_failure(stack, tmp_path):
    uc, meta, store, broker = stack

    def boom(*a, **k):
        raise RuntimeError("kafka down")

    broker.produce = boom
    with pytest.raises(MessageQueueError):
        uc.upload_image(png_bytes(), "b.png", "image/png", DEFAULT_OPS)
    # Original blob was cleaned up (defer rollback, image.go:58-64)
    import os
    orig_root = os.path.join(str(tmp_path / "objects"), "original")
    files = []
    for dp, _dn, fn in os.walk(orig_root):
        files.extend(fn)
    assert files == []


def test_get_status_and_not_found(stack):
    uc, *_ = stack
    img = uc.upload_image(png_bytes(), "c.png", "image/png", DEFAULT_OPS)
    assert uc.get_status(img.id) is ImageStatus.PROCESSING
    with pytest.raises(ImageNotFoundError):
        uc.get_status("missing")


def test_get_image_processed_not_found(stack):
    uc, *_ = stack
    img = uc.upload_image(png_bytes(), "d.png", "image/png", DEFAULT_OPS)
    with pytest.raises(ProcessedImageNotFoundError):
        uc.get_image(img.id, "thumbnail")


# --- worker -------------------------------------------------------------------

@pytest.fixture()
def worker_stack(tmp_path):
    cfg = load_config({})
    cfg.worker.batch_size = 4
    meta = SQLiteMetadataStore(":memory:")
    store = LocalFSObjectStore(str(tmp_path / "objects"))
    broker = MemoryBroker()
    uc = ImageUsecase(meta, store, broker, retries=_FAST_RETRIES)
    worker = Worker(cfg, meta=meta, store=store, broker=broker)
    yield uc, worker, meta, store, broker
    worker.engine.close()


def test_worker_processes_and_acks(worker_stack):
    uc, worker, meta, store, broker = worker_stack
    img = uc.upload_image(png_bytes(), "w.png", "image/png", DEFAULT_OPS)
    n = worker.run_once()
    assert n == 1
    assert meta.get_image(img.id).status is ImageStatus.COMPLETED
    rows = meta.list_processed(img.id)
    assert len(rows) == 1
    assert rows[0].operation is OperationType.THUMBNAIL
    assert rows[0].size > 0
    assert store.get_object(rows[0].path)
    # message acked, nothing redelivers
    assert broker.poll("image-processing", worker.cfg.broker.group_id,
                       max_n=4) == []
    # result published to the results topic
    res_msgs = broker.poll("image-processed", "observer", max_n=4)
    assert len(res_msgs) == 1
    res = ProcessingResult.from_json(res_msgs[0].value)
    assert res.status is ImageStatus.COMPLETED
    assert res.image_id == img.id


def test_worker_acks_malformed_payload(worker_stack):
    _uc, worker, _meta, _store, broker = worker_stack
    broker.produce("image-processing", b"k", b"this is not json")
    assert worker.run_once() == 1
    assert broker.depth("image-processing",
                        worker.cfg.broker.group_id) == 0  # acked, no loop


def test_worker_permanent_failure_acked_and_marked(worker_stack):
    uc, worker, meta, _store, broker = worker_stack
    # valid upload, then poison the stored blob so decode fails
    img = uc.upload_image(png_bytes(), "p.png", "image/png", DEFAULT_OPS)
    _img_blob_path = meta.get_image(img.id).original_path
    _store = worker.store
    _store.save_processed(_img_blob_path, b"corrupted not an image")
    assert worker.run_once() == 1
    assert meta.get_image(img.id).status is ImageStatus.FAILED
    assert broker.depth("image-processing",
                        worker.cfg.broker.group_id) == 0  # acked


def test_worker_missing_blob_fails_permanently(worker_stack):
    """A deleted/missing blob can never succeed on redelivery: it must be
    acked with status=failed, not nacked into an infinite poison loop
    (image deleted while its task sat in the queue)."""
    uc, worker, meta, store, broker = worker_stack
    img = uc.upload_image(png_bytes(), "t.png", "image/png", DEFAULT_OPS)
    store.delete_object(meta.get_image(img.id).original_path)
    assert worker.run_once() == 1
    assert meta.get_image(img.id).status is ImageStatus.FAILED
    assert broker.depth("image-processing",
                        worker.cfg.broker.group_id) == 0  # acked: permanent


def test_worker_transient_fetch_failure_nacks(worker_stack):
    """Infra errors fetching the blob (storage down) ARE transient: nack
    for redelivery, like the reference's leave-uncommitted behavior."""
    uc, worker, meta, store, broker = worker_stack
    img = uc.upload_image(png_bytes(), "t.png", "image/png", DEFAULT_OPS)
    orig_get = store.get_object
    store.get_object = lambda path: (_ for _ in ()).throw(
        OSError("storage unreachable"))
    try:
        assert worker.run_once() == 1
    finally:
        store.get_object = orig_get
    assert meta.get_image(img.id).status is ImageStatus.FAILED
    # still deliverable (nacked)
    assert broker.depth("image-processing",
                        worker.cfg.broker.group_id) == 1


def test_ack_policy_is_typed_not_string_matched(worker_stack):
    """Ack policy must read EngineResult.error_kind, never the error text:
    a reworded message cannot flip a permanent failure into a poison loop
    (or a transient one into a silent drop)."""
    from imageprocessor_tpu.domain import ProcessingResult
    from imageprocessor_tpu.runtime.engine import (
        PERMANENT,
        TRANSIENT,
        EngineResult,
    )

    uc, worker, meta, _store, broker = worker_stack
    group = worker.cfg.broker.group_id

    def fake_engine(kind):
        def process_tasks(tasks_with_data, device_section=None):
            return [EngineResult(result=ProcessingResult(
                id=t.id, image_id=t.image_id, status=ImageStatus.FAILED,
                error="an entirely reworded diagnostic with no known text"),
                error_kind=kind) for (t, _d) in tasks_with_data]
        return process_tasks

    uc.upload_image(png_bytes(), "k1.png", "image/png", DEFAULT_OPS)
    worker.engine.process_tasks = fake_engine(PERMANENT)
    assert worker.run_once() == 1
    assert broker.depth("image-processing", group) == 0  # acked

    uc.upload_image(png_bytes(), "k2.png", "image/png", DEFAULT_OPS)
    worker.engine.process_tasks = fake_engine(TRANSIENT)
    assert worker.run_once() == 1
    assert broker.depth("image-processing", group) == 1  # nacked: redeliver


def test_storage_save_failure_is_transient(worker_stack):
    """An object-store outage during artifact save nacks for redelivery
    (infra error), instead of permanently failing the image."""
    uc, worker, meta, store, broker = worker_stack
    img = uc.upload_image(png_bytes(), "s.png", "image/png", DEFAULT_OPS)

    def boom(*a, **k):
        raise OSError("disk went away")

    store.save_processed = boom
    assert worker.run_once() == 1
    assert meta.get_image(img.id).status is ImageStatus.FAILED
    assert broker.depth("image-processing",
                        worker.cfg.broker.group_id) == 1  # nacked


def test_failed_result_with_broken_status_write_nacks(worker_stack):
    """A PERMANENT failure whose update_status write also fails must NOT
    be acked: acking would strand the image in 'processing' forever (the
    UI polls it indefinitely). Nack so the replay re-runs the status
    write once the DB recovers."""
    uc, worker, meta, _store, broker = worker_stack
    img = uc.upload_image(png_bytes(), "f.png", "image/png", DEFAULT_OPS)
    # poison the blob -> permanent decode failure
    path = meta.get_image(img.id).original_path
    worker.store.save_processed(path, b"corrupted not an image")
    orig = meta.update_status

    def boom(*a, **k):
        raise RuntimeError("db down")

    meta.update_status = boom
    try:
        assert worker.run_once() == 1
    finally:
        meta.update_status = orig
    # nacked: FAILED status eventually lands on redelivery
    assert broker.depth("image-processing",
                        worker.cfg.broker.group_id) == 1
    assert worker.run_once() == 1
    assert meta.get_image(img.id).status is ImageStatus.FAILED
    assert broker.depth("image-processing",
                        worker.cfg.broker.group_id) == 0


def test_worker_batch_mixed_outcomes(worker_stack):
    uc, worker, meta, _store, broker = worker_stack
    good = uc.upload_image(png_bytes(), "g1.png", "image/png", DEFAULT_OPS)
    # malformed direct inject
    broker.produce("image-processing", b"bad", b"{broken")
    good2 = uc.upload_image(png_bytes(), "g2.png", "image/png", DEFAULT_OPS)
    assert worker.run_once() == 3
    assert meta.get_image(good.id).status is ImageStatus.COMPLETED
    assert meta.get_image(good2.id).status is ImageStatus.COMPLETED
    assert broker.depth("image-processing",
                        worker.cfg.broker.group_id) == 0


def test_delete_removes_artifacts(worker_stack):
    uc, worker, meta, store, _broker = worker_stack
    img = uc.upload_image(png_bytes(), "del.png", "image/png", DEFAULT_OPS)
    worker.run_once()
    path = meta.list_processed(img.id)[0].path
    assert store.get_object(path)
    uc.delete_image(img.id)
    from imageprocessor_tpu.storage.object_store import ObjectNotFound
    with pytest.raises(ObjectNotFound):
        store.get_object(path)
    with pytest.raises(ImageNotFoundError):
        uc.get_status(img.id)


def test_concurrent_delete_maps_to_not_found(worker_stack):
    """Two DELETE requests racing (client retry after timeout): the
    loser's update_status(DELETED) hits a NotFound — it must surface as
    ImageNotFoundError (HTTP 404), not DatabaseError (500)."""
    from imageprocessor_tpu.errors import ImageNotFoundError
    from imageprocessor_tpu.storage.metadata import NotFound

    uc, _worker, meta, _store, _broker = worker_stack
    img = uc.upload_image(png_bytes(), "d.png", "image/png", DEFAULT_OPS)

    real = meta.update_status

    def racing(image_id, status):
        # simulate the other request winning between get and update
        raise NotFound(image_id)

    meta.update_status = racing
    try:
        with pytest.raises(ImageNotFoundError):
            uc.delete_image(img.id)
    finally:
        meta.update_status = real


def test_delete_mid_processing_drops_orphaned_artifacts(worker_stack):
    """Image deleted while its task processes: the delete's sweep ran
    BEFORE the worker's writes, so the worker must undo its own
    artifacts (blobs + rows) and ack — they were orphaned forever, and
    the nack-replay path just re-leaked them."""
    uc, worker, meta, store, broker = worker_stack
    img = uc.upload_image(png_bytes(), "m.png", "image/png", DEFAULT_OPS)

    real_update = meta.update_status
    state = {"deleted": False}

    def deleting_update(image_id, status):
        if not state["deleted"]:
            # simulate the user's DELETE landing mid-processing: the
            # sweep + soft delete happen before the worker's final write
            state["deleted"] = True
            meta.update_status = real_update
            uc.delete_image(image_id)
        return real_update(image_id, status)

    meta.update_status = deleting_update
    assert worker.run_once() == 1

    # acked (not redelivered), no processed rows, no processed blobs
    assert broker.poll("image-processing", worker.cfg.broker.group_id,
                       max_n=4) == []
    assert meta.list_processed(img.id) == []
    import os
    proc_root = os.path.join(store.root, "processed")
    leftovers = []
    for dp, _dn, fn in os.walk(proc_root):
        leftovers.extend(fn)
    assert leftovers == []
