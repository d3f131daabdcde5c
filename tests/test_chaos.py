"""Scripted chaos: mechanical proof of the failure-recovery claims.

Automates what the round-2 soak did by hand (VERDICT r2 #7). Three
scenarios, each asserting ZERO lost images and correct at-least-once
replay (reference contract: commit-after-success, worker.go:125-146 —
the reference itself has no fault injection; SURVEY §5):

1. kill -9 a real worker subprocess mid-batch, restart it — leased
   messages redeliver after WORKER_LEASE_S and every image completes;
2. broker outage under load (error-injecting wrapper) — the worker loop
   survives, redelivers, and drains after recovery;
3. object-store flapping under the pipelined worker — transient
   failures nack for replay, and no inflight permits leak.
"""

from __future__ import annotations

import io
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np
import pytest
from PIL import Image as PILImage

from imageprocessor_tpu.broker.memory import MemoryBroker
from imageprocessor_tpu.config import load as load_config
from imageprocessor_tpu.domain import ImageStatus, OperationParams, OperationType
from imageprocessor_tpu.service.usecase import ImageUsecase
from imageprocessor_tpu.service.worker import Worker
from imageprocessor_tpu.storage import LocalFSObjectStore, SQLiteMetadataStore
from imageprocessor_tpu.utils import RetryStrategy

RNG = np.random.default_rng(13)
OPS = [OperationParams(OperationType.THUMBNAIL,
                       {"size": 32, "crop_to_fit": True})]
_RETRIES = RetryStrategy(attempts=2, delay_ms=5)


def png_bytes(h=48, w=64):
    arr = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    bio = io.BytesIO()
    PILImage.fromarray(arr).save(bio, format="PNG")
    return bio.getvalue()


def wait_for(pred, timeout=60.0, interval=0.1):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(interval)
    return pred()


# ------------------------------------------------- 1. kill -9 mid-batch


def test_worker_kill9_midbatch_no_lost_images(tmp_path):
    """A real worker subprocess SIGKILLed mid-batch loses nothing: its
    leased messages redeliver after the lease and a restarted worker
    completes every image (idempotent outputs make the replay safe)."""
    from imageprocessor_tpu.broker.sqlitebroker import SQLiteBroker

    data = tmp_path
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "DEVICE_PLATFORM": "cpu",
        "BROKER_BACKEND": "sqlite",
        "BROKER_SQLITE_PATH": str(data / "broker.db"),
        "METADATA_BACKEND": "sqlite",
        "METADATA_SQLITE_PATH": str(data / "meta.db"),
        "STORAGE_BACKEND": "localfs",
        "STORAGE_LOCALFS_ROOT": str(data / "objects"),
        "WORKER_BATCH_SIZE": "2",
        "WORKER_LEASE_S": "2",
        "RETRIES_ATTEMPTS": "2",
        "RETRIES_DELAY_MS": "10",
        "LOG_LEVEL": "error",
    }
    meta = SQLiteMetadataStore(str(data / "meta.db"))
    store = LocalFSObjectStore(str(data / "objects"))
    broker = SQLiteBroker(str(data / "broker.db"))
    uc = ImageUsecase(meta, store, broker, retries=_RETRIES)
    # Wave 1: two warm-up images (pays the first jit compile).
    imgs = [uc.upload_image(png_bytes(), f"c{i}.png", "image/png", OPS)
            for i in range(2)]

    def completed():
        return sum(meta.get_image(im.id).status is ImageStatus.COMPLETED
                   for im in imgs)

    def spawn():
        return subprocess.Popen(
            [sys.executable, "-m", "imageprocessor_tpu.service", "worker"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    proc = spawn()
    try:
        assert wait_for(lambda: completed() >= 2, timeout=120), \
            "worker never completed the warm-up wave"
        # Wave 2: sizes spanning many resolution buckets — every group
        # needs a fresh compile, so the kill below is guaranteed to land
        # while the queue is only part-served.
        sides = [60, 120, 190, 250, 350, 450, 600]
        imgs += [uc.upload_image(png_bytes(sides[i % 7], sides[i % 7]),
                                 f"c{2 + i}.png", "image/png", OPS)
                 for i in range(14)]
        assert wait_for(lambda: completed() >= 3, timeout=60), \
            "worker never started wave 2"
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=10)
        n_before = completed()
        assert n_before < len(imgs), "worker finished before the kill"

        proc = spawn()
        assert wait_for(lambda: completed() == len(imgs), timeout=150), \
            f"only {completed()}/{len(imgs)} completed after restart"
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
    for im in imgs:
        rows = meta.list_processed(im.id)
        assert len(rows) == 1 and store.get_object(rows[0].path)
    # fully drained: the replayed messages were acked
    assert wait_for(lambda: broker.depth(
        "image-processing", "image-processor-group") == 0, timeout=30)
    for closer in (meta, store, broker):
        closer.close()


# ----------------------------------------- 2. broker outage under load


class FlakyBroker:
    """Delegating wrapper that raises OSError while `down` is set —
    simulating a broker restart/outage as seen by the client."""

    def __init__(self, inner):
        self._inner = inner
        self.down = threading.Event()

    def _gate(self):
        if self.down.is_set():
            raise OSError("broker unreachable (injected outage)")

    def create_topic(self, *a, **k):
        return self._inner.create_topic(*a, **k)

    def produce(self, *a, **k):
        self._gate()
        return self._inner.produce(*a, **k)

    def poll(self, *a, **k):
        self._gate()
        return self._inner.poll(*a, **k)

    def ack(self, *a, **k):
        self._gate()
        return self._inner.ack(*a, **k)

    def nack(self, *a, **k):
        self._gate()
        return self._inner.nack(*a, **k)

    def depth(self, *a, **k):
        return self._inner.depth(*a, **k)

    def close(self):
        return self._inner.close()


def test_broker_outage_under_load_drains_after_recovery(tmp_path):
    cfg = load_config({})
    cfg.worker.batch_size = 4
    cfg.worker.lease_s = 1.0
    cfg.retries_attempts, cfg.retries_delay_ms = 2, 10
    meta = SQLiteMetadataStore(":memory:")
    store = LocalFSObjectStore(str(tmp_path / "objects"))
    broker = FlakyBroker(MemoryBroker())
    uc = ImageUsecase(meta, store, broker._inner, retries=_RETRIES)
    worker = Worker(cfg, meta=meta, store=store, broker=broker)
    t = threading.Thread(target=worker.run, daemon=True)
    t.start()
    try:
        imgs = [uc.upload_image(png_bytes(), f"b{i}.png", "image/png", OPS)
                for i in range(6)]
        # outage strikes while the queue is half-served
        wait_for(lambda: sum(
            meta.get_image(im.id).status is ImageStatus.COMPLETED
            for im in imgs) >= 1, timeout=60)
        broker.down.set()
        imgs += [uc.upload_image(png_bytes(), f"b{6 + i}.png", "image/png",
                                 OPS) for i in range(3)]
        time.sleep(1.0)  # worker loops against the dead broker
        broker.down.clear()
        assert wait_for(lambda: all(
            meta.get_image(im.id).status is ImageStatus.COMPLETED
            for im in imgs), timeout=90), [
                meta.get_image(im.id).status for im in imgs]
        assert wait_for(lambda: broker.depth(
            cfg.broker.processing_topic, cfg.broker.group_id) == 0,
            timeout=30)
        for im in imgs:
            assert len(meta.list_processed(im.id)) == 1
    finally:
        worker.stop()
        t.join(timeout=30)
        worker.close()


# ----------------------------- 3. object-store flap (pipelined worker)


class FlakyStore:
    """Fails get_object / save_processed while `down` is set."""

    def __init__(self, inner):
        self._inner = inner
        self.down = threading.Event()

    def _gate(self):
        if self.down.is_set():
            raise OSError("object store unreachable (injected flap)")

    def save_original(self, *a, **k):
        return self._inner.save_original(*a, **k)

    def save_processed(self, *a, **k):
        self._gate()
        return self._inner.save_processed(*a, **k)

    def get_object(self, *a, **k):
        self._gate()
        return self._inner.get_object(*a, **k)

    def delete_object(self, *a, **k):
        return self._inner.delete_object(*a, **k)

    def delete_prefix(self, *a, **k):
        return self._inner.delete_prefix(*a, **k)

    def close(self):
        return self._inner.close()


def test_two_member_group_rebalance_under_load(tmp_path):
    """Two live worker PROCESSES split the topic's partitions in one
    consumer group against the bundled kafka-wire broker; kill -9 one
    mid-stream and assert the survivor takes over its partitions, every
    uncommitted message redelivers, zero images are lost, and the final
    committed offsets account for every produced message (at-least-once
    accounting across the rebalance). Validates the MULTIHOST.md N-host
    scale-out story (reference: Makefile:24-25 3-partition topics;
    worker.go:125-146 commit-after-success)."""
    from imageprocessor_tpu.broker.kafka import KafkaBroker
    from imageprocessor_tpu.broker.kafkaserver import KafkaServer
    from imageprocessor_tpu.broker import kafkawire as kw

    data = tmp_path
    srv = KafkaServer(default_partitions=3, rebalance_timeout_s=1.0)
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "DEVICE_PLATFORM": "cpu",
        "BROKER_BACKEND": "kafka",
        "KAFKA_BROKERS": srv.address,
        "KAFKA_SESSION_TIMEOUT_MS": "2000",
        "METADATA_BACKEND": "sqlite",
        "METADATA_SQLITE_PATH": str(data / "meta.db"),
        "STORAGE_BACKEND": "localfs",
        "STORAGE_LOCALFS_ROOT": str(data / "objects"),
        "WORKER_BATCH_SIZE": "2",
        "RETRIES_ATTEMPTS": "2",
        "RETRIES_DELAY_MS": "10",
        "LOG_LEVEL": "error",
    }
    meta = SQLiteMetadataStore(str(data / "meta.db"))
    store = LocalFSObjectStore(str(data / "objects"))
    broker = KafkaBroker(brokers=[srv.address])
    uc = ImageUsecase(meta, store, broker, retries=_RETRIES)
    group = "image-processor-group"

    def spawn(name):
        return subprocess.Popen(
            [sys.executable, "-m", "imageprocessor_tpu.service", "worker"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def members():
        g = srv._groups.get(group)
        return dict(g.members) if g else {}

    def split_assignments():
        g = srv._groups.get(group)
        if not g or g.state != "Stable":
            return None
        owned = {m: kw.decode_assignment(blob or b"").get(
            "image-processing", []) for m, blob in g.assignments.items()
            if m in g.members}
        return owned

    def completed():
        return sum(meta.get_image(im.id).status is ImageStatus.COMPLETED
                   for im in imgs)

    imgs = []
    a, b = spawn("a"), spawn("b")
    try:
        # Both members join and the 3 partitions split disjointly
        # across them (range assignment: 2 + 1).
        def two_member_split():
            owned = split_assignments()
            if not owned or len(owned) != 2:
                return False
            parts = sorted(p for ps in owned.values() for p in ps)
            return parts == [0, 1, 2] and all(owned.values())
        assert wait_for(two_member_split, timeout=90), \
            f"group never split partitions: {split_assignments()}"

        # Load: a first wave processed by BOTH members (keys are random
        # uuids, so 12 uploads land on every partition w.h.p.).
        imgs += [uc.upload_image(png_bytes(), f"r{i}.png", "image/png",
                                 OPS) for i in range(12)]
        assert wait_for(lambda: completed() >= 3, timeout=120), \
            "no progress before the kill"

        victim = a
        victim.send_signal(signal.SIGKILL)
        victim.wait(timeout=10)
        # keep producing THROUGH the rebalance window
        imgs += [uc.upload_image(png_bytes(), f"r{12 + i}.png",
                                 "image/png", OPS) for i in range(6)]

        # Survivor takes over all three partitions after eviction
        # (session 2 s + rebalance round 1 s).
        def survivor_owns_all():
            owned = split_assignments()
            return (owned is not None and len(owned) == 1
                    and sorted(next(iter(owned.values()))) == [0, 1, 2])
        assert wait_for(survivor_owns_all, timeout=60), \
            f"survivor never took over: {split_assignments()}"

        # Zero lost images: everything completes, including messages
        # the victim had fetched but not committed (redelivered).
        assert wait_for(lambda: completed() == len(imgs), timeout=180), \
            f"only {completed()}/{len(imgs)} completed after rebalance"

        # At-least-once accounting: processing may repeat, but the
        # idempotent upsert keeps exactly one processed row per image,
        # and the group's committed offsets cover every produced
        # message (nothing stranded uncommitted).
        for im in imgs:
            rows = meta.list_processed(im.id)
            assert len(rows) == 1 and store.get_object(rows[0].path)

        def all_committed():
            g = srv._groups.get(group)
            if g is None:
                return False
            logs = srv._topics.get("image-processing", [])
            return all(
                g.offsets.get(("image-processing", pid), -1)
                >= len(log)
                for pid, log in enumerate(logs) if log)
        assert wait_for(all_committed, timeout=60), (
            {k: v for k, v in srv._groups[group].offsets.items()},
            [len(p) for p in srv._topics.get("image-processing", [])])
    finally:
        for proc in (a, b):
            proc.terminate()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
        for closer in (broker, meta, store):
            closer.close()
        srv.close()


def test_object_store_flap_pipelined_no_permit_leaks(tmp_path):
    """Store flaps mid-run under the pipelined worker: fetch failures
    nack, save failures classify TRANSIENT and nack, everything replays
    to completion after recovery — and the inflight semaphore returns to
    full capacity (no permit leaks)."""
    from imageprocessor_tpu.service.pipelined import PipelinedWorker

    cfg = load_config({})
    cfg.worker.batch_size = 4
    cfg.worker.batch_deadline_ms = 20
    cfg.worker.max_queue_depth = 16
    cfg.worker.lease_s = 1.0
    cfg.retries_attempts, cfg.retries_delay_ms = 2, 10
    meta = SQLiteMetadataStore(":memory:")
    inner = LocalFSObjectStore(str(tmp_path / "objects"))
    store = FlakyStore(inner)
    broker = MemoryBroker()
    uc = ImageUsecase(meta, inner, broker, retries=_RETRIES)
    worker = PipelinedWorker(cfg, meta=meta, store=store, broker=broker)
    depth = max(cfg.worker.max_queue_depth, 8)
    t = threading.Thread(target=worker.run, daemon=True)
    t.start()
    try:
        imgs = [uc.upload_image(png_bytes(), f"f{i}.png", "image/png", OPS)
                for i in range(5)]
        wait_for(lambda: sum(
            meta.get_image(im.id).status is ImageStatus.COMPLETED
            for im in imgs) >= 1, timeout=60)
        # two flap cycles while new work keeps arriving
        for cycle in range(2):
            store.down.set()
            imgs += [uc.upload_image(png_bytes(),
                                     f"f{5 + 3 * cycle + i}.png",
                                     "image/png", OPS) for i in range(3)]
            time.sleep(0.6)
            store.down.clear()
            time.sleep(0.5)
        assert wait_for(lambda: all(
            meta.get_image(im.id).status is ImageStatus.COMPLETED
            for im in imgs), timeout=120), [
                meta.get_image(im.id).status.value for im in imgs]
        assert wait_for(lambda: broker.depth(
            cfg.broker.processing_topic, cfg.broker.group_id) == 0,
            timeout=30)
    finally:
        worker.stop()
        t.join(timeout=60)
        worker.close()
    # no permit leaks: every inflight slot is reacquirable
    for _ in range(depth):
        assert worker._inflight.acquire(blocking=False), \
            "inflight permit leaked during the flap"
    assert not worker._inflight.acquire(blocking=False), \
        "more permits than configured depth (double release)"
