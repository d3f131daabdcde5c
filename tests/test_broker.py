"""Broker contract tests: memory, sqlite, and the Kafka wire client.

The "kafka" variant runs the real pure-Python wire client
(broker/kafka.py) over real sockets against the in-process
wire-compatible server (broker/kafkaserver.py) — the whole binary
protocol round-trips for every contract test below.
"""

import threading

import pytest

from imageprocessor_tpu.broker import MemoryBroker, SQLiteBroker
from imageprocessor_tpu.broker.base import partition_for_key


@pytest.fixture(params=["memory", "sqlite", "kafka"])
def broker(request, tmp_path):
    if request.param == "memory":
        b = MemoryBroker(default_partitions=3)
        server = None
    elif request.param == "sqlite":
        b = SQLiteBroker(str(tmp_path / "broker.db"), default_partitions=3)
        server = None
    else:
        from imageprocessor_tpu.broker.kafka import KafkaBroker
        from imageprocessor_tpu.broker.kafkaserver import KafkaServer

        server = KafkaServer(default_partitions=3)
        b = KafkaBroker(brokers=[server.address], default_partitions=3)
    yield b
    b.close()
    if server is not None:
        server.close()


def test_produce_poll_ack(broker):
    broker.create_topic("image-processing", 3)
    m = broker.produce("image-processing", b"img-1", b"task-1")
    assert m.offset == 0
    got = broker.poll("image-processing", "g1", max_n=10)
    assert len(got) == 1
    assert got[0].value == b"task-1"
    assert broker.ack(got[0]) is True
    # acked messages never redeliver
    assert broker.poll("image-processing", "g1", max_n=10) == []
    assert broker.depth("image-processing", "g1") == 0


def test_lease_prevents_double_delivery(broker):
    broker.produce("t", b"k", b"v")
    a = broker.poll("t", "g", max_n=1, lease_s=60)
    assert len(a) == 1
    # While leased, a second poll gets nothing
    assert broker.poll("t", "g", max_n=1, lease_s=60) == []


def test_lease_expiry_redelivers(broker):
    broker.produce("t", b"k", b"v")
    a = broker.poll("t", "g", max_n=1, lease_s=0.0)  # instantly expired
    assert len(a) == 1
    b = broker.poll("t", "g", max_n=1, lease_s=60)
    assert len(b) == 1
    assert b[0].value == b"v"
    # The stale first delivery can no longer ack (token superseded)
    assert broker.ack(a[0]) is False
    assert broker.ack(b[0]) is True


def test_nack_redelivers_immediately(broker):
    broker.produce("t", b"k", b"v")
    a = broker.poll("t", "g", max_n=1, lease_s=600)
    broker.nack(a[0])
    b = broker.poll("t", "g", max_n=1)
    assert len(b) == 1


def test_consumer_groups_are_independent(broker):
    broker.produce("t", b"k", b"v")
    a = broker.poll("t", "groupA", max_n=1)
    assert len(a) == 1
    broker.ack(a[0])
    # Group B still sees the message (pub/sub across groups, Kafka semantics)
    b = broker.poll("t", "groupB", max_n=1)
    assert len(b) == 1


def test_same_key_same_partition_ordered(broker):
    broker.create_topic("t", 3)
    for i in range(5):
        broker.produce("t", b"img-A", f"m{i}".encode())
    msgs = broker.poll("t", "g", max_n=10)
    parts = {m.partition for m in msgs}
    assert len(parts) == 1  # keyed messages land on one partition
    assert [m.value for m in msgs] == [b"m0", b"m1", b"m2", b"m3", b"m4"]


def test_different_keys_spread_partitions(broker):
    broker.create_topic("t", 3)
    for i in range(60):
        broker.produce("t", f"img-{i}".encode(), b"x")
    msgs = broker.poll("t", "g", max_n=100)
    parts = {m.partition for m in msgs}
    assert parts == {0, 1, 2}


def test_enqueued_at_survives_delivery(broker):
    """Every backend stamps produce time so consumers can measure queue
    wait (sqlite created_at; Kafka legacy message v1 CreateTime)."""
    import time as _time

    t0 = _time.time()
    broker.produce("t", b"k", b"v")
    got = broker.poll("t", "g", max_n=1)
    assert len(got) == 1
    assert t0 - 2.0 <= got[0].enqueued_at <= _time.time() + 2.0
    # redelivery keeps the original stamp
    broker.nack(got[0])
    again = broker.poll("t", "g", max_n=1)
    assert len(again) == 1
    assert abs(again[0].enqueued_at - got[0].enqueued_at) < 1.5


def test_partition_for_key_stable():
    assert partition_for_key(b"abc", 3) == partition_for_key(b"abc", 3)
    assert partition_for_key(b"", 1) == 0


def test_batch_poll_for_microbatching(broker):
    for i in range(10):
        broker.produce("t", f"k{i}".encode(), f"v{i}".encode())
    batch = broker.poll("t", "g", max_n=8)
    assert len(batch) == 8
    rest = broker.poll("t", "g", max_n=8)
    assert len(rest) == 2


def test_concurrent_consumers_share_without_dupes(broker):
    n = 50
    for i in range(n):
        broker.produce("t", f"k{i}".encode(), str(i).encode())
    seen: list[bytes] = []
    lock = threading.Lock()

    def consume():
        while True:
            msgs = broker.poll("t", "g", max_n=5, lease_s=30)
            if not msgs:
                return
            for m in msgs:
                assert broker.ack(m)
            with lock:
                seen.extend(m.value for m in msgs)

    threads = [threading.Thread(target=consume) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(int(v) for v in seen) == list(range(n))


def test_sqlite_broker_survives_reopen(tmp_path):
    path = str(tmp_path / "durable.db")
    b1 = SQLiteBroker(path)
    b1.produce("t", b"k", b"persisted")
    b1.close()
    b2 = SQLiteBroker(path)
    msgs = b2.poll("t", "g", max_n=1)
    assert msgs and msgs[0].value == b"persisted"
    b2.close()


def test_sqlite_purge_done(tmp_path):
    b = SQLiteBroker(str(tmp_path / "b.db"))
    b.produce("t", b"k", b"v")
    m = b.poll("t", "g", max_n=1)[0]
    b.ack(m)
    assert b.purge_done(older_than_s=0.0) == 1
    assert b.poll("t", "g2", max_n=1) == []  # gone for all groups
    b.close()


def test_sqlite_offsets_never_reused_after_purge(tmp_path):
    """Retention must not make new messages undeliverable: offsets come
    from a monotonic counter, so a message produced after purge_done
    cannot collide with a purged era's 'done' delivery row."""
    from imageprocessor_tpu.broker.sqlitebroker import SQLiteBroker

    b = SQLiteBroker(str(tmp_path / "q.db"))
    b.create_topic("t", 1)
    m1 = b.produce("t", b"k", b"v1")
    [d1] = b.poll("t", "g", max_n=1)
    b.ack(d1)
    assert b.purge_done(older_than_s=0.0) == 1
    m2 = b.produce("t", b"k", b"v2")
    assert m2.offset == m1.offset + 1          # never regresses
    got = b.poll("t", "g", max_n=1)
    assert [m.value for m in got] == [b"v2"]   # still deliverable
    b.close()


def test_sqlite_retention_purges_unconsumed_topics(tmp_path):
    """Topics nobody consumes (e.g. the results topic without a
    downstream) are bounded by the retention TTL, like Kafka segment
    retention."""
    from imageprocessor_tpu.broker.sqlitebroker import SQLiteBroker

    b = SQLiteBroker(str(tmp_path / "q.db"))
    b.create_topic("results", 1)
    b.produce("results", b"k", b"v")
    assert b.purge_done(older_than_s=0.0) == 0          # no deliveries yet
    assert b.purge_done(older_than_s=0.0,
                        unconsumed_ttl_s=0.0) == 1      # TTL tier collects
    b.close()


def test_worker_nacks_when_metadata_writes_fail(tmp_path):
    """Commit-after-success: if the metadata store is down when a batch
    completes, the message must be NACKED for redelivery — acking would
    mark work committed that the DB never saw."""
    import numpy as np
    from PIL import Image as PILImage
    import io as _io

    from imageprocessor_tpu.broker.memory import MemoryBroker
    from imageprocessor_tpu.config import load as load_config
    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.service.usecase import ImageUsecase
    from imageprocessor_tpu.service.worker import Worker
    from imageprocessor_tpu.storage import (
        LocalFSObjectStore,
        SQLiteMetadataStore,
    )

    meta = SQLiteMetadataStore(":memory:")
    store = LocalFSObjectStore(str(tmp_path / "objects"))
    broker = MemoryBroker()
    uc = ImageUsecase(meta, store, broker)
    worker = Worker(load_config({}), meta=meta, store=store, broker=broker)

    buf = _io.BytesIO()
    PILImage.fromarray(np.zeros((64, 64, 3), np.uint8)).save(buf, "PNG")
    uc.upload_image(buf.getvalue(), "a.png", "image/png",
                    [OperationParams(OperationType.THUMBNAIL, {"size": 16})])

    boom = lambda *a, **k: (_ for _ in ()).throw(OSError("db down"))  # noqa: E731
    orig = meta.update_status
    meta.update_status = boom
    meta.save_processed_image = boom
    try:
        assert worker.run_once() == 1
    finally:
        meta.update_status = orig
    # nacked: still deliverable for redelivery once the DB recovers
    assert broker.depth("image-processing",
                        worker.cfg.broker.group_id) == 1


def test_memory_broker_purge_and_monotonic_offsets():
    """The standalone broker must garbage-collect acked messages (it runs
    for the process lifetime) while offsets stay monotonic so acks of
    in-flight messages can't alias purged ones."""
    from imageprocessor_tpu.broker.memory import MemoryBroker

    b = MemoryBroker()
    b.create_topic("t", 1)
    m1 = b.produce("t", b"k", b"v1")
    [d1] = b.poll("t", "g", max_n=1)
    b.ack(d1)
    assert b.purge_done(older_than_s=0.0) == 1
    m2 = b.produce("t", b"k", b"v2")
    assert m2.offset == m1.offset + 1
    got = b.poll("t", "g", max_n=5)
    assert [m.value for m in got] == [b"v2"]
    # unconsumed retention tier
    b.produce("results", b"k", b"r")
    assert b.purge_done(older_than_s=0.0) == 0
    assert b.purge_done(older_than_s=0.0, unconsumed_ttl_s=0.0) >= 1


def test_sqlite_purge_vetoed_by_lagging_topic_group(tmp_path):
    """A second group ACTIVE on the topic but lagging on a message (no
    delivery row for it yet) must veto the acked-tier purge — otherwise
    a fast worker group causes silent message loss for slow consumers
    (e.g. an auditor group polling hourly)."""
    from imageprocessor_tpu.broker.sqlitebroker import SQLiteBroker

    b = SQLiteBroker(str(tmp_path / "b.db"))
    b.create_topic("t", 1)
    b.produce("t", b"k", b"m0")
    # group B becomes topic-active on m0
    [d0b] = b.poll("t", "gb", max_n=1)
    b.ack(d0b)
    b.produce("t", b"k", b"m1")
    # group A (fast worker) drains and acks everything; B hasn't
    # polled m1 yet
    for m in b.poll("t", "ga", max_n=5):
        b.ack(m)
    assert b.purge_done(older_than_s=0.0) == 1  # m0: both groups acked
    # m1 survives: B is topic-active but lagging
    got = b.poll("t", "gb", max_n=5)
    assert [m.value for m in got] == [b"m1"]
    b.ack(got[0])
    assert b.purge_done(older_than_s=0.0) == 1  # now purgeable
    b.close()


def test_memory_broker_purge_vetoed_by_nacked_group():
    """A group that leased-then-nacked a message (awaiting redelivery)
    must veto the acked-tier purge until it acks — nack() pops the lease
    token, so the veto has to come from delivery history, not the token
    (matching the SQLite broker's non-done-delivery retention check)."""
    from imageprocessor_tpu.broker.memory import MemoryBroker

    b = MemoryBroker()
    b.create_topic("t", 1)
    b.produce("t", b"k", b"v")
    [da] = b.poll("t", "ga", max_n=1)
    b.ack(da)
    [db] = b.poll("t", "gb", max_n=1)
    b.nack(db)  # gb awaits redelivery: not purgeable yet
    assert b.purge_done(older_than_s=0.0) == 0
    [db2] = b.poll("t", "gb", max_n=1)
    b.ack(db2)
    assert b.purge_done(older_than_s=0.0) == 1


def test_memory_purge_vetoed_by_lagging_topic_group():
    """A group active on the topic that has NOT yet leased a message
    must veto its purge (SQLiteBroker's topic-wide DISTINCT-grp check):
    per-message seen-sets alone silently lose the message for laggards."""
    b = MemoryBroker(default_partitions=1)
    # both groups are known consumers of the topic
    b.poll("t", "fast", max_n=1)
    b.poll("t", "slow", max_n=1)
    b.produce("t", b"k", b"v")
    m = b.poll("t", "fast", max_n=1)[0]
    b.ack(m)
    # backdate the message past the acked-tier threshold
    for q in b._messages.values():
        for s in q.values():
            s.msg.enqueued_at -= 7200
    assert b.purge_done(older_than_s=3600) == 0   # slow still owed it
    got = b.poll("t", "slow", max_n=1)
    assert got and got[0].value == b"v"
    b.ack(got[0])
    assert b.purge_done(older_than_s=3600) == 1   # now everyone acked


def test_memory_wait_not_woken_by_inflight_leases():
    """wait_for_messages must not treat LEASED messages as deliverable:
    waking on them busy-spins a core until the lease expires."""
    import time

    b = MemoryBroker(default_partitions=1)
    b.produce("t", b"k", b"v")
    msgs = b.poll("t", "g", max_n=1, lease_s=30.0)
    assert msgs
    t0 = time.monotonic()
    assert b.wait_for_messages("t", "g", timeout=0.3) is False
    assert time.monotonic() - t0 >= 0.28   # actually waited, no spin

    # and a lease EXPIRY wakes it without any notify
    b2 = MemoryBroker(default_partitions=1)
    b2.produce("t", b"k", b"v")
    assert b2.poll("t", "g", max_n=1, lease_s=0.2)
    t0 = time.monotonic()
    assert b2.wait_for_messages("t", "g", timeout=5.0) is True
    assert time.monotonic() - t0 < 2.0     # woke at expiry, not timeout
