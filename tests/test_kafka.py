"""Kafka wire stack: codec, consumer-group topology, worker end-to-end.

Exercises the reference deployment topology — a consumer group over the
3-partition "image-processing" topic with keyed produce (reference:
internal/broker/kafka/consumer.go:21-56, Makefile:24-25) — with the real
pure-Python wire client over real sockets against the in-process
wire-compatible server.
"""

import io
import threading
import time

import numpy as np
import pytest
from PIL import Image as PILImage

from imageprocessor_tpu.broker import kafkawire as kw
from imageprocessor_tpu.broker.kafka import KafkaBroker
from imageprocessor_tpu.broker.kafkaserver import KafkaServer

RNG = np.random.default_rng(71)


@pytest.fixture()
def server():
    s = KafkaServer(default_partitions=3, rebalance_timeout_s=2.0)
    yield s
    s.close()


# ------------------------------------------------------------------ codec


def test_message_set_roundtrip():
    entries = [(0, b"k0", b"v0"), (1, None, b"v1"), (2, b"k2", None),
               (3, b"", b"x" * 1000)]
    buf = kw.encode_message_set(entries)
    out = kw.decode_message_set(buf)
    assert [(m.offset, m.key, m.value) for m in out] == entries
    # trailing partial message is tolerated (Fetch truncation)
    assert len(kw.decode_message_set(buf[:-5])) == len(entries) - 1


def test_message_crc_validated():
    buf = bytearray(kw.encode_message_set([(0, b"k", b"v")]))
    buf[-1] ^= 0xFF
    with pytest.raises(kw.WireError):
        kw.decode_message_set(bytes(buf))


def test_record_batch_v2_roundtrip():
    entries = [(5, b"k0", b"v0", 1700000000000), (6, None, b"v1", -1),
               (7, b"k2", None, 1700000002000), (8, b"", b"x" * 1000, -1)]
    buf = kw.encode_record_batch(entries, base_offset=5)
    out = kw.decode_records(buf)
    assert [(m.offset, m.key, m.value) for m in out] == \
        [(e[0], e[1], e[2]) for e in entries]
    assert out[0].timestamp_ms == 1700000000000
    assert out[2].timestamp_ms == 1700000002000
    # partial trailing batch tolerated (Fetch truncation)
    assert kw.decode_records(buf + buf[:30]) and \
        len(kw.decode_records(buf + buf[:30])) == 4


def test_record_batch_crc32c_validated():
    buf = bytearray(kw.encode_record_batch([(0, b"k", b"v", 1)]))
    buf[-1] ^= 0xFF
    with pytest.raises(kw.WireError):
        kw.decode_records(bytes(buf))


def test_decode_records_handles_legacy_and_v2():
    legacy = kw.encode_message_set([(0, b"k", b"v")], timestamp_ms=42)
    out = kw.decode_records(legacy)
    assert [(m.key, m.value, m.timestamp_ms) for m in out] == \
        [(b"k", b"v", 42)]
    v2 = kw.encode_record_batch([(3, b"a", b"b", 99)], base_offset=3)
    assert [(m.offset, m.timestamp_ms) for m in kw.decode_records(v2)] == \
        [(3, 99)]


def test_record_batch_unsupported_compression_rejected():
    buf = bytearray(kw.encode_record_batch([(0, b"k", b"v", 1)]))
    # attributes live right after baseOffset(8)+len(4)+epoch(4)+magic(1)+
    # crc(4) = offset 21; set codec bits to snappy (2) and re-CRC.
    buf[22] = (buf[22] & ~0x07) | 2
    import struct as _s
    crc = kw.crc32c(bytes(buf[21:]))
    buf[17:21] = _s.pack(">I", crc)
    with pytest.raises(kw.WireError, match="compression"):
        kw.decode_records(bytes(buf))


def test_consumer_protocol_payloads_roundtrip():
    sub = kw.encode_subscription(["image-processing", "image-processed"])
    assert kw.decode_subscription(sub) == ["image-processing",
                                           "image-processed"]
    asg = kw.encode_assignment({"t": [0, 2], "u": [1]})
    assert kw.decode_assignment(asg) == {"t": [0, 2], "u": [1]}


# --------------------------------------------------------------- topology


def test_two_group_members_split_three_partitions(server):
    """Reference topology: two consumer-group members share a 3-partition
    topic via range assignment, each message delivered to exactly one
    member (horizontal worker scale-out, consumer.go:21-27)."""
    topic, group = "image-processing", "image-processor-group"
    a = KafkaBroker(brokers=[server.address])
    b = KafkaBroker(brokers=[server.address])
    try:
        a.create_topic(topic, 3)
        assert a.poll(topic, group, max_n=10) == []  # a joins alone

        seen_a: list[bytes] = []
        stop = threading.Event()

        def pump_a():
            while not stop.is_set():
                for m in a.poll(topic, group, max_n=10):
                    seen_a.append(m.value)
                    a.ack(m)
                time.sleep(0.02)

        t = threading.Thread(target=pump_a, daemon=True)
        t.start()
        try:
            seen_b: list[bytes] = []
            deadline = time.monotonic() + 20
            joined = False
            while time.monotonic() < deadline and not joined:
                b.poll(topic, group, max_n=10)
                cb = b._consumers[(topic, group)]
                ca = a._consumers[(topic, group)]
                joined = (sorted(ca.partitions + cb.partitions) == [0, 1, 2]
                          and ca.generation == cb.generation)
            assert joined, "group never stabilized with both members"
            ca, cb = (a._consumers[(topic, group)],
                      b._consumers[(topic, group)])
            assert set(ca.partitions).isdisjoint(cb.partitions)
            assert {len(ca.partitions), len(cb.partitions)} == {1, 2}

            payloads = {f"img-{i}".encode() for i in range(30)}
            for p in sorted(payloads):
                a.produce(topic, p, p)  # distinct keys spread partitions

            deadline = time.monotonic() + 20
            while (len(seen_a) + len(seen_b) < 30
                   and time.monotonic() < deadline):
                for m in b.poll(topic, group, max_n=10):
                    seen_b.append(m.value)
                    b.ack(m)
                time.sleep(0.02)
        finally:
            stop.set()
            t.join(timeout=5)
        assert len(seen_a) + len(seen_b) == 30  # exactly-once across members
        assert set(seen_a) | set(seen_b) == payloads
        assert seen_a and seen_b  # both members did real work
    finally:
        a.close()
        b.close()


def test_rebalance_reclaims_partitions_after_member_leaves(server):
    topic, group = "t", "g"
    a = KafkaBroker(brokers=[server.address])
    b = KafkaBroker(brokers=[server.address])
    a.create_topic(topic, 3)
    a.poll(topic, group, max_n=1)

    stop = threading.Event()

    def pump_a():
        while not stop.is_set():
            for m in a.poll(topic, group, max_n=10):
                a.ack(m)
            time.sleep(0.02)

    t = threading.Thread(target=pump_a, daemon=True)
    t.start()
    try:
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            b.poll(topic, group, max_n=1)
            if len(b._consumers[(topic, group)].partitions) >= 1 and \
                    len(a._consumers[(topic, group)].partitions) < 3:
                break
        assert len(a._consumers[(topic, group)].partitions) < 3
        b.close()  # LeaveGroup -> rebalance
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            if len(a._consumers[(topic, group)].partitions) == 3:
                break
            time.sleep(0.05)
        assert len(a._consumers[(topic, group)].partitions) == 3
    finally:
        stop.set()
        t.join(timeout=5)
        a.close()


def test_commit_watermark_survives_client_restart(server):
    """Kafka's actual durability contract: a restarted group member
    resumes from the committed watermark — acked messages never replay,
    unacked ones do (at-least-once, worker.go:125-146)."""
    topic, group = "wm", "g"
    c1 = KafkaBroker(brokers=[server.address])
    c1.create_topic(topic, 1)
    for i in range(4):
        c1.produce(topic, b"k", f"m{i}".encode())
    got = c1.poll(topic, group, max_n=2, lease_s=60)
    assert [m.value for m in got] == [b"m0", b"m1"]
    for m in got:
        assert c1.ack(m)
    c1.close()  # m2, m3 never delivered/committed

    c2 = KafkaBroker(brokers=[server.address])
    got2 = c2.poll(topic, group, max_n=10, lease_s=60)
    assert [m.value for m in got2] == [b"m2", b"m3"]
    c2.close()


def test_depth_via_list_offsets(server):
    c = KafkaBroker(brokers=[server.address])
    c.create_topic("t", 3)
    for i in range(5):
        c.produce("t", f"k{i}".encode(), b"v")
    assert c.depth("t", "g") == 5
    msgs = c.poll("t", "g", max_n=5)
    for m in msgs:
        c.ack(m)
    assert c.depth("t", "g") == 0
    c.close()


# ------------------------------------------------------------ worker e2e


def test_worker_end_to_end_over_kafka_wire(server, tmp_path):
    """The full service path with BROKER_BACKEND=kafka: upload enqueues a
    task through the wire protocol, the worker consumes it from the
    consumer group, processes, publishes to the results topic, commits."""
    from imageprocessor_tpu.broker.base import build_broker
    from imageprocessor_tpu.config import load as load_config
    from imageprocessor_tpu.domain import (
        ImageStatus,
        OperationParams,
        OperationType,
        ProcessingResult,
    )
    from imageprocessor_tpu.service.usecase import ImageUsecase
    from imageprocessor_tpu.service.worker import Worker
    from imageprocessor_tpu.storage import (
        LocalFSObjectStore,
        SQLiteMetadataStore,
    )
    from imageprocessor_tpu.utils import RetryStrategy

    cfg = load_config({"BROKER_BACKEND": "kafka",
                       "KAFKA_BROKERS": server.address})
    cfg.worker.batch_size = 4
    broker = build_broker(cfg.broker)
    assert isinstance(broker, KafkaBroker)
    meta = SQLiteMetadataStore(":memory:")
    store = LocalFSObjectStore(str(tmp_path / "objects"))
    uc = ImageUsecase(meta, store, broker,
                      retries=RetryStrategy(attempts=1, delay_ms=1))
    worker = Worker(cfg, meta=meta, store=store, broker=broker)
    try:
        arr = RNG.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
        bio = io.BytesIO()
        PILImage.fromarray(arr).save(bio, format="PNG")
        img = uc.upload_image(bio.getvalue(), "a.png", "image/png", [
            OperationParams(OperationType.THUMBNAIL,
                            {"size": 32, "crop_to_fit": True})])
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if worker.run_once() and \
                    meta.get_image(img.id).status is ImageStatus.COMPLETED:
                break
        assert meta.get_image(img.id).status is ImageStatus.COMPLETED
        rows = meta.list_processed(img.id)
        assert len(rows) == 1 and store.get_object(rows[0].path)
        # the task was committed: nothing redelivers
        assert broker.depth(cfg.broker.processing_topic,
                            cfg.broker.group_id) == 0
        # completion published to the results topic over the wire
        res_msgs = broker.poll(cfg.broker.results_topic, "observer",
                               max_n=4)
        assert len(res_msgs) == 1
        res = ProcessingResult.from_json(res_msgs[0].value)
        assert res.image_id == img.id
        assert res.status is ImageStatus.COMPLETED
    finally:
        worker.close()


# ------------------------------------------- deployment-hardening paths


def test_commit_watermark_tolerates_offset_gaps():
    """Compacted/truncated partitions deliver non-dense offsets; the
    commit watermark must advance across the gaps (a dense +1 walk stalls
    forever at the first hole and leaks inflight entries)."""
    from imageprocessor_tpu.broker.kafka import _Consumer, _InFlight
    from imageprocessor_tpu.broker.base import BrokerMessage

    b = KafkaBroker(brokers=["localhost:1"])  # never contacted
    commits = []
    b._offset_commit = lambda c, pid, off: commits.append((pid, off))

    c = _Consumer("t", "g")
    c.partitions = [0]
    c.committed = {0: 5}
    c.positions = {0: 9}  # next fetch; offset 6 does not exist (gap)
    for off in (5, 7, 8):
        tok = f"tok{off}"
        msg = BrokerMessage(topic="t", partition=0, offset=off,
                            key=b"", value=b"", token=tok)
        c.inflight[(0, off)] = _InFlight(msg, tok, 1e18)
        b._tokens[tok] = (c, 0, off)
    b._consumers[("t", "g")] = c

    assert b.ack(c.inflight[(0, 5)].msg)
    # 5 done -> watermark jumps the hole at 6 to the first pending (7)
    assert c.committed[0] == 7 and commits[-1] == (0, 7)
    assert (0, 5) not in c.inflight

    assert b.ack(c.inflight[(0, 8)].msg)   # out of order: 7 still pending
    assert c.committed[0] == 7
    assert b.ack(c.inflight[(0, 7)].msg)
    # everything delivered is done -> watermark = fetch position
    assert c.committed[0] == 9 and commits[-1] == (0, 9)
    assert not c.inflight


def test_coordinator_cache_invalidated_on_errors():
    """NOT_COORDINATOR and dead connections must drop the cached
    coordinator address so the client re-resolves instead of retrying a
    stale broker forever."""
    b = KafkaBroker(brokers=["localhost:1"])
    from imageprocessor_tpu.broker.kafka import _Consumer

    b._coord["g"] = ("dead-host", 1234)
    c = _Consumer("t", "g")
    c.generation, c.member_id, c.joined = 1, "m", True
    c.last_heartbeat = 0.0

    calls = []

    class _FakeConn:
        def pick(self, api, preferred):
            return 0

    def fail_req(addr, api, ver, body):
        calls.append(addr)
        raise OSError("connection refused")

    b._conn = lambda addr: _FakeConn()  # negotiation reaches no socket
    b._req = fail_req
    assert b._heartbeat_ok(c) is False
    assert "g" not in b._coord          # cache dropped for re-resolution
    assert calls == [("dead-host", 1234)]


def test_wire_decoders_raise_only_wireerror_on_garbage():
    """Malformed frames from a broker must surface as WireError (which
    every caller handles with reconnect/rejoin), never leak a different
    exception class past the protocol layer."""
    import random

    rng = random.Random(7)
    for _trial in range(500):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
        for fn in (kw.decode_message_set, kw.decode_subscription,
                   kw.decode_assignment, kw.decode_records):
            try:
                fn(data)
            except kw.WireError:
                pass  # the only acceptable failure mode


def test_poll_filters_records_below_position():
    """RecordBatch fetches return WHOLE batches: when the fetch offset
    lands mid-batch, records below the consumer position must be
    skipped — consuming them would redeliver still-leased messages and
    invalidate their outstanding lease tokens (the original delivery's
    ack would return False and the image would process twice)."""
    from imageprocessor_tpu.broker.kafka import _Consumer

    b = KafkaBroker(brokers=["localhost:1"])  # never contacted
    c = _Consumer("t", "g")
    c.joined = True
    c.partitions = [0]
    c.positions = {0: 0}
    c.committed = {0: 0}
    b._consumers[("t", "g")] = c
    b._heartbeat_ok = lambda _c: True
    batch = [kw.WireMessage(i, b"k", f"v{i}".encode(), -1)
             for i in range(4)]
    b._fetch = lambda cc, pid, max_bytes=1 << 20: (
        (batch, 4) if cc.positions[pid] < 4 else ([], None))

    first = b.poll("t", "g", max_n=2, lease_s=60)
    assert [m.offset for m in first] == [0, 1]
    # position is now mid-batch (2); the broker re-returns the whole
    # batch — offsets 0 and 1 must NOT redeliver
    second = b.poll("t", "g", max_n=10, lease_s=60)
    assert [m.offset for m in second] == [2, 3]
    # the first delivery's leases survived the re-fetch
    for m in first + second:
        assert b.ack(m), f"ack failed for offset {m.offset}"


def test_poll_advances_over_compacted_batch_without_livelock():
    """A log-compacted batch can span ONLY offsets below the position
    (surviving records 5-6, position 7, batch end 10): every record
    filters out, and poll must advance the position past the batch via
    the header's end offset instead of re-fetching the same batch
    forever while holding the broker lock."""
    from imageprocessor_tpu.broker.kafka import _Consumer

    b = KafkaBroker(brokers=["localhost:1"])  # never contacted
    c = _Consumer("t", "g")
    c.joined = True
    c.partitions = [0]
    c.positions = {0: 7}
    c.committed = {0: 7}
    b._consumers[("t", "g")] = c
    b._heartbeat_ok = lambda _c: True
    compacted = [kw.WireMessage(5, b"k", b"v5", -1),
                 kw.WireMessage(6, b"k", b"v6", -1)]
    fresh = [kw.WireMessage(10, b"k", b"v10", -1)]

    def fetch(cc, pid, max_bytes=1 << 20):
        if cc.positions[pid] < 10:
            return compacted, 10  # batch [5..9], records 7-9 compacted
        return fresh, 11

    b._fetch = fetch
    t0 = time.monotonic()
    got = b.poll("t", "g", max_n=5, lease_s=60)
    assert time.monotonic() - t0 < 5.0, "poll livelocked"
    assert [m.offset for m in got] == [10]
    assert c.positions[0] == 11


def test_records_next_offset_reads_batch_headers():
    buf = kw.encode_record_batch(
        [(5, b"k", b"v", 1), (9, b"k", b"w", 2)], base_offset=5)
    assert kw.records_next_offset(buf) == 10  # lastOffsetDelta end
    legacy = kw.encode_message_set([(3, b"k", b"v")])
    assert kw.records_next_offset(legacy) == 4
    assert kw.records_next_offset(b"") is None


def test_offset_commit_v1_interop():
    """A broker whose max OffsetCommit is v1 (0.8.2/0.9 era) requires
    the per-partition commit timestamp field; a malformed v1 body loses
    the commit and the restarted client replays acked messages."""
    s = KafkaServer(default_partitions=1, api_versions_override={
        kw.PRODUCE: (0, 3), kw.FETCH: (0, 4), kw.METADATA: (0, 4),
        kw.LIST_OFFSETS: (0, 1), kw.FIND_COORDINATOR: (0, 1),
        kw.JOIN_GROUP: (0, 2), kw.SYNC_GROUP: (0, 1),
        kw.HEARTBEAT: (0, 1), kw.LEAVE_GROUP: (0, 1),
        kw.OFFSET_COMMIT: (0, 1), kw.OFFSET_FETCH: (0, 1),
        kw.API_VERSIONS: (0, 0), kw.CREATE_TOPICS: (0, 2),
    })
    c1 = KafkaBroker(brokers=[s.address])
    try:
        c1.create_topic("v1c", 1)
        c1.produce("v1c", b"k", b"m0")
        c1.produce("v1c", b"k", b"m1")
        [m] = c1.poll("v1c", "g", max_n=1)
        assert c1.ack(m)  # commits via OffsetCommit v1
        c1.close()
        c2 = KafkaBroker(brokers=[s.address])
        got = c2.poll("v1c", "g", max_n=10)
        assert [x.value for x in got] == [b"m1"], \
            "v1 commit was lost (malformed request?)"
        c2.close()
    finally:
        c1.close()
        s.close()


# -------------------------------------------- version negotiation matrix


def test_modern_broker_uses_v2_batches_and_timestamps(server):
    """Against an ApiVersions-speaking broker the client negotiates
    Produce v3 / Fetch v4 (RecordBatch v2): timestamps survive the wire,
    so queue_wait_ms works on real brokers."""
    c = KafkaBroker(brokers=[server.address])
    try:
        c.create_topic("vt", 1)
        before = time.time()
        c.produce("vt", b"k", b"payload")
        conn = next(iter(c._conns.values()))
        assert conn.api_versions.get(kw.PRODUCE) == (0, 3)
        assert conn.pick(kw.PRODUCE, 3) == 3
        assert conn.pick(kw.FETCH, 4) == 4
        [m] = c.poll("vt", "g", max_n=1)
        assert m.value == b"payload"
        assert before - 2 <= m.enqueued_at <= time.time() + 2
        assert c.ack(m)
    finally:
        c.close()


def test_legacy_broker_falls_back_to_v0():
    """A pre-0.10 broker (no ApiVersions — the connection drops) still
    works over v0 APIs with magic-0 message sets; timestamps are simply
    unavailable there (enqueued_at == 0)."""
    s = KafkaServer(default_partitions=1, legacy=True)
    c = KafkaBroker(brokers=[s.address])
    try:
        c.create_topic("lt", 1)
        c.produce("lt", b"k", b"old-school")
        conn = next(iter(c._conns.values()))
        assert conn.api_versions == {}
        [m] = c.poll("lt", "g", max_n=1)
        assert m.value == b"old-school"
        assert m.enqueued_at == 0.0
        assert c.ack(m)
        [m2] = c.poll("lt", "g2", max_n=1)  # second group re-reads
        assert m2.value == b"old-school"
    finally:
        c.close()
        s.close()


def test_kafka4_modern_only_broker_full_cycle():
    """A strict Kafka 4.x-like broker (every version below the KIP-896
    minimum is REJECTED by disconnect) must serve the full client cycle:
    topic creation, metadata, keyed produce, consumer-group membership,
    fetch, commit, restart resume, depth. Proves the client never emits
    a removed version on a negotiated-modern connection."""
    s = KafkaServer(default_partitions=3, rebalance_timeout_s=2.0,
                    modern_only=True)
    c = KafkaBroker(brokers=[s.address])
    try:
        c.create_topic("m4", 3)
        for i in range(6):
            c.produce("m4", f"k{i}".encode(), f"v{i}".encode())
        got = []
        deadline = time.monotonic() + 20
        while len(got) < 6 and time.monotonic() < deadline:
            for m in c.poll("m4", "g4", max_n=10):
                got.append(m.value)
                assert m.enqueued_at > 0  # v2 batches carry timestamps
                assert c.ack(m)
        assert sorted(got) == sorted(f"v{i}".encode() for i in range(6))
        assert c.depth("m4", "g4") == 0
        c.close()
        # committed watermark survives the client restart (OffsetFetch
        # v1 / OffsetCommit v2 round-trip through the coordinator)
        c2 = KafkaBroker(brokers=[s.address])
        c2.produce("m4", b"k9", b"after")
        [m] = c2.poll("m4", "g4", max_n=10)
        assert m.value == b"after"
        c2.close()
    finally:
        c.close()
        s.close()


def test_no_common_version_raises_clear_error():
    """A broker whose advertised range excludes every version the client
    speaks must produce a clear MessageQueueError naming the ranges —
    never an opaque WireError."""
    from imageprocessor_tpu.errors import MessageQueueError

    s = KafkaServer(default_partitions=1, api_versions_override={
        kw.PRODUCE: (9, 12), kw.FETCH: (15, 17),
        kw.METADATA: (0, 0), kw.API_VERSIONS: (0, 0),
        kw.CREATE_TOPICS: (0, 0),
    })
    c = KafkaBroker(brokers=[s.address])
    try:
        c.create_topic("nt", 1)
        with pytest.raises(MessageQueueError, match="no common version"):
            c.produce("nt", b"k", b"v")
    finally:
        c.close()
        s.close()


def test_absent_api_raises_clear_error_not_v0():
    """A broker that advertises ApiVersions but OMITS an API entirely
    has removed it (KIP-896 taken one step further): the client must
    raise the clear no-common-version error, not silently send v0 (a
    modern broker would drop the connection -> opaque WireError loop)."""
    from imageprocessor_tpu.errors import MessageQueueError

    s = KafkaServer(default_partitions=1, api_versions_override={
        kw.METADATA: (0, 4), kw.API_VERSIONS: (0, 0),
        kw.CREATE_TOPICS: (0, 2),   # PRODUCE deliberately absent
    })
    c = KafkaBroker(brokers=[s.address])
    try:
        c.create_topic("nt2", 1)
        with pytest.raises(MessageQueueError, match="no common version"):
            c.produce("nt2", b"k", b"v")
    finally:
        c.close()
        s.close()


def test_dead_member_evicted_after_session_timeout(monkeypatch):
    """A SIGKILLed worker never sends LeaveGroup: the server must evict
    it once its session times out so its partitions reassign — without
    eviction the survivor heartbeats NONE forever and 2-of-3 partitions'
    messages sit unconsumed indefinitely."""
    from imageprocessor_tpu.broker import kafka as kafka_mod

    monkeypatch.setattr(kafka_mod, "_SESSION_TIMEOUT_MS", 1500)
    s = KafkaServer(default_partitions=3, rebalance_timeout_s=1.0)
    topic, group = "image-processing", "image-processor-group"
    a = KafkaBroker(brokers=[s.address])
    b = KafkaBroker(brokers=[s.address])
    got: list[bytes] = []
    stop = threading.Event()

    def pump_a():
        while not stop.is_set():
            try:
                for m in a.poll(topic, group, max_n=10):
                    got.append(m.value)
                    a.ack(m)
            except Exception:
                pass
            time.sleep(0.02)

    t = threading.Thread(target=pump_a, daemon=True)
    try:
        a.create_topic(topic, 3)
        a.poll(topic, group, max_n=10)          # a joins alone
        t.start()

        # b joins; wait until a proper 2-member split forms
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            b.poll(topic, group, max_n=10)
            ca = a._consumers[(topic, group)]
            cb = b._consumers[(topic, group)]
            if (ca.joined and cb.joined
                    and sorted(ca.partitions + cb.partitions) == [0, 1, 2]
                    and ca.generation == cb.generation
                    and ca.partitions and cb.partitions):
                break
            time.sleep(0.05)
        else:
            raise AssertionError("two-member split never formed")

        # b dies silently (no LeaveGroup, no more heartbeats)
        b.close()

        # a keeps polling; the server evicts b at session timeout and a
        # rebalances to own all 3 partitions
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            ca = a._consumers[(topic, group)]
            if ca.joined and len(ca.partitions) == 3:
                break
            time.sleep(0.1)
        else:
            raise AssertionError("dead member never evicted")

        # every partition consumable again: keyed messages all reach a
        for i in range(9):
            a.produce(topic, f"k{i}".encode(), f"v{i}".encode())
        deadline = time.monotonic() + 20
        while len(got) < 9 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert sorted(got) == sorted(f"v{i}".encode() for i in range(9))
    finally:
        stop.set()
        t.join(timeout=5)
        a.close()
        b.close()
        s.close()


def test_commit_coalescing_defers_and_flushes():
    """KAFKA_COMMIT_INTERVAL > 0: acks advance the local watermark but
    OffsetCommit is deferred (each ack's RTT under the client lock
    otherwise caps pipelined completions at ~1/RTT on remote brokers);
    close() flushes, so a clean restart resumes past the acked work.
    A crash before the flush only redelivers — verified by the second
    client seeing the pre-flush committed offset."""
    s = KafkaServer(default_partitions=1)
    topic, group = "coal", "g"
    a = KafkaBroker(brokers=[s.address], commit_interval_ms=3_600_000)
    probe = KafkaBroker(brokers=[s.address])
    try:
        a.create_topic(topic, 1)
        for i in range(3):
            a.produce(topic, b"k", f"v{i}".encode())
        got = []
        deadline = time.monotonic() + 10
        while len(got) < 3 and time.monotonic() < deadline:
            for m in a.poll(topic, group, max_n=5):
                got.append(m)
                a.ack(m)
        assert len(got) == 3
        # deferred: the broker still has no committed offset
        assert probe._offset_fetch(group, topic, [0]).get(0, 0) == 0
        a.close()   # flush
        assert probe._offset_fetch(group, topic, [0]).get(0, 0) == 3
    finally:
        a.close()
        probe.close()
        s.close()


def test_commit_default_stays_synchronous():
    """Default (interval 0) keeps the strongest semantics: every ack's
    watermark is committed before ack() returns."""
    s = KafkaServer(default_partitions=1)
    topic, group = "sync", "g"
    a = KafkaBroker(brokers=[s.address])
    probe = KafkaBroker(brokers=[s.address])
    try:
        a.create_topic(topic, 1)
        a.produce(topic, b"k", b"v0")
        deadline = time.monotonic() + 10
        acked = False
        while not acked and time.monotonic() < deadline:
            for m in a.poll(topic, group, max_n=1):
                a.ack(m)
                acked = True
        assert acked
        assert probe._offset_fetch(group, topic, [0]).get(0, 0) == 1
    finally:
        a.close()
        probe.close()
        s.close()
