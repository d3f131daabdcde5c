"""In-process single-node Kafka-wire-compatible broker.

Speaks the same protocol subset as the client (broker/kafkawire.py):
Metadata/Produce/Fetch/ListOffsets/FindCoordinator/OffsetCommit/
OffsetFetch/JoinGroup/SyncGroup/Heartbeat/LeaveGroup/CreateTopics, legacy
message format. Two jobs:

1. the test double for KafkaBroker — the contract suite runs the real
   client over real sockets against this (the same in-process-stub
   pattern storage/s3.py's SigV4 tests use), and
2. a zero-dependency dev queue: `standalone --kafka` style deployments
   can point KAFKA_BROKERS at one of these instead of a Kafka cluster.

Group coordination implements the real rebalance protocol shape:
JoinGroup parks members until the round completes (all known members
re-joined, or the round times out and drops stragglers), generations
bump once per round, SyncGroup distributes the leader's assignments,
Heartbeat answers REBALANCE_IN_PROGRESS / ILLEGAL_GENERATION so clients
know to re-join, and members whose advertised session timeout elapses
with no heartbeat/commit/join are EVICTED (lazily, on the next group
request) so a kill -9'd worker's partitions reassign instead of staying
bound to a corpse (reference topology: consumer group over 3
partitions, internal/broker/kafka/consumer.go:21-56, Makefile:24-25).
"""

from __future__ import annotations

import socket
import struct
import threading
import time

from imageprocessor_tpu.broker import kafkawire as kw


class _Group:
    def __init__(self):
        self.generation = 0
        self.members: dict[str, bytes] = {}      # member_id -> metadata
        self.leader = ""
        self.state = "Empty"                     # Empty|Rebalancing|Stable
        self.pending: dict[str, bytes] = {}
        self.assignments: dict[str, bytes] = {}
        self.assign_generation = -1
        self.round_deadline = 0.0
        self.member_seq = 0
        self.offsets: dict[tuple[str, int], int] = {}  # (topic, pid) -> off
        # Session-timeout liveness (a SIGKILLed worker sends no
        # LeaveGroup; without eviction its partitions never reassign):
        self.last_seen: dict[str, float] = {}    # member_id -> monotonic
        self.session_s: dict[str, float] = {}    # member_id -> timeout


class KafkaServer:
    """Threaded TCP server; one thread per connection."""

    # api -> (kafka4_min, served_max). Single source of truth: the min
    # column is what KIP-896 removed everything below (Kafka 4.x
    # behavior in modern_only mode), the max column is the highest
    # version the handlers implement.
    API_TABLE = {
        kw.PRODUCE: (3, 3), kw.FETCH: (4, 4), kw.LIST_OFFSETS: (1, 1),
        kw.METADATA: (4, 4), kw.OFFSET_COMMIT: (2, 2),
        kw.OFFSET_FETCH: (1, 1), kw.FIND_COORDINATOR: (1, 1),
        kw.JOIN_GROUP: (2, 2), kw.HEARTBEAT: (1, 1),
        kw.LEAVE_GROUP: (1, 1), kw.SYNC_GROUP: (1, 1),
        kw.API_VERSIONS: (0, 0), kw.CREATE_TOPICS: (2, 2),
    }
    K4_MIN = {k: v[0] for k, v in API_TABLE.items()}

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 default_partitions: int = 3,
                 rebalance_timeout_s: float = 1.0,
                 legacy: bool = False,
                 modern_only: bool = False,
                 api_versions_override: dict[int, tuple[int, int]]
                 | None = None):
        # legacy=True simulates a pre-0.10 broker: ApiVersions closes the
        # connection, only v0 requests are answered — contract-tests the
        # client's fallback path. modern_only=True simulates a Kafka 4.x
        # broker: versions below K4_MIN are REJECTED (connection drop,
        # like a real broker's disconnect on removed versions), proving
        # the client never sends them. api_versions_override replaces the
        # advertised ranges (e.g. a future broker that dropped every
        # version we speak) to test the no-common-version error.
        self._legacy = legacy
        self._modern_only = modern_only
        self._api_versions_override = api_versions_override
        self._lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind((host, port))
        self._lsock.listen(64)
        self.host, self.port = self._lsock.getsockname()
        self._default_partitions = default_partitions
        self._rebalance_timeout_s = rebalance_timeout_s
        self._lock = threading.RLock()
        self._cond = threading.Condition(self._lock)
        # topic -> list of partition logs, each [(key, value)]
        self._topics: dict[str, list[list[tuple[bytes, bytes]]]] = {}
        self._groups: dict[str, _Group] = {}
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        t = threading.Thread(target=self._accept_loop, name="kafka-accept",
                             daemon=True)
        t.start()
        self._threads.append(t)

    @property
    def address(self) -> str:
        return f"{self.host}:{self.port}"

    def close(self) -> None:
        self._stop.set()
        try:
            self._lsock.close()
        except OSError:
            pass
        with self._cond:
            self._cond.notify_all()

    # ---------------------------------------------------------------- accept

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._lsock.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,),
                                 daemon=True)
            t.start()
            # reap finished connection threads so a long-lived dev queue
            # (clients reconnect on every rebalance) doesn't accumulate
            # dead Thread objects unboundedly
            self._threads = [x for x in self._threads if x.is_alive()]
            self._threads.append(t)

    def _serve(self, conn: socket.socket) -> None:
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        try:
            while not self._stop.is_set():
                try:
                    frame = kw.read_frame(conn)
                except kw.WireError:
                    return
                r = kw.Reader(frame)
                api = r.i16()
                ver = r.i16()
                corr = r.i32()
                r.string()  # client id
                if self._legacy and (api == kw.API_VERSIONS or ver > 0):
                    return  # pre-0.10 behavior: drop the connection
                if self._modern_only and ver < self.K4_MIN.get(api, 0):
                    return  # Kafka 4.x: removed version -> disconnect
                handler = self._handlers().get(api)
                if handler is None:
                    return
                body = handler(r, ver)
                payload = struct.pack(">i", corr) + body
                conn.sendall(struct.pack(">i", len(payload)) + payload)
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _handlers(self):
        return {
            kw.API_VERSIONS: self._h_api_versions,
            kw.METADATA: self._h_metadata,
            kw.PRODUCE: self._h_produce,
            kw.FETCH: self._h_fetch,
            kw.LIST_OFFSETS: self._h_list_offsets,
            kw.FIND_COORDINATOR: self._h_find_coordinator,
            kw.OFFSET_COMMIT: self._h_offset_commit,
            kw.OFFSET_FETCH: self._h_offset_fetch,
            kw.JOIN_GROUP: self._h_join_group,
            kw.SYNC_GROUP: self._h_sync_group,
            kw.HEARTBEAT: self._h_heartbeat,
            kw.LEAVE_GROUP: self._h_leave_group,
            kw.CREATE_TOPICS: self._h_create_topics,
        }

    # ----------------------------------------------------------------- state

    def _ensure_topic(self, name: str, partitions: int | None = None
                      ) -> list[list[tuple[bytes, bytes]]]:
        t = self._topics.get(name)
        if t is None:
            t = [[] for _ in range(partitions or self._default_partitions)]
            self._topics[name] = t
        return t

    # -------------------------------------------------------------- handlers

    def _h_api_versions(self, r: kw.Reader, ver: int) -> bytes:
        vers = self._api_versions_override or {
            k: ((vmin if self._modern_only else 0), vmax)
            for k, (vmin, vmax) in self.API_TABLE.items()
        }
        w = kw.Writer().i16(kw.NONE)
        w.array(sorted(vers.items()),
                lambda ww, kv: ww.i16(kv[0]).i16(kv[1][0]).i16(kv[1][1]))
        return w.done()

    def _h_metadata(self, r: kw.Reader, ver: int) -> bytes:
        names = r.array(lambda rr: rr.string())
        if ver >= 4:
            r.i8()  # allow_auto_topic_creation
        with self._lock:
            if not names:
                names = sorted(self._topics)
            else:
                for n in names:  # auto.create.topics.enable=true
                    self._ensure_topic(n)
            w = kw.Writer()
            if ver >= 3:
                w.i32(0)  # throttle_time_ms
            w.i32(1)  # brokers
            w.i32(0).string(self.host).i32(self.port)
            if ver >= 1:
                w.string(None)  # rack
            if ver >= 2:
                w.string("ipkafka-dev")  # cluster_id
            if ver >= 1:
                w.i32(0)  # controller_id
            w.i32(len(names))
            for n in names:
                parts = self._topics[n]
                w.i16(kw.NONE).string(n)
                if ver >= 1:
                    w.i8(0)  # is_internal
                w.i32(len(parts))
                for pid in range(len(parts)):
                    (w.i16(kw.NONE).i32(pid).i32(0)
                     .array([0], lambda ww, x: ww.i32(x))
                     .array([0], lambda ww, x: ww.i32(x)))
            return w.done()

    def _h_produce(self, r: kw.Reader, ver: int) -> bytes:
        if ver >= 3:
            r.string()  # transactional_id
        r.i16()  # acks
        r.i32()  # timeout
        results = []
        with self._lock:
            for _ in range(r.i32()):
                topic = r.string()
                plog = self._ensure_topic(topic)
                for _ in range(r.i32()):
                    pid = r.i32()
                    mset = r.bytes_() or b""
                    if pid >= len(plog):
                        results.append((topic, pid,
                                        kw.UNKNOWN_TOPIC_OR_PARTITION, -1))
                        continue
                    base = len(plog[pid])
                    # decode_records handles both RecordBatch v2 (ver>=3)
                    # and legacy magic-0/1 message sets.
                    for m in kw.decode_records(mset):
                        plog[pid].append((m.key or b"", m.value or b"",
                                          m.timestamp_ms))
                    results.append((topic, pid, kw.NONE, base))
        w = kw.Writer()
        w.i32(len(results))
        for topic, pid, err, base in results:
            w.string(topic).i32(1).i32(pid).i16(err).i64(base)
            if ver >= 2:
                w.i64(-1)  # log_append_time (CreateTime in use)
        if ver >= 1:
            w.i32(0)  # throttle_time_ms
        return w.done()

    def _h_fetch(self, r: kw.Reader, ver: int) -> bytes:
        r.i32()  # replica
        r.i32()  # max wait
        r.i32()  # min bytes
        if ver >= 3:
            r.i32()  # request-level max_bytes
        if ver >= 4:
            r.i8()   # isolation_level
        w = kw.Writer()
        if ver >= 1:
            w.i32(0)  # throttle_time_ms
        with self._lock:
            n_topics = r.i32()
            w.i32(n_topics)
            for _ in range(n_topics):
                topic = r.string()
                plog = self._topics.get(topic, [])
                n_parts = r.i32()
                w.string(topic).i32(n_parts)
                for _ in range(n_parts):
                    pid = r.i32()
                    off = r.i64()
                    max_bytes = r.i32()
                    if pid >= len(plog):
                        w.i32(pid).i16(kw.UNKNOWN_TOPIC_OR_PARTITION)
                        w.i64(0)
                        self._fetch_tail(w, ver, b"")
                        continue
                    log = plog[pid]
                    if off > len(log) or off < 0:
                        w.i32(pid).i16(kw.OFFSET_OUT_OF_RANGE)
                        w.i64(len(log))
                        self._fetch_tail(w, ver, b"")
                        continue
                    entries = []
                    size = 0
                    for i in range(off, len(log)):
                        k, v, ts = log[i]
                        size += 70 + len(k) + len(v)
                        if entries and size > max_bytes:
                            break
                        entries.append((i, k, v, ts))
                    if ver >= 4:
                        mset = (kw.encode_record_batch(entries, entries[0][0])
                                if entries else b"")
                    else:
                        mset = kw.encode_message_set(entries)
                    w.i32(pid).i16(kw.NONE).i64(len(log))
                    self._fetch_tail(w, ver, mset)
        return w.done()

    @staticmethod
    def _fetch_tail(w: kw.Writer, ver: int, mset: bytes) -> None:
        if ver >= 4:
            w.i64(-1)                            # last_stable_offset
            w.array([], lambda *_: None)         # aborted_transactions
        w.bytes_(mset)

    def _h_list_offsets(self, r: kw.Reader, ver: int) -> bytes:
        r.i32()  # replica
        w = kw.Writer()
        with self._lock:
            n_topics = r.i32()
            w.i32(n_topics)
            for _ in range(n_topics):
                topic = r.string()
                plog = self._topics.get(topic, [])
                n_parts = r.i32()
                w.string(topic).i32(n_parts)
                for _ in range(n_parts):
                    pid = r.i32()
                    ts = r.i64()
                    if ver == 0:
                        r.i32()  # max offsets (dropped in v1)
                    if pid >= len(plog):
                        w.i32(pid).i16(kw.UNKNOWN_TOPIC_OR_PARTITION)
                        if ver >= 1:
                            w.i64(-1).i64(-1)
                        else:
                            w.array([], lambda ww, x: ww.i64(x))
                        continue
                    off = 0 if ts == -2 else len(plog[pid])
                    w.i32(pid).i16(kw.NONE)
                    if ver >= 1:
                        w.i64(-1).i64(off)  # timestamp, offset
                    else:
                        w.array([off], lambda ww, x: ww.i64(x))
        return w.done()

    def _h_find_coordinator(self, r: kw.Reader, ver: int) -> bytes:
        r.string()  # group / key
        if ver >= 1:
            r.i8()  # key_type
        w = kw.Writer()
        if ver >= 1:
            w.i32(0)  # throttle_time_ms
        w.i16(kw.NONE)
        if ver >= 1:
            w.string(None)  # error_message
        return w.i32(0).string(self.host).i32(self.port).done()

    def _h_offset_commit(self, r: kw.Reader, ver: int) -> bytes:
        group = r.string()
        member_id = ""
        if ver >= 1:
            r.i32()     # generation_id
            member_id = r.string()
        if ver >= 2:
            r.i64()     # retention_time_ms
        w = kw.Writer()
        with self._lock:
            g = self._groups.setdefault(group, _Group())
            if member_id in g.members:  # commits count as liveness
                g.last_seen[member_id] = time.monotonic()
            n_topics = r.i32()
            w.i32(n_topics)
            for _ in range(n_topics):
                topic = r.string()
                n_parts = r.i32()
                w.string(topic).i32(n_parts)
                for _ in range(n_parts):
                    pid = r.i32()
                    off = r.i64()
                    if ver == 1:
                        r.i64()  # per-partition timestamp (v1 only)
                    r.string()  # metadata
                    g.offsets[(topic, pid)] = off
                    w.i32(pid).i16(kw.NONE)
        return w.done()

    def _h_offset_fetch(self, r: kw.Reader, ver: int) -> bytes:
        group = r.string()
        w = kw.Writer()
        with self._lock:
            g = self._groups.setdefault(group, _Group())
            n_topics = r.i32()
            w.i32(n_topics)
            for _ in range(n_topics):
                topic = r.string()
                pids = r.array(lambda rr: rr.i32())
                w.string(topic).i32(len(pids))
                for pid in pids:
                    off = g.offsets.get((topic, pid), -1)
                    w.i32(pid).i64(off).string("").i16(kw.NONE)
        return w.done()

    # ----------------------------------------------------- group coordination

    def _evict_expired(self, g: _Group) -> None:
        """Drop STABLE-state members whose session timed out (no
        heartbeat/commit/join): a kill -9'd worker never leaves, and
        without eviction its partitions stay assigned to a corpse
        forever. Survivors get REBALANCE_IN_PROGRESS on their next
        heartbeat and rejoin. Caller holds the lock. Members parked in a
        rebalance round are exempt — they cannot heartbeat while parked;
        the round's own deadline drops stragglers."""
        if g.state != "Stable":
            return
        now = time.monotonic()
        dead = [m for m in g.members
                if now - g.last_seen.get(m, now)
                > g.session_s.get(m, 30.0)]
        if not dead:
            return
        for m in dead:
            g.members.pop(m, None)
            g.last_seen.pop(m, None)
            g.session_s.pop(m, None)
        if g.members:
            g.state = "Rebalancing"
            g.pending = {}
            g.round_deadline = time.monotonic() + self._rebalance_timeout_s
        else:
            g.state = "Empty"
        self._cond.notify_all()

    def _h_join_group(self, r: kw.Reader, ver: int) -> bytes:
        group = r.string()
        session_ms = r.i32()
        if ver >= 1:
            r.i32()  # rebalance timeout
        member_id = r.string() or ""
        r.string()  # protocol type
        protocols = r.array(lambda rr: (rr.string(), rr.bytes_()))
        metadata = protocols[0][1] if protocols else b""

        def _resp() -> kw.Writer:
            w = kw.Writer()
            if ver >= 2:
                w.i32(0)  # throttle_time_ms
            return w

        with self._cond:
            g = self._groups.setdefault(group, _Group())
            self._evict_expired(g)
            if not member_id:
                g.member_seq += 1
                member_id = f"member-{g.member_seq}"
            g.session_s[member_id] = max(0.1, session_ms / 1000.0)
            g.last_seen[member_id] = time.monotonic()
            if g.state != "Rebalancing":
                g.state = "Rebalancing"
                g.pending = {}
                g.round_deadline = (time.monotonic()
                                    + self._rebalance_timeout_s)
            g.pending[member_id] = metadata
            my_round = g.round_deadline
            self._cond.notify_all()
            # the round completes when every previously-known member has
            # re-joined, or the deadline drops stragglers
            while (g.state == "Rebalancing" and g.round_deadline == my_round
                   and not set(g.members) <= set(g.pending)
                   and time.monotonic() < my_round
                   and not self._stop.is_set()):
                self._cond.wait(timeout=0.05)
            if g.state == "Rebalancing" and g.round_deadline == my_round:
                # this thread completes the round
                g.members = dict(g.pending)
                g.generation += 1
                g.leader = sorted(g.members)[0]
                g.state = "Stable"
                g.assignments = {}
                g.assign_generation = -1
                self._cond.notify_all()
            if member_id not in g.members:
                # joined after the round closed: be told to retry
                return (_resp().i16(kw.REBALANCE_IN_PROGRESS).i32(-1)
                        .string("").string("").string(member_id)
                        .array([], lambda *a: None)).done()
            w = (_resp().i16(kw.NONE).i32(g.generation)
                 .string("range").string(g.leader).string(member_id))
            members = (sorted(g.members.items())
                       if member_id == g.leader else [])
            w.array(members,
                    lambda ww, m: ww.string(m[0]).bytes_(m[1]))
            return w.done()

    def _h_sync_group(self, r: kw.Reader, ver: int) -> bytes:
        group = r.string()
        generation = r.i32()
        member_id = r.string()
        assignments = r.array(lambda rr: (rr.string(), rr.bytes_()))

        def _resp() -> kw.Writer:
            w = kw.Writer()
            if ver >= 1:
                w.i32(0)  # throttle_time_ms
            return w

        with self._cond:
            g = self._groups.setdefault(group, _Group())
            if generation != g.generation or member_id not in g.members:
                return _resp().i16(kw.ILLEGAL_GENERATION).bytes_(b"").done()
            g.last_seen[member_id] = time.monotonic()
            if assignments:  # leader
                g.assignments = dict(assignments)
                g.assign_generation = generation
                self._cond.notify_all()
            deadline = time.monotonic() + 5.0
            while (g.assign_generation != generation
                   and g.generation == generation
                   and time.monotonic() < deadline
                   and not self._stop.is_set()):
                self._cond.wait(timeout=0.05)
            if g.generation != generation:
                return (_resp().i16(kw.REBALANCE_IN_PROGRESS)
                        .bytes_(b"").done())
            if g.assign_generation != generation:
                return (_resp().i16(kw.REBALANCE_IN_PROGRESS)
                        .bytes_(b"").done())
            blob = g.assignments.get(member_id, b"")
            return _resp().i16(kw.NONE).bytes_(blob).done()

    def _h_heartbeat(self, r: kw.Reader, ver: int) -> bytes:
        group = r.string()
        generation = r.i32()
        member_id = r.string()
        with self._lock:
            g = self._groups.setdefault(group, _Group())
            self._evict_expired(g)
            if member_id in g.members:
                g.last_seen[member_id] = time.monotonic()
            if g.state == "Rebalancing":
                err = kw.REBALANCE_IN_PROGRESS
            elif member_id not in g.members:
                err = kw.UNKNOWN_MEMBER_ID
            elif generation != g.generation:
                err = kw.ILLEGAL_GENERATION
            else:
                err = kw.NONE
            w = kw.Writer()
            if ver >= 1:
                w.i32(0)  # throttle_time_ms
            return w.i16(err).done()

    def _h_leave_group(self, r: kw.Reader, ver: int) -> bytes:
        group = r.string()
        member_id = r.string()
        with self._cond:
            g = self._groups.setdefault(group, _Group())
            g.members.pop(member_id, None)
            g.pending.pop(member_id, None)
            g.last_seen.pop(member_id, None)
            g.session_s.pop(member_id, None)
            if g.members:
                g.state = "Rebalancing"
                g.pending = {}
                g.round_deadline = (time.monotonic()
                                    + self._rebalance_timeout_s)
            else:
                g.state = "Empty"
            self._cond.notify_all()
            w = kw.Writer()
            if ver >= 1:
                w.i32(0)  # throttle_time_ms
            return w.i16(kw.NONE).done()

    def _h_create_topics(self, r: kw.Reader, ver: int) -> bytes:
        reqs = []
        n = r.i32()
        for _ in range(n):
            name = r.string()
            partitions = r.i32()
            r.i16()  # replication factor
            r.array(lambda rr: (rr.i32(),
                                rr.array(lambda r3: r3.i32())))
            r.array(lambda rr: (rr.string(), rr.string()))
            reqs.append((name, partitions))
        r.i32()  # timeout
        if ver >= 1:
            r.i8()  # validate_only
        w = kw.Writer()
        if ver >= 2:
            w.i32(0)  # throttle_time_ms
        with self._lock:
            w.i32(len(reqs))
            for name, partitions in reqs:
                if name in self._topics:
                    w.string(name).i16(kw.TOPIC_ALREADY_EXISTS)
                else:
                    self._ensure_topic(
                        name, partitions if partitions > 0 else None)
                    w.string(name).i16(kw.NONE)
                if ver >= 1:
                    w.string(None)  # error_message
        return w.done()
