"""Kafka wire-protocol codec: primitives, message sets, request framing.

Speaks the classic (pre-KIP-482) binary protocol with the legacy message
format (magic 0), the simplest fully-interoperable subset: Metadata v0,
Produce v0, Fetch v0, ListOffsets v0, FindCoordinator v0, OffsetCommit v0,
OffsetFetch v0, JoinGroup v0, SyncGroup v0, Heartbeat v0, LeaveGroup v0,
CreateTopics v0. Every broker since 0.10 still answers these versions, so
the client (broker/kafka.py) can join the reference deployment's consumer
group unchanged (reference: internal/broker/kafka/consumer.go:21-56 — the
wb-go/wbf client sits on segmentio/kafka-go, which negotiates down to
these same APIs).

Built from the protocol specification, the same way storage/s3.py
implements SigV4 from the AWS spec — no client library required.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

# API keys
PRODUCE = 0
FETCH = 1
LIST_OFFSETS = 2
METADATA = 3
OFFSET_COMMIT = 8
OFFSET_FETCH = 9
FIND_COORDINATOR = 10
JOIN_GROUP = 11
HEARTBEAT = 12
LEAVE_GROUP = 13
SYNC_GROUP = 14
CREATE_TOPICS = 19

# Error codes (subset)
NONE = 0
OFFSET_OUT_OF_RANGE = 1
UNKNOWN_TOPIC_OR_PARTITION = 3
LEADER_NOT_AVAILABLE = 5
NOT_LEADER_FOR_PARTITION = 6
NOT_COORDINATOR = 16
ILLEGAL_GENERATION = 22
UNKNOWN_MEMBER_ID = 25
REBALANCE_IN_PROGRESS = 27
TOPIC_ALREADY_EXISTS = 36


class WireError(RuntimeError):
    pass


class Writer:
    __slots__ = ("_parts",)

    def __init__(self):
        self._parts: list[bytes] = []

    def raw(self, b: bytes) -> "Writer":
        self._parts.append(b)
        return self

    def i8(self, v: int) -> "Writer":
        return self.raw(struct.pack(">b", v))

    def i16(self, v: int) -> "Writer":
        return self.raw(struct.pack(">h", v))

    def i32(self, v: int) -> "Writer":
        return self.raw(struct.pack(">i", v))

    def i64(self, v: int) -> "Writer":
        return self.raw(struct.pack(">q", v))

    def string(self, s: str | None) -> "Writer":
        if s is None:
            return self.i16(-1)
        b = s.encode("utf-8")
        return self.i16(len(b)).raw(b)

    def bytes_(self, b: bytes | None) -> "Writer":
        if b is None:
            return self.i32(-1)
        return self.i32(len(b)).raw(b)

    def array(self, items, encode) -> "Writer":
        self.i32(len(items))
        for it in items:
            encode(self, it)
        return self

    def done(self) -> bytes:
        return b"".join(self._parts)


class Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise WireError("short read")
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def i8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        if n < 0:
            return None
        try:
            return self._take(n).decode("utf-8")
        except UnicodeDecodeError as exc:
            # malformed frame: surface the same error class as every
            # other framing problem so callers' WireError handling holds
            raise WireError(f"invalid utf-8 in string: {exc}") from exc

    def bytes_(self) -> bytes | None:
        n = self.i32()
        if n < 0:
            return None
        return self._take(n)

    def array(self, decode) -> list:
        n = self.i32()
        if n < 0:
            return []
        return [decode(self) for _ in range(n)]


# ---------------------------------------------------------------- message set


@dataclass
class WireMessage:
    offset: int
    key: bytes | None
    value: bytes | None
    # CreateTime in epoch ms (magic >= 1); -1 = absent (magic 0).
    timestamp_ms: int = -1


def encode_message(key: bytes | None, value: bytes | None,
                   timestamp_ms: int = -1) -> bytes:
    """One legacy message, no compression; CRC32 over magic..value per
    the spec. timestamp_ms >= 0 selects magic 1 with a CreateTime stamp
    (attribute bits 0 => CreateTime); -1 keeps the magic-0 layout."""
    w = Writer()
    if timestamp_ms >= 0:
        w.i8(1).i8(0).i64(timestamp_ms)
    else:
        w.i8(0).i8(0)
    body = w.bytes_(key).bytes_(value).done()
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return struct.pack(">I", crc) + body


def encode_message_set(entries: list[tuple],
                       timestamp_ms: int = -1) -> bytes:
    """entries: (offset, key, value) or (offset, key, value, ts_ms);
    a per-entry ts_ms overrides the set-wide `timestamp_ms` default."""
    w = Writer()
    for e in entries:
        offset, key, value = e[0], e[1], e[2]
        ts = e[3] if len(e) > 3 else timestamp_ms
        msg = encode_message(key, value, ts)
        w.i64(offset).i32(len(msg)).raw(msg)
    return w.done()


def decode_message_set(buf: bytes) -> list[WireMessage]:
    """Tolerates a trailing partial message (Fetch may truncate)."""
    out: list[WireMessage] = []
    r = Reader(buf)
    while len(buf) - r.pos >= 12:
        offset = r.i64()
        size = r.i32()
        if size < 14 or r.pos + size > len(buf):
            break  # partial trailing message
        end = r.pos + size
        crc = struct.unpack(">I", buf[r.pos:r.pos + 4])[0]
        body = buf[r.pos + 4:end]
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise WireError(f"message CRC mismatch at offset {offset}")
        br = Reader(body)
        magic = br.i8()
        attrs = br.i8()
        ts_ms = br.i64() if magic == 1 else -1
        if attrs & 0x07:
            raise WireError("compressed message sets not supported")
        key = br.bytes_()
        value = br.bytes_()
        out.append(WireMessage(offset, key, value, ts_ms))
        r.pos = end
    return out


# ------------------------------------------------------------------- framing


def encode_request(api_key: int, api_version: int, correlation_id: int,
                   client_id: str, body: bytes) -> bytes:
    hdr = (Writer().i16(api_key).i16(api_version).i32(correlation_id)
           .string(client_id)).done()
    payload = hdr + body
    return struct.pack(">i", len(payload)) + payload


def read_frame(sock) -> bytes:
    """Read one length-prefixed frame from a socket."""
    hdr = _read_exact(sock, 4)
    (n,) = struct.unpack(">i", hdr)
    if n < 0 or n > (1 << 30):
        raise WireError(f"bad frame length {n}")
    return _read_exact(sock, n)


def _read_exact(sock, n: int) -> bytes:
    parts = []
    got = 0
    while got < n:
        chunk = sock.recv(n - got)
        if not chunk:
            raise WireError("connection closed")
        parts.append(chunk)
        got += len(chunk)
    return b"".join(parts)


# ----------------------------------------------- consumer-protocol payloads
# (the opaque bytes inside JoinGroup/SyncGroup, "consumer" protocol type)


def encode_subscription(topics: list[str]) -> bytes:
    return (Writer().i16(0)
            .array(topics, lambda w, t: w.string(t))
            .bytes_(b"")).done()


def decode_subscription(buf: bytes) -> list[str]:
    r = Reader(buf)
    r.i16()  # version
    return r.array(lambda rr: rr.string())


def encode_assignment(parts_by_topic: dict[str, list[int]]) -> bytes:
    w = Writer().i16(0)
    w.array(sorted(parts_by_topic.items()),
            lambda ww, kv: (ww.string(kv[0]),
                            ww.array(kv[1], lambda w3, p: w3.i32(p))))
    return w.bytes_(b"").done()


def decode_assignment(buf: bytes) -> dict[str, list[int]]:
    r = Reader(buf)
    r.i16()  # version
    out: dict[str, list[int]] = {}
    for _ in range(r.i32()):
        topic = r.string()
        out[topic] = r.array(lambda rr: rr.i32())
    return out
