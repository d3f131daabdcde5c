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
API_VERSIONS = 18
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
UNSUPPORTED_VERSION = 35
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
        # n < 0 (a corrupt varint length) would silently slice backward;
        # pos < 0 (a corrupt record skip) would wrap to the buffer tail.
        if n < 0 or self.pos < 0 or self.pos + n > len(self.buf):
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


# ------------------------------------------------------------------ varints


def write_uvarint(w: Writer, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            w.raw(bytes([b | 0x80]))
        else:
            w.raw(bytes([b]))
            return


def write_varint(w: Writer, v: int) -> None:
    """Zigzag-encoded signed varint (Kafka record fields)."""
    write_uvarint(w, (v << 1) ^ (v >> 63) if v < 0 else v << 1)


def read_uvarint(r: Reader) -> int:
    shift = 0
    out = 0
    while True:
        b = r._take(1)[0]
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out
        shift += 7
        if shift > 63:
            raise WireError("varint overflow")


def read_varint(r: Reader) -> int:
    u = read_uvarint(r)
    return (u >> 1) ^ -(u & 1)


# ------------------------------------------------------------------- crc32c


def _crc32c_table() -> list[int]:
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC32C_TABLE = _crc32c_table()
_native_crc32c = None
_native_crc32c_checked = False


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C (Castagnoli), the checksum RecordBatch v2 mandates.

    Prefers the native implementation (native/ipcodec.cpp ip_crc32c:
    SSE4.2 hardware CRC when the build arch has it) — Fetch validates
    the checksum of every record batch, and real brokers return up to
    1 MiB per partition, which at pure-Python table speed (~5 MB/s)
    would burn the one-core host's poll loop. Falls back to the Python
    table when the library is unavailable."""
    global _native_crc32c, _native_crc32c_checked
    if not _native_crc32c_checked:
        _native_crc32c_checked = True
        try:
            from imageprocessor_tpu.runtime import nativecodec
            if nativecodec.crc32c(b"123456789") == 0xE3069283:
                _native_crc32c = nativecodec.crc32c
        except Exception:  # pragma: no cover — no native toolchain
            _native_crc32c = None
    if _native_crc32c is not None:
        return _native_crc32c(data, crc)
    crc ^= 0xFFFFFFFF
    tab = _CRC32C_TABLE
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


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


# ------------------------------------------------------- record batch (v2)


def encode_record_batch(entries: list[tuple], base_offset: int = 0) -> bytes:
    """RecordBatch magic 2 (KIP-98 format), no compression, no producer
    state. entries: (offset, key, value, ts_ms) with ABSOLUTE offsets
    (>= base_offset); ts_ms -1 entries stamp 0."""
    if not entries:
        return b""
    ts0 = min((e[3] for e in entries if len(e) > 3 and e[3] >= 0),
              default=0)
    max_ts = ts0
    recs = Writer()
    last_delta = 0
    for e in entries:
        offset, key, value = e[0], e[1], e[2]
        ts = e[3] if len(e) > 3 and e[3] >= 0 else ts0
        max_ts = max(max_ts, ts)
        delta = offset - base_offset
        last_delta = delta
        body = Writer()
        body.i8(0)  # record attributes
        write_varint(body, ts - ts0)
        write_varint(body, delta)
        if key is None:
            write_varint(body, -1)
        else:
            write_varint(body, len(key))
            body.raw(key)
        if value is None:
            write_varint(body, -1)
        else:
            write_varint(body, len(value))
            body.raw(value)
        write_varint(body, 0)  # headers
        b = body.done()
        write_varint(recs, len(b))
        recs.raw(b)
    tail = (Writer()
            .i16(0)                    # attributes: no compression
            .i32(last_delta)           # lastOffsetDelta
            .i64(ts0).i64(max_ts)      # base/max timestamp
            .i64(-1).i16(-1).i32(-1)   # producer id/epoch, base sequence
            .i32(len(entries))
            .raw(recs.done())).done()
    crc = crc32c(tail)
    batch = (Writer()
             .i64(base_offset)
             .i32(len(tail) + 4 + 4 + 1)  # partitionLeaderEpoch+magic+crc
             .i32(-1)                     # partitionLeaderEpoch
             .i8(2)                       # magic
             .raw(struct.pack(">I", crc))
             .raw(tail)).done()
    return batch


def _decode_one_batch_v2(buf: bytes, pos: int, end: int,
                         out: list[WireMessage]) -> None:
    r = Reader(buf, pos)
    base_offset = r.i64()
    r.i32()   # batchLength (end already computed by caller)
    r.i32()   # partitionLeaderEpoch
    magic = r.i8()
    if magic != 2:
        raise WireError(f"unexpected magic {magic} in record batch")
    crc = struct.unpack(">I", r._take(4))[0]
    body = buf[r.pos:end]
    if crc32c(body) != crc:
        raise WireError(f"record batch CRC mismatch at {base_offset}")
    attrs = r.i16()
    codec = attrs & 0x07
    is_control = bool(attrs & 0x20)
    r.i32()   # lastOffsetDelta
    ts0 = r.i64()
    r.i64()   # maxTimestamp
    r.i64()   # producerId
    r.i16()   # producerEpoch
    r.i32()   # baseSequence
    count = r.i32()
    payload = buf[r.pos:end]
    if codec == 1:
        import gzip
        payload = gzip.decompress(payload)
    elif codec != 0:
        raise WireError(
            f"unsupported record-batch compression codec {codec} "
            "(only none/gzip)")
    rr = Reader(payload)
    for _ in range(count):
        rec_len = read_varint(rr)
        if rec_len < 0 or rr.pos + rec_len > len(payload):
            raise WireError("record length out of range")
        rec_end = rr.pos + rec_len
        rr.i8()  # record attributes
        ts_delta = read_varint(rr)
        off_delta = read_varint(rr)
        klen = read_varint(rr)
        key = rr._take(klen) if klen >= 0 else None
        vlen = read_varint(rr)
        value = rr._take(vlen) if vlen >= 0 else None
        if rr.pos > rec_end:
            raise WireError("record fields overran record length")
        rr.pos = rec_end  # skip headers
        if not is_control:
            out.append(WireMessage(base_offset + off_delta, key, value,
                                   ts0 + ts_delta))


def records_next_offset(buf: bytes) -> int | None:
    """Offset just past the records spanned by `buf`'s batches (None if
    nothing parseable). For RecordBatch v2 this reads baseOffset +
    lastOffsetDelta from the batch header, which keeps counting offsets
    whose records were compacted away — the consumer position must
    advance past those or a fetch at a compacted position livelocks."""
    nxt: int | None = None
    pos = 0
    n = len(buf)
    while n - pos >= 17:
        size = struct.unpack(">i", buf[pos + 8:pos + 12])[0]
        magic = buf[pos + 16]
        if magic == 2:
            end = pos + 12 + size
            if size < 49 or end > n:
                break
            base = struct.unpack(">q", buf[pos:pos + 8])[0]
            last_delta = struct.unpack(">i", buf[pos + 23:pos + 27])[0]
            cand = base + last_delta + 1
            nxt = cand if nxt is None else max(nxt, cand)
            pos = end
        else:
            try:
                msgs = decode_message_set(buf[pos:])
            except WireError:
                break
            if msgs:
                cand = msgs[-1].offset + 1
                nxt = cand if nxt is None else max(nxt, cand)
            break
    return nxt


def decode_records(buf: bytes) -> list[WireMessage]:
    """Unified Fetch-records decoder: v2 record batches AND legacy magic
    0/1 message sets (both place the magic byte at offset 16 of each
    entry). Tolerates a partial trailing entry (Fetch may truncate);
    control batches are skipped."""
    out: list[WireMessage] = []
    pos = 0
    n = len(buf)
    while n - pos >= 17:
        size = struct.unpack(">i", buf[pos + 8:pos + 12])[0]
        magic = buf[pos + 16]
        if magic == 2:
            end = pos + 12 + size
            if size < 49 or end > n:
                break  # partial trailing batch
            _decode_one_batch_v2(buf, pos, end, out)
            pos = end
        else:
            # Legacy message set from this position to the end.
            out.extend(decode_message_set(buf[pos:]))
            return out
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
