"""Kafka wire goldens + malformed-frame fuzz (VERDICT r3 item 4).

The contract suites (test_kafka.py) validate SEMANTICS against the
bundled kafkaserver, but both sides decode with the same kafkawire
module — a symmetric encode/decode bug would pass every one of them.
This suite breaks that circularity:

* Golden frames are HAND-ASSEMBLED here from the public Kafka protocol
  spec (struct.pack literals, an independent bit-by-bit CRC32C/CRC32,
  manual zigzag varints — no kafkawire call touches an expected value).
  The encoder must produce the golden bytes exactly; the decoder must
  parse them back.
* A seeded fuzzer mutates/truncates valid frames through every
  kafkawire parse path; anything other than a clean result or WireError
  (hang, IndexError, struct.error, infinite loop) fails.

Reference scope: interop target is the reference's Kafka usage —
consumer group + keyed produce (reference: internal/broker/kafka/
consumer.go:21-56, producer.go:19-33 over segmentio/kafka-go).
"""

import random
import struct

import pytest

from imageprocessor_tpu.broker import kafka as kf
from imageprocessor_tpu.broker import kafkawire as kw

# --------------------------------------------------------------------
# Independent reference implementations (bit-by-bit; deliberately slow
# and deliberately NOT shared with kafkawire).


def _crc32c_bitwise(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def _crc32_bitwise(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0xEDB88320 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def _zz_varint(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63)  # zigzag64
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_independent_crc_known_answers():
    # RFC 3720 B.4 / IEEE 802.3 check values — pins the REFERENCE
    # implementations themselves before anything is compared to them.
    assert _crc32c_bitwise(b"123456789") == 0xE3069283
    assert _crc32_bitwise(b"123456789") == 0xCBF43926
    assert kw.crc32c(b"123456789") == 0xE3069283


# --------------------------------------------------------------------
# RecordBatch v2 (KIP-98) golden


_TS0 = 1700000000123


def _golden_batch_v2() -> bytes:
    """baseOffset 5; records (k1, v-one, ts0) and (None, v-two, ts0+2),
    assembled field-by-field per the spec."""
    recs = b""
    for off_delta, ts_delta, key, val in ((0, 0, b"k1", b"v-one"),
                                          (1, 2, None, b"v-two")):
        body = b"\x00"  # record attributes
        body += _zz_varint(ts_delta) + _zz_varint(off_delta)
        body += (_zz_varint(-1) if key is None
                 else _zz_varint(len(key)) + key)
        body += _zz_varint(len(val)) + val
        body += _zz_varint(0)  # headers
        recs += _zz_varint(len(body)) + body
    tail = struct.pack(
        ">hiqqqhii",
        0,              # attributes (no compression)
        1,              # lastOffsetDelta
        _TS0,           # baseTimestamp
        _TS0 + 2,       # maxTimestamp
        -1, -1, -1,     # producerId, producerEpoch, baseSequence
        2) + recs       # recordCount + records
    return (struct.pack(">qiib", 5, len(tail) + 9, -1, 2)
            + struct.pack(">I", _crc32c_bitwise(tail)) + tail)


def test_record_batch_v2_encoder_matches_spec_golden():
    golden = _golden_batch_v2()
    # The precomputed CRC32C of this batch's tail (from the bit-by-bit
    # reference): a table bug in kw.crc32c cannot cancel against itself.
    assert golden[17:21] == struct.pack(">I", 0x77064077)
    enc = kw.encode_record_batch(
        [(5, b"k1", b"v-one", _TS0), (6, None, b"v-two", _TS0 + 2)],
        base_offset=5)
    assert enc == golden


def test_record_batch_v2_decoder_parses_spec_golden():
    msgs = kw.decode_records(_golden_batch_v2())
    assert [(m.offset, m.key, m.value, m.timestamp_ms) for m in msgs] \
        == [(5, b"k1", b"v-one", _TS0), (6, None, b"v-two", _TS0 + 2)]
    assert kw.records_next_offset(_golden_batch_v2()) == 7


def test_record_batch_v2_crc_tamper_detected():
    bad = bytearray(_golden_batch_v2())
    bad[-1] ^= 0x01  # flip a record byte; header CRC must catch it
    with pytest.raises(kw.WireError, match="CRC"):
        kw.decode_records(bytes(bad))


# --------------------------------------------------------------------
# Legacy magic-0 message set golden


def _golden_message_set_m0() -> bytes:
    body = (b"\x00"                      # magic 0
            b"\x00"                      # attributes
            + struct.pack(">i", 1) + b"k"
            + struct.pack(">i", 5) + b"hello")
    msg = struct.pack(">I", _crc32_bitwise(body)) + body
    return struct.pack(">qi", 3, len(msg)) + msg


def test_message_set_m0_encoder_matches_spec_golden():
    assert kw.encode_message_set([(3, b"k", b"hello")]) \
        == _golden_message_set_m0()


def test_message_set_m0_decoder_parses_spec_golden():
    msgs = kw.decode_message_set(_golden_message_set_m0())
    assert [(m.offset, m.key, m.value, m.timestamp_ms) for m in msgs] \
        == [(3, b"k", b"hello", -1)]
    # the unified decoder must route magic-0 entries too
    assert [(m.offset, m.value)
            for m in kw.decode_records(_golden_message_set_m0())] \
        == [(3, b"hello")]


def test_message_set_m0_crc_tamper_detected():
    bad = bytearray(_golden_message_set_m0())
    bad[-1] ^= 0x01
    with pytest.raises(kw.WireError, match="CRC"):
        kw.decode_message_set(bytes(bad))


# --------------------------------------------------------------------
# Produce v3 request frame golden (header + body, hand-assembled)


def _spec_string(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    return struct.pack(">h", len(s)) + s.encode()


def test_produce_v3_frame_matches_spec_golden():
    rset = _golden_batch_v2()
    golden_body = (
        _spec_string(None)            # transactional_id (v3+)
        + struct.pack(">hi", -1, 10000)   # acks, timeout
        + struct.pack(">i", 1)            # one topic
        + _spec_string("image-processing")
        + struct.pack(">i", 1)            # one partition entry
        + struct.pack(">ii", 2, len(rset)) + rset)
    assert kf.produce_body("image-processing", 2, rset, ver=3) \
        == golden_body
    golden_frame = (
        struct.pack(">hhi", 0, 3, 77)      # api PRODUCE, v3, corr 77
        + _spec_string("ip-client")
        + golden_body)
    assert kw.encode_request(0, 3, 77, "ip-client", golden_body) \
        == struct.pack(">i", len(golden_frame)) + golden_frame


# --------------------------------------------------------------------
# JoinGroup / SyncGroup exchange goldens


def test_join_group_v2_body_matches_spec_golden():
    sub = kw.encode_subscription(["image-processing"])
    golden_sub = (struct.pack(">h", 0)         # subscription version
                  + struct.pack(">i", 1)
                  + _spec_string("image-processing")
                  + struct.pack(">i", 0))      # empty user_data
    assert sub == golden_sub
    golden = (_spec_string("image-processor-group")
              + struct.pack(">i", 30000)       # session_timeout
              + struct.pack(">i", 30000)       # rebalance_timeout (v1+)
              + _spec_string("")               # member_id (first join)
              + _spec_string("consumer")       # protocol_type
              + struct.pack(">i", 1)           # one protocol
              + _spec_string("range")
              + struct.pack(">i", len(sub)) + sub)
    assert kf.join_group_body("image-processor-group", "", 30000, sub,
                              jver=2) == golden


def test_join_group_response_golden_parses():
    """Hand-assembled JoinGroup v2 RESPONSE: the member metadata inside
    must round-trip through decode_subscription."""
    meta = (struct.pack(">h", 0) + struct.pack(">i", 1)
            + _spec_string("image-processing") + struct.pack(">i", 0))
    resp = (struct.pack(">i", 0)        # throttle_time_ms
            + struct.pack(">h", 0)      # error
            + struct.pack(">i", 3)      # generation
            + _spec_string("range")
            + _spec_string("m-1")       # leader
            + _spec_string("m-1")       # member_id
            + struct.pack(">i", 1)      # one member
            + _spec_string("m-1")
            + struct.pack(">i", len(meta)) + meta)
    r = kw.Reader(resp)
    assert r.i32() == 0
    assert r.i16() == 0
    assert r.i32() == 3
    assert r.string() == "range"
    assert r.string() == "m-1"
    assert r.string() == "m-1"
    members = r.array(lambda rr: (rr.string(), rr.bytes_()))
    assert members == [("m-1", meta)]
    assert kw.decode_subscription(members[0][1]) == ["image-processing"]


def test_sync_group_body_and_assignment_match_spec_golden():
    assignment = kw.encode_assignment({"image-processing": [0, 2]})
    golden_assign = (struct.pack(">h", 0)
                     + struct.pack(">i", 1)
                     + _spec_string("image-processing")
                     + struct.pack(">i", 2)
                     + struct.pack(">ii", 0, 2)
                     + struct.pack(">i", 0))   # empty user_data
    assert assignment == golden_assign
    golden = (_spec_string("image-processor-group")
              + struct.pack(">i", 3)           # generation
              + _spec_string("m-1")
              + struct.pack(">i", 1)           # one assignment
              + _spec_string("m-1")
              + struct.pack(">i", len(assignment)) + assignment)
    assert kf.sync_group_body("image-processor-group", 3, "m-1",
                              [("m-1", assignment)]) == golden
    # decoder side of the exchange
    assert kw.decode_assignment(golden_assign) \
        == {"image-processing": [0, 2]}


# --------------------------------------------------------------------
# Malformed-frame fuzz over every kafkawire parse path


def _parse_paths():
    return (
        ("decode_records", kw.decode_records),
        ("decode_message_set", kw.decode_message_set),
        ("records_next_offset", kw.records_next_offset),
        ("decode_subscription", kw.decode_subscription),
        ("decode_assignment", kw.decode_assignment),
    )


def _seed_corpus():
    return (
        _golden_batch_v2(),
        _golden_message_set_m0(),
        kw.encode_record_batch(
            [(0, b"", b"x" * 300, 1), (1, b"kk", b"", 2),
             (2, None, None, 3)]),
        kw.encode_subscription(["a", "b-topic"]),
        kw.encode_assignment({"a": [0], "b": [1, 2, 3]}),
        b"",
        b"\x00" * 40,
    )


def test_fuzz_truncation_all_parse_paths():
    rng = random.Random(1)
    for frame in _seed_corpus():
        for _ in range(60):
            n = rng.randrange(0, len(frame) + 1) if frame else 0
            chunk = frame[:n]
            for name, fn in _parse_paths():
                try:
                    fn(chunk)
                except kw.WireError:
                    pass  # the only legal failure mode
                except Exception as exc:  # noqa: BLE001
                    pytest.fail(f"{name} raised {type(exc).__name__} "
                                f"on truncation to {n}: {exc}")


def test_fuzz_mutation_all_parse_paths():
    rng = random.Random(2)
    for frame in _seed_corpus():
        if not frame:
            continue
        for _ in range(120):
            buf = bytearray(frame)
            for _ in range(rng.randrange(1, 4)):
                i = rng.randrange(len(buf))
                buf[i] = rng.randrange(256)
            blob = bytes(buf)
            for name, fn in _parse_paths():
                try:
                    fn(blob)
                except kw.WireError:
                    pass
                except Exception as exc:  # noqa: BLE001
                    pytest.fail(f"{name} raised {type(exc).__name__} "
                                f"on mutated frame: {exc}")


def test_fuzz_varint_paths():
    """Degenerate varints (unterminated, oversized, negative lengths)
    inside an otherwise-valid v2 batch header."""
    golden = _golden_batch_v2()
    rng = random.Random(3)
    body_start = 21 + 40  # crc'd tail fields end; records begin
    for _ in range(200):
        buf = bytearray(golden)
        i = rng.randrange(body_start, len(buf))
        buf[i] = rng.choice([0x80, 0xFF, 0x7F, 0x00])
        # keep header CRC valid so the parser reaches the varint paths
        tail = bytes(buf[21:])
        buf[17:21] = struct.pack(">I", _crc32c_bitwise(tail))
        try:
            kw.decode_records(bytes(buf))
        except kw.WireError:
            pass
