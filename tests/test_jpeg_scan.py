"""Streaming JPEG entropy decoder (native/jpeg_scan.cpp) validation.

Bit-exactness is checked against libjpeg's own coefficient output
(jpeg_read_coefficients via nativecodec.read_jpeg_coefficients) across
sizes, qualities, subsampling modes, grayscale, and restart intervals.
Progressive streams must fail cleanly so callers fall back to libjpeg.
"""

import io

import numpy as np
import pytest
from PIL import Image as PILImage

from imageprocessor_tpu.runtime import nativecodec as nc

pytestmark = pytest.mark.skipif(
    nc._load() is None or not hasattr(nc._load(), "ip_jpeg_scan_dims"),
    reason="native codec library unavailable")

RNG = np.random.default_rng(77)


def make_jpeg(h, w, quality=85, subsampling=2, mode="RGB", progressive=False):
    if mode == "L":
        arr = RNG.integers(0, 256, size=(h, w), dtype=np.uint8)
    else:
        yy = np.linspace(0, 180, h)[:, None, None]
        xx = np.linspace(0, 60, w)[None, :, None]
        arr = np.clip(yy + xx + RNG.integers(0, 40, (h, w, 3)), 0,
                      255).astype(np.uint8)
    bio = io.BytesIO()
    PILImage.fromarray(arr, mode=mode).save(
        bio, format="JPEG", quality=quality, subsampling=subsampling,
        progressive=progressive)
    return bio.getvalue()


def assert_scan_matches_libjpeg(jpeg):
    ref_planes, ref_qt, ref_dims, ref_samp = nc.read_jpeg_coefficients(jpeg)
    planes, qt, dims, samp = nc.scan_jpeg_coefficients(jpeg)
    assert dims == ref_dims
    if len(planes) > 1:
        assert samp == ref_samp
    else:
        # Single-component scans are non-interleaved: sampling factors in
        # the SOF are ignored and the plane is laid out 1x1 (libjpeg
        # reports the raw SOF factors, e.g. PIL writes 2x2 for grayscale).
        assert samp == [(1, 1)]
    assert len(planes) == len(ref_planes)
    np.testing.assert_array_equal(qt, ref_qt)
    for c, (got, want) in enumerate(zip(planes, ref_planes)):
        # Scanner planes are MCU-aligned (>= libjpeg's block grid); the
        # shared region must be bit-exact.
        assert got.shape[0] >= want.shape[0]
        assert got.shape[1] >= want.shape[1]
        np.testing.assert_array_equal(
            got[:want.shape[0], :want.shape[1]], want,
            err_msg=f"component {c} coefficients diverged")


@pytest.mark.parametrize("subsampling", [0, 1, 2],
                         ids=["444", "422", "420"])
def test_subsampling_modes_bit_exact(subsampling):
    assert_scan_matches_libjpeg(make_jpeg(121, 165, subsampling=subsampling))


@pytest.mark.parametrize("quality", [75, 88, 95])
def test_qualities_bit_exact(quality):
    assert_scan_matches_libjpeg(make_jpeg(200, 200, quality=quality))


@pytest.mark.parametrize("hw", [(8, 8), (7, 5), (64, 48), (17, 333),
                                (257, 16), (480, 640)])
def test_sizes_and_odd_dims_bit_exact(hw):
    assert_scan_matches_libjpeg(make_jpeg(*hw))


def test_grayscale_bit_exact():
    assert_scan_matches_libjpeg(make_jpeg(90, 130, mode="L"))


def test_restart_intervals_bit_exact():
    cv2 = pytest.importorskip("cv2")
    arr = RNG.integers(0, 256, size=(130, 170, 3), dtype=np.uint8)
    for interval in (1, 3, 7):
        ok, buf = cv2.imencode(".jpg", arr[:, :, ::-1],
                               [cv2.IMWRITE_JPEG_QUALITY, 85,
                                cv2.IMWRITE_JPEG_RST_INTERVAL, interval])
        assert ok
        jpeg = buf.tobytes()
        assert b"\xff\xdd" in jpeg  # DRI present
        assert_scan_matches_libjpeg(jpeg)


@pytest.mark.parametrize("subsampling", [0, 1, 2],
                         ids=["444", "422", "420"])
def test_progressive_bit_exact(subsampling):
    """Progressive scan scripts (DC first/refine, AC first/refine with
    EOB runs) decode bit-exactly vs libjpeg's buffered coefficients."""
    assert_scan_matches_libjpeg(
        make_jpeg(121, 165, subsampling=subsampling, progressive=True))


@pytest.mark.parametrize("hw", [(8, 8), (7, 5), (100, 100), (17, 333),
                                (257, 16), (480, 640)])
def test_progressive_sizes_bit_exact(hw):
    assert_scan_matches_libjpeg(make_jpeg(*hw, progressive=True))


@pytest.mark.parametrize("quality", [60, 85, 95])
def test_progressive_qualities_bit_exact(quality):
    assert_scan_matches_libjpeg(
        make_jpeg(180, 220, quality=quality, progressive=True))


def test_progressive_grayscale_bit_exact():
    assert_scan_matches_libjpeg(make_jpeg(90, 130, mode="L",
                                          progressive=True))


def test_progressive_mt_entry_point_sequential_fallback():
    """The multithreaded entry point must route progressive files through
    the sequential multi-scan path (restart-segment parallelism assumes
    one scan) and still be bit-exact."""
    jpeg = make_jpeg(150, 200, progressive=True)
    ref_planes, _, _, _ = nc.read_jpeg_coefficients(jpeg)
    planes, _, _, _ = nc.scan_jpeg_coefficients(jpeg, threads=4)
    for got, want in zip(planes, ref_planes):
        np.testing.assert_array_equal(
            got[:want.shape[0], :want.shape[1]], want)


def test_arithmetic_and_lossless_rejected_cleanly():
    """Non-Huffman/non-DCT SOFs still reject so callers fall back."""
    jpeg = bytearray(make_jpeg(64, 64))
    i = jpeg.find(b"\xff\xc0")
    if i < 0:
        i = jpeg.find(b"\xff\xc2")
    assert i >= 0
    jpeg[i + 1] = 0xC9  # arithmetic sequential
    with pytest.raises(nc.NativeCodecError):
        nc.scan_jpeg_coefficients(bytes(jpeg))


def test_garbage_rejected_cleanly():
    with pytest.raises(nc.NativeCodecError):
        nc.scan_jpeg_coefficients(b"not a jpeg at all")


def test_plane_dims_are_mcu_aligned():
    # 121x165 @ 4:2:0 -> MCUs of 16x16: luma grid 176x128, chroma 88x64.
    planes, _, dims, samp = nc.scan_jpeg_coefficients(
        make_jpeg(121, 165, subsampling=2))
    assert dims == (165, 121)
    assert samp[0] == (2, 2)
    assert planes[0].shape == (128, 176)
    assert planes[1].shape == (64, 88)
    assert planes[2].shape == (64, 88)


def test_dc_prediction_across_wide_image():
    # A wide single-MCU-row image exercises long DC predictor chains.
    assert_scan_matches_libjpeg(make_jpeg(8, 2048, quality=92))


def test_fuzzed_streams_never_crash():
    """Seeded fuzz regression: corrupted/truncated/garbage streams must
    reject cleanly (NativeCodecError), never crash. The original scanner
    segfaulted on header segments with lying lengths near EOF (DQT/SOF/
    SOS over-reads) and unvalidated quant/Huffman table indices."""
    rng = np.random.default_rng(99)
    bases = [bytearray(make_jpeg(120, 150, quality=88)),
             # progressive base: fuzzes the multi-scan parse loops
             # (parse_next_scan / find_scan_end / refinement decoders)
             bytearray(make_jpeg(120, 150, quality=88, progressive=True))]
    survived = 0
    for trial in range(400):
        buf = bytearray(bases[trial % 2])
        kind = trial % 5
        if kind == 0:
            buf = buf[:rng.integers(2, len(buf))]
        elif kind == 1:
            buf[rng.integers(0, len(buf))] ^= int(rng.integers(1, 256))
        elif kind == 2:
            p = int(rng.integers(0, len(buf) - 16))
            buf[p:p + 16] = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        elif kind == 3:  # header-area corruption (markers/tables)
            p = int(rng.integers(2, min(500, len(buf) - 4)))
            buf[p:p + 4] = bytes(rng.integers(0, 256, 4, dtype=np.uint8))
        else:
            buf = bytearray(b"\xff\xd8") + bytearray(
                rng.integers(0, 256, int(rng.integers(4, 1500)),
                             dtype=np.uint8))
        try:
            nc.scan_jpeg_coefficients(bytes(buf),
                                      threads=(4 if trial % 3 == 0 else 0))
            survived += 1
        except (nc.NativeCodecError, MemoryError):
            pass
    # Most mutations decode or reject; the assertion is simply that we
    # reached this line on every one of them.
    assert survived >= 0


def _patch_dht_symbols(jpeg: bytes, table_class: int, value: int) -> bytes:
    """Overwrite every symbol of each DHT table of `table_class`
    (0=DC, 1=AC) with `value` — simulating a malicious Huffman table."""
    buf = bytearray(jpeg)
    i = 2
    patched = 0
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            break
        marker = buf[i + 1]
        seg_len = (buf[i + 2] << 8) | buf[i + 3]
        seg_start, seg_end = i + 4, i + 2 + seg_len
        if marker == 0xC4:  # DHT: may hold several tables
            q = seg_start
            while q + 17 <= seg_end:
                tc = buf[q] >> 4
                nsym = sum(buf[q + 1:q + 17])
                if tc == table_class:
                    for s in range(nsym):
                        buf[q + 17 + s] = value
                    patched += 1
                q += 17 + nsym
        if marker == 0xDA:
            break
        i = seg_end
    assert patched, "no DHT table of the requested class found"
    return bytes(buf)


@pytest.mark.parametrize("table_class,value", [(0, 0x0F), (0, 0x0C),
                                               (1, 0x0F), (1, 0x0B)])
def test_malicious_huffman_category_rejected(table_class, value):
    """Baseline bounds: DC magnitude category <= 11, AC <= 10 (T.81
    F.1.2). A hostile DHT encoding larger categories must be rejected
    cleanly (NativeCodecError), never shift by a negative count (UB)."""
    evil = _patch_dht_symbols(make_jpeg(64, 64), table_class, value)
    with pytest.raises(nc.NativeCodecError):
        nc.scan_jpeg_coefficients(evil)


def _patch_dht_bits(jpeg: bytes, bits_index: int, count: int) -> bytes:
    """Overwrite the first DHT table's code-count at `bits_index`
    (0-based, length = index+1 bits) with `count`, padding/truncating
    the symbol list to match so segment framing stays valid."""
    buf = bytearray(jpeg)
    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            break
        marker = buf[i + 1]
        seg_len = (buf[i + 2] << 8) | buf[i + 3]
        if marker == 0xC4:
            q = i + 4
            old_n = sum(buf[q + 1:q + 17])
            new_bits = bytearray(16)
            new_bits[bits_index] = count
            syms = bytes(range(min(count, 256)))[:count]
            table = bytes([buf[q]]) + bytes(new_bits) + syms
            # splice: replace this one table, drop any siblings
            new_seg = table
            buf[i + 2:i + 4] = ((len(new_seg) + 2) >> 8,
                                (len(new_seg) + 2) & 0xFF)
            buf[q:i + 2 + seg_len] = new_seg
            return bytes(buf)
        i = i + 2 + seg_len
    raise AssertionError("no DHT found")


def test_oversubscribed_huffman_lengths_rejected():
    """A DHT claiming more codes at a length than canonically fit
    (e.g. 255 one-bit codes) made HuffTable::build write ~64 KB past
    its 256-entry fast table — stack memory corruption from a crafted
    ~300-byte upload (ASAN-confirmed). Must reject with a clean error."""
    evil = _patch_dht_bits(make_jpeg(32, 32), 0, 255)   # 255 1-bit codes
    with pytest.raises(nc.NativeCodecError):
        nc.scan_jpeg_coefficients(evil)
    evil2 = _patch_dht_bits(make_jpeg(32, 32), 1, 200)  # 200 2-bit codes
    with pytest.raises(nc.NativeCodecError):
        nc.scan_jpeg_coefficients(evil2)


def test_header_claimed_dims_bomb_gated():
    """A tiny JPEG whose SOF claims enormous dims must not allocate
    header-sized coefficient planes (65500x65500 would be ~25 GB)."""
    jpeg = bytearray(make_jpeg(32, 32))
    i = 2
    while i + 4 <= len(jpeg):
        if jpeg[i] != 0xFF:
            break
        marker = jpeg[i + 1]
        seg_len = (jpeg[i + 2] << 8) | jpeg[i + 3]
        if marker in (0xC0, 0xC1, 0xC2):
            # SOF payload: precision(1) height(2) width(2)
            jpeg[i + 5:i + 7] = (65500).to_bytes(2, "big")
            jpeg[i + 7:i + 9] = (65500).to_bytes(2, "big")
            break
        i = i + 2 + seg_len
    with pytest.raises(nc.NativeCodecError, match="MP"):
        nc.scan_jpeg_coefficients(bytes(jpeg))
    with pytest.raises(nc.NativeCodecError, match="MP"):
        nc.read_jpeg_coefficients(bytes(jpeg))


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2 allows 0xFF fill bytes before any marker; some
    encoders emit them. The fast scanner must skip them in the header
    section (it already did mid-scan) instead of failing the stream to
    the slow path."""
    jpeg = make_jpeg(48, 56)
    # insert two fill bytes before the first marker after SOI
    padded = jpeg[:2] + b"\xff\xff" + jpeg[2:]
    assert_scan_matches_libjpeg(padded)


def test_ilp_lane_decode_matches_sequential():
    """Round-5 probe entry (ip_jpeg_scan_coefs_ilp): interleaved-lane
    decode of restart segments on one core must be bit-exact vs the
    sequential scan (the probe is throughput-negative on the dev host —
    PERF.md — but kept reproducible for wider cores to re-A/B)."""
    import ctypes

    lib = nc._load()
    if lib is None or not hasattr(lib, "ip_jpeg_scan_coefs_ilp"):
        pytest.skip("ilp probe entry unavailable")
    blob = make_jpeg(360, 520, quality=88)
    planes, qt, (w, h), samp = nc.scan_jpeg_coefficients(blob)
    rst = nc.emit_jpeg_from_coefficients(planes, qt, w, h, samp[0],
                                         restart_interval=3)
    want, *_ = nc.scan_jpeg_coefficients(rst)
    ncomp = ctypes.c_int()
    iw = ctypes.c_int()
    ih = ctypes.c_int()
    cbw = (ctypes.c_int * 4)()
    cbh = (ctypes.c_int * 4)()
    hs = (ctypes.c_int * 4)()
    vs = (ctypes.c_int * 4)()
    assert lib.ip_jpeg_scan_dims(rst, len(rst), ctypes.byref(ncomp),
                                 ctypes.byref(iw), ctypes.byref(ih),
                                 cbw, cbh, hs, vs) == 0
    for lanes in (2, 3):
        ps = [np.zeros((cbh[c] * 8, cbw[c] * 8), np.int16)
              for c in range(ncomp.value)]
        rc = lib.ip_jpeg_scan_coefs_ilp(
            rst, len(rst), lanes,
            ps[0].ctypes.data_as(ctypes.c_void_p),
            ps[1].ctypes.data_as(ctypes.c_void_p),
            ps[2].ctypes.data_as(ctypes.c_void_p))
        assert rc == 0
        for a, b in zip(ps, want):
            np.testing.assert_array_equal(a, b)
