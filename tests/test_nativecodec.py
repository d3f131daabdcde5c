"""Native C++ codec shim tests (built on demand with g++ + libjpeg)."""

import io

import numpy as np
import pytest
from PIL import Image

from imageprocessor_tpu.runtime import nativecodec

pytestmark = pytest.mark.skipif(not nativecodec.available(),
                                reason="native codec not buildable here")

RNG = np.random.default_rng(13)


def jpeg_bytes(h=240, w=320):
    yy = np.linspace(0, 255, h)[:, None]
    xx = np.linspace(0, 255, w)[None, :]
    arr = np.stack([yy + 0 * xx, 0 * yy + xx, (yy + xx) / 2],
                   axis=-1).astype(np.uint8)
    bio = io.BytesIO()
    Image.fromarray(arr).save(bio, format="JPEG", quality=92)
    return bio.getvalue(), arr


def test_probe():
    data, _ = jpeg_bytes(240, 320)
    w, h, c = nativecodec.probe_jpeg(data)
    assert (w, h, c) == (320, 240, 3)


def test_full_decode_matches_pil():
    data, arr = jpeg_bytes()
    out = nativecodec.decode_jpeg(data, scale_num=8)
    assert out.shape == arr.shape
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(out.astype(int) - pil.astype(int)).mean() < 2.0


def test_scaled_decode():
    data, _ = jpeg_bytes(240, 320)
    half = nativecodec.decode_jpeg(data, scale_num=4)
    assert half.shape == (120, 160, 3)
    eighth = nativecodec.decode_jpeg(data, scale_num=1)
    assert eighth.shape == (30, 40, 3)


def test_encode_roundtrip():
    _, arr = jpeg_bytes()
    data = nativecodec.encode_jpeg(arr, quality=90)
    assert data[:3] == b"\xff\xd8\xff"
    back = nativecodec.decode_jpeg(data)
    assert np.abs(back.astype(int) - arr.astype(int)).mean() < 3.0


def test_garbage_raises():
    with pytest.raises(nativecodec.NativeCodecError):
        nativecodec.probe_jpeg(b"not a jpeg at all")
    with pytest.raises(nativecodec.NativeCodecError):
        nativecodec.decode_jpeg(b"\xff\xd8\xff truncated garbage")


def test_bad_scale_rejected():
    data, _ = jpeg_bytes()
    with pytest.raises(ValueError):
        nativecodec.decode_jpeg(data, scale_num=0)


def test_encode_rejects_narrow_arrays():
    """The native encoder reads 3 bytes/pixel unconditionally; narrower
    inputs must be rejected up front (not read out of bounds)."""
    import pytest

    from imageprocessor_tpu.runtime import nativecodec

    if not nativecodec.available():
        pytest.skip("native codec unavailable")
    with pytest.raises(nativecodec.NativeCodecError):
        nativecodec.encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(nativecodec.NativeCodecError):
        nativecodec.encode_jpeg(np.zeros((8, 8, 2), dtype=np.uint8))


def test_emit_rejects_16bit_quant_tables():
    """8-bit DQT segments can't represent values >255; silently clamping
    would make every decoder dequantize wrongly."""
    import pytest

    from imageprocessor_tpu.runtime import nativecodec

    if not nativecodec.available():
        pytest.skip("native codec unavailable")
    planes = [np.zeros((16, 16), dtype=np.int16)]
    bad = np.full((1, 64), 300, dtype=np.uint16)
    with pytest.raises(nativecodec.NativeCodecError, match="1..255"):
        nativecodec.emit_jpeg_from_coefficients(planes, bad, 16, 16,
                                                sampling=(1, 1))
