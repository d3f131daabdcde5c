"""GIF quantization parity with Go's gif.Encode (native/gifquant.cpp).

The reference encodes GIF outputs via gif.Encode(w, img, nil)
(reference: internal/usecase/processor/operations/resize.go:98-119),
which quantizes non-paletted sources to the FIXED Plan9 palette with
Floyd-Steinberg dithering (Go image/gif/writer.go -> draw.FloydSteinberg
-> drawPaletted). Rounds 3-4 used PIL's ADAPTIVE palette instead
(disclosed divergence); round 5 closes the gap with a bit-exact
reimplementation, verified here against an INDEPENDENT pure-Python
oracle of the drawPaletted arithmetic (16-bit color, wrapping sqDiff,
truncating /16 error consumption, first-minimal-index tie-break).
IMAGEPROCESSOR_GIF_QUANTIZER=adaptive restores the old behavior.
"""

from __future__ import annotations

import io

import numpy as np
import pytest
from PIL import Image

from imageprocessor_tpu.runtime import nativecodec as nc
from imageprocessor_tpu.runtime.codecs import encode_image

pytestmark = pytest.mark.skipif(
    not nc.available() or not hasattr(nc._load(), "ip_gif_quantize_plan9"),
    reason="native gif quantizer unavailable")


def plan9_oracle_palette() -> np.ndarray:
    """Independent Plan9 generator (Go image/color/palette/gen.go)."""
    pal = np.zeros((256, 3), np.uint8)
    i = 0
    for r in range(4):
        for v in range(4):
            for g in range(4):
                for b in range(4):
                    den = max(r, g, b)
                    if den == 0:
                        pal[i] = (0x11 * v,) * 3
                    else:
                        num = 17 * (4 * den + v)
                        pal[i] = (r * num // den, g * num // den,
                                  b * num // den)
                    i += 1
    return pal


def draw_paletted_oracle(rgb: np.ndarray, pal: np.ndarray,
                         dither: bool = True) -> np.ndarray:
    """Pure-Python Go drawPaletted (image/draw/draw.go): 16-bit color,
    wrapping uint32 sqDiff, raw 7/3/5/1 error accumulation with
    truncating /16 at consumption, clamp to [0, 0xffff]."""
    h, w = rgb.shape[:2]
    p16 = pal.astype(np.int64) * 0x101
    out = np.zeros((h, w), np.uint8)
    curr = np.zeros((w + 2, 3), np.int64)
    nxt = np.zeros((w + 2, 3), np.int64)

    def sqd(x, y):
        d = int(x) - int(y)
        return ((d * d) & 0xFFFFFFFF) >> 2

    def trunc16(v):  # Go int32 division truncates toward zero
        return -((-v) // 16) if v < 0 else v // 16

    for y in range(h):
        for x in range(w):
            e = [int(rgb[y, x, c]) * 0x101 for c in range(3)]
            if dither:
                e = [min(0xFFFF, max(0, e[c] + trunc16(int(curr[x + 1][c]))))
                     for c in range(3)]
            best, best_sum = 0, 1 << 40
            for i in range(256):
                s = (sqd(e[0], p16[i][0]) + sqd(e[1], p16[i][1])
                     + sqd(e[2], p16[i][2]))
                if s < best_sum:
                    best, best_sum = i, s
                    if s == 0:
                        break
            out[y, x] = best
            if not dither:
                continue
            er = [e[c] - int(p16[best][c]) for c in range(3)]
            for c in range(3):
                curr[x + 2][c] += er[c] * 7
                nxt[x][c] += er[c] * 3
                nxt[x + 1][c] += er[c] * 5
                nxt[x + 2][c] += er[c] * 1
        curr, nxt = nxt, curr
        nxt[:] = 0
    return out


def test_plan9_palette_matches_generator():
    _idx, pal = nc.gif_quantize_plan9(np.zeros((1, 1, 3), np.uint8))
    np.testing.assert_array_equal(pal, plan9_oracle_palette())
    # spot anchors from Go's palette.go literals
    assert (pal[0] == (0, 0, 0)).all()
    assert (pal[1] == (0x00, 0x00, 0x44)).all()
    assert (pal[255] == (0xFF, 0xFF, 0xFF)).all()


@pytest.mark.parametrize("dither", [True, False])
def test_quantize_matches_drawpaletted_oracle(dither):
    rng = np.random.default_rng(5)
    pal = plan9_oracle_palette()
    for img in (rng.integers(0, 256, (24, 31, 3), dtype=np.uint8),
                np.linspace(0, 255, 24 * 31 * 3)
                .reshape(24, 31, 3).astype(np.uint8)):
        got, _ = nc.gif_quantize_plan9(img, dither=dither)
        want = draw_paletted_oracle(img, pal, dither=dither)
        np.testing.assert_array_equal(got, want)


def test_encode_image_gif_roundtrip_is_plan9():
    """encode_image('gif') default: decoded pixels == palette[indices]
    (the PIL GIF writer is a lossless LZW layer on top)."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    data = encode_image(img, "gif")
    idx, pal = nc.gif_quantize_plan9(img)
    want = pal[idx]
    got = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_adaptive_knob_restores_old_behavior(monkeypatch):
    monkeypatch.setenv("IMAGEPROCESSOR_GIF_QUANTIZER", "adaptive")
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encode_image(img, "gif")
    assert data[:6] in (b"GIF87a", b"GIF89a")
    # adaptive (median cut over the image) differs from the fixed
    # Plan9 result on random content
    idx, pal = nc.gif_quantize_plan9(img)
    got = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert not np.array_equal(got, pal[idx])
