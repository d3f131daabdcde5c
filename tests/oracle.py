"""Independent NumPy float64 oracle implementing the Go reference semantics.

Written from the reference's *behavior spec* (SURVEY.md §2; xdraw.BiLinear
half-pixel mapping, 16-bit premultiplied quantization, min-ratio aspect
rule, center square crop), not from its code — used as the golden baseline
the JAX ops must match within PSNR > 45 dB (BASELINE.md north star).
"""

from __future__ import annotations

import numpy as np


def bilinear_resize_f64(img_u8: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Go xdraw.BiLinear: src=(d+0.5)*S/D-0.5 clamped, 2-tap lerp, float64."""
    src_h, src_w, c = img_u8.shape
    x = img_u8.astype(np.float64)

    dst = np.arange(out_h, dtype=np.float64)
    src = np.clip((dst + 0.5) * (src_h / out_h) - 0.5, 0.0, src_h - 1.0)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, src_h - 1)
    f = (src - i0)[:, None, None]
    x = x[i0] * (1 - f) + x[i1] * f

    dst = np.arange(out_w, dtype=np.float64)
    src = np.clip((dst + 0.5) * (src_w / out_w) - 0.5, 0.0, src_w - 1.0)
    j0 = np.floor(src).astype(np.int64)
    j1 = np.minimum(j0 + 1, src_w - 1)
    f = (src - j0)[None, :, None]
    x = x[:, j0] * (1 - f) + x[:, j1] * f
    return x


def quantize_go(x_f64: np.ndarray) -> np.ndarray:
    """Go 16-bit path: floor(g*257) >> 8 for g in [0,255] float."""
    g16 = np.floor(np.clip(x_f64, 0.0, 255.0) * 257.0).astype(np.int64)
    return (g16 >> 8).astype(np.uint8)


def resize_go(img_u8, width, height, keep_aspect=False):
    h, w = img_u8.shape[:2]
    if keep_aspect:
        ratio = min(width / w, height / h)
        width, height = int(w * ratio), int(h * ratio)
        width, height = max(width, 1), max(height, 1)
    return quantize_go(bilinear_resize_f64(img_u8, height, width))


def thumbnail_go(img_u8, size, crop_to_fit=False):
    h, w = img_u8.shape[:2]
    if crop_to_fit:
        if w > h:
            cx, cy, side = (w - h) // 2, 0, h
        else:
            cx, cy, side = 0, (h - w) // 2, w
        cropped = img_u8[cy:cy + side, cx:cx + side]
        return quantize_go(bilinear_resize_f64(cropped, size, size))
    if w > h:
        out_w, out_h = int(w * size / h), size
    else:
        out_w, out_h = size, int(h * size / w)
    return quantize_go(bilinear_resize_f64(img_u8, out_h, out_w))


def watermark_go(img_u8: np.ndarray, coverage: np.ndarray, x0: int, y0: int,
                 color_rgb: tuple[int, int, int], alpha: float) -> np.ndarray:
    """Src-over composite of a coverage tile at (x0, y0) with clipping."""
    out = img_u8.astype(np.float64).copy()
    h, w = out.shape[:2]
    th, tw = coverage.shape
    ys, xs = max(0, y0), max(0, x0)
    ye, xe = min(h, y0 + th), min(w, x0 + tw)
    if ye <= ys or xe <= xs:
        return img_u8.copy()
    cov = coverage[ys - y0:ye - y0, xs - x0:xe - x0].astype(np.float64)
    m = (cov * alpha)[:, :, None]
    col = np.asarray(color_rgb, dtype=np.float64)[None, None, :]
    out[ys:ye, xs:xe, :3] = out[ys:ye, xs:xe, :3] * (1 - m) + col * m
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)
