"""Resampling coordinate math shared by all geometric ops.

Source-coordinate convention: Go's x/image/draw kernels map destination
pixel centers to source space as  src = (dst + 0.5) * (srcN / dstN) - 0.5
with neighbor indices clamped to the source bounds (the half-pixel /
align_corners=False convention; reference: operations/resize.go:121-125 via
xdraw.BiLinear.Scale). All size arithmetic that the reference does in Go
float64 + int truncation is reproduced here in Python floats so padded
bucket plans agree byte-for-byte with the reference's output dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def keep_aspect_dims(orig_w: int, orig_h: int, width: int, height: int) -> tuple[int, int]:
    """Aspect-preserving target size, min-ratio rule with truncation.

    Reference: operations/resize.go:63-72 — ratio = min(w/W, h/H);
    new = int(float64(orig) * ratio).
    """
    width_ratio = float(width) / float(orig_w)
    height_ratio = float(height) / float(orig_h)
    ratio = min(width_ratio, height_ratio)
    return int(float(orig_w) * ratio), int(float(orig_h) * ratio)


def thumbnail_dims(orig_w: int, orig_h: int, size: int) -> tuple[int, int]:
    """Non-cropping thumbnail target: shorter side == size.

    Reference: operations/thumbnail.go:53-64 (int truncation of the
    float64 product, longer side scaled proportionally).
    """
    if orig_w > orig_h:
        return int(float(orig_w) * float(size) / float(orig_h)), size
    return size, int(float(orig_h) * float(size) / float(orig_w))


def center_crop_rect(orig_w: int, orig_h: int) -> tuple[int, int, int]:
    """Center square crop (x, y, side). Reference: thumbnail.go:114-126."""
    if orig_w > orig_h:
        return (orig_w - orig_h) // 2, 0, orig_h
    return 0, (orig_h - orig_w) // 2, orig_w


def bilinear_coords(out_size: int, src_size, *, src_offset=0.0, scale=None):
    """Per-output-index source gather indices and lerp weight.

    Returns (idx0, idx1, frac) each of shape (out_size,). `src_size` and
    `src_offset`/`scale` may be Python ints (static single-image path) or
    traced scalars (batched per-image path — then the caller supplies
    `scale = valid_src / out` itself and idx clamping uses `src_size`).
    """
    if scale is None:
        scale = src_size / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5 + src_offset
    src = jnp.clip(src, 0.0, jnp.asarray(src_size, jnp.float32) - 1.0)
    idx0 = jnp.floor(src).astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, jnp.asarray(src_size, jnp.int32) - 1)
    frac = src - idx0.astype(jnp.float32)
    return idx0, idx1, frac


def quantize_go_xdraw(x):
    """Float [0,255] -> uint8 with Go x/image/draw's quantization.

    xdraw kernels interpolate 16-bit premultiplied channels (v8 * 0x101)
    in float64, truncate to uint16, then convert to 8-bit with `>> 8`:
    out = floor(g * 257) >> 8 == floor(g * 257 / 256) for g in [0, 255].
    """
    return jnp.clip(jnp.floor(x * (257.0 / 256.0)), 0.0, 255.0).astype(jnp.uint8)
