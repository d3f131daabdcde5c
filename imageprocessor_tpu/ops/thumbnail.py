"""Thumbnail op: aspect-fit or center-crop-to-square.

Reference semantics (operations/thumbnail.go:25-132):
* crop_to_fit: center square crop (an identity-scale blit in the reference,
  thumbnail.go:114-132) then bilinear to size x size;
* otherwise: shorter side scaled to `size`, longer side proportional with
  int truncation (thumbnail.go:53-64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from imageprocessor_tpu.ops.coords import (
    bilinear_coords,
    center_crop_rect,
    quantize_go_xdraw,
    thumbnail_dims,
)
from imageprocessor_tpu.ops.resize import (
    _lerp_axis_cols,
    _lerp_axis_rows,
    resize_bilinear_u8,
)


@functools.partial(jax.jit, static_argnames=("size", "crop_x", "crop_y", "crop_side"))
def _crop_resize_u8(img_u8, size: int, crop_x: int, crop_y: int, crop_side: int):
    # Coordinates are computed inside the crop window [0, side) and only then
    # shifted by the crop origin, so edge clamping clamps to the crop, not
    # to the full image (matches the reference's crop-then-resize two-pass).
    x = img_u8.astype(jnp.float32)
    ri0, ri1, rf = bilinear_coords(size, crop_side)
    x = _lerp_axis_rows(x, ri0 + crop_y, ri1 + crop_y, rf)
    ci0, ci1, cf = bilinear_coords(size, crop_side)
    x = _lerp_axis_cols(x, ci0 + crop_x, ci1 + crop_x, cf)
    return quantize_go_xdraw(x)


def thumbnail_image(img_u8, size: int, crop_to_fit: bool = False):
    """Reference `Thumbnailer.Process` core (thumbnail.go:25-132)."""
    h, w = int(img_u8.shape[0]), int(img_u8.shape[1])
    if crop_to_fit:
        cx, cy, side = center_crop_rect(w, h)
        # Reference does crop (identity blit) then a separate bilinear pass;
        # a single offset bilinear over the crop window is arithmetically
        # identical because the blit is an exact pixel copy.
        return _crop_resize_u8(img_u8, size, cx, cy, side)
    out_w, out_h = thumbnail_dims(w, h, size)
    return resize_bilinear_u8(img_u8, max(out_h, 1), max(out_w, 1))


@functools.partial(jax.jit, static_argnames=("size",))
def batched_thumbnail(imgs_u8, src_hw, size: int):
    """Batched crop-to-fit / aspect thumbnails over a padded bucket.

    imgs_u8: (B, Hp, Wp, C) uint8; src_hw: (B, 2) valid (h, w).
    Always produces a (B, size, size, C) canvas. For crop-to-fit (the
    service default, handler/image/image.go:224-231) the full canvas is
    valid. Aspect-mode images are produced by `batched_resize_bilinear`
    with out_hw=thumbnail dims instead (engine dispatches there), so this
    kernel only implements the square crop path.
    """
    h = src_hw[:, 0]
    w = src_hw[:, 1]
    side = jnp.minimum(h, w)                                     # (B,)
    crop_x = jnp.where(w > h, (w - h) // 2, 0)
    crop_y = jnp.where(w > h, 0, (h - w) // 2)

    # Row coords: src = (d + .5) * side/size - .5 + crop_y, clamped to crop.
    # Gathers run on uint8 (4x less HBM traffic); casts follow the gather.
    dst = jnp.arange(size, dtype=jnp.float32)[None, :]
    scale = side.astype(jnp.float32)[:, None] / float(size)
    src_r = (dst + 0.5) * scale - 0.5
    src_r = jnp.clip(src_r, 0.0, side.astype(jnp.float32)[:, None] - 1.0)
    src_r = src_r + crop_y.astype(jnp.float32)[:, None]
    ri0 = jnp.floor(src_r).astype(jnp.int32)
    ri1 = jnp.minimum(ri0 + 1, (crop_y + side - 1)[:, None])
    ri0 = jnp.minimum(ri0, imgs_u8.shape[1] - 1)
    ri1 = jnp.minimum(ri1, imgs_u8.shape[1] - 1)
    rf = src_r - ri0.astype(jnp.float32)
    top = jnp.take_along_axis(imgs_u8, ri0[:, :, None, None], axis=1,
                              mode='promise_in_bounds').astype(jnp.float32)
    bot = jnp.take_along_axis(imgs_u8, ri1[:, :, None, None], axis=1,
                              mode='promise_in_bounds').astype(jnp.float32)
    x = top + (bot - top) * rf[:, :, None, None]

    src_c = (dst + 0.5) * scale - 0.5
    src_c = jnp.clip(src_c, 0.0, side.astype(jnp.float32)[:, None] - 1.0)
    src_c = src_c + crop_x.astype(jnp.float32)[:, None]
    ci0 = jnp.floor(src_c).astype(jnp.int32)
    ci1 = jnp.minimum(ci0 + 1, (crop_x + side - 1)[:, None])
    ci0 = jnp.minimum(ci0, imgs_u8.shape[2] - 1)
    ci1 = jnp.minimum(ci1, imgs_u8.shape[2] - 1)
    cf = src_c - ci0.astype(jnp.float32)
    left = jnp.take_along_axis(x, ci0[:, None, :, None], axis=2, mode='promise_in_bounds')
    right = jnp.take_along_axis(x, ci1[:, None, :, None], axis=2, mode='promise_in_bounds')
    x = left + (right - left) * cf[:, None, :, None]
    return quantize_go_xdraw(x)
