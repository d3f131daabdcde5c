"""Golden tests: JAX resize/thumbnail ops vs the float64 NumPy oracle.

Tolerance: PSNR > 45 dB is the product bar (BASELINE.md); the ops should in
practice be within 1 LSB of the oracle (f32 vs f64 rounding only).
"""

import numpy as np
import pytest

from imageprocessor_tpu.ops import (
    batched_resize_bilinear,
    batched_thumbnail,
    keep_aspect_dims,
    resize_image,
    thumbnail_dims,
    thumbnail_image,
)
from tests.oracle import psnr, resize_go, thumbnail_go

RNG = np.random.default_rng(42)


def random_img(h, w, c=3):
    return RNG.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def gradient_img(h, w, c=3):
    yy = np.linspace(0, 255, h)[:, None]
    xx = np.linspace(0, 255, w)[None, :]
    img = np.stack([(yy + xx) / 2, yy * np.ones_like(xx), np.ones_like(yy) * xx],
                   axis=-1)
    return img[:, :, :c].astype(np.uint8)


@pytest.mark.parametrize("shape,target", [
    ((480, 640), (768, 1024)),   # upscale
    ((1200, 1600), (768, 1024)),  # downscale
    ((333, 517), (200, 100)),    # odd sizes
    ((50, 50), (1024, 768)),     # big upscale
])
def test_resize_matches_oracle(shape, target):
    img = random_img(*shape)
    w, h = target[1], target[0]
    ours = np.asarray(resize_image(img, width=w, height=h, keep_aspect=False))
    ref = resize_go(img, width=w, height=h, keep_aspect=False)
    assert ours.shape == ref.shape
    assert psnr(ours, ref) > 45.0
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_resize_keep_aspect_dims_match_go_truncation():
    # 1600x1200 -> fit in 1024x768: ratio = min(0.64, 0.64) = 0.64
    assert keep_aspect_dims(1600, 1200, 1024, 768) == (1024, 768)
    # 3000x2000 -> min(1024/3000, 768/2000) = 0.3413... -> (1024, 682)
    assert keep_aspect_dims(3000, 2000, 1024, 768) == (1024, 682)
    # 999x501 odd case — exact Go float64->int truncation
    w, h = keep_aspect_dims(999, 501, 1024, 768)
    ratio = min(1024 / 999, 768 / 501)
    assert (w, h) == (int(999 * ratio), int(501 * ratio))


def test_resize_keep_aspect_matches_oracle():
    img = gradient_img(600, 800)
    ours = np.asarray(resize_image(img, 1024, 768, keep_aspect=True))
    ref = resize_go(img, 1024, 768, keep_aspect=True)
    assert ours.shape == ref.shape
    assert psnr(ours, ref) > 45.0


@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (500, 500), (201, 333)])
def test_thumbnail_crop_to_fit_matches_oracle(shape):
    img = random_img(*shape)
    ours = np.asarray(thumbnail_image(img, 200, crop_to_fit=True))
    ref = thumbnail_go(img, 200, crop_to_fit=True)
    assert ours.shape == (200, 200, 3)
    assert psnr(ours, ref) > 45.0
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_thumbnail_aspect_matches_oracle():
    img = random_img(300, 400)
    ours = np.asarray(thumbnail_image(img, 200, crop_to_fit=False))
    ref = thumbnail_go(img, 200, crop_to_fit=False)
    assert ours.shape == ref.shape == (200, 266, 3)
    assert psnr(ours, ref) > 45.0


def test_thumbnail_dims_truncation():
    assert thumbnail_dims(400, 300, 200) == (266, 200)
    assert thumbnail_dims(300, 400, 200) == (200, 266)
    assert thumbnail_dims(500, 500, 200) == (200, 200)


def test_batched_resize_mixed_resolutions():
    """Per-image scales inside one padded bucket must match per-image oracle."""
    shapes = [(480, 640), (600, 800), (333, 517), (768, 1024)]
    pad_h, pad_w = 768, 1024
    out_h, out_w = 256, 320
    batch = np.zeros((len(shapes), pad_h, pad_w, 3), dtype=np.uint8)
    src_hw = np.zeros((len(shapes), 2), dtype=np.int32)
    out_hw = np.zeros((len(shapes), 2), dtype=np.int32)
    imgs = []
    for i, (h, w) in enumerate(shapes):
        img = random_img(h, w)
        imgs.append(img)
        batch[i, :h, :w] = img
        src_hw[i] = (h, w)
        out_hw[i] = (out_h, out_w)

    out = np.asarray(batched_resize_bilinear(batch, src_hw, out_hw, out_h, out_w))
    for i, img in enumerate(imgs):
        ref = resize_go(img, out_w, out_h)
        assert psnr(out[i], ref) > 45.0, f"image {i} diverged"
        assert np.abs(out[i].astype(int) - ref.astype(int)).max() <= 1


def test_batched_resize_per_image_output_dims():
    """keep_aspect produces different valid output sizes per image."""
    shapes = [(400, 400), (300, 600)]
    pad_h, pad_w = 400, 600
    batch = np.zeros((2, pad_h, pad_w, 3), dtype=np.uint8)
    src_hw = np.zeros((2, 2), dtype=np.int32)
    out_hw = np.zeros((2, 2), dtype=np.int32)
    imgs = []
    for i, (h, w) in enumerate(shapes):
        img = gradient_img(h, w)
        imgs.append(img)
        batch[i, :h, :w] = img
        src_hw[i] = (h, w)
        tw, th = keep_aspect_dims(w, h, 256, 192)
        out_hw[i] = (th, tw)

    out = np.asarray(batched_resize_bilinear(batch, src_hw, out_hw, 192, 256))
    for i, img in enumerate(imgs):
        ref = resize_go(img, 256, 192, keep_aspect=True)
        th, tw = out_hw[i]
        assert ref.shape[:2] == (th, tw)
        assert psnr(out[i, :th, :tw], ref) > 45.0


def test_batched_thumbnail_matches_oracle():
    shapes = [(480, 640), (640, 480), (512, 512)]
    pad = 640
    batch = np.zeros((len(shapes), pad, pad, 3), dtype=np.uint8)
    src_hw = np.zeros((len(shapes), 2), dtype=np.int32)
    imgs = []
    for i, (h, w) in enumerate(shapes):
        img = random_img(h, w)
        imgs.append(img)
        batch[i, :h, :w] = img
        src_hw[i] = (h, w)
    out = np.asarray(batched_thumbnail(batch, src_hw, 200))
    assert out.shape == (len(shapes), 200, 200, 3)
    for i, img in enumerate(imgs):
        ref = thumbnail_go(img, 200, crop_to_fit=True)
        assert psnr(out[i], ref) > 45.0, f"image {i} diverged"


def test_padding_does_not_bleed():
    """Poisoned pad pixels must not affect the valid output region."""
    h, w = 300, 400
    img = random_img(h, w)
    clean = np.zeros((1, 512, 512, 3), dtype=np.uint8)
    clean[0, :h, :w] = img
    poisoned = np.full((1, 512, 512, 3), 255, dtype=np.uint8)
    poisoned[0, :h, :w] = img
    src_hw = np.array([[h, w]], dtype=np.int32)
    out_hw = np.array([[150, 200]], dtype=np.int32)
    a = np.asarray(batched_resize_bilinear(clean, src_hw, out_hw, 150, 200))
    b = np.asarray(batched_resize_bilinear(poisoned, src_hw, out_hw, 150, 200))
    np.testing.assert_array_equal(a[0, :150, :200], b[0, :150, :200])
