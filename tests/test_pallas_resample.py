"""Pallas planar resample kernel vs the float64 oracle (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

from imageprocessor_tpu.ops.pallas_resample import (
    make_args,
    make_plan,
    planar_resample,
)
from tests.oracle import psnr, resize_go, thumbnail_go

RNG = np.random.default_rng(77)


def run_resample(shapes, bucket, out_hw_req, crop=False):
    b = len(shapes)
    hb, wb = bucket
    imgs = np.zeros((b, hb, wb, 3), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    originals = []
    for i, (h, w) in enumerate(shapes):
        img = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        originals.append(img)
        imgs[i, :h, :w] = img
        src_hw[i] = (h, w)

    out_hw = np.tile(np.asarray([out_hw_req], np.int32), (b, 1))
    crop_yx = crop_hw = None
    if crop:
        crop_yx = np.zeros((b, 2), dtype=np.int64)
        crop_hw = np.zeros((b, 2), dtype=np.int64)
        for i, (h, w) in enumerate(shapes):
            side = min(h, w)
            crop_yx[i] = ((h - w) // 2 if h > w else 0,
                          (w - h) // 2 if w > h else 0)
            crop_hw[i] = (side, side)
        eff = crop_hw
    else:
        eff = src_hw
    ms_h = float(np.max(eff[:, 0] / np.maximum(out_hw[:, 0], 1)))
    ms_w = float(np.max(eff[:, 1] / np.maximum(out_hw[:, 1], 1)))
    plan = make_plan(b, 3, hb, wb, out_hw_req[0], out_hw_req[1],
                     max(ms_h, 1.0), max(ms_w, 1.0))
    args = make_args(plan, src_hw, out_hw, crop_yx=crop_yx, crop_hw=crop_hw)

    planar = np.transpose(imgs, (0, 3, 1, 2)).copy()
    out = np.asarray(planar_resample(planar, plan, args, interpret=True))
    hwc = np.transpose(out, (0, 2, 3, 1))
    return originals, hwc[:, :out_hw_req[0], :out_hw_req[1]]


def test_pallas_resize_matches_oracle():
    originals, out = run_resample(
        shapes=[(200, 256), (180, 240)], bucket=(200, 256),
        out_hw_req=(96, 128))
    for i, img in enumerate(originals):
        ref = resize_go(img, 128, 96)
        assert psnr(out[i], ref) > 45.0, f"image {i}: psnr too low"
        assert np.abs(out[i].astype(int) - ref.astype(int)).max() <= 1


def test_pallas_resize_upscale():
    originals, out = run_resample(
        shapes=[(64, 100)], bucket=(64, 128), out_hw_req=(128, 256))
    ref = resize_go(originals[0], 256, 128)
    assert psnr(out[0], ref) > 45.0


def test_pallas_thumbnail_crop_window():
    originals, out = run_resample(
        shapes=[(192, 256), (256, 192)], bucket=(256, 256),
        out_hw_req=(64, 64), crop=True)
    for i, img in enumerate(originals):
        ref = thumbnail_go(img, 64, crop_to_fit=True)
        assert psnr(out[i], ref) > 45.0, f"image {i}: psnr too low"


def test_pallas_band_edges_large_downscale():
    """Scale ~8x stresses band sizing and edge clamping."""
    originals, out = run_resample(
        shapes=[(512, 640)], bucket=(512, 640), out_hw_req=(64, 80))
    ref = resize_go(originals[0], 80, 64)
    assert psnr(out[0], ref) > 45.0
    assert np.abs(out[0].astype(int) - ref.astype(int)).max() <= 1


def test_pallas_bf16_mode_meets_psnr_contract():
    """bfloat16 matmul mode must stay above the 45 dB product bar."""
    b = 2
    hb, wb = 512, 640
    imgs = np.zeros((b, hb, wb, 3), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    originals = []
    for i in range(b):
        img = RNG.integers(0, 256, size=(hb - 10 * i, wb - 20 * i, 3),
                           dtype=np.uint8)
        originals.append(img)
        imgs[i, :img.shape[0], :img.shape[1]] = img
        src_hw[i] = img.shape[:2]
    out_hw = np.tile(np.asarray([[96, 128]], np.int32), (b, 1))
    plan = make_plan(b, 3, hb, wb, 96, 128, 512 / 96, 640 / 128,
                     compute_dtype="bfloat16")
    args = make_args(plan, src_hw, out_hw)
    planar = np.transpose(imgs, (0, 3, 1, 2)).copy()
    out = np.asarray(planar_resample(planar, plan, args, interpret=True))
    hwc = np.transpose(out, (0, 2, 3, 1))[:, :96, :128]
    for i, img in enumerate(originals):
        ref = resize_go(img, 128, 96)
        p = psnr(hwc[i], ref)
        assert p > 45.0, f"bf16 psnr {p:.1f} below contract"
