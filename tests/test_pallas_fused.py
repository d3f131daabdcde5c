"""Fused two-output kernel vs the float64 oracle (interpret mode)."""

import numpy as np
import pytest

from imageprocessor_tpu.ops.pallas_fused import (
    fused_resample,
    make_fused_args,
    make_fused_plan,
)
from imageprocessor_tpu.ops.coords import keep_aspect_dims
from tests.oracle import psnr, resize_go, thumbnail_go

RNG = np.random.default_rng(101)


def run_fused(shapes, bucket, resize_req=(96, 128), t_size=64):
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
    r_out_hw = np.zeros((b, 2), dtype=np.int32)
    for i, (h, w) in enumerate(shapes):
        tw, th = keep_aspect_dims(w, h, resize_req[1], resize_req[0])
        r_out_hw[i] = (max(th, 1), max(tw, 1))

    scales_r_h = src_hw[:, 0] / np.maximum(r_out_hw[:, 0], 1)
    sides = np.minimum(src_hw[:, 0], src_hw[:, 1])
    scales_t = sides / t_size
    plan = make_fused_plan(
        b, hb, wb, resize_req[0], resize_req[1], t_size,
        float(scales_r_h.min()), float(scales_r_h.max()),
        float(scales_t.min()), float(scales_t.max()),
        float((src_hw[:, 1] / np.maximum(r_out_hw[:, 1], 1)).max()),
        float(scales_t.max()),
        compute_dtype="float32")
    args = make_fused_args(plan, src_hw, r_out_hw)
    assert args.ok, "fused geometry should fit for these shapes"

    planar = np.transpose(imgs, (0, 3, 1, 2)).copy()
    rz, th_out = fused_resample(planar, plan, args, interpret=True)
    rz = np.transpose(np.asarray(rz), (0, 2, 3, 1))
    th_out = np.transpose(np.asarray(th_out), (0, 2, 3, 1))
    return originals, src_hw, r_out_hw, rz, th_out


def test_fused_matches_oracle_basic():
    originals, src_hw, r_out_hw, rz, th = run_fused(
        shapes=[(512, 640), (448, 576)], bucket=(512, 640))
    for i, img in enumerate(originals):
        ref_r = resize_go(img, 128, 96, keep_aspect=True)
        oh, ow = r_out_hw[i]
        assert psnr(rz[i, :oh, :ow], ref_r) > 45.0, f"resize {i}"
        assert np.abs(rz[i, :oh, :ow].astype(int)
                      - ref_r.astype(int)).max() <= 1
        ref_t = thumbnail_go(img, 64, crop_to_fit=True)
        assert psnr(th[i, :64, :64], ref_t) > 45.0, f"thumb {i}"
        assert np.abs(th[i, :64, :64].astype(int)
                      - ref_t.astype(int)).max() <= 1


def test_fused_portrait_and_landscape_crops():
    originals, src_hw, r_out_hw, rz, th = run_fused(
        shapes=[(640, 384), (384, 640)], bucket=(640, 640))
    for i, img in enumerate(originals):
        ref_t = thumbnail_go(img, 64, crop_to_fit=True)
        assert psnr(th[i, :64, :64], ref_t) > 45.0, f"thumb {i}"
        ref_r = resize_go(img, 128, 96, keep_aspect=True)
        oh, ow = r_out_hw[i]
        assert psnr(rz[i, :oh, :ow], ref_r) > 45.0, f"resize {i}"


def test_fused_small_image_in_tall_bucket():
    """Bands past the image end must park in the garbage zone without
    clobbering valid rows."""
    originals, src_hw, r_out_hw, rz, th = run_fused(
        shapes=[(640, 640), (200, 256)], bucket=(640, 640))
    img = originals[1]
    ref_r = resize_go(img, 128, 96, keep_aspect=True)
    oh, ow = r_out_hw[1]
    assert psnr(rz[1, :oh, :ow], ref_r) > 45.0
    ref_t = thumbnail_go(img, 64, crop_to_fit=True)
    assert psnr(th[1, :64, :64], ref_t) > 45.0


def test_plan_defaults_and_env_overrides(monkeypatch):
    """Lock in the tuned plan parameters (v5e sweep, PERF.md round 2):
    own=240, band=own+16 slack, nbuf=4 at the flagship 12 MP geometry —
    and the IMAGEPROCESSOR_FUSED_* tuning knobs must keep working."""
    def plan_12mp():
        return make_fused_plan(8, 3072, 4096, 768, 1024, 200,
                               min_scale_r=3.9, max_scale_r=3.91,
                               min_scale_t=15.0, max_scale_t=15.0,
                               max_scale_w_r=3.91, max_scale_w_t=15.0)

    plan = plan_12mp()
    assert plan.own_rows == 240
    assert plan.band_rows == 256          # own + 16 slack, 8-aligned
    assert plan.nbuf == 4
    assert plan.n_bands == 13

    monkeypatch.setenv("IMAGEPROCESSOR_FUSED_OWN", "320")
    monkeypatch.setenv("IMAGEPROCESSOR_FUSED_NBUF", "6")
    monkeypatch.setenv("IMAGEPROCESSOR_FUSED_SLACK", "48")
    plan = plan_12mp()
    assert plan.own_rows == 320
    assert plan.band_rows == 368
    assert plan.nbuf == 6

    # A tiny VMEM budget must push the ladder down to a smaller band.
    monkeypatch.delenv("IMAGEPROCESSOR_FUSED_OWN")
    monkeypatch.setenv("IMAGEPROCESSOR_FUSED_SLACK", "16")
    monkeypatch.setenv("IMAGEPROCESSOR_FUSED_VMEM_MB", "24")
    assert plan_12mp().own_rows < 240
