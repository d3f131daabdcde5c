"""CHW end-to-end pipeline (planar layout) vs the HWC reference path."""

import pytest
import numpy as np

from imageprocessor_tpu.domain import OperationParams, OperationType
from imageprocessor_tpu.models.pipeline import PipelineModel, plan_output_specs
from imageprocessor_tpu.models.plan import normalize_operations
from imageprocessor_tpu.ops.coords import keep_aspect_dims
from tests.oracle import psnr

RNG = np.random.default_rng(91)


def test_chw_pipeline_matches_hwc():
    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 64, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 128, "height": 96, "keep_aspect": True}),
        OperationParams(OperationType.WATERMARK, {"text": "wm"}),
        OperationParams(OperationType.GRAYSCALE, {}),
    ])
    shapes = [(200, 256), (160, 220)]
    bucket = (200, 256)
    b = len(shapes)
    imgs = np.zeros((b, *bucket, 3), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    for i, (h, w) in enumerate(shapes):
        imgs[i, :h, :w] = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        src_hw[i] = (h, w)
    out_hw = np.zeros((b, 2), dtype=np.int32)
    for i, (h, w) in enumerate(shapes):
        tw, th = keep_aspect_dims(w, h, 128, 96)
        out_hw[i] = (th, tw)
    out_hws = {1: out_hw}
    specs = plan_output_specs(plan, bucket)

    hwc_model = PipelineModel(use_pallas=False)
    ref = [np.asarray(o) for o in
           hwc_model.run(plan, imgs, src_hw, out_hws, specs)]

    chw_model = PipelineModel(use_pallas=True, pallas_interpret=True)
    assert chw_model.supports_planar(plan, bucket)
    planar_in = np.transpose(imgs, (0, 3, 1, 2)).copy()
    outs = [np.asarray(o) for o in
            chw_model.run(plan, planar_in, src_hw, out_hws, specs,
                          layout="chw")]
    # planar outputs -> HWC for comparison
    outs_hwc = [np.transpose(o, (0, 2, 3, 1)) for o in outs]

    for i, (h, w) in enumerate(shapes):
        assert psnr(outs_hwc[0][i], ref[0][i]) > 50.0           # thumbnail
        th, tw = out_hw[i]
        assert psnr(outs_hwc[1][i, :th, :tw],
                    ref[1][i, :th, :tw]) > 50.0                 # resize
        np.testing.assert_array_equal(outs_hwc[2][i, :h, :w],
                                      ref[2][i, :h, :w])        # watermark
        np.testing.assert_array_equal(outs_hwc[3][i, :h, :w],
                                      ref[3][i, :h, :w])        # grayscale


def test_supports_planar_gate():
    model = PipelineModel(use_pallas=True, pallas_interpret=True)
    flip_plan = normalize_operations(
        [OperationParams(OperationType.FLIP, {"direction": "horizontal"})])
    assert not model.supports_planar(flip_plan, (256, 256))
    off = PipelineModel(use_pallas=False)
    ok_plan = normalize_operations(
        [OperationParams(OperationType.GRAYSCALE, {})])
    assert not off.supports_planar(ok_plan, (256, 256))


def test_chw_upscale_skips_fused_and_still_matches():
    """Upscale plans can't use the fused sweep (per-band row chunks blow
    up); the per-op Pallas kernels must take over transparently."""
    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 64, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 512, "height": 384, "keep_aspect": True}),
    ])
    shapes = [(120, 160)]
    bucket = (128, 160)
    imgs = np.zeros((1, *bucket, 3), dtype=np.uint8)
    imgs[0, :120, :160] = RNG.integers(0, 256, size=(120, 160, 3),
                                       dtype=np.uint8)
    src_hw = np.asarray([[120, 160]], dtype=np.int32)
    tw, th = keep_aspect_dims(160, 120, 512, 384)
    out_hws = {1: np.asarray([[th, tw]], dtype=np.int32)}
    specs = plan_output_specs(plan, bucket)

    chw_model = PipelineModel(use_pallas=True, pallas_interpret=True)
    meta, _ = chw_model._fused_setup(plan, bucket, 1, src_hw, out_hws)
    assert meta is None  # upscale -> fused declined

    planar_in = np.transpose(imgs, (0, 3, 1, 2)).copy()
    outs = [np.asarray(o) for o in
            chw_model.run(plan, planar_in, src_hw, out_hws, specs,
                          layout="chw")]
    ref_model = PipelineModel(use_pallas=False)
    refs = [np.asarray(o) for o in
            ref_model.run(plan, imgs, src_hw, out_hws, specs)]
    assert psnr(np.transpose(outs[0][0], (1, 2, 0)), refs[0][0]) > 45.0
    assert psnr(np.transpose(outs[1][0], (1, 2, 0))[:th, :tw],
                refs[1][0, :th, :tw]) > 45.0


def test_chw_aspect_thumbnail_takes_fused_path_and_matches():
    """Aspect-mode thumbnails (crop_to_fit=False) ride the fused kernel
    as a second keep-aspect resize; outputs must match the XLA path."""
    import numpy as np

    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.models.pipeline import (
        PipelineModel,
        plan_output_specs,
    )
    from imageprocessor_tpu.models.plan import normalize_operations
    from imageprocessor_tpu.ops.coords import thumbnail_dims

    rng = np.random.default_rng(17)
    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 64, "crop_to_fit": False}),
        OperationParams(OperationType.RESIZE,
                        {"width": 96, "height": 64, "keep_aspect": False}),
    ])
    bucket = (256, 384)
    b = 2
    dims = [(200, 300), (256, 384)]
    imgs = np.zeros((b, 3, *bucket), dtype=np.uint8)
    hwc = np.zeros((b, *bucket, 3), dtype=np.uint8)
    for i, (h, w) in enumerate(dims):
        im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        imgs[i, :, :h, :w] = im.transpose(2, 0, 1)
        hwc[i, :h, :w] = im
    src_hw = np.asarray(dims, dtype=np.int32)
    out_hws = {}
    t_hw = np.zeros((b, 2), dtype=np.int32)
    long_side = 64
    for i, (h, w) in enumerate(dims):
        tw, th = thumbnail_dims(w, h, 64)
        t_hw[i] = (th, tw)
        long_side = max(long_side, th, tw)
    out_hws[0] = t_hw
    out_hws[1] = np.asarray([(64, 96)] * b, dtype=np.int32)
    specs = plan_output_specs(plan, bucket, {0: long_side})

    chw = PipelineModel(use_pallas=True, pallas_interpret=True)
    fused_meta, fused_arrays = chw._fused_setup(plan, bucket, b, src_hw,
                                                out_hws)
    assert fused_meta is not None, "aspect plan should take the fused path"

    outs_chw = chw.run(plan, imgs, src_hw, out_hws, specs, layout="chw")
    ref = PipelineModel(use_pallas=False)
    outs_ref = ref.run(plan, hwc, src_hw, out_hws, specs, layout="hwc")
    for oi in (0, 1):
        for i in range(b):
            oh, ow = out_hws[oi][i]
            a = np.asarray(outs_chw[oi])[i, :, :oh, :ow].transpose(1, 2, 0)
            r = np.asarray(outs_ref[oi])[i, :oh, :ow]
            diff = np.abs(a.astype(int) - r.astype(int))
            assert diff.max() <= 1, (oi, i, diff.max())


@pytest.mark.parametrize("h,w,bh,bw", [
    (96, 2048, 128, 2048),    # 21:1 panorama
    (2048, 96, 2048, 128),    # 1:21 tall strip
    (70, 70, 128, 128),       # barely above the thumbnail size
    (65, 130, 128, 256),
])
def test_extreme_aspect_geometries_stay_correct(h, w, bh, bw):
    """Adversarial aspect ratios: the fused single-sweep plan rejects
    geometries whose per-band row chunks overflow (make_fused_args
    ok=False) and the pipeline must fall back — outputs always match the
    oracle regardless of which path ran."""
    from tests.oracle import psnr, resize_go, thumbnail_go

    rng = np.random.default_rng(9)
    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 64, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 128, "height": 96, "keep_aspect": True}),
    ])
    model = PipelineModel(use_pallas=True, pallas_interpret=True)
    imgs = np.zeros((1, 3, bh, bw), dtype=np.uint8)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    imgs[0, :, :h, :w] = np.transpose(img, (2, 0, 1))
    src_hw = np.asarray([[h, w]], np.int32)
    tw, th = keep_aspect_dims(w, h, 128, 96)
    out_hws = {1: np.asarray([[th, tw]], np.int32)}
    specs = plan_output_specs(plan, (bh, bw))
    outs = [np.asarray(o) for o in
            model.run(plan, imgs, src_hw, out_hws, specs, layout="chw")]
    thumb = np.transpose(outs[0][0, :, :64, :64], (1, 2, 0))
    rz = np.transpose(outs[1][0, :, :th, :tw], (1, 2, 0))
    assert psnr(thumb, thumbnail_go(img, 64, crop_to_fit=True)) > 45.0
    assert psnr(rz, resize_go(img, tw, th, keep_aspect=False)) > 45.0


def test_wm_args_cache_keyed_by_op_index():
    """[watermark] and [thumbnail, watermark] with identical watermark
    params must not share a cached wm_args dict — the dict is keyed by
    position in the plan (a shared entry crashed the second plan's step
    with KeyError, poisoning the worker for the process lifetime)."""
    model = PipelineModel(use_pallas=False)
    plan_a = normalize_operations([
        OperationParams(OperationType.WATERMARK, {"text": "cache"}),
    ])
    plan_b = normalize_operations([
        OperationParams(OperationType.THUMBNAIL, {"size": 32}),
        OperationParams(OperationType.WATERMARK, {"text": "cache"}),
    ])
    args_a = model.prepare_wm_args(plan_a)
    args_b = model.prepare_wm_args(plan_b)
    assert set(args_a) == {0}
    assert set(args_b) == {1}      # not the cached {0: ...}

    # and the full program runs (this crashed before the fix)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (1, 64, 128, 3), dtype=np.uint8)
    src_hw = np.asarray([[64, 128]], np.int32)
    specs = plan_output_specs(plan_b, (64, 128))
    outs = model.run(plan_b, imgs, src_hw, {}, specs)
    assert len(outs) == 2


def test_fused_plus_extra_pallas_op_mixed_keys():
    """A planar plan with the fused resize+thumbnail pair PLUS a second
    resize: the extra op's Pallas args share one dict with the "fused"
    entry, and that dict rides through jax.jit as a pytree — mixed
    int/str keys broke pytree key sorting (ValueError) before the args
    switched to string keys."""
    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 48, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 128, "height": 96, "keep_aspect": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 80, "height": 60, "keep_aspect": True}),
    ])
    shapes = [(200, 256), (160, 220)]
    bucket = (200, 256)
    b = len(shapes)
    imgs = np.zeros((b, *bucket, 3), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    for i, (h, w) in enumerate(shapes):
        imgs[i, :h, :w] = RNG.integers(0, 256, size=(h, w, 3),
                                       dtype=np.uint8)
        src_hw[i] = (h, w)
    out_hws = {}
    for oi, (tw_t, th_t) in ((1, (128, 96)), (2, (80, 60))):
        hw = np.zeros((b, 2), dtype=np.int32)
        for i, (h, w) in enumerate(shapes):
            tw, th = keep_aspect_dims(w, h, tw_t, th_t)
            hw[i] = (th, tw)
        out_hws[oi] = hw
    specs = plan_output_specs(plan, bucket)

    ref = [np.asarray(o) for o in
           PipelineModel(use_pallas=False).run(plan, imgs, src_hw,
                                               out_hws, specs)]

    chw_model = PipelineModel(use_pallas=True, pallas_interpret=True)
    planar_in = np.transpose(imgs, (0, 3, 1, 2)).copy()
    outs = [np.transpose(np.asarray(o), (0, 2, 3, 1)) for o in
            chw_model.run(plan, planar_in, src_hw, out_hws, specs,
                          layout="chw")]
    for i in range(b):
        assert psnr(outs[0][i], ref[0][i]) > 50.0
        for oi in (1, 2):
            th, tw = out_hws[oi][i]
            assert psnr(outs[oi][i, :th, :tw], ref[oi][i, :th, :tw]) > 50.0


def test_max_resample_scale_gates_steep_downscales():
    """max_resample_scale reports the steepest per-axis downscale in a
    group (crop-thumbnail windows included) — the engine keeps groups
    past _MAX_QUANT_SCALE off the planar layout, because the Pallas
    band geometry would clamp source indices (corrupt pixels)."""
    plan = normalize_operations([
        OperationParams(OperationType.RESIZE,
                        {"width": 40, "height": 40, "keep_aspect": False}),
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 40, "crop_to_fit": True}),
    ])
    src_hw = np.asarray([[1400, 1200], [300, 280]], np.int32)
    out_hws = {0: np.asarray([[40, 40], [40, 40]], np.int32)}
    s = PipelineModel.max_resample_scale(plan, src_hw, out_hws)
    assert s == pytest.approx(35.0)     # 1400 / 40
    from imageprocessor_tpu.models.pipeline import _MAX_QUANT_SCALE
    assert s > _MAX_QUANT_SCALE

    mild = PipelineModel.max_resample_scale(
        plan, np.asarray([[300, 280]], np.int32),
        {0: np.asarray([[40, 40]], np.int32)})
    assert mild <= _MAX_QUANT_SCALE


def test_hwc_pallas_skips_steep_downscale_ops():
    """On the HWC path, an op steeper than the band-geometry cap must
    fall back to the XLA gather resample instead of running a Pallas
    kernel whose clamped indices would silently corrupt the output."""
    from tests.oracle import resize_go

    plan = normalize_operations([
        OperationParams(OperationType.RESIZE,
                        {"width": 40, "height": 40, "keep_aspect": False}),
    ])
    h, w = 1400, 1344
    bucket = (1400, 1344)
    img = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    imgs = img[None]
    src_hw = np.asarray([[h, w]], np.int32)
    out_hws = {0: np.asarray([[40, 40]], np.int32)}
    specs = plan_output_specs(plan, bucket)

    model = PipelineModel(use_pallas=True, pallas_interpret=True)
    plans, _args = model._pallas_setup(plan, bucket, 1, src_hw, out_hws,
                                       specs)
    assert plans == {}   # skipped: scale 35 exceeds the 32x band cap

    out = np.asarray(model.run(plan, imgs, src_hw, out_hws, specs)[0])
    assert psnr(out[0, :40, :40], resize_go(img, 40, 40,
                                            keep_aspect=False)) > 45.0
