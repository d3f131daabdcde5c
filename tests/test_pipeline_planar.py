"""CHW end-to-end pipeline (planar layout) vs the HWC reference path."""

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
