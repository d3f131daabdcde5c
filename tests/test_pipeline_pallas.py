"""PipelineModel with the Pallas path (interpret mode) vs the XLA path."""

import numpy as np

from imageprocessor_tpu.domain import OperationParams, OperationType
from imageprocessor_tpu.models.pipeline import PipelineModel, plan_output_specs
from imageprocessor_tpu.models.plan import normalize_operations
from imageprocessor_tpu.ops.coords import keep_aspect_dims
from tests.oracle import psnr

RNG = np.random.default_rng(55)


def _setup(shapes, bucket):
    b = len(shapes)
    imgs = np.zeros((b, *bucket, 3), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    for i, (h, w) in enumerate(shapes):
        imgs[i, :h, :w] = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        src_hw[i] = (h, w)
    return imgs, src_hw


def test_pallas_pipeline_matches_xla_pipeline():
    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 64, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 128, "height": 96, "keep_aspect": True}),
        OperationParams(OperationType.WATERMARK, {"text": "wm"}),
    ])
    shapes = [(200, 256), (180, 230)]
    bucket = (200, 256)
    imgs, src_hw = _setup(shapes, bucket)

    out_hw = np.zeros((len(shapes), 2), dtype=np.int32)
    for i, (h, w) in enumerate(shapes):
        tw, th = keep_aspect_dims(w, h, 128, 96)
        out_hw[i] = (th, tw)
    out_hws = {1: out_hw}
    specs = plan_output_specs(plan, bucket)

    xla = PipelineModel(use_pallas=False)
    ref_outs = [np.asarray(o) for o in
                xla.run(plan, imgs, src_hw, out_hws, specs)]

    pal = PipelineModel(use_pallas=True, pallas_interpret=True)
    pal_outs = [np.asarray(o) for o in
                pal.run(plan, imgs, src_hw, out_hws, specs)]

    assert pal_outs[0].shape == ref_outs[0].shape          # thumbnail canvas
    for i in range(len(shapes)):
        assert psnr(pal_outs[0][i], ref_outs[0][i]) > 50.0
        th, tw = out_hw[i]
        assert psnr(pal_outs[1][i, :th, :tw],
                    ref_outs[1][i, :th, :tw]) > 50.0
        h, w = shapes[i]
        np.testing.assert_array_equal(pal_outs[2][i, :h, :w],
                                      ref_outs[2][i, :h, :w])  # wm: XLA both
