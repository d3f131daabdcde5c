"""Data-parallel pipeline execution over a device mesh (8 virtual CPUs)."""

import numpy as np
import pytest

import jax

from imageprocessor_tpu.domain import OperationParams, OperationType
from imageprocessor_tpu.models.pipeline import PipelineModel, plan_output_specs
from imageprocessor_tpu.models.plan import normalize_operations
from imageprocessor_tpu.ops.coords import keep_aspect_dims
from imageprocessor_tpu.parallel.mesh import make_mesh
from tests.oracle import psnr

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

RNG = np.random.default_rng(47)


def test_run_sharded_matches_single_device():
    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 64, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 128, "height": 96, "keep_aspect": True}),
        OperationParams(OperationType.WATERMARK, {"text": "dp"}),
    ])
    b = 8
    bucket = (256, 256)
    imgs = np.zeros((b, *bucket, 3), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    for i in range(b):
        h, w = 200 + 4 * i, 240 - 6 * i
        imgs[i, :h, :w] = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        src_hw[i] = (h, w)
    out_hw = np.zeros((b, 2), dtype=np.int32)
    for i in range(b):
        tw, th = keep_aspect_dims(int(src_hw[i, 1]), int(src_hw[i, 0]),
                                  128, 96)
        out_hw[i] = (th, tw)
    out_hws = {1: out_hw}
    specs = plan_output_specs(plan, bucket)

    model = PipelineModel(use_pallas=False)
    single = [np.asarray(o) for o in
              model.run(plan, imgs, src_hw, out_hws, specs)]

    mesh = make_mesh(4, space=1)
    sharded = [np.asarray(o) for o in
               model.run_sharded(mesh, plan, imgs, src_hw, out_hws, specs)]

    for s, r in zip(sharded, single):
        assert s.shape == r.shape
    for i in range(b):
        assert psnr(sharded[0][i], single[0][i]) > 50.0       # thumbnail
        th, tw = out_hw[i]
        assert psnr(sharded[1][i, :th, :tw],
                    single[1][i, :th, :tw]) > 50.0            # resize
        h, w = src_hw[i]
        np.testing.assert_array_equal(sharded[2][i, :h, :w],
                                      single[2][i, :h, :w])   # watermark
