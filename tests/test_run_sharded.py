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


def _default_plan():
    return normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 64, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 128, "height": 96, "keep_aspect": True}),
        OperationParams(OperationType.WATERMARK, {"text": "dp"}),
    ])


def _inputs(b, bucket, planar=False):
    """Mixed per-image dims whose resample scales stay inside one quantized
    scale bucket, so the local (per-shard) Pallas plan geometry matches the
    global one — the production invariant run_sharded relies on."""
    imgs = np.zeros((b, *bucket, 3), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    for i in range(b):
        h, w = 200 + 4 * (i % 3), 240 - 6 * (i % 4)
        imgs[i, :h, :w] = RNG.integers(0, 256, size=(h, w, 3),
                                       dtype=np.uint8)
        src_hw[i] = (h, w)
    out_hw = np.zeros((b, 2), dtype=np.int32)
    for i in range(b):
        tw, th = keep_aspect_dims(int(src_hw[i, 1]), int(src_hw[i, 0]),
                                  128, 96)
        out_hw[i] = (th, tw)
    if planar:
        imgs = np.ascontiguousarray(np.transpose(imgs, (0, 3, 1, 2)))
    return imgs, src_hw, {1: out_hw}


def test_run_sharded_pallas_interpret_matches_single():
    """Pallas resample kernels executing INSIDE shard_map (HWC layout):
    the global index arrays are P('data')-sharded and each shard's slice
    must line up with the local-batch kernel plan."""
    plan = _default_plan()
    b, bucket = 8, (256, 256)
    imgs, src_hw, out_hws = _inputs(b, bucket)
    specs = plan_output_specs(plan, bucket)

    model = PipelineModel(use_pallas=True, pallas_interpret=True)
    single = [np.asarray(o) for o in
              model.run(plan, imgs, src_hw, out_hws, specs)]
    mesh = make_mesh(4, space=1)
    sharded = [np.asarray(o) for o in
               model.run_sharded(mesh, plan, imgs, src_hw, out_hws, specs)]

    out_hw = out_hws[1]
    for s, r in zip(sharded, single):
        assert s.shape == r.shape
    for i in range(b):
        np.testing.assert_array_equal(sharded[0][i, :64, :64],
                                      single[0][i, :64, :64])
        th, tw = out_hw[i]
        np.testing.assert_array_equal(sharded[1][i, :th, :tw],
                                      single[1][i, :th, :tw])
        h, w = src_hw[i]
        np.testing.assert_array_equal(sharded[2][i, :h, :w],
                                      single[2][i, :h, :w])


def test_run_sharded_planar_fused_matches_single():
    """The production multi-chip hot path: the single-sweep fused
    resize+thumbnail Pallas kernel, planar CHW end-to-end, under
    shard_map — exercises run_sharded's global fused-args rebuild
    (FusedPlan batch override + P('data') sharding of (B*NB,...) index
    arrays)."""
    plan = _default_plan()
    b, bucket = 8, (256, 256)
    imgs, src_hw, out_hws = _inputs(b, bucket, planar=True)
    specs = plan_output_specs(plan, bucket)

    model = PipelineModel(use_pallas=True, pallas_interpret=True)
    assert model.supports_planar(plan, bucket)
    single = [np.asarray(o) for o in
              model.run(plan, imgs, src_hw, out_hws, specs, layout="chw")]
    mesh = make_mesh(4, space=1)
    sharded = [np.asarray(o) for o in
               model.run_sharded(mesh, plan, imgs, src_hw, out_hws, specs,
                                 layout="chw")]

    out_hw = out_hws[1]
    for s, r in zip(sharded, single):
        assert s.shape == r.shape
    for i in range(b):
        # thumbnail + resize come from the fused kernel; the reference
        # output is the same kernel single-device, so equality is exact
        np.testing.assert_array_equal(sharded[0][i, :, :64, :64],
                                      single[0][i, :, :64, :64])
        th, tw = out_hw[i]
        np.testing.assert_array_equal(sharded[1][i, :, :th, :tw],
                                      single[1][i, :, :th, :tw])
        h, w = src_hw[i]
        np.testing.assert_array_equal(sharded[2][i, :, :h, :w],
                                      single[2][i, :, :h, :w])


def test_run_sharded_mixed_scale_quantization_matches_single():
    """Shard 0's images must NOT determine the kernel geometry: here the
    batch's max resample scale lives in the LAST shard (shard 0 images
    quantize to a smaller scale bucket), so plans derived from shard 0
    alone would disagree with the globally built index arrays."""
    plan = _default_plan()
    b, bucket = 8, (512, 512)
    imgs = np.zeros((b, *bucket, 3), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    for i in range(b):
        # first shards: mild downscale; last shard: much larger scale
        h = w = 180 if i < 6 else 500
        imgs[i, :h, :w] = RNG.integers(0, 256, size=(h, w, 3),
                                       dtype=np.uint8)
        src_hw[i] = (h, w)
    out_hw = np.zeros((b, 2), dtype=np.int32)
    for i in range(b):
        tw, th = keep_aspect_dims(int(src_hw[i, 1]), int(src_hw[i, 0]),
                                  128, 96)
        out_hw[i] = (th, tw)
    out_hws = {1: out_hw}
    specs = plan_output_specs(plan, bucket)

    model = PipelineModel(use_pallas=True, pallas_interpret=True)
    single = [np.asarray(o) for o in
              model.run(plan, imgs, src_hw, out_hws, specs)]
    mesh = make_mesh(4, space=1)
    sharded = [np.asarray(o) for o in
               model.run_sharded(mesh, plan, imgs, src_hw, out_hws, specs)]
    for i in range(b):
        np.testing.assert_array_equal(sharded[0][i, :64, :64],
                                      single[0][i, :64, :64])
        th, tw = out_hw[i]
        np.testing.assert_array_equal(sharded[1][i, :th, :tw],
                                      single[1][i, :th, :tw])
