"""VERDICT r2 #6 probe: decompose the service-step vs isolated-kernel
gap (0.737 vs 0.665 ms/batch at 8x12MP).

Times three variants of the jitted service step under the same chained
fori_loop harness (so per-dispatch costs are amortized to zero and the
delta is purely in-program work):
  A. thumbnail+resize+watermark  (the production plan)
  B. thumbnail+resize            (watermark op removed)
  C. watermark only              (blend program in isolation)

If B matches the isolated kernel and A-B matches C, the 0.07 ms gap is
the watermark blend's in-program compute (tile-region read-modify-write
+ loop-carry aliasing), not dispatch or cache overhead — i.e. the step
is already at its floor.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from imageprocessor_tpu.domain import OperationParams, OperationType
from imageprocessor_tpu.models.pipeline import PipelineModel, plan_output_specs
from imageprocessor_tpu.models.plan import normalize_operations
from imageprocessor_tpu.ops.coords import keep_aspect_dims
from imageprocessor_tpu.runtime.batcher import bucket_for

B = 8
SRC_H, SRC_W = 3000, 4000
BH, BW = bucket_for(SRC_H, SRC_W)

rng = np.random.default_rng(0)
imgs = np.zeros((B, 3, BH, BW), dtype=np.uint8)
imgs[:, :, :SRC_H, :SRC_W] = rng.integers(
    0, 256, (B, 3, SRC_H, SRC_W), dtype=np.uint8)
src_hw = np.tile(np.asarray([[SRC_H, SRC_W]], np.int32), (B, 1))

OPS = {
    "thumb": OperationParams(OperationType.THUMBNAIL,
                             {"size": 200, "crop_to_fit": True}),
    "resize": OperationParams(OperationType.RESIZE,
                              {"width": 1024, "height": 768,
                               "keep_aspect": True}),
    "wm": OperationParams(OperationType.WATERMARK,
                          {"text": "© ImageProcessor"}),
}


def time_plan(name, op_keys):
    plan = normalize_operations([OPS[k] for k in op_keys])
    model = PipelineModel()
    out_hws = {}
    for i, op in enumerate(plan.ops):
        if op.type is OperationType.RESIZE:
            w, h = keep_aspect_dims(SRC_W, SRC_H, op.width, op.height)
            out_hws[i] = np.tile(np.asarray([[h, w]], np.int32), (B, 1))
    specs = plan_output_specs(plan, (BH, BW))
    layout = "chw" if model.supports_planar(plan, (BH, BW)) else "hwc"
    assert layout == "chw", "probe expects the planar production path"
    fused_meta, fused_arrays = model._fused_setup(
        plan, (BH, BW), B, src_hw, out_hws)
    skip = fused_meta[:2] if fused_meta else ()
    pallas_plans, pallas_args = model._pallas_setup(
        plan, (BH, BW), B, src_hw, out_hws, specs, skip=skip)
    if fused_arrays is not None:
        pallas_args["fused"] = fused_arrays
    raw = model.get_raw_step(plan, specs, pallas_plans, layout, fused_meta)
    wm_args = model.prepare_wm_args(plan)
    dev = jax.devices()[0]
    dummy = np.zeros((B, 2), dtype=np.int32)
    hws = tuple(jax.device_put(np.asarray(out_hws.get(i, dummy), np.int32),
                               dev) for i in range(len(plan.ops)))
    src_hw_d = jax.device_put(src_hw, dev)

    def body(_i, img):
        outs = raw(img, src_hw_d, hws, wm_args, pallas_args)
        # chain every output into the carry so nothing dead-codes
        dep = outs[0].reshape(-1)[0]
        for o in outs[1:]:
            dep = dep ^ o.reshape(-1)[0]
        return img.at[0, 0, 0, 0].set(img[0, 0, 0, 0] ^ dep)

    lp = jax.jit(lambda c, k: jax.lax.fori_loop(0, k, body, c))
    img_d = jax.device_put(imgs, dev)
    np.asarray(lp(img_d, 2).reshape(-1)[0])

    def t(k):
        t0 = time.monotonic()
        np.asarray(lp(img_d, k).reshape(-1)[0])
        return time.monotonic() - t0

    t(4)
    kb = 16
    tb = t(kb)
    while tb < 1.5 and kb < 4096:
        kb *= 4
        tb = t(kb)
    ts = t(4)
    tb = t(kb)
    per = (tb - ts) / (kb - 4)
    print(f"{name:28s}: {per * 1000:.3f} ms/batch  "
          f"({B / per:8.1f} img/s)  k_big={kb}", flush=True)
    return per


a = time_plan("A thumb+resize+watermark", ["thumb", "resize", "wm"])
b = time_plan("B thumb+resize", ["thumb", "resize"])
c = time_plan("C watermark only", ["wm"])
print(f"A-B (watermark inside step): {(a - b) * 1000:.3f} ms; "
      f"C alone: {c * 1000:.3f} ms")


def time_plan_carry_wm():
    """A with the PRODUCTION aliasing: the watermark output is the loop
    carry (bench.py's harness), so XLA aliases it onto the input and the
    full-frame 'copy' collapses to an in-place tile blend."""
    plan = normalize_operations([OPS["thumb"], OPS["resize"], OPS["wm"]])
    model = PipelineModel()
    out_hws = {}
    for i, op in enumerate(plan.ops):
        if op.type is OperationType.RESIZE:
            w, h = keep_aspect_dims(SRC_W, SRC_H, op.width, op.height)
            out_hws[i] = np.tile(np.asarray([[h, w]], np.int32), (B, 1))
    specs = plan_output_specs(plan, (BH, BW))
    fused_meta, fused_arrays = model._fused_setup(
        plan, (BH, BW), B, src_hw, out_hws)
    skip = fused_meta[:2] if fused_meta else ()
    pallas_plans, pallas_args = model._pallas_setup(
        plan, (BH, BW), B, src_hw, out_hws, specs, skip=skip)
    if fused_arrays is not None:
        pallas_args["fused"] = fused_arrays
    raw = model.get_raw_step(plan, specs, pallas_plans, "chw", fused_meta)
    wm_args = model.prepare_wm_args(plan)
    dev = jax.devices()[0]
    dummy = np.zeros((B, 2), dtype=np.int32)
    hws = tuple(jax.device_put(np.asarray(out_hws.get(i, dummy), np.int32),
                               dev) for i in range(len(plan.ops)))
    src_hw_d = jax.device_put(src_hw, dev)

    def body(_i, img):
        outs = raw(img, src_hw_d, hws, wm_args, pallas_args)
        wm = outs[2]
        dep = (outs[0][:, :, :1, :1] ^ outs[1][:, :, :1, :1])
        return jax.lax.dynamic_update_slice(
            wm, wm[:, :, :1, :1] ^ dep, (0, 0, 0, 0))

    lp = jax.jit(lambda c, k: jax.lax.fori_loop(0, k, body, c))
    img_d = jax.device_put(imgs, dev)
    np.asarray(lp(img_d, 2).reshape(-1)[0])

    def t(k):
        t0 = time.monotonic()
        np.asarray(lp(img_d, k).reshape(-1)[0])
        return time.monotonic() - t0

    t(4)
    kb = 16
    tb = t(kb)
    while tb < 1.5 and kb < 4096:
        kb *= 4
        tb = t(kb)
    ts = t(4)
    tb = t(kb)
    per = (tb - ts) / (kb - 4)
    print(f"{'A2 wm output as carry (alias)':28s}: {per * 1000:.3f} "
          f"ms/batch  ({B / per:8.1f} img/s)  k_big={kb}", flush=True)


time_plan_carry_wm()
