"""Stage-selectable composed device-JPEG step probe.

Times the same decode -> fused pipeline -> encode chain bench.py's
bench_device_jpeg_step measures, but lets you include/exclude stages to
attribute the composed cost (the standalone kernel probes and the
composed bench have disagreed before — this measures both in ONE
harness):

    python tools/composedprobe.py --stages d,p,e   # full composed step
    python tools/composedprobe.py --stages d       # decode only
    python tools/composedprobe.py --stages e       # encode only
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dims", default="3000x4000")
    ap.add_argument("--stages", default="d,p,e",
                    help="comma set from d (decode), p (pipeline), "
                         "e (encode)")
    ap.add_argument("--k", type=int, default=256)
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.models.pipeline import (
        PipelineModel,
        plan_output_specs,
    )
    from imageprocessor_tpu.models.plan import normalize_operations
    from imageprocessor_tpu.ops import pallas_jpeg as pjk
    from imageprocessor_tpu.ops.coords import keep_aspect_dims
    from imageprocessor_tpu.ops.jpeg_encode import quality_qtables
    from imageprocessor_tpu.runtime import nativecodec as nc
    from imageprocessor_tpu.runtime.batcher import bucket_for
    from imageprocessor_tpu.runtime.codecs import encode_image

    src_h, src_w = map(int, args.dims.split("x"))
    batch = args.batch
    bucket_h, bucket_w = bucket_for(src_h, src_w)
    print(f"platform={jax.devices()[0].platform} bucket={bucket_h}x"
          f"{bucket_w} valid={src_h}x{src_w} batch={batch} "
          f"stages={sorted(stages)} transform={pjk.TRANSFORM_MODE} "
          f"encode={pjk.ENCODE_TRANSFORM_MODE}")

    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 200, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 1024, "height": 768,
                         "keep_aspect": True}),
        OperationParams(OperationType.WATERMARK,
                        {"text": "© ImageProcessor"}),
    ])
    model = PipelineModel()
    assert model.supports_planar(plan, (bucket_h, bucket_w))

    rng = np.random.default_rng(5)
    src_hw_np = np.tile(np.asarray([[src_h, src_w]], np.int32), (batch, 1))
    yc = np.zeros((batch, bucket_h, bucket_w), dtype=np.int16)
    cbc = np.zeros((batch, bucket_h // 2, bucket_w // 2), dtype=np.int16)
    crc = np.zeros((batch, bucket_h // 2, bucket_w // 2), dtype=np.int16)
    qt = np.zeros((batch, 3, 8, 8), dtype=np.float32)
    cv = np.ones((batch, 2), dtype=np.int32)
    img = rng.integers(0, 256, size=(src_h, src_w, 3), dtype=np.uint8)
    jpeg = encode_image(img, "jpeg", 85)
    planes, qtabs, _dims, _samp = nc.scan_jpeg_coefficients(jpeg)
    for i in range(batch):
        y, cb, cr = planes
        yc[i, :y.shape[0], :y.shape[1]] = y
        cbc[i, :cb.shape[0], :cb.shape[1]] = cb
        crc[i, :cr.shape[0], :cr.shape[1]] = cr
        qt[i] = np.asarray(qtabs, dtype=np.float32)
        cv[i] = cb.shape

    out_w, out_h = keep_aspect_dims(src_w, src_h, 1024, 768)
    out_hws = {1: np.tile(np.asarray([[out_h, out_w]], np.int32),
                          (batch, 1))}
    specs = plan_output_specs(plan, (bucket_h, bucket_w))
    fused_meta, fused_arrays = model._fused_setup(
        plan, (bucket_h, bucket_w), batch, src_hw_np, out_hws)
    skip = fused_meta[:2] if fused_meta else ()
    pallas_plans, pallas_args = model._pallas_setup(
        plan, (bucket_h, bucket_w), batch, src_hw_np, out_hws, specs,
        skip=skip)
    if fused_arrays is not None:
        pallas_args["fused"] = fused_arrays
    raw_step = model.get_raw_step(plan, specs, pallas_plans, "chw",
                                  fused_meta)
    wm_args = model.prepare_wm_args(plan)
    dummy = np.zeros((batch, 2), dtype=np.int32)

    dev = jax.devices()[0]
    src_hw_dev = jax.device_put(src_hw_np, dev)
    hws = tuple(jax.device_put(np.asarray(out_hws.get(i, dummy),
                                          dtype=np.int32), dev)
                for i in range(len(plan.ops)))
    cbc_dev = jax.device_put(cbc, dev)
    crc_dev = jax.device_put(crc, dev)
    eqt_np = np.asarray(quality_qtables(85), dtype=np.float32)

    dplan = pjk.make_plan(batch, bucket_h, bucket_w)
    dargs = pjk.make_args(dplan, qt, cv)
    eplan = pjk.make_encode_plan(batch, bucket_h, bucket_w)
    eargs = pjk.make_encode_args(eplan, eqt_np, src_hw_np)

    # a pixel canvas for when decode is excluded
    pix0 = jax.device_put(
        rng.integers(0, 256, size=(batch, 3, bucket_h, bucket_w),
                     dtype=np.uint8), dev)

    def body(_i, carry):
        # pix0 rides the carry (decode-excluded runs): a closure-captured
        # 300 MB canvas gets serialized into the remote-compile upload
        # (HTTP 413 on the dev tunnel), a carry does not.
        ycoef, pcan = carry
        dep0 = ycoef[0, 0, 0]
        if "d" in stages:
            pix = pjk.decode_420(ycoef, cbc_dev, crc_dev, dplan, dargs)
        else:
            pix = pcan ^ dep0.astype(jnp.uint8)[None, None, None, None]
        if "p" in stages:
            outs = raw_step(pix, src_hw_dev, hws, wm_args, pallas_args)
            wm = outs[2]
            dep0 = dep0 ^ (outs[0].reshape(-1)[0].astype(jnp.int16)
                           ^ outs[1].reshape(-1)[0].astype(jnp.int16))
        else:
            wm = pix
        if "e" in stages:
            ey, _ecb, _ecr = pjk.encode_420(wm, eplan, eargs)
            dep0 = dep0 ^ ey.reshape(-1)[0]
        else:
            dep0 = dep0 ^ wm.reshape(-1)[0].astype(jnp.int16)
        return ycoef.at[0, 0, 0].set(dep0), pcan

    def looped(y0, p0, k):
        return jax.lax.fori_loop(0, k, body, (y0, p0))[0]

    loop_j = jax.jit(looped)
    yc_dev = jax.device_put(yc, dev)
    t0 = time.monotonic()
    np.asarray(loop_j(yc_dev, pix0, jnp.int32(2)).reshape(-1)[0])
    print(f"  warmup: {time.monotonic() - t0:.1f}s")

    def _timed(k: int) -> float:
        t0 = time.monotonic()
        np.asarray(loop_j(yc_dev, pix0, jnp.int32(k)).reshape(-1)[0])
        return time.monotonic() - t0

    k_small, k_big = max(2, args.k // 16), args.k
    _timed(k_small)  # throwaway
    t_small, t_big = _timed(k_small), _timed(k_big)
    ms = (t_big - t_small) / (k_big - k_small) * 1000.0
    print(f"  slope: {ms:.2f} ms/batch ({batch / (ms / 1000.0):.0f} "
          f"img/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
