"""Fused Pallas JPEG encode-front-half probe.

Compile-checks and slope-times ops/pallas_jpeg.encode_420 (planar RGB ->
quantized 4:2:0 coefficient canvases) at production geometry, and
verifies it against the XLA encode program ON DEVICE (max-abs coef diff
reduced on chip — canvases never cross the dev tunnel). Honors
IMAGEPROCESSOR_CODEC_PRECISION, so it doubles as the precision-policy
probe: run with =high and =highest and compare md/ms.

    python tools/jencodeprobe.py [--batch 8] [--canvas 3072x4096] \
        [--dims 3000x4000] [--k 64] [--cpu]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--canvas", default="3072x4096")
    ap.add_argument("--dims", default="3000x4000")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="keep timing even if the fidelity gate "
                         "fails (for speed experiments)")
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from imageprocessor_tpu.ops import pallas_jpeg as pj
    from imageprocessor_tpu.ops.jpeg_encode import (
        batched_encode_420,
        quality_qtables,
    )

    H, W = map(int, args.canvas.split("x"))
    h, w = map(int, args.dims.split("x"))
    b = args.batch
    dev = jax.devices()[0]
    print(f"platform={dev.platform} canvas={H}x{W} valid={h}x{w} batch={b} "
          f"transform={pj.TRANSFORM_MODE}")
    interp = bool(args.cpu)

    qt = quality_qtables(85).astype(np.float32)
    vh = np.tile(np.asarray([[h, w]], np.int32), (b, 1))
    plan = pj.make_encode_plan(b, H, W)
    eargs = pj.make_encode_args(plan, qt, vh)

    # random pixels generated ON DEVICE (tunnel-safe)
    @jax.jit
    def gen(key):
        return jax.random.randint(key, (b, 3, H, W), 0, 256, jnp.uint8)

    rgb = gen(jax.random.PRNGKey(11))

    call = pj._build_encode_call(plan, interp)
    bases = pj._encode_bases(plan.band_rows)
    valid_d = jax.device_put(jnp.asarray(eargs.valid), dev)
    qy_d = jax.device_put(jnp.asarray(eargs.qy), dev)
    qc_d = jax.device_put(jnp.asarray(eargs.qc), dev)
    qt_d = jax.device_put(jnp.asarray(qt), dev)
    vh_d = jax.device_put(jnp.asarray(vh), dev)

    @jax.jit
    def maxdiff(valid, rgb_, qy, qc, qt_, vh_):
        ky, kcb, kcr = call(valid, rgb_, *bases, qy, qc)
        ry, rcb, rcr = batched_encode_420(rgb_, vh_, qt_)
        ds = []
        # compare only blocks someone emits (inside ceil16(valid));
        # the kernel's don't-care clamping differs outside by contract
        gh, gw = -(-h // 16) * 16, -(-w // 16) * 16
        for a, r_, (vh2, vw2) in ((ky, ry, (gh, gw)),
                                  (kcb, rcb, (gh // 2, gw // 2)),
                                  (kcr, rcr, (gh // 2, gw // 2))):
            d = (a[:, :vh2, :vw2].astype(jnp.int32)
                 - r_[:, :vh2, :vw2].astype(jnp.int32))
            ds.append(jnp.max(jnp.abs(d)))
        return jnp.stack(ds)

    t0 = time.monotonic()
    md = np.asarray(maxdiff(valid_d, rgb, qy_d, qc_d, qt_d, vh_d))
    ok = int(md.max()) <= 1
    print(f"  compile+check: {time.monotonic() - t0:.1f}s "
          f"max|kernel-xla| y/cb/cr={md.tolist()} "
          f"{'OK' if ok else 'FAIL'}")
    if not ok and not args.force:
        return 1

    def looped(rgb_, valid, qy, qc, k):
        def body(i, s):
            ky, _kcb, _kcr = call(valid, s, *bases, qy, qc)
            dep = ky[:, :1, :1].astype(jnp.int32).astype(jnp.uint8)
            return jax.lax.dynamic_update_slice(
                s, s[:, :1, :1, :1] ^ dep[:, None], (0, 0, 0, 0))
        return jax.lax.fori_loop(0, k, body, s := rgb_)

    loop_j = jax.jit(looped)
    np.asarray(loop_j(rgb, valid_d, qy_d, qc_d, jnp.int32(2))
               .reshape(-1)[0])                        # warm

    def timed(k):
        t0 = time.monotonic()
        np.asarray(loop_j(rgb, valid_d, qy_d, qc_d, jnp.int32(k))
                   .reshape(-1)[0])
        return time.monotonic() - t0

    k_small, k_big = max(2, args.k // 16), args.k
    t_small, t_big = timed(k_small), timed(k_big)
    ms = (t_big - t_small) / (k_big - k_small) * 1000.0
    rate = b / (ms / 1000.0)
    mp = h * w / 1e6
    print(f"  slope: {ms:.2f} ms/batch ({rate:.0f} img/s at {mp:.1f} MP)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
