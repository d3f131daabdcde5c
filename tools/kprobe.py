"""Isolated fused-kernel probe: times ONLY pallas_fused.fused_resample
at a given geometry with chained-iteration slope timing (the tunnel's
per-RPC latency never enters the estimate). Used for the kernel
optimization ladder in PERF.md.

    python tools/kprobe.py [--batch 8] [--src 3000x4000] \
        [--resize 768x1024] [--thumb 200] [--own N] [--nbuf N] [--psnr]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--src", default="3000x4000")
    ap.add_argument("--resize", default="768x1024")
    ap.add_argument("--thumb", type=int, default=200)
    ap.add_argument("--own", type=int, default=0)
    ap.add_argument("--nbuf", type=int, default=0)
    ap.add_argument("--psnr", action="store_true",
                    help="also verify output vs the float64 oracle")
    ap.add_argument("--cpu", action="store_true",
                    help="interpret mode on CPU (correctness only)")
    args = ap.parse_args()

    import os
    if args.own:
        os.environ["IMAGEPROCESSOR_FUSED_OWN"] = str(args.own)
    if args.nbuf:
        os.environ["IMAGEPROCESSOR_FUSED_NBUF"] = str(args.nbuf)
    if args.cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from imageprocessor_tpu.ops import pallas_fused as pf
    from imageprocessor_tpu.ops.coords import keep_aspect_dims
    from imageprocessor_tpu.runtime.batcher import bucket_for

    src_h, src_w = map(int, args.src.split("x"))
    r_h, r_w = map(int, args.resize.split("x"))
    b = args.batch
    bucket_h, bucket_w = bucket_for(src_h, src_w)
    print(f"bucket={bucket_h}x{bucket_w} batch={b}")

    rng = np.random.default_rng(7)
    imgs = np.zeros((b, 3, bucket_h, bucket_w), dtype=np.uint8)
    imgs[:, :, :src_h, :src_w] = rng.integers(
        0, 256, size=(b, 3, src_h, src_w), dtype=np.uint8)
    src_hw = np.tile(np.asarray([[src_h, src_w]], np.int32), (b, 1))
    out_w, out_h = keep_aspect_dims(src_w, src_h, r_w, r_h)
    r_out_hw = np.tile(np.asarray([[out_h, out_w]], np.int32), (b, 1))

    scale_h = src_h / out_h
    scale_w = src_w / out_w
    side = min(src_h, src_w)
    t_scale = side / args.thumb
    plan = pf.make_fused_plan(
        b, bucket_h, bucket_w, out_h, out_w, args.thumb,
        min_scale_r=min(scale_h, scale_w), max_scale_r=max(scale_h, scale_w),
        min_scale_t=t_scale, max_scale_t=t_scale,
        max_scale_w_r=scale_w, max_scale_w_t=t_scale)
    fargs = pf.make_fused_args(plan, src_hw, r_out_hw)
    assert fargs.ok, "geometry did not fit the static plan"
    m_cat = plan.r_rows + plan.t_rows
    print(f"own={plan.own_rows} band={plan.band_rows} nbuf={plan.nbuf} "
          f"m_r={plan.r_rows} m_t={plan.t_rows} m_cat={m_cat} "
          f"n_bands={plan.n_bands} grid={b * 3 * plan.n_bands}")

    interp = bool(args.cpu)
    if args.psnr or args.cpu:
        sys.path.insert(0, "tests")
        from oracle import psnr, resize_go, thumbnail_go

        rz, th = pf.fused_resample(jnp.asarray(imgs), plan, fargs,
                                   interpret=interp)
        rz = np.transpose(np.asarray(rz)[0, :, :out_h, :out_w], (1, 2, 0))
        th = np.transpose(
            np.asarray(th)[0, :, :args.thumb, :args.thumb], (1, 2, 0))
        hwc = np.transpose(imgs[0, :, :src_h, :src_w], (1, 2, 0))
        p_r = psnr(rz, resize_go(hwc, out_w, out_h))
        p_t = psnr(th, thumbnail_go(hwc, args.thumb, crop_to_fit=True))
        print(f"psnr resize={p_r:.2f} dB thumb={p_t:.2f} dB")
        if args.cpu:
            return 0

    dev = jax.devices()[0]
    print("platform:", dev.platform)

    j_rows0 = jnp.asarray(fargs.rows0)

    def step(img):
        rz, th = pf.fused_resample(img, plan, fargs)
        # fold one output byte back into the source so the loop carries a
        # true data dependency (stops XLA from hoisting/deadcoding)
        dep = (rz[:, :1, :1, :1] ^ th[:, :1, :1, :1]).astype(jnp.uint8)
        return jax.lax.dynamic_update_slice(
            img, img[:, :1, :1, :1] ^ dep, (0, 0, 0, 0))

    def looped(img0, k):
        return jax.lax.fori_loop(0, k, lambda i, im: step(im), img0)

    loop_j = jax.jit(looped)
    imgs_dev = jax.device_put(imgs, dev)
    t0 = time.monotonic()
    np.asarray(loop_j(imgs_dev, 2).reshape(-1)[0])
    print(f"compile+first: {time.monotonic() - t0:.1f}s")

    def timed(k):
        t0 = time.monotonic()
        np.asarray(loop_j(imgs_dev, k).reshape(-1)[0])
        return time.monotonic() - t0

    k_small, k_big = 4, 16
    timed(k_small)
    tb = timed(k_big)
    while tb < 1.5 and k_big < 4096:
        k_big *= 4
        tb = timed(k_big)
    rates = []
    for _ in range(3):
        ts = timed(k_small)
        tb = timed(k_big)
        per_batch = (tb - ts) / (k_big - k_small)
        rates.append(b / per_batch)
    rates = sorted(rates)
    print(f"kernel img/s: {rates[1]:.0f} (runs: "
          + ", ".join(f"{r:.0f}" for r in rates)
          + f"); ms/batch: {1000.0 * b / rates[1]:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
