"""Fused Pallas JPEG coefficient-decode probe across subsampling modes.

Compile-checks and slope-times ops/pallas_jpeg.decode_420 (the fused
single-sweep kernel) at production geometry for each (fh, fw) mode, and
verifies it against the XLA decode program ON DEVICE (max-abs-diff is
reduced on chip — full canvases never cross the dev tunnel).

    python tools/jcodecprobe.py [--batch 8] [--canvas 3072x4096] \
        [--dims 3000x4000] [--modes 22,12,21,11] [--k 64] [--cpu]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_case(b, H, W, h, w, fh, fw, seed=7):
    """Random coefficient canvases built ON DEVICE (the dev tunnel moves
    ~37 MB/s; production-size canvases would take tens of minutes to
    H2D). Only the small qt/cv arrays live on host."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    mh, mw = 8 * fh, 8 * fw
    qt = (np.abs(rng.normal(6, 2, (b, 3, 8, 8))) + 1).astype(np.float32)
    cv = np.tile(np.asarray(
        [[-(-h // mh) * 8, -(-w // mw) * 8]], np.int32), (b, 1))
    gh, gw = -(-h // mh) * mh, -(-w // mw) * mw

    @jax.jit
    def gen(key):
        k1, k2, k3 = jax.random.split(key, 3)

        def msk(x, vh, vw):
            r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
            return jnp.where((r < vh) & (c < vw), x, 0)

        yc = msk(jax.random.randint(k1, (b, H, W), -512, 512,
                                    jnp.int16), gh, gw)
        cbc = msk(jax.random.randint(k2, (b, H // fh, W // fw), -256, 256,
                                     jnp.int16), gh // fh, gw // fw)
        crc = msk(jax.random.randint(k3, (b, H // fh, W // fw), -256, 256,
                                     jnp.int16), gh // fh, gw // fw)
        return yc, cbc, crc

    yc, cbc, crc = gen(jax.random.PRNGKey(seed))
    return yc, cbc, crc, qt, cv


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--canvas", default="3072x4096")
    ap.add_argument("--dims", default="3000x4000")
    ap.add_argument("--modes", default="22,12,21,11")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="keep timing even if the fidelity gate fails "
                         "(for pass-count/what-if speed experiments)")
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from imageprocessor_tpu.ops import pallas_jpeg as pj
    from imageprocessor_tpu.ops.jpeg_decode import batched_decode_ycbcr

    H, W = map(int, args.canvas.split("x"))
    h, w = map(int, args.dims.split("x"))
    b = args.batch
    dev = jax.devices()[0]
    print(f"platform={dev.platform} canvas={H}x{W} valid={h}x{w} batch={b}")
    interp = bool(args.cpu)

    for mode in args.modes.split(","):
        fh, fw = int(mode[0]), int(mode[1])
        yc, cbc, crc, qt, cv = build_case(b, H, W, h, w, fh, fw)
        plan = pj.make_plan(b, H, W, fh, fw)
        dargs = pj.make_args(plan, qt, cv)
        print(f"[{fh}x{fw}] band={plan.band_rows} win={plan.win_rows} "
              f"chroma={plan.hc}x{plan.wc}")

        # warm the lru-cached constant bases OUTSIDE any trace (the
        # engine does the same implicitly by running eagerly first)
        pj._bases(plan.band_rows, plan.win_rows)

        yc_d, cbc_d, crc_d = yc, cbc, crc   # already device-resident
        # the kernel consumes tile-padded chroma canvases (wc -> wcp);
        # pad once on device, keep the unpadded ones for the XLA ref
        cbp_d, crp_d = jax.jit(
            lambda a, c: pj.pad_chroma(plan, a, c))(cbc_d, crc_d)

        # every non-trivial array is a jit PARAMETER, not a closure
        # constant: closed-over numpy gets baked into the HLO as
        # literals, and the serialized module can exceed the dev
        # tunnel's remote-compile upload limit (HTTP 413 at 4:4:4
        # geometry). Only the small static bases stay closures.
        call = pj._build_call(plan, interp)
        bases = pj._bases(plan.band_rows, plan.win_rows)
        argv = tuple(jax.device_put(jnp.asarray(v), dev) for v in (
            dargs.win_starts, dargs.qty, dargs.qtcb, dargs.qtcr,
            dargs.vrows0, dargs.vrows1, dargs.hcols0, dargs.hcols1))
        qt_d = jax.device_put(jnp.asarray(qt), dev)
        cv_d = jax.device_put(jnp.asarray(cv), dev)

        @functools.partial(jax.jit, static_argnums=(12, 13))
        def maxdiff(yc_, cbc_, crc_, cbp_, crp_, ws, qy, qcb, qcr,
                    v0, v1, hx, _fh, _fw, qt_, cv_):
            h0, h1 = hx
            out = call(ws, yc_, cbp_, crp_, *bases, qy, qcb, qcr,
                       v0, v1, h0, h1)
            ref = batched_decode_ycbcr(yc_, cbc_, crc_, qt_, cv_,
                                       fh=_fh, fw=_fw)
            d = (out[:, :, :h, :w].astype(jnp.int32)
                 - ref[:, :, :h, :w].astype(jnp.int32))
            return jnp.max(jnp.abs(d))

        t0 = time.monotonic()
        md = int(np.asarray(maxdiff(
            yc_d, cbc_d, crc_d, cbp_d, crp_d, argv[0], argv[1], argv[2],
            argv[3], argv[4], argv[5], (argv[6], argv[7]), fh, fw,
            qt_d, cv_d)))
        print(f"  compile+check: {time.monotonic() - t0:.1f}s "
              f"max|kernel-xla|={md} {'OK' if md <= 1 else 'FAIL'}")
        if md > 1 and not args.force:
            return 1

        def looped(y, cb, cr, ws, qy, qcb, qcr, v0, v1, h0, h1, k):
            def body(i, s):
                out = call(ws, s, cb, cr, *bases, qy, qcb, qcr,
                           v0, v1, h0, h1)
                dep = out[:, :1, :1, :1].astype(jnp.int16)
                return jax.lax.dynamic_update_slice(
                    s, s[:, :1, :1] ^ dep[:, 0], (0, 0, 0))
            return jax.lax.fori_loop(0, k, body, y)

        # k is TRACED (fori_loop lowers to while_loop): one compiled
        # program serves every chain length, so the slope subtraction
        # cancels dispatch/RPC only — a static k would put the
        # difference of two multi-second remote compiles into the
        # reported ms/batch
        loop_j = jax.jit(looped)
        np.asarray(loop_j(yc_d, cbp_d, crp_d, *argv, jnp.int32(2))
                   .reshape(-1)[0])                   # warm

        def timed(k):
            t0 = time.monotonic()
            np.asarray(loop_j(yc_d, cbp_d, crp_d, *argv, jnp.int32(k))
                       .reshape(-1)[0])
            return time.monotonic() - t0

        k1 = max(args.k // 8, 2)
        k2 = max(args.k, k1 + 2)
        timed(k1)                                     # throwaway
        t1, t2 = timed(k1), timed(k2)
        per = (t2 - t1) / (k2 - k1) * 1000.0
        print(f"  {per:.2f} ms/batch  ({b / per * 1000.0:.0f} img/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
