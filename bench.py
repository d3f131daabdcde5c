#!/usr/bin/env python
"""Benchmark: 12 MP images/sec/chip through the fused pipeline.

Measures the production path on whatever accelerator is live:
  uint8 12 MP batch H2D -> fused program (thumbnail 200 crop +
  resize 1024x768 keep-aspect + watermark blend) -> D2H of all outputs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N, ...}

value        = the COMPOSED on-chip decode->pipeline->encode step rate
               (coefficients -> IDCT/upsample/color -> thumbnail/resize/
               watermark -> FDCT/quantize), i.e. the metric BASELINE.md's
               20k-img/s target actually prices. Falls back to the fused
               ops-only rate (with the metric string saying so) only when
               the composed step cannot run (smoke mode / no native
               scanner / non-TPU geometry).
vs_baseline  = value / 2500 (north star 20k img/s on 8 chips => 2500/chip,
               BASELINE.md).
fused_pipeline_images_per_sec = the ops-only fused step (thumbnail +
               resize + watermark, HBM-resident pixels) — the r1-r3
               headline, now a secondary key.
Extra keys report the host-codec rates measured on this machine and the
end-to-end rate they imply — this bench host exposes a single CPU core,
so the deployment-sized host codec pool is reported, not assumed.

Usage: python bench.py [--smoke] [--batch B] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_T0 = time.monotonic()


def _progress(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def make_inputs(batch: int, src_h: int, src_w: int, bucket_h: int,
                bucket_w: int):
    rng = np.random.default_rng(0)
    # Photographic-ish content: smooth gradients + mild noise (compressible,
    # but the device path cost is content-independent).
    yy = np.linspace(0, 200, src_h, dtype=np.float32)[:, None, None]
    xx = np.linspace(0, 55, src_w, dtype=np.float32)[None, :, None]
    base = (yy + xx).astype(np.float32)
    imgs = np.zeros((batch, bucket_h, bucket_w, 3), dtype=np.uint8)
    for i in range(batch):
        noise = rng.integers(0, 24, size=(src_h, src_w, 3), dtype=np.uint8)
        imgs[i, :src_h, :src_w] = np.clip(base + noise, 0, 255).astype(np.uint8)
    src_hw = np.tile(np.asarray([[src_h, src_w]], np.int32), (batch, 1))
    return imgs, src_hw



def _slope_per_batch_s(timed) -> tuple[float, int]:
    """Chained-dependency slope timing shared by both device benches:
    calibrate the chain so device work dwarfs RPC jitter (~0.1 s), then
    average two (big - small) / (k_big - k_small) slopes. `timed(k)`
    runs a k-iteration chain and returns wall seconds. Returns
    (seconds per iteration, k_big used)."""
    k_small = 4
    timed(k_small)
    k_big = 16
    tb = timed(k_big)
    while tb < 1.5 and k_big < 1024:
        k_big *= 4
        tb = timed(k_big)
    slopes = []
    for _ in range(2):
        ts = timed(k_small)
        tb = timed(k_big)
        slopes.append(max((tb - ts) / (k_big - k_small), 1e-9))
    return sum(slopes) / len(slopes), k_big


def bench_device_pipeline(batch: int, iters: int, src_hw_px=(3000, 4000),
                          resize_to=(768, 1024), thumb=200):
    """Time the PRODUCTION fused step (PipelineModel: Pallas resample +
    XLA watermark with input donation) on the live accelerator."""
    import jax

    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.models.pipeline import PipelineModel, plan_output_specs
    from imageprocessor_tpu.models.plan import normalize_operations
    from imageprocessor_tpu.ops.coords import keep_aspect_dims
    from imageprocessor_tpu.runtime.batcher import bucket_for

    src_h, src_w = src_hw_px
    bucket_h, bucket_w = bucket_for(src_h, src_w)
    imgs_np, src_hw_np = make_inputs(batch, src_h, src_w, bucket_h, bucket_w)

    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": thumb, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": resize_to[1], "height": resize_to[0],
                         "keep_aspect": True}),
        OperationParams(OperationType.WATERMARK,
                        {"text": "© ImageProcessor"}),
    ])
    out_w, out_h = keep_aspect_dims(src_w, src_h, resize_to[1], resize_to[0])
    out_hw_np = np.tile(np.asarray([[out_h, out_w]], np.int32), (batch, 1))
    out_hws = {1: out_hw_np}
    specs = plan_output_specs(plan, (bucket_h, bucket_w))

    _progress("building model/plans")
    model = PipelineModel()
    layout = ("chw" if model.supports_planar(plan, (bucket_h, bucket_w))
              else "hwc")
    if layout == "chw":
        imgs_np = np.ascontiguousarray(np.transpose(imgs_np, (0, 3, 1, 2)))
    fused_meta, fused_arrays = (None, None)
    if layout == "chw":
        fused_meta, fused_arrays = model._fused_setup(
            plan, (bucket_h, bucket_w), batch, src_hw_np.astype(np.int32),
            out_hws)
    skip = fused_meta[:2] if fused_meta else ()
    pallas_plans, pallas_args = model._pallas_setup(
        plan, (bucket_h, bucket_w), batch, src_hw_np.astype(np.int32),
        out_hws, specs, skip=skip)
    if fused_arrays is not None:
        pallas_args["fused"] = fused_arrays
    raw_step = model.get_raw_step(plan, specs, pallas_plans, layout,
                                  fused_meta)
    wm_args = model.prepare_wm_args(plan)
    dummy = np.zeros((batch, 2), dtype=np.int32)

    dev = jax.devices()[0]
    src_hw_dev = jax.device_put(src_hw_np.astype(np.int32), dev)
    hws = tuple(jax.device_put(np.asarray(out_hws.get(i, dummy),
                                          dtype=np.int32), dev)
                for i in range(len(plan.ops)))

    # On-device K-iteration loop: ONE dispatch runs the fused step K times
    # (the watermark output chains into the next iteration; a tiny XOR
    # dependence on the other outputs stops XLA from dead-coding them).
    # Slope between two K values cancels dispatch + fetch constants — the
    # tunnel's per-RPC latency/jitter (tens of ms) never enters the
    # per-batch estimate.
    def looped(img0, k):
        def body(_i, img):
            outs = raw_step(img, src_hw_dev, hws, wm_args, pallas_args)
            wm = outs[2]
            dep = (outs[0][:, :1, :1, :1] ^ outs[1][:, :1, :1, :1])
            return jax.lax.dynamic_update_slice(
                wm, wm[:, :1, :1, :1] ^ dep, (0, 0, 0, 0))
        # k is traced: one compile serves every chain length.
        return jax.lax.fori_loop(0, k, body, img0)

    loop_j = jax.jit(looped)

    # Warmup: compile, first run, and both transfer directions — the
    # tunneled dev TPU lazily initializes a slow D2H path (~85 s) that
    # must not land inside a timed region.
    _progress("warmup: compile + first run + D2H init")
    t_compile0 = time.monotonic()
    imgs_dev = jax.device_put(imgs_np, dev)
    np.asarray(loop_j(imgs_dev, 2).reshape(-1)[0])
    compile_s = time.monotonic() - t_compile0

    _progress(f"warmup done (compile_s={compile_s:.1f})")
    # Transfer bandwidth probe (steady-state)
    probe = np.zeros((4 << 20,), dtype=np.uint8)
    t0 = time.monotonic()
    probe_dev = jax.device_put(probe, dev)
    probe_dev.block_until_ready()
    h2d_mbps = 4.0 / max(time.monotonic() - t0, 1e-9)
    t0 = time.monotonic()
    np.asarray(probe_dev)
    d2h_mbps = 4.0 / max(time.monotonic() - t0, 1e-9)

    def _timed(k: int) -> float:
        t0 = time.monotonic()
        np.asarray(loop_j(imgs_dev, k).reshape(-1)[0])
        return time.monotonic() - t0

    _progress("calibrating chain length")
    per_batch_s, k_big = _slope_per_batch_s(_timed)
    _progress(f"measured (k_big={k_big})")
    device_rate = batch / per_batch_s
    slope_rate = device_rate

    # Streaming rate through the dev tunnel: fresh H2D per batch plus D2H
    # of the small artifacts (thumbnail + resize); the full-res watermark
    # stays device-side (production DMAs it to the encode pool; fetching
    # it here would only measure the tunnel).
    _progress("streaming measurement")
    prog = model.get_program(plan, (bucket_h, bucket_w), batch, specs,
                             pallas_plans, layout, fused_meta)
    t2 = time.monotonic()
    for _ in range(max(iters // 2, 2)):
        src = jax.device_put(imgs_np, dev)
        outs = prog(src, src_hw_dev, hws, wm_args, pallas_args)
        np.asarray(outs[0])
        np.asarray(outs[1])
    stream_s = time.monotonic() - t2
    stream_rate = batch * max(iters // 2, 2) / stream_s

    return {
        "device_step_images_per_sec": device_rate,
        "device_step_images_per_sec_slope": slope_rate,
        "tunnel_stream_images_per_sec": stream_rate,
        "tunnel_h2d_mbps": h2d_mbps,
        "tunnel_d2h_mbps": d2h_mbps,
        "compile_s": compile_s,
        "batch": batch,
        "bucket": [bucket_h, bucket_w],
        "pallas": ("fused" if fused_meta else bool(pallas_plans)),
        "layout": layout,
        "platform": dev.platform,
        "device": str(dev),
    }


def bench_device_jpeg_step(batch: int, src_hw_px=(3000, 4000),
                           resize_to=(768, 1024), thumb=200,
                           splice_mode: bool = False):
    """Time the device-JPEG production step, batch-chained on device
    with the fori_loop slope harness.

    splice_mode=False (the pre-round-5 / IMAGEPROCESSOR_JPEG_SPLICE=0
    path, and the path splice-ineligible uploads still take): batched
    coefficient decode (IDCT + fancy upsample + color convert) -> fused
    thumbnail+resize+watermark -> batched 4:2:0 encode front half.

    splice_mode=True (the SHIPPED DEFAULT since round 5): the engine
    excludes the splice-served watermark op from the compiled program
    (runtime/engine.py splice_skip), so the device runs coefficient
    decode -> fused thumbnail+resize only; the watermark rendition is
    produced on host by the splice transcode (host_splice_* keys)."""
    import jax
    import jax.numpy as jnp

    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.models.pipeline import PipelineModel, plan_output_specs
    from imageprocessor_tpu.models.plan import normalize_operations
    from imageprocessor_tpu.ops.coords import keep_aspect_dims
    from imageprocessor_tpu.ops.jpeg_decode import batched_decode_ycbcr
    from imageprocessor_tpu.ops.jpeg_encode import (
        batched_encode_420,
        quality_qtables,
    )
    from imageprocessor_tpu.runtime import nativecodec as nc
    from imageprocessor_tpu.runtime.batcher import bucket_for
    from imageprocessor_tpu.runtime.codecs import encode_image

    src_h, src_w = src_hw_px
    bucket_h, bucket_w = bucket_for(src_h, src_w)
    if bucket_h % 16 or bucket_w % 16 or not nc.available():
        return None
    ops = [
        OperationParams(OperationType.THUMBNAIL,
                        {"size": thumb, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": resize_to[1], "height": resize_to[0],
                         "keep_aspect": True}),
    ]
    if not splice_mode:
        ops.append(OperationParams(OperationType.WATERMARK,
                                   {"text": "© ImageProcessor"}))
    plan = normalize_operations(ops)
    model = PipelineModel()
    if not model.supports_planar(plan, (bucket_h, bucket_w)):
        return None  # device-JPEG serving needs the planar Pallas path

    _progress("device-jpeg step: scanning input coefficients")
    imgs_np, src_hw_np = make_inputs(batch, src_h, src_w, src_h, src_w)
    yc = np.zeros((batch, bucket_h, bucket_w), dtype=np.int16)
    cbc = np.zeros((batch, bucket_h // 2, bucket_w // 2), dtype=np.int16)
    crc = np.zeros((batch, bucket_h // 2, bucket_w // 2), dtype=np.int16)
    qt = np.zeros((batch, 3, 8, 8), dtype=np.float32)
    cv = np.ones((batch, 2), dtype=np.int32)
    for i in range(batch):
        jpeg = encode_image(imgs_np[i], "jpeg", 85)
        planes, qtabs, _dims, _samp = nc.scan_jpeg_coefficients(jpeg)
        y, cb, cr = planes
        yc[i, :y.shape[0], :y.shape[1]] = y
        cbc[i, :cb.shape[0], :cb.shape[1]] = cb
        crc[i, :cr.shape[0], :cr.shape[1]] = cr
        qt[i] = np.asarray(qtabs, dtype=np.float32)
        cv[i] = cb.shape

    out_w, out_h = keep_aspect_dims(src_w, src_h, resize_to[1], resize_to[0])
    out_hw_np = np.tile(np.asarray([[out_h, out_w]], np.int32), (batch, 1))
    out_hws = {1: out_hw_np}
    specs = plan_output_specs(plan, (bucket_h, bucket_w))
    fused_meta, fused_arrays = model._fused_setup(
        plan, (bucket_h, bucket_w), batch, src_hw_np.astype(np.int32),
        out_hws)
    skip = fused_meta[:2] if fused_meta else ()
    pallas_plans, pallas_args = model._pallas_setup(
        plan, (bucket_h, bucket_w), batch, src_hw_np.astype(np.int32),
        out_hws, specs, skip=skip)
    if fused_arrays is not None:
        pallas_args["fused"] = fused_arrays
    raw_step = model.get_raw_step(plan, specs, pallas_plans, "chw",
                                  fused_meta)
    wm_args = model.prepare_wm_args(plan)
    dummy = np.zeros((batch, 2), dtype=np.int32)

    dev = jax.devices()[0]
    src_hw_dev = jax.device_put(src_hw_np.astype(np.int32), dev)
    hws = tuple(jax.device_put(np.asarray(out_hws.get(i, dummy),
                                          dtype=np.int32), dev)
                for i in range(len(plan.ops)))
    cbc_dev = jax.device_put(cbc, dev)
    crc_dev = jax.device_put(crc, dev)
    qt_dev = jax.device_put(qt, dev)
    cv_dev = jax.device_put(cv, dev)
    eqt_np = np.asarray(quality_qtables(85), dtype=np.float32)
    eqt = jax.device_put(eqt_np, dev)

    # mirror the engine dispatch: eligible geometry takes the fused
    # Pallas codec kernels (the production default), else the XLA
    # programs (engine.py _decode_coefs/_encode_coefs)
    use_pjk = (model.use_pallas and bucket_h % 16 == 0
               and bucket_w % 128 == 0 and bucket_w >= 256)
    if use_pjk:
        from imageprocessor_tpu.ops import pallas_jpeg as pjk
        dplan = pjk.make_plan(batch, bucket_h, bucket_w)
        dargs = pjk.make_args(dplan, qt, cv)
        eplan = pjk.make_encode_plan(batch, bucket_h, bucket_w)
        eargs = pjk.make_encode_args(eplan, eqt_np,
                                     src_hw_np.astype(np.int32))

    def body(_i, ycoef):
        if use_pjk:
            pix = pjk.decode_420(ycoef, cbc_dev, crc_dev, dplan, dargs)
        else:
            pix = batched_decode_ycbcr(ycoef, cbc_dev, crc_dev, qt_dev,
                                       cv_dev, fh=2, fw=2)
        outs = raw_step(pix, src_hw_dev, hws, wm_args, pallas_args)
        if splice_mode:
            # splice default: no watermark op on device, no encode half
            dep = (outs[0].reshape(-1)[0].astype(jnp.int16)
                   ^ outs[1].reshape(-1)[0].astype(jnp.int16))
            return ycoef.at[0, 0, 0].set(ycoef[0, 0, 0] ^ dep)
        if use_pjk:
            ey, _ecb, _ecr = pjk.encode_420(outs[2], eplan, eargs)
        else:
            ey, _ecb, _ecr = batched_encode_420(outs[2], src_hw_dev, eqt)
        dep = (outs[0].reshape(-1)[0].astype(jnp.int16)
               ^ outs[1].reshape(-1)[0].astype(jnp.int16)
               ^ ey.reshape(-1)[0].astype(jnp.int16))
        return ycoef.at[0, 0, 0].set(ycoef[0, 0, 0] ^ dep)

    def looped(y0, k):
        return jax.lax.fori_loop(0, k, body, y0)

    loop_j = jax.jit(looped)
    _progress("device-jpeg step: warmup compile")
    yc_dev = jax.device_put(yc, dev)
    np.asarray(loop_j(yc_dev, 2).reshape(-1)[0])

    def _timed(k: int) -> float:
        t0 = time.monotonic()
        np.asarray(loop_j(yc_dev, k).reshape(-1)[0])
        return time.monotonic() - t0

    per_batch_s, k_big = _slope_per_batch_s(_timed)
    _progress(f"device-jpeg step: measured (k_big={k_big}, "
              f"splice_mode={splice_mode})")
    key = ("device_splice_step_images_per_sec" if splice_mode
           else "device_jpeg_step_images_per_sec")
    return {key: batch / per_batch_s, "batch": batch}


def bench_host_codecs(src_hw_px=(3000, 4000), n: int = 4):
    """Single-core host codec rates (cv2/libjpeg-turbo)."""
    from imageprocessor_tpu.runtime.codecs import decode_image, encode_image

    src_h, src_w = src_hw_px
    imgs, _ = make_inputs(1, src_h, src_w, src_h, src_w)
    arr = imgs[0]
    jpeg = encode_image(arr, "jpeg", 85)

    def _best(fn, reps: int = n) -> float:
        """min-of-reps seconds: on TPU runs the tunnel's background RPC
        threads steal slices of the single host core, so a mean would
        measure the contention, not the codec."""
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        return best

    dec_s = _best(lambda: decode_image(jpeg))
    enc_s = _best(lambda: encode_image(arr, "jpeg", 85))

    out = {"host_decode_images_per_sec_per_core": 1.0 / dec_s,
           "host_encode_images_per_sec_per_core": 1.0 / enc_s,
           "jpeg_bytes_12mp": len(jpeg)}
    # PNG-heavy workload row (VERDICT r3 #6): rate + size at the active
    # IMAGEPROCESSOR_PNG_COMPRESSION level (default 6 = Go png.Encode
    # parity; level 1 trades size for host throughput).
    from imageprocessor_tpu.runtime.codecs import PNG_COMPRESSION
    png = encode_image(arr, "png")
    png_s = _best(lambda: encode_image(arr, "png"), max(n // 2, 1))
    out["host_png_encode_images_per_sec_per_core"] = round(1.0 / png_s, 2)
    out["png_bytes"] = len(png)
    out["png_compression_level"] = PNG_COMPRESSION
    # Host halves of the TPU-side JPEG codec (entropy-only passes):
    # streaming scan (decode side) and Annex K emit (encode side).
    try:
        from imageprocessor_tpu.runtime import nativecodec as nc
        planes, qt, dims, samp = nc.scan_jpeg_coefficients(jpeg)
        scan_s = _best(lambda: nc.scan_jpeg_coefficients(jpeg))
        out["host_entropy_scan_images_per_sec_per_core"] = round(
            1.0 / scan_s, 2)
        nc.emit_jpeg_from_coefficients(planes, qt, dims[0], dims[1],
                                       samp[0])
        emit_s = _best(lambda: nc.emit_jpeg_from_coefficients(
            planes, qt, dims[0], dims[1], samp[0]))
        out["host_entropy_emit_images_per_sec_per_core"] = round(
            1.0 / emit_s, 2)
    except Exception:  # pragma: no cover — native lib unavailable
        pass
    # Splice-path host stages (the shipped watermark default since
    # round 5; VERDICT r4 #2 bench keys): offset-recording scan, band
    # edit (float64 IDCT+blend+FDCT), splice emit. host_splice_total_ms
    # replaces the full-image emit term in the whole-system model.
    try:
        from types import SimpleNamespace

        from imageprocessor_tpu.runtime import splice

        op = SimpleNamespace(text="© ImageProcessor", opacity=0.5,
                             position="bottom-right", font_size=36.0,
                             font_color="")
        # min-of-reps: on TPU runs the tunnel's background RPC threads
        # steal slices of the single host core; the floor is the honest
        # per-stage cost (matches tools/splicebench.py's convention).
        ctx = nc.scan_jpeg_for_transcode(jpeg)
        scan_s = float("inf")
        for _ in range(n):
            t0 = time.monotonic()
            nc.scan_jpeg_for_transcode(jpeg)
            scan_s = min(scan_s, time.monotonic() - t0)
        out["host_splice_scan_ms"] = round(scan_s * 1000.0, 2)
        planes0 = [p.copy() for p in ctx.planes]
        splice.watermark_band(ctx, op)  # warm the raster cache
        edit_s = float("inf")
        for _ in range(n):
            ctx.planes = [p.copy() for p in planes0]  # outside the window
            ctx.edited = False
            t0 = time.monotonic()
            flags = splice.watermark_band(ctx, op)
            edit_s = min(edit_s, time.monotonic() - t0)
        out["host_splice_edit_ms"] = round(edit_s * 1000.0, 2)
        emit_s = float("inf")
        for _ in range(n):
            t0 = time.monotonic()
            nc.emit_jpeg_transcode(ctx, flags)
            emit_s = min(emit_s, time.monotonic() - t0)
        out["host_splice_emit_ms"] = round(emit_s * 1000.0, 2)
        out["host_splice_total_ms"] = round(
            out["host_splice_scan_ms"] + out["host_splice_edit_ms"]
            + out["host_splice_emit_ms"], 2)
        emit_ips = out.get("host_entropy_emit_images_per_sec_per_core")
        if emit_ips:
            out["splice_emit_speedup_vs_full"] = round(
                (1000.0 / emit_ips)
                / max(out["host_splice_edit_ms"]
                      + out["host_splice_emit_ms"], 1e-9), 1)
    except Exception:  # pragma: no cover — splice scan unavailable
        pass
    # Lossless coefficient-domain rot90 (late round 5, runtime/coeftx):
    # the transform stage alone — scan/emit costs are already keyed
    # above; the pixel-path comparison lives in PERF.md.
    try:
        from imageprocessor_tpu.domain import OperationType
        from imageprocessor_tpu.models.plan import NormalizedOp
        from imageprocessor_tpu.runtime import coeftx, splice as _sp

        planes, qt, dims, samp = nc.scan_jpeg_coefficients(jpeg)
        ctx = _sp.coef_context(planes, qt, dims, samp)
        rot = NormalizedOp(type=OperationType.ROTATE, angle=90.0)
        prims = coeftx.eligible_prims(rot, ctx.size, ctx.sampling)
        if prims is not None:
            coeftx.apply(ctx, prims)  # warm
            tx_s = _best(lambda: coeftx.apply(ctx, prims))
            out["host_coeftx_rot90_ms"] = round(tx_s * 1000.0, 2)
    except Exception:  # pragma: no cover — coeftx unavailable
        pass
    return out


def bench_latency(n_images: int = 60, size=(480, 640), big_every: int = 10,
                  deadline_ms: float = 25.0, arrival_per_sec: float = 200.0):
    """p99 queue-to-processed latency through the real worker stack.

    Stands up the full in-process stack (usecase -> broker -> batch worker
    -> engine on the live accelerator) and measures produce-to-result
    latency from the results topic, mixing in a 12 MP image every
    `big_every` uploads. Run with --latency.
    """
    import tempfile
    import threading

    from imageprocessor_tpu.broker.memory import MemoryBroker
    from imageprocessor_tpu.config import load as load_config
    from imageprocessor_tpu.domain import (
        OperationParams,
        OperationType,
        ProcessingResult,
    )
    from imageprocessor_tpu.runtime.codecs import encode_image
    from imageprocessor_tpu.service.usecase import ImageUsecase
    from imageprocessor_tpu.service.worker import Worker
    from imageprocessor_tpu.storage import (
        LocalFSObjectStore,
        SQLiteMetadataStore,
    )

    tmp = tempfile.mkdtemp(prefix="ipbench-")
    cfg = load_config({})
    cfg.worker.batch_size = 16
    cfg.worker.batch_deadline_ms = deadline_ms
    meta = SQLiteMetadataStore(":memory:")
    store = LocalFSObjectStore(f"{tmp}/objects")
    broker = MemoryBroker()
    uc = ImageUsecase(meta, store, broker)
    worker = Worker(cfg, meta=meta, store=store, broker=broker)
    worker._idle_sleep = 0.002

    ops = [OperationParams(OperationType.THUMBNAIL,
                           {"size": 200, "crop_to_fit": True}),
           OperationParams(OperationType.RESIZE,
                           {"width": 1024, "height": 768,
                            "keep_aspect": True})]

    h, w = size
    imgs, _ = make_inputs(1, h, w, h, w)
    small_jpeg = encode_image(imgs[0], "jpeg", 85)
    big, _ = make_inputs(1, 3000, 4000, 3000, 4000)
    big_jpeg = encode_image(big[0], "jpeg", 85)

    # Warmup must cover every (bucket, quantized-batch-size) program the
    # load phase can hit — each cold compile through the dev tunnel costs
    # tens of seconds and would otherwise land inside the timed window.
    _progress("latency warmup: compiling bucket x batch-size programs")
    warm_sets = [(small_jpeg, (16, 8, 4, 2, 1))]
    if big_every > 0:
        warm_sets.append((big_jpeg, (4, 2, 1)))
    for data, copies in warm_sets:
        for n in copies:
            for i in range(n):
                uc.upload_image(data, f"warm{n}-{i}.jpg", "image/jpeg", ops)
            while worker.run_once(max_n=n) > 0:
                pass
    while worker.run_once() > 0:  # drain stragglers
        pass
    broker.poll("image-processed", "bench-warm", max_n=1000)
    _progress("latency warmup done")

    # Stage decomposition starts clean: only the timed window's
    # queue-wait/decode/device/encode observations enter the report.
    from imageprocessor_tpu.utils.metrics import METRICS
    METRICS.reset()

    t_start: dict[str, float] = {}
    t_done: dict[str, float] = {}
    stop = threading.Event()

    def timed_done() -> int:
        # list() snapshots atomically under the GIL: the results thread
        # inserts concurrently, and iterating the live dict raises
        # "dictionary changed size during iteration".
        return sum(1 for k in list(t_done) if k in t_start)

    def consume_results():
        # Record EVERY result's first completion time (setdefault): the
        # worker can finish an upload before the main thread's
        # t_start insert runs, and the old `in t_start` filter acked
        # such results away — that sample then never completed and the
        # run stalled to the full deadline. Scoring filters to timed
        # ids, so stray warmup redeliveries are harmless.
        while not stop.is_set() and timed_done() < n_images:
            for msg in broker.poll("image-processed", "bench", max_n=32):
                res = ProcessingResult.from_json(msg.value)
                t_done.setdefault(res.image_id, time.monotonic())
                broker.ack(msg)
            time.sleep(0.001)

    worker_t = threading.Thread(target=worker.run, daemon=True)
    results_t = threading.Thread(target=consume_results, daemon=True)
    worker_t.start()
    results_t.start()

    is_big: dict[str, bool] = {}
    for i in range(n_images):
        big_one = big_every > 0 and (i + 1) % big_every == 0
        data = big_jpeg if big_one else small_jpeg
        img = uc.upload_image(data, f"l{i}.jpg", "image/jpeg", ops)
        t_start[img.id] = time.monotonic()
        is_big[img.id] = big_one
        time.sleep(1.0 / arrival_per_sec)

    deadline = time.monotonic() + 300
    while timed_done() < n_images and time.monotonic() < deadline:
        time.sleep(0.01)
    worker.stop()
    stop.set()
    results_t.join(timeout=5)   # quiesce before scoring iterates t_done

    lat = sorted(max(0.0, (t_done[k] - t_start[k]) * 1000.0)
                 for k in t_done if k in t_start)
    small_lat = sorted(max(0.0, (t_done[k] - t_start[k]) * 1000.0)
                       for k in t_done if k in t_start and not is_big[k])
    if not lat:
        raise RuntimeError("no latencies measured")
    snap = METRICS.snapshot()["timings"]
    # counts kept: observations per stage give the batch count, hence
    # the mean batch size (n / worker_batch count) — the contention
    # sweep (tools/latproj_r05.py) needs it.
    stages = {name: {k: round(v, 1) for k, v in t.items()}
              for name, t in snap.items()
              if name in ("queue_wait_ms", "engine_decode_ms",
                          "engine_device_ms", "engine_encode_ms",
                          "worker_batch_ms")}

    pct = lambda p: lat[min(int(len(lat) * p), len(lat) - 1)]  # noqa: E731
    spct = (lambda p: small_lat[min(int(len(small_lat) * p),
                                    len(small_lat) - 1)]) if small_lat \
        else (lambda p: 0.0)
    return {
        "metric": "p99 queue-to-processed latency",
        "value": round(pct(0.99), 1),
        "unit": "ms",
        "vs_baseline": round(500.0 / max(pct(0.99), 1e-3), 4),
        "p50_ms": round(pct(0.50), 1),
        "p90_ms": round(pct(0.90), 1),
        "p99_ms": round(pct(0.99), 1),
        "max_ms": round(lat[-1], 1),
        "small_p50_ms": round(spct(0.50), 1),
        "small_p99_ms": round(spct(0.99), 1),
        "n": len(lat),
        "stages_ms": stages,
        "note": ("full stack: upload -> queue -> batch worker -> device "
                 "engine -> storage -> results topic; vs_baseline = "
                 "500ms target / p99 (>1 beats target). On the dev "
                 "environment H2D runs through a ~35 MB/s tunnel, which "
                 "dominates the queue-to-processed path; production "
                 "PCIe/DMA moves the same batch in milliseconds."),
    }


def quick_psnr_check():
    """Fidelity gate: batched device output vs float64 oracle."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests"))
    from oracle import psnr, resize_go  # noqa: PLC0415

    from imageprocessor_tpu.ops.resize import batched_resize_bilinear

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(600, 800, 3), dtype=np.uint8)
    batch = np.zeros((1, 640, 1024, 3), dtype=np.uint8)
    batch[0, :600, :800] = img
    out = np.asarray(batched_resize_bilinear(
        batch, np.asarray([[600, 800]], np.int32),
        np.asarray([[300, 400]], np.int32), out_h=300, out_w=400))
    return float(psnr(out[0], resize_go(img, 400, 300)))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true",
                        help="tiny shapes, fast verification run")
    parser.add_argument("--latency", action="store_true",
                        help="p99 queue-to-processed through the full stack")
    parser.add_argument("--lat-arrival", type=float, default=200.0,
                        help="latency run: uploads/sec arrival rate "
                             "(above the host's capacity this measures "
                             "queue growth, not service latency)")
    parser.add_argument("--lat-big-every", type=int, default=10,
                        help="latency run: every Nth upload is 12 MP "
                             "(0 disables)")
    parser.add_argument("--lat-n", type=int, default=60,
                        help="latency run: number of uploads")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--iters", type=int, default=None)
    args = parser.parse_args()

    # Honor DEVICE_PLATFORM like the service entrypoints (config.py
    # apply_device_platform): DEVICE_PLATFORM=cpu runs the same stack
    # without the dev tunnel's 30-200 ms per-RPC latency, which is the
    # honest way to measure the ARCHITECTURE's latency on this host.
    from imageprocessor_tpu import config as _config
    _config.apply_device_platform(_config.load())

    if args.latency:
        print(json.dumps(bench_latency(
            n_images=args.lat_n, big_every=args.lat_big_every,
            arrival_per_sec=args.lat_arrival)))
        return 0

    if args.smoke:
        dev = bench_device_pipeline(batch=args.batch or 2,
                                    iters=args.iters or 2,
                                    src_hw_px=(480, 640),
                                    resize_to=(96, 128), thumb=64)
        codecs = bench_host_codecs(src_hw_px=(480, 640), n=2)
        djpeg = spl_step = None
    else:
        dev = bench_device_pipeline(batch=args.batch or 8,
                                    iters=args.iters or 6)
        codecs = bench_host_codecs()
        from imageprocessor_tpu.runtime import splice as _splice
        spl_step = None
        if _splice.enabled():
            try:  # the shipped default path's device program
                spl_step = bench_device_jpeg_step(batch=args.batch or 8,
                                                  splice_mode=True)
            except Exception as exc:
                _progress(f"device splice step bench skipped: {exc}")
        try:
            djpeg = bench_device_jpeg_step(batch=args.batch or 8)
        except Exception as exc:  # never fail the whole bench for it
            _progress(f"device-jpeg step bench skipped: {exc}")
            djpeg = None

    psnr_db = quick_psnr_check()

    fused_rate = dev["device_step_images_per_sec"]
    # End-to-end on THIS host, on the DEFAULT serving path. With the
    # native scanner present and a TPU backend, device_jpeg is on by
    # default (engine auto policy): the host keeps only the entropy scan
    # + emit, the dense codec halves run on-chip inside the step.
    dec = codecs["host_decode_images_per_sec_per_core"]
    enc = codecs["host_encode_images_per_sec_per_core"]
    scan = codecs.get("host_entropy_scan_images_per_sec_per_core")
    emit = codecs.get("host_entropy_emit_images_per_sec_per_core")
    e2e_host_codec = 1.0 / (1.0 / dec + 1.0 / enc
                            + 1.0 / max(fused_rate, 1e-9))
    from imageprocessor_tpu.runtime.engine import (
        DEVICE_JPEG_CORE_THRESHOLD,
        usable_cores,
    )
    ncores = usable_cores()
    spl_scan_ms = codecs.get("host_splice_scan_ms")
    spl_edit_ms = codecs.get("host_splice_edit_ms")
    spl_emit_ms = codecs.get("host_splice_emit_ms")
    spl_work_ms = (spl_edit_ms or 0) + (spl_emit_ms or 0)
    # all three stage keys required: a partial splice-bench failure
    # (e.g. raster unavailable after the scan was timed) must not
    # select this path with the edit/emit cost silently priced at 0
    if (spl_step and spl_scan_ms and spl_edit_ms and spl_emit_ms
            and ncores < DEVICE_JPEG_CORE_THRESHOLD):
        # Shipped default: device decode+thumb+resize, watermark by
        # host splice (offset scan + band edit + splice emit), small
        # outputs host-encoded.
        dj_rate = spl_step["device_splice_step_images_per_sec"]
        host_ms = spl_scan_ms + spl_work_ms
        e2e_one_core = 1.0 / (host_ms / 1000.0 + 1.0 / max(dj_rate, 1e-9))
        e2e_path = "device_jpeg_splice"
    elif (djpeg and scan and emit
            and ncores < DEVICE_JPEG_CORE_THRESHOLD):
        # Splice-off / ineligible-stream path: full-res emit on host.
        dj_rate = djpeg["device_jpeg_step_images_per_sec"]
        e2e_one_core = 1.0 / (1.0 / scan + 1.0 / emit
                              + 1.0 / max(dj_rate, 1e-9))
        e2e_path = "device_jpeg"
    else:
        e2e_one_core = e2e_host_codec
        e2e_path = "host_codec"

    # Headline = the composed on-chip step of the SHIPPED DEFAULT path.
    # Since round 5 that is the splice configuration: coefficient
    # decode -> fused thumbnail+resize on device; the watermark
    # rendition is produced by the host splice transcode (host_splice_*
    # keys) and the full decode→resize→watermark→encode box the
    # baseline prices is the min of chip and host sides (PERF.md
    # whole-system model). The splice-off composed step (device encode
    # front half included) stays as device_jpeg_step_images_per_sec —
    # it is the path splice-ineligible uploads (~19%, PERF.md corpus
    # measurement) still take. Fallback order when steps cannot run:
    # splice step > splice-off step > fused ops-only, each with the
    # metric string renamed so a fallback cannot be misread.
    if spl_step:
        value = spl_step["device_splice_step_images_per_sec"]
        metric = ("12MP images/sec/chip (decode→thumbnail+resize on "
                  "device; watermark by host splice transcode — "
                  "shipped default); PSNR vs Go reference")
    elif djpeg:
        value = djpeg["device_jpeg_step_images_per_sec"]
        metric = ("12MP images/sec/chip (decode→resize→watermark"
                  "→encode); PSNR vs Go reference")
    else:
        value = fused_rate
        metric = ("12MP images/sec/chip (fused resize+watermark "
                  "ops only — composed codec step unavailable on "
                  "this run); PSNR vs Go reference")
    out = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "images/sec",
        "vs_baseline": round(value / 2500.0, 4),
        "psnr_db_vs_oracle": min(round(psnr_db, 2), 99.99),
        "fused_pipeline_images_per_sec": round(fused_rate, 2),
        "device_step_images_per_sec_slope": round(
            dev["device_step_images_per_sec_slope"], 2),
        "pallas": dev["pallas"],
        "layout": dev["layout"],
        "tunnel_stream_images_per_sec": round(
            dev["tunnel_stream_images_per_sec"], 2),
        "tunnel_h2d_mbps": round(dev["tunnel_h2d_mbps"], 1),
        "tunnel_d2h_mbps": round(dev["tunnel_d2h_mbps"], 1),
        "end_to_end_one_host_core_images_per_sec": round(e2e_one_core, 2),
        "end_to_end_path": e2e_path,
        "end_to_end_one_host_core_host_codec_images_per_sec": round(
            e2e_host_codec, 2),
        **({"device_splice_step_images_per_sec": round(
            spl_step["device_splice_step_images_per_sec"], 2)}
           if spl_step else {}),
        **({"device_jpeg_step_images_per_sec": round(
            djpeg["device_jpeg_step_images_per_sec"], 2)} if djpeg else {}),
        "host_decode_images_per_sec_per_core": round(dec, 2),
        "host_encode_images_per_sec_per_core": round(enc, 2),
        # Host halves of the TPU-side JPEG codec (see PERF.md): the
        # streaming entropy scan beats a full SIMD decode, the Annex K
        # emit beats a full SIMD encode 1.6x. host_splice_* are the
        # shipped watermark default's host stages (offset scan + band
        # edit + splice emit — replaces the full-image emit term).
        **{k: codecs[k] for k in
           ("host_entropy_scan_images_per_sec_per_core",
            "host_entropy_emit_images_per_sec_per_core",
            "host_splice_scan_ms", "host_splice_edit_ms",
            "host_splice_emit_ms", "host_splice_total_ms",
            "splice_emit_speedup_vs_full",
            "host_png_encode_images_per_sec_per_core",
            "png_bytes", "png_compression_level") if k in codecs},
        "compile_s": round(dev["compile_s"], 2),
        "batch": dev["batch"],
        "bucket": dev["bucket"],
        "platform": dev["platform"],
        "note": (("value = COMPOSED on-chip step of the SHIPPED DEFAULT "
                  "(splice-on) path: coefficient decode "
                  "(IDCT+upsample+color) -> thumbnail+resize, "
                  "batch-chained on device; the watermark rendition is "
                  "emitted on host by the splice transcode "
                  "(host_splice_* keys; PERF.md whole-system model). "
                  "device_jpeg_step_images_per_sec is the splice-off/"
                  "ineligible-stream composed step incl. the device "
                  "encode front half. " if spl_step else
                  "value = COMPOSED on-chip step: coefficient decode "
                  "(IDCT+upsample+color) -> thumbnail+resize+watermark "
                  "-> encode front half (FDCT+quantize), batch-chained "
                  "on device. Host entropy scan/emit run on CPU cores "
                  "(see host_entropy_* keys and PERF.md's whole-system "
                  "model). " if djpeg else
                  "value = fused ops-only rate; the composed codec step "
                  "could not run here. ")
                 + "This dev environment reaches the chip through a "
                 "~15 MB/s tunnel (see tunnel_* keys), so "
                 "transfer-inclusive rates measure the tunnel, not the "
                 "chip; production PCIe/DMA overlaps transfers with "
                 "compute. Host codec rates are per single CPU core."),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
