"""Encode-precision fidelity probe (VERDICT r3 experiment 2a).

Judges the encode FDCT precision ladder against the metric that
actually gates JPEG encode quality — decoded PSNR vs the source,
compared to a libjpeg encode at the same quality — instead of the f32
oracle's <=1-quant-step contract. Runs the Pallas encode kernel under
the IMAGEPROCESSOR_ENCODE_PRECISION currently in the environment, so
drive it per mode:

    for m in bf16x3 bf16x2 default; do
        IMAGEPROCESSOR_ENCODE_PRECISION=$m python tools/eprecprobe.py
    done

Reports, per mode:
  - psnr_vs_source of decode(libjpeg, our JPEG)
  - the same for a pure libjpeg q85 encode (the acceptance bar)
  - file size delta vs libjpeg
  - coefficient deltas vs the HIGHEST XLA oracle (max step, frac > 1)

Reference scope: the reference encodes via Go image/jpeg at q85
(internal/usecase/processor/operations/resize.go:78-91); two q85
encoders normally sit 40-44 dB apart, so the bar here is equality of
PSNR-vs-source, not stream identity.
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")


def psnr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    return 99.99 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def main() -> int:
    # honor DEVICE_PLATFORM=cpu (the axon plugin force-appends itself
    # to jax_platforms, so the env var alone is not enough)
    from imageprocessor_tpu import config as _config
    _config.apply_device_platform(_config.load())

    from imageprocessor_tpu.ops import pallas_jpeg as pjk
    from imageprocessor_tpu.ops.jpeg_encode import quality_qtables
    from imageprocessor_tpu.runtime import nativecodec as nc
    from imageprocessor_tpu.runtime.codecs import decode_image, encode_image

    import jax

    mode = pjk.ENCODE_TRANSFORM_MODE
    src_h, src_w = 3000, 4000
    interpret = jax.devices()[0].platform == "cpu"
    print(f"mode={mode} platform={jax.devices()[0].platform} "
          f"interpret={interpret}")

    # photographic-ish content (same recipe as bench.make_inputs) plus
    # uniform noise — the quantizer-absorption claim must hold on noisy
    # content where coefficients are dense.
    rng = np.random.default_rng(0)
    yy = np.linspace(0, 200, src_h, dtype=np.float32)[:, None, None]
    xx = np.linspace(0, 55, src_w, dtype=np.float32)[None, :, None]
    img = np.clip(yy + xx + rng.integers(0, 24, (src_h, src_w, 3)),
                  0, 255).astype(np.uint8)

    # libjpeg acceptance bar
    lib_jpeg = encode_image(img, "jpeg", 85)
    lib_rt = decode_image(lib_jpeg)[0]
    lib_psnr = psnr(lib_rt, img)

    # device encode front half (Pallas kernel at `mode`) + native emit,
    # on the production bucket geometry (W%128 kernel eligibility)
    from imageprocessor_tpu.runtime.batcher import bucket_for
    bh, bw = bucket_for(src_h, src_w)
    rgb = np.zeros((1, 3, bh, bw), np.uint8)
    rgb[0, :, :src_h, :src_w] = img.transpose(2, 0, 1)
    vh = np.asarray([[src_h, src_w]], np.int32)
    qt = np.asarray(quality_qtables(85), np.float32)
    eplan = pjk.make_encode_plan(1, bh, bw)
    eargs = pjk.make_encode_args(eplan, qt, vh)
    ey, ecb, ecr = (np.asarray(x) for x in pjk.encode_420(
        rgb, eplan, eargs, interpret=interpret))

    # oracle deltas (HIGHEST XLA program)
    os.environ["IMAGEPROCESSOR_ENCODE_PRECISION"] = mode  # document only
    from imageprocessor_tpu.ops.jpeg_encode import batched_encode_420
    oy, ocb, ocr = (np.asarray(x)
                    for x in batched_encode_420(rgb, vh, qt))
    deltas = {}
    for name, a, b, div in (("y", ey, oy, 1), ("cb", ecb, ocb, 2),
                            ("cr", ecr, ocr, 2)):
        gh, gw = bh // div, bw // div
        d = np.abs(a[0, :gh, :gw].astype(int) - b[0, :gh, :gw].astype(int))
        deltas[name] = (int(d.max()), float((d > 1).mean()))
    print(f"  coef deltas vs HIGHEST oracle (max, frac>1): {deltas}")

    # slice each image's MCU grid out of the bucket canvas (the engine
    # emits the same strided views; the emitter takes row strides)
    gh, gw = -(-src_h // 16) * 16, -(-src_w // 16) * 16
    out = nc.emit_jpeg_from_coefficients(
        (ey[0][:gh, :gw], ecb[0][:gh // 2, :gw // 2],
         ecr[0][:gh // 2, :gw // 2]),
        np.stack([qt[0], qt[1], qt[1]]).astype(np.uint16),
        src_w, src_h, (2, 2))
    ours_rt = decode_image(out)[0]
    ours_psnr = psnr(ours_rt, img)

    print(f"  libjpeg q85:  psnr_vs_source={lib_psnr:.3f} dB, "
          f"{len(lib_jpeg)} bytes")
    print(f"  device {mode}: psnr_vs_source={ours_psnr:.3f} dB, "
          f"{len(out)} bytes ({100.0 * len(out) / len(lib_jpeg):.1f}% "
          f"of libjpeg)")
    print(f"  delta vs bar: {ours_psnr - lib_psnr:+.3f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
