"""Measure the splice-path host costs at 12 MP (PERF.md whole-system
model inputs; VERDICT r4 #2).

Stages timed per image on ONE core, default watermark params (text
"© ImageProcessor", size 36, bottom-right, opacity 0.5 — domain/task.py
defaults, reference task.go:55-59):

  scan_plain     — scan_jpeg_coefficients (device-JPEG decode input)
  scan_splice    — scan_jpeg_for_transcode (+ per-MCU offset recording)
  band_edit      — splice.watermark_band (float64 IDCT/blend/FDCT)
  splice_emit    — nativecodec.emit_jpeg_transcode (copy + resym band)
  full_emit      — emit_jpeg_from_coefficients (whole-image re-encode,
                   the term splice replaces)
  splice_total   — watermark_splice (band_edit + splice_emit)

Run: python tools/splicebench.py [--mp 12] [--reps 5]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imageprocessor_tpu.runtime import nativecodec as nc  # noqa: E402
from imageprocessor_tpu.runtime import splice  # noqa: E402


def _photo(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (128 + 80 * np.sin(x / 37.0) + 60 * np.cos(y / 23.0))[..., None]
    return (base + rng.normal(0, 12, (h, w, 3))).clip(0, 255).astype(np.uint8)


def _time(fn, reps: int, setup=None) -> float:
    """min-of-reps ms; setup (e.g. restoring pristine planes) runs
    OUTSIDE the timed window so 36 MB of plane copies don't pollute the
    per-stage numbers."""
    best = float("inf")
    for _ in range(reps):
        if setup is not None:
            setup()
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


DEFAULT_OP = SimpleNamespace(text="© ImageProcessor", opacity=0.5,
                             position="bottom-right", font_size=36.0,
                             font_color="")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mp", type=float, default=12.0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--quality", type=int, default=85)
    args = ap.parse_args()

    w = int(round((args.mp * 1e6 * 4 / 3) ** 0.5 / 16) * 16)
    h = int(round(w * 3 / 4 / 16) * 16)
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(_photo(h, w)).save(buf, "JPEG", quality=args.quality)
    blob = buf.getvalue()

    out = {"w": w, "h": h, "mp": round(w * h / 1e6, 2),
           "jpeg_bytes": len(blob), "quality": args.quality}

    out["scan_plain_ms"] = round(
        _time(lambda: nc.scan_jpeg_coefficients(blob), args.reps), 2)
    out["scan_splice_ms"] = round(
        _time(lambda: nc.scan_jpeg_for_transcode(blob), args.reps), 2)

    ctx = nc.scan_jpeg_for_transcode(blob)
    planes0 = [p.copy() for p in ctx.planes]

    def _reset():
        ctx.planes = [p.copy() for p in planes0]
        ctx.edited = False

    splice.watermark_band(ctx, DEFAULT_OP)  # warm the raster cache
    out["band_edit_ms"] = round(
        _time(lambda: splice.watermark_band(ctx, DEFAULT_OP),
              args.reps, setup=_reset), 2)

    _reset()
    flags = splice.watermark_band(ctx, DEFAULT_OP)
    out["band_mcus"] = int(flags.sum())
    out["total_mcus"] = int(ctx.nmcus)
    out["splice_emit_ms"] = round(
        _time(lambda: nc.emit_jpeg_transcode(ctx, flags), args.reps), 2)
    out["splice_total_ms"] = round(
        _time(lambda: splice.watermark_splice(ctx, DEFAULT_OP),
              args.reps, setup=_reset), 2)

    qt = ctx.qtabs
    out["full_emit_ms"] = round(
        _time(lambda: nc.emit_jpeg_from_coefficients(
            list(ctx.planes), qt, w, h,
            (ctx.sampling[0][0], ctx.sampling[0][1])), args.reps), 2)
    out["emit_speedup_vs_full"] = round(
        out["full_emit_ms"] / max(out["splice_emit_ms"], 1e-9), 1)
    out["splice_scan_overhead_pct"] = round(
        100.0 * (out["scan_splice_ms"] / max(out["scan_plain_ms"], 1e-9)
                 - 1.0), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
