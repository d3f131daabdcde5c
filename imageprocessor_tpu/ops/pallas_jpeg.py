"""Pallas fused JPEG coefficient decode — coefficients to pixels in ONE
kernel sweep, covering the four common subsampling modes (4:2:0, 4:2:2,
4:4:0, 4:4:4).

The XLA decode path (ops/jpeg_decode.batched_decode_ycbcr) is
HBM-pass-bound: dequant, two IDCT contractions, chroma clamp/upsample and
color convert each materialize full-canvas intermediates (~26.5 ms per
8x12 MP batch on v5e after the round-3 layout rewrite — PERF.md). This
kernel reads each coefficient band once into VMEM and writes pixels once:

* grid (B, luma-band); the luma coefficient band arrives via an automatic
  BlockSpec; the chroma coefficient windows (band/2 + halo rows for the
  fancy-upsample taps) are manually DMA'd from 8-aligned starts;
* dequantization multiplies by host-tiled (8, W) quant patterns (band
  starts are 8-aligned, so the pattern phase is static);
* both 8-point IDCT contractions are matmuls against small STATIC
  block-diagonal basis matrices (kron(I, D^T) from the left for the
  vertical pass; per-128-column chunks of kron(I, D) from the right for
  the horizontal pass) — layout-preserving, MXU-shaped, no per-block
  gather ever materializes;
* libjpeg's fancy (triangular) chroma upsample runs as one-hot matmuls
  built from HOST-computed per-image tap indices (the
  ops/pallas_resample.py machinery): vertical taps select rows of the
  DMA'd chroma window, horizontal taps select columns of a static
  128-wide window per output chunk. Per-image valid-extent clamping
  (MCU-padded canvases) is folded into the indices, so batches of
  mixed-size images decode exactly like the single-image path. Each
  upsample stage is generated only for the axes the plan's (fh, fw)
  subsampling factors call for — 4:2:2 skips the vertical matmul
  (chroma rows map 1:1 onto luma band rows, halo-free windows), 4:4:0
  skips the horizontal one (direct 128-column slices), 4:4:4 skips
  both — matching ops/jpeg_decode.batched_decode_ycbcr per axis;
* BT.601 color convert + round + u8 store finish in-register (u8 via
  i32 — Mosaic has no direct f32->u8 cast).

Pixels outside an image's valid (h, w) region are unspecified (the
engine's consumers never read them — resample indices and watermark
windows clamp to valid extents), matching the XLA path's contract.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageprocessor_tpu.ops.jpeg_decode import _idct_basis
from imageprocessor_tpu.ops.pallas_resample import _round_up

# Matmul precision for the codec TRANSFORM contractions (IDCT/FDCT).
# On TPU, f32 matmuls decompose into bf16 MXU passes: HIGHEST ~ 6
# passes (full f32), DEFAULT 1 (bf16 inputs — unit roundoff 2^-8
# [7 fraction bits], far too coarse at JPEG coefficient magnitudes,
# where dequantized values reach ~2^18). Mosaic's dot lowering rejects
# Precision.HIGH (the bf16x3 middle tier), so the transforms stay at
# HIGHEST.
#
# The chroma UPSAMPLE contractions are a different regime: their
# weights are one-hot 0.75/0.25 taps (exact in bf16) applied to
# PIXEL-scale values (|x| <~ 255 after the IDCT), where bf16 rounding
# of the operand costs at most half an ulp — 0.5 absolute in the
# [128, 256) binade (ulp = 2^(7-7+1) = 1) — before the color convert —
# measured <= 1 LSB vs the HIGHEST XLA program on-chip (PERF.md), the
# same fidelity contract as the rest of the kernel, for 1 MXU pass
# instead of 6 on ~47% of the kernel's MACs. They default to DEFAULT
# via their own knob (IMAGEPROCESSOR_UPSAMPLE_PRECISION=highest
# restores the old behavior). Exact-select one-hot matmuls (the encode
# boundary extraction) stay at DEFAULT unconditionally — they select
# single exactly-representable u8 values.
_PRECISIONS = {"default": jax.lax.Precision.DEFAULT,
               "highest": jax.lax.Precision.HIGHEST}


def _resolve_choice(env: str, dflt: str, allowed) -> str:
    raw = os.environ.get(env, dflt).strip().lower()
    if raw not in allowed:
        import warnings

        # Unrecognized/typo'd values must fail SAFE: fall back to the
        # highest-fidelity mode, never to a faster-but-coarser one.
        extra = ""
        if raw == "high":
            # removed round-2 value: Mosaic's dot lowering rejects
            # Precision.HIGH, so the middle tier no longer exists.
            extra = (" ('high' was removed: Mosaic rejects "
                     "Precision.HIGH; 'bf16x3' is its replacement)")
        warnings.warn(
            f"{env}={raw!r} is not one of "
            f"{sorted(allowed)}; using 'highest'{extra}", stacklevel=2)
        return "highest"
    return raw


# Transform (IDCT/FDCT) matmul algorithm:
#   bf16x3  — dual-bf16 operand split + 3 single-pass dots (the classic
#             f32-emulation trick): split residual <= 2^-16 relative
#             per operand (two compounded 2^-8 roundings), and the
#             dropped lo*lo term is bounded by the
#             DEQUANT_CLAMP below; measured <= 1 LSB vs the 6-pass
#             HIGHEST XLA oracle on-chip at half the MXU pass count.
#   highest — full f32 (6 bf16 MXU passes), bitwise the round-2 behavior.
#   default — single bf16 pass (NOT pixel-faithful at coefficient
#             magnitudes; for speed-of-light probes only).
TRANSFORM_MODE = _resolve_choice(
    "IMAGEPROCESSOR_CODEC_PRECISION", "bf16x3",
    ("bf16x3", "highest", "default"))
PRECISION = _PRECISIONS["highest" if TRANSFORM_MODE == "highest"
                        else "default"]
UPSAMPLE_PRECISION = _PRECISIONS[_resolve_choice(
    "IMAGEPROCESSOR_UPSAMPLE_PRECISION", "default", _PRECISIONS)]

# ENCODE-side transform mode (FDCT only). The decode IDCT's output IS
# the pixels, so its precision is contract-bound (<=1 LSB vs oracle);
# the encode FDCT's output feeds a QUANTIZER whose step (>=1, typically
# 2-17 at q85) absorbs small transform error — the acceptance metric
# there is decoded-PSNR vs a libjpeg encode at the same quality, not
# the f32 oracle (tools/eprecprobe.py measures both; PERF.md "encode
# precision ladder" records the measurements). Modes:
#   bf16x2  — DEFAULT. 2 single-pass dots: the constant basis rounds
#             to bf16 once (a fixed, sign-mixed ~2^-8 perturbation per
#             tap) and the pixel/intermediate operand keeps its
#             dual-bf16 split. Measured on-chip: decoded PSNR equals
#             libjpeg q85's to 0.001 dB, coefficients within 1 quant
#             step of the f32 oracle, encode kernel 3.95 -> 3.40
#             ms/batch (composed step 1351 -> 1483 img/s/chip). The
#             XLA program mirrors the mode (jpeg_encode.
#             _fdct_basis_and_precision), so kernel<->fallback parity
#             holds: rounding the basis commutes with the kernel's
#             downsample fold (0.5 scaling is exponent-exact).
#   bf16x3  — the decode-grade dual-split (round-3 behavior,
#             <=1 quant step vs the f32 oracle on any input).
#   highest — 6-pass full f32.
#   default — 1 bf16 pass (fastest, 2.79 ms encode; both operands
#             rounded, so the worst-case bound is content-dependent —
#             measured equal-PSNR on photographic content, kept
#             opt-in).
ENCODE_TRANSFORM_MODE = _resolve_choice(
    "IMAGEPROCESSOR_ENCODE_PRECISION", "bf16x2",
    ("bf16x3", "bf16x2", "highest", "default"))

# Dequantized coefficients from PIXEL-SOURCED streams are bounded by
# |FDCT| + q/2 <= 255*8 + 128 = 2168; clamping at +-4096 (1.9x
# headroom) is invisible to real images while bounding the bf16x3
# split's dropped-term error for adversarial synthetic canvases. The
# XLA oracle programs apply the identical clamp (jpeg_decode.py), so
# kernel-vs-oracle parity holds on ANY input.
DEQUANT_CLAMP = 4096.0


def _split_bf16(x):
    """Exact-ish dual-bf16 split: x ~ hi + lo with residual <= 2^-16|x|
    (the hi subtraction is exact in f32 — Sterbenz: hi is within
    2^-8|x| of x, and rounding (x - hi) to bf16 costs another 2^-8
    factor)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _tdot(a, x, dn, *, split_a=None, split_x=None, mode=None,
          basis=None):
    """Transform dot product under a precision mode (default:
    TRANSFORM_MODE).

    bf16x3 computes a_hi@x_hi + a_hi@x_lo + a_lo@x_hi as three
    single-pass bf16 MXU dots with f32 accumulation (the dropped
    a_lo@x_lo term is <= 2^-16|a||x| per product: |a_lo| <= 2^-8|a|
    and |x_lo| <= 2^-8|x|). bf16x2 additionally drops the BASIS
    operand's lo term (`basis` names which of 'a'/'x' is the constant
    transform matrix) — equivalent to applying a once-rounded bf16
    basis to the full-precision data operand; encode-only, see
    ENCODE_TRANSFORM_MODE. Callers that reuse an operand across
    several dots pass its pre-split pair via split_a/split_x to
    amortize the VPU split."""
    mode = TRANSFORM_MODE if mode is None else mode
    dd = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                           preferred_element_type=jnp.float32)
    if mode == "highest":
        return dd(a, x, precision=jax.lax.Precision.HIGHEST)
    if mode == "default":
        return dd(a, x, precision=jax.lax.Precision.DEFAULT)
    ah, al = split_a if split_a is not None else _split_bf16(a)
    xh, xl = split_x if split_x is not None else _split_bf16(x)
    out = dd(ah, xh, precision=jax.lax.Precision.DEFAULT)
    if mode == "bf16x3" or basis != "a":
        out = out + dd(al, xh, precision=jax.lax.Precision.DEFAULT)
    if mode == "bf16x3" or basis == "a":
        out = out + dd(ah, xl, precision=jax.lax.Precision.DEFAULT)
    return out


@dataclass(frozen=True)
class DecodePlan:
    """Static geometry for one compiled decode kernel."""

    batch: int
    h: int              # luma canvas rows (multiple of 16)
    w: int              # luma canvas cols (multiple of 16, of 128 too)
    band_rows: int      # luma rows per grid step (multiple of 16)
    fh: int = 2         # vertical chroma subsample factor (1 or 2)
    fw: int = 2         # horizontal chroma subsample factor (1 or 2)

    @property
    def hc(self) -> int:
        return self.h // self.fh

    @property
    def wc(self) -> int:
        return self.w // self.fw

    @property
    def wcp(self) -> int:
        # chroma canvas width padded to the 128-lane tile: Mosaic
        # rejects memref slices (the manual chroma-window DMA) whose
        # minor dim is not tile-aligned — w=640/384 buckets at fw=2
        # give wc=320/192. Callers zero-pad the coefficient canvases to
        # this width; zero coefficients decode to pixels the upsample
        # taps never select (they clamp to the per-image valid extent).
        return _round_up(self.wc, 128)

    @property
    def n_bands(self) -> int:
        return self.h // self.band_rows

    @property
    def win_rows(self) -> int:
        # chroma coefficient window. fh == 2: band/2 plus one 8-row
        # block of halo on each side (the fancy-upsample taps reach
        # +-1 pixel row, and IDCT needs whole blocks), capped at the
        # whole chroma canvas for small frames. fh == 1: chroma rows
        # map 1:1 onto the luma band — exact window, no halo.
        if self.fh == 1:
            return self.band_rows
        return min(self.band_rows // 2 + 16, self.hc)

    @property
    def n_col_chunks(self) -> int:
        return self.w // 128


@dataclass
class DecodeArgs:
    """Per-batch runtime inputs (host-computed, no recompiles).

    Every per-image array is batch-leading and consumed through a
    blocked BlockSpec (one image's slice in VMEM per grid step), so the
    kernel's VMEM footprint is independent of the batch size — a
    B=32 4:4:4 group carries ~12 MB of quant patterns in HBM but only
    ~400 KB of them in VMEM at a time. Tap arrays for an elided
    upsample axis (fh==1 / fw==1) shrink to minimal dummies."""

    win_starts: np.ndarray   # (B * T,) i32 chroma window row starts
    vrows0: np.ndarray       # (B, T, 1, R) i32 main vertical taps
    vrows1: np.ndarray       # (B, T, 1, R) i32 other vertical taps
    hcols0: np.ndarray       # (B, K, 128) i32 main horizontal taps
    hcols1: np.ndarray       # (B, K, 128) i32
    qty: np.ndarray          # (B, 8, W) f32 tiled luma quant pattern
    qtcb: np.ndarray         # (B, 8, Wc) f32
    qtcr: np.ndarray         # (B, 8, Wc) f32


def make_plan(batch: int, h: int, w: int, fh: int = 2,
              fw: int = 2) -> DecodePlan:
    if h % 16 or w % 16 or w % 128 or w < 256:
        raise ValueError(f"canvas {h}x{w} must be multiples of 16, width "
                         "a multiple of 128 and >= 256 (chroma chunks)")
    if fh not in (1, 2) or fw not in (1, 2):
        raise ValueError(f"subsampling factors {fh}x{fw} not supported")
    band = 128 if w <= 4096 else 64
    if (fh, fw) == (1, 1) and w > 4096:
        # 4:4:4 carries full-size chroma windows (2 x band x w i16);
        # halve the band on wide canvases to stay inside the VMEM
        # budget. (Since the per-image index/quant args became blocked
        # BlockSpecs, the other modes fit at the full band — measured
        # faster on v5e: 4:2:2 at 12 MP 10.3 -> see PERF.md.)
        band //= 2
    while h % band:
        band //= 2
    return DecodePlan(batch=batch, h=h, w=w, band_rows=band, fh=fh, fw=fw)


def make_args(plan: DecodePlan, qtabs: np.ndarray,
              chroma_valid: np.ndarray) -> DecodeArgs:
    """qtabs: (B, 3, 8, 8) f32; chroma_valid: (B, 2) valid chroma dims
    per image (its MCU grid divided by fh/fw per axis — the batcher
    passes the scanned chroma plane's shape) — the upsample tap clamp
    boundary."""
    b, t, r = plan.batch, plan.n_bands, plan.band_rows
    k = plan.n_col_chunks
    hc, wc, rc = plan.hc, plan.wc, plan.win_rows

    qty = np.tile(qtabs[:, 0], (1, 1, plan.w // 8)).astype(np.float32)
    qtcb = np.tile(qtabs[:, 1], (1, 1, plan.wcp // 8)).astype(np.float32)
    qtcr = np.tile(qtabs[:, 2], (1, 1, plan.wcp // 8)).astype(np.float32)

    cv_h = np.maximum(chroma_valid[:, 0].astype(np.int64), 1)
    cv_w = np.maximum(chroma_valid[:, 1].astype(np.int64), 1)

    win_starts = np.zeros((b, t), dtype=np.int32)
    # elided axes get minimal dummy tap arrays (never read by the
    # kernel); vrows carry a unit axis so their (1, R) block keeps the
    # last two dims equal to the array dims (a Mosaic block rule)
    vshape = (b, t, 1, r) if plan.fh == 2 else (b, 1, 1, 8)
    hshape = (b, k, 128) if plan.fw == 2 else (b, 1, 128)
    vrows0 = np.zeros(vshape, dtype=np.int32)
    vrows1 = np.zeros(vshape, dtype=np.int32)
    y_abs = np.arange(r, dtype=np.int64)
    for j in range(t):
        if plan.fh == 1:
            # 1:1 rows: exact window at the band start, taps unused
            win_starts[:, j] = j * r
            continue
        ws = min(max(j * r // 2 - 8, 0), hc - rc)
        win_starts[:, j] = ws
        yy = j * r + y_abs                      # absolute luma rows
        i = yy // 2
        other = np.where(yy % 2 == 0, i - 1, i + 1)
        for im in range(b):
            m = np.clip(i, 0, cv_h[im] - 1) - ws
            o = np.clip(other, 0, cv_h[im] - 1) - ws
            vrows0[im, j, 0] = np.clip(m, 0, rc - 1)
            vrows1[im, j, 0] = np.clip(o, 0, rc - 1)

    hcols0 = np.zeros(hshape, dtype=np.int32)
    hcols1 = np.zeros(hshape, dtype=np.int32)
    x_rel = np.arange(128, dtype=np.int64)
    for c in range(k):
        if plan.fw == 1:
            continue                            # direct slices, taps unused
        ws = min(max(c * 64 - 32, 0), wc - 128)
        xx = c * 128 + x_rel
        j = xx // 2
        other = np.where(xx % 2 == 0, j - 1, j + 1)
        for im in range(b):
            m = np.clip(j, 0, cv_w[im] - 1) - ws
            o = np.clip(other, 0, cv_w[im] - 1) - ws
            hcols0[im, c] = np.clip(m, 0, 127)
            hcols1[im, c] = np.clip(o, 0, 127)

    return DecodeArgs(
        win_starts=win_starts.reshape(-1),
        vrows0=vrows0, vrows1=vrows1,
        hcols0=hcols0, hcols1=hcols1,
        qty=qty, qtcb=qtcb, qtcr=qtcr)


def _kernel(plan: DecodePlan, interpret: bool):
    r = plan.band_rows
    rc = plan.win_rows
    w, wc = plan.w, plan.wc
    t = plan.n_bands
    k = plan.n_col_chunks
    fh, fw = plan.fh, plan.fw
    # static horizontal-upsample window starts per output chunk (fw == 2)
    hws = [min(max(c * 64 - 32, 0), wc - 128) for c in range(k)] \
        if fw == 2 else [c * 128 for c in range(k)]
    aligned = (lambda v, m: v) if interpret else pl.multiple_of

    def kernel(starts_ref,                       # scalar prefetch (B*T,)
               y_ref,                            # VMEM (1, R, W) i16 block
               cb_ref, cr_ref,                   # ANY (B, Hc, Wc) i16
               v8_ref, v8c_ref, h8_ref, h8t_ref,  # VMEM static IDCT bases
               qty_ref, qtcb_ref, qtcr_ref,      # VMEM (1, 8, W/Wc) blocks
               vrows0_ref, vrows1_ref,           # VMEM (1, 1, 1, R) blocks
               hcols0_ref, hcols1_ref,           # VMEM (1, K, 128) blocks
               out_ref,                          # VMEM (1, 3, R, W)
               cbw_ref, crw_ref, sem0, sem1):

        dn = (((1,), (0,)), ((), ()))
        bf3 = TRANSFORM_MODE == "bf16x3"

        def idct_h(x):
            """Horizontal IDCT: (rows, width) @ block-diag(D) in 128-col
            chunks plus an optional 64-col tail (chroma widths are
            multiples of 64, not always 128). The operand is split into
            its dual-bf16 pair ONCE; chunk slices of the split pair
            equal splits of the chunk slices (elementwise ops commute
            with slicing)."""
            xs = _split_bf16(x) if bf3 else None
            h8s = _split_bf16(h8_ref[:]) if bf3 else None
            cols = []
            width = x.shape[1]
            for c in range(width // 128):
                sl = slice(c * 128, (c + 1) * 128)
                cols.append(_tdot(
                    x[:, sl], h8_ref[:], dn,
                    split_a=(xs[0][:, sl], xs[1][:, sl]) if bf3 else None,
                    split_x=h8s))
            if width % 128:
                assert width % 128 == 64, width
                sl = slice(width - 64, None)
                cols.append(_tdot(
                    x[:, sl], h8t_ref[:], dn,
                    split_a=(xs[0][:, sl], xs[1][:, sl]) if bf3 else None))
            return jnp.concatenate(cols, axis=1)

        b = pl.program_id(0)
        tt = pl.program_id(1)

        ws = aligned(starts_ref[b * t + tt], 8)
        cp0 = pltpu.make_async_copy(
            cb_ref.at[b, pl.ds(ws, rc), :], cbw_ref, sem0)
        cp1 = pltpu.make_async_copy(
            cr_ref.at[b, pl.ds(ws, rc), :], crw_ref, sem1)
        cp0.start()
        cp1.start()

        # ---- luma: dequant + clamp + vertical + horizontal IDCT
        # (+128 shift). The clamp bounds bf16x3's dropped split terms;
        # pixel-sourced streams never reach it (see DEQUANT_CLAMP).
        qy = jnp.concatenate([qty_ref[0]] * (r // 8), axis=0)   # (R, W)
        yf = y_ref[0].astype(jnp.int32).astype(jnp.float32) * qy
        yf = jnp.clip(yf, -DEQUANT_CLAMP, DEQUANT_CLAMP)
        yf = _tdot(v8_ref[:], yf, dn)
        yf = idct_h(yf) + 128.0                                  # (R, W)

        cp0.wait()
        cp1.wait()

        # ---- chroma windows: dequant + IDCT (no 128 shift: upsample
        # weights sum to 1, so the shift cancels out of the color math)
        qb = jnp.concatenate([qtcb_ref[0]] * (rc // 8), axis=0)  # (RC, Wc)
        qr = jnp.concatenate([qtcr_ref[0]] * (rc // 8), axis=0)

        def idct_win(win_ref, q):
            x = win_ref[:].astype(jnp.int32).astype(jnp.float32) * q
            x = jnp.clip(x, -DEQUANT_CLAMP, DEQUANT_CLAMP)
            x = _tdot(v8c_ref[:], x, dn)
            x = idct_h(x)                                        # (RC, Wc)
            if fh == 2 or fw == 2:
                # libjpeg range-limits IDCT samples to the u8 range
                # before upsampling (these carry no +128 level, so
                # [-128, 127]); matches the XLA oracle and bounds the
                # UPSAMPLE_PRECISION bf16 operands — half-ulp in the
                # [64, 128) binade is 0.25 per rounding. Worst case
                # through the 1.772*Cb color weight with two compounded
                # roundings is ~1.3 LSB in theory; measured on-chip
                # <= 1 LSB (tools/jcodecprobe), which is the gate that
                # must re-run before changing this math.
                x = jnp.clip(x, -128.0, 127.0)
            return x

        cbp = idct_win(cbw_ref, qb)
        crp = idct_win(crw_ref, qr)

        if fh == 2:
            # ---- vertical fancy upsample: (R, RC) one-hot @ (RC, Wc)
            r0 = vrows0_ref[0, 0]               # (1, R)
            r1 = vrows1_ref[0, 0]
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (rc, r), 0)
            wv = (jnp.where(iota_r == r0, 0.75, 0.0)
                  + jnp.where(iota_r == r1, 0.25, 0.0))          # (RC, R)
            cbv = jax.lax.dot_general(
                wv, cbp, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=UPSAMPLE_PRECISION)    # (R, Wc)
            crv = jax.lax.dot_general(
                wv, crp, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=UPSAMPLE_PRECISION)
        else:
            cbv, crv = cbp, crp                 # rows already 1:1 (R, Wc)

        # ---- horizontal upsample + color convert per 128-col out chunk
        for c in range(k):
            if fw == 2:
                i0 = hcols0_ref[0, c:c + 1]     # (1, 128)
                i1 = hcols1_ref[0, c:c + 1]
                iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                wh = (jnp.where(iota == i0, 0.75, 0.0)
                      + jnp.where(iota == i1, 0.25, 0.0))        # (128, 128)
                cbh = jnp.dot(cbv[:, hws[c]:hws[c] + 128], wh,
                              preferred_element_type=jnp.float32,
                              precision=UPSAMPLE_PRECISION)
                crh = jnp.dot(crv[:, hws[c]:hws[c] + 128], wh,
                              preferred_element_type=jnp.float32,
                              precision=UPSAMPLE_PRECISION)
            else:
                cbh = cbv[:, hws[c]:hws[c] + 128]   # direct (R, 128)
                crh = crv[:, hws[c]:hws[c] + 128]
            yc = yf[:, c * 128:(c + 1) * 128]
            rr = yc + 1.402 * crh
            gg = yc - 0.344136 * cbh - 0.714136 * crh
            bb = yc + 1.772 * cbh
            sl = slice(c * 128, (c + 1) * 128)
            for ch, plane in ((0, rr), (1, gg), (2, bb)):
                q = jnp.clip(jnp.round(plane), 0.0, 255.0)
                out_ref[0, ch, :, sl] = q.astype(jnp.int32).astype(jnp.uint8)

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(plan: DecodePlan, interpret: bool):
    r, w = plan.band_rows, plan.w
    # per-image args are blocked so kernel VMEM stays independent of the
    # batch size (a B=32 4:4:4 group would otherwise pin ~14 MB of
    # whole-batch quant patterns + taps in VMEM and fail Mosaic's
    # budget); elided-axis tap arrays are minimal dummies (make_args)
    vr = r if plan.fh == 2 else 8
    vt = (lambda b, tt, s: (b, tt, 0, 0)) if plan.fh == 2 \
        else (lambda b, tt, s: (b, 0, 0, 0))
    hk = plan.n_col_chunks if plan.fw == 2 else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.batch, plan.n_bands),
        in_specs=[
            pl.BlockSpec((1, r, w), lambda b, tt, s: (b, tt, 0)),  # yc
            pl.BlockSpec(memory_space=pltpu.ANY),                  # cbc
            pl.BlockSpec(memory_space=pltpu.ANY),                  # crc
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # v8
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # v8c
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # h8
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # h8t
            pl.BlockSpec((1, 8, w), lambda b, tt, s: (b, 0, 0)),   # qty
            pl.BlockSpec((1, 8, plan.wcp),
                         lambda b, tt, s: (b, 0, 0)),              # qtcb
            pl.BlockSpec((1, 8, plan.wcp),
                         lambda b, tt, s: (b, 0, 0)),              # qtcr
            pl.BlockSpec((1, 1, 1, vr), vt),                       # vrows0
            pl.BlockSpec((1, 1, 1, vr), vt),                       # vrows1
            pl.BlockSpec((1, hk, 128), lambda b, tt, s: (b, 0, 0)),  # hcols0
            pl.BlockSpec((1, hk, 128), lambda b, tt, s: (b, 0, 0)),  # hcols1
        ],
        out_specs=pl.BlockSpec((1, 3, r, w), lambda b, tt, s: (b, 0, tt, 0)),
        scratch_shapes=[
            pltpu.VMEM((plan.win_rows, plan.wcp), jnp.int16),
            pltpu.VMEM((plan.win_rows, plan.wcp), jnp.int16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    flops = (plan.batch * plan.n_bands
             * 2 * (r * r * w                       # luma vertical
                    + r * w * 128                   # luma horizontal
                    + 2 * plan.win_rows * plan.win_rows * plan.wc
                    + 2 * plan.win_rows * plan.wc * 128
                    + (2 * r * plan.win_rows * plan.wc
                       if plan.fh == 2 else 0)      # vertical upsample
                    + (2 * r * w * 128
                       if plan.fw == 2 else 0)))    # horizontal upsample
    return pl.pallas_call(
        _kernel(plan, interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (plan.batch, 3, plan.h, plan.w), jnp.uint8),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=plan.batch * (plan.h * plan.w * 2
                                         + plan.hc * plan.wc * 4
                                         + 3 * plan.h * plan.w),
            transcendentals=0),
    )


@functools.lru_cache(maxsize=16)
def _bases_np(band_rows: int, win_rows: int):
    d = _idct_basis().astype(np.float32)  # D[k, n]
    v8 = np.kron(np.eye(band_rows // 8, dtype=np.float32), d.T)
    v8c = np.kron(np.eye(win_rows // 8, dtype=np.float32), d.T)
    h8 = np.kron(np.eye(16, dtype=np.float32), d)
    h8t = np.kron(np.eye(8, dtype=np.float32), d)   # 64-col tail
    return v8, v8c, h8, h8t


# Device-resident basis cache: concrete arrays only. Caching blindly
# would store TRACERS when the first call happens under a jit trace,
# and the next trace with the same geometry would then consume a leaked
# tracer (UnexpectedTracerError — bit the round-5 bench, which traces
# two programs with the same plan dims in one process). Caching only
# concrete results keeps the serving hot path free of per-group basis
# re-uploads (4 H2D transfers per codec half — expensive on
# high-latency links) while staying trace-safe.
_bases_dev: dict[tuple, tuple] = {}


def _concrete(arrays: tuple) -> bool:
    import jax

    return not any(isinstance(a, jax.core.Tracer) for a in arrays)


def _bases(band_rows: int, win_rows: int):
    hit = _bases_dev.get((band_rows, win_rows))
    if hit is not None:
        return hit
    v8, v8c, h8, h8t = _bases_np(band_rows, win_rows)
    out = (jnp.asarray(v8), jnp.asarray(v8c), jnp.asarray(h8),
           jnp.asarray(h8t))
    if _concrete(out):
        _bases_dev[(band_rows, win_rows)] = out
    return out


def pad_chroma(plan: DecodePlan, cbc, crc):
    """Zero-pad chroma coefficient canvases from plan.wc to plan.wcp
    columns (no-op when already tile-aligned). Zero coefficients in the
    pad region dequantize/IDCT to pixels the upsample taps never select
    (taps clamp to each image's valid chroma extent)."""
    pad = plan.wcp - int(cbc.shape[-1])
    if pad <= 0:
        return cbc, crc
    cfg = ((0, 0), (0, 0), (0, pad))
    if isinstance(cbc, np.ndarray):
        return np.pad(cbc, cfg), np.pad(crc, cfg)
    return jnp.pad(cbc, cfg), jnp.pad(crc, cfg)


def decode_420(yc, cbc, crc, plan: DecodePlan, args: DecodeArgs,
               *, interpret: bool = False):
    """(B, H, W) + 2x(B, Hc, Wc) int16 coefficient canvases ->
    (B, 3, H, W) uint8 planar RGB. Despite the historical name this
    covers all four plan subsampling modes: (fh, fw) = (2, 2) 4:2:0,
    (1, 2) 4:2:2, (2, 1) 4:4:0, (1, 1) 4:4:4. Chroma canvases narrower
    than plan.wcp are zero-padded to the 128-lane tile here."""
    call = _build_call(plan, interpret)
    v8, v8c, h8, h8t = _bases(plan.band_rows, plan.win_rows)
    cbc, crc = pad_chroma(plan, cbc, crc)
    return call(
        jnp.asarray(args.win_starts),
        yc, cbc, crc,
        v8, v8c, h8, h8t,
        jnp.asarray(args.qty), jnp.asarray(args.qtcb),
        jnp.asarray(args.qtcr),
        jnp.asarray(args.vrows0), jnp.asarray(args.vrows1),
        jnp.asarray(args.hcols0), jnp.asarray(args.hcols1),
    )


# ===================================================================
# Fused 4:2:0 encode front half: planar RGB pixels -> quantized
# coefficient canvases in one sweep (mirror of decode_420).
# ===================================================================


@dataclass(frozen=True)
class EncodePlan:
    """Static geometry for one compiled encode kernel."""

    batch: int
    h: int              # luma canvas rows (multiple of 16)
    w: int              # luma canvas cols (multiple of 128, >= 256)
    band_rows: int      # luma rows per grid step (multiple of 16)
    tile_w: int         # luma cols per grid step (divides w)

    @property
    def n_bands(self) -> int:
        return self.h // self.band_rows

    @property
    def n_wtiles(self) -> int:
        return self.w // self.tile_w

    @property
    def n_col_chunks(self) -> int:
        # 128-lane chunks per grid step (per width tile)
        return self.tile_w // 128

    @property
    def wcp(self) -> int:
        # chroma output canvas width padded to the 128-lane tile (w/2
        # is a 64-multiple only for w=384/640-class buckets; width
        # tiling requires tile_w % 256 == 0, so tiled plans are never
        # padded); the pad columns are zero coefficients the entropy
        # emitter never reads (it slices each image's MCU grid).
        return _round_up(self.w // 2, 128)


@dataclass
class EncodeArgs:
    """Per-batch runtime inputs (host-computed)."""

    valid: np.ndarray       # (B * 2,) i32 per-image valid (h, w) pairs
    qy: np.ndarray          # (8, tile_w) f32 tiled luma quant pattern
    qc: np.ndarray          # (8, tile_w // 2) f32 chroma quant pattern


def make_encode_plan(batch: int, h: int, w: int) -> EncodePlan:
    if h % 16 or w % 128 or w < 256:
        raise ValueError(f"canvas {h}x{w} must be H%16==0, W%128==0, "
                         "W>=256")
    # The kernel holds ~5 f32 step-sized planes at once (3 replicated
    # channels + vertical intermediates), so R x W steps cap band_rows
    # at 32 on wide canvases (64 rows x 4096 cols measured 16.43 MB —
    # just over the VMEM budget) — and R=32 steps run every FDCT dot at
    # M=K=32, wasting most of the MXU's 128-wide stream. Tiling the
    # width instead (third grid dimension) keeps the step footprint
    # constant at 128 x <=1024 so every dot runs at M=K=128. tile_w
    # must divide w and keep the chroma tile lane-aligned
    # (tile_w % 256 == 0); widths <= 2048 already fit untiled.
    tile = w
    if w > 2048:
        # largest first: the 512-vs-1024 silicon A/B showed bigger
        # tiles win (fewer grid steps); 1280 still fits the VMEM model
        # (128 x 1280 at ~62.6 B/px ~= 10.3 MB) and is the only tile
        # that divides the 2560/5120/10240 rungs without falling to 512
        for cand in (1280, 1024, 768, 512, 256):
            if w % cand == 0:
                tile = cand
                break
    if tile < w:
        band = 128
    else:
        band = 128 if w <= 2048 else (64 if w <= 3072 else 32)
    while h % band:
        band //= 2
    return EncodePlan(batch=batch, h=h, w=w, band_rows=band, tile_w=tile)


def make_encode_args(plan: EncodePlan, qt: np.ndarray,
                     valid_hw: np.ndarray) -> EncodeArgs:
    """qt: (2, 8, 8) luma/chroma quant tables; valid_hw: (B, 2) per-image
    valid pixel dims — edge MCU blocks replicate from there (libjpeg
    pads the same way; blocks fully outside ceil16(valid) are emitted by
    nobody, so their don't-care clamping is band/chunk-local). The
    kernel consumes the dims as scalar-prefetch values and builds the
    clamped row/column replication in-register (rank-1 boundary
    extraction + select — no per-image one-hot matmuls)."""
    valid = np.maximum(np.asarray(valid_hw, np.int64), 1) \
        .astype(np.int32).reshape(-1)
    # quant patterns repeat every 8 columns, so one tile-width pattern
    # serves every width tile
    qy = np.tile(np.asarray(qt[0], np.float32), (1, plan.tile_w // 8))
    qc = np.tile(np.asarray(qt[1], np.float32), (1, plan.tile_w // 16))
    return EncodeArgs(valid=valid, qy=qy, qc=qc)


def _encode_kernel(plan: EncodePlan, interpret: bool):
    r = plan.band_rows
    wt = plan.tile_w
    wc = wt // 2
    rc = r // 2
    k = plan.n_col_chunks
    tiled = plan.n_wtiles > 1
    # chroma output block width: tiled plans are lane-aligned per tile;
    # untiled plans may pad to the 128-lane canvas (wcp)
    wco = wc if tiled else plan.wcp

    def kernel(valid_ref,                        # scalar prefetch (B*2,)
               rgb_ref,                          # VMEM (1, 3, R, Wt) u8
               vy_ref, vc_ref, hy_ref, hc_ref,   # VMEM static FDCT bases
               qy_ref, qc_ref,                   # VMEM quant patterns
               yc_ref, cbc_ref, crc_ref):        # outputs (1, ., .) i16
        b = pl.program_id(0)
        tt = pl.program_id(1)
        col0 = pl.program_id(2) * wt             # tile's absolute col
        vh = valid_ref[b * 2]
        vw = valid_ref[b * 2 + 1]

        # Per-image edge replication is a MONOTONE clamp (out pixel
        # (i, j) reads (min(i, vh-1), min(j, vw-1))), so it needs no
        # one-hot matmuls (2 x 128 MAC/pixel x 3 channels — 70% of the
        # kernel's FLOPs in the first version): extract the boundary
        # row/column with a rank-1 one-hot (~1 MAC/pixel, exact at any
        # matmul precision — selecting one exactly-representable u8
        # value) and select past the boundary. Bands/chunks fully past
        # the valid extent clamp to their head (don't-care: nobody
        # emits blocks outside ceil16(valid); same contract as the
        # index-array version).
        bi = jnp.clip(vh - 1 - tt * r, 0, r - 1)          # boundary row
        sel_row = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, r), 1) == bi,
            1.0, 0.0)                                     # (1, R)
        row_abs = (jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
                   + tt * r)
        row_ok = row_abs < vh                             # (R, 1)
        iota_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

        def load_chan(ch):
            x = rgb_ref[0, ch].astype(jnp.int32).astype(jnp.float32)
            brow = jax.lax.dot_general(
                sel_row, x, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (1, Wt)
            x = jnp.where(row_ok, x, brow)                # (R, Wt)
            cols = []
            for c in range(k):
                xc = x[:, c * 128:(c + 1) * 128]
                ci = jnp.clip(vw - 1 - col0 - c * 128, 0, 127)  # boundary
                sel_col = jnp.where(iota_sub == ci, 1.0, 0.0)  # (128, 1)
                bcol = jax.lax.dot_general(
                    xc, sel_col,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (R, 1)
                col_ok = (iota_lane + col0 + c * 128) < vw  # (1, 128)
                cols.append(jnp.where(col_ok, xc, bcol))
            return jnp.concatenate(cols, axis=1)          # (R, Wt)

        rr_ = load_chan(0)
        gg = load_chan(1)
        bb = load_chan(2)
        y = 0.299 * rr_ + 0.587 * gg + 0.114 * bb - 128.0
        cb = -0.168735892 * rr_ - 0.331264108 * gg + 0.5 * bb
        cr = 0.5 * rr_ - 0.418687589 * gg - 0.081312411 * bb
        # (chroma carries no 128 shift: the +128 level and the -128 FDCT
        # shift cancel)

        # ---- luma FDCT: vertical (R,R) static, horizontal per chunk.
        # FDCT operands are pixel-scale (|y| <= ~180), so bf16x3 needs
        # no clamp here — the dropped split term is <= 2^-16 relative
        # on values the quantizer divides by >= 1.
        dn = (((1,), (0,)), ((), ()))
        em = ENCODE_TRANSFORM_MODE
        bf3 = em in ("bf16x3", "bf16x2")  # split modes
        yv = _tdot(vy_ref[:], y, dn, mode=em, basis="a")
        qy = jnp.concatenate([qy_ref[:]] * (r // 8), axis=0)   # (R, W)
        yvs = _split_bf16(yv) if bf3 else None
        hys = _split_bf16(hy_ref[:]) if bf3 else None
        ycoef = []
        for c in range(k):
            sl = slice(c * 128, (c + 1) * 128)
            blk = _tdot(
                yv[:, sl], hy_ref[:], dn, mode=em, basis="x",
                split_a=(yvs[0][:, sl], yvs[1][:, sl]) if bf3 else None,
                split_x=hys)
            ycoef.append(blk)
        yq = jnp.concatenate(ycoef, axis=1) / qy
        yc_ref[0] = jnp.clip(jnp.round(yq), -1023, 1023).astype(jnp.int16)

        # ---- chroma: vertical (R/2, R) static matrix folds the 2-row
        # mean INTO the FDCT; horizontal (256, 128) static folds the
        # 2-col mean the same way
        qc = jnp.concatenate([qc_ref[:]] * (rc // 8), axis=0)  # (RC, Wc)
        hcs = _split_bf16(hc_ref[:]) if bf3 else None
        for plane, out_ref in ((cb, cbc_ref), (cr, crc_ref)):
            pv = _tdot(vc_ref[:], plane, dn, mode=em, basis="a")
            pvs = _split_bf16(pv) if bf3 else None
            coefs = []
            for c in range(wc // 128):
                sl = slice(c * 256, (c + 1) * 256)
                blk = _tdot(
                    pv[:, sl], hc_ref[:], dn, mode=em, basis="x",
                    split_a=(pvs[0][:, sl], pvs[1][:, sl]) if bf3 else None,
                    split_x=hcs)                   # (R/2, 128)
                coefs.append(blk)
            if wc % 128:        # untiled plans only (tiled: wc%128==0)
                assert wc % 128 == 64, wc
                sl = slice(wt - 128, None)
                blk = _tdot(
                    pv[:, sl], hc_ref[:, :128][:128], dn, mode=em,
                    basis="x",
                    split_a=(pvs[0][:, sl], pvs[1][:, sl]) if bf3 else None,
                    split_x=(hcs[0][:, :128][:128], hcs[1][:, :128][:128])
                    if bf3 else None)[:, :64]
                coefs.append(blk)
            pq = jnp.concatenate(coefs, axis=1) / qc
            q16 = jnp.clip(jnp.round(pq), -1023, 1023).astype(jnp.int16)
            if wc < wco:        # tile-pad the chroma output canvas
                q16 = jnp.concatenate(
                    [q16, jnp.zeros((rc, wco - wc), jnp.int16)],
                    axis=1)
            out_ref[0] = q16

    return kernel


@functools.lru_cache(maxsize=16)
def _encode_bases(band_rows: int):
    d = _idct_basis().astype(np.float32)
    # vertical FDCT: coef = kron(I, D) @ x
    vy = np.kron(np.eye(band_rows // 8, dtype=np.float32), d)
    # chroma vertical: 2-row mean then FDCT -> (R/2, R) static
    rc = band_rows // 2
    pair = np.zeros((rc, band_rows), dtype=np.float32)
    for i in range(rc):
        pair[i, 2 * i] = 0.5
        pair[i, 2 * i + 1] = 0.5
    vc = np.kron(np.eye(rc // 8, dtype=np.float32), d) @ pair
    # horizontal FDCT: x @ kron(I, D^T) per 128 chunk
    hy = np.kron(np.eye(16, dtype=np.float32), d.T)
    # chroma horizontal: 2-col mean then FDCT -> (256, 128) static
    pairc = np.zeros((256, 128), dtype=np.float32)
    for i in range(128):
        pairc[2 * i, i] = 0.5
        pairc[2 * i + 1, i] = 0.5
    hcm = pairc @ np.kron(np.eye(16, dtype=np.float32), d.T)
    return vy, vc, hy, hcm


_encode_bases_dev: dict[int, tuple] = {}


def _encode_bases_jnp(band_rows: int):
    # concrete-only device cache — see _bases for the tracer-leak trap
    hit = _encode_bases_dev.get(band_rows)
    if hit is not None:
        return hit
    vy, vc, hy, hcm = _encode_bases(band_rows)
    out = (jnp.asarray(vy), jnp.asarray(vc), jnp.asarray(hy),
           jnp.asarray(hcm))
    if _concrete(out):
        _encode_bases_dev[band_rows] = out
    return out


@functools.lru_cache(maxsize=16)
def _build_encode_call(plan: EncodePlan, interpret: bool):
    r, wt = plan.band_rows, plan.tile_w
    wco = wt // 2 if plan.n_wtiles > 1 else plan.wcp
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.batch, plan.n_bands, plan.n_wtiles),
        in_specs=[
            pl.BlockSpec((1, 3, r, wt),
                         lambda b, tt, ss, s: (b, 0, tt, ss)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # vy
            pl.BlockSpec(memory_space=pltpu.VMEM),   # vc
            pl.BlockSpec(memory_space=pltpu.VMEM),   # hy
            pl.BlockSpec(memory_space=pltpu.VMEM),   # hc
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qy
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qc
        ],
        out_specs=[
            pl.BlockSpec((1, r, wt), lambda b, tt, ss, s: (b, tt, ss)),
            pl.BlockSpec((1, r // 2, wco),
                         lambda b, tt, ss, s: (b, tt, ss)),
            pl.BlockSpec((1, r // 2, wco),
                         lambda b, tt, ss, s: (b, tt, ss)),
        ],
    )
    # edge replication is now rank-1 extract + select (~6 vs the index
    # version's 3*r + 3*128 MAC terms)
    flops = (plan.batch * plan.n_bands * plan.n_wtiles * 2 * r * wt
             * (6 + r + 128 + 128))
    return pl.pallas_call(
        _encode_kernel(plan, interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((plan.batch, plan.h, plan.w), jnp.int16),
            jax.ShapeDtypeStruct((plan.batch, plan.h // 2, plan.wcp),
                                 jnp.int16),
            jax.ShapeDtypeStruct((plan.batch, plan.h // 2, plan.wcp),
                                 jnp.int16),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=plan.batch * plan.h * plan.w * 6,
            transcendentals=0),
    )


def encode_420(rgb_u8, plan: EncodePlan, args: EncodeArgs,
               *, interpret: bool = False):
    """(B, 3, H, W) uint8 planar RGB -> (yc, cbc, crc) int16 quantized
    coefficient canvases (4:2:0, 2x2 box-mean downsample, Annex-K style
    quant), matching ops/jpeg_encode.batched_encode_420 within one
    quantization step (different FDCT summation order can cross an
    exact rounding tie; measured <=1 coef per megapixel)."""
    call = _build_encode_call(plan, interpret)
    vy, vc, hy, hcm = _encode_bases_jnp(plan.band_rows)
    return call(jnp.asarray(args.valid), rgb_u8, vy, vc, hy, hcm,
                jnp.asarray(args.qy), jnp.asarray(args.qc))
