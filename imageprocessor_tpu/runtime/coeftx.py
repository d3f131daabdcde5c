"""Lossless coefficient-domain flip / rotate / crop (jpegtran-style).

The reference declares crop/rotate/flip operation types but rejects them
at dispatch (reference: internal/domain/image.go:42-50,
internal/worker/image_processor.go:118-120); this framework implements
them on-device (ops/extra.py). For JPEG sources with JPEG outputs, the
90-degree rotations, both mirrors, and MCU-aligned crops are *exactly*
expressible as permutations of the quantized coefficient blocks — the
classic jpegtran transforms:

* flip_h: reverse each plane's block columns; negate odd horizontal
  frequencies within every block (mirroring samples n -> 7-n maps the
  DCT-II basis cos((2n+1)v*pi/16) to (-1)^v times itself);
* flip_v: the transpose of that argument on rows;
* transpose: transpose the block grid AND each 8x8 block (the 2-D DCT
  of a transposed tile is the transposed coefficient tile); sampling
  factors and image dims swap;
* rot90ccw = transpose(flip_h(.)), rot270 = transpose(flip_v(.)),
  rot180 = flip_h(flip_v(.)) — matching np.rot90's CCW convention used
  by ops/extra.rotate_image;
* crop: drop whole MCU rows/columns (origin must be MCU-aligned; the
  right/bottom edges may cut mid-block because JPEG dims already do).

Serving these from the coefficient stream skips the pixel decode AND
the re-encode entirely: decoded output pixels are bit-identical to
running the pixel op on the decoded source (the transforms commute with
the IDCT/upsample exactly), with zero generation loss — strictly more
faithful than the pixel path's q85 re-encode, the same (documented)
fidelity divergence as the watermark splice (PARITY.md).

Expressibility follows jpegtran's "perfect transform" rules: a mirror
is exact only when the axis it folds is a whole number of MCUs (else
the partial edge block would land on the leading edge, which the JFIF
block grid cannot represent). Ineligible geometry falls back to the
pixel path — never a trimmed or shifted output.
"""

from __future__ import annotations

import os

import numpy as np

from imageprocessor_tpu.domain import OperationType
from imageprocessor_tpu.runtime import splice
from imageprocessor_tpu.runtime.nativecodec import JpegSpliceContext

#: op types this module can serve (watermark is runtime/splice.py's job)
TX_TYPES = frozenset(
    {OperationType.CROP, OperationType.ROTATE, OperationType.FLIP})

_SIGN8 = np.array([1, -1, 1, -1, 1, -1, 1, -1], dtype=np.int16)


def _flip_h_plane(p: np.ndarray) -> np.ndarray:
    hp, wp = p.shape
    v = p.reshape(hp, wp // 8, 8)[:, ::-1, :] * _SIGN8[None, None, :]
    return v.reshape(hp, wp)


def _flip_v_plane(p: np.ndarray) -> np.ndarray:
    hp, wp = p.shape
    v = p.reshape(hp // 8, 8, wp)[::-1] * _SIGN8[None, :, None]
    return v.reshape(hp, wp)


def rs_enabled() -> bool:
    """Half-MCU (`_rs`) mirrors are a FIDELITY-vs-host-ms tradeoff:
    luma bit-exact + single chroma requant, but measured ~2.4x the
    host cost of the SIMD pixel path (PERF.md "Half-MCU mirrors") —
    the scan+emit pair alone costs what libjpeg-turbo's whole
    decode+encode does. Default on (the framework is fidelity-first,
    like the splice quantization choice); IMAGEPROCESSOR_COEF_RS=0
    reverts those shapes to the pixel path."""
    return os.environ.get("IMAGEPROCESSOR_COEF_RS", "1").lower() \
        not in ("0", "false", "no")


def _mirror_prim(dim: int, mcu: int) -> str | None:
    """Mirror primitive for folding an axis of `dim` pixels with MCU
    span `mcu`: exact block mirror when the axis is MCU-aligned;
    otherwise, when the LUMA blocks still align (dim % 8 == 0) but
    subsampled chroma lands mid-block (dim % 16 == 8), the `_rs`
    variant mirrors chroma by a DCT-domain half-block shift (two fixed
    8x8 matrices mixing adjacent blocks) and requantizes ONCE with the
    source's own table — luma stays bit-exact; this is what makes
    1920x1080 mirrors expressible (1080 % 16 == 8). None when even the
    luma folds a partial block (or rs is disabled by knob)."""
    suffix = ""
    if dim % mcu:
        if mcu == 16 and dim % 8 == 0 and rs_enabled():
            suffix = "_rs"
        else:
            return None
    return suffix


def eligible_prims(op, size, sampling) -> list | None:
    """Primitive list expressing `op` on an image of `size` (w, h) with
    luma `sampling[0]`, or None when inexpressible (odd rotation
    angles, mirrors folding a partial luma block, crops with an
    unaligned origin). Pure geometry — callers still gate the stream
    itself via splice.coef_reencodable."""
    w, h = size
    hy, vy = sampling[0]
    mw, mh = 8 * hy, 8 * vy
    t = op.type
    if t is OperationType.FLIP:
        if op.direction == "vertical":
            sv = _mirror_prim(h, mh)
            return None if sv is None else ["flip_v" + sv]
        sh = _mirror_prim(w, mw)
        return None if sh is None else ["flip_h" + sh]
    if t is OperationType.ROTATE:
        a = op.angle % 360.0
        if a == 0.0:
            return []
        if a == 90.0:
            sh = _mirror_prim(w, mw)
            return None if sh is None else ["flip_h" + sh, "transpose"]
        if a == 180.0:
            sh, sv = _mirror_prim(w, mw), _mirror_prim(h, mh)
            return (None if sh is None or sv is None
                    else ["flip_h" + sh, "flip_v" + sv])
        if a == 270.0:
            sv = _mirror_prim(h, mh)
            return None if sv is None else ["flip_v" + sv, "transpose"]
        return None
    if t is OperationType.CROP:
        # Same clamping as ops/extra.crop_image, so the coefficient
        # rendition matches the pixel path's output dims exactly.
        x = min(max(op.x, 0), w - 1)
        y = min(max(op.y, 0), h - 1)
        cw = max(1, min(op.width, w - x))
        ch = max(1, min(op.height, h - y))
        if x % mw or y % mh:
            return None
        return [("crop", x, y, cw, ch)]
    return None


def _mirror_blocks(p: np.ndarray, extent: int, axis: int) -> np.ndarray:
    """Exact block mirror of only the VALID blocks along one axis
    (extent % 8 == 0); padding blocks beyond the extent zero out (they
    decode to discarded samples, and zero blocks cost the least to
    re-symbolize). Distinct from _flip_h/_flip_v_plane, which mirror
    the WHOLE plane and are only correct when it carries no padding
    blocks on that axis."""
    nb = extent // 8
    out = np.zeros_like(p)
    if axis == 0:
        v = p.reshape(-1, 8, p.shape[1])
        out.reshape(-1, 8, p.shape[1])[:nb] = \
            v[:nb][::-1] * _SIGN8[None, :, None]
    else:
        v = p.reshape(p.shape[0], -1, 8)
        out.reshape(p.shape[0], -1, 8)[:, :nb] = \
            v[:, :nb][:, ::-1] * _SIGN8[None, None, :]
    return out


def _shift_mirror(plane: np.ndarray, qtab: np.ndarray, extent: int,
                  axis: int) -> np.ndarray:
    """Mirror a component whose sample extent is NOT block-aligned
    (extent % 8 != 0) entirely in the DCT domain. The sample-domain
    mirror out[r] = in[extent-1-r] makes each output block a fixed
    row-selection of TWO adjacent input blocks (split at
    a = (extent-1) % 8); conjugating those 0/1 selection matrices with
    the orthonormal DCT basis gives two 8x8 matrices A, B such that
        out_coef[J] = A @ dq[bh(J)] + B @ dq[bh(J)-1]
    — two batched matmuls over the whole plane, then ONE
    requantization with the component's own table (the only loss; the
    mirror itself is an exact linear map). Output blocks past the
    extent (padding) zero out; input padding samples are never
    selected (M1 reads rows <= a of the last partial block — exactly
    its valid rows)."""
    d = splice._dct_basis()
    q = np.asarray(qtab, dtype=np.float64).reshape(8, 8)
    hp, wp = plane.shape
    x = plane.reshape(hp // 8, 8, wp // 8, 8).astype(np.float64) \
        * q[None, :, None, :]
    a = (extent - 1) % 8
    m1 = np.zeros((8, 8))
    m2 = np.zeros((8, 8))
    for u in range(8):
        r = a - u
        if r >= 0:
            m1[u, r] = 1.0
        else:
            m2[u, 8 + r] = 1.0
    A = d @ m1 @ d.T
    B = d @ m2 @ d.T
    nv = -(-extent // 8)
    J = np.arange(nv)
    bh = (extent - 1 - 8 * J) // 8
    lo = np.maximum(bh - 1, 0)
    out = np.zeros_like(x)
    # tensordot routes through BLAS dgemm (the equivalent einsum runs
    # ~5x slower as a generic loop on these shapes)
    if axis == 0:
        c1 = x[bh]
        c2 = np.where((bh - 1 >= 0)[:, None, None, None], x[lo], 0.0)
        out[:nv] = (
            np.tensordot(A, c1, axes=([1], [1]))
            + np.tensordot(B, c2, axes=([1], [1]))).transpose(1, 0, 2, 3)
    else:
        c1 = x[:, :, bh]
        c2 = np.where((bh - 1 >= 0)[None, None, :, None],
                      x[:, :, lo], 0.0)
        out[:, :, :nv] = (np.tensordot(c1, A.T, axes=([3], [0]))
                          + np.tensordot(c2, B.T, axes=([3], [0])))
    res = np.clip(np.round(out / q[None, :, None, :]), -1023, 1023)
    return res.astype(np.int16).reshape(hp, wp)


def _mirror_rs(planes, qtabs, size, sampling, axis: int) -> list:
    """Per-component mirror for the `_rs` primitives: components whose
    sample extent is block-aligned take the exact integer mirror,
    misaligned ones (subsampled chroma on a %16==8 axis) take the
    DCT-domain shift mirror + one requantization."""
    w, h = size
    hy, vy = sampling[0]
    dim = h if axis == 0 else w
    out = []
    qt = np.asarray(qtabs).reshape(-1, 8, 8)
    for c, (hc, vc) in enumerate(sampling):
        f = (vy // vc) if axis == 0 else (hy // hc)
        ext = -(-dim // f)
        if ext % 8 == 0:
            out.append(_mirror_blocks(planes[c], ext, axis))
        else:
            out.append(_shift_mirror(planes[c], qt[c], ext, axis))
    return out


def _rot_native(planes, mode: str) -> list | None:
    """Fused mirror+transpose through the native blocked kernel
    (nativecodec.coef_rot_i16) — ~6x over the numpy element-wise
    transpose on 12 MP planes. None when the library lacks it."""
    from imageprocessor_tpu.runtime import nativecodec
    try:
        return [nativecodec.coef_rot_i16(p, mode) for p in planes]
    except nativecodec.NativeCodecError:
        return None


def apply(ctx: JpegSpliceContext, prims: list) -> JpegSpliceContext:
    """Apply primitives to a context's coefficient planes, returning a
    fresh PSEUDO context (no bit offsets — block order changed, so
    nothing can be bit-copied; the caller re-symbolizes via
    splice.reencode). Never mutates `ctx`. Mirror+transpose pairs fuse
    onto one native blocked pass when the library provides it; the pure
    numpy path below stays as the behavioral reference (the tests run
    both)."""
    planes = list(ctx.planes)
    qtabs = np.asarray(ctx.qtabs)
    w, h = ctx.size
    sampling = [tuple(s) for s in ctx.sampling]
    i = 0
    while i < len(prims):
        pr = prims[i]
        fuse = (prims[i + 1] if pr in ("flip_h", "flip_v")
                and i + 1 < len(prims) else None)
        if fuse == "transpose":
            fused = _rot_native(planes,
                                "rot90" if pr == "flip_h" else "rot270")
            if fused is not None:
                planes = fused
                qtabs = np.ascontiguousarray(np.swapaxes(
                    np.asarray(qtabs).reshape(-1, 8, 8), -1, -2))
                w, h = h, w
                sampling = [(v, u) for (u, v) in sampling]
                i += 2
                continue
        if pr == "flip_h":
            planes = [_flip_h_plane(p) for p in planes]
        elif pr == "flip_v":
            planes = [_flip_v_plane(p) for p in planes]
        elif pr == "flip_h_rs":
            planes = _mirror_rs(planes, qtabs, (w, h), sampling, axis=1)
        elif pr == "flip_v_rs":
            planes = _mirror_rs(planes, qtabs, (w, h), sampling, axis=0)
        elif pr == "transpose":
            planes = [np.ascontiguousarray(p.T) for p in planes]
            # The stored coefficients are QUANTIZED: position (u, v) of
            # a transposed block holds C[v,u]/Q[v,u], so the emitted
            # stream must declare the TRANSPOSED quant tables for the
            # dequantize to multiply the right step back (jpegtran does
            # the same table transpose).
            qtabs = np.ascontiguousarray(np.swapaxes(
                np.asarray(qtabs).reshape(-1, 8, 8), -1, -2))
            w, h = h, w
            sampling = [(v, u) for (u, v) in sampling]
        else:
            _tag, x, y, cw, ch = pr
            hy, vy = sampling[0]
            new_mx = -(-cw // (8 * hy))
            new_my = -(-ch // (8 * vy))
            out = []
            for c, (hc, vc) in enumerate(sampling):
                x0 = x * hc // hy
                y0 = y * vc // vy
                out.append(np.ascontiguousarray(
                    planes[c][y0:y0 + new_my * 8 * vc,
                              x0:x0 + new_mx * 8 * hc]))
            planes = out
            w, h = cw, ch
        i += 1
    return splice.coef_context(planes, qtabs, (w, h), sampling)
