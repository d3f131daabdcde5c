"""Fused two-output Pallas kernel: resize + thumbnail in ONE source sweep.

The default service plan (thumbnail 200 crop + resize 1024x768 keep-aspect,
reference handler/image/image.go:252-275) runs two resample kernels that
each stream the full 12 MP source from HBM. This kernel sweeps the source
once: the grid iterates over fixed source row *bands*, and each band step
computes every output row — of BOTH artifacts — whose bilinear support
lives in that band.

Mechanics:
* The vertical pass of BOTH outputs runs as ONE one-hot matmul per band
  (their row counts sit well under the MXU's 128 rows), accumulating
  into full-height VMEM scratch; the horizontal pass then runs once per
  (b, c) at the last band, where its weight tiles amortize over the
  whole image instead of a 48-row band chunk (per-band horizontal
  matmuls were MXU weight-load-bound — measured 2x the step time).
* Horizontal one-hot weights are built once per image into scratch;
  band data is cast u8->i16->bf16 (no direct u8->float on Mosaic).
* Each band writes a fixed-size chunk of M vertical-scratch rows at an
  8-aligned offset (Mosaic dynamic-store alignment). Chunks of adjacent
  bands overlap; trailing rows of a chunk whose sources lie beyond the
  band hold garbage, but the NEXT band rewrites them correctly — grid
  steps for one (b, c) execute in order, so the last write wins.
* Bands that own no rows for an image (small image in a tall bucket)
  write their chunk into a garbage zone of M extra canvas rows; the host
  crops to the true output size afterwards.
* Per-(image, band) geometry (band start, write offset, band-relative
  row indices + lerp weights) is precomputed on host into arrays indexed
  by an untiled leading axis — content never recompiles.

Same arithmetic as ops/pallas_resample.py (one-hot matmul passes, Go
half-pixel sampling, 16-bit-path quantization); validated against the
same float64 oracle.
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

from imageprocessor_tpu.ops.pallas_resample import (
    _axis_coords,
    _round_up,
    make_col_args,
)


@dataclass(frozen=True)
class FusedPlan:
    batch: int
    channels: int
    src_h: int
    src_w: int
    own_rows: int        # source rows owned per band
    band_rows: int       # source rows DMA'd per band (>= own + support)
    # resize output
    r_out_h: int         # valid canvas rows (pre-garbage-zone)
    r_out_w: int         # 128-padded canvas cols
    r_rows: int          # M_r: output rows written per band (mult of 8)
    r_col_band: int
    # thumbnail output
    t_size: int          # true requested thumbnail size
    t_out: int           # canvas rows (t_size padded to 8)
    t_out_w: int         # canvas cols (t_size padded to 128)
    t_rows: int          # M_t
    t_col_band: int
    compute_dtype: str = "bfloat16"
    nbuf: int = 4        # band DMA pipeline depth (outstanding copies)

    @property
    def n_bands(self) -> int:
        return -(-self.src_h // self.own_rows)

    @property
    def r_alloc_h(self) -> int:  # canvas + garbage zone
        return self.r_out_h + self.r_rows

    @property
    def t_alloc_h(self) -> int:
        return self.t_out + self.t_rows


@dataclass
class FusedArgs:
    band_starts: np.ndarray   # (B*NB,) int32, 8-aligned
    r_lo: np.ndarray          # (B*NB,) int32, 8-aligned write offsets
    t_lo: np.ndarray          # (B*NB,) int32
    r_frac: np.ndarray        # (B*NB,) rows at the chunk head owned by
    t_frac: np.ndarray        # the PREVIOUS band (masked in the store)
    rows0: np.ndarray         # (B*NB, 1, M_r+M_t) band-relative y0,
    rows1: np.ndarray         # resize rows first, thumbnail rows after
    rowf: np.ndarray          # (combined vertical one-hot matmul)
    r_colbs: np.ndarray       # (B, K_r)
    r_cols0: np.ndarray       # (B*K_r, 1, 128)
    r_cols1: np.ndarray
    r_colf: np.ndarray
    t_colbs: np.ndarray       # (B, K_t)
    t_cols0: np.ndarray       # (B*K_t, 1, 128)
    t_cols1: np.ndarray
    t_colf: np.ndarray
    ok: bool = True           # False: geometry didn't fit -> caller falls back


def make_fused_plan(batch: int, src_h: int, src_w: int,
                    r_out_h: int, r_out_w: int, t_out: int,
                    min_scale_r: float, max_scale_r: float,
                    min_scale_t: float, max_scale_t: float,
                    max_scale_w_r: float, max_scale_w_t: float,
                    compute_dtype: str = "bfloat16") -> FusedPlan:
    dt = 2 if compute_dtype == "bfloat16" else 4
    # Pipeline depth: nbuf-1 band copies stay in flight while a band is
    # being consumed. At the tuned own=240 band size 4/6/8 measure the
    # same within noise (12.04k/11.97k/12.03k img/s on v5e, 12 MP) — the
    # kernel is compute-bound, not DMA-bound — so take the shallowest
    # queue and keep the VMEM for bands.
    nbuf = int(os.environ.get("IMAGEPROCESSOR_FUSED_NBUF", "4"))
    nbuf = max(2, min(nbuf, 32))
    vmem_budget = int(os.environ.get("IMAGEPROCESSOR_FUSED_VMEM_MB",
                                     "48")) * 1024 * 1024
    # Chunk starts are floor-8-aligned in OUTPUT rows, but the leading
    # pre-owned rows of each chunk are MASKED in the vband store (the
    # previous band's correct values win), so the band only needs to
    # cover its OWN rows' sources: band start >= floor8(first owned
    # support) >= own_lo - 7 and the last owned bilinear support is
    # <= own_hi, so the span is <= own + 7 for BOTH outputs (the shared
    # min() start only lowers the base, never the bound) — 16 rows of
    # slack suffice with margin. make_fused_args still verifies every
    # actual geometry and flags ok=False on overflow. (The old unmasked
    # design needed 8*scale rows of backward slack — 23% of every band
    # re-read, re-cast and re-matmul'd at 12 MP.)
    slack = int(os.environ.get("IMAGEPROCESSOR_FUSED_SLACK", "16"))
    cband_r = min(_round_up(int(np.ceil(128 * max_scale_w_r)) + 132, 128),
                  src_w)
    cband_t = min(_round_up(int(np.ceil(128 * max_scale_w_t)) + 132, 128),
                  src_w)
    if src_w % 128:
        # Non-128-multiple source width with a dynamic col band: the
        # rightmost chunk's start clamps to src_w - cband, which is then
        # not 128-aligned — a false pl.multiple_of promise (undefined
        # behavior on real TPU; interpret mode can't catch it). Take the
        # full-width static-slice path instead. Unreachable from the
        # bucket ladder today (its non-128 widths always have
        # cband == src_w already); this guards exact-size callers.
        cband_r = cband_t = src_w
    # 240 wins empirically with slack=16 masked stores (v5e, 12 MP,
    # batch 8, tools/kprobe.py sweep: 208:12.0k, 224:11.4k, 240:12.0k
    # x2 runs, 256:9.6k, 272:9.9k, 320:10.3k img/s): smaller per-step
    # compute quanta hide under the DMA, until grid overhead dominates;
    # the dips are not monotonic (band_rows tiling vs the MXU pass
    # structure), so trust the sweep, not a model.
    # IMAGEPROCESSOR_FUSED_OWN overrides for tuning.
    own = 64
    own_env = os.environ.get("IMAGEPROCESSOR_FUSED_OWN")
    ladder = ((int(own_env),) if own_env
              else (240, 208, 192, 128, 64))
    for cand in ladder:
        band = min(_round_up(cand + slack, 8), src_h)
        m_r = _round_up(int(np.ceil(cand / max(min_scale_r, 1e-6))) + 10, 8)
        m_t = _round_up(int(np.ceil(cand / max(min_scale_t, 1e-6))) + 10, 8)
        vmem = (nbuf * band * src_w             # pipelined u8 bands
                + 3 * (_round_up(r_out_h, 8) + m_r) * src_w * dt  # vband r
                + 3 * (_round_up(t_out, 8) + m_t) * src_w * dt    # vband t
                # output blocks are (1, 3, alloc_h, out_w) u8 — the
                # channel factor belongs on these terms too
                + 3 * (r_out_h + m_r) * _round_up(r_out_w, 128)
                + 3 * (t_out + m_t) * _round_up(t_out, 128)
                + (_round_up(r_out_w, 128) // 128) * cband_r * 128 * dt
                + (_round_up(t_out, 128) // 128) * cband_t * 128 * dt)
        if vmem <= vmem_budget:
            own = cand
            break
    band = min(_round_up(own + slack, 8), src_h)
    m_r = _round_up(int(np.ceil(own / max(min_scale_r, 1e-6))) + 10, 8)
    m_t = _round_up(int(np.ceil(own / max(min_scale_t, 1e-6))) + 10, 8)
    return FusedPlan(batch=batch, channels=3, src_h=src_h, src_w=src_w,
                     own_rows=own, band_rows=band,
                     r_out_h=_round_up(r_out_h, 8),
                     r_out_w=_round_up(r_out_w, 128), r_rows=m_r,
                     r_col_band=cband_r,
                     t_size=t_out, t_out=_round_up(t_out, 8),
                     t_out_w=_round_up(t_out, 128), t_rows=m_t,
                     t_col_band=cband_t, compute_dtype=compute_dtype,
                     nbuf=nbuf)


def _band_rows_args(plan: FusedPlan, out_len_pad: int, alloc_h: int,
                    m_rows: int, r0, r1, rf, out_valid: np.ndarray):
    """Per-(image, band) write offsets + band-relative row geometry.

    Returns (starts_rel_ok, lo, rows0, rows1, rowf). `starts` are chosen
    by the caller (shared between outputs); here we compute, for a given
    absolute band ownership range, which output rows it owns.
    """
    b = plan.batch
    nb = plan.n_bands
    lo = np.zeros((b, nb), dtype=np.int32)
    frac = np.zeros((b, nb), dtype=np.int32)
    rows0 = np.zeros((b, nb, m_rows), dtype=np.int32)
    rows1 = np.zeros((b, nb, m_rows), dtype=np.int32)
    rowf = np.zeros((b, nb, m_rows), dtype=np.float32)
    starts = np.zeros((b, nb), dtype=np.int64)
    max_abs = np.zeros((b, nb), dtype=np.int64)  # highest src row needed
    ok = True
    for i in range(b):
        n_out = int(out_valid[i])
        y0 = r0[i]
        for j in range(nb):
            own_lo = j * plan.own_rows
            own_hi = min((j + 1) * plan.own_rows, plan.src_h)
            # output rows whose y0 lands in [own_lo, own_hi)
            sel = np.nonzero((y0[:n_out] >= own_lo)
                             & (y0[:n_out] < own_hi))[0]
            if sel.size == 0:
                lo[i, j] = out_len_pad  # garbage zone
                # floor-8 like the owned path: the kernel promises
                # pl.multiple_of(start, 8) for the DMA row offset, and
                # src_h - band_rows is unaligned for non-multiple-of-8
                # bucket heights (tall-image exact-height buckets).
                starts[i, j] = (max(0, min(own_lo, plan.src_h
                                           - plan.band_rows)) // 8) * 8
                continue
            first = (int(sel[0]) // 8) * 8
            cnt = min(m_rows, alloc_h - first)
            if int(sel[-1]) - first + 1 > m_rows:
                ok = False  # band owns more rows than the static chunk
            lo[i, j] = first
            frac[i, j] = int(sel[0]) - first
            # Source window starts at the first OWNED row's support —
            # the masked store lets the pre-owned chunk head hold
            # garbage, so no backward source slack is needed.
            bs = max(0, min(int(y0[int(sel[0])]),
                            plan.src_h - plan.band_rows))
            bs = (bs // 8) * 8
            starts[i, j] = bs
            hi_row = min(first + cnt, n_out)
            rows0[i, j, :hi_row - first] = np.clip(
                r0[i, first:hi_row] - bs, 0, plan.band_rows - 1)
            rows1[i, j, :hi_row - first] = np.clip(
                r1[i, first:hi_row] - bs, 0, plan.band_rows - 1)
            rowf[i, j, :hi_row - first] = rf[i, first:hi_row]
            # Highest source row this band must cover CORRECTLY: the last
            # output row it OWNS (later rows are rewritten by later bands).
            owned_last = int(sel[-1])
            max_abs[i, j] = int(r1[i, owned_last])
            if max_abs[i, j] - bs >= plan.band_rows:
                ok = False  # own rows spill past the static band
    return (ok, starts, max_abs, lo, frac,
            rows0.reshape(b * nb, 1, m_rows),
            rows1.reshape(b * nb, 1, m_rows),
            rowf.reshape(b * nb, 1, m_rows))


# One shared implementation with the standalone resample kernel —
# the loops were identical copies and drifted bug-for-bug.
_col_args = make_col_args


def make_fused_args(plan: FusedPlan, src_hw: np.ndarray,
                    r_out_hw: np.ndarray,
                    t_out_hw: np.ndarray | None = None) -> FusedArgs:
    """src_hw: (B,2) valid source dims; r_out_hw: (B,2) valid resize dims.
    Thumbnail geometry: center square crop -> t_out x t_out derived from
    src_hw (default), or aspect-preserving per-image dims when t_out_hw
    is given — geometrically just a second keep-aspect resize, so the
    kernel is untouched."""
    b = plan.batch
    # resize rows (absolute source coords)
    r0, r1, rf = _axis_coords(r_out_hw[:, 0], src_hw[:, 0],
                              np.zeros(b, np.int64), plan.r_alloc_h,
                              plan.src_h)
    ok_r, starts_r, max_r, r_lo, r_frac, rr0, rr1, rrf = _band_rows_args(
        plan, plan.r_out_h, plan.r_alloc_h, plan.r_rows, r0, r1, rf,
        r_out_hw[:, 0])

    if t_out_hw is None:
        # thumbnail rows: crop offset + scale side/t_out
        side = np.minimum(src_hw[:, 0], src_hw[:, 1]).astype(np.int64)
        off_y = np.where(src_hw[:, 0] > src_hw[:, 1],
                         (src_hw[:, 0] - src_hw[:, 1]) // 2,
                         0).astype(np.int64)
        off_x = np.where(src_hw[:, 1] > src_hw[:, 0],
                         (src_hw[:, 1] - src_hw[:, 0]) // 2,
                         0).astype(np.int64)
        t_valid = np.full(b, plan.t_size, dtype=np.int64)
        t_valid_w = t_valid
        t_src_h = side
        t_src_w = side
    else:
        # aspect mode: full-frame resample to per-image dims
        off_y = np.zeros(b, dtype=np.int64)
        off_x = np.zeros(b, dtype=np.int64)
        t_valid = t_out_hw[:, 0].astype(np.int64)
        t_valid_w = t_out_hw[:, 1].astype(np.int64)
        t_src_h = src_hw[:, 0].astype(np.int64)
        t_src_w = src_hw[:, 1].astype(np.int64)
    t0, t1, tf = _axis_coords(t_valid, t_src_h, off_y, plan.t_alloc_h,
                              plan.src_h)
    ok_t, starts_t, max_t, t_lo, t_frac, tt0, tt1, ttf = _band_rows_args(
        plan, plan.t_out, plan.t_alloc_h, plan.t_rows, t0, t1, tf, t_valid)

    # Shared band start must cover both outputs' needs: take the min and
    # verify the shared window still spans each output's highest owned
    # source row.
    starts = np.minimum(starts_r, starts_t)
    ok = ok_r and ok_t
    # re-relativize row indices to the shared start
    for i in range(b):
        for j in range(plan.n_bands):
            d_r = int(starts_r[i, j] - starts[i, j])
            d_t = int(starts_t[i, j] - starts[i, j])
            idx = i * plan.n_bands + j
            if d_r:
                rr0[idx] = np.clip(rr0[idx] + d_r, 0, plan.band_rows - 1)
                rr1[idx] = np.clip(rr1[idx] + d_r, 0, plan.band_rows - 1)
            if d_t:
                tt0[idx] = np.clip(tt0[idx] + d_t, 0, plan.band_rows - 1)
                tt1[idx] = np.clip(tt1[idx] + d_t, 0, plan.band_rows - 1)
            if (max_r[i, j] - starts[i, j] >= plan.band_rows
                    or max_t[i, j] - starts[i, j] >= plan.band_rows):
                ok = False
            if starts[i, j] + plan.band_rows > plan.src_h:
                ok = False  # DMA would run past the bucket

    # columns
    rc0, rc1, rcf = _axis_coords(r_out_hw[:, 1], src_hw[:, 1],
                                 np.zeros(b, np.int64), plan.r_out_w,
                                 plan.src_w)
    r_colbs, r_cols0, r_cols1, r_colf = _col_args(
        plan.src_w, plan.r_col_band, plan.r_out_w, rc0, rc1, rcf)
    tc0, tc1, tcf = _axis_coords(t_valid_w, t_src_w, off_x, plan.t_out_w,
                                 plan.src_w)
    t_colbs, t_cols0, t_cols1, t_colf = _col_args(
        plan.src_w, plan.t_col_band, plan.t_out_w, tc0, tc1, tcf)

    # Both outputs' vertical one-hot passes share one MXU matmul: the
    # row-index/fraction vectors are concatenated host-side so the kernel
    # builds a single (band_rows, M_r+M_t) weight matrix.
    return FusedArgs(
        band_starts=starts.astype(np.int32).reshape(-1),
        r_lo=r_lo.astype(np.int32).reshape(-1),
        t_lo=t_lo.astype(np.int32).reshape(-1),
        r_frac=r_frac.astype(np.int32).reshape(-1),
        t_frac=t_frac.astype(np.int32).reshape(-1),
        rows0=np.concatenate([rr0, tt0], axis=2),
        rows1=np.concatenate([rr1, tt1], axis=2),
        rowf=np.concatenate([rrf, ttf], axis=2),
        r_colbs=r_colbs, r_cols0=r_cols0, r_cols1=r_cols1, r_colf=r_colf,
        t_colbs=t_colbs, t_cols0=t_cols0, t_cols1=t_cols1, t_colf=t_colf,
        ok=ok)


def _kernel(plan: FusedPlan, interpret: bool):
    nb = plan.n_bands
    band_rows = plan.band_rows
    ck = 128
    cdtype = (jnp.bfloat16 if plan.compute_dtype == "bfloat16"
              else jnp.float32)
    aligned = (lambda v, m: v) if interpret else pl.multiple_of
    # Probe-only stage isolation (tools/kprobe.py): "dma" times the band
    # pipeline alone, "vert" adds the cast+vertical matmul, "" is the
    # full kernel. Output is garbage for non-"" values.
    debug_stage = os.environ.get("IMAGEPROCESSOR_FUSED_DEBUG_STAGE", "")

    k_r = plan.r_out_w // ck
    k_t = plan.t_out_w // ck

    def kernel(starts_ref, rlo_ref, tlo_ref,           # scalar prefetch
               rfrac_ref, tfrac_ref,
               src_ref,
               rows0_ref, rows1_ref, rowf_ref,
               rcbs_ref, rc0_ref, rc1_ref, rcf_ref,
               tcbs_ref, tc0_ref, tc1_ref, tcf_ref,
               out_r_ref, out_t_ref,
               band2, vband_r, vband_t, wcol_r, wcol_t, sems):
        b = pl.program_id(0)
        c = pl.program_id(1)
        j = pl.program_id(2)
        n_c = pl.num_programs(1)
        slot = b * nb + j

        # nbuf-deep band DMA pipeline: grid steps run sequentially, so
        # the scratch persists; step g waits on its own copy while the
        # copies for steps g+1..g+nbuf-1 stay in flight (pallas guide
        # §double-buffering, generalized). The prefetch targets the
        # NEXT steps' (b, c, band) coordinates across boundaries.
        # Bands stay INNERMOST: a (b, j, c) order (channels innermost,
        # to share the vertical weight build across a band's three
        # channel steps) measured 35% SLOWER — consecutive steps then
        # stride between channel planes and HBM sequential-read
        # locality is worth far more than the hoisted VPU build.
        g = (b * n_c + c) * nb + j
        total = plan.batch * n_c * nb
        nbuf = plan.nbuf
        bank = jax.lax.rem(g, nbuf)

        def dma_for(step, to_bank):
            nb_i = step // (n_c * nb)
            rem = jax.lax.rem(step, n_c * nb)
            nc_i = rem // nb
            nj_i = jax.lax.rem(rem, nb)
            s = aligned(starts_ref[nb_i * nb + nj_i], 8)
            return pltpu.make_async_copy(
                src_ref.at[nb_i, nc_i, pl.ds(s, band_rows), :],
                band2.at[to_bank], sems.at[to_bank])

        # Warmup: fill the pipeline with the first nbuf-1 copies.
        # (Probed alternatives that did NOT pay, kept out: an SMEM-
        # counter catch-up loop issuing several copies per step to
        # refill the queue after the horizontal burst (9.9k vs 10.4k —
        # the kernel is MXU-bound, so deeper DMA queues at nbuf 16/24
        # change nothing and the per-step SMEM bookkeeping costs 4%).)
        @pl.when(g == 0)
        def _():
            for s in range(min(nbuf - 1, total)):  # static bounds
                dma_for(g + s, jax.lax.rem(g + s, nbuf)).start()

        dma_for(g, bank).wait()

        @pl.when(g + nbuf - 1 < total)
        def _():
            dma_for(g + nbuf - 1, jax.lax.rem(g + nbuf - 1, nbuf)).start()

        if debug_stage == "dma":
            out_r_ref[0, 0, 0, 0] = band2[bank][0, 0]
            return

        # u8 -> (xor 0x80) -> bitcast i8 -> bf16: Mosaic has no direct
        # u8->float cast, and the i16 route was the kernel's entire
        # compute wall (measured 9.4k vs 16.4k img/s in isolation). The
        # XOR reinterprets u8 as exact (value - 128) in i8 — 4x denser
        # on the VPU — and the +128 correction is free: every one-hot
        # weight row sums to exactly 1, so it folds into the matmul
        # result as a constant.
        band_c = jax.lax.bitcast_convert_type(
            band2[bank] ^ jnp.uint8(0x80), jnp.int8).astype(cdtype)

        # Vertical pass for BOTH outputs in one matmul: each output's
        # row count is well under the MXU's 128 rows, so running them
        # separately wasted over half the array; the concatenated
        # (band_rows, M_r+M_t) one-hot weight fills it in one shot.
        m_cat = plan.r_rows + plan.t_rows
        r0 = rows0_ref[slot]
        r1 = rows1_ref[slot]
        rfc = rowf_ref[slot]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (band_rows, m_cat), 0)
        wr = (jnp.where(iota_v == r0, 1.0 - rfc, 0.0)
              + jnp.where(iota_v == r1, rfc, 0.0)).astype(cdtype)
        # The +128 de-bias (see the XOR cast above) is folded through to
        # the horizontal quantize: both passes' one-hot weights sum to 1
        # per output, so signed values ride the second matmul unchanged.
        # That drops a full-size VPU add per band step AND halves the
        # scratch quantization step (signed bf16 [-128,127]: max |ULP|
        # 0.5 vs 1.0 for biased [0,255] — measured +4 dB). Mosaic
        # requires a 32-bit matmul accumulator, so the bf16 round still
        # happens in the cast.
        vcat = jax.lax.dot_general(
            wr, band_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdtype)
        # Accumulate each band's vertical result into a FULL-HEIGHT
        # scratch at its output-row offset. The horizontal pass then runs
        # once per (b, c) on the whole image instead of once per band:
        # with only ~48 rows per band every weight tile did a single MXU
        # pass, so per-band horizontal matmuls were weight-load
        # latency-bound (measured: they doubled the step time).
        # Masked store: the first `frac` rows of the chunk are owned by
        # the PREVIOUS band (already correct in the scratch) — keep them.
        # The scratch holds all channels stacked ((C*alloc_h, src_w)) so
        # the horizontal pass can run ONE weight pass for the whole
        # image: alloc heights are multiples of 8, so the per-channel
        # section offset keeps the store 8-aligned.
        rlo = aligned(c * plan.r_alloc_h + rlo_ref[slot], 8)
        tlo = aligned(c * plan.t_alloc_h + tlo_ref[slot], 8)
        # frac < 8 always (chunk starts are floor-8 of the first owned
        # row), so only the first 8 rows need the read-modify-write;
        # the tail stores straight through (the full-chunk RMW moved
        # ~0.5 GB/batch of VMEM traffic at large resize outputs).
        iota_8 = jax.lax.broadcasted_iota(jnp.int32, (8, plan.src_w), 0)
        head_r = vband_r[pl.ds(rlo, 8)]
        vband_r[pl.ds(rlo, 8)] = jnp.where(
            iota_8 < rfrac_ref[slot], head_r, vcat[:8])
        vband_r[pl.ds(rlo + 8, plan.r_rows - 8)] = vcat[8:plan.r_rows]
        head_t = vband_t[pl.ds(tlo, 8)]
        vband_t[pl.ds(tlo, 8)] = jnp.where(
            iota_8 < tfrac_ref[slot], head_t, vcat[plan.r_rows:plan.r_rows + 8])
        vband_t[pl.ds(tlo + 8, plan.t_rows - 8)] = vcat[plan.r_rows + 8:]

        if debug_stage == "vert":
            return

        # Horizontal one-hot weights are identical for every (c, j) step
        # of an image — build them ONCE per image into scratch instead of
        # re-running the iota/where construction on all C*NB steps (the
        # VPU build cost rivaled the matmuls themselves).
        @pl.when((c == 0) & (j == 0))
        def _build_col_weights():  # noqa: F841 — traced via pl.when
            for q in range(k_r):
                i0 = rc0_ref[b * k_r + q]
                i1 = rc1_ref[b * k_r + q]
                f = rcf_ref[b * k_r + q]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (plan.r_col_band, ck), 0)
                wcol_r[q] = (jnp.where(iota == i0, 1.0 - f, 0.0)
                             + jnp.where(iota == i1, f, 0.0)).astype(cdtype)
            for q in range(k_t):
                i0 = tc0_ref[b * k_t + q]
                i1 = tc1_ref[b * k_t + q]
                f = tcf_ref[b * k_t + q]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (plan.t_col_band, ck), 0)
                wcol_t[q] = (jnp.where(iota == i0, 1.0 - f, 0.0)
                             + jnp.where(iota == i1, f, 0.0)).astype(cdtype)

        def resample(vband_ref, wcol_ref, cbs_ref, kk, cband, out_ref,
                     alloc_h):
            for q in range(kk):
                if cband >= plan.src_w:
                    sub = vband_ref[:]   # full width: static slice
                else:
                    cs = aligned(cbs_ref[b, q], 128)
                    sub = vband_ref[:, pl.ds(cs, cband)]
                w = wcol_ref[q]
                chunk = jnp.dot(sub, w, preferred_element_type=jnp.float32)
                # +128 de-biases the signed vertical scratch (the XOR-cast
                # correction, folded through both one-hot passes).
                qv = jnp.clip(jnp.floor((chunk + 128.0) * (257.0 / 256.0)),
                              0.0, 255.0)
                qv = qv.astype(jnp.int32).astype(jnp.uint8)
                for ci in range(plan.channels):
                    out_ref[0, ci, :, q * ck:(q + 1) * ck] = (
                        qv[ci * alloc_h:(ci + 1) * alloc_h])

        # Horizontal pass ONCE PER IMAGE, on the completed all-channel
        # vertical scratch: the one-hot weights are identical across
        # channels, and the matmul is MXU weight-load-bound (17 weight
        # tiles for a 2176-column source window), so stacking the three
        # channels' rows through one weight pass cuts the stalls 3x.
        # (A per-band incremental variant measured 9.7k vs 10.4k img/s:
        # 30x the weight-tile reloads cost more than the burst; the
        # burst itself is hidden by the catch-up DMA issue above.)
        @pl.when((c == n_c - 1) & (j == nb - 1))
        def _horizontal():
            resample(vband_r, wcol_r, rcbs_ref, k_r, plan.r_col_band,
                     out_r_ref, plan.r_alloc_h)
            resample(vband_t, wcol_t, tcbs_ref, k_t, plan.t_col_band,
                     out_t_ref, plan.t_alloc_h)

    return kernel


@functools.lru_cache(maxsize=32)
def _build_call(plan: FusedPlan, interpret: bool):
    cdtype = (jnp.bfloat16 if plan.compute_dtype == "bfloat16"
              else jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(plan.batch, plan.channels, plan.n_bands),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]      # src
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3         # row args
        + [pl.BlockSpec(memory_space=pltpu.SMEM),             # r colbs
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.SMEM),             # t colbs
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, plan.channels, plan.r_alloc_h, plan.r_out_w),
                         lambda b, c, j, *s: (b, 0, 0, 0)),
            pl.BlockSpec((1, plan.channels, plan.t_alloc_h, plan.t_out_w),
                         lambda b, c, j, *s: (b, 0, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((plan.nbuf, plan.band_rows, plan.src_w), jnp.uint8),
            pltpu.VMEM((plan.channels * plan.r_alloc_h, plan.src_w),
                       cdtype),
            pltpu.VMEM((plan.channels * plan.t_alloc_h, plan.src_w),
                       cdtype),
            pltpu.VMEM((plan.r_out_w // 128, plan.r_col_band, 128), cdtype),
            pltpu.VMEM((plan.t_out_w // 128, plan.t_col_band, 128), cdtype),
            pltpu.SemaphoreType.DMA((plan.nbuf,)),
        ],
    )
    return pl.pallas_call(
        _kernel(plan, interpret),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((plan.batch, plan.channels,
                                  plan.r_alloc_h, plan.r_out_w), jnp.uint8),
            jax.ShapeDtypeStruct((plan.batch, plan.channels,
                                  plan.t_alloc_h, plan.t_out_w), jnp.uint8),
        ),
        interpret=interpret,
        # XLA sometimes promotes small pallas OUTPUT arrays into VMEM
        # (S(1)), which together with kernel scratch can blow the default
        # 16MB scoped budget at small batch sizes; raise the cap.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def fused_resample(src_chw_u8, plan: FusedPlan, args: FusedArgs,
                   *, interpret: bool = False):
    """(B, C, H, W) u8 -> (resize (B,C,r_alloc,r_out_w),
    thumb (B,C,t_alloc,t_out_w)) u8; caller crops the valid regions."""
    call = _build_call(plan, interpret)
    return call(
        jnp.asarray(args.band_starts), jnp.asarray(args.r_lo),
        jnp.asarray(args.t_lo), jnp.asarray(args.r_frac),
        jnp.asarray(args.t_frac),
        src_chw_u8,
        jnp.asarray(args.rows0), jnp.asarray(args.rows1),
        jnp.asarray(args.rowf),
        jnp.asarray(args.r_colbs), jnp.asarray(args.r_cols0),
        jnp.asarray(args.r_cols1), jnp.asarray(args.r_colf),
        jnp.asarray(args.t_colbs), jnp.asarray(args.t_cols0),
        jnp.asarray(args.t_cols1), jnp.asarray(args.t_colf),
    )
