"""The flagship compiled model: a fused multi-output processing pipeline.

For one (plan, bucket, batch-size) the model traces a single XLA program
that reads the uint8 source batch once from HBM and produces every
requested artifact — e.g. the service default (thumbnail 200 crop +
resize 1024x768 keep-aspect; reference handler/image/image.go:252-275)
compiles to ONE program with two outputs. XLA CSEs the shared uint8->f32
cast and fuses the elementwise tails; the expensive resample passes are
per-op but all stay device-resident. This replaces the reference's
sequential per-op loop with per-op re-encode round trips
(image_processor.go:64-95).

Shape policy (XLA requires static shapes):
* source canvas  = resolution bucket (B, Hb, Wb, 3) uint8,
* resize canvas  = the requested (height, width) — keep-aspect outputs
  always fit inside it (min-ratio rule),
* thumbnail crop = (size, size); thumbnail aspect = per-group canvas
  quantized up to /64 to bound recompiles,
* watermark/grayscale/flip = full bucket canvas,
* per-image true extents travel as (B, 2) int32 tensors.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Callable

import os

import jax
import jax.numpy as jnp
import numpy as np

from imageprocessor_tpu.domain import OperationType
from imageprocessor_tpu.models.plan import NormalizedOp, OperationPlan
from imageprocessor_tpu.ops import pallas_fused, pallas_resample
from imageprocessor_tpu.ops.extra import (
    batched_crop,
    batched_flip,
    batched_grayscale,
    batched_grayscale_planar,
    batched_rotate,
)
from imageprocessor_tpu.ops.resize import batched_resize_bilinear
from imageprocessor_tpu.ops.thumbnail import batched_thumbnail
from imageprocessor_tpu.ops.watermark import (
    _pad_tile,
    batched_watermark_core,
    batched_watermark_core_planar,
    quantize_tile,
    rasterize_text,
    resolve_color,
)

# Ops the fully-planar (CHW end-to-end) pipeline supports. Plans outside
# this set fall back to the HWC layout (with its on-device transpose).
PLANAR_OPS = {OperationType.RESIZE, OperationType.THUMBNAIL,
              OperationType.WATERMARK, OperationType.GRAYSCALE}

# Pallas path limits: beyond this bucket width the kernel's f32 band
# exceeds the VMEM budget; fall back to the XLA gather path.
_PALLAS_MAX_W = 6144

# Steepest downscale the quantized Pallas band geometry covers. Beyond
# it the per-tile source band no longer spans every sampled row, and
# make_args would silently clamp indices into the band (corrupt
# pixels) — so ops past the cap must take the XLA gather path instead:
# _pallas_setup skips them, and the engine routes such groups to the
# HWC layout (max_resample_scale) where that fallback exists.
_MAX_QUANT_SCALE = 32.0


def _quant_scale(s: float) -> float:
    q = 1.0
    while q < s and q < _MAX_QUANT_SCALE:
        q *= 2.0
    return q


@dataclass(frozen=True)
class OpOutputSpec:
    """Static output-canvas description for one op in a compiled program."""

    op: NormalizedOp
    canvas: tuple[int, int]  # (out_h, out_w); (0,0) = full bucket canvas


def _quant_up(n: int, m: int) -> int:
    return -(-n // m) * m


def plan_output_specs(plan: OperationPlan, bucket: tuple[int, int],
                      aspect_long_sides: dict[int, int] | None = None,
                      ) -> tuple[OpOutputSpec, ...]:
    """Resolve static canvases. `aspect_long_sides` maps op-index -> the
    max long side needed by the current group for aspect-mode thumbnails
    (content-dependent; quantized /64 by the caller)."""
    specs = []
    for i, op in enumerate(plan.ops):
        if op.type is OperationType.RESIZE:
            specs.append(OpOutputSpec(op, (op.height, op.width)))
        elif op.type is OperationType.THUMBNAIL:
            if op.crop_to_fit:
                specs.append(OpOutputSpec(op, (op.size, op.size)))
            else:
                long_side = (aspect_long_sides or {}).get(i, op.size)
                long_side = max(_quant_up(long_side, 64), op.size)
                specs.append(OpOutputSpec(op, (long_side, long_side)))
        elif op.type is OperationType.CROP:
            specs.append(OpOutputSpec(op, (op.height, op.width)))
        else:  # watermark / grayscale / flip / rotate: full bucket canvas
            specs.append(OpOutputSpec(op, (0, 0)))
    return tuple(specs)


_compile_cache_enabled = False


def enable_compile_cache(path: str) -> None:
    """Persist XLA compilations across worker restarts (the 12 MP fused
    program costs 15-300 s to compile cold). Idempotent; "" disables."""
    global _compile_cache_enabled
    if not path or _compile_cache_enabled:
        return
    import os as _os

    _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _compile_cache_enabled = True


class PipelineModel:
    """Builds and caches fused programs keyed by (plan, bucket, B, canvases).

    use_pallas: resample ops run through the Pallas planar kernel
    (ops/pallas_resample.py) when the backend is TPU and the bucket fits
    the VMEM budget; defaults to auto-detect. The XLA gather path remains
    as fallback and as the CPU/test implementation.
    """

    def __init__(self, device=None, use_pallas: bool | None = None,
                 pallas_interpret: bool = False,
                 resample_dtype: str = "bfloat16"):
        self._cache: dict[tuple, Callable] = {}
        # Device-resident index-array cache: a run's Pallas/fused geometry
        # depends only on (plan, bucket, batch, per-image dims). Batches
        # with recurring dims (the common case) reuse the device arrays,
        # avoiding ~20 small H2D transfers per step — which on high-latency
        # links (the dev tunnel) otherwise dominate the step time.
        self._args_cache: dict[tuple, Any] = {}
        self._args_order: list[tuple] = []
        self._lock = threading.Lock()
        self._device = device
        self._pallas_interpret = pallas_interpret
        enable_compile_cache(os.environ.get("DEVICE_COMPILE_CACHE_DIR", ""))
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # bf16 matmuls keep PSNR well above the 45 dB contract (pixels are
        # exact in bf16; only lerp weights round) at ~4x the MXU rate;
        # set "float32" for bit-level oracle parity.
        self.resample_dtype = resample_dtype

    def _pallas_eligible(self, op: NormalizedOp, bucket: tuple[int, int]) -> bool:
        # bucket[0] % 8: the kernels' DMA band starts floor-8-align after
        # clamping to src_h - band_rows; a non-multiple-of-8 height (the
        # ladder goes exact-size past 12288) leaves the bottom band up
        # to 7 rows short and make_args would clip onto wrong rows.
        if (not self.use_pallas or bucket[1] > _PALLAS_MAX_W
                or bucket[0] % 8):
            return False
        return op.type in (OperationType.RESIZE, OperationType.THUMBNAIL)

    # -- program construction -------------------------------------------------

    def _build(self, plan: OperationPlan, specs: tuple[OpOutputSpec, ...],
               wm_static: dict[int, tuple[int, int, str]],
               pallas_plans: dict[int, pallas_resample.ResamplePlan],
               layout: str = "hwc", fused_meta=None):
        """wm_static: op index -> (tile_h, tile_w, position) statics.

        layout='chw': the batch arrives planar (B, 3, H, W) — decoded
        straight to planes by the native codec — and every output stays
        planar; no transpose appears anywhere in the program. Only valid
        when all ops are in PLANAR_OPS and resamples go through Pallas.
        """
        interpret = self._pallas_interpret

        if layout == "chw":
            def step_chw(imgs_chw, src_hw, out_hws, wm_args, presample_args):
                fused_outs = {}
                if fused_meta is not None:
                    i_t, i_r, fplan = fused_meta
                    fcall = pallas_fused._build_call(fplan, interpret)
                    fa = presample_args["fused"]
                    rz, th = fcall(fa[0], fa[1], fa[2], fa[3], fa[4],
                                   imgs_chw, *fa[5:])
                    fused_outs[i_r] = rz[:, :, :specs[i_r].canvas[0],
                                         :specs[i_r].canvas[1]]
                    fused_outs[i_t] = th[:, :, :specs[i_t].canvas[0],
                                         :specs[i_t].canvas[1]]
                outputs = []
                for i, spec in enumerate(specs):
                    op = spec.op
                    if i in fused_outs:
                        outputs.append(fused_outs[i])
                    elif i in pallas_plans:
                        rp = pallas_plans[i]
                        call = pallas_resample._build_call(rp, interpret)
                        a = presample_args[str(i)]
                        out_p = call(a[0], imgs_chw, *a[1:])
                        outputs.append(
                            out_p[:, :, :spec.canvas[0], :spec.canvas[1]])
                    elif op.type is OperationType.WATERMARK:
                        th, tw, position = wm_static[i]
                        tile_arr, color, alpha, wpx, hpx, ascent = wm_args[i]
                        outputs.append(batched_watermark_core_planar(
                            imgs_chw, src_hw, tile_arr, color, alpha, wpx,
                            hpx, ascent, position=position, tile_h=th,
                            tile_w=tw))
                    elif op.type is OperationType.GRAYSCALE:
                        outputs.append(batched_grayscale_planar(imgs_chw))
                    else:
                        raise NotImplementedError(
                            f"{op.type} unsupported in planar layout")
                return tuple(outputs)

            return step_chw

        def step(imgs_u8, src_hw, out_hws, wm_args, presample_args):
            outputs = []
            planar = None
            if pallas_plans:
                planar = jnp.transpose(imgs_u8, (0, 3, 1, 2))
            for i, spec in enumerate(specs):
                op = spec.op
                if i in pallas_plans:
                    rp = pallas_plans[i]
                    call = pallas_resample._build_call(rp, interpret)
                    a = presample_args[str(i)]
                    out_p = call(a[0], planar, *a[1:])
                    out = jnp.transpose(out_p, (0, 2, 3, 1))
                    # Kernel canvas is 128-padded; crop to the spec canvas
                    # so downstream consumers see identical shapes on both
                    # the Pallas and XLA paths.
                    outputs.append(out[:, :spec.canvas[0], :spec.canvas[1]])
                elif op.type is OperationType.RESIZE:
                    outputs.append(batched_resize_bilinear(
                        imgs_u8, src_hw, out_hws[i],
                        out_h=spec.canvas[0], out_w=spec.canvas[1]))
                elif op.type is OperationType.THUMBNAIL:
                    if op.crop_to_fit:
                        outputs.append(batched_thumbnail(imgs_u8, src_hw, op.size))
                    else:
                        outputs.append(batched_resize_bilinear(
                            imgs_u8, src_hw, out_hws[i],
                            out_h=spec.canvas[0], out_w=spec.canvas[1]))
                elif op.type is OperationType.WATERMARK:
                    th, tw, position = wm_static[i]
                    tile_arr, color, alpha, wpx, hpx, ascent = wm_args[i]
                    outputs.append(batched_watermark_core(
                        imgs_u8, src_hw, tile_arr, color, alpha, wpx, hpx,
                        ascent, position=position, tile_h=th, tile_w=tw))
                elif op.type is OperationType.GRAYSCALE:
                    outputs.append(batched_grayscale(imgs_u8))
                elif op.type is OperationType.FLIP:
                    outputs.append(batched_flip(imgs_u8, src_hw,
                                                direction=op.direction))
                elif op.type is OperationType.CROP:
                    ch = min(op.height, imgs_u8.shape[1])
                    cw = min(op.width, imgs_u8.shape[2])
                    outputs.append(batched_crop(imgs_u8, src_hw,
                                                x=op.x, y=op.y,
                                                width=cw, height=ch))
                elif op.type is OperationType.ROTATE:
                    outputs.append(batched_rotate(imgs_u8, src_hw, op.angle))
                else:
                    raise NotImplementedError(
                        f"{op.type} has no batched kernel; engine uses the "
                        "per-image path")
            return tuple(outputs)

        return step

    def _build_jitted(self, plan, specs, wm_static, pallas_plans,
                      layout: str = "hwc", fused_meta=None):
        # Donating the source batch lets XLA alias the watermark output onto
        # the input buffer: the full-resolution "copy" becomes an in-place
        # region blend (the input is never reused after a step). Only a
        # watermark output shares the input's exact shape/dtype AND can be
        # computed in place, so donation is gated on one being present —
        # donating elsewhere just drops the buffer and emits XLA's
        # "donated buffers were not usable" warning on every step.
        donate = ((0,) if any(op.type is OperationType.WATERMARK
                              for op in plan.ops) else ())
        return jax.jit(self._build(plan, specs, wm_static, pallas_plans,
                                   layout, fused_meta),
                       donate_argnums=donate)

    # -- public API ------------------------------------------------------------

    def supports_planar(self, plan: OperationPlan,
                        bucket: tuple[int, int]) -> bool:
        """True when the whole plan can run in the CHW end-to-end layout.
        bucket=(1, 1) is the plan-only probe (geometry checked later)."""
        if not self.use_pallas:
            return False
        if bucket != (1, 1) and (bucket[1] > _PALLAS_MAX_W
                                 or bucket[0] % 8):  # see _pallas_eligible
            return False
        return all(op.type in PLANAR_OPS for op in plan.ops)

    def get_program(self, plan: OperationPlan, bucket: tuple[int, int],
                    batch: int, specs: tuple[OpOutputSpec, ...],
                    pallas_plans: dict[int, pallas_resample.ResamplePlan]
                    | None = None, layout: str = "hwc", fused_meta=None):
        pallas_plans = pallas_plans or {}
        wm_static: dict[int, tuple[int, int, str]] = {}
        for i, op in enumerate(plan.ops):
            if op.type is OperationType.WATERMARK:
                tile = quantize_tile(rasterize_text(op.text, op.font_size))
                th, tw = tile.coverage.shape
                wm_static[i] = (th, tw, op.position)
        key = (plan.compile_key(), bucket, batch,
               tuple(s.canvas for s in specs),
               tuple(sorted(wm_static.items())),
               tuple(sorted(pallas_plans.items())), layout, fused_meta)
        with self._lock:
            prog = self._cache.get(key)
            if prog is None:
                prog = self._build_jitted(plan, specs, wm_static,
                                          pallas_plans, layout, fused_meta)
                self._cache[key] = prog
        return prog

    def get_raw_step(self, plan: OperationPlan, specs, pallas_plans=None,
                     layout: str = "hwc", fused_meta=None):
        """Un-jitted step function — for callers composing it into larger
        programs (e.g. the benchmark's on-device fori_loop harness)."""
        pallas_plans = pallas_plans or {}
        wm_static: dict[int, tuple[int, int, str]] = {}
        for i, op in enumerate(plan.ops):
            if op.type is OperationType.WATERMARK:
                tile = quantize_tile(rasterize_text(op.text, op.font_size))
                th, tw = tile.coverage.shape
                wm_static[i] = (th, tw, op.position)
        return self._build(plan, specs, wm_static, pallas_plans, layout,
                           fused_meta)

    def prepare_wm_args(self, plan: OperationPlan) -> dict[int, tuple]:
        """Runtime watermark inputs (tile content, color, metrics).
        Device-cached per watermark spec — repeated steps transfer nothing."""
        # The op INDEX is part of the key: the returned dict is keyed by
        # position in the plan, so [watermark] and [thumbnail, watermark]
        # with identical params must not share a cache entry (the cached
        # {0: ...} would crash the second plan's step() with KeyError).
        key = tuple((i, op.text, op.font_size, op.font_color, op.opacity)
                    for i, op in enumerate(plan.ops)
                    if op.type is OperationType.WATERMARK)
        with self._lock:
            cached = self._args_cache.get(("wm", key))
        if cached is not None:
            return cached
        out: dict[int, tuple] = {}
        for i, op in enumerate(plan.ops):
            if op.type is not OperationType.WATERMARK:
                continue
            tile = quantize_tile(rasterize_text(op.text, op.font_size))
            r, g, b, a = resolve_color(op.font_color, op.opacity)
            out[i] = (
                jnp.asarray(_pad_tile(tile)),
                jnp.asarray([r, g, b], dtype=jnp.float32),
                jnp.float32(a / 255.0),
                jnp.int32(tile.width_px),
                jnp.int32(tile.height_px),
                jnp.int32(tile.ascent),
            )
        with self._lock:
            self._args_cache[("wm", key)] = out
            self._args_order.append(("wm", key))
        return out

    # -- bounded device-arg / program caches (shared with the engine) --------

    def arg_cache_get(self, key):
        """Fetch from the bounded device-arg cache (None on miss)."""
        with self._lock:
            return self._args_cache.get(key)

    def arg_cache_put(self, key, value, pin: bool = False) -> None:
        """Insert into the device-arg cache. Evicts FIFO past 256 entries;
        pin=True keeps the entry out of the eviction order (geometry
        blacklists must be permanent for the process)."""
        with self._lock:
            self._args_cache[key] = value
            if pin:
                return
            self._args_order.append(key)
            while len(self._args_order) > 256:
                self._args_cache.pop(self._args_order.pop(0), None)

    def prog_cache_get(self, key):
        """Fetch a compiled program by key (None on miss)."""
        with self._lock:
            return self._cache.get(key)

    def prog_cache_put(self, key, prog) -> None:
        with self._lock:
            self._cache[key] = prog

    def _fused_setup(self, plan: OperationPlan, bucket: tuple[int, int],
                     batch: int, src_hw: np.ndarray,
                     out_hws: dict[int, np.ndarray]):
        """Try the single-sweep fused resize+thumbnail kernel for the
        default service plan shape. Returns (fused_meta, arrays) or
        (None, None) when the plan/geometry doesn't fit."""
        i_t = i_r = None
        for i, op in enumerate(plan.ops):
            if op.type is OperationType.THUMBNAIL and i_t is None:
                i_t = i
            elif op.type is OperationType.RESIZE and i_r is None:
                i_r = i
        if i_t is None or i_r is None or i_r not in out_hws:
            return None, None
        aspect_t = not plan.ops[i_t].crop_to_fit
        if aspect_t and i_t not in out_hws:
            return None, None
        r_out_hw = np.asarray(out_hws[i_r], dtype=np.int32)
        t_size = plan.ops[i_t].size
        sc_rh = src_hw[:, 0] / np.maximum(r_out_hw[:, 0], 1)
        sc_rw = src_hw[:, 1] / np.maximum(r_out_hw[:, 1], 1)
        if aspect_t:
            # aspect thumbnails are a second keep-aspect resize
            t_out_hw = np.asarray(out_hws[i_t], dtype=np.int32)
            sc_th = src_hw[:, 0] / np.maximum(t_out_hw[:, 0], 1)
            sc_tw = src_hw[:, 1] / np.maximum(t_out_hw[:, 1], 1)
            t_canvas = int(max(t_size, t_out_hw[:, 0].max(),
                               t_out_hw[:, 1].max()))
        else:
            t_out_hw = None
            side = np.minimum(src_hw[:, 0], src_hw[:, 1])
            sc_th = sc_tw = side / max(t_size, 1)
            t_canvas = t_size
        if (sc_rh.min() < 1.0 or sc_th.min() < 1.0
                or sc_tw.min() < 1.0):
            return None, None  # upscales blow up the per-band row chunk
        fplan = pallas_fused.make_fused_plan(
            batch, bucket[0], bucket[1],
            plan.ops[i_r].height, plan.ops[i_r].width, t_canvas,
            float(sc_rh.min()), float(sc_rh.max()),
            float(sc_th.min()), float(sc_th.max()),
            float(sc_rw.max()), float(sc_tw.max()),
            compute_dtype=self.resample_dtype)
        fargs = pallas_fused.make_fused_args(fplan, src_hw, r_out_hw,
                                             t_out_hw)
        if not fargs.ok:
            return None, None
        arrays = tuple(jnp.asarray(v) for v in (
            fargs.band_starts, fargs.r_lo, fargs.t_lo,
            fargs.r_frac, fargs.t_frac,
            fargs.rows0, fargs.rows1, fargs.rowf,
            fargs.r_colbs, fargs.r_cols0, fargs.r_cols1, fargs.r_colf,
            fargs.t_colbs, fargs.t_cols0, fargs.t_cols1, fargs.t_colf))
        return (i_t, i_r, fplan), arrays

    @staticmethod
    def _resample_geometry(op: NormalizedOp, i: int, batch: int,
                           src_hw: np.ndarray,
                           out_hws: dict[int, np.ndarray]):
        """Per-op source/output geometry shared by the Pallas arg builder
        and the scale-eligibility check: (eff_hw, out_hw, crop_yx,
        crop_hw), or None when the op has no per-image output dims yet."""
        if op.type is OperationType.THUMBNAIL and op.crop_to_fit:
            side = np.minimum(src_hw[:, 0], src_hw[:, 1]).astype(np.int64)
            crop_yx = np.stack([
                np.where(src_hw[:, 0] > src_hw[:, 1],
                         (src_hw[:, 0] - src_hw[:, 1]) // 2, 0),
                np.where(src_hw[:, 1] > src_hw[:, 0],
                         (src_hw[:, 1] - src_hw[:, 0]) // 2, 0),
            ], axis=1).astype(np.int64)
            crop_hw = np.stack([side, side], axis=1)
            out_hw = np.tile(np.asarray([[op.size, op.size]], np.int32),
                             (batch, 1))
            return crop_hw, out_hw, crop_yx, crop_hw
        if i not in out_hws:
            return None
        out_hw = np.asarray(out_hws[i], dtype=np.int32)
        return src_hw, out_hw, None, None

    @classmethod
    def max_resample_scale(cls, plan: OperationPlan, src_hw: np.ndarray,
                           out_hws: dict[int, np.ndarray]) -> float:
        """Steepest per-axis downscale any resample op in the plan needs
        for this group (crop-thumbnail windows included). The engine
        keeps groups above _MAX_QUANT_SCALE out of the planar layout:
        the Pallas band geometry cannot cover them, and the XLA fallback
        only exists on the HWC path."""
        src_hw = np.asarray(src_hw, dtype=np.int64)
        batch = src_hw.shape[0]
        worst = 1.0
        for i, op in enumerate(plan.ops):
            if op.type not in (OperationType.RESIZE,
                               OperationType.THUMBNAIL):
                continue
            geo = cls._resample_geometry(op, i, batch, src_hw, out_hws)
            if geo is None:
                continue
            eff, out_hw, _, _ = geo
            worst = max(worst,
                        float(np.max(eff[:, 0]
                                     / np.maximum(out_hw[:, 0], 1))),
                        float(np.max(eff[:, 1]
                                     / np.maximum(out_hw[:, 1], 1))))
        return worst

    def _pallas_setup(self, plan: OperationPlan, bucket: tuple[int, int],
                      batch: int, src_hw: np.ndarray,
                      out_hws: dict[int, np.ndarray],
                      specs: tuple[OpOutputSpec, ...],
                      skip: tuple = ()):
        """Host-side: eligibility, static plans, per-batch index arrays.

        The returned args dict is str-keyed (the op index as a string):
        it rides through jax.jit as a pytree alongside the "fused" entry,
        and mixed int/str dict keys break pytree key sorting."""
        pallas_plans: dict[int, pallas_resample.ResamplePlan] = {}
        pallas_args: dict[str, tuple] = {}
        for i, op in enumerate(plan.ops):
            if i in skip:
                continue
            if not self._pallas_eligible(op, bucket):
                continue
            spec = specs[i]
            geo = self._resample_geometry(op, i, batch, src_hw, out_hws)
            if geo is None:
                continue
            eff, out_hw, crop_yx, crop_hw = geo
            s_h = float(np.max(eff[:, 0] / np.maximum(out_hw[:, 0], 1)))
            s_w = float(np.max(eff[:, 1] / np.maximum(out_hw[:, 1], 1)))
            if s_h > _MAX_QUANT_SCALE or s_w > _MAX_QUANT_SCALE:
                # Steeper than the band geometry covers: leave the op to
                # the XLA gather path (HWC layout) rather than clamp
                # indices into a too-small band (silent corruption).
                continue
            rp = pallas_resample.make_plan(
                batch, 3, bucket[0], bucket[1],
                spec.canvas[0], spec.canvas[1],
                _quant_scale(s_h), _quant_scale(s_w),
                compute_dtype=self.resample_dtype)
            args = pallas_resample.make_args(rp, src_hw, out_hw,
                                             crop_yx=crop_yx, crop_hw=crop_hw)
            pallas_plans[i] = rp
            pallas_args[str(i)] = tuple(jnp.asarray(v) for v in (
                args.band_starts, args.rows0, args.rows1, args.rowf,
                args.col_starts, args.cols0, args.cols1, args.colf))
        return pallas_plans, pallas_args

    def run(self, plan: OperationPlan, imgs_u8: np.ndarray,
            src_hw: np.ndarray, out_hws: dict[int, np.ndarray],
            specs: tuple[OpOutputSpec, ...], layout: str = "hwc"
            ) -> list[Any]:
        """Execute the fused program for one padded group.

        imgs_u8: (B, Hb, Wb, 3) for layout='hwc' or (B, 3, Hb, Wb) for
        layout='chw'; src_hw: (B, 2); out_hws: op index -> (B, 2) valid
        output dims (only needed for resample ops). Returns device arrays
        in op order (same layout as the input).
        """
        b = imgs_u8.shape[0]
        if layout == "chw":
            hb, wb = imgs_u8.shape[2], imgs_u8.shape[3]
        else:
            hb, wb = imgs_u8.shape[1], imgs_u8.shape[2]
        src_hw = np.asarray(src_hw, dtype=np.int32)

        geo_key = (plan.compile_key(), (hb, wb), b, layout,
                   src_hw.tobytes(),
                   tuple(sorted((k, np.asarray(v, np.int32).tobytes())
                                for k, v in out_hws.items())))
        cached = self.arg_cache_get(geo_key)
        if cached is not None:
            fused_meta, pallas_plans, pallas_args, hws, src_hw_j = cached
        else:
            fused_meta, fused_arrays = (None, None)
            if layout == "chw":
                fused_meta, fused_arrays = self._fused_setup(
                    plan, (hb, wb), b, src_hw, out_hws)
            skip = fused_meta[:2] if fused_meta else ()
            pallas_plans, pallas_args = self._pallas_setup(
                plan, (hb, wb), b, src_hw, out_hws, specs, skip=skip)
            if fused_arrays is not None:
                pallas_args["fused"] = fused_arrays
            dummy = np.zeros((b, 2), dtype=np.int32)
            hws = tuple(jnp.asarray(np.asarray(out_hws.get(i, dummy),
                                               dtype=np.int32))
                        for i in range(len(plan.ops)))
            src_hw_j = jnp.asarray(src_hw)
            self.arg_cache_put(geo_key, (fused_meta, pallas_plans,
                                         pallas_args, hws, src_hw_j))
        prog = self.get_program(plan, (hb, wb), b, specs, pallas_plans,
                                layout, fused_meta)
        wm_args = self.prepare_wm_args(plan)
        outs = prog(jnp.asarray(imgs_u8), src_hw_j, hws, wm_args,
                    pallas_args)
        return list(outs)

    def run_sharded(self, mesh, plan: OperationPlan, imgs_u8: np.ndarray,
                    src_hw: np.ndarray, out_hws: dict[int, np.ndarray],
                    specs: tuple[OpOutputSpec, ...], layout: str = "hwc"
                    ) -> list[Any]:
        """Data-parallel execution over a `jax.sharding.Mesh` 'data' axis.

        The step runs under shard_map (required for Pallas kernels on a
        mesh — XLA cannot auto-partition custom calls), batch axis sharded,
        watermark args replicated. Every per-image index array shards
        cleanly because its leading axis is batch-major; the Pallas plans
        are built for the LOCAL batch. Images are independent, so no
        collectives cross the ICI — the mesh buys pure throughput.

        Geometry and the jitted shard_map program are cached exactly like
        `run` (this is the serving engine's hot path on multi-chip hosts,
        ProcessingEngine.device_group): recurring batch geometries reuse
        the device-resident index arrays and the compiled executable.
        """
        n = int(mesh.shape["data"])
        b = imgs_u8.shape[0]
        if b % n != 0:
            raise ValueError(f"batch {b} not divisible by data axis {n}")
        b_local = b // n
        if layout == "chw":
            hb, wb = imgs_u8.shape[2], imgs_u8.shape[3]
        else:
            hb, wb = imgs_u8.shape[1], imgs_u8.shape[2]
        src_hw = np.asarray(src_hw, dtype=np.int32)

        geo_key = ("sh", plan.compile_key(), (hb, wb), b, layout, n,
                   src_hw.tobytes(),
                   tuple(sorted((k, np.asarray(v, np.int32).tobytes())
                                for k, v in out_hws.items())))
        cached = self.arg_cache_get(geo_key)
        if cached is not None:
            fused_meta, local_plans, global_args, hws, src_hw_j = cached
        else:
            # Plan geometry must come from the GLOBAL batch (scale
            # mins/maxes over every image, not just shard 0's slice); the
            # local kernels reuse that geometry with only the batch size
            # swapped, so the P("data")-sharded global index arrays line
            # up by construction. The index arrays themselves are exactly
            # what _fused_setup built for the global plan — reuse them.
            fused_meta, fused_arrays = (None, None)
            if layout == "chw":
                fused_meta_g, fused_arrays = self._fused_setup(
                    plan, (hb, wb), b, src_hw, out_hws)
                if fused_meta_g is not None:
                    i_t, i_r, fplan_g = fused_meta_g
                    fused_meta = (i_t, i_r, pallas_fused.FusedPlan(
                        **{**fplan_g.__dict__, "batch": b_local}))
            skip = fused_meta[:2] if fused_meta else ()
            # Per-op pallas plans: geometry (quantized scales -> tile/band
            # rows) is a MAX over the batch, so the local kernels must be
            # derived from the GLOBAL plan with only the batch size
            # swapped — building them from shard 0's slice diverges
            # whenever another shard carries the batch's max resample
            # scale, and the global index-array slices then feed a kernel
            # compiled for different band geometry (shape error at best,
            # corrupt pixels at worst).
            global_plans, global_args = self._pallas_setup(
                plan, (hb, wb), b, src_hw, out_hws, specs, skip=skip)
            from dataclasses import replace as _dc_replace
            local_plans = {i: _dc_replace(rp, batch=b_local)
                           for i, rp in global_plans.items()}
            if fused_arrays is not None:
                global_args["fused"] = fused_arrays
            dummy = np.zeros((b, 2), dtype=np.int32)
            # jnp.asarray keeps these UNcommitted: jit is free to lay
            # them out per the shard_map in_specs without a host round
            # trip on later calls.
            hws = tuple(jnp.asarray(np.asarray(out_hws.get(i, dummy),
                                               dtype=np.int32))
                        for i in range(len(plan.ops)))
            src_hw_j = jnp.asarray(src_hw)
            self.arg_cache_put(geo_key, (fused_meta, local_plans,
                                         global_args, hws, src_hw_j))

        prog = self._get_sharded_program(mesh, plan, specs, local_plans,
                                         layout, fused_meta)
        wm_args = self.prepare_wm_args(plan)
        outs = prog(jnp.asarray(imgs_u8), src_hw_j, hws, wm_args,
                    global_args)
        return list(outs)

    def _get_sharded_program(self, mesh, plan: OperationPlan,
                             specs: tuple[OpOutputSpec, ...],
                             local_plans: dict, layout: str, fused_meta):
        """Build-or-fetch the jitted shard_map wrapper for one (mesh,
        plan, geometry). Mesh objects hash by device grid + axis names,
        so one engine-held mesh always hits the same entry."""
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        wm_static: dict[int, tuple[int, int, str]] = {}
        for i, op in enumerate(plan.ops):
            if op.type is OperationType.WATERMARK:
                tile = quantize_tile(rasterize_text(op.text, op.font_size))
                th, tw = tile.coverage.shape
                wm_static[i] = (th, tw, op.position)
        key = ("sh", mesh, plan.compile_key(),
               tuple(s.canvas for s in specs),
               tuple(sorted(wm_static.items())),
               tuple(sorted(local_plans.items())), layout, fused_meta)
        with self._lock:
            prog = self._cache.get(key)
        if prog is not None:
            return prog

        raw = self._build(plan, specs, wm_static, local_plans, layout,
                          fused_meta)
        shard = P("data")
        repl = P()
        hws_spec = tuple(shard for _ in range(len(plan.ops)))

        def call(imgs, src_hw_j, hws, wm_args, global_args):
            # Index/arg pytree: every leaf is batch-major, so a uniform
            # P("data") spec is correct for the fused tuple and each
            # per-op pallas tuple alike; watermark args are replicated.
            # check_vma=False: Pallas custom calls can't declare their
            # varying-mesh-axes metadata, so the replication checker
            # rejects them; every output here is batch-sharded by
            # construction.
            kw = {"mesh": mesh,
                  "in_specs": (shard, shard, hws_spec,
                               jax.tree.map(lambda _: repl, wm_args),
                               jax.tree.map(lambda _: shard, global_args)),
                  "out_specs": shard}
            try:
                fn = shard_map(raw, check_vma=False, **kw)
            except TypeError:  # older jax: the kwarg was check_rep
                fn = shard_map(raw, check_rep=False, **kw)
            return fn(imgs, src_hw_j, hws, wm_args, global_args)

        prog = jax.jit(call)
        with self._lock:
            self._cache[key] = prog
        return prog

    def cache_size(self) -> int:
        with self._lock:
            return len(self._cache)


__all__ = ["PipelineModel", "OpOutputSpec", "plan_output_specs"]
