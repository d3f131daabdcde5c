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

import jax
import jax.numpy as jnp
import numpy as np

from imageprocessor_tpu.domain import OperationType
from imageprocessor_tpu.models.plan import NormalizedOp, OperationPlan
from imageprocessor_tpu.ops.extra import batched_flip, batched_grayscale
from imageprocessor_tpu.ops.resize import batched_resize_bilinear
from imageprocessor_tpu.ops.thumbnail import batched_thumbnail
from imageprocessor_tpu.ops.watermark import (
    WatermarkTile,
    _pad_tile,
    batched_watermark_core,
    quantize_tile,
    rasterize_text,
    resolve_color,
)


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


class PipelineModel:
    """Builds and caches fused programs keyed by (plan, bucket, B, canvases)."""

    def __init__(self, device=None):
        self._cache: dict[tuple, Callable] = {}
        self._lock = threading.Lock()
        self._device = device

    # -- program construction -------------------------------------------------

    def _build(self, plan: OperationPlan, specs: tuple[OpOutputSpec, ...],
               wm_static: dict[int, tuple[int, int, str]]):
        """wm_static: op index -> (tile_h, tile_w, position) statics."""

        def step(imgs_u8, src_hw, out_hws, wm_args):
            outputs = []
            for i, spec in enumerate(specs):
                op = spec.op
                if op.type is OperationType.RESIZE:
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
                else:
                    raise NotImplementedError(
                        f"{op.type} has no batched kernel; engine uses the "
                        "per-image path")
            return tuple(outputs)

        return jax.jit(step)

    # -- public API ------------------------------------------------------------

    def get_program(self, plan: OperationPlan, bucket: tuple[int, int],
                    batch: int, specs: tuple[OpOutputSpec, ...]):
        wm_static: dict[int, tuple[int, int, str]] = {}
        for i, op in enumerate(plan.ops):
            if op.type is OperationType.WATERMARK:
                tile = quantize_tile(rasterize_text(op.text, op.font_size))
                th, tw = tile.coverage.shape
                wm_static[i] = (th, tw, op.position)
        key = (plan.compile_key(), bucket, batch,
               tuple(s.canvas for s in specs),
               tuple(sorted(wm_static.items())))
        with self._lock:
            prog = self._cache.get(key)
            if prog is None:
                prog = self._build(plan, specs, wm_static)
                self._cache[key] = prog
        return prog

    def prepare_wm_args(self, plan: OperationPlan) -> dict[int, tuple]:
        """Runtime watermark inputs (tile content, color, metrics)."""
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
        return out

    def run(self, plan: OperationPlan, imgs_u8: np.ndarray,
            src_hw: np.ndarray, out_hws: dict[int, np.ndarray],
            specs: tuple[OpOutputSpec, ...]) -> list[Any]:
        """Execute the fused program for one padded group.

        imgs_u8: (B, Hb, Wb, 3); src_hw: (B, 2); out_hws: op index ->
        (B, 2) valid output dims (only needed for resample ops).
        Returns device arrays in op order.
        """
        b, hb, wb = imgs_u8.shape[0], imgs_u8.shape[1], imgs_u8.shape[2]
        prog = self.get_program(plan, (hb, wb), b, specs)
        wm_args = self.prepare_wm_args(plan)
        dummy = np.zeros((b, 2), dtype=np.int32)
        hws = tuple(np.asarray(out_hws.get(i, dummy), dtype=np.int32)
                    for i in range(len(plan.ops)))
        outs = prog(jnp.asarray(imgs_u8), jnp.asarray(src_hw, dtype=jnp.int32),
                    hws, wm_args)
        return list(outs)

    def cache_size(self) -> int:
        with self._lock:
            return len(self._cache)


__all__ = ["PipelineModel", "OpOutputSpec", "plan_output_specs"]
