"""Compiled processing-pipeline models.

The "model" of this framework is a compiled XLA program family: for each
(operation plan, resolution bucket, batch size) the pipeline model traces
one fused program that computes every requested operation from a single
uint8 source batch resident in HBM. This replaces the reference's
sequential per-image op loop (reference:
internal/usecase/processor/image_processor.go:64-95) with one device
program whose intermediate reads XLA fuses and shares.
"""

from imageprocessor_tpu.models.plan import (
    NormalizedOp,
    OperationPlan,
    normalize_operations,
)
from imageprocessor_tpu.models.pipeline import PipelineModel

__all__ = ["NormalizedOp", "OperationPlan", "normalize_operations", "PipelineModel"]
