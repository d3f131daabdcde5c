"""Plan normalization and batcher grouping tests."""

import time

import numpy as np
import pytest

from imageprocessor_tpu.domain import OperationParams, OperationType
from imageprocessor_tpu.models.plan import (
    InvalidParamsError,
    normalize_op,
    normalize_operations,
)
from imageprocessor_tpu.runtime.batcher import (
    BatchItem,
    DeadlineBatcher,
    bucket_for,
    group_items,
    quantize_batch,
)


def test_resize_param_coercion_accepts_go_json_floats():
    op = normalize_op(OperationParams(OperationType.RESIZE,
                                      {"width": 1024.0, "height": 768,
                                       "keep_aspect": True}))
    assert (op.width, op.height, op.keep_aspect) == (1024, 768, True)


def test_resize_requires_numeric_dims():
    with pytest.raises(InvalidParamsError, match="width parameter is required"):
        normalize_op(OperationParams(OperationType.RESIZE, {"height": 10}))
    with pytest.raises(InvalidParamsError, match="height parameter is required"):
        normalize_op(OperationParams(OperationType.RESIZE,
                                     {"width": 10, "height": "x"}))
    with pytest.raises(InvalidParamsError, match="positive"):
        normalize_op(OperationParams(OperationType.RESIZE,
                                     {"width": -1, "height": 10}))
    # bool must not count as a number (unlike plain Python int coercion)
    with pytest.raises(InvalidParamsError):
        normalize_op(OperationParams(OperationType.RESIZE,
                                     {"width": True, "height": 10}))


def test_thumbnail_defaults():
    op = normalize_op(OperationParams(OperationType.THUMBNAIL, {}))
    assert op.size == 200
    assert op.crop_to_fit is False


def test_watermark_defaults_match_reference():
    op = normalize_op(OperationParams(OperationType.WATERMARK, {}))
    assert op.text == "© ImageProcessor"
    assert op.opacity == 0.5
    assert op.position == "bottom-right"
    assert op.font_size == 36.0
    assert op.font_color == "255,255,255"
    # zero/negative opacity falls back to default (watermark.go:46-48)
    op2 = normalize_op(OperationParams(OperationType.WATERMARK,
                                       {"opacity": -1.0}))
    assert op2.opacity == 0.5


def test_watermark_text_not_in_compile_key():
    a = normalize_op(OperationParams(OperationType.WATERMARK, {"text": "one"}))
    b = normalize_op(OperationParams(OperationType.WATERMARK, {"text": "two"}))
    assert a.compile_key() == b.compile_key()
    c = normalize_op(OperationParams(OperationType.WATERMARK,
                                     {"text": "one", "position": "center"}))
    assert a.compile_key() != c.compile_key()


def test_plan_key_stable_across_equal_plans():
    ops = [OperationParams(OperationType.THUMBNAIL, {"size": 200}),
           OperationParams(OperationType.RESIZE, {"width": 10, "height": 20})]
    assert (normalize_operations(ops).compile_key()
            == normalize_operations(list(ops)).compile_key())


# --- batcher -----------------------------------------------------------------

def _item(h, w, key="p"):
    return BatchItem(item_id="x", image=np.zeros((h, w, 3), np.uint8),
                     plan_key=key)


def test_bucket_ladder():
    assert bucket_for(100, 100) == (128, 128)
    assert bucket_for(480, 640) == (512, 640)
    assert bucket_for(3000, 4000) == (3072, 4096)
    assert bucket_for(8193, 100) == (10240, 128)


def test_quantize_batch():
    assert quantize_batch(1) == 1
    assert quantize_batch(3) == 4
    assert quantize_batch(33) == 64
    assert quantize_batch(100) == 64  # capped


def test_group_items_by_bucket_and_plan():
    items = [_item(480, 640), _item(500, 600), _item(100, 100),
             _item(480, 640, key="q")]
    groups = group_items(items)
    keys = {(g.bucket, g.plan_key, len(g.items)) for g in groups}
    assert ((512, 640), "p", 2) in keys
    assert ((128, 128), "p", 1) in keys
    assert ((512, 640), "q", 1) in keys


def test_group_pack_pads_and_duplicates():
    g = group_items([_item(100, 200), _item(120, 140)])[0]
    imgs, src_hw = g.pack(pad_batch_to=4)
    assert imgs.shape == (4, 128, 200, 3)  # 200 is itself a ladder rung
    assert tuple(src_hw[0]) == (100, 200)
    assert tuple(src_hw[1]) == (120, 140)
    assert tuple(src_hw[2]) == (120, 140)  # pad rows mirror last real dims


def test_deadline_batcher_flush_on_size():
    b = DeadlineBatcher(batch_size=2, deadline_ms=10_000)
    assert b.add(_item(100, 100)) is None
    g = b.add(_item(100, 100))
    assert g is not None and len(g.items) == 2
    assert b.pending_count() == 0


def test_deadline_batcher_flush_on_deadline():
    b = DeadlineBatcher(batch_size=100, deadline_ms=5)
    b.add(_item(100, 100))
    assert b.due(now=time.monotonic()) == []  # not yet
    time.sleep(0.01)
    due = b.due()
    assert len(due) == 1 and len(due[0].items) == 1
    assert b.next_deadline() is None


def test_deadline_batcher_separates_buckets():
    b = DeadlineBatcher(batch_size=2, deadline_ms=10_000)
    b.add(_item(100, 100))
    assert b.add(_item(1000, 1000)) is None  # different bucket, no flush
    assert b.pending_count() == 2
    assert len(b.flush_all()) == 2


def test_group_key_includes_watermark_text():
    """compile_key shares programs across texts; group_key must NOT —
    a Group runs with its first item's plan verbatim, so batching two
    texts together stamps both images with the first one's text."""
    from imageprocessor_tpu.models.plan import normalize_operations as _n

    a = _n([OperationParams(OperationType.WATERMARK, {"text": "one"})])
    b = _n([OperationParams(OperationType.WATERMARK, {"text": "two"})])
    assert a.compile_key() == b.compile_key()
    assert a.group_key() != b.group_key()
    assert a.group_key() == _n([OperationParams(
        OperationType.WATERMARK, {"text": "one"})]).group_key()
