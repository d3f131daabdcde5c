"""Watermark op tests: anchor math, color parsing, composite vs oracle."""

import numpy as np
import pytest

from imageprocessor_tpu.ops import (
    batched_watermark,
    rasterize_text,
    watermark_image,
)
from imageprocessor_tpu.ops.watermark import (
    _MARGIN,
    anchor_baseline,
    parse_color,
    resolve_color,
)
from tests.oracle import psnr, watermark_go

RNG = np.random.default_rng(7)


def img(h=400, w=600):
    return RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_rasterize_caches_and_measures():
    t1 = rasterize_text("© ImageProcessor", 36.0)
    t2 = rasterize_text("© ImageProcessor", 36.0)
    assert t1 is t2  # cached
    assert t1.width_px > 100
    assert t1.height_px == int(np.ceil(36 * 1.2))  # 44, watermark.go:116
    assert t1.coverage.max() > 0.5


def test_anchor_positions_match_reference_arithmetic():
    tile = rasterize_text("hello", 36.0)
    w, h = 600, 400
    wp, hp = tile.width_px, tile.height_px
    assert anchor_baseline("top-left", w, h, tile) == (_MARGIN, _MARGIN + hp)
    assert anchor_baseline("top-right", w, h, tile) == (w - wp - _MARGIN, _MARGIN + hp)
    assert anchor_baseline("top-center", w, h, tile) == ((w - wp) // 2, _MARGIN + hp)
    assert anchor_baseline("bottom-left", w, h, tile) == (_MARGIN, h - _MARGIN)
    assert anchor_baseline("bottom-right", w, h, tile) == (w - wp - _MARGIN, h - _MARGIN)
    assert anchor_baseline("bottom-center", w, h, tile) == ((w - wp) // 2, h - _MARGIN)
    assert anchor_baseline("center", w, h, tile) == ((w - wp) // 2, (h + hp) // 2)
    # Unknown position falls back to bottom-right (reference default case)
    assert anchor_baseline("weird", w, h, tile) == (w - wp - _MARGIN, h - _MARGIN)


def test_parse_color_reference_semantics():
    assert parse_color("255,255,255", 0.5) == (255, 255, 255, 127)
    assert parse_color("10, 20, 30", 1.0) == (10, 20, 30, 255)
    assert parse_color("1,2,3,99", 0.5) == (1, 2, 3, 99)
    assert parse_color("300,-5,128", 1.0) == (255, 0, 128, 255)
    with pytest.raises(ValueError):
        parse_color("1,2", 0.5)
    with pytest.raises(ValueError):
        parse_color("a,b,c", 0.5)
    # Reference falls back to BLACK on parse error (watermark.go:92-94)
    assert resolve_color("nonsense", 0.5) == (0, 0, 0, 127)


@pytest.mark.parametrize("position", [
    "top-left", "top-right", "top-center", "bottom-left", "bottom-right",
    "bottom-center", "center"])
def test_watermark_matches_oracle(position):
    im = img()
    tile = rasterize_text("WM", 36.0)
    ours = np.asarray(watermark_image(im, text="WM", position=position,
                                      opacity=0.5))
    bx, by = anchor_baseline(position, 600, 400, tile)
    ref = watermark_go(im, tile.coverage, int(bx), int(by) - tile.ascent,
                       (255, 255, 255), 127 / 255.0)
    assert psnr(ours, ref) > 50.0
    # The untouched region must be bit-identical
    changed = np.any(ours != im, axis=(2,))
    assert changed.sum() > 0  # something was drawn
    assert changed.sum() < 0.2 * 600 * 400  # most pixels untouched


def test_watermark_text_lands_at_expected_location():
    im = np.zeros((400, 600, 3), dtype=np.uint8)
    out = np.asarray(watermark_image(im, text="X", position="top-left",
                                     opacity=1.0, font_color="255,255,255"))
    ys, xs = np.nonzero(out[:, :, 0])
    # Text around baseline y=20+height_px, starting at x=20
    tile = rasterize_text("X", 36.0)
    assert xs.min() >= 20
    assert ys.min() >= 20
    assert ys.max() <= 20 + tile.height_px + tile.descent + 5


def test_watermark_clips_on_small_image():
    """Image narrower than the text: reference clips, we must not crash
    and must not write outside bounds."""
    im = img(60, 80)
    out = np.asarray(watermark_image(im, text="A VERY LONG WATERMARK TEXT",
                                     position="bottom-right", opacity=0.8))
    assert out.shape == im.shape


def test_batched_watermark_positions_follow_valid_dims():
    shapes = [(300, 500), (200, 350)]
    pad_h, pad_w = 300, 500
    batch = np.zeros((2, pad_h, pad_w, 3), dtype=np.uint8)
    src_hw = np.zeros((2, 2), dtype=np.int32)
    imgs = []
    for i, (h, w) in enumerate(shapes):
        im = img(h, w)
        imgs.append(im)
        batch[i, :h, :w] = im
        src_hw[i] = (h, w)
    tile = rasterize_text("WM", 36.0)
    out = np.asarray(batched_watermark(batch, src_hw, tile,
                                       position="bottom-right", opacity=0.5))
    for i, im in enumerate(imgs):
        h, w = shapes[i]
        single = np.asarray(watermark_image(im, text="WM",
                                            position="bottom-right",
                                            opacity=0.5))
        assert psnr(out[i, :h, :w], single) > 50.0, f"image {i} diverged"


def test_font_resolution_order(tmp_path, monkeypatch):
    """Default font resolves env var > assets/fonts drop-in > DejaVu, and
    tile caching keys on the RESOLVED font path (a font switch mid-process
    must not serve stale glyphs). Go-Regular parity (reference
    watermark.go:29-38) is a file-copy into assets/fonts/."""
    import os
    import shutil

    import numpy as np

    import imageprocessor_tpu.ops.watermark as wm

    serif = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"
    monkeypatch.setenv("IMAGEPROCESSOR_FONT", serif)
    wm._DEFAULT_FONT_PATH = None
    assert wm._default_font_path() == serif
    t_serif = wm.rasterize_text("Parity 123", 24.0)

    monkeypatch.delenv("IMAGEPROCESSOR_FONT")
    wm._DEFAULT_FONT_PATH = None
    assert wm._default_font_path().endswith("DejaVuSans.ttf")
    t_sans = wm.rasterize_text("Parity 123", 24.0)
    # resolved-path cache key: same (text, size) but different glyphs
    assert (t_serif.width_px != t_sans.width_px
            or not np.array_equal(t_serif.coverage, t_sans.coverage))

    assets = os.path.join(os.path.dirname(wm.__file__), os.pardir,
                          "assets", "fonts")
    os.makedirs(assets, exist_ok=True)
    target = os.path.join(assets, "Go-Regular.ttf")
    try:
        shutil.copy(serif, target)
        wm._DEFAULT_FONT_PATH = None
        assert os.path.samefile(wm._default_font_path(), target)
    finally:
        os.remove(target)
        wm._DEFAULT_FONT_PATH = None


def test_rasterize_text_width_capped():
    """User-controlled watermark_text must not rasterize unbounded
    buffers: a very long text's tile clips at _MAX_TILE_W (nothing past
    it is visible in any bucket anyway; the Go reference draws clipped
    into the image and never allocates text-proportional memory)."""
    from imageprocessor_tpu.ops.watermark import _MAX_TILE_W, rasterize_text

    tile = rasterize_text("W" * 20000, 36.0)
    assert tile.coverage.shape[1] <= _MAX_TILE_W
    assert tile.width_px <= _MAX_TILE_W


def test_tile_cache_bounded():
    from imageprocessor_tpu.ops import watermark as wm

    for i in range(wm._TILE_CACHE_MAX + 20):
        wm.rasterize_text(f"cache-bound-{i}", 12.0)
    assert len(wm._TILE_CACHE) <= wm._TILE_CACHE_MAX


def test_unknown_position_normalized_to_bottom_right():
    """All unknown position strings behave as bottom-right; normalizing
    them in the plan keeps "", "foo", "bottomright" from each minting a
    distinct compile_key (one throwaway XLA compile per string)."""
    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.models.plan import normalize_op

    keys = set()
    for pos in ("foo", "", "bottomright", "bottom-right"):
        op = normalize_op(OperationParams(
            OperationType.WATERMARK, {"text": "t", "position": pos}))
        assert op.position == "bottom-right"
        keys.add(op.compile_key())
    assert len(keys) == 1


def test_watermark_text_length_capped_in_plan():
    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.models.plan import normalize_op

    op = normalize_op(OperationParams(
        OperationType.WATERMARK, {"text": "x" * 70000}))
    assert len(op.text) == 1024
