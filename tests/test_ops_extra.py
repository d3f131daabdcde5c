"""Tests for the crop/rotate/flip/grayscale ops (declared by the reference
domain but unimplemented there — full implementations here)."""

import numpy as np

from imageprocessor_tpu.ops import crop_image, flip_image, grayscale_image, rotate_image

RNG = np.random.default_rng(3)


def img(h=120, w=160):
    return RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_crop_basic_and_clamped():
    im = img()
    out = np.asarray(crop_image(im, 10, 20, 50, 40))
    np.testing.assert_array_equal(out, im[20:60, 10:60])
    # Overflowing crop clamps to bounds
    out2 = np.asarray(crop_image(im, 150, 110, 500, 500))
    np.testing.assert_array_equal(out2, im[110:, 150:])


def test_rotate_multiples_of_90():
    im = img()
    np.testing.assert_array_equal(np.asarray(rotate_image(im, 90)), np.rot90(im, 1))
    np.testing.assert_array_equal(np.asarray(rotate_image(im, 180)), np.rot90(im, 2))
    np.testing.assert_array_equal(np.asarray(rotate_image(im, 270)), np.rot90(im, 3))
    np.testing.assert_array_equal(np.asarray(rotate_image(im, 0)), im)
    np.testing.assert_array_equal(np.asarray(rotate_image(im, 360)), im)


def test_rotate_arbitrary_angle_preserves_center():
    im = np.zeros((101, 101, 3), dtype=np.uint8)
    im[45:56, 45:56] = 200  # center blob
    out = np.asarray(rotate_image(im, 45))
    assert out.shape == im.shape
    assert out[50, 50, 0] > 150  # center stays put
    assert out[:10, :10].max() == 0  # corners empty


def test_rotate_360_composition():
    im = img(80, 80)
    out = np.asarray(rotate_image(np.asarray(rotate_image(im, 180)), 180))
    np.testing.assert_array_equal(out, im)


def test_flip():
    im = img()
    np.testing.assert_array_equal(np.asarray(flip_image(im, "horizontal")),
                                  im[:, ::-1])
    np.testing.assert_array_equal(np.asarray(flip_image(im, "vertical")),
                                  im[::-1, :])


def test_grayscale_matches_go_arithmetic():
    im = img()
    out = np.asarray(grayscale_image(im))
    # Go: y16 = (299r+587g+114b+500)/1000 on 16-bit, then >> 8
    x16 = im.astype(np.int64) * 257
    y16 = (299 * x16[..., 0] + 587 * x16[..., 1] + 114 * x16[..., 2] + 500) // 1000
    y8 = (y16 >> 8).astype(np.uint8)
    assert out.shape == im.shape
    for c in range(3):
        diff = np.abs(out[..., c].astype(int) - y8.astype(int))
        assert diff.max() <= 1  # f32 vs integer division rounding


def test_grayscale_preserves_alpha():
    im4 = RNG.integers(0, 256, size=(50, 50, 4), dtype=np.uint8)
    out = np.asarray(grayscale_image(im4))
    np.testing.assert_array_equal(out[..., 3], im4[..., 3])
    assert np.all(out[..., 0] == out[..., 1])
