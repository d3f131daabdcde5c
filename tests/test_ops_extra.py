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


def test_batched_crop_matches_single():
    from imageprocessor_tpu.ops.extra import batched_crop

    b = 2
    imgs = np.zeros((b, 128, 160, 3), dtype=np.uint8)
    dims = [(100, 150), (128, 160)]
    srcs = []
    for i, (h, w) in enumerate(dims):
        im = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
        srcs.append(im)
        imgs[i, :h, :w] = im
    hw = np.asarray(dims, dtype=np.int32)
    out = np.asarray(batched_crop(imgs, hw, x=20, y=30, width=60, height=50))
    assert out.shape == (b, 50, 60, 3)
    for i, im in enumerate(srcs):
        ref = np.asarray(crop_image(im, 20, 30, 60, 50))
        oh, ow = ref.shape[:2]
        np.testing.assert_array_equal(out[i, :oh, :ow], ref)


def test_batched_rotate_90s_match_single():
    from imageprocessor_tpu.ops.extra import batched_rotate

    b = 2
    imgs = np.zeros((b, 96, 128, 3), dtype=np.uint8)
    dims = [(80, 100), (96, 128)]
    srcs = []
    for i, (h, w) in enumerate(dims):
        im = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
        srcs.append(im)
        imgs[i, :h, :w] = im
    hw = np.asarray(dims, dtype=np.int32)
    for angle in (90, 180, 270):
        out = np.asarray(batched_rotate(imgs, hw, angle))
        for i, im in enumerate(srcs):
            ref = np.asarray(rotate_image(im, angle))
            oh, ow = ref.shape[:2]
            np.testing.assert_array_equal(out[i, :oh, :ow], ref,
                                          err_msg=f"angle {angle} img {i}")


def test_batched_rotate_arbitrary_matches_single():
    from imageprocessor_tpu.ops.extra import batched_rotate

    im = RNG.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    imgs = np.zeros((1, 96, 96, 3), dtype=np.uint8)
    imgs[0, :64, :80] = im
    hw = np.asarray([[64, 80]], dtype=np.int32)
    out = np.asarray(batched_rotate(imgs, hw, 30.0))[0, :64, :80]
    ref = np.asarray(rotate_image(im, 30.0))
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
