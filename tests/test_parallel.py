"""Multi-device sharding tests on the 8-virtual-CPU-device fleet."""

import numpy as np
import pytest

import jax

from imageprocessor_tpu.ops.resize import batched_resize_bilinear
from imageprocessor_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch_arrays,
    smallvec_sharding,
)
from tests.oracle import psnr, resize_go

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

RNG = np.random.default_rng(17)


def test_make_mesh_shapes():
    m = make_mesh(8, space=2)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("data", "space")
    with pytest.raises(ValueError):
        make_mesh(8, space=3)
    with pytest.raises(ValueError):
        make_mesh(999)


def test_data_parallel_resize_matches_oracle():
    mesh = make_mesh(8, space=1)
    b = 8
    imgs = np.zeros((b, 256, 256, 3), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    originals = []
    for i in range(b):
        h, w = 200 + i * 4, 240 - i * 4
        img = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        originals.append(img)
        imgs[i, :h, :w] = img
        src_hw[i] = (h, w)
    out_hw = np.tile(np.asarray([[96, 128]], np.int32), (b, 1))

    imgs_s, hw_s, hws = shard_batch_arrays(mesh, imgs, src_hw, {0: out_hw})
    out = batched_resize_bilinear(imgs_s, hw_s, hws[0], out_h=96, out_w=128)
    out_np = np.asarray(out)
    for i, img in enumerate(originals):
        ref = resize_go(img, 128, 96)
        assert psnr(out_np[i], ref) > 45.0, f"image {i} diverged under dp"


def test_spatial_sharding_executes_with_collectives():
    """space=2 shards W; the horizontal pass needs cross-shard data, so
    this exercises XLA-inserted collectives end-to-end."""
    mesh = make_mesh(8, space=2)
    b = 4
    img = RNG.integers(0, 256, size=(192, 256, 3), dtype=np.uint8)
    imgs = np.tile(img[None], (b, 1, 1, 1))
    src_hw = np.tile(np.asarray([[192, 256]], np.int32), (b, 1))
    out_hw = np.tile(np.asarray([[64, 96]], np.int32), (b, 1))

    jitted = jax.jit(
        lambda a, s, o: batched_resize_bilinear(a, s, o, out_h=64, out_w=96),
        in_shardings=(batch_sharding(mesh), smallvec_sharding(mesh),
                      smallvec_sharding(mesh)),
    )
    out = np.asarray(jitted(imgs, src_hw, out_hw))
    ref = resize_go(img, 96, 64)
    for i in range(b):
        assert psnr(out[i], ref) > 45.0


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as g

    fn, args = g.entry()
    outs = jax.jit(fn)(*args)
    assert [o.shape[0] for o in outs] == [args[0].shape[0]] * 4
    g.dryrun_multichip(8)
