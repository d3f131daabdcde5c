"""Validate the production shard_map path on REAL silicon.

tests/test_run_sharded.py proves the fused Pallas kernel inside
shard_map on 8 virtual CPU devices (interpret mode); the driver's
dryrun does the same. This probe closes the last gap: the COMPILED
Mosaic kernel under shard_map on an actual TPU mesh (all local chips;
a 1-chip mesh in the dev environment), asserting bit-exact equality
with the single-device device path.

    python tools/shardcheck.py [--bucket 256x256] [--batch 8]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", default="256x256")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    from imageprocessor_tpu.domain import OperationParams, OperationType
    from imageprocessor_tpu.models.pipeline import (
        PipelineModel,
        plan_output_specs,
    )
    from imageprocessor_tpu.models.plan import normalize_operations
    from imageprocessor_tpu.ops.coords import keep_aspect_dims
    from imageprocessor_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    print(f"platform={devs[0].platform} n_devices={len(devs)}")
    n = len(devs)

    plan = normalize_operations([
        OperationParams(OperationType.THUMBNAIL,
                        {"size": 64, "crop_to_fit": True}),
        OperationParams(OperationType.RESIZE,
                        {"width": 128, "height": 96, "keep_aspect": True}),
        OperationParams(OperationType.WATERMARK, {"text": "dp"}),
    ])
    b = args.batch
    hb, wb = map(int, args.bucket.split("x"))
    rng = np.random.default_rng(47)
    imgs = np.zeros((b, 3, hb, wb), dtype=np.uint8)
    src_hw = np.zeros((b, 2), dtype=np.int32)
    for i in range(b):
        h, w = hb - 56 + 4 * (i % 3), wb - 16 - 6 * (i % 4)
        imgs[i, :, :h, :w] = rng.integers(0, 256, size=(3, h, w),
                                          dtype=np.uint8)
        src_hw[i] = (h, w)
    out_hw = np.zeros((b, 2), dtype=np.int32)
    for i in range(b):
        tw, th = keep_aspect_dims(int(src_hw[i, 1]), int(src_hw[i, 0]),
                                  128, 96)
        out_hw[i] = (th, tw)
    out_hws = {1: out_hw}
    specs = plan_output_specs(plan, (hb, wb))

    model = PipelineModel(use_pallas=True)
    assert model.supports_planar(plan, (hb, wb)), "planar path required"
    single = [np.asarray(o) for o in
              model.run(plan, imgs, src_hw, out_hws, specs, layout="chw")]
    print("single-device run done")

    mesh = make_mesh(n, space=1)
    sharded = [np.asarray(o) for o in
               model.run_sharded(mesh, plan, imgs, src_hw, out_hws, specs,
                                 layout="chw")]
    print(f"sharded run done (mesh data axis = {n})")

    for i in range(b):
        np.testing.assert_array_equal(sharded[0][i, :, :64, :64],
                                      single[0][i, :, :64, :64])
        th, tw = out_hw[i]
        np.testing.assert_array_equal(sharded[1][i, :, :th, :tw],
                                      single[1][i, :, :th, :tw])
        h, w = src_hw[i]
        np.testing.assert_array_equal(sharded[2][i, :, :h, :w],
                                      single[2][i, :, :h, :w])
    print(f"shardcheck OK: compiled Mosaic fused kernel under shard_map "
          f"on {devs[0].platform} == single-device, bit-exact "
          f"(batch {b}, bucket {hb}x{wb})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
