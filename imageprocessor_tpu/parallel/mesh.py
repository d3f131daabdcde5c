"""Device mesh construction and sharding helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, space: int = 1) -> Mesh:
    """2-D (data, space) mesh over the local devices.

    space=1 (default) is pure data parallelism — the right layout for this
    workload. space>1 additionally shards image width, useful when single
    frames approach HBM limits (e.g. 8K x 8K buckets on small-HBM parts).
    """
    devices = jax.devices()
    if n_devices is None:
        n = len(devices)
    else:
        n = int(n_devices)
        if n <= 0:
            raise ValueError(f"n_devices must be positive, got {n}")
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % space != 0:
        raise ValueError(f"n_devices={n} not divisible by space={space}")
    grid = np.array(devices[:n]).reshape(n // space, space)
    return Mesh(grid, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) images: batch over `data`, width over `space`."""
    return NamedSharding(mesh, P("data", None, "space", None))


def smallvec_sharding(mesh: Mesh) -> NamedSharding:
    """(B, k) per-image metadata: batch over `data`, replicated over space."""
    return NamedSharding(mesh, P("data", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, imgs_u8, src_hw, out_hws: dict):
    """Place a packed group onto the mesh. The batch must be divisible by
    the data-axis size (the engine pads batches to powers of two, and mesh
    data sizes are powers of two on real topologies)."""
    imgs = jax.device_put(imgs_u8, batch_sharding(mesh))
    hw = jax.device_put(src_hw, smallvec_sharding(mesh))
    hws = {k: jax.device_put(v, smallvec_sharding(mesh))
           for k, v in out_hws.items()}
    return imgs, hw, hws
