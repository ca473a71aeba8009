"""Device-mesh construction and sharding strategy.

The reference is strictly single-GPU (SURVEY §2.3) — this subsystem is
born new. The natural parallel axes of per-scene garment optimization:

- **rays**: the 2k-6k sampled rays per step (SDF MLP + deformer + render
  MLP evaluations are embarrassingly parallel over rays) — shard over the
  'rays' mesh axis; losses reduce with psum.
- **frames**: the batch dimension (3/2/1 frames per step, more at scale)
  — 'data' axis.
- **voxels**: Seg3dLossless batch evaluation (millions of SDF queries at
  remesh) — shard the flattened candidate sets over all devices.
- **garments**: independent garment pieces could map to device groups
  (not exercised by default — ray sharding dominates).

Parameters (a few MB of MLPs) are replicated; collectives ride ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int = 1):
    """1- or 2-axis mesh: ('data', 'rays'). rays = n_devices // data."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    assert n % data == 0
    arr = np.asarray(devs).reshape(data, n // data)
    return Mesh(arr, ("data", "rays"))


def ray_sharding(mesh: Mesh):
    """Shard a (R, ...) ray-major array over the rays axis."""
    return NamedSharding(mesh, P(("data", "rays")))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, *arrays):
    """Place ray-major arrays with their leading dim split across every
    device (data×rays collapsed — per-scene optimization has one logical
    batch of rays)."""
    sh = ray_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def scene_shardings(mesh: Mesh):
    """Shardings for a scene training batch, as a dict:

    - ``image``: (N, H, W, ...) arrays — frames over 'data', image rows
      over 'rays' (pixel/ray parallelism: the rasterized masks, the
      sampled-ray top-k and the per-pixel losses all reduce over these
      axes; jit's partitioner inserts the psums).
    - ``frame``: (N, ...) per-frame arrays — frames over 'data'.
    - ``replicated``: parameters / optimizer state / small arrays.
    """
    return {
        "image": NamedSharding(mesh, P("data", "rays")),
        "frame": NamedSharding(mesh, P("data")),
        "replicated": NamedSharding(mesh, P()),
    }


def pad_to_devices(x: np.ndarray, mesh: Mesh, axis: int = 0):
    """Pad dim `axis` to a multiple of the total device count (static
    shard shapes)."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    size = x.shape[axis]
    pad = (-size) % n
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths), size
