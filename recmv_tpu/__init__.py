"""recmv_tpu — a TPU-native JAX framework for reconstructing 3D dynamic
cloth from monocular video (REC-MV capabilities, re-designed TPU-first).

The reference system (GAP-LAB-CUHK-SZ/REC-MV, CVPR 2023) is a per-scene
PyTorch/CUDA optimizer. This package rebuilds every capability on top of
jax/XLA/pallas:

- ``recmv_tpu.ops``      — kernels: positional encoding, trilinear grid
  sampling (arbitrary-order AD), batched 3x3 inverse with singularity
  masks, marching cubes with fixed-capacity buffers, coarse-to-fine
  octree SDF evaluation, differentiable point/mesh rasterization.
- ``recmv_tpu.models``   — SDF MLPs, render MLP, non-rigid offset MLP,
  SMPL body model + LBS voxel skinner, composite deformation fields,
  rectified perspective cameras, intersection-free feature curves.
- ``recmv_tpu.geometry`` — host-side mesh structures and registration:
  Laplacian editing, NRICP, ICP, polygon resampling, remeshing.
- ``recmv_tpu.core``     — the per-scene optimization loop, losses,
  surface-point root finding with implicit differentiation, curve and
  beta pre-optimizers, checkpointing.
- ``recmv_tpu.data``     — scene datasets (PeopleSnapshot / synthetic /
  large-pose / animation), samplers, learnable per-frame parameters.
- ``recmv_tpu.parallel`` — device-mesh construction and sharding
  strategies (rays/frames/voxels/garments over ICI).
- ``recmv_tpu.config``   — HOCON config parsing and garment taxonomy.
"""

__version__ = "0.1.0"

import jax as _jax

# Correctness-first default: f32 matmuls accumulate in f32. JAX's DEFAULT
# precision is a single bf16 pass (≈4e-3 relative error) — acceptable for
# giant NN matmuls, not for per-scene geometric optimization (Jacobian
# algebra, FK chains, camera math, root-finding). Geometry-critical sites
# (camera, FK chains, LBS blends) pin Precision.HIGHEST explicitly, so the
# *default* only governs the MLP stacks (SDF/translator/render), whose
# 512-wide layers tolerate bf16x3 ("high", ≈2^-21 relative — far inside
# the 5e-5 surface-solve tolerance) at ~2x the MXU throughput of bf16x6
# ("float32"). Override with RECMV_MATMUL_PRECISION=float32 to pin the
# old full-f32 default everywhere.
import os as _os

_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("RECMV_MATMUL_PRECISION", "high"),
)

# Persistent compilation cache: per-scene optimization re-uses the same
# executables across runs/phases, and the axon remote compile of large
# graphs costs minutes — caching them is a large wall-clock win.
_cache_dir = _os.environ.get("RECMV_COMPILE_CACHE", "/tmp/recmv_jax_cache")
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # pragma: no cover — cache is best-effort
    pass
