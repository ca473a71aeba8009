"""Batched small-matrix and rotation math.

TPU-native replacements for the reference's native/CUDA helpers:

- ``fast_3x3_inv``: batched analytic 3x3 inverse with a singularity mask
  (|det| < 1e-4 → zero matrix and check=False), matching the semantics of
  the reference FastMinv extension (``FastMinv/Matrix3x3InvKernels.cu:22-62``)
  including its custom backward dA = -A^{-T} G A^{-T}
  (``FastMinv/M3x3Inv.cpp:39``). On TPU this is pure VPU element-wise math —
  an adjugate expansion vmapped over the batch; no kernel required because
  XLA fuses the 9 cofactor expressions into one elementwise pass.
- ``quat2mat``: unit-normalized quaternion (w,x,y,z) → rotation matrix,
  parity with ``utils/utils.py:21-38``.
- ``batch_rodrigues``: axis-angle → rotation matrices (SMPL pose maps),
  replacing ``smpl_pytorch.util.batch_rodrigues``.
- face/vertex normals, face areas: parity with ``utils/utils.py:267-321``.
- DCT basis / null-space: parity with ``utils/utils.py:293-304``.
- ``gm_robust_error``: Geman-McClure robustifier, ``utils/utils.py:48-52``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_SINGULAR_EPS = 1e-4

# Small geometric matmuls (3x3/4x4 composes, Jacobian algebra) are
# precision-critical and never MXU-bound — force full fp32 accumulation.
# (JAX's default matmul precision performs bf16-split passes even on CPU,
# which costs ~1e-2 relative error on these ops.)
HIGHEST = jax.lax.Precision.HIGHEST


def pmm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched matmul at HIGHEST precision for small geometric matrices."""
    return jnp.matmul(a, b, precision=HIGHEST)


def _adjugate_inv(m: jnp.ndarray):
    """m: (..., 3, 3) → (inv, det). Pure elementwise cofactor expansion."""
    a = m
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = -a[..., 1, 0] * a[..., 2, 2] + a[..., 1, 2] * a[..., 2, 0]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = -a[..., 0, 1] * a[..., 2, 2] + a[..., 0, 2] * a[..., 2, 1]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = -a[..., 0, 0] * a[..., 2, 1] + a[..., 0, 1] * a[..., 2, 0]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = -a[..., 0, 0] * a[..., 1, 2] + a[..., 0, 2] * a[..., 1, 0]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    adjT = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    safe_det = jnp.where(jnp.abs(det) < _SINGULAR_EPS, 1.0, det)
    inv = adjT / safe_det[..., None, None]
    return inv, det


@jax.custom_vjp
def fast_3x3_inv(m: jnp.ndarray):
    """Batched 3x3 inverse with singularity mask.

    Returns (inv, check): inv is zeros and check False where |det|<1e-4.
    The VJP matches the reference: dA = -inv^T @ G @ inv^T computed with
    the *masked* inverse, so singular entries get zero gradient, and no
    gradient flows to `check`.
    """
    inv, det = _adjugate_inv(m)
    check = jnp.abs(det) >= _SINGULAR_EPS
    inv = jnp.where(check[..., None, None], inv, jnp.zeros_like(inv))
    return inv, check


def _fast_3x3_inv_fwd(m):
    out = fast_3x3_inv(m)
    return out, out[0]


def _fast_3x3_inv_bwd(inv, cotangents):
    g, _ = cotangents
    invT = jnp.swapaxes(inv, -1, -2)
    grad = -pmm(pmm(invT, g), invT)
    return (grad,)


fast_3x3_inv.defvjp(_fast_3x3_inv_fwd, _fast_3x3_inv_bwd)


def quat2mat(quat: jnp.ndarray) -> jnp.ndarray:
    """(B,4) quaternion (w,x,y,z) → (B,3,3) rotation matrix."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(axisang: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """(..., 3) axis-angle → (..., 3, 3) rotation matrices (SMPL pose map).

    Uses the smooth quaternion form q = [cos(θ/2), v·sinc(θ/2)/2] so the
    map (and all its derivatives — pose optimization differentiates
    through this) is well-defined at θ=0: sin(θ/2)/θ is evaluated by
    series below eps.
    """
    sq = jnp.sum(axisang * axisang, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, eps * eps))
    half = angle * 0.5
    # sin(θ/2)/θ, smooth at 0 (→ 1/2 - θ²/48 + ...)
    sinc_half = jnp.where(sq > eps * eps, jnp.sin(half) / angle, 0.5 - sq / 48.0)
    w = jnp.cos(half)[..., 0]
    xyz = axisang * sinc_half
    quat = jnp.concatenate([w[..., None], xyz], axis=-1)
    return quat2mat(quat)


def rotmat_to_axis_angle(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(..., 3, 3) rotation → (..., 3) axis-angle (inverse of rodrigues)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    rx = R[..., 2, 1] - R[..., 1, 2]
    ry = R[..., 0, 2] - R[..., 2, 0]
    rz = R[..., 1, 0] - R[..., 0, 1]
    axis = jnp.stack([rx, ry, rz], axis=-1)
    sin = jnp.sin(theta)
    scale = jnp.where(jnp.abs(sin) < eps, 0.5, theta / jnp.maximum(2.0 * sin, eps))
    return axis * scale[..., None]


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Ortho-6D rotation parameterization → rotation matrix, parity with
    ``engineer/utils/matrix_transform.py:178`` (Zhou et al. CVPR'19)."""
    a1, a2 = d6[..., 0:3], d6[..., 3:6]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def gm_robust_error(x: jnp.ndarray, c: float, square: bool = False) -> jnp.ndarray:
    """Geman-McClure robust error."""
    if square:
        return 2.0 * x / (c * c) / (x / (c * c) + 4.0)
    return 2.0 * x * x / (c * c) / (x * x / (c * c) + 4.0)


# ---------------------------------------------------------------------------
# Mesh normals / areas (batched, static shapes)
# ---------------------------------------------------------------------------

def compute_face_areas(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """verts (N,V,3), faces (F,3) or (N,F,3) → areas (N,F)."""
    if faces.ndim == 2:
        fvs = verts[:, faces]  # (N,F,3,3)
    else:
        fvs = jax.vmap(lambda v, f: v[f])(verts, faces)
    v01 = fvs[..., 1, :] - fvs[..., 0, :]
    v02 = fvs[..., 2, :] - fvs[..., 0, :]
    return jnp.linalg.norm(jnp.cross(v01, v02), axis=-1) / 2.0


def compute_fnorms(verts: jnp.ndarray, faces: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """verts (...,V,3), faces (F,3) → unit face normals (...,F,3)."""
    v0 = jnp.take(verts, faces[:, 0], axis=-2)
    v1 = jnp.take(verts, faces[:, 1], axis=-2)
    v2 = jnp.take(verts, faces[:, 2], axis=-2)
    n = jnp.cross(v1 - v0, v2 - v0)
    return n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), eps, None)


def compute_vnorms(verts: jnp.ndarray, faces: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Area-weighted vertex normals via segment-sum scatter of face normals.

    verts (...,V,3), faces (F,3) → (...,V,3). Equivalent to the reference's
    scatter-add of per-face normals onto incident vertices
    (``utils/utils.py:315-321``) but expressed as one scatter over the
    flattened (face,corner) index set — a single XLA scatter-add.
    """
    fn = compute_fnorms(verts, faces, eps)  # (...,F,3)
    V = verts.shape[-2]
    idx = faces.reshape(-1)  # (F*3,)
    fn3 = jnp.repeat(fn, 3, axis=-2)  # (...,F*3,3)

    def scatter_one(fnorms_flat):
        return jax.ops.segment_sum(fnorms_flat, idx, num_segments=V)

    batch_shape = fn3.shape[:-2]
    flat = fn3.reshape((-1,) + fn3.shape[-2:])
    out = jax.vmap(scatter_one)(flat).reshape(batch_shape + (V, 3))
    return out / jnp.clip(jnp.linalg.norm(out, axis=-1, keepdims=True), eps, None)


# ---------------------------------------------------------------------------
# DCT temporal basis
# ---------------------------------------------------------------------------

def dct_basis(k: int, n: int) -> np.ndarray:
    """Orthonormal DCT-II row k over a window of n frames."""
    assert k < n
    grid = np.pi * (np.arange(n, dtype=np.float64) + 0.5) * k / float(n)
    scale = 1.0 / np.sqrt(float(n)) if k == 0 else np.sqrt(2.0 / float(n))
    return (np.cos(grid) * scale).astype(np.float32)


def dct_null_space(k: int, n: int) -> np.ndarray:
    """Rows k..n-1 of the DCT basis: the high-frequency null space used by
    the temporal pose prior."""
    return np.stack([dct_basis(i, n) for i in range(k, n)])


def dct_space(k: int, n: int) -> np.ndarray:
    """Rows 0..k-1 (low-frequency subspace), used to initialize per-frame
    latent codes in a smooth subspace."""
    return np.stack([dct_basis(i, n) for i in range(0, k)])
