"""Rigid / similarity alignment — TPU-native.

Parity with reference ``engineer/optimizer/icp_optimzier.py`` (classic
ICP), ``engineer/utils/matrix_transform.py:27``
(``scale_icp_rotate_center_transform``: Umeyama similarity alignment),
and ``engineer/optimizer/surface_intesection.py:31`` (curve-to-surface
snapping along rays).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn


def umeyama(src: jnp.ndarray, dst: jnp.ndarray, with_scale: bool = True):
    """Closed-form similarity transform argmin ‖s R src + t − dst‖²
    (Umeyama 1991). Returns (s, R (3,3), t (3,)), applied as s·x@Rᵀ+t."""
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = jnp.matmul(xd.T, xs, precision=jax.lax.Precision.HIGHEST) / src.shape[0]
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.asarray([1.0, 1.0, d]))
    R = U @ D @ Vt
    if with_scale:
        var_s = jnp.mean(jnp.sum(xs * xs, -1))
        s = jnp.sum(S * jnp.asarray([1.0, 1.0, d])) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.asarray(1.0)
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def icp(src: np.ndarray, dst: np.ndarray, iters: int = 20, with_scale: bool = False):
    """Classic point-to-point ICP: correspondences by NN, closed-form
    update. Returns (s, R, t) mapping src → dst."""
    cur = jnp.asarray(src, jnp.float32)
    dstj = jnp.asarray(dst, jnp.float32)
    s_tot = jnp.asarray(1.0)
    R_tot = jnp.eye(3)
    t_tot = jnp.zeros(3)
    for _ in range(iters):
        _, idx = knn(cur, dstj, 1)
        corr = dstj[idx[:, 0]]
        s, R, t = umeyama(cur, corr, with_scale)
        cur = s * cur @ R.T + t
        R_tot = R @ R_tot
        s_tot = s * s_tot
        t_tot = s * (R @ t_tot) + t
    return s_tot, R_tot, t_tot


def snap_points_to_surface(points, directions, verts, faces, max_dist=0.1, steps=64):
    """Curve-to-surface snapping (surface_intesection.py semantics): march
    each point along ±direction to the closest mesh-surface crossing,
    approximated by sampling NN distance along the segment. Host helper
    for registration; not on the jitted path."""
    points = jnp.asarray(points, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32)
    directions = directions / jnp.clip(jnp.linalg.norm(directions, -1, keepdims=True), 1e-9, None)
    ts = jnp.linspace(-max_dist, max_dist, steps)
    cand = points[:, None, :] + ts[None, :, None] * directions[:, None, :]
    flat = cand.reshape(-1, 3)
    d2, _ = knn(flat, jnp.asarray(verts, jnp.float32), 1)
    d2 = d2.reshape(points.shape[0], steps)
    best = jnp.argmin(d2, axis=1)
    return cand[jnp.arange(points.shape[0]), best]
