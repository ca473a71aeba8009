"""Laplacian-editing template deformation — TPU-native.

Parity with reference ``engineer/optimizer/lap_deform_optimizer.py:25-192``
(``Laplacian_Optimizer``): deform template vertices so selected source
vertices land on target positions while preserving local differential
coordinates. Weighted least squares over the stacked system
[L; C] u = [L v; targets] solved in closed form through the normal
equations — the reference densifies the system anyway (``:172``), and a
dense (N,N) solve is exactly what TPUs are good at (one big MXU solve vs
the reference's CPU pseudo-inverse). Optional one-step neighborhood
smoothing afterwards (``smooth=True`` path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def uniform_laplacian(faces: np.ndarray, num_verts: int) -> np.ndarray:
    """pytorch3d ``laplacian_packed`` semantics (dense): L_ij = 1/deg(i)
    for each neighbor j, L_ii = −1 (rows sum to zero)."""
    L = np.zeros((num_verts, num_verts), np.float32)
    faces = np.asarray(faces, np.int64)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], 0)
    e = np.unique(np.sort(edges, axis=1), axis=0)
    adj = np.zeros((num_verts, num_verts), bool)
    adj[e[:, 0], e[:, 1]] = True
    adj[e[:, 1], e[:, 0]] = True
    deg = adj.sum(1)
    nz = deg > 0
    L[adj] = 1.0
    L[nz] = L[nz] / deg[nz, None]
    L[np.arange(num_verts), np.arange(num_verts)] = np.where(nz, -1.0, 0.0)
    return L


def laplacian_deform(verts, faces, constraint_ids, constraint_targets,
                     constrain_weight: float = 1.0, smooth: bool = True):
    """Solve the Laplacian editing system.

    verts (N,3); constraint_ids (M,) int; constraint_targets (M,3).
    Returns the deformed vertices (N,3).
    """
    verts = jnp.asarray(verts, jnp.float32)
    n = verts.shape[0]
    L = jnp.asarray(uniform_laplacian(np.asarray(faces), n))
    delta = jnp.matmul(L, verts, precision=jax.lax.Precision.HIGHEST)

    cid = jnp.asarray(constraint_ids, jnp.int32)
    m = cid.shape[0]
    C = jnp.zeros((m, n), jnp.float32).at[jnp.arange(m), cid].set(1.0)
    A = jnp.concatenate([L, C], axis=0)
    t = jnp.concatenate([delta, jnp.asarray(constraint_targets, jnp.float32)], axis=0)
    w = jnp.concatenate([jnp.ones((n,)), jnp.full((m,), constrain_weight)])

    Aw = A * w[:, None]
    AtA = jnp.matmul(A.T, Aw, precision=jax.lax.Precision.HIGHEST)
    Atb = jnp.matmul(A.T, (t * w[:, None]), precision=jax.lax.Precision.HIGHEST)
    new_v = jnp.linalg.solve(AtA + 1e-8 * jnp.eye(n), Atb)

    if smooth:
        # one neighborhood-averaging step: zero the diagonal of L (leaves
        # the 1/deg neighbor weights) and apply (reference :184-187)
        Ls = L.at[jnp.arange(n), jnp.arange(n)].set(0.0)
        new_v = jnp.matmul(Ls, new_v, precision=jax.lax.Precision.HIGHEST)
    return new_v
