"""Explicit 3D feature curves (Intersect_Free_Curve) — TPU-native.

Parity with reference ``engineer/utils/garment_structure.py:36-274``: each
curve is parameterized intersection-free by construction as

    verts = center + dirs · init_scale · relu(scale) + nx_scale · nx

with fixed center, unit radial directions ``dirs``, initial radial
extents ``init_scale``, and mean plane normal ``nx``; the learnable
parameters are the per-point radial multiplier ``scale`` (init 1) and the
out-of-plane offset ``nx_scale`` (init 0).

The curves live as one stacked (N_curves, sample_num, ·) tensor — all
curves evaluate/regularize in one fused pass (the reference loops per
curve). Curve extraction from template patches (boundary loop + uniform
resampling) is host-side via geometry.mesh_utils / geometry.polygons.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.mesh_utils import longest_boundary_loop
from ..geometry.polygons import uniform_sample_3d


@dataclass
class CurveStatics:
    """Fixed curve geometry (buffers in the reference)."""

    center: jnp.ndarray        # (N, 1, 3)
    v_dirs: jnp.ndarray        # (N, S, 3)
    init_scale: jnp.ndarray    # (N, S, 1)
    nx: jnp.ndarray            # (N, 1, 3) mean plane normal
    cano_smpl_verts: jnp.ndarray  # (N, S, 3) pre-alignment body-space curves
    fl_names: tuple


jax.tree_util.register_pytree_node(
    CurveStatics,
    lambda c: ((c.center, c.v_dirs, c.init_scale, c.nx, c.cano_smpl_verts), c.fl_names),
    lambda names, leaves: CurveStatics(*leaves, fl_names=names),
)


def extract_curve_from_patch(verts: np.ndarray, faces: np.ndarray,
                             sample_num: int = 200) -> np.ndarray:
    """Template patch → uniform closed curve: take the longer boundary
    loop and uniform-resample to sample_num points
    (garment_structure.py:156-178; the patch has exactly two boundary
    loops after slicing, the longer one is the feature line)."""
    loop = longest_boundary_loop(faces, verts)
    return uniform_sample_3d(verts[loop], sample_num).astype(np.float32)


def init_curves(curve_verts_list, cano_smpl_verts_list, fl_names):
    """Build (params, statics) from aligned canonical curves (N lists of
    (S,3)) and their pre-alignment body-space versions."""
    cv = jnp.asarray(np.stack(curve_verts_list))        # (N, S, 3)
    center = cv.mean(1, keepdims=True)
    rel = cv - center
    v_dirs = rel / (jnp.linalg.norm(rel, axis=-1, keepdims=True) + 1e-6)
    nx = jnp.cross(v_dirs[:, :-1, :], v_dirs[:, 1:, :])
    nx = nx / jnp.linalg.norm(nx, axis=-1, keepdims=True)
    nx = nx.mean(axis=1, keepdims=True)
    init_scale = jnp.clip((rel * v_dirs).sum(-1, keepdims=True), 0.0, None)

    statics = CurveStatics(
        center=center, v_dirs=v_dirs, init_scale=init_scale, nx=nx,
        cano_smpl_verts=jnp.asarray(np.stack(cano_smpl_verts_list)),
        fl_names=tuple(fl_names),
    )
    params = {
        "scale": jnp.ones_like(init_scale),
        "nx_scale": jnp.zeros_like(init_scale),
    }
    return params, statics


def curves_forward(params: dict, statics: CurveStatics) -> jnp.ndarray:
    """(N, S, 3) current canonical curve vertices."""
    radial = statics.v_dirs * statics.init_scale * jax.nn.relu(params["scale"])
    return statics.center + radial + params["nx_scale"] * statics.nx


def curves_regularization(params: dict, statics: CurveStatics, fl_masks) -> dict:
    """Center-drift term (weight 0 in the reference — kept for parity) and
    neighbor-direction cosine smoothness over the closed loop
    (garment_structure.py:127-150)."""
    verts = curves_forward(params, statics)
    used = (jnp.sum(fl_masks) > 0).astype(jnp.float32)
    center_loss = used * jnp.abs(verts.mean(1, keepdims=True) - statics.center).sum()

    diff_a = verts[:, :-1, :] - verts[:, 1:, :]
    diff_b = verts[:, -1:, :] - verts[:, 0:1, :]
    diff_c = verts[:, 0:1, :] - verts[:, 1:2, :]
    d = jnp.concatenate([diff_a, diff_b, diff_c], axis=1)
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-6)
    cos = jnp.sum(d[:, :-1, :] * d[:, 1:, :], axis=-1)
    return {"center_offset": 0.0 * center_loss, "diff_a_loss": jnp.sum(1.0 - cos)}


def curve_to_tube_mesh(curve: np.ndarray, normal: np.ndarray,
                       curve_radius: float = 0.002, num_joints: int = 6):
    """Sweep a radius-``curve_radius`` tube with ``num_joints`` ring
    vertices along a closed curve (garment_structure.py:183-270) — the
    exported feature-line visualization meshes of infer_fl_curve.
    Returns (verts (S*J,3), faces). Host-side numpy."""
    c = np.asarray(curve, np.float64)
    S = c.shape[0]
    tang = np.roll(c, -1, 0) - c
    tang /= np.clip(np.linalg.norm(tang, axis=1, keepdims=True), 1e-12, None)
    n0 = np.broadcast_to(np.asarray(normal, np.float64).reshape(1, 3), (S, 3))
    cross_n = np.cross(tang, n0)
    dot_n = tang * (tang * n0)
    rings = []
    for ang in range(0, 360, 360 // num_joints):
        r = np.radians(ang)
        rot = n0 * np.cos(r) + cross_n * np.sin(r) + dot_n * (1 - np.cos(r))
        rings.append(rot)
    rings = np.stack(rings, axis=1)  # (S, J, 3)
    verts = (c[:, None, :] + curve_radius * rings).reshape(-1, 3)
    faces = []
    J = num_joints
    for s in range(S):
        s2 = (s + 1) % S
        for j in range(J):
            j2 = (j + 1) % J
            a = s * J + j
            b = s2 * J + j
            cx = s2 * J + j2
            dx = s * J + j2
            faces.append([a, b, cx])
            faces.append([a, cx, dx])
    return verts.astype(np.float32), np.asarray(faces, np.int64)


def refit_curve_scale(params, statics, target_verts_by_idx: dict,
                      steps: int = 2000, lr: float = 1e-4):
    """Chamfer-refit selected curves' radial scales to given target
    polylines (the optional 20k-step refit inside curve_to_mesh,
    garment_structure.py:183-215) — jitted Adam on (scale, nx_scale)."""
    import optax

    idxs = tuple(sorted(target_verts_by_idx))
    targets = jnp.asarray(np.stack([target_verts_by_idx[i] for i in idxs]))
    sel = jnp.asarray(idxs, jnp.int32)

    opt = optax.adamw(lr)

    def loss_fn(p):
        verts = curves_forward(p, statics)[sel]  # (K, S, 3)
        d2 = jnp.sum((verts[:, :, None, :] - targets[:, None, :, :]) ** 2, -1)
        cham = jnp.mean(jnp.min(d2, 2)) + jnp.mean(jnp.min(d2, 1))
        d = verts[:, 1:, :] - verts[:, :-1, :]
        d = jnp.concatenate([d, verts[:, :1] - verts[:, -1:]], axis=1)
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-6)
        smooth = jnp.sum(1 - jnp.sum(d[:, :-1] * d[:, 1:], -1))
        return 1000.0 * cham + 0.1 * smooth

    @jax.jit
    def step(p, s):
        g = jax.grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s

    state = opt.init(params)
    for _ in range(steps):
        params, state = step(params, state)
    return params
