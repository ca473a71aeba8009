"""LBS voxel skinner — TPU-native.

Parity with reference ``model/Deformer.py:216-623`` (``LBSkinner``,
``compute_lbswField``, ``smooth_weights``, ``initialLBSkinner``): SMPL
linear blend skinning driven by a precomputed 24-channel voxel
skinning-weight field, sampled with the (arbitrary-order differentiable)
trilinear sampler. The forward-kinematics chain composes 24 4x4 joint
transforms; ``init_pose`` stores the inverse of the A-pose chain so the
deformation is A-pose canonical → T-rest → posed.

Design note (documented deviation): the reference's fallback
``compute_lbswField`` builds the weight grid on the tight per-axis vertex
bbox while ``inv_transform_v`` samples assuming a cube of side
``bbox_extend`` around ``bbox_center`` — a known truncation bug that the
reference works around by always loading cached/fite weights
(``utils/utils.py:380-381`` drops recomputed ws on restore). We build the
grid directly on the sampling cube, so construction and sampling agree.

KNN weight diffusion (mean_neighbor=30 inverse-distance + 30 rounds of
6-neighbor smoothing) runs as chunked dense distance matmuls — an
MXU-friendly one-time cost.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_3d, grid_sample_3d_cl
from ..ops.math3d import batch_rodrigues
from .smpl import SMPLModel, forward_kinematics, get_smpl, smpl_forward, smpl_skeleton


@dataclass
class SkinnerParams:
    """Pytree of skinner state (all jnp arrays; registered below)."""

    ws: jnp.ndarray           # (24, D, H, W) weight field
    Js: jnp.ndarray           # (24, 3) rest joints
    init_pose_inv: jnp.ndarray  # (24, 4, 4) inverse A-pose chain (or identity)
    extra_trans: jnp.ndarray  # (1, 3)
    bbox_center: jnp.ndarray  # (3,)
    bbox_extend: jnp.ndarray  # () scalar cube side
    b_min: jnp.ndarray        # (3,) data bbox (margin source)
    b_max: jnp.ndarray        # (3,)


jax.tree_util.register_pytree_node(
    SkinnerParams,
    lambda s: ((s.ws, s.Js, s.init_pose_inv, s.extra_trans, s.bbox_center,
                s.bbox_extend, s.b_min, s.b_max), None),
    lambda _, c: SkinnerParams(*c),
)

SMPL_PARENTS_STATIC = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)


def bbox_size(sk: SkinnerParams):
    """Margin-padded bbox used for the SDF evaluation domain
    (reference Deformer.py:274-280: margin (0.15, 0.15, 0.20))."""
    margin = jnp.asarray([0.15, 0.15, 0.20], jnp.float32)
    return sk.b_min - margin, sk.b_max + margin


def init_pose_inverse(init_pose_rotmats: jnp.ndarray, Js: jnp.ndarray, parents) -> jnp.ndarray:
    """Inverse of the A-pose transform chain (Deformer.py:282-304).

    init_pose_rotmats (24,3,3); Js (24,3). Returns (24,4,4) with
    inv[:3,:3] = Rᵀ, inv[:3,3] = -Rᵀ T (joint positions in world space).
    """
    parents = np.asarray(parents)
    Rs = [init_pose_rotmats[0]]
    Ts = [Js[0]]
    for i in range(1, parents.shape[0]):
        j_rel = Js[i] - Js[parents[i]]
        Rs.append(jnp.matmul(Rs[parents[i]], init_pose_rotmats[i], precision=jax.lax.Precision.HIGHEST))
        Ts.append(Rs[parents[i]] @ j_rel + Ts[parents[i]])
    invs = []
    for R, T in zip(Rs, Ts):
        inv = jnp.zeros((4, 4))
        inv = inv.at[:3, :3].set(R.T)
        inv = inv.at[:3, 3].set(-(R.T @ T))
        inv = inv.at[3, 3].set(1.0)
        invs.append(inv)
    return jnp.stack(invs)


def skinning_transforms(sk: SkinnerParams, poses: jnp.ndarray, parents=SMPL_PARENTS_STATIC):
    """poses (B,24,3) axis-angle → per-joint skinning transforms (B,24,4,4):
    FK chain composed with the stored inverse A-pose chain."""
    B = poses.shape[0]
    rotmats = batch_rodrigues(poses.reshape(-1, 3)).reshape(B, 24, 3, 3)
    results = forward_kinematics(rotmats, sk.Js, parents)
    return jnp.matmul(results, sk.init_pose_inv[None], precision=jax.lax.Precision.HIGHEST)


def inv_transform_v(sk: SkinnerParams, v: jnp.ndarray) -> jnp.ndarray:
    """World → normalized sampling coords: (v - center)/extend * 2."""
    return (v - sk.bbox_center) / sk.bbox_extend * 2.0


def sample_skin_weights(sk: SkinnerParams, tps: jnp.ndarray) -> jnp.ndarray:
    """tps (N,3) canonical points → (N,24) LBS weights via trilinear
    sampling of the voxel field (replaces GridSamplerMine; JAX AD provides
    the double-backward the reference hand-wrote in CUDA)."""
    nps = inv_transform_v(sk, tps.reshape(-1, 3))
    # channel-last gather: the stored (24, D, H, W) layout is kept for
    # checkpoint compatibility; the transpose is loop-invariant (XLA
    # hoists/CSEs it once per program) while the gather itself drops
    # from 24 strided tile-pulls to one contiguous row per corner
    # (ops/grid_sample.grid_sample_3d_cl).
    vol_cl = jnp.transpose(sk.ws, (1, 2, 3, 0))
    return grid_sample_3d_cl(vol_cl, nps, align_corners=False)


def skinner_apply(sk: SkinnerParams, ps, poses, trans, batch_inds=None, tps=None,
                  also_apply=None):
    """Apply LBS.

    ps: (B,N,3) canonical points (post-offset), or (M,3) with
    ``batch_inds`` (M,) selecting each point's frame.
    poses (B,24,3), trans (B,3). tps: points at which to sample the
    weight volume (defaults to ps — matching CompositeDeformer, which
    passes the offset points straight through).
    Returns posed points, same leading shape as ps.

    also_apply: optional second point set (same shape as ps) posed with
    the SAME blended transforms (weights sampled at ``tps``/``ps``, not
    at ``also_apply``) — returns (posed_ps, posed_also). Used by the
    def-consistency loss to get an LBS-only posing of the un-offset
    verts without a second full-capacity weight-field sampling (the
    8-corner gather over the voxel field is the dominant deformer cost
    on TPU, ~45 ms/step at the fine caps — r4 trace). The weights are
    sampled at the offset points rather than the raw verts (the
    reference's second pass samples at the raw verts,
    OptimGarmentNetwork.py:651-664); offsets are cm-scale against a
    smoothed voxel field, so the difference is far below the loss's
    GM-robust scale c.
    """
    if tps is None:
        tps = ps
    A = skinning_transforms(sk, poses)  # (B,24,4,4)
    trans = trans + sk.extra_trans
    ws = sample_skin_weights(sk, tps)  # (M,24) flat over all points

    if batch_inds is None:
        B, N, _ = ps.shape
        ws = ws.reshape(B, N, 24)
        T = jnp.einsum("bnj,bjxy->bnxy", ws, A, precision=jax.lax.Precision.HIGHEST)

        def pose_pts(q):
            qh = jnp.concatenate([q, jnp.ones(q.shape[:-1] + (1,))], axis=-1)
            o = jnp.einsum("bnxy,bny->bnx", T, qh, precision=jax.lax.Precision.HIGHEST)[..., :3]
            return o + trans[:, None, :]

        if also_apply is not None:
            return pose_pts(ps), pose_pts(jnp.broadcast_to(also_apply, ps.shape))
        return pose_pts(ps)
    flat = ps.reshape(-1, 3)
    Ai = A[batch_inds]  # (M,24,4,4)
    T = jnp.einsum("mj,mjxy->mxy", ws, Ai, precision=jax.lax.Precision.HIGHEST)

    def pose_flat(q):
        qh = jnp.concatenate([q, jnp.ones((q.shape[0], 1))], axis=-1)
        o = jnp.einsum("mxy,my->mx", T, qh, precision=jax.lax.Precision.HIGHEST)[..., :3]
        return o + trans[batch_inds]

    if also_apply is not None:
        return pose_flat(flat), pose_flat(also_apply.reshape(-1, 3))
    return pose_flat(flat)


def posed_skeleton(sk: SkinnerParams, poses: jnp.ndarray, parents=SMPL_PARENTS_STATIC):
    """FK joint positions per frame (B,24,3) — used by the DCT pose prior
    (Deformer.py:309-330)."""
    B = poses.shape[0]
    rotmats = batch_rodrigues(poses.reshape(-1, 3)).reshape(B, 24, 3, 3)
    results = forward_kinematics(rotmats, sk.Js, parents)
    return results[:, :, :3, 3]


# ---------------------------------------------------------------------------
# Weight-field construction
# ---------------------------------------------------------------------------

def smooth_weights(w: jnp.ndarray, times: int = 3) -> jnp.ndarray:
    """Iterative 6-neighbor partial smoothing + renormalization
    (Deformer.py:533-544). w: (C, D, H, W)."""

    def step(w, _):
        interior_mean = (
            w[:, 2:, 1:-1, 1:-1] + w[:, :-2, 1:-1, 1:-1]
            + w[:, 1:-1, 2:, 1:-1] + w[:, 1:-1, :-2, 1:-1]
            + w[:, 1:-1, 1:-1, 2:] + w[:, 1:-1, 1:-1, :-2]
        ) / 6.0
        blended = (w[:, 1:-1, 1:-1, 1:-1] - interior_mean) * 0.7 + interior_mean
        w = w.at[:, 1:-1, 1:-1, 1:-1].set(blended)
        w = w / w.sum(0, keepdims=True)
        return w, None

    w, _ = jax.lax.scan(step, w, None, length=times)
    return w


def compute_lbsw_field(center, extend, resolution, smpl_verts, smpl_ws,
                       mean_neighbor: int = 30, smooth_times: int = 30,
                       chunk: int = 65536) -> jnp.ndarray:
    """Diffuse SMPL per-vertex weights into a voxel field.

    Grid spans the cube [center - extend/2, center + extend/2] per axis
    (see module docstring for why this deviates from the reference's tight
    bbox). resolution = (W, H, D); returns (24, D, H, W).

    Per voxel: inverse-distance blend of the ``mean_neighbor`` nearest
    SMPL vertices (dists clamped to [1e-4, 1]), then ``smooth_times``
    smoothing rounds. Distances are computed as one (chunk x V) matmul
    per chunk — MXU work, not a KNN tree.
    """
    W, H, D = (int(r) for r in resolution)
    center = jnp.asarray(center, jnp.float32).reshape(3)
    extend = jnp.asarray(extend, jnp.float32)
    b_min = center - extend / 2.0
    step = extend / jnp.asarray([W, H, D], jnp.float32)

    zz, yy, xx = jnp.meshgrid(jnp.arange(D), jnp.arange(H), jnp.arange(W), indexing="ij")
    coords = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(jnp.float32)
    # voxel centers (align_corners=False)
    world = coords * step + b_min + step / 2.0

    smpl_verts = jnp.asarray(smpl_verts, jnp.float32)
    smpl_ws = jnp.asarray(smpl_ws, jnp.float32)
    v_sq = jnp.sum(smpl_verts**2, axis=-1)

    n = world.shape[0]
    pad = (-n) % chunk
    world_p = jnp.pad(world, ((0, pad), (0, 0)))
    chunks = world_p.reshape(-1, chunk, 3)

    def per_chunk(pts):
        d2 = jnp.sum(pts**2, -1)[:, None] - 2.0 * pts @ smpl_verts.T + v_sq[None]
        d = jnp.sqrt(jnp.maximum(d2, 0.0))
        neg_d, idx = jax.lax.top_k(-d, mean_neighbor)
        dist = jnp.clip(-neg_d, 1e-4, 1.0)
        wk = 1.0 / dist
        wk = wk / wk.sum(-1, keepdims=True)
        return jnp.einsum("nk,nkj->nj", wk, smpl_ws[idx])

    fws = jax.lax.map(per_chunk, chunks).reshape(-1, smpl_ws.shape[-1])[:n]
    fws = fws.T.reshape(smpl_ws.shape[-1], D, H, W)
    return smooth_weights(fws, smooth_times)


def initial_lbs_skinner(model: SMPLModel, shape, init_pose, resolution=(129, 225, 65),
                        extra_trans=None) -> tuple[SkinnerParams, jnp.ndarray, np.ndarray]:
    """Build the skinner from a shaped SMPL body in the A-pose
    (reference ``initialLBSkinner``, Deformer.py:594-623).

    Returns (SkinnerParams, A-pose body verts (V,3), faces (F,3)).
    """
    Js = smpl_skeleton(model, shape)
    verts, _, _ = smpl_forward(model, shape, jnp.asarray(init_pose).reshape(1, 24, 3))
    verts = verts[0]
    bmin = verts.min(0)
    bmax = verts.max(0)
    extend = (bmax - bmin).max() * 1.1
    center = (bmin + bmax) / 2.0

    ws = compute_lbsw_field(center, extend, resolution, verts, jnp.asarray(model.weights),
                            mean_neighbor=30, smooth_times=30)
    rotmats = batch_rodrigues(jnp.asarray(init_pose).reshape(24, 3))
    inv = init_pose_inverse(rotmats, Js, model.parents)
    if extra_trans is None:
        extra_trans = jnp.zeros((1, 3))
    sk = SkinnerParams(
        ws=ws, Js=Js, init_pose_inv=inv,
        extra_trans=jnp.asarray(extra_trans).reshape(1, 3),
        bbox_center=center, bbox_extend=extend, b_min=bmin, b_max=bmax,
    )
    return sk, verts, model.faces
