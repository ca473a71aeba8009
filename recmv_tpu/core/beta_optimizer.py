"""SMPL shape (beta) pre-optimization from 2D joints — TPU-native.

Parity with reference ``engineer/core/beta_optimizer.py:132-245``
(``smpl_beta_optimizer``): before building the skinner, fit the SMPL betas
and an extra global translation so the projected SMPL joints match the
TCMR-estimated 2D keypoints (confidence-weighted L1, COCO ordering),
~150 Adam iterations at lr 5e-3. Runs once per scene; jitted step."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import camera as cam_mod
from ..models.smpl import SMPLModel, smpl_forward

# cocoplus (SMPL joint_regressor output order) → COCO-17
COCOPLUS2COCO = [14, 15, 16, 17, 18, 9, 8, 10, 7, 11, 6, 3, 2, 4, 1, 5, 0]


def batch_kp_2d_l1_loss(real_2d_kp, predict_2d_kp):
    """Confidence-weighted L1 (beta_optimizer.py:69-80). real (.., K, 3)
    with [x, y, conf]; predict (.., K, 2)."""
    gt = real_2d_kp.reshape(-1, 3)
    pred = predict_2d_kp.reshape(-1, 2)
    vis = gt[:, 2]
    k = jnp.sum(vis) * 2.0 + 1e-8
    dif = jnp.sum(jnp.abs(gt[:, :2] - pred), axis=1)
    return jnp.dot(dif, vis) / k


def smpl_beta_optimizer(model: SMPLModel, init_pose, dataset, n_iters: int = 150,
                        lr: float = 5e-3, batch: int = 8,
                        joint_regressor: np.ndarray | None = None):
    """Fit (betas (10,), extra_trans (1,3)) to dataset.gt_joints2d.

    joint_regressor: optional cocoplus regressor (V, 19); falls back to
    the model's 24-joint regressor mapped through its first 17 rows when
    the cocoplus asset is absent (synthetic/body fallback)."""
    if dataset.gt_joints2d is None:
        return np.asarray(dataset.params.shape), np.zeros((1, 3), np.float32)

    fids = sorted(dataset.gt_joints2d.keys())[:: max(len(dataset.gt_joints2d) // batch, 1)][:batch]
    gt = jnp.asarray(np.stack([dataset.gt_joints2d[f] for f in fids]), jnp.float32)
    local = [f - dataset.start_idx for f in fids]
    local = [min(max(l, 0), dataset.frame_num - 1) for l in local]
    poses = jnp.asarray(dataset.params.poses[local])
    trans = jnp.asarray(dataset.params.trans[local])
    cam = cam_mod.make_camera(dataset.params.camera, (dataset.W, dataset.H))
    N = len(fids)

    use_coco = joint_regressor is not None
    JR = jnp.asarray(joint_regressor) if use_coco else None

    def project_joints(betas, extra_t):
        verts, joints, _ = smpl_forward(model, betas, poses)
        verts = verts + (trans + extra_t)[:, None, :]
        if use_coco:
            j = jnp.einsum("vj,bvc->bjc", JR, verts)
            j = j[:, COCOPLUS2COCO, :]
        else:
            j = joints + (trans + extra_t)[:, None, :]
        scr = cam_mod.transform_points_screen(cam, j)
        return scr[..., :2]

    def loss_fn(params):
        pred = project_joints(params["betas"], params["extra_trans"])
        K = min(pred.shape[1], gt.shape[1])
        return batch_kp_2d_l1_loss(gt[:, :K], pred[:, :K])

    params = {"betas": jnp.asarray(dataset.params.shape),
              "extra_trans": jnp.zeros((1, 3))}
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(n_iters):
        params, state, last = step(params, state)
    return np.asarray(params["betas"]), np.asarray(params["extra_trans"])
