"""Network assembly from config + dataset — getOptNet parity
(``model/network.py:182-361``): builds SDF nets, the skinner (with the
caching behavior of initial_skinner_%d.pth / initial_sdf_idr_*.pth),
deformer, cameras, the Seg3dLossless engine config, render net and the
garment network; runs the beta pre-optimizer when TCMR joints exist."""

from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from ..config.constants import TEMPLATE_GARMENT
from ..data.dataset import SceneDataset
from ..models.garment_model import init_model
from ..models.skinner import SkinnerParams, bbox_size, initial_lbs_skinner
from ..models.smpl import get_smpl
from ..ops.seg3d import Seg3dConfig
from .beta_optimizer import smpl_beta_optimizer
from .network import GarmentOptimNetwork, TrainConfig


def apose_from_type(init_pose_type: int = 0) -> np.ndarray:
    """utils.smpl_tmp_Apose parity (utils/utils.py:68-99)."""
    pose = np.zeros((24, 3), np.float32)
    if init_pose_type == 0:
        legs, arms = 10.0, 45.0
    elif init_pose_type == 1:
        legs, arms = 7.0, 55.0
    elif init_pose_type == 2:
        legs, arms = 15.0, 55.0
    elif init_pose_type == 3:
        legs, arms = 15.0, 0.0
    else:
        raise ValueError(init_pose_type)
    pose[1] = [0, 0, legs / 180 * np.pi]
    pose[2] = [0, 0, -legs / 180 * np.pi]
    pose[16] = [0, 0, -arms / 180 * np.pi]
    pose[17] = [0, 0, arms / 180 * np.pi]
    return pose


def resolution_pyramids(level: str, quality: str = "coarse"):
    """MC grid pyramids (reference train.py:47-79). Each axis satisfies
    res_{k+1} = 2·res_k − 1."""
    base = {
        "coarse": (15, 21, 9),     # → (225, 321, 129)
        "medium": (19, 25, 13),    # → (289, 385, 193)
        "fine": (21, 27, 15),      # → (321, 417, 225)
        "higher": (33, 33, 33),    # → (513, 513, 513) inference option
        "small": (9, 13, 7),
        "tiny": (7, 9, 5),         # CI smoke: (13, 17, 9)
    }[level]
    levels = {"coarse": 4, "medium": 4, "fine": 4, "higher": 4, "small": 3,
              "tiny": 1}[level]
    out = [tuple(base)]
    for _ in range(levels):
        out.append(tuple(2 * r - 1 for r in out[-1]))
    return tuple(out)


def build_opt_net(conf, dataset: SceneDataset, save_root: str,
                  resolutions=None, skinner_res=(129, 225, 65),
                  train_cfg: TrainConfig | None = None, seed: int = 0,
                  smpl_dir: str | None = None):
    """Assemble the GarmentOptimNetwork for a scene."""
    garment_type = conf.get_string("train.garment_type")
    garment_names = TEMPLATE_GARMENT[garment_type]
    init_pose_type = conf.get_int("train.skinner_pose_type", 0)

    # skinner: cached per scene (initial_skinner parity)
    os.makedirs(save_root, exist_ok=True)
    skin_cache = osp.join(save_root, f"initial_skinner_{init_pose_type}.npz")
    model = get_smpl(dataset.gender, smpl_dir)
    init_pose = apose_from_type(init_pose_type)
    if osp.isfile(skin_cache):
        data = np.load(skin_cache)
        sk = SkinnerParams(
            ws=jnp.asarray(data["ws"]), Js=jnp.asarray(data["Js"]),
            init_pose_inv=jnp.asarray(data["init_pose_inv"]),
            extra_trans=jnp.asarray(data["extra_trans"]),
            bbox_center=jnp.asarray(data["bbox_center"]),
            bbox_extend=jnp.asarray(data["bbox_extend"]),
            b_min=jnp.asarray(data["b_min"]), b_max=jnp.asarray(data["b_max"]),
        )
        body_vs = jnp.asarray(data["tmpBodyVs"])
        body_fs = data["tmpBodyFs"]
    else:
        # Beta pre-fit from TCMR 2D joints before skinner construction
        # (reference model/network.py:258 → engineer/core/beta_optimizer.py:132).
        extra_trans = None
        if dataset.gt_joints2d is not None:
            betas, extra_trans = smpl_beta_optimizer(model, init_pose, dataset)
            dataset.params.shape = np.asarray(betas, np.float32).reshape(-1)
        # fite diffused skinning weights if the scene ships them
        fite = osp.join(dataset.root, "diffused_skinning_weights.npy")
        sk, body_vs, body_fs = initial_lbs_skinner(
            model, jnp.asarray(dataset.params.shape), init_pose, skinner_res,
            extra_trans=extra_trans)
        if osp.isfile(fite):
            ws = np.load(fite)
            sk = SkinnerParams(ws=jnp.asarray(ws.reshape(ws.shape[-4:])
                                              if ws.ndim > 4 else ws),
                               Js=sk.Js, init_pose_inv=sk.init_pose_inv,
                               extra_trans=sk.extra_trans, bbox_center=sk.bbox_center,
                               bbox_extend=sk.bbox_extend, b_min=sk.b_min, b_max=sk.b_max)
        np.savez(skin_cache,
                 ws=np.asarray(sk.ws), Js=np.asarray(sk.Js),
                 init_pose_inv=np.asarray(sk.init_pose_inv),
                 extra_trans=np.asarray(sk.extra_trans),
                 bbox_center=np.asarray(sk.bbox_center),
                 bbox_extend=np.asarray(sk.bbox_extend),
                 b_min=np.asarray(sk.b_min), b_max=np.asarray(sk.b_max),
                 tmpBodyVs=np.asarray(body_vs), tmpBodyFs=np.asarray(body_fs))

    image_size = (dataset.W, dataset.H)
    params, statics, _ = init_model(jax.random.PRNGKey(seed), conf, garment_names,
                                    sk, image_size)

    bmin, bmax = bbox_size(sk)
    if resolutions is None:
        resolutions = resolution_pyramids("coarse")
    seg3d_cfg = Seg3dConfig(
        b_min=tuple(np.asarray(bmin).tolist()),
        b_max=tuple(np.asarray(bmax).tolist()),
        resolutions=tuple(resolutions),
    )

    # MC buffer capacity from the finest grid: boundary voxels scale with
    # the largest cross-section area (observed ~2-4x max-face for bodies)
    Wg, Hg, Dg = resolutions[-1]
    max_face = max(Wg * Hg, Wg * Dg, Hg * Dg)
    cap_v = 1 << int(np.ceil(np.log2(8 * max_face)))
    # optional train.caps block: smoke/CI configs size the static buffers
    # down so the full CLI compiles quickly on CPU
    def _cap(key, default):
        return conf.get_int(f"train.caps.{key}", default)

    cfg = train_cfg or TrainConfig(
        sample_pix=conf.get_int("train.sample_pix_num", 2048),
        point_radius=conf.get_float("train.coarse.point_render.radius", 0.006),
        remesh_intersect=conf.get_int("train.coarse.point_render.remesh_intersect", 30),
        batch_size=conf.get_int("train.coarse.point_render.batch_size", 3),
        image_size=image_size,
        mc_capacity_v=_cap("mc_capacity_v", cap_v),
        mc_capacity_f=_cap("mc_capacity_f", 2 * cap_v),
        raster_tile=_cap("raster_tile", 32),
        raster_cap_mesh=_cap("raster_cap_mesh", 512),
        raster_cap_points=_cap("raster_cap_points", 768),
        points_per_pixel=_cap("points_per_pixel", 24),
        solver_times=_cap("solver_times", 20),
        surface_sample=_cap("surface_sample", 4096),
        zbuf_downscale=_cap("zbuf_downscale", 4),
        seed_downscale=_cap("seed_downscale", 2),
        # default 1/2-res soft-mask rendering at production image sizes
        # (coverage-equivalent, see TrainConfig.mask_render_downscale);
        # small/CI images keep the reference-exact full-res render
        mask_render_downscale=_cap("mask_render_downscale",
                                   2 if min(image_size) >= 720 else 1),
    )

    loss_conf = conf.get_config("loss_coarse") if "loss_coarse" in conf else conf
    net = GarmentOptimNetwork(conf, dataset, params, statics, None,
                              body_vs, body_fs, seg3d_cfg, cfg)
    net.loss_conf = loss_conf
    net.conf = _MergedConf(conf, loss_conf)
    return net


class _MergedConf:
    """Lookup shim: loss keys resolve in the active loss block, train.*
    keys in the full config (set_hierarchical_config swaps the block)."""

    def __init__(self, full, loss):
        self.full = full
        self.loss = loss

    def _pick(self, path):
        return self.full if path.startswith("train") else self.loss

    def __contains__(self, path):
        return path in self._pick(path) or path in self.full

    def get_float(self, path, default=None):
        src = self._pick(path)
        if path in src:
            return src.get_float(path)
        if path in self.full:
            return self.full.get_float(path)
        if default is not None:
            return default
        raise KeyError(path)

    def get_int(self, path, default=None):
        src = self._pick(path)
        if path in src:
            return src.get_int(path)
        if path in self.full:
            return self.full.get_int(path)
        if default is not None:
            return default
        raise KeyError(path)

    def get_bool(self, path, default=None):
        src = self._pick(path)
        if path in src:
            return src.get_bool(path)
        if path in self.full:
            return self.full.get_bool(path)
        if default is not None:
            return default
        raise KeyError(path)

    def get_string(self, path, default=None):
        src = self._pick(path)
        if path in src:
            return src.get_string(path)
        if path in self.full:
            return self.full.get_string(path)
        if default is not None:
            return default
        raise KeyError(path)

    def get_config(self, path):
        src = self._pick(path)
        if path in src:
            return src.get_config(path)
        return self.full.get_config(path)

    def set_loss_block(self, loss):
        self.loss = loss
