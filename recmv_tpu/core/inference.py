"""Inference: garment extraction, registration and animation.

Parity with reference inference (SURVEY §3.5):
- ``registration`` (OptimGarmentNetwork.py:2316-2514): register the
  (open) garment templates onto the closed marching-cube iso-surfaces —
  multi-view visible-vertex scan, Laplacian curve alignment, NRICP coarse
  fit, remesh, NRICP refine; cached per garment.
- ``infer_garment`` (:2950): per-frame deformation of the registered open
  garment + exports.
- ``infer_garment_fl`` (:2861): tube-meshed feature curves per frame.
- ``infer_garment_animation`` (:2729): drive the registered garment with
  novel pose sequences (averaged latents, mean translation).
- ``smooth_trans`` (:2567): OneEuro smoothing of poses/translation.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from ..config.constants import FL_EXTRACT, SMOOTH_TRANS
from ..geometry.laplacian import laplacian_deform
from ..geometry.mesh_utils import boundary_loops, vertex_normals
from ..geometry.nricp import NricpConfig, nricp_fit
from ..models import camera as cam_mod
from ..models.curves import curve_to_tube_mesh, curves_forward
from ..models.garment_model import make_deform_fn, split_deform_conds
from ..models.skinner import skinner_apply
from ..ops.rasterizer import rasterize_mesh, screen_with_cam_z
from ..utils.io import save_obj


def visible_vertex_mask(verts, faces, n_views: int = 12, image: int = 512,
                        radius: float = 3.0):
    """Multi-view visibility scan (surface_finder,
    OptimGarmentNetwork.py:2321-2387): rasterize from n_views turntable
    cameras, mark vertices belonging to any front face."""
    verts = np.asarray(verts, np.float32)
    faces_j = jnp.asarray(np.asarray(faces), jnp.int32)
    center = verts.mean(0)
    vis = np.zeros(len(verts), bool)
    for k in range(n_views):
        ang = 2 * np.pi * k / n_views
        # camera on a circle in the xz plane looking at the center
        quat = np.asarray([np.cos((ang + np.pi) / 2), 0.0,
                           np.sin((ang + np.pi) / 2), 0.0], np.float32)
        cam = cam_mod.Camera(
            focal=jnp.asarray([image * 1.2, image * 1.2]),
            principal=jnp.asarray([image / 2.0, image / 2.0]),
            quat=jnp.asarray(quat),
            trans=jnp.asarray([0.0, 0.0, radius], jnp.float32),
            image_size=(image, image),
        )
        shifted = verts - center
        scr = screen_with_cam_z(cam, jnp.asarray(shifted))
        frag = rasterize_mesh(scr, faces_j, (image, image), tile=32, cap=512)
        fid = np.asarray(frag.pix_to_face[..., 0])
        hit_faces = np.unique(fid[fid >= 0])
        vis[np.asarray(faces)[hit_faces].reshape(-1)] = True
    return vis


def register_garment(template, mc_verts, mc_faces, curves_by_name: dict,
                     save_path: str | None = None,
                     nricp_cfg: NricpConfig | None = None,
                     refine_cfg: NricpConfig | None = None):
    """Register one open template to the closed MC surface
    (OptimGarmentNetwork.py:2445-2481): ① Laplacian-align the template's
    boundary loops to the optimized 3D curves, ② NRICP onto the visible
    MC vertices, ③ refine. Returns the registered open mesh (verts, faces).
    """
    t_verts = np.asarray(template.verts, np.float32)
    t_faces = np.asarray(template.faces, np.int64)

    # ① curve alignment (Laplacian editing with curve constraints)
    cids, targets = [], []
    for cname, loop in template.boundary_labels.items():
        if cname not in curves_by_name:
            continue
        tgt = np.asarray(curves_by_name[cname])
        lv = t_verts[loop]
        d = np.linalg.norm(lv[:, None] - tgt[None], axis=-1)
        cids.append(loop)
        targets.append(tgt[d.argmin(1)])
    if cids:
        t_verts = np.asarray(laplacian_deform(
            t_verts, t_faces, np.concatenate(cids), np.concatenate(targets),
            constrain_weight=1.0, smooth=True))

    # ② NRICP onto visible MC verts
    vis = visible_vertex_mask(mc_verts, mc_faces)
    tgt_normals = vertex_normals(np.asarray(mc_verts), np.asarray(mc_faces))
    cfg = nricp_cfg or NricpConfig(epochs=60, inner_iter=10, first_inner_iter=60,
                                   stiffness_weight=(50.0, 20.0, 5.0, 0.8),
                                   milestones=(15, 30, 45),
                                   laplacian_weight=(50.0,) * 4, lr=1e-3)
    static_ids = np.concatenate([l for l in template.boundary_labels.values()]) \
        if template.boundary_labels else None
    out_v = nricp_fit(t_verts, t_faces, np.asarray(mc_verts), tgt_normals,
                      target_mask=vis, static_ids=static_ids, cfg=cfg)

    # ③ refine pass
    rcfg = refine_cfg or NricpConfig(epochs=30, inner_iter=10, first_inner_iter=30,
                                     stiffness_weight=(5.0, 0.8, 0.3),
                                     milestones=(10, 20),
                                     laplacian_weight=(20.0,) * 3, lr=5e-4)
    out_v = nricp_fit(out_v, t_faces, np.asarray(mc_verts), tgt_normals,
                      target_mask=vis, static_ids=static_ids, cfg=rcfg)

    if save_path:
        save_obj(save_path, out_v, t_faces)
    return out_v.astype(np.float32), t_faces


class GarmentInference:
    """Drives per-frame extraction from a trained network."""

    def __init__(self, net):
        self.net = net
        self.registered = {}

    def ensure_registration(self, ratio, save_dir: str | None = None):
        """Register every garment once (cached as registry_<name>.obj)."""
        net = self.net
        if net.mesh is None:
            net.marching_cube_update(net._ratio_dict(ratio))
        curves = np.asarray(curves_forward(net.params["curves"], net.curve_statics))
        curves_by_name = {n: curves[i] for i, n in enumerate(net.curve_statics.fl_names)}
        for gi, gname in enumerate(net.statics.garment_names):
            cache = osp.join(save_dir, f"registry_{gname}.obj") if save_dir else None
            if cache and osp.isfile(cache):
                from ..utils.io import load_obj

                self.registered[gname] = load_obj(cache)
                continue
            tmpl = net.garment_templates[gi]
            nv = net.mesh.garment_n[gi]
            nf = net.mesh.garment_fn[gi]
            mc_v = np.asarray(net.mesh.garment_vs[gi])[:nv]
            mc_f = np.asarray(net.mesh.garment_fs[gi])[:nf]
            self.registered[gname] = register_garment(
                tmpl, mc_v, mc_f,
                {n: curves_by_name[n] for n in FL_EXTRACT[gname] if n in curves_by_name},
                save_path=cache)
        return self.registered

    def _deform(self, verts, gi, frame_ids, ratio, poses=None, trans=None, cond=None):
        net = self.net
        scene = net.scene_tree()
        r = net._ratio_dict(ratio)
        fids = jnp.asarray(np.asarray(frame_ids), jnp.int32)
        conds = split_deform_conds(scene["conds"]["deformer"][fids],
                                   net.statics.garment_size)
        d_cond = cond if cond is not None else conds[gi + 1]
        p = poses if poses is not None else scene["poses"][fids]
        t = trans if trans is not None else scene["trans"][fids]
        mp = {"translator": net.params["translator"], "skinner": net.params["skinner"]}
        deform = make_deform_fn(mp, net.statics, d_cond, p, t, r["deformerRatio"])
        N = fids.shape[0]
        return np.asarray(deform(jnp.broadcast_to(jnp.asarray(verts),
                                                  (N,) + verts.shape)))

    def infer_garment(self, frame_ids, ratio, out_dir: str):
        """Per-frame posed registered garments (+ body) → obj exports
        (infer_garment, OptimGarmentNetwork.py:2950-3213)."""
        net = self.net
        os.makedirs(osp.join(out_dir, "meshs"), exist_ok=True)
        os.makedirs(osp.join(out_dir, "smpl_meshs"), exist_ok=True)
        self.ensure_registration(ratio, out_dir)
        outputs = []
        for gi, gname in enumerate(net.statics.garment_names):
            rv, rf = self.registered[gname]
            posed = self._deform(jnp.asarray(rv), gi, frame_ids, ratio)
            for k, fid in enumerate(np.asarray(frame_ids)):
                save_obj(osp.join(out_dir, "meshs", f"{int(fid):04d}_{gname}.obj"),
                         posed[k], rf)
            outputs.append(posed)
        # posed body (LBS only)
        scene = net.scene_tree()
        fids = jnp.asarray(np.asarray(frame_ids), jnp.int32)
        body = skinner_apply(net.params["skinner"],
                             jnp.broadcast_to(net.tmp_body_vs,
                                              (len(fids),) + net.tmp_body_vs.shape),
                             scene["poses"][fids], scene["trans"][fids])
        for k, fid in enumerate(np.asarray(frame_ids)):
            save_obj(osp.join(out_dir, "smpl_meshs", f"{int(fid):04d}.obj"),
                     np.asarray(body[k]), np.asarray(net.tmp_body_fs))
        return outputs

    def infer_garment_fl(self, frame_ids, ratio, out_dir: str,
                         curve_radius: float = 0.002, num_joints: int = 6):
        """Per-frame tube meshes of the optimized feature curves
        (infer_garment_fl, OptimGarmentNetwork.py:2861-2949)."""
        net = self.net
        os.makedirs(out_dir, exist_ok=True)
        curves = np.asarray(curves_forward(net.params["curves"], net.curve_statics))
        nx = np.asarray(net.curve_statics.nx)[:, 0]
        for gi, gname in enumerate(net.statics.garment_names):
            for ci, cname in enumerate(net.curve_statics.fl_names):
                if cname not in FL_EXTRACT[gname]:
                    continue
                tv, tf = curve_to_tube_mesh(curves[ci], nx[ci], curve_radius, num_joints)
                posed = self._deform(jnp.asarray(tv), gi, frame_ids, ratio)
                for k, fid in enumerate(np.asarray(frame_ids)):
                    save_obj(osp.join(out_dir, f"{int(fid):04d}_{cname}.obj"),
                             posed[k], tf)

    def infer_garment_animation(self, poses, trans, ratio, out_dir: str):
        """Drive registered garments with a novel pose sequence using the
        averaged latent code and mean translation
        (infer_garment_animation, OptimGarmentNetwork.py:2729-2860)."""
        net = self.net
        os.makedirs(out_dir, exist_ok=True)
        self.ensure_registration(ratio, out_dir)
        scene = net.scene_tree()
        mean_cond = scene["conds"]["deformer"].mean(0, keepdims=True)
        conds = split_deform_conds(mean_cond, net.statics.garment_size)
        poses = jnp.asarray(np.asarray(poses, np.float32).reshape(-1, 24, 3))
        trans = jnp.asarray(np.asarray(trans, np.float32).reshape(-1, 3))
        T = poses.shape[0]
        for gi, gname in enumerate(net.statics.garment_names):
            rv, rf = self.registered[gname]
            for start in range(0, T, 8):
                fid_chunk = np.arange(start, min(start + 8, T))
                p = poses[fid_chunk]
                t = trans[fid_chunk]
                cond = jnp.broadcast_to(conds[gi + 1], (len(fid_chunk),
                                                        conds[gi + 1].shape[-1]))
                posed = self._deform(jnp.asarray(rv), gi, fid_chunk, ratio,
                                     poses=p, trans=t, cond=cond)
                for k, fid in enumerate(fid_chunk):
                    save_obj(osp.join(out_dir, f"{int(fid):04d}_{gname}.obj"),
                             posed[k], rf)


def one_euro_smooth(x: np.ndarray, min_cutoff=0.004, beta=0.7, d_cutoff=1.0,
                    freq=30.0):
    """OneEuro filter over the time axis (engineer/utils/smooth_poses.py)."""
    x = np.asarray(x, np.float64)
    out = np.empty_like(x)
    out[0] = x[0]
    dx_prev = np.zeros_like(x[0])
    x_prev = x[0]

    def alpha(cutoff):
        tau = 1.0 / (2 * np.pi * cutoff)
        te = 1.0 / freq
        return 1.0 / (1.0 + tau / te)

    for i in range(1, len(x)):
        dx = (x[i] - x_prev) * freq
        ad = alpha(d_cutoff)
        dx_hat = ad * dx + (1 - ad) * dx_prev
        cutoff = min_cutoff + beta * np.abs(dx_hat)
        a = alpha(cutoff)
        out[i] = a * x[i] + (1 - a) * x_prev
        x_prev = out[i]
        dx_prev = dx_hat
    return out.astype(np.float32)


def smooth_scene_poses(dataset, ranges=None):
    """smooth_trans parity (OptimGarmentNetwork.py:2567-2728): OneEuro
    smooth poses/translation, optionally only in given frame ranges."""
    p = dataset.params
    sp = one_euro_smooth(p.poses.reshape(len(p.poses), -1)).reshape(p.poses.shape)
    st = one_euro_smooth(p.trans)
    if ranges:
        for r in ranges:
            if len(r) == 2:
                a, b = r
                p.poses[a:b] = sp[a:b]
                p.trans[a:b] = st[a:b]
    else:
        p.poses, p.trans = sp, st
    return p
