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


def relabel_boundaries_after_remesh(new_verts, new_faces, old_verts,
                                    old_boundary_labels: dict):
    """Re-derive labeled boundary loops on a remeshed garment by KNN
    label transfer from the old labeled boundary vertices — the exact
    mechanism of the reference's post-remesh color rebuild
    (remesh_garment_mesh, garment_structure.py:440-460 knn_points of new
    boundary verts against old boundary verts)."""
    loops = boundary_loops(np.asarray(new_faces))
    if not old_boundary_labels:
        return {}
    names = list(old_boundary_labels.keys())
    old_pts = [np.asarray(old_verts)[np.asarray(old_boundary_labels[n])]
               for n in names]
    labels = {}
    for loop in loops:
        lv = np.asarray(new_verts)[loop]
        # majority vote of per-vertex nearest labeled old boundary
        dmin = np.stack([
            np.min(np.linalg.norm(lv[:, None] - p[None], axis=-1), axis=1)
            for p in old_pts])                                 # (C, L)
        votes = np.bincount(dmin.argmin(0), minlength=len(names))
        win = names[int(votes.argmax())]
        if win not in labels or len(loop) > len(labels[win]):
            labels[win] = loop
    return labels


def remesh_registered(verts, faces, boundary_labels: dict,
                      target_frac: float = 0.02, subdivide: bool = True):
    """Isotropic remesh + midpoint subdivision between the NRICP passes
    (remesh_garment_mesh, OptimGarmentNetwork.py:2445-2481 →
    pymeshlab isotropic_explicit_remeshing + surface_subdivision_loop,
    garment_structure.py:441-460), using the native C++ remesher
    (boundary vertices pinned). Returns (verts, faces, relabeled loops)."""
    from ..geometry.mesh_utils import subdivide_faces
    from ..native import isotropic_remesh

    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64)
    diag = float(np.linalg.norm(v.max(0) - v.min(0)))
    try:
        nv, nf = isotropic_remesh(v, f, target_len=target_frac * diag, iters=3)
    except (OSError, ValueError):      # native lib unavailable/overflow
        nv, nf = v, f
    if subdivide:
        nv, nf = subdivide_faces(nv, nf, np.arange(len(nf)))[:2]
    labels = relabel_boundaries_after_remesh(nv, nf, v, boundary_labels)
    return nv.astype(np.float32), np.asarray(nf, np.int64), labels


def register_garment(template, mc_verts, mc_faces, curves_by_name: dict,
                     save_path: str | None = None,
                     nricp_cfg: NricpConfig | None = None,
                     refine_cfg: NricpConfig | None = None,
                     remesh: bool = True):
    """Register one open template to the closed MC surface
    (OptimGarmentNetwork.py:2445-2481): ① Laplacian-align the template's
    boundary loops to the optimized 3D curves with optimal-assignment
    correspondences, ② NRICP coarse onto the visible MC vertices,
    ③ isotropic remesh (+ subdivision), ④ NRICP refine.
    Returns the registered open mesh (verts, faces).
    """
    from ..geometry.matching import match_template_boundaries

    t_verts = np.asarray(template.verts, np.float32)
    t_faces = np.asarray(template.faces, np.int64)
    labels = dict(template.boundary_labels)

    # ① curve alignment (Laplacian editing; best_match correspondences)
    cids, targets = match_template_boundaries(t_verts, labels, curves_by_name)
    if len(cids):
        t_verts = np.asarray(laplacian_deform(
            t_verts, t_faces, cids, targets, constrain_weight=1.0, smooth=True))

    # ② NRICP coarse onto visible MC verts (reference fl_fit_registry:
    # epoch 200, stiffness 50→0.1 at 8 milestones, laplacian 250,
    # normal-cos gate 0.3)
    vis = visible_vertex_mask(mc_verts, mc_faces)
    tgt_normals = vertex_normals(np.asarray(mc_verts), np.asarray(mc_faces))
    cfg = nricp_cfg or NricpConfig(
        epochs=200, inner_iter=10, first_inner_iter=60,
        stiffness_weight=(50.0, 20.0, 5.0, 2.0, 0.8, 0.5, 0.35, 0.2, 0.1),
        milestones=(50, 80, 100, 110, 120, 130, 140, 150),
        laplacian_weight=(250.0,) * 9, threshold=0.3, lr=1e-3)

    def static_of(lbl):
        return np.concatenate([np.asarray(l) for l in lbl.values()]) if lbl else None

    out_v = nricp_fit(t_verts, t_faces, np.asarray(mc_verts), tgt_normals,
                      target_mask=vis, static_ids=static_of(labels), cfg=cfg)
    out_f = t_faces

    # ③ isotropic remesh + subdivision between the passes
    if remesh:
        out_v, out_f, labels = remesh_registered(out_v, out_f, labels)

    # ④ refine pass (fl_refine_registry: epoch 100, stiffness 2→0.1,
    # milestones 10/20/30/40/80, gate 0.5)
    rcfg = refine_cfg or NricpConfig(
        epochs=100, inner_iter=10, first_inner_iter=30,
        stiffness_weight=(2.0, 0.8, 0.5, 0.35, 0.2, 0.1),
        milestones=(10, 20, 30, 40, 80),
        laplacian_weight=(250.0,) * 6, threshold=0.5, lr=5e-4)
    out_v = nricp_fit(out_v, out_f, np.asarray(mc_verts), tgt_normals,
                      target_mask=vis, static_ids=static_of(labels), cfg=rcfg)

    if save_path:
        save_obj(save_path, out_v, out_f)
    return out_v.astype(np.float32), out_f, labels


class GarmentInference:
    """Drives per-frame extraction from a trained network."""

    def __init__(self, net):
        self.net = net
        self.registered = {}
        self.filter_list = {}   # garment → per-frame stable frame index

    def ensure_registration(self, ratio, save_dir: str | None = None,
                            sew_waist: bool = True):
        """Register every garment once (cached as registry_<name>.obj).
        Two-garment subjects get their waists sewn afterwards
        (Laplacian_Deform_upper_and_domn_Optimzier parity)."""
        net = self.net
        if net.mesh is None:
            net.marching_cube_update(net._ratio_dict(ratio))
        if not getattr(net, "garment_templates", None):
            # rebuild templates from the A-pose body (the reference's
            # registration calls init_template + garment_by_init_smpl +
            # dense_boundary fresh each time, OptimGarmentNetwork.py:2388)
            from ..models.garment import garment_templates_from_body

            tmpls = garment_templates_from_body(
                net.statics.garment_names, np.asarray(net.tmp_body_vs),
                np.asarray(net.tmp_body_fs),
                np.asarray(net.params["skinner"].Js), None)
            net.garment_templates = [t.dense_boundary(2) for t in tmpls]
        curves = np.asarray(curves_forward(net.params["curves"], net.curve_statics))
        curves_by_name = {n: curves[i] for i, n in enumerate(net.curve_statics.fl_names)}
        reg_labels = {}
        fresh = False
        for gi, gname in enumerate(net.statics.garment_names):
            if gname in self.registered:
                continue
            cache = osp.join(save_dir, f"registry_{gname}.obj") if save_dir else None
            if cache and osp.isfile(cache):
                from ..utils.io import load_obj

                self.registered[gname] = load_obj(cache)
                continue
            fresh = True
            tmpl = net.garment_templates[gi]
            nv = net.mesh.garment_n[gi]
            nf = net.mesh.garment_fn[gi]
            mc_v = np.asarray(net.mesh.garment_vs[gi])[:nv]
            mc_f = np.asarray(net.mesh.garment_fs[gi])[:nf]
            rv, rf, labels = register_garment(
                tmpl, mc_v, mc_f,
                {n: curves_by_name[n] for n in FL_EXTRACT[gname] if n in curves_by_name},
                save_path=cache)
            self.registered[gname] = (rv, rf)
            reg_labels[gname] = labels

        # waist sewing for two-garment subjects: deform the bottom so its
        # 'upper_bottom' loop lands on the upper's waist loop
        names = list(net.statics.garment_names)
        if (sew_waist and fresh and len(names) == 2
                and all(n in reg_labels for n in names)
                and all("upper_bottom" in reg_labels[n] for n in names)):
            from ..geometry.laplacian import sew_upper_bottom

            up_name, bot_name = names[0], names[1]
            uv, _ = self.registered[up_name]
            bv, bf = self.registered[bot_name]
            blab = reg_labels[bot_name]
            static = np.concatenate([np.asarray(l) for c, l in blab.items()
                                     if c != "upper_bottom"]) \
                if len(blab) > 1 else None
            new_bv = sew_upper_bottom(
                uv, reg_labels[up_name]["upper_bottom"], bv, bf,
                blab["upper_bottom"], static_ids=static)
            self.registered[bot_name] = (new_bv.astype(np.float32), bf)
            if save_dir:
                save_obj(osp.join(save_dir, f"registry_{bot_name}.obj"),
                         new_bv, bf)
        return self.registered

    def offset_filter(self, ratio, chunk: int = 8, sigma: float = 3.0,
                      outlier_count: int = 500):
        """Per-frame offset-field outlier filter (offset_filter,
        OptimGarmentNetwork.py:2519-2560): evaluate each registered
        garment's non-rigid offsets over all frames, compute the per-
        vertex mean/variance across time, and flag frames where more
        than ``outlier_count`` vertices deviate beyond ``sigma``; flagged
        frames reuse the last stable frame's deformer latent. Returns and
        stores {garment: [frame index to query per frame]}."""
        from ..models.translator import translator_apply

        net = self.net
        r = net._ratio_dict(ratio)
        scene = net.scene_tree()
        F = net.dataset.frame_num
        self.filter_list = {}
        for gi, gname in enumerate(net.statics.garment_names):
            rv, _ = self.registered[gname]
            pts = jnp.asarray(rv)
            V = pts.shape[0]
            offs = []
            for start in range(0, F, chunk):
                fids = jnp.arange(start, min(start + chunk, F))
                conds = split_deform_conds(scene["conds"]["deformer"][fids],
                                           net.statics.garment_size)
                cond = conds[gi + 1]                       # (n, C)
                n = cond.shape[0]
                pb = jnp.broadcast_to(pts, (n, V, 3))
                cb = jnp.broadcast_to(cond[:, None, :], (n, V, cond.shape[-1]))
                _, off = translator_apply(net.params["translator"],
                                          net.statics.translator, pb, cb,
                                          r["deformerRatio"])
                offs.append(np.asarray(off))
            offs = np.concatenate(offs, 0)                 # (F, V, 3)
            mean = offs.mean(0)
            var = offs.var(0, ddof=1) + 1e-12
            query, pre = [0], 0
            var_mean = var.mean(0, keepdims=True)
            for i in range(1, F):
                var_matrix = np.sqrt((offs[i] - mean) ** 2 / var_mean)
                n_out = (var_matrix > sigma).sum() / 3.0
                if n_out > outlier_count:
                    query.append(pre)
                else:
                    pre = i
                    query.append(i)
            self.filter_list[gname] = query
        return self.filter_list

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
            cond = None
            if gname in self.filter_list:
                # substitute outlier frames' deformer latents with the
                # last stable frame's (offset_filter consumption,
                # OptimGarmentNetwork.py:2777)
                cond_ids = np.asarray(self.filter_list[gname])[np.asarray(frame_ids)]
                scene_f = net.scene_tree()
                conds_f = split_deform_conds(
                    scene_f["conds"]["deformer"][jnp.asarray(cond_ids)],
                    net.statics.garment_size)
                cond = conds_f[gi + 1]
            posed = self._deform(jnp.asarray(rv), gi, frame_ids, ratio, cond=cond)
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
