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

from ..config.constants import FL_EXTRACT, RENDER_COLORS, SMOOTH_TRANS
from ..geometry.laplacian import laplacian_deform
from ..geometry.mesh_utils import boundary_loops, largest_component, vertex_normals
from ..geometry.nricp import NricpConfig, nricp_fit
from ..models import camera as cam_mod
from ..models.curves import curve_to_tube_mesh, curves_forward
from ..models.garment_model import make_deform_fn, split_deform_conds
from ..models.skinner import skinner_apply
from ..ops.rasterizer import (
    find_surface_points,
    phong_render,
    rasterize_mesh,
    screen_with_cam_z,
)
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
    if not old_boundary_labels or not loops:
        return {}
    names = list(old_boundary_labels.keys())
    old_pts = [np.asarray(old_verts)[np.asarray(old_boundary_labels[n])]
               for n in names]
    # one-to-one optimal assignment label ↔ loop (a majority vote can
    # assign two loops the same label and silently DROP the other —
    # losing the waist label is what used to skip two-garment sewing)
    cost = np.full((len(names), len(loops)), np.inf)
    for i, p in enumerate(old_pts):
        for j, loop in enumerate(loops):
            lv = np.asarray(new_verts)[loop]
            cost[i, j] = np.mean(
                np.min(np.linalg.norm(lv[:, None] - p[None], axis=-1), axis=1))
    from scipy.optimize import linear_sum_assignment

    ri, ci = linear_sum_assignment(cost)
    return {names[i]: loops[j] for i, j in zip(ri, ci)}


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
        laplacian_weight=(250.0,) * 9, threshold=0.3, lr=1e-3,
        max_dist=0.04)

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
        laplacian_weight=(250.0,) * 6, threshold=0.5, lr=5e-4,
        max_dist=0.04)
    out_v = nricp_fit(out_v, out_f, np.asarray(mc_verts), tgt_normals,
                      target_mask=vis, static_ids=static_of(labels), cfg=rcfg)

    if save_path:
        save_obj(save_path, out_v, out_f)
    return out_v.astype(np.float32), out_f, labels


def _imwrite(path, rgb_u8):
    """RGB uint8 → disk (cv2 wants BGR)."""
    import cv2

    cv2.imwrite(path, rgb_u8[:, :, ::-1])


class GarmentInference:
    """Drives per-frame extraction from a trained network."""

    def __init__(self, net):
        self.net = net
        self.registered = {}
        self.filter_list = {}   # garment → per-frame stable frame index
        self._fn_cache = {}     # jitted inference pipelines (per chunk)

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
        for gi, gname in enumerate(net.statics.garment_names):
            cache = osp.join(save_dir, f"registry_{gname}.obj") if save_dir else None
            lcache = (osp.join(save_dir, f"registry_{gname}_labels.npz")
                      if save_dir else None)
            if gname in self.registered:
                if gname not in reg_labels and lcache and osp.isfile(lcache):
                    with np.load(lcache) as z:
                        reg_labels[gname] = {k: z[k] for k in z.files}
                continue
            if cache and osp.isfile(cache):
                from ..utils.io import load_obj

                self.registered[gname] = load_obj(cache)
                # boundary labels are persisted alongside the cached obj so
                # waist sewing can still run (or be verified) on cache hits
                # instead of being silently skipped forever (r2 advice)
                if lcache and osp.isfile(lcache):
                    with np.load(lcache) as z:
                        reg_labels[gname] = {k: z[k] for k in z.files}
                continue
            tmpl = net.garment_templates[gi]
            nv = net.mesh.garment_n[gi]
            nf = net.mesh.garment_fn[gi]
            mc_v = np.asarray(net.mesh.garment_vs[gi])[:nv]
            mc_f = np.asarray(net.mesh.garment_fs[gi])[:nf]
            # registration target = the main garment surface only; MC of
            # a weakly-constrained far-field SDF can carry floating junk
            mc_v, mc_f = largest_component(mc_v, mc_f)
            rv, rf, labels = register_garment(
                tmpl, mc_v, mc_f,
                {n: curves_by_name[n] for n in FL_EXTRACT[gname] if n in curves_by_name},
                save_path=cache)
            self.registered[gname] = (rv, rf)
            reg_labels[gname] = labels
            if lcache:
                np.savez(lcache, **{k: np.asarray(v, np.int64)
                                    for k, v in labels.items()})
            if save_dir:
                # a fresh registration invalidates any previous sewing
                marker = osp.join(save_dir, "registry_sewn.marker")
                if osp.isfile(marker):
                    os.remove(marker)

        # waist sewing for two-garment subjects: deform the bottom so its
        # 'upper_bottom' loop lands on the upper's waist loop
        names = list(net.statics.garment_names)
        marker = (osp.join(save_dir, "registry_sewn.marker")
                  if save_dir else None)
        already_sewn = marker is not None and osp.isfile(marker)
        if (sew_waist and not already_sewn and len(names) == 2
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
                with open(marker, "w") as fh:
                    fh.write("sewn\n")
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
                fids = jnp.arange(start, min(start + chunk, F)) + net.dataset.start_idx
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
        # frame_ids are local dataset indices; scene arrays are global
        fids = jnp.asarray(np.asarray(frame_ids) + net.dataset.start_idx, jnp.int32)
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

    # -- inference-time rendering ------------------------------------------

    def _garment_color(self, gi):
        cmap = RENDER_COLORS.get(
            getattr(self.net.dataset, "garment_type", ""), None)
        if cmap and gi < len(cmap) and len(cmap[gi]) == 3:
            return np.asarray(cmap[gi], np.float32)
        fallback = [[255, 99, 128], [193, 210, 240], [170, 170, 255]]
        return np.asarray(fallback[gi % len(fallback)], np.float32)

    def _phong_u8(self, cam, verts, faces, color_rgb, light_loc=None):
        """(V, 3) world verts + flat color → (H, W, 3) u8 + hit mask."""
        net = self.net
        W, H = net.statics.image_size
        cp = cam_mod.cam_pos(cam)
        light = cp if light_loc is None else jnp.asarray(light_loc, jnp.float32)
        vc = jnp.broadcast_to(jnp.asarray(color_rgb, jnp.float32) / 255.0,
                              verts.shape)
        rgb, hit = phong_render(cam, jnp.asarray(verts),
                                jnp.asarray(np.asarray(faces), jnp.int32), vc,
                                (H, W), light, cp, tile=net.cfg.raster_tile,
                                cap=net.cfg.raster_cap_mesh)
        img = np.asarray(jnp.clip(rgb * 255.0, 0, 255)).astype(np.uint8)
        return img, np.asarray(hit)

    def _color_chunk_fn(self, chunk):
        """Jitted per-pixel color pipeline at a fixed chunk size:
        OptimizeGarmentSurfaceSinlge ×30 refinement + SDF normal +
        cardinal rays + RenderNet (compute_netRender_color parity,
        OptimGarmentNetwork.py:3186-3207)."""
        key = ("color_chunk", chunk)
        if key in self._fn_cache:
            return self._fn_cache[key]
        net = self.net

        from ..models.deformer import cardinal_rays_from_jac, deformer_jacobian
        from ..models.sdf import sdf_apply, sdf_gradient, sdf_value
        from ..models.render_net import render_net_apply
        from .surface_ps import optimize_surface_points

        def fn(gsdf, translator, render, skinner, cond, poses, trans,
               origin, rays, seeds, valid, r, ang):
            mp = {"translator": translator, "skinner": skinner}
            b_inds = jnp.zeros((chunk,), jnp.int32)
            deform = make_deform_fn(mp, net.statics, cond, poses, trans,
                                    r["deformerRatio"], batch_inds=b_inds)
            sdf_fn = lambda p: sdf_value(gsdf, net.statics.garment_sdf, p,
                                         r["sdfRatio"])
            pts, conv = optimize_surface_points(
                sdf_fn, deform, origin, rays, seeds, valid,
                dthreshold=1e-4, athreshold_deg=ang, w1=3.05, w2=1.0,
                times=30)
            _, feat = sdf_apply(gsdf, net.statics.garment_sdf, pts,
                                r["sdfRatio"])
            nx = sdf_gradient(gsdf, net.statics.garment_sdf, pts, r["sdfRatio"])
            nx = nx / jnp.clip(jnp.linalg.norm(nx, axis=-1, keepdims=True),
                               1e-9, None)
            jac = deformer_jacobian(deform, pts)
            crays, _ = cardinal_rays_from_jac(jac, rays)
            cols = render_net_apply(render, net.statics.render, pts, nx,
                                    crays, feat, ratio=r["renderRatio"])
            return cols, conv

        self._fn_cache[key] = jax.jit(fn)
        return self._fn_cache[key]

    def _colors_image(self, gi, cano_v, faces, posed_v, fid, ratio,
                      chunk: int = 8192):
        """Per-pixel RenderNet color image of one posed garment frame
        (white background), via surface refinement at every hit pixel."""
        net = self.net
        scene = net.scene_tree()
        r = net._ratio_dict(ratio)
        cam = net._camera(scene)
        W, H = net.statics.image_size
        if net.ang_thred is None:
            net.ang_thred = cam_mod.ang_threshold(cam)

        scr = screen_with_cam_z(cam, jnp.asarray(posed_v))
        frag = rasterize_mesh(scr, jnp.asarray(np.asarray(faces), jnp.int32),
                              (H, W), tile=net.cfg.raster_tile,
                              cap=net.cfg.raster_cap_mesh)
        hit, seeds, _ = find_surface_points(
            frag, jnp.asarray(cano_v), jnp.asarray(np.asarray(faces), jnp.int32))
        hit_np = np.asarray(hit)
        rows, cols_px = np.nonzero(hit_np)
        M = len(rows)
        canvas = np.full((H, W, 3), 255, np.uint8)
        if M == 0:
            return canvas
        pix = jnp.asarray(
            np.stack([cols_px, rows, np.ones_like(cols_px)], -1), jnp.float32)
        rays = cam_mod.view_rays(cam, pix)
        seeds = jnp.asarray(np.asarray(seeds)[rows, cols_px])
        origin = cam_mod.cam_pos(cam)

        fids = jnp.asarray([fid + net.dataset.start_idx], jnp.int32)
        conds = split_deform_conds(scene["conds"]["deformer"][fids],
                                   net.statics.garment_size)
        fn = self._color_chunk_fn(chunk)
        out = np.empty((M, 3), np.float32)
        for s in range(0, M, chunk):
            e = min(s + chunk, M)
            pad = chunk - (e - s)
            sl = lambda a: jnp.pad(a[s:e], ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            valid = jnp.arange(chunk) < (e - s)
            cols_rgb, _ = fn(net.params["garment_sdfs"][gi],
                             net.params["translator"], net.params["render"],
                             net.params["skinner"], conds[gi + 1],
                             scene["poses"][fids], scene["trans"][fids],
                             origin, sl(rays), sl(seeds), valid, r,
                             float(net.ang_thred))
            out[s:e] = np.asarray(cols_rgb)[: e - s]
        rgb = np.clip((out / 2.0 + 0.5) * 255.0, 0, 255).astype(np.uint8)
        canvas[rows, cols_px] = rgb
        return canvas

    def infer_garment(self, frame_ids, ratio, out_dir: str,
                      images: bool = True, colors: bool = True,
                      color_chunk: int = 8192):
        """Per-frame posed registered garments (+ body) → the reference's
        five export families (infer_garment, OptimGarmentNetwork.py:
        2950-3213 + infer_fl.py:227-280):

        - ``meshs/NNNN_<garment>.obj`` posed garment meshes (+ ``.png``
          per-garment Phong renders when ``images``),
        - ``render/NNNN.png`` merged Phong render of all garments,
        - ``def1meshs/NNNN_<garment>.png`` offset-only (translator, no
          LBS) mesh rendered from the reference's fixed frontal camera at
          the mean translation with a point light,
        - ``colors/NNNN_<garment>.png`` per-pixel RenderNet colors after
          30-step surface refinement at every hit pixel (when ``colors``),
        - ``smpl_meshs/NNNN.obj`` posed SMPL bodies.

        Returns (outputs, errors) where errors['maskE'] is the per-frame
        mask IoU error of the merged render vs the dataset mask."""
        from ..models.translator import translator_apply

        net = self.net
        for sub in ("meshs", "smpl_meshs") + (
                ("render", "def1meshs") if images else ()) + (
                ("colors",) if colors else ()):
            os.makedirs(osp.join(out_dir, sub), exist_ok=True)
        self.ensure_registration(ratio, out_dir)
        scene = net.scene_tree()
        r = net._ratio_dict(ratio)
        cam = net._camera(scene)
        fids_np = np.asarray(frame_ids)
        N = len(fids_np)

        # reference def1 render camera: fixed frontal R=diag(-1,1,-1)
        # (quat [0,0,1,0]) at the mean translation, point light at
        # (0, 1, T_z) (OptimGarmentNetwork.py:3178-3183)
        mean_t = np.asarray(scene["trans"]).mean(0)
        def1_cam = cam_mod.Camera(
            focal=cam.focal, principal=cam.principal,
            quat=jnp.asarray([0.0, 0.0, 1.0, 0.0]),
            trans=jnp.asarray(mean_t, jnp.float32),
            image_size=cam.image_size)
        def1_light = [0.0, 1.0, float(mean_t[2])]

        outputs = []
        posed_all = []
        for gi, gname in enumerate(net.statics.garment_names):
            rv, rf = self.registered[gname]
            cond = None
            if gname in self.filter_list:
                # substitute outlier frames' deformer latents with the
                # last stable frame's (offset_filter consumption,
                # OptimGarmentNetwork.py:2777)
                cond_ids = (np.asarray(self.filter_list[gname])[fids_np]
                            + net.dataset.start_idx)
                conds_f = split_deform_conds(
                    scene["conds"]["deformer"][jnp.asarray(cond_ids)],
                    net.statics.garment_size)
                cond = conds_f[gi + 1]
            posed = self._deform(jnp.asarray(rv), gi, frame_ids, ratio, cond=cond)
            posed_all.append(posed)
            color = self._garment_color(gi)

            # def1: translator offsets only, no skeletal transform
            if images:
                conds = split_deform_conds(
                    scene["conds"]["deformer"][jnp.asarray(
                        fids_np + net.dataset.start_idx)],
                    net.statics.garment_size)
                pts = jnp.asarray(rv)
                pb = jnp.broadcast_to(pts, (N,) + pts.shape)
                cb = jnp.broadcast_to(conds[gi + 1][:, None, :],
                                      (N, pts.shape[0],
                                       conds[gi + 1].shape[-1]))
                def1_vs, _ = translator_apply(
                    net.params["translator"], net.statics.translator, pb, cb,
                    r["deformerRatio"])
                def1_vs = np.asarray(def1_vs)

            for k, fid in enumerate(fids_np):
                stem = f"{int(fid):04d}_{gname}"
                save_obj(osp.join(out_dir, "meshs", stem + ".obj"),
                         posed[k], rf)
                if images:
                    img, _ = self._phong_u8(cam, posed[k], rf, color)
                    _imwrite(osp.join(out_dir, "meshs", stem + ".png"), img)
                    d1, _ = self._phong_u8(def1_cam, def1_vs[k], rf, color,
                                           light_loc=def1_light)
                    _imwrite(osp.join(out_dir, "def1meshs", stem + ".png"), d1)
                if colors:
                    cimg = self._colors_image(gi, rv, rf, posed[k], int(fid),
                                              ratio, chunk=color_chunk)
                    _imwrite(osp.join(out_dir, "colors", stem + ".png"), cimg)
            outputs.append(posed)

        # merged render of all garments + mask IoU error
        errors = {"maskE": np.full(N, -1.0)}
        if images:
            offs = np.cumsum([0] + [self.registered[g][0].shape[0]
                                    for g in net.statics.garment_names])
            all_f = np.concatenate(
                [np.asarray(self.registered[g][1]) + offs[i]
                 for i, g in enumerate(net.statics.garment_names)])
            all_c = np.concatenate(
                [np.broadcast_to(self._garment_color(i),
                                 (self.registered[g][0].shape[0], 3))
                 for i, g in enumerate(net.statics.garment_names)])
            W, H = net.statics.image_size
            cp = cam_mod.cam_pos(cam)
            for k, fid in enumerate(fids_np):
                mv = np.concatenate([np.asarray(p[k]) for p in posed_all])
                rgb, hit = phong_render(
                    cam, jnp.asarray(mv), jnp.asarray(all_f, jnp.int32),
                    jnp.asarray(all_c / 255.0), (H, W), cp, cp,
                    tile=net.cfg.raster_tile, cap=net.cfg.raster_cap_mesh)
                _imwrite(osp.join(out_dir, "render", f"{int(fid):04d}.png"),
                         np.asarray(jnp.clip(rgb * 255, 0, 255)).astype(np.uint8))
                try:
                    gt = self.net.dataset[int(fid)][1]["mask"] > 0
                    hm = np.asarray(hit)
                    inter = (hm & gt).sum()
                    union = (hm | gt).sum()
                    errors["maskE"][k] = 1.0 - inter / max(union, 1)
                except Exception:
                    pass

        # posed body (LBS only)
        fids = jnp.asarray(fids_np + net.dataset.start_idx, jnp.int32)
        body = skinner_apply(net.params["skinner"],
                             jnp.broadcast_to(net.tmp_body_vs,
                                              (len(fids),) + net.tmp_body_vs.shape),
                             scene["poses"][fids], scene["trans"][fids])
        for k, fid in enumerate(fids_np):
            save_obj(osp.join(out_dir, "smpl_meshs", f"{int(fid):04d}.obj"),
                     np.asarray(body[k]), np.asarray(net.tmp_body_fs))
        return outputs, errors

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
