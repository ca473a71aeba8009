"""Visual debug dumps — per-scene optimization lives on these.

Parity with the reference's ``save_debug``
(``OptimGarmentNetwork.py:1971-2158``: projected feature curves drawn
over the gt frame + predicted garment silhouettes vs gt masks + current
meshes) and ``visualize_curve_mesh`` (``:3320-3484``: turntable renders
of the canonical MC garment meshes with the optimized curves overlaid).
Everything is host-side numpy around the jitted rasterizer — these run
at remesh cadence, never in the hot loop.
"""

from __future__ import annotations

import os
import os.path as osp

import jax.numpy as jnp
import numpy as np

from ..models import camera as cam_mod
from ..models.curves import curves_forward
from ..models.garment_model import make_deform_fn, split_deform_conds
from ..ops.math3d import compute_fnorms
from ..ops.rasterizer import rasterize_mesh, screen_with_cam_z
from .io import save_obj

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

CURVE_COLORS = [(255, 64, 64), (64, 255, 64), (64, 64, 255), (255, 255, 64),
                (255, 64, 255), (64, 255, 255)]

# per-joint debug colors for LBS weight visualization
# (weights2colors parity, engineer/utils/skinning_weights.py: joints of
# one kinematic group share a hue; 'pink' → white)
_JOINT_GROUP = ["pink", "blue", "green", "red", "pink", "pink", "pink",
                "green", "blue", "red", "pink", "pink", "pink", "blue",
                "green", "red", "cyan", "darkgreen", "pink", "pink",
                "blue", "green", "pink", "pink"]
_GROUP_RGB = {"pink": (1.0, 1.0, 1.0), "blue": (0.12, 0.47, 0.71),
              "green": (0.70, 0.87, 0.54), "red": (0.89, 0.10, 0.11),
              "cyan": (0.70, 0.87, 0.54), "darkgreen": (0.12, 0.47, 0.71)}


def lbs_weights_to_colors(weights: np.ndarray) -> np.ndarray:
    """(V, 24) skinning weights → (V, 3) debug vertex colors
    (weights2colors, engineer/utils/skinning_weights.py:5-50)."""
    palette = np.asarray([_GROUP_RGB[g] for g in _JOINT_GROUP])  # (24, 3)
    return np.asarray(weights) @ palette


def _splat(img, pts_xy, color, radius=1):
    H, W = img.shape[:2]
    for x, y in np.asarray(pts_xy):
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < W and 0 <= yi < H:
            img[max(yi - radius, 0): yi + radius + 1,
                max(xi - radius, 0): xi + radius + 1] = color
    return img


def save_debug(net, batch, frame_ids, ratio, out_dir, step: int = 0,
               visualizer=None):
    """Write per-frame debug overlays: gt image with the projected
    (posed) feature curves splatted per curve color, and the deformed
    garment mesh silhouette vs the gt garment mask."""
    os.makedirs(out_dir, exist_ok=True)
    r = net._ratio_dict(ratio)
    scene = net.scene_tree()
    # frame_ids are local dataset indices; scene arrays are global
    fids = jnp.asarray(np.asarray(frame_ids) + net.dataset.start_idx, jnp.int32)
    cam = net._camera(scene)
    N = int(fids.shape[0])
    W, H = net.statics.image_size
    imgs = np.asarray(batch["img"])  # (N, H, W, 3) in [-1, 1] or [0,1]
    if imgs.min() < -0.01:
        imgs = (imgs + 1.0) / 2.0

    curves = curves_forward(net.params["curves"], net.curve_statics)
    conds = split_deform_conds(scene["conds"]["deformer"][fids],
                               net.statics.garment_size)
    poses = scene["poses"][fids]
    trans = scene["trans"][fids]

    overlays = (imgs * 255).astype(np.uint8).copy()
    from ..config.constants import FL_EXTRACT

    name_to_idx = {n: i for i, n in enumerate(net.curve_statics.fl_names)}
    for gi, gname in enumerate(net.statics.garment_names):
        mp = {"translator": net.params["translator"],
              "skinner": net.params["skinner"]}
        deform = make_deform_fn(mp, net.statics, conds[gi + 1], poses, trans,
                                r["deformerRatio"])
        for k, cname in enumerate(FL_EXTRACT[gname]):
            if cname not in name_to_idx:
                continue
            cv = curves[name_to_idx[cname]]
            S = cv.shape[0]
            def_fl = deform(jnp.broadcast_to(cv, (N, S, 3)))
            scr = np.asarray(cam_mod.transform_points_screen(cam, def_fl))
            for b in range(N):
                _splat(overlays[b], scr[b, :, :2],
                       CURVE_COLORS[k % len(CURVE_COLORS)])

        # silhouette of the deformed MC garment mesh vs gt mask
        if net.mesh is not None:
            def_vs = net._deform_garment_verts(
                {"translator": net.params["translator"]}, scene,
                [net.mesh.garment_vs[gi]], fids, ratio, gi0=gi)[0]
            fs = net.mesh.garment_fs[gi]
            for b in range(N):
                scr = screen_with_cam_z(cam, def_vs[b])
                frag = rasterize_mesh(scr, fs, (H, W), tile=net.cfg.raster_tile,
                                      cap=net.cfg.raster_cap_mesh)
                sil = np.asarray(frag.pix_to_face[..., 0] >= 0)
                gt_key = ("upper_bottom" if net.statics.garment_size == 1
                          and "upper_bottom" in batch else
                          ("bottom" if gname in ("long_pants", "short_pants",
                                                 "skirt") else "upper"))
                gt = np.asarray(batch.get(gt_key, np.zeros((N, H, W))))[b] > 0
                vis = np.zeros((H, W, 3), np.uint8)
                vis[..., 1] = sil * 160                      # pred = green
                vis[..., 2] = gt * 160                       # gt = red (BGR)
                fid = int(np.asarray(frame_ids)[b])
                path = osp.join(out_dir, f"{step:06d}_{fid:04d}_{gname}_mask.png")
                if cv2 is not None:
                    cv2.imwrite(path, vis)

    for b in range(N):
        fid = int(np.asarray(frame_ids)[b])
        path = osp.join(out_dir, f"{step:06d}_{fid:04d}_curves.png")
        if cv2 is not None:
            cv2.imwrite(path, overlays[b][:, :, ::-1])
        if visualizer is not None:
            visualizer.add_image(f"debug/curves_{fid}", overlays[b], step)
    return out_dir


def turntable_curve_mesh(net, ratio, out_dir, n_views: int = 8,
                         image: int = 256, step: int = 0, visualizer=None,
                         save_meshes: bool = True):
    """Turntable renders of the canonical garment MC meshes with curve
    points overlaid (visualize_curve_mesh, OptimGarmentNetwork.py:3320).
    Writes one image strip per garment + optional obj dumps."""
    os.makedirs(out_dir, exist_ok=True)
    if net.mesh is None:
        net.marching_cube_update(net._ratio_dict(ratio))
    curves = np.asarray(curves_forward(net.params["curves"], net.curve_statics))

    strips = []
    for gi, gname in enumerate(net.statics.garment_names):
        nv = net.mesh.garment_n[gi]
        nf = net.mesh.garment_fn[gi]
        verts = np.asarray(net.mesh.garment_vs[gi])[:nv]
        faces = np.asarray(net.mesh.garment_fs[gi])[:nf]
        if save_meshes:
            save_obj(osp.join(out_dir, f"{step:06d}_{gname}.obj"), verts, faces)
        center = verts.mean(0)
        views = []
        for k in range(n_views):
            ang = 2 * np.pi * k / n_views
            quat = np.asarray([np.cos((ang + np.pi) / 2), 0.0,
                               np.sin((ang + np.pi) / 2), 0.0], np.float32)
            cam = cam_mod.Camera(
                focal=jnp.asarray([image * 1.2, image * 1.2]),
                principal=jnp.asarray([image / 2.0, image / 2.0]),
                quat=jnp.asarray(quat),
                trans=jnp.asarray([0.0, 0.0, 2.5], jnp.float32),
                image_size=(image, image),
            )
            sh = jnp.asarray(verts - center)
            scr = screen_with_cam_z(cam, sh)
            frag = rasterize_mesh(scr, jnp.asarray(faces, jnp.int32),
                                  (image, image), tile=32, cap=256)
            fid_img = np.asarray(frag.pix_to_face[..., 0])
            fn = np.asarray(compute_fnorms(sh, jnp.asarray(faces, jnp.int32)))
            shade = np.zeros((image, image, 3), np.uint8)
            hit = fid_img >= 0
            lam = np.abs((fn @ np.asarray(cam.R)[:, 2]))[fid_img[hit]]
            shade[hit] = (np.asarray([[180, 180, 200]]) *
                          (0.25 + 0.75 * lam[:, None])).astype(np.uint8)
            for ci, cname in enumerate(net.curve_statics.fl_names):
                pix = np.asarray(cam_mod.transform_points_screen(
                    cam, jnp.asarray(curves[ci] - center)))
                _splat(shade, pix[:, :2], CURVE_COLORS[ci % len(CURVE_COLORS)])
            views.append(shade)
        strip = np.concatenate(views, axis=1)
        strips.append(strip)
        if cv2 is not None:
            cv2.imwrite(osp.join(out_dir, f"{step:06d}_{gname}_turntable.png"),
                        strip[:, :, ::-1])
        if visualizer is not None:
            visualizer.add_image(f"debug/turntable_{gname}", strip, step)
    return strips
