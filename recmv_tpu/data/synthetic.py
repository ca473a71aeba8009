"""Synthetic scene generator — reference-layout scenes from the
procedural body, for tests/benchmarks without licensed assets.

Writes the exact on-disk layout the reference consumes (SURVEY §2
SceneDataset): imgs/, masks/, parsing_SCH_ATR/, featurelines/, normals/,
smpl_rec.npz, camera.npz, plus gt_meshes/ for Chamfer evaluation
(mirroring the reference's synthetic datasets with fitted GT garments,
``tools/fitting_garment_meshes.py``).

The scene: the synthetic humanoid wearing a "tube" garment (the body
surface offset outward over the torso band), self-rotating in front of a
fixed camera (PeopleSnapshot-style). Feature lines are the garment's top
(neck) and bottom (bottom_curve) boundary rings projected per frame.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

import jax.numpy as jnp

from ..models import camera as cam_mod
from ..models.skinner import SkinnerParams, initial_lbs_skinner, skinner_apply
from ..models.smpl import synthetic_body_model, synthetic_body_sdf
from ..ops.marching_cubes import marching_cubes_np
from ..ops.math3d import compute_fnorms
from ..ops.rasterizer import rasterize_mesh, screen_with_cam_z

GARMENT_OFFSET = 0.025
# gt band ALIGNED with the procedural template cuts (models/garment.py
# slices hip_y≈-0.33 → armpit_y≈0.23 for strapless tubes): the
# reference's template library matches its subjects' garments, so the
# synthetic gt must be producible by the template machinery — a
# mismatched band makes every quality number measure the template prior
# instead of optimizer convergence (r3 diagnosis: 7.8k registered verts
# above the old gt top at ~10 cm, and a narrow anatomical-neck template
# ring stretched 0.33 to reach a low wide gt ring; the y<neck_y slice's
# top boundary merged neck+armholes — non-planar — so the top band now
# stops below the armpits, where a real tube top ends).
TORSO_Y = (-0.32, 0.23)

# Bump whenever the gt geometry above changes: ensure_scene() regenerates
# stale cached scenes (and their result/ init caches) automatically.
SCENE_VERSION = 7

# Two-piece scene ("synthetic-two", TEMPLATE_GARMENT upper_tube+skirt):
# the skirt (small offset) tucks UNDER the flared upper (large offset) in
# the overlap band, so the skirt's waist curve is occluded by the upper —
# the exact inter-garment case zbuff_and / garment_zbuff exist for.
UPPER2_OFFSET = 0.045
UPPER2_Y = (-0.32, 0.23)
SKIRT_OFFSET = 0.025
# A-line flare for the two-piece scene's skirt: without it the "skirt"
# was a body-offset at shin height = TWO leg tubes, and the hem
# boundary-ring sphere trace diverges between the legs (measured r up to
# 8266 in the gt annotation — a garbage hem featureline that poisoned
# the bottom_curve fit). 0.2/m merges the legs into one hem ring
# (r 0.15-0.28) and makes the lower piece an actual skirt.
SKIRT_FLARE = 0.2
SKIRT_Y = (-0.68, -0.26)

# Loose A-line skirt scene ("synthetic-skirt" — BASELINE config #3's
# CUHKszCap-A loose skirt with fite diffused skinning): the hem flares
# away from the legs, where per-voxel body-KNN weights flip between the
# two legs mid-air and would tear a hem that crosses the midline. The
# scene poses its gt with a DIFFUSION-SMOOTHED weight field and ships
# that field as diffused_skinning_weights.npy — the same file the
# builder's fite path consumes (core/builder.py:99, reference
# lib/fite diffused-skinning assets).
LOOSE_SKIRT_OFFSET = 0.03
LOOSE_SKIRT_FLARE = 0.22      # extra offset per meter below the waist
LOOSE_SKIRT_Y = (-0.68, -0.26)


def _flare_offset(offset, y, band_top):
    """Effective offset at height y: scalar, or (base, flare) A-line."""
    if isinstance(offset, tuple):
        base, flare = offset
        return base + flare * np.maximum(band_top - y, 0.0)
    return offset


# scene type → [(garment piece name, offset, y band, ATR parsing label)];
# offset is a scalar or (base, flare-per-meter-below-band-top)
SCENE_GARMENTS = {
    "synthetic-tube": [("tube", GARMENT_OFFSET, TORSO_Y, 4)],
    "synthetic-two": [("upper_tube", UPPER2_OFFSET, UPPER2_Y, 4),
                      ("skirt", (SKIRT_OFFSET, SKIRT_FLARE), SKIRT_Y, 5)],
    "synthetic-skirt": [("skirt", (LOOSE_SKIRT_OFFSET, LOOSE_SKIRT_FLARE),
                         LOOSE_SKIRT_Y, 5)],
}
# scene type → [(curve name, ring height, ring offset)]
SCENE_CURVES = {
    "synthetic-tube": [("neck", TORSO_Y[1] - 0.01, GARMENT_OFFSET),
                       ("bottom_curve", TORSO_Y[0] + 0.01, GARMENT_OFFSET)],
    "synthetic-two": [("neck", UPPER2_Y[1] - 0.01, UPPER2_OFFSET),
                      ("upper_bottom", UPPER2_Y[0] + 0.01, UPPER2_OFFSET),
                      ("bottom_curve", SKIRT_Y[0] + 0.01,
                       _flare_offset((SKIRT_OFFSET, SKIRT_FLARE),
                                     SKIRT_Y[0] + 0.01, SKIRT_Y[1]))],
    "synthetic-skirt": [
        ("upper_bottom", LOOSE_SKIRT_Y[1] - 0.01,
         _flare_offset((LOOSE_SKIRT_OFFSET, LOOSE_SKIRT_FLARE),
                       LOOSE_SKIRT_Y[1] - 0.01, LOOSE_SKIRT_Y[1])),
        ("bottom_curve", LOOSE_SKIRT_Y[0] + 0.01,
         _flare_offset((LOOSE_SKIRT_OFFSET, LOOSE_SKIRT_FLARE),
                       LOOSE_SKIRT_Y[0] + 0.01, LOOSE_SKIRT_Y[1])),
    ],
}


def apose(init_pose_type: int = 0) -> np.ndarray:
    """The reference's template A-pose (utils/utils.py:68-99, type 0)."""
    pose = np.zeros((24, 3), np.float32)
    pose[1] = [0, 0, 10.0 / 180.0 * np.pi]
    pose[2] = [0, 0, -10.0 / 180.0 * np.pi]
    pose[16] = [0, 0, -45.0 / 180.0 * np.pi]
    pose[17] = [0, 0, 45.0 / 180.0 * np.pi]
    return pose


# lateral clamp ≈ the template slice's |x| < |shoulder_x|·1.15 cut —
# keeps the torso-band garments armless like their templates
X_CLAMP = 0.192


def garment_sdf(pts: np.ndarray, offset: float = GARMENT_OFFSET,
                band=TORSO_Y, x_clamp: float | None = X_CLAMP) -> np.ndarray:
    """Tube garment: body offset surface ∩ height slab (∩ |x| slab for
    torso garments — arms excluded, like the procedural templates);
    closed via CSG. ``offset`` may be (base, flare) for an A-line skirt
    whose offset grows below the band top (see _flare_offset)."""
    body = synthetic_body_sdf(pts) - _flare_offset(offset, pts[:, 1], band[1])
    slab = np.maximum(band[0] - pts[:, 1], pts[:, 1] - band[1])
    sd = np.maximum(body, slab)
    if x_clamp is not None and band[1] > -0.2:   # torso-band garments only
        sd = np.maximum(sd, np.abs(pts[:, 0]) - x_clamp)
    return sd


def garment_mesh(res: int = 97, offset: float = GARMENT_OFFSET, band=TORSO_Y):
    lin = np.linspace(-0.9, 0.9, res, dtype=np.float32)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([x, y, z], -1).reshape(-1, 3)
    vol = garment_sdf(pts, offset, band).reshape(res, res, res)
    step = lin[1] - lin[0]
    return marching_cubes_np(vol, 0.0, (-0.9, -0.9, -0.9), (step,) * 3)


def boundary_ring(y_level: float, n: int = 100,
                  offset: float = GARMENT_OFFSET):
    """Ring on the garment surface at a fixed height: radial sphere trace
    in the xz-plane from outside (x clipped to the garment's lateral
    clamp for torso rings)."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    dirs = np.stack([np.cos(ang), np.zeros(n), np.sin(ang)], 1).astype(np.float32)
    pts = dirs * 1.2
    pts[:, 1] = y_level
    for _ in range(48):
        sd = synthetic_body_sdf(pts) - offset
        pts = pts - dirs * sd[:, None] * 0.9
        pts[:, 1] = y_level
    if y_level > -0.2:
        pts[:, 0] = np.clip(pts[:, 0], -X_CLAMP, X_CLAMP)
    # drop near-duplicate consecutive points (the clip and concave trace
    # regions collapse neighbors; zero-length segments NaN the arc-length
    # resampling downstream)
    d = np.linalg.norm(np.diff(np.vstack([pts, pts[:1]]), axis=0), axis=1)
    keep = np.ones(len(pts), bool)
    keep[1:] = d[:-1] > 1e-3
    return pts[keep]


def _longest_circular_run(vis: np.ndarray) -> np.ndarray:
    """Indices of the longest contiguous True run on a circular array —
    the single arc a labelme annotator would trace. Returns them in ring
    order so the linestrip is a connected polyline."""
    n = len(vis)
    if vis.all():
        return np.arange(n)
    if not vis.any():
        return np.zeros(0, int)
    v2 = np.concatenate([vis, vis])
    best_len = best_start = cur = 0
    for i in range(2 * n):
        cur = cur + 1 if v2[i] else 0
        start = i - cur + 1
        if cur > best_len and start < n:
            best_len, best_start = cur, start
    return (best_start + np.arange(min(best_len, n))) % n


def make_camera_params(image_size: int):
    return {
        "fx": np.float32(image_size * 1.6),
        "fy": np.float32(image_size * 1.6),
        "cx": np.float32(image_size / 2.0),
        "cy": np.float32(image_size / 2.0),
        "quat": np.asarray([0.0, 0.0, 1.0, 0.0], np.float32),
        "T": np.asarray([0.0, 0.2, 2.6], np.float32),
    }


def generate_scene(out_dir: str, n_frames: int = 10, image_size: int = 256,
                   yaw_range: float = 2 * np.pi, skinner_res=(49, 81, 25),
                   raster_cap: int = 1024, garment_type: str = "synthetic-tube"):
    """Create a full scene (``garment_type``: 'synthetic-tube' single
    garment, 'synthetic-two' upper_tube+skirt with a shared occluded
    waist). Returns the scene directory."""
    os.makedirs(out_dir, exist_ok=True)
    for sub in ("imgs", "masks", "parsing_SCH_ATR", "featurelines", "normals", "gt_meshes"):
        os.makedirs(osp.join(out_dir, sub), exist_ok=True)

    body = synthetic_body_model()
    pose0 = apose()
    sk, body_verts, body_faces = initial_lbs_skinner(
        body, jnp.zeros(10), pose0, resolution=skinner_res
    )
    if garment_type in ("synthetic-skirt", "synthetic-two"):
        # fite-style diffused skinning: smooth the (24, D, H, W) weight
        # field spatially and renormalize, pose the gt with it, and ship
        # it so the builder's fite path (core/builder.py:99) trains with
        # the SAME weights the gt was posed with. The two-piece scene
        # needs it for the same reason the loose skirt does: its A-line
        # hem crosses the midline between the legs, where raw body-KNN
        # voxel weights flip legs and tear the hem.
        import scipy.ndimage as ndi

        w = np.asarray(sk.ws, np.float32)
        w = ndi.gaussian_filter(w, sigma=(0.0, 2.0, 2.0, 2.0), mode="nearest")
        w /= np.clip(w.sum(0, keepdims=True), 1e-8, None)
        np.save(osp.join(out_dir, "diffused_skinning_weights.npy"), w)
        sk = SkinnerParams(ws=jnp.asarray(w), Js=sk.Js,
                           init_pose_inv=sk.init_pose_inv,
                           extra_trans=sk.extra_trans,
                           bbox_center=sk.bbox_center,
                           bbox_extend=sk.bbox_extend,
                           b_min=sk.b_min, b_max=sk.b_max)
    pieces = SCENE_GARMENTS[garment_type]
    gmeshes = [garment_mesh(offset=off, band=band)
               for _, off, band, _ in pieces]
    rings = [(name, boundary_ring(ylv, offset=off))
             for name, ylv, off in SCENE_CURVES[garment_type]]

    campar = make_camera_params(image_size)
    cam = cam_mod.make_camera(
        {
            "focal_length": np.asarray([campar["fx"], campar["fy"]]),
            "princeple_points": np.asarray([campar["cx"], campar["cy"]]),
            "cam2world_coord_quat": campar["quat"],
            "world2cam_coord_trans": campar["T"],
        },
        (image_size, image_size),
    )

    poses = []
    trans = []
    H = W = image_size
    n_body = len(np.asarray(body_verts))

    all_v = np.asarray(body_verts)
    all_f = np.asarray(body_faces)
    face_lo = [len(all_f)]          # face-id range per garment piece
    for gv, gf in gmeshes:
        all_f = np.concatenate([all_f, gf + len(all_v)], 0)
        all_v = np.concatenate([all_v, gv], 0)
        face_lo.append(len(all_f))
    gt_faces = np.concatenate(
        [gf + sum(len(g[0]) for g in gmeshes[:i])
         for i, (_, gf) in enumerate(gmeshes)], 0)

    for fid in range(n_frames):
        pose = pose0.copy()
        pose[0, 1] = yaw_range * fid / max(n_frames, 1)
        poses.append(pose)
        trans.append(np.zeros(3, np.float32))

        posed = np.asarray(
            skinner_apply(sk, jnp.asarray(all_v)[None], jnp.asarray(pose)[None],
                          jnp.zeros((1, 3)))
        )[0]
        pg = posed[n_body:]

        scr = np.asarray(screen_with_cam_z(cam, jnp.asarray(posed)))
        frag = rasterize_mesh(jnp.asarray(scr), jnp.asarray(all_f, jnp.int32),
                              (H, W), tile=32, cap=raster_cap)
        pix2face = np.asarray(frag.pix_to_face[..., 0])
        mask = pix2face >= 0
        gar_hit = pix2face >= face_lo[0]

        # normals: camera-space face normals of the hit faces
        fn = np.asarray(compute_fnorms(jnp.asarray(posed), jnp.asarray(all_f, jnp.int32)))
        R = np.asarray(cam.R)
        fn_cam = fn @ R
        nimg = np.zeros((H, W, 3), np.float32)
        nimg[mask] = fn_cam[pix2face[mask]]
        # camera looks along +z with flipped x/y axes: flip so normals
        # face the viewer (PIFuHD-style encoding)
        nimg[..., 2] *= -1

        img = np.zeros((H, W, 3), np.float32)
        shade = np.clip(nimg[..., 2], 0, 1)[..., None]
        img[mask & ~gar_hit] = (np.asarray([0.75, 0.6, 0.5]) * shade[mask & ~gar_hit])
        tints = ([0.25, 0.35, 0.8], [0.7, 0.3, 0.35], [0.3, 0.7, 0.4])
        parsing = np.zeros((H, W), np.uint8)
        parsing[mask] = 9   # skin → a label outside ATR garment groups
        for i, (_, _, _, atr_label) in enumerate(pieces):
            sel = (pix2face >= face_lo[i]) & (pix2face < face_lo[i + 1])
            img[sel] = np.asarray(tints[i % len(tints)]) * shade[sel]
            parsing[sel] = atr_label

        cv2.imwrite(osp.join(out_dir, f"imgs/{fid}.png"),
                    (img[:, :, ::-1] * 255).astype(np.uint8))
        cv2.imwrite(osp.join(out_dir, f"masks/{fid}.png"),
                    (mask * 255).astype(np.uint8))
        cv2.imwrite(osp.join(out_dir, f"normals/{fid}.png"),
                    ((nimg[:, :, ::-1] + 1) / 2 * 255).astype(np.uint8))
        np.save(osp.join(out_dir, f"parsing_SCH_ATR/{fid}.npy"), parsing)
        # pre-fill the knn-propagated cache (identical here: parsing covers mask)
        np.save(osp.join(out_dir, f"parsing_SCH_ATR/mask_parsing_{fid}.npy"), parsing)

        # feature lines: project posed rings — VISIBLE ARC ONLY.  The
        # reference's featurelines are labelme annotations of the arc a
        # human can SEE in the frame (dataset/dataset.py:301-339 reads
        # the linestrip verbatim; engineer/core/fl_optimizer.py:72-110
        # and project_2d_loss treat gt points as fully trustworthy).
        # Annotating the occluded back half biases every consumer
        # outward: the gt→pred chamfer term drags the visible curve arc
        # to span the FULL ring's projected extent, inflating the fitted
        # curve radius (r5: bottom_curve settled at r=0.174 vs gt 0.148).
        zbuf0 = np.asarray(frag.zbuf[..., 0])
        shapes = []
        for name, ring in rings:
            posed_ring = np.asarray(
                skinner_apply(sk, jnp.asarray(ring)[None], jnp.asarray(pose)[None],
                              jnp.zeros((1, 3)))
            )[0]
            scr_ring = np.asarray(
                screen_with_cam_z(cam, jnp.asarray(posed_ring)[None]))[0]
            xi = np.clip(np.round(scr_ring[:, 0]).astype(int), 0, W - 1)
            yi = np.clip(np.round(scr_ring[:, 1]).astype(int), 0, H - 1)
            zb = zbuf0[yi, xi]
            # on-surface ring points rasterize to their own garment faces
            # (depth equal); occluded ones sit behind the front surface
            # 0.03 tolerance: at grazing view angles (the camera sits at
            # ring height, so rings project nearly edge-on) the pixel's
            # z-buffer comes from a steeply-sloped side wall and a 0.01
            # test truncates the arc's silhouette ends that a human
            # annotator would trace; 0.03 keeps them while still
            # excluding the occluded back (body depth ≥0.08, garment
            # chord ≥0.24 behind the front surface).
            vis = (zb < 0) | (scr_ring[:, 2] <= zb + 0.03)
            idx = _longest_circular_run(vis)
            # Annotator frame selection: REC-MV's featurelines are sparse
            # labelme keyframes — the annotator skips frames where the
            # curve is badly occluded (an arm across the neckline), and
            # the init fit runs on fl_supervised frames only
            # (dataset.py:97-107). Emitting a badly-truncated arc poisons
            # the scale fit: the visibility gate can't know the arc was
            # arm-truncated, so its extra "visible" points drag the fit
            # inward (measured: neck fitted to r 0.11 vs gt 0.14 with two
            # 21-point arcs in the batch; clean frames fit to <5 px).
            if len(idx) < max(3, int(0.3 * len(vis))):
                continue   # occluded this frame → loader masks it out
            shapes.append({"label": name, "shape_type": "linestrip",
                           "points": scr_ring[idx, :2].tolist()})
        with open(osp.join(out_dir, f"featurelines/{fid}.json"), "w") as f:
            json.dump({"shapes": shapes}, f)

        np.savez(osp.join(out_dir, f"gt_meshes/{fid}.npz"), verts=pg,
                 faces=gt_faces,
                 piece_names=np.asarray([p[0] for p in pieces]),
                 piece_sizes=np.asarray([len(g[0]) for g in gmeshes]))

    np.savez(
        osp.join(out_dir, "smpl_rec.npz"),
        poses=np.stack(poses), trans=np.stack(trans),
        shape=np.zeros(10, np.float32), gender="synthetic",
    )
    np.savez(osp.join(out_dir, "camera.npz"), **make_camera_params(image_size))
    with open(osp.join(out_dir, "scene_meta.json"), "w") as f:
        json.dump({"version": SCENE_VERSION, "garment_type": garment_type,
                   "n_frames": n_frames, "image_size": image_size}, f)
    return out_dir


def ensure_scene(out_dir: str, **kwargs) -> str:
    """Cached-scene gate for the persistent bench scenes: regenerate when
    absent or when the scene was written by an older generator (its gt
    geometry changed), and clear the scene's ``result/`` caches (init
    checkpoints, skinner caches) which were computed from the stale gt."""
    meta_path = osp.join(out_dir, "scene_meta.json")
    if osp.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("version") == SCENE_VERSION:
            return out_dir
    import shutil

    if osp.isdir(out_dir):
        shutil.rmtree(out_dir)
    return generate_scene(out_dir, **kwargs)
