"""Feature-curve visibility gating — all four reference modes.

Parity with ``fl_visible_by_{sdf_normal, surface_normal, body_zbuff,
garment_zbuff}`` (reference ``engineer/networks/OptimGarmentNetwork.py:
1253-1515``) and their dispatch in ``deform_feature_line`` /
``compute_fl_proj_loss`` (``:1577-1586, 1630-1650``):

- ``zbuff`` (reference shipped default): the curve is gated by the posed
  SMPL **body** z-buffer probed at the LBS-posed canonical-SMPL curve
  points; visible where ``z − zbuf < ZBUF_THRESHOLD[curve]``.
- ``garment_zbuff``: gate by the **deformed garment MC mesh** z-buffer
  probed at the fully-deformed curve points — what inter-garment
  occlusion needs (a hemline behind the top).
- ``zbuff_and``: logical AND of both (the reference computes both checks
  in ``fl_visible_by_body_zbuff`` and carries the combination at
  ``:1646`` — commented in the shipped code, required for two-garment
  subjects).
- ``surface``: warp outward curve normals to posed space with J⁻ᵀ of the
  deformation field; visible where the posed normal faces the camera
  (z < 0, ``:1633-1636``).
- ``sdf``: same warp applied to the garment SDF gradient at the curve
  points (``fl_visible_by_sdf_normal``).

Visibility is a gate, not a gradient path — every function here is
wrapped in stop_gradient by the callers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_2d
from ..ops.rasterizer import rasterize_mesh, screen_with_cam_z

VISIBLE_METHODS = ("zbuff", "garment_zbuff", "zbuff_and", "surface", "sdf")


def mesh_zbuf_image(cam, posed, faces, image_size, tile: int = 32,
                    cap: int = 512, downscale: int = 1):
    """Per-frame z-buffer of a posed mesh with background filled by the
    frame's max vertex depth (fl_visible_by_body_zbuff :1444-1460).

    posed (N, V, 3) world coords; returns (N, H/downscale, W/downscale)
    of CAMERA-SPACE depth (the rasterizer's zbuf convention — probe
    points must be compared in the same space, via ``screen_with_cam_z``).

    ``downscale`` renders the buffer at reduced resolution: the z-buffer
    is only ever probed bilinearly through ``sample_zbuf`` (whose uv
    normalization is resolution-independent) as a gate with ~5 cm
    ZBUF_THRESHOLD tolerance, so a 1/4-res buffer is indistinguishable
    downstream while cutting raster cost ~16x.

    The camera is stop-gradded along with the geometry: the z-buffer is
    a visibility gate, not a gradient path (the reference computes it
    under no_grad), and the forward-only Pallas mesh kernel must not be
    differentiated."""
    cam = jax.tree_util.tree_map(jax.lax.stop_gradient, cam)
    W, H = image_size
    Hs, Ws = -(-H // downscale), -(-W // downscale)
    inv = jnp.asarray([1.0 / downscale, 1.0 / downscale, 1.0], jnp.float32)

    def per_frame(pv):
        scr = screen_with_cam_z(cam, pv) * inv
        frag = rasterize_mesh(scr, faces, (Hs, Ws), tile=tile, cap=cap)
        zb = frag.zbuf[..., 0]
        return jnp.where(zb <= 0, jnp.max(scr[..., 2]), zb)

    zb = jax.lax.map(per_frame, jax.lax.stop_gradient(posed))
    return jax.lax.stop_gradient(zb)


def sample_zbuf(zbuf, screen_pts, image_size):
    """Bilinear z-buffer lookup at screen points (align_corners=True uv,
    matching the reference's grid_sample call). zbuf (N, H, W);
    screen_pts (N, P, 2+); returns (N, P)."""
    W, H = image_size
    u = 2.0 * screen_pts[..., 0] / W - 1.0
    v = 2.0 * screen_pts[..., 1] / H - 1.0
    uv = jnp.stack([u, v], -1)

    def per_frame(zb, uvf):
        return grid_sample_2d(zb[None], uvf, align_corners=True)[:, 0]

    return jax.vmap(per_frame)(zbuf, uv)


def zbuf_visible(z, surf_z, threshold: float):
    """(N, P) depth-test gate: point in front of (or within threshold of)
    the rasterized surface."""
    return (z - surf_z) < threshold


def normal_visible(posed_normals):
    """Normal-facing gate: the camera looks along +z, a point is visible
    when its posed normal points back at the camera
    (compute_fl_proj_loss :1633-1636)."""
    return posed_normals[..., 2] < 0.0


def outward_curve_normals(curve_pts):
    """Radial outward directions of a closed curve around its center —
    the reference's tube-mesh vertex normals flipped to align with
    center rays (fl_visible_by_surface_normal :1334-1341)."""
    center = curve_pts.mean(axis=0, keepdims=True)
    d = curve_pts - center
    return d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9, None)


def warp_normals_to_posed(deform_flat_fn, pts_flat, normals_flat):
    """n_posed = normalize(J⁻ᵀ n) with singular fallback — the
    Fast3x3Minv path of both normal modes (:1282-1289)."""
    from ..models.deformer import deformed_normals_from_grads, deformer_jacobian

    jac = deformer_jacobian(deform_flat_fn, pts_flat)
    n, _ = deformed_normals_from_grads(jac, normals_flat)
    return n


def combine_visibility(method: str, body_vis=None, garment_vis=None,
                       normal_vis=None):
    """Dispatch per compute_fl_proj_loss (:1630-1650)."""
    if method == "zbuff":
        return body_vis
    if method == "garment_zbuff":
        if garment_vis is None:
            raise ValueError(
                "fl_visible_method='garment_zbuff' requires deformed garment "
                "meshes (pass garment_vs_t/garment_fs_t to fl_branch_loss); "
                "none were provided — use 'zbuff' before the first MC mesh "
                "exists")
        return garment_vis
    if method == "zbuff_and":
        if garment_vis is None:
            # no garment mesh yet (pre-first-remesh): the body gate alone
            # is the reference behavior until MC meshes exist
            return body_vis
        return body_vis & garment_vis
    if method in ("surface", "sdf"):
        return normal_vis
    raise ValueError(f"unknown fl_visible_method {method!r}; "
                     f"expected one of {VISIBLE_METHODS}")
