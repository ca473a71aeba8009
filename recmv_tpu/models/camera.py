"""Rectified perspective camera — TPU-native.

Parity with reference ``model/CameraMine.py:26-303``
(``RectifiedPerspectiveCameras``): a pytorch3d-convention perspective
camera whose screen mapping is rectified to the rasterizer's
align_corners=False pixel grid. Conventions:

- world→camera: x_cam = x_world @ R + T (row-vector convention; R is the
  cam2world rotation stored from a quaternion, T the world2cam trans).
- NDC: ndc_x = fx_n·x/z + px_n with fx_n = fx/(W/2),
  px_n = 1 − 1/W − px/(W/2) (CameraMine.py:282-287); ndc_z = 1/z.
- screen: sx = (W−1)/2 − W·ndc_x/2 (the (W−1)/2 offset is the rectify fix,
  CameraMine.py:139-141).
- view_rays: pixel → world unit ray through the camera center,
  r = normalize([(px−u)/fx, (py−v)/fy, 1]) @ Rᵀ (CameraMine.py:146-167;
  note the x,y sign flips of the pytorch3d screen axes).

The camera is a flat pytree so its parameters can be optimized jointly
with the scene (focal/principal-point/translation learnable per config).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math3d import quat2mat


@dataclass
class Camera:
    focal: jnp.ndarray       # (2,) fx, fy in pixels
    principal: jnp.ndarray   # (2,) px, py in pixels
    quat: jnp.ndarray        # (4,) cam2world rotation quaternion (w,x,y,z)
    trans: jnp.ndarray       # (3,) world2cam translation
    image_size: tuple        # static (W, H)

    @property
    def R(self):
        return quat2mat(self.quat[None])[0]


jax.tree_util.register_pytree_node(
    Camera,
    lambda c: ((c.focal, c.principal, c.quat, c.trans), c.image_size),
    lambda size, leaves: Camera(*leaves, image_size=size),
)


def make_camera(camera_params: dict, image_size) -> Camera:
    """From the dataset's camera.npz parameter dict (focal_length,
    princeple_points [sic — reference spelling], cam2world_coord_quat,
    world2cam_coord_trans)."""
    return Camera(
        focal=jnp.asarray(camera_params["focal_length"]).reshape(2),
        principal=jnp.asarray(camera_params["princeple_points"]).reshape(2),
        quat=jnp.asarray(camera_params["cam2world_coord_quat"]).reshape(4),
        trans=jnp.asarray(camera_params["world2cam_coord_trans"]).reshape(3),
        image_size=(int(image_size[0]), int(image_size[1])),
    )


def world_to_cam(cam: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) world → camera coordinates."""
    return jnp.matmul(pts, cam.R, precision=jax.lax.Precision.HIGHEST) + cam.trans


def transform_points_ndc(cam: Camera, pts: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """World → rectified NDC (x, y, 1/z)."""
    W, H = cam.image_size
    pc = world_to_cam(cam, pts)
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < eps, jnp.where(z >= 0, eps, -eps), z)
    fxn = cam.focal[0] / (W / 2.0)
    fyn = cam.focal[1] / (H / 2.0)
    pxn = 1.0 - 1.0 / W - cam.principal[0] / (W / 2.0)
    pyn = 1.0 - 1.0 / H - cam.principal[1] / (H / 2.0)
    x = fxn * pc[..., 0] / zs + pxn
    y = fyn * pc[..., 1] / zs + pyn
    return jnp.stack([x, y, 1.0 / zs], axis=-1)


def transform_points_screen(cam: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """World → screen pixels (x, y, ndc_z), rectified to the rasterizer
    grid: sx = (W−1)/2 − W·ndc_x/2."""
    W, H = cam.image_size
    ndc = transform_points_ndc(cam, pts)
    sx = (W - 1.0) / 2.0 - W * ndc[..., 0] / 2.0
    sy = (H - 1.0) / 2.0 - H * ndc[..., 1] / 2.0
    return jnp.stack([sx, sy, ndc[..., 2]], axis=-1)


def view_rays(cam: Camera, pix: jnp.ndarray) -> jnp.ndarray:
    """pix (..., 3) pixel coords with homogeneous 1 in last slot → world
    unit ray directions."""
    rx = -pix[..., 0] / cam.focal[0] + pix[..., 2] * cam.principal[0] / cam.focal[0]
    ry = -pix[..., 1] / cam.focal[1] + pix[..., 2] * cam.principal[1] / cam.focal[1]
    rays = jnp.stack([rx, ry, pix[..., 2]], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    return jnp.matmul(rays, cam.R.T, precision=jax.lax.Precision.HIGHEST)


def project(cam: Camera, pts: jnp.ndarray) -> jnp.ndarray:
    """World → pixel coords (x, y): u = px − fx·X/Z (pytorch3d axis flip)."""
    pc = world_to_cam(cam, pts)
    x = cam.principal[0] - pc[..., 0] * cam.focal[0] / pc[..., 2]
    y = cam.principal[1] - pc[..., 1] * cam.focal[1] / pc[..., 2]
    return jnp.stack([x, y], axis=-1)


def cam_pos(cam: Camera) -> jnp.ndarray:
    """Camera center in world coordinates: −R @ T."""
    return -(cam.R @ cam.trans)


def ang_threshold(cam: Camera, pixoffset: float = 0.4) -> float:
    """Sub-pixel angle bound (degrees) used as the surface-point solver's
    convergence criterion (CameraMine.py:176-205): the smallest angle a
    ``pixoffset`` shift subtends at any image border."""
    W, H = cam.image_size
    fx = float(cam.focal[0])
    fy = float(cam.focal[1])
    cx = float(cam.principal[0])
    cy = float(cam.principal[1])

    def ang(r1, r2):
        r1 = np.asarray(r1)
        r2 = np.asarray(r2)
        s = np.linalg.norm(np.cross(r1, r2)) / (np.linalg.norm(r1) * np.linalg.norm(r2))
        return float(np.arcsin(np.clip(s, -1, 1)) / np.pi * 180.0)

    thred = ang([(W - cx) / fx, 0, 1], [(W + pixoffset - cx) / fx, 0, 1])
    thred = min(thred, ang([-cx / fx, 0, 1], [(pixoffset - cx) / fx, 0, 1]))
    thred = min(thred, ang([0, (H - cy) / fy, 1], [0, (H + pixoffset - cy) / fy, 1]))
    thred = min(thred, ang([0, -cy / fy, 1], [0, (pixoffset - cy) / fy, 1]))
    return thred
