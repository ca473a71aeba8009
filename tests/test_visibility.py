"""Curve visibility modes (core/visibility.py): body z-buffer vs garment
z-buffer gating — the two-overlapping-garment case where body-zbuf gives
the WRONG gate and garment-zbuf the right one (VERDICT r1 task 6), plus
the posed-normal modes."""

import numpy as np

import jax.numpy as jnp

from recmv_tpu.core.visibility import (
    combine_visibility,
    mesh_zbuf_image,
    normal_visible,
    outward_curve_normals,
    sample_zbuf,
    zbuf_visible,
)
from recmv_tpu.models import camera as cam_mod


IMG = 64


def make_cam():
    return cam_mod.make_camera(
        {
            "focal_length": np.asarray([IMG * 1.5, IMG * 1.5]),
            "princeple_points": np.asarray([IMG / 2.0, IMG / 2.0]),
            "cam2world_coord_quat": np.asarray([0.0, 0.0, 1.0, 0.0]),
            "world2cam_coord_trans": np.asarray([0.0, 0.0, 2.0]),
        },
        (IMG, IMG),
    )


def quad(z, half=0.5):
    """Two-triangle quad at depth z facing the camera."""
    v = np.asarray(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float32,
    )
    f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    return jnp.asarray(v), jnp.asarray(f, jnp.int32)


class TestZbufModes:
    def test_garment_zbuf_catches_occlusion_body_misses(self):
        """A hemline point sits BEHIND the front garment panel but in
        front of the body: body-zbuf calls it visible (wrong), the
        garment-zbuf calls it hidden (right), zbuff_and combines."""
        from recmv_tpu.ops.rasterizer import screen_with_cam_z

        cam = make_cam()  # camera at world (0,0,2) looking along −z:
        # larger world z = nearer the camera (smaller camera depth)
        g_v, g_f = quad(z=1.2)    # front garment panel (near)
        b_v, b_f = quad(z=0.3)    # body surface far behind
        pt = jnp.asarray([[[0.0, 0.0, 0.6]]])  # curve point between them

        g_zbuf = mesh_zbuf_image(cam, g_v[None], g_f, (IMG, IMG), tile=16, cap=16)
        b_zbuf = mesh_zbuf_image(cam, b_v[None], b_f, (IMG, IMG), tile=16, cap=16)
        scr = screen_with_cam_z(cam, pt)
        z = scr[..., 2]   # camera-space depth, the zbuf's space
        thr = 0.05

        body_vis = zbuf_visible(z, sample_zbuf(b_zbuf, scr, (IMG, IMG)), thr)
        garment_vis = zbuf_visible(z, sample_zbuf(g_zbuf, scr, (IMG, IMG)), thr)

        assert bool(body_vis[0, 0]) is True       # body says visible (wrong)
        assert bool(garment_vis[0, 0]) is False   # garment occludes (right)
        assert bool(combine_visibility("zbuff", body_vis, garment_vis)[0, 0])
        assert not bool(combine_visibility("garment_zbuff", body_vis,
                                           garment_vis)[0, 0])
        assert not bool(combine_visibility("zbuff_and", body_vis,
                                           garment_vis)[0, 0])

    def test_point_in_front_visible_in_all_zbuf_modes(self):
        from recmv_tpu.ops.rasterizer import screen_with_cam_z

        cam = make_cam()
        g_v, g_f = quad(z=0.8)
        b_v, b_f = quad(z=0.3)
        pt = jnp.asarray([[[0.0, 0.0, 1.5]]])  # in front of everything
        g_zbuf = mesh_zbuf_image(cam, g_v[None], g_f, (IMG, IMG), tile=16, cap=16)
        b_zbuf = mesh_zbuf_image(cam, b_v[None], b_f, (IMG, IMG), tile=16, cap=16)
        scr = screen_with_cam_z(cam, pt)
        z = scr[..., 2]
        body_vis = zbuf_visible(z, sample_zbuf(b_zbuf, scr, (IMG, IMG)), 0.05)
        garment_vis = zbuf_visible(z, sample_zbuf(g_zbuf, scr, (IMG, IMG)), 0.05)
        for mode in ("zbuff", "garment_zbuff", "zbuff_and"):
            assert bool(combine_visibility(mode, body_vis, garment_vis)[0, 0])

    def test_downscaled_zbuf_same_gate(self):
        """A 1/4-res z-buffer (the production default, cfg.zbuf_downscale)
        must produce the same visibility gates as full-res: the buffer is
        probed bilinearly with normalized uv, and the depth values are
        unchanged — only the sampling density drops."""
        from recmv_tpu.ops.rasterizer import screen_with_cam_z

        cam = make_cam()
        g_v, g_f = quad(z=1.2, half=0.2)
        pts = jnp.asarray([[[0.0, 0.0, 0.6],       # behind garment panel
                            [0.0, 0.0, 1.5],       # in front of everything
                            [0.25, 0.25, 1.19]]])  # off-panel → bg fill
        scr = screen_with_cam_z(cam, pts)
        z = scr[..., 2]
        thr = 0.05
        for ds in (1, 4):
            g_zbuf = mesh_zbuf_image(cam, g_v[None], g_f, (IMG, IMG),
                                     tile=16, cap=64, downscale=ds)
            vis = zbuf_visible(z, sample_zbuf(g_zbuf, scr, (IMG, IMG)), thr)
            assert [bool(v) for v in np.asarray(vis[0])] == [False, True, True], ds

    def test_zbuf_background_fill(self):
        """Points projecting outside the mesh get the max-depth fill, so
        they count as visible (reference fills background with z_max)."""
        cam = make_cam()
        b_v, b_f = quad(z=1.0, half=0.1)  # small quad
        zb = mesh_zbuf_image(cam, b_v[None], b_f, (IMG, IMG), tile=16, cap=16)
        # corner pixel far from the quad: fill = 1.0 (max depth)
        assert abs(float(zb[0, 0, 0]) - 1.0) < 1e-5


class TestNormalModes:
    def test_outward_normals_radial(self):
        ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
        cv = jnp.asarray(np.stack([np.cos(ang), np.zeros(16), np.sin(ang)], 1))
        n = outward_curve_normals(cv)
        np.testing.assert_allclose(np.asarray(n), np.asarray(cv), atol=1e-5)

    def test_normal_visible_faces_camera(self):
        n = jnp.asarray([[[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]]])
        vis = normal_visible(n)
        assert bool(vis[0, 0]) and not bool(vis[0, 1])

    def test_identity_warp_keeps_normals(self):
        from recmv_tpu.core.visibility import warp_normals_to_posed

        pts = jnp.asarray(np.random.RandomState(0).randn(8, 3), jnp.float32)
        nrm = jnp.asarray([[0.0, 0.0, -1.0]] * 8)
        out = warp_normals_to_posed(lambda p: p + 1.0, pts, nrm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(nrm), atol=1e-5)
