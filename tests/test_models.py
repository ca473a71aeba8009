"""Tests for the neural modules and body model: geometric SDF init,
translator near-identity init, SMPL kinematics, skinner round trips,
camera projective geometry."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from recmv_tpu.models import camera as cam_mod
from recmv_tpu.models.deformer import (
    cardinal_rays_from_jac,
    deform_points,
    deformed_normals_from_grads,
    deformer_jacobian,
)
from recmv_tpu.models.render_net import init_render_net, render_net_apply
from recmv_tpu.models.sdf import init_sdf_net, sdf_apply, sdf_gradient, sdf_value
from recmv_tpu.models.skinner import (
    SkinnerParams,
    bbox_size,
    initial_lbs_skinner,
    skinner_apply,
    posed_skeleton,
    smooth_weights,
)
from recmv_tpu.models.smpl import (
    forward_kinematics,
    smpl_forward,
    smpl_skeleton,
    synthetic_body_model,
)
from recmv_tpu.models.translator import init_translator, translator_apply


def apose(angle_legs=10.0, angle_arms=45.0):
    pose = np.zeros((24, 3), np.float32)
    pose[1] = [0, 0, angle_legs / 180 * np.pi]
    pose[2] = [0, 0, -angle_legs / 180 * np.pi]
    pose[16] = [0, 0, -angle_arms / 180 * np.pi]
    pose[17] = [0, 0, angle_arms / 180 * np.pi]
    return pose


class TestSdfNet:
    def test_geometric_init_is_sphere(self):
        # Geometric init approximates sdf(x) = |x| - bias. At width 512 the
        # approximation is loose (the torch reference shows the same ~0.1
        # offsets), so assert the invariants: radially increasing, roughly
        # spherical (low std on shells), zero-crossing near the bias radius.
        params, static = init_sdf_net(jax.random.PRNGKey(0), multires=6, bias=0.6)
        means, stds = [], []
        for r in (0.2, 0.4, 0.6, 0.8, 1.0):
            d = np.random.RandomState(0).randn(64, 3)
            d = d / np.linalg.norm(d, axis=1, keepdims=True) * r
            sdf = np.asarray(sdf_value(params, static, jnp.asarray(d, jnp.float32), ratio=0.0))
            means.append(sdf.mean())
            stds.append(sdf.std())
        assert all(b > a for a, b in zip(means, means[1:])), means  # monotone
        assert means[0] < -0.05 and means[-1] > 0.2, means  # crosses zero
        assert max(stds) < 0.12, stds  # near-spherical level sets

    def test_gradient_is_radial(self):
        params, static = init_sdf_net(jax.random.PRNGKey(0))
        pts = np.random.RandomState(1).randn(32, 3).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True) / 0.5
        g = np.asarray(sdf_gradient(params, static, jnp.asarray(pts), ratio=0.0))
        cos = (g * pts).sum(1) / (np.linalg.norm(g, axis=1) * np.linalg.norm(pts, axis=1))
        assert cos.min() > 0.85 and cos.mean() > 0.95, (cos.min(), cos.mean())

    def test_rendcond_shape(self):
        params, static = init_sdf_net(jax.random.PRNGKey(0), feature_vector_size=256)
        s, feat = sdf_apply(params, static, jnp.zeros((5, 3)), ratio=1.0)
        assert s.shape == (5,) and feat.shape == (5, 256)


class TestTranslator:
    def test_near_identity_init(self):
        params, static = init_translator(jax.random.PRNGKey(0), condlen=128, multires=6)
        ps = jnp.asarray(np.random.RandomState(0).randn(4, 10, 3), jnp.float32)
        cond = jnp.zeros((4, 10, 128))
        out, off = translator_apply(params, static, ps, cond, ratio=1.0)
        assert np.abs(np.asarray(off)).max() < 0.05
        np.testing.assert_allclose(np.asarray(out), np.asarray(ps) + np.asarray(off), rtol=1e-5)


class TestRenderNet:
    def test_output_range(self):
        params, static = init_render_net(jax.random.PRNGKey(0), condlen=256, multires_v=4)
        n = 7
        rgb = render_net_apply(
            params, static,
            jnp.zeros((n, 3)), jnp.ones((n, 3)), jnp.ones((n, 3)) / np.sqrt(3),
            jnp.zeros((n, 256)), ratio=1.0,
        )
        assert rgb.shape == (n, 3)
        assert np.abs(np.asarray(rgb)).max() <= 1.0


class TestSmpl:
    def test_synthetic_body_closed_mesh(self):
        model = synthetic_body_model()
        assert model.weights.shape == (model.num_verts, 24)
        np.testing.assert_allclose(model.weights.sum(1), 1.0, atol=1e-5)
        # Euler characteristic of a lat-lon sphere grid mesh: V - E + F = 2
        # (ours omits pole fans so just sanity-check face indices)
        assert model.faces.min() >= 0 and model.faces.max() < model.num_verts

    def test_fk_identity_pose(self):
        model = synthetic_body_model()
        Js = smpl_skeleton(model, jnp.zeros(10))
        rot = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        A = forward_kinematics(rot, Js, model.parents)
        # identity pose → joints stay at rest positions
        np.testing.assert_allclose(np.asarray(A[0, :, :3, 3]), np.asarray(Js), atol=1e-5)

    def test_zero_pose_verts_are_template(self):
        model = synthetic_body_model()
        verts, joints, _ = smpl_forward(model, jnp.zeros(10), jnp.zeros((1, 24, 3)))
        np.testing.assert_allclose(np.asarray(verts[0]), model.v_template, atol=1e-4)

    def test_root_rotation_rotates_all(self):
        model = synthetic_body_model()
        pose = np.zeros((1, 24, 3), np.float32)
        pose[0, 0] = [0, np.pi / 2, 0]
        verts, joints, _ = smpl_forward(model, jnp.zeros(10), jnp.asarray(pose))
        v0 = model.v_template
        # rotation about y through root joint: distances to root preserved
        root = np.asarray(smpl_skeleton(model, jnp.zeros(10)))[0]
        d_before = np.linalg.norm(v0 - root, axis=1)
        d_after = np.linalg.norm(np.asarray(verts[0]) - root, axis=1)
        np.testing.assert_allclose(d_before, d_after, atol=1e-3)


class TestSkinner:
    def _make(self, res=(33, 49, 17)):
        model = synthetic_body_model()
        sk, verts, faces = initial_lbs_skinner(
            model, jnp.zeros(10), apose(), resolution=res
        )
        return model, sk, verts, faces

    def test_apose_roundtrip(self):
        # Deforming the A-pose body with the A-pose itself must reproduce it:
        # FK(A-pose) @ inv(A-pose chain) = identity.
        model, sk, verts, faces = self._make()
        poses = jnp.asarray(apose())[None]
        trans = jnp.zeros((1, 3))
        out = skinner_apply(sk, verts[None], poses, trans)
        err = np.abs(np.asarray(out[0]) - np.asarray(verts)).max()
        assert err < 1e-3, err

    def test_translation_additive(self):
        model, sk, verts, faces = self._make()
        poses = jnp.asarray(apose())[None]
        t = jnp.asarray([[0.3, -0.2, 0.5]])
        out0 = skinner_apply(sk, verts[None], poses, jnp.zeros((1, 3)))
        out1 = skinner_apply(sk, verts[None], poses, t)
        np.testing.assert_allclose(np.asarray(out1 - out0)[0], np.broadcast_to(t, out0[0].shape), atol=1e-5)

    def test_batch_inds_matches_batched(self):
        model, sk, verts, faces = self._make()
        poses = jnp.asarray(np.stack([apose(), apose(20.0, 30.0)]))
        trans = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]])
        sub = verts[:40]
        batched = skinner_apply(sk, jnp.stack([sub, sub]), poses, trans)
        flat = jnp.concatenate([sub, sub])
        inds = jnp.concatenate([jnp.zeros(40, jnp.int32), jnp.ones(40, jnp.int32)])
        per_point = skinner_apply(sk, flat, poses, trans, batch_inds=inds)
        np.testing.assert_allclose(
            np.asarray(per_point), np.asarray(batched).reshape(-1, 3), atol=1e-5
        )

    def test_posed_skeleton(self):
        model, sk, verts, faces = self._make()
        js = posed_skeleton(sk, jnp.asarray(apose())[None])
        assert js.shape == (1, 24, 3)

    def test_smooth_weights_preserves_partition(self):
        w = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 8).astype(np.float32))
        w = w / w.sum(0, keepdims=True)
        out = np.asarray(smooth_weights(w, times=5))
        np.testing.assert_allclose(out.sum(0), 1.0, atol=1e-5)

    def test_bbox_margin(self):
        model, sk, verts, faces = self._make()
        bmin, bmax = bbox_size(sk)
        np.testing.assert_allclose(np.asarray(bmin), np.asarray(sk.b_min) - [0.15, 0.15, 0.2], atol=1e-6)


class TestDeformerJacobian:
    def test_jacobian_of_linear_map(self):
        A = jnp.asarray(np.random.RandomState(0).randn(3, 3).astype(np.float32))

        def f(p):
            return p @ A.T

        ps = jnp.asarray(np.random.RandomState(1).randn(10, 3).astype(np.float32))
        J = deformer_jacobian(f, ps)
        np.testing.assert_allclose(np.asarray(J), np.broadcast_to(np.asarray(A), (10, 3, 3)), atol=1e-5)

    def test_normals_identity_jacobian(self):
        J = jnp.broadcast_to(jnp.eye(3), (5, 3, 3))
        g = jnp.asarray(np.random.RandomState(0).randn(5, 3).astype(np.float32))
        n, ok = deformed_normals_from_grads(J, g)
        expected = np.asarray(g) / np.linalg.norm(np.asarray(g), axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(n), expected, atol=1e-5)
        assert np.asarray(ok).all()

    def test_cardinal_rays_rotation(self):
        from scipy.spatial.transform import Rotation

        R = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix().astype(np.float32)
        J = jnp.broadcast_to(jnp.asarray(R), (4, 3, 3))
        rays = jnp.asarray(np.random.RandomState(2).randn(4, 3).astype(np.float32))
        rc, ok = cardinal_rays_from_jac(J, rays)
        expected = np.asarray(rays) @ R  # R⁻¹ r = Rᵀ r = r @ R
        expected /= np.linalg.norm(expected, axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(rc), expected, atol=1e-4)


class TestCamera:
    def _cam(self, W=256, H=256):
        params = {
            "focal_length": np.array([300.0, 310.0], np.float32),
            "princeple_points": np.array([128.0, 130.0], np.float32),
            "cam2world_coord_quat": np.array([1.0, 0.0, 0.0, 0.0], np.float32),
            "world2cam_coord_trans": np.array([0.0, 0.0, 2.5], np.float32),
        }
        return cam_mod.make_camera(params, (W, H))

    def test_project_screen_consistent(self):
        cam = self._cam()
        pts = jnp.asarray(np.random.RandomState(0).randn(20, 3).astype(np.float32) * 0.3)
        screen = np.asarray(cam_mod.transform_points_screen(cam, pts))
        pix = np.asarray(cam_mod.project(cam, pts))
        # screen (rectified) and direct pixel projection must agree to subpixel
        np.testing.assert_allclose(screen[:, :2], pix, atol=0.51)

    def test_ray_through_pixel_hits_point(self):
        cam = self._cam()
        pts = jnp.asarray([[0.1, -0.2, 0.4]], dtype=jnp.float32)
        pix = cam_mod.project(cam, pts)
        rays = cam_mod.view_rays(cam, jnp.concatenate([pix, jnp.ones((1, 1))], axis=1))
        origin = cam_mod.cam_pos(cam)
        # point minus origin should be parallel to ray
        v = np.asarray(pts[0] - origin)
        v = v / np.linalg.norm(v)
        r = np.asarray(rays[0])
        assert abs(abs(float(v @ r)) - 1.0) < 1e-4

    def test_ang_threshold_positive(self):
        cam = self._cam()
        t = cam_mod.ang_threshold(cam, 0.4)
        assert 0 < t < 1.0


class TestCompositeDeformer:
    def test_deform_points_shapes(self):
        model = synthetic_body_model()
        sk, verts, faces = initial_lbs_skinner(model, jnp.zeros(10), apose(), resolution=(17, 25, 9))
        tr_params, tr_static = init_translator(jax.random.PRNGKey(0), condlen=16, multires=2)
        ps = verts[None, :32]
        cond = jnp.zeros((1, 16))
        poses = jnp.asarray(apose())[None]
        trans = jnp.zeros((1, 3))
        out, off = deform_points(tr_params, tr_static, sk, ps, cond, poses, trans, ratio=1.0)
        assert out.shape == (1, 32, 3)
        # near-identity translator → output ≈ skinner-only output
        sk_only = skinner_apply(sk, ps, poses, trans)
        assert np.abs(np.asarray(out - sk_only)).max() < 0.05


class TestProceduralTemplates:
    """Strapless tube templates must have exactly two PLANAR boundary
    rings (the r3 rim-spill root cause: a y-band body slice gives a
    merged neck+armhole top loop spanning 0.37 in y, which wrecks the
    curve rigid+scale fit and the Laplacian boundary alignment)."""

    def _tube(self, name):
        from recmv_tpu.models.garment import garment_templates_from_body

        model = synthetic_body_model()
        v = np.asarray(model.v_template)
        J = np.asarray(model.J_regressor @ v)
        return garment_templates_from_body(
            [name], v, np.asarray(model.faces), J, None)[0]

    @pytest.mark.parametrize("name", ["tube", "upper_tube"])
    def test_two_planar_rings(self, name):
        from recmv_tpu.geometry.mesh_utils import boundary_loops

        t = self._tube(name)
        loops = boundary_loops(np.asarray(t.faces))
        assert len(loops) == 2
        assert len(t.boundary_labels) == 2
        for cname, loop in t.boundary_labels.items():
            ys = np.asarray(t.verts)[np.asarray(loop), 1]
            assert ys.std() < 1e-4, f"{cname} ring is not planar"
        # top ring above bottom ring, both wider than the anatomical neck
        labels = dict(t.boundary_labels)
        top = np.asarray(t.verts)[labels["neck"]]
        assert top[:, 1].mean() > 0.1
        r = np.linalg.norm(top[:, [0, 2]] - top[:, [0, 2]].mean(0), axis=1)
        assert r.mean() > 0.08  # torso-wide, not neck-narrow

    def test_outward_normals_and_closable(self):
        from recmv_tpu.geometry.mesh_utils import vertex_normals

        t = self._tube("tube")
        v = np.asarray(t.verts)
        n = vertex_normals(v, np.asarray(t.faces))
        center = v.mean(0)
        radial = v - center
        radial[:, 1] = 0.0
        cos = np.sum(n * radial, 1)
        assert (cos > 0).mean() > 0.9  # normals point away from the axis
        cv, cf, cn = t.dense_boundary(1).close_hole()
        assert np.isfinite(cv).all() and np.isfinite(cn).all()
