"""Unit tests for core ops: embedder, 3x3 inverse, grid sampling, resize.

Golden references are computed with torch (CPU) where the reference used
torch semantics (grid_sample, interpolate, softplus), mirroring the
reference's own check scripts (FastMinv/check.py, MCAcc/check_grid_sampler_mine.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recmv_tpu.ops import (
    annealing_weights,
    batch_rodrigues,
    compute_fnorms,
    compute_vnorms,
    dct_null_space,
    fast_3x3_inv,
    get_embedder,
    grid_sample_3d,
    interp2x_boundary3d,
    quat2mat,
    resize_trilinear,
)


class TestEmbedder:
    def test_out_dim(self):
        emb, dim = get_embedder(6)
        assert dim == 3 + 3 * 2 * 6 == 39

    def test_matches_manual(self):
        emb, _ = get_embedder(4)
        x = np.random.RandomState(0).randn(5, 3).astype(np.float32)
        out = np.asarray(emb(jnp.asarray(x)))
        np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
        # band 0: sin(x), cos(x); band 2: sin(4x), cos(4x)
        np.testing.assert_allclose(out[:, 3:6], np.sin(x), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[:, 6:9], np.cos(x), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[:, 15:18], np.sin(4 * x), rtol=1e-4, atol=1e-5)

    def test_annealing_weights(self):
        w = np.asarray(annealing_weights(6, 1.0))
        np.testing.assert_allclose(w, np.ones(12), atol=1e-6)
        w = np.asarray(annealing_weights(6, 0.0))
        np.testing.assert_allclose(w, np.zeros(12), atol=1e-6)
        # ratio=0.5 → alpha=3: first 3 bands fully on, rest off
        w = np.asarray(annealing_weights(6, 0.5))
        np.testing.assert_allclose(w[:6], np.ones(6), atol=1e-6)
        np.testing.assert_allclose(w[6:], np.zeros(6), atol=1e-6)
        # fractional alpha: ratio=7/12 → alpha=3.5 → band 3 at half-cosine
        w = np.asarray(annealing_weights(6, 7.0 / 12.0))
        np.testing.assert_allclose(w[6:8], np.full(2, 0.5), atol=1e-6)

    def test_weighted_embed(self):
        emb, _ = get_embedder(6)
        x = jnp.ones((2, 3)) * 0.3
        w = annealing_weights(6, 0.5)
        out = np.asarray(emb(x, w))
        # fully-off bands are zero
        assert np.allclose(out[:, 3 + 24:], 0.0, atol=1e-7)


class TestFast3x3Inv:
    def test_inverse_matches_numpy(self):
        rng = np.random.RandomState(1)
        m = rng.randn(1000, 3, 3).astype(np.float32) + np.eye(3) * 2
        inv, check = fast_3x3_inv(jnp.asarray(m))
        inv = np.asarray(inv)
        check = np.asarray(check)
        good = check
        assert good.sum() > 990
        prod = np.einsum("nij,njk->nik", inv[good], m[good])
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=2e-4)

    def test_singular_masked(self):
        m = np.zeros((4, 3, 3), np.float32)
        m[0] = np.eye(3)
        m[1] = 1.0  # rank 1
        m[2] = np.diag([1e-3, 1e-3, 1e-3])  # det 1e-9 < 1e-4
        m[3] = np.diag([2.0, 3.0, 4.0])
        inv, check = fast_3x3_inv(jnp.asarray(m))
        assert np.asarray(check).tolist() == [True, False, False, True]
        assert np.allclose(np.asarray(inv)[1], 0.0)
        assert np.allclose(np.asarray(inv)[2], 0.0)

    def test_backward_matches_formula(self):
        rng = np.random.RandomState(2)
        m = rng.randn(8, 3, 3).astype(np.float32) + np.eye(3) * 3
        g = rng.randn(8, 3, 3).astype(np.float32)

        def f(mm):
            inv, _ = fast_3x3_inv(mm)
            return jnp.sum(inv * g)

        grad = np.asarray(jax.grad(f)(jnp.asarray(m)))
        inv = np.linalg.inv(m)
        invT = np.swapaxes(inv, -1, -2)
        expected = -invT @ g @ invT
        np.testing.assert_allclose(grad, expected, rtol=1e-3, atol=1e-4)

    def test_grad_through_singular_is_zero(self):
        m = jnp.zeros((1, 3, 3))

        def f(mm):
            inv, _ = fast_3x3_inv(mm)
            return jnp.sum(inv)

        grad = jax.grad(f)(m)
        assert np.allclose(np.asarray(grad), 0.0)


class TestGridSample:
    def _torch_ref(self, vol, pts, align_corners=False):
        import torch
        import torch.nn.functional as F

        v = torch.from_numpy(vol)[None]  # (1,C,D,H,W)
        g = torch.from_numpy(pts)[None, None, None]  # (1,1,1,N,3)
        out = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                            align_corners=align_corners)
        return out[0, :, 0, 0].numpy().T  # (N,C)

    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_torch(self, align_corners):
        rng = np.random.RandomState(3)
        vol = rng.randn(24, 9, 11, 7).astype(np.float32)
        pts = rng.uniform(-1.2, 1.2, (500, 3)).astype(np.float32)
        ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(pts), align_corners))
        ref = self._torch_ref(vol, pts, align_corners)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_double_backward_exists(self):
        # The whole reason the reference wrote ~1500 LoC of CUDA: second
        # derivatives through the sampler. JAX must give them for free.
        rng = np.random.RandomState(4)
        vol = jnp.asarray(rng.randn(2, 5, 5, 5).astype(np.float32))
        pts = jnp.asarray(rng.uniform(-0.8, 0.8, (10, 3)).astype(np.float32))

        def f(p):
            return jnp.sum(grid_sample_3d(vol, p) ** 2)

        g1 = jax.grad(f)(pts)
        g2 = jax.jacfwd(jax.grad(f))(pts)  # second derivative
        assert np.isfinite(np.asarray(g1)).all()
        assert np.isfinite(np.asarray(g2)).all()
        assert np.abs(np.asarray(g2)).sum() > 0

    def test_resize_trilinear_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(5)
        vol = rng.randn(1, 1, 5, 7, 9).astype(np.float32)
        out_shape = (9, 13, 17)
        ref = F.interpolate(torch.from_numpy(vol), size=out_shape, mode="trilinear",
                            align_corners=True).numpy()
        ours = np.asarray(resize_trilinear(jnp.asarray(vol[0, 0]), out_shape, align_corners=True))
        np.testing.assert_allclose(ours, ref[0, 0], rtol=1e-4, atol=1e-5)

    def test_interp2x_boundary(self):
        # A signed field crossing zero: boundary cells must straddle it.
        z = np.linspace(-1, 1, 9, dtype=np.float32)
        vol = np.broadcast_to(z[:, None, None], (9, 9, 9)).copy()
        up, boundary = interp2x_boundary3d(jnp.asarray(vol), (17, 17, 17), 0.0)
        up = np.asarray(up)
        b = np.asarray(boundary)
        assert up.shape == (17, 17, 17)
        # crossing happens around the center plane only
        assert b[7:10].any()
        assert not b[:4].any() and not b[-4:].any()


class TestRotations:
    def test_quat2mat_identity(self):
        R = np.asarray(quat2mat(jnp.asarray([[1.0, 0, 0, 0]])))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_rodrigues_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.RandomState(6)
        aa = rng.randn(50, 3).astype(np.float32)
        ours = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        ref = Rotation.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_rodrigues_zero_angle(self):
        ours = np.asarray(batch_rodrigues(jnp.zeros((1, 3))))
        np.testing.assert_allclose(ours[0], np.eye(3), atol=1e-6)

    def test_rodrigues_differentiable_at_zero(self):
        g = jax.jacfwd(lambda a: batch_rodrigues(a))(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()


class TestMeshMath:
    def test_normals_cube_face(self):
        verts = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=jnp.float32)
        faces = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
        fn = np.asarray(compute_fnorms(verts, faces))
        np.testing.assert_allclose(fn[0], [0, 0, 1], atol=1e-6)
        vn = np.asarray(compute_vnorms(verts, faces))
        np.testing.assert_allclose(vn, np.broadcast_to([0, 0, 1], (3, 3)), atol=1e-6)

    def test_dct_null_space_orthonormal(self):
        B = dct_null_space(10, 30)
        assert B.shape == (20, 30)
        np.testing.assert_allclose(B @ B.T, np.eye(20), atol=1e-5)
        # constant (low-frequency) signals are annihilated
        c = np.ones(30, np.float32)
        assert np.abs(B @ c).max() < 1e-5
