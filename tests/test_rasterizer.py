"""Rasterizer correctness: analytic coverage, depth ordering, barycentric
interpolation, point compositing, and differentiability of the soft mask."""

import numpy as np
import jax
import jax.numpy as jnp

from recmv_tpu.ops.rasterizer import (
    alpha_composite,
    find_surface_points,
    rasterize_mesh,
    rasterize_points,
    silhouette_from_fragments,
)


class TestMeshRasterizer:
    def test_single_triangle_coverage(self):
        # right triangle covering the lower-left of a 32x32 image
        verts = jnp.asarray(
            [[2.0, 2.0, 1.0], [29.0, 2.0, 1.0], [2.0, 29.0, 1.0]], jnp.float32
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        frag = rasterize_mesh(verts, faces, (32, 32), tile=16, cap=8)
        sil = np.asarray(silhouette_from_fragments(frag))
        # pixel (3,3) inside; (30,30) outside
        assert sil[3, 3] == 1.0
        assert sil[30, 30] == 0.0
        # area roughly (27*27)/2
        assert abs(sil.sum() - 27 * 27 / 2) < 60

    def test_winding_independent(self):
        verts = jnp.asarray(
            [[2.0, 2.0, 1.0], [29.0, 2.0, 1.0], [2.0, 29.0, 1.0]], jnp.float32
        )
        f1 = rasterize_mesh(verts, jnp.asarray([[0, 1, 2]], jnp.int32), (32, 32), tile=16, cap=8)
        f2 = rasterize_mesh(verts, jnp.asarray([[0, 2, 1]], jnp.int32), (32, 32), tile=16, cap=8)
        np.testing.assert_array_equal(
            np.asarray(f1.pix_to_face >= 0), np.asarray(f2.pix_to_face >= 0)
        )
        # barycentrics positive inside in both cases
        hit = np.asarray(f2.pix_to_face[..., 0] >= 0)
        assert (np.asarray(f2.bary_coords[..., 0, :])[hit] > 0).all()

    def test_depth_ordering(self):
        # two stacked triangles; nearer one must win
        verts = jnp.asarray(
            [
                [2.0, 2.0, 2.0], [29.0, 2.0, 2.0], [2.0, 29.0, 2.0],   # far
                [2.0, 2.0, 1.0], [29.0, 2.0, 1.0], [2.0, 29.0, 1.0],   # near
            ],
            jnp.float32,
        )
        faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
        frag = rasterize_mesh(verts, faces, (32, 32), tile=16, cap=8)
        hit = np.asarray(frag.pix_to_face[..., 0])
        assert (hit[np.asarray(frag.zbuf[..., 0]) > 0] == 1).all()
        zb = np.asarray(frag.zbuf[..., 0])
        np.testing.assert_allclose(zb[zb > 0], 1.0, atol=1e-5)

    def test_perspective_correct_depth(self):
        # triangle slanted in depth: center-pixel depth is the harmonic
        # interpolation, not the linear one
        verts = jnp.asarray(
            [[0.0, 0.0, 1.0], [31.0, 0.0, 4.0], [0.0, 31.0, 4.0]], jnp.float32
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        frag = rasterize_mesh(verts, faces, (32, 32), tile=16, cap=8)
        # pixel (8, 8): screen bary = (0.48..., ...) — check harmonic z
        w_screen = np.array([1 - 8 / 31 - 8 / 31, 8 / 31, 8 / 31])
        z_harm = 1.0 / (w_screen[0] / 1.0 + w_screen[1] / 4.0 + w_screen[2] / 4.0)
        got = float(frag.zbuf[8, 8, 0])
        assert abs(got - z_harm) < 0.02, (got, z_harm)
        z_lin = (w_screen * np.array([1, 4, 4])).sum()
        assert abs(got - z_lin) > 0.3  # clearly not linear

    def test_find_surface_points(self):
        verts = jnp.asarray(
            [[2.0, 2.0, 1.0], [29.0, 2.0, 1.0], [2.0, 29.0, 1.0]], jnp.float32
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        frag = rasterize_mesh(verts, faces, (32, 32), tile=16, cap=8)
        # canonical verts distinct from screen verts
        cano = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1, 0]], jnp.float32)
        hit, pts, fid = find_surface_points(frag, cano, faces)
        hit = np.asarray(hit)
        pts = np.asarray(pts)
        assert hit[3, 3]
        # canonical point inside the canonical triangle
        p = pts[3, 3]
        assert p[0] >= 0 and p[1] >= 0 and p[0] + p[1] <= 1 and abs(p[2]) < 1e-6


class TestPointRasterizer:
    def test_single_point_coverage(self):
        H = W = 32
        ndc = 2.0 / 32
        pts = jnp.asarray([[16.0, 16.0, 1.0]], jnp.float32)
        radius = 3.0 * ndc  # 3 pixels
        frag = rasterize_points(pts, radius, (H, W), points_per_pixel=4, tile=16, cap=8)
        idx = np.asarray(frag.idx[..., 0])
        assert idx[16, 16] == 0
        assert idx[16, 20] == -1  # 4 px away > radius
        assert idx[16, 18] == 0   # 2 px away < radius
        covered = (idx >= 0).sum()
        assert abs(covered - np.pi * 9) < 12

    def test_z_ordering_and_k(self):
        H = W = 16
        ndc = 2.0 / 16
        pts = jnp.asarray(
            [[8.0, 8.0, 3.0], [8.0, 8.0, 1.0], [8.0, 8.0, 2.0]], jnp.float32
        )
        frag = rasterize_points(pts, 2 * ndc, (H, W), points_per_pixel=3, tile=16, cap=8)
        assert np.asarray(frag.idx)[8, 8].tolist() == [1, 2, 0]
        np.testing.assert_allclose(np.asarray(frag.zbuf)[8, 8], [1, 2, 3], atol=1e-6)

    def test_alpha_composite_mask(self):
        H = W = 32
        ndc = 2.0 / 32
        pts = jnp.asarray([[10.0, 10.0, 1.0], [20.0, 20.0, 1.0]], jnp.float32)
        radius = 2.5 * ndc
        frag = rasterize_points(pts, radius, (H, W), points_per_pixel=8, tile=16, cap=8)
        feats = jnp.ones((2, 1))
        img = np.asarray(alpha_composite(frag, radius, feats))[..., 0]
        assert img[10, 10] > 0.9
        assert img[20, 20] > 0.9
        assert img[0, 0] == 0.0
        # split masking: zero out point 1
        img_u = np.asarray(alpha_composite(frag, radius, feats, zero_mask=jnp.asarray([True, False])))[..., 0]
        assert img_u[10, 10] > 0.9 and img_u[20, 20] == 0.0

    def test_mask_gradient_flows_to_points(self):
        H = W = 24
        ndc = 2.0 / 24
        radius = 3.0 * ndc

        def soft_mask_sum(xy):
            pts = jnp.concatenate([xy, jnp.ones((1, 1))], axis=1)
            frag = rasterize_points(pts, radius, (H, W), points_per_pixel=4, tile=12, cap=8)
            feats = jnp.ones((1, 1))
            img = alpha_composite(frag, radius, feats)
            # weighted by x coordinate → gradient must be nonzero
            wx = jnp.arange(W, dtype=jnp.float32)[None, :, None]
            return jnp.sum(img * wx)

        g = jax.grad(soft_mask_sum)(jnp.asarray([[12.0, 12.0]], jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestTileBoundaries:
    def test_triangle_spanning_tiles(self):
        # triangle crossing multiple tile boundaries renders seamlessly
        verts = jnp.asarray(
            [[5.0, 5.0, 1.0], [59.0, 7.0, 1.0], [7.0, 59.0, 1.0]], jnp.float32
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        frag16 = rasterize_mesh(verts, faces, (64, 64), tile=16, cap=8)
        frag32 = rasterize_mesh(verts, faces, (64, 64), tile=32, cap=8)
        np.testing.assert_array_equal(
            np.asarray(frag16.pix_to_face), np.asarray(frag32.pix_to_face)
        )
        np.testing.assert_allclose(
            np.asarray(frag16.zbuf), np.asarray(frag32.zbuf), atol=1e-6
        )


class TestCompositePoints:
    """Fused composite_points == alpha_composite over fragments (with a
    points_per_pixel large enough that truncation is irrelevant)."""

    def _random_cloud(self, n=400, seed=0):
        rng = np.random.RandomState(seed)
        pts = np.stack([rng.rand(n) * 64, rng.rand(n) * 64,
                        0.5 + rng.rand(n)], 1).astype(np.float32)
        # a few invalid (padding) points behind the camera
        pts[:5, 2] = -1.0
        return jnp.asarray(pts)

    def test_matches_fragment_path(self):
        from recmv_tpu.ops.rasterizer import (
            alpha_composite,
            composite_points,
            rasterize_points,
        )

        pts = self._random_cloud()
        radius = 0.06
        feats = jnp.asarray(
            np.random.RandomState(1).rand(pts.shape[0], 2).astype(np.float32))
        fused = composite_points(pts, radius, feats, (64, 64), tile=16,
                                 sub=8, cap=256, sub_cap=64)
        frag = rasterize_points(pts, radius, (64, 64), points_per_pixel=64,
                                tile=16, cap=256)
        ref = alpha_composite(frag, radius, feats)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=2e-4)

    def test_section_onehot_equals_zero_mask_split(self):
        """Section one-hot channels == the _Split renderer's per-section
        zero_mask composites."""
        from recmv_tpu.ops.rasterizer import (
            alpha_composite,
            composite_points,
            rasterize_points,
        )

        pts = self._random_cloud(300, seed=2)
        radius = 0.08
        P = pts.shape[0]
        sec = (np.arange(P) >= P // 2).astype(np.int64)
        onehot = jnp.asarray(np.eye(2, dtype=np.float32)[sec])
        fused = composite_points(pts, radius, onehot, (64, 64), tile=16,
                                 sub=8, cap=256, sub_cap=64)
        frag = rasterize_points(pts, radius, (64, 64), points_per_pixel=64,
                                tile=16, cap=256)
        for s in range(2):
            ref = alpha_composite(frag, radius, jnp.ones((P, 1)),
                                  zero_mask=jnp.asarray(sec == s))[..., 0]
            np.testing.assert_allclose(np.asarray(fused[..., s]),
                                       np.asarray(ref), atol=2e-4)

    def test_gradient_flows_to_points(self):
        from recmv_tpu.ops.rasterizer import composite_points

        pts = self._random_cloud(200, seed=3)
        feats = jnp.ones((200, 1))

        def loss(p):
            return jnp.sum(composite_points(p, 0.08, feats, (64, 64),
                                            tile=16, sub=8, cap=128,
                                            sub_cap=64))

        g = jax.grad(loss)(pts)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g[:, :2]).sum()) > 0

    def test_pallas_backend_matches_xla(self):
        """The Pallas compositing kernel (interpret mode on CPU) must
        reproduce the XLA backend bit-for-bit-ish, values and point
        gradients both."""
        from recmv_tpu.ops.rasterizer import composite_points

        pts = self._random_cloud(300, seed=4)
        radius = 0.07
        feats = jnp.asarray(
            np.random.RandomState(5).rand(pts.shape[0], 2).astype(np.float32))

        def run(backend):
            def loss(p):
                img = composite_points(p, radius, feats, (64, 64), tile=32,
                                       sub=8, cap=256, sub_cap=64,
                                       backend=backend)
                return jnp.sum(img ** 2), img

            (l, img), g = jax.value_and_grad(loss, has_aux=True)(pts)
            return np.asarray(img), np.asarray(g)

        img_x, g_x = run("xla")
        img_p, g_p = run("pallas_interpret")
        np.testing.assert_allclose(img_p, img_x, atol=1e-5)
        # z column gets no gradient on either path (ordering gate)
        np.testing.assert_allclose(g_p[:, :2], g_x[:, :2],
                                   rtol=2e-3, atol=1e-5)

    def test_pallas_non_128_cap_gradients(self):
        """r2 advice regression: caps that are not 128 multiples (or a
        point count below cap) used to leave the backward kernel's tail
        blocks uninitialized → NaN gradients. The prologue now pads the
        candidate axis to a 128 multiple."""
        from recmv_tpu.ops.rasterizer import composite_points

        for cap, n_pts in ((192, 300), (256, 100)):
            pts = self._random_cloud(n_pts, seed=6)
            feats = jnp.asarray(np.random.RandomState(7)
                                .rand(n_pts, 2).astype(np.float32))

            def run(backend):
                def loss(p):
                    img = composite_points(p, 0.07, feats, (64, 64), tile=32,
                                           sub=8, cap=cap, sub_cap=64,
                                           backend=backend)
                    return jnp.sum(img ** 2)

                return jax.value_and_grad(loss)(pts)

            l_x, g_x = run("xla")
            l_p, g_p = run("pallas_interpret")
            assert np.isfinite(np.asarray(g_p)).all(), f"cap={cap}"
            np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-4)
            np.testing.assert_allclose(np.asarray(g_p)[:, :2],
                                       np.asarray(g_x)[:, :2],
                                       rtol=2e-3, atol=1e-5)


class TestPallasMeshRaster:
    def test_matches_xla_backend(self):
        """Pallas mesh z-buffer kernel (interpret mode) reproduces the
        XLA fragments: pix_to_face, zbuf, and barycentrics."""
        from recmv_tpu.ops.rasterizer import rasterize_mesh

        rng = np.random.RandomState(0)
        # a fan of random triangles in front of the camera
        V = 90
        verts = np.stack([rng.rand(V) * 64, rng.rand(V) * 64,
                          1.0 + rng.rand(V)], 1).astype(np.float32)
        faces = rng.randint(0, V, (60, 3)).astype(np.int32)
        vj = jnp.asarray(verts)
        fj = jnp.asarray(faces)
        fr_x = rasterize_mesh(vj, fj, (64, 64), tile=32, cap=64,
                              backend="xla")
        fr_p = rasterize_mesh(vj, fj, (64, 64), tile=32, cap=64,
                              backend="pallas_interpret")
        np.testing.assert_array_equal(np.asarray(fr_p.pix_to_face),
                                      np.asarray(fr_x.pix_to_face))
        np.testing.assert_allclose(np.asarray(fr_p.zbuf),
                                   np.asarray(fr_x.zbuf), atol=1e-4)
        hit = np.asarray(fr_x.pix_to_face[..., 0]) >= 0
        np.testing.assert_allclose(np.asarray(fr_p.bary_coords)[hit],
                                   np.asarray(fr_x.bary_coords)[hit],
                                   atol=1e-4)
