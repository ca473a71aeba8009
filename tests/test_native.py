"""Native meshops: C++ marching cubes must match the JAX path exactly;
isotropic remesh must preserve geometry while equalizing edge lengths."""

import numpy as np
import pytest

from recmv_tpu.ops.marching_cubes import marching_cubes_np


@pytest.fixture(scope="module")
def lib():
    from recmv_tpu import native

    try:
        native.get_lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e}")
    return native


def sphere_vol(n=33, r=0.6):
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(x * x + y * y + z * z) - r, (-1.0, -1.0, -1.0), (lin[1] - lin[0],) * 3


class TestNativeMC:
    def test_matches_jax_path(self, lib):
        vol, origin, spacing = sphere_vol()
        v_j, f_j = marching_cubes_np(vol, 0.0, origin, spacing)
        v_c, f_c = lib.marching_cubes_host(vol, 0.0, origin, spacing)
        assert len(v_c) == len(v_j) and len(f_c) == len(f_j)
        # same surface: vertex sets equal as sets (orderings differ)
        sj = np.sort(np.round(v_j, 5).view([('x', 'f4'), ('y', 'f4'), ('z', 'f4')]), axis=0)
        sc = np.sort(np.round(v_c, 5).view([('x', 'f4'), ('y', 'f4'), ('z', 'f4')]), axis=0)
        np.testing.assert_array_equal(sj, sc)
        # triangle count per config identical → same connectivity size
        radii = np.linalg.norm(v_c, axis=1)
        np.testing.assert_allclose(radii, 0.6, atol=0.01)

    def test_large_grid(self, lib):
        vol, origin, spacing = sphere_vol(65)
        v, f = lib.marching_cubes_host(vol, 0.0, origin, spacing)
        assert len(v) > 4000
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 0.6, atol=0.004)

    @pytest.mark.slow
    def test_513_grid(self, lib):
        """The reference's `higher` inference resolution
        (/root/reference/train.py:47-79): 513³ extraction through the
        native path succeeds and matches the analytic radius."""
        vol, origin, spacing = sphere_vol(513)
        v, f = lib.marching_cubes_host(vol, 0.0, origin, spacing,
                                       max_verts=1 << 22, max_faces=1 << 23)
        assert len(v) > 400_000 and len(f) > 800_000
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 0.6, atol=5e-5)


class TestHostExtractionPipeline:
    @pytest.mark.heavy
    def test_update_host_matches_device(self, lib, tiny_scene_net):
        """net.marching_cube_update_host (seg3d → native host MC, the
        infer_fl --quality higher path) produces the same surfaces as the
        device MC path on the trained tiny net."""
        import jax.numpy as jnp

        from recmv_tpu.ops.knn import knn

        net, dataset, ckpt = tiny_scene_net
        net.load_checkpoint(ckpt)
        ratio = {"sdfRatio": 1.0, "deformerRatio": 1.0, "renderRatio": 1.0}
        net.marching_cube_update(net._ratio_dict(ratio))
        dev_v = np.asarray(net.mesh.garment_vs[0])[: net.mesh.garment_n[0]]
        net.marching_cube_update_host(ratio)
        host_v = np.asarray(net.mesh.garment_vs[0])[: net.mesh.garment_n[0]]
        assert abs(len(host_v) - len(dev_v)) <= 0.02 * len(dev_v)
        d2, _ = knn(jnp.asarray(host_v), jnp.asarray(dev_v), 1)
        # identical iso-surface: every host vertex lies on the device mesh
        # (f32 interpolation rounding only)
        assert float(jnp.sqrt(jnp.max(d2))) < 1e-3


class TestRemesh:
    def test_edge_lengths_equalize(self, lib):
        vol, origin, spacing = sphere_vol(17)
        v, f = marching_cubes_np(vol, 0.0, origin, spacing)

        def edge_stats(v, f):
            e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
            el = np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1)
            return el

        el0 = edge_stats(v, f)
        target = float(np.median(el0)) * 0.6
        v2, f2 = lib.isotropic_remesh(v, f, target, iters=3)
        el2 = edge_stats(v2, f2)
        assert len(v2) > len(v)  # refinement happened
        assert el2.max() < el0.max()  # long edges split
        # geometry preserved: vertices stay near the sphere
        np.testing.assert_allclose(np.linalg.norm(v2, axis=1), 0.6, atol=0.05)

    def test_collapse_flip_reduce_anisotropy(self, lib):
        """On an MC sphere (MC triangles are notoriously anisotropic) the
        full split+collapse+flip+project pipeline must reduce the
        edge-length coefficient of variation, keep the surface closed,
        and coarsen where the target length exceeds the median."""
        vol, origin, spacing = sphere_vol(25)
        v, f = marching_cubes_np(vol, 0.0, origin, spacing)

        def edge_stats(v, f):
            e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
            el = np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1)
            return el

        el0 = edge_stats(v, f)
        cv0 = el0.std() / el0.mean()
        # target ≈ median: both split and collapse must fire
        target = float(np.median(el0))
        v2, f2 = lib.isotropic_remesh(v, f, target, iters=5)
        el2 = edge_stats(v2, f2)
        cv2 = el2.std() / el2.mean()
        assert cv2 < 0.6 * cv0, (cv0, cv2)
        # closed surface stays closed (every edge shared by exactly 2 faces)
        e = np.sort(np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]], f2[:, [2, 0]]]), 1)
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert (counts == 2).all()
        # projection keeps vertices on the sphere
        np.testing.assert_allclose(np.linalg.norm(v2, axis=1), 0.6, atol=0.05)

    def test_coarsen_dense_mesh(self, lib):
        """A target length well above the input median must REDUCE vertex
        count (collapse actually fires) — the r3 split-only remesher could
        only refine."""
        vol, origin, spacing = sphere_vol(33)
        v, f = marching_cubes_np(vol, 0.0, origin, spacing)
        el = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1)
        target = float(np.median(el)) * 2.5
        v2, f2 = lib.isotropic_remesh(v, f, target, iters=5)
        assert len(v2) < 0.6 * len(v), (len(v), len(v2))
        np.testing.assert_allclose(np.linalg.norm(v2, axis=1), 0.6, atol=0.06)

    def test_boundary_preserved(self, lib):
        """Open meshes: boundary vertices are pinned exactly."""
        # a flat strip of triangles, anisotropic on purpose
        nx, ny = 24, 4
        xs, ys = np.meshgrid(np.linspace(0, 3.0, nx), np.linspace(0, 0.3, ny),
                             indexing="ij")
        v = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
        faces = []
        for i in range(nx - 1):
            for j in range(ny - 1):
                a = i * ny + j
                faces += [[a, a + ny, a + 1], [a + 1, a + ny, a + ny + 1]]
        f = np.asarray(faces, np.int64)
        v2, f2 = lib.isotropic_remesh(np.asarray(v, np.float32), f, 0.1, iters=4)
        # all original boundary verts must still be present, unchanged
        e = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), 1)
        uniq, counts = np.unique(e, axis=0, return_counts=True)
        bidx = np.unique(uniq[counts == 1])
        for b in v[bidx]:
            assert np.min(np.linalg.norm(v2 - b, axis=1)) < 1e-6
        # interior stays planar
        assert np.abs(v2[:, 2]).max() < 1e-5
