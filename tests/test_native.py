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
