"""Seg3dLossless: the lossless property — coarse-to-fine evaluation must
reproduce dense fine-grid evaluation on all sign-relevant voxels, so the
marching-cubes surface is identical (SURVEY §4: exact-equality property)."""

import numpy as np
import pytest

import jax.numpy as jnp

from recmv_tpu.ops.marching_cubes import marching_cubes_np
from recmv_tpu.ops.seg3d import Seg3dConfig, final_grid_spacing, seg3d_dense, seg3d_forward


def sphere_query(pts):
    return jnp.linalg.norm(pts - jnp.asarray([0.05, -0.1, 0.0]), axis=-1) - 0.45


def blob_query(pts):
    # non-convex union of two spheres
    d1 = jnp.linalg.norm(pts - jnp.asarray([0.25, 0.0, 0.0]), axis=-1) - 0.3
    d2 = jnp.linalg.norm(pts + jnp.asarray([0.25, 0.0, 0.0]), axis=-1) - 0.35
    return jnp.minimum(d1, d2)


def make_cfg(res0=(9, 9, 9), levels=3):
    resolutions = [tuple(res0)]
    for _ in range(levels - 1):
        resolutions.append(tuple(2 * r - 1 for r in resolutions[-1]))
    return Seg3dConfig(b_min=(-1, -1, -1), b_max=(1, 1, 1), resolutions=tuple(resolutions))


class TestSeg3d:
    @pytest.mark.heavy
    def test_signs_match_dense(self):
        # (blob topology covered by test_mc_surface_identical)
        cfg = make_cfg()
        oct_vol = np.asarray(seg3d_forward(sphere_query, cfg))
        dense = np.asarray(seg3d_dense(sphere_query, cfg))
        assert oct_vol.shape == dense.shape == (33, 33, 33)
        # sign pattern identical → identical extracted surface topology
        np.testing.assert_array_equal(oct_vol > 0, dense > 0)

    def test_values_exact_at_boundary(self):
        cfg = make_cfg()
        oct_vol = np.asarray(seg3d_forward(sphere_query, cfg))
        dense = np.asarray(seg3d_dense(sphere_query, cfg))
        # voxels adjacent to a sign change must hold exactly-queried values
        inside = dense < 0
        bx = inside[:, :, :-1] != inside[:, :, 1:]
        near = np.zeros_like(inside)
        near[:, :, :-1] |= bx
        near[:, :, 1:] |= bx
        by = inside[:, :-1] != inside[:, 1:]
        near[:, :-1] |= by
        near[:, 1:] |= by
        bz = inside[:-1] != inside[1:]
        near[:-1] |= bz
        near[1:] |= bz
        np.testing.assert_allclose(oct_vol[near], dense[near], atol=1e-6)

    def test_mc_surface_identical(self):
        cfg = make_cfg()
        spacing, origin = final_grid_spacing(cfg)
        v1, f1 = marching_cubes_np(np.asarray(seg3d_forward(blob_query, cfg)), 0.0, origin, spacing)
        v2, f2 = marching_cubes_np(np.asarray(seg3d_dense(blob_query, cfg)), 0.0, origin, spacing)
        assert v1.shape == v2.shape and f1.shape == f2.shape
        np.testing.assert_allclose(v1, v2, atol=1e-6)
        np.testing.assert_array_equal(f1, f2)

    @pytest.mark.slow
    def test_anisotropic_pyramid(self):
        cfg = Seg3dConfig(
            b_min=(-1, -1.2, -0.8), b_max=(1, 1.2, 0.8),
            resolutions=((5, 7, 5), (9, 13, 9), (17, 25, 17)),
        )
        oct_vol = np.asarray(seg3d_forward(sphere_query, cfg))
        dense = np.asarray(seg3d_dense(sphere_query, cfg))
        np.testing.assert_array_equal(oct_vol > 0, dense > 0)

    def test_budget_overflow_still_lossless(self):
        """Tiny per-pass budgets force many requery passes — exactness
        must be unaffected (the budget is a throughput knob only)."""
        cfg = Seg3dConfig(
            b_min=(-1, -1, -1), b_max=(1, 1, 1),
            resolutions=((9, 9, 9), (17, 17, 17), (33, 33, 33)),
            budgets=(128, 128), conflict_budget=64,
        )
        for query in (sphere_query, blob_query):
            oct_vol = np.asarray(seg3d_forward(query, cfg))
            dense = np.asarray(seg3d_dense(query, cfg))
            np.testing.assert_array_equal(oct_vol > 0, dense > 0)

    @pytest.mark.slow
    def test_production_pyramid_lossless(self):
        """Exactness at the reference's fine-quality pyramid
        (21,27,15)→(321,417,225) (reference train.py:47-79) with a cheap
        analytic body-scale SDF: identical signs and identical
        marching-cubes surfaces vs the 30M-voxel dense evaluation."""

        def capsule_query(pts):
            # person-ish capsule + head sphere, body-bbox scale
            p = pts - jnp.asarray([0.0, 0.1, 0.0])
            y = jnp.clip(p[..., 1], -0.55, 0.55)
            trunk = jnp.linalg.norm(
                p - jnp.stack([jnp.zeros_like(y), y, jnp.zeros_like(y)], -1),
                axis=-1) - 0.22
            head = jnp.linalg.norm(pts - jnp.asarray([0.0, 0.82, 0.0]),
                                   axis=-1) - 0.12
            return jnp.minimum(trunk, head)

        res = [(21, 27, 15)]
        for _ in range(4):
            res.append(tuple(2 * r - 1 for r in res[-1]))
        assert res[-1] == (321, 417, 225)
        cfg = Seg3dConfig(b_min=(-0.8, -1.0, -0.6), b_max=(0.8, 1.2, 0.6),
                          resolutions=tuple(res))
        oct_vol = np.asarray(seg3d_forward(capsule_query, cfg))
        dense = np.asarray(seg3d_dense(capsule_query, cfg))
        np.testing.assert_array_equal(oct_vol > 0, dense > 0)
        spacing, origin = final_grid_spacing(cfg)
        v1, f1 = marching_cubes_np(oct_vol, 0.0, origin, spacing)
        v2, f2 = marching_cubes_np(dense, 0.0, origin, spacing)
        assert v1.shape == v2.shape and f1.shape == f2.shape
        np.testing.assert_allclose(v1, v2, atol=1e-6)

    def test_host_refine_level_matches_device(self):
        """The host-orchestrated final level (built for >2^26-voxel grids
        where the fused device graph exceeds HBM) must reproduce the
        all-device pyramid: identical signs vs dense evaluation and an
        identical marching-cubes surface (VERDICT r4 missing #4)."""
        from recmv_tpu.ops.seg3d import host_refine_level

        for query in (sphere_query, blob_query):
            cfg = make_cfg()

            def query_np(pts, _q=query):
                return np.asarray(_q(jnp.asarray(pts)))

            occ, evaluated = seg3d_forward(
                query, cfg, stop_after=len(cfg.resolutions) - 1)
            vol_host = host_refine_level(query_np, cfg, np.asarray(occ),
                                         np.asarray(evaluated))
            dense = np.asarray(seg3d_dense(query, cfg))
            assert vol_host.shape == dense.shape
            np.testing.assert_array_equal(vol_host > 0, dense > 0)
            spacing, origin = final_grid_spacing(cfg)
            v1, f1 = marching_cubes_np(vol_host, 0.0, origin, spacing)
            v2, f2 = marching_cubes_np(dense, 0.0, origin, spacing)
            assert v1.shape == v2.shape and f1.shape == f2.shape
            np.testing.assert_allclose(v1, v2, atol=1e-6)
            np.testing.assert_array_equal(f1, f2)

    def test_host_refine_level_nonzero_balance(self):
        """Same property at a non-zero balance value (training extracts
        at -sdf_shrink)."""
        from recmv_tpu.ops.seg3d import host_refine_level

        cfg = Seg3dConfig(b_min=(-1, -1, -1), b_max=(1, 1, 1),
                          resolutions=((9, 9, 9), (17, 17, 17), (33, 33, 33)),
                          balance_value=0.02)

        def query_np(pts):
            return np.asarray(sphere_query(jnp.asarray(pts)))

        occ, evaluated = seg3d_forward(
            sphere_query, cfg, stop_after=len(cfg.resolutions) - 1)
        vol_host = host_refine_level(query_np, cfg, np.asarray(occ),
                                     np.asarray(evaluated))
        dense = np.asarray(seg3d_dense(sphere_query, cfg))
        np.testing.assert_array_equal(vol_host > cfg.balance_value,
                                      dense > cfg.balance_value)

    @pytest.mark.e2e
    def test_vol_host_hybrid_matches_device(self, tiny_scene_net):
        """Network-level: _vol_host_hybrid (forced by dropping the voxel
        threshold) and the all-device _get_vol_fn must produce identical
        host-MC meshes on the trained tiny scene."""
        net, dataset, ckpt = tiny_scene_net
        net.load_checkpoint(ckpt)
        ratio = {"sdfRatio": 1.0, "deformerRatio": 1.0, "renderRatio": 1.0}
        meshes_dev = net.discretize_sdf_host(ratio)
        old = type(net)._HOST_LEVEL_VOXELS
        type(net)._HOST_LEVEL_VOXELS = 0   # force the hybrid path
        try:
            meshes_hyb = net.discretize_sdf_host(ratio)
        finally:
            type(net)._HOST_LEVEL_VOXELS = old
        assert len(meshes_dev) == len(meshes_hyb)
        for (v1, f1), (v2, f2) in zip(meshes_dev, meshes_hyb):
            assert v1.shape == v2.shape and f1.shape == f2.shape
            np.testing.assert_allclose(v1, v2, atol=1e-5)
            np.testing.assert_array_equal(f1, f2)

    @pytest.mark.slow
    def test_query_count_savings(self):
        # the evaluator must execute far fewer queries than dense
        # evaluation (with_stats counts executed budget-padded batches)
        cfg = make_cfg(levels=4)  # final 65^3 = 274625
        _, n_queried = seg3d_forward(sphere_query, cfg, with_stats=True)
        dense_n = 65**3
        assert int(n_queried) < dense_n * 0.6, (int(n_queried), dense_n)
