"""Geometry layer: boundary loops, subdivision, hole closing, Laplacian
editing, KNN/chamfer, Umeyama/ICP, NRICP smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

from recmv_tpu.geometry.icp import icp, umeyama
from recmv_tpu.geometry.laplacian import laplacian_deform, uniform_laplacian
from recmv_tpu.geometry.mesh_utils import (
    boundary_loops,
    close_holes,
    dense_boundary,
    longest_boundary_loop,
    merge_meshes,
    mesh_boundary_mask,
    slice_mesh_by_vertex_ids,
    subdivide_faces,
)
from recmv_tpu.geometry.nricp import NricpConfig, nricp_fit
from recmv_tpu.geometry.polygons import resample_loop_arclength, uniform_sample
from recmv_tpu.ops.knn import chamfer_distance, knn
from recmv_tpu.ops.marching_cubes import marching_cubes_np


def open_cylinder(n_ring=16, n_h=8, r=0.5, h=1.0):
    """Open tube mesh: two boundary loops."""
    ang = np.linspace(0, 2 * np.pi, n_ring, endpoint=False)
    hs = np.linspace(0, h, n_h)
    verts = np.stack(
        [np.repeat(hs, n_ring), np.tile(r * np.cos(ang), n_h), np.tile(r * np.sin(ang), n_h)],
        axis=1,
    )[:, [1, 0, 2]]  # (x=r cos, y=h, z=r sin)
    faces = []
    for i in range(n_h - 1):
        for j in range(n_ring):
            a = i * n_ring + j
            b = i * n_ring + (j + 1) % n_ring
            c = (i + 1) * n_ring + j
            d = (i + 1) * n_ring + (j + 1) % n_ring
            faces += [[a, b, c], [b, d, c]]
    return verts.astype(np.float64), np.asarray(faces, np.int64)


class TestMeshUtils:
    def test_boundary_loops_cylinder(self):
        v, f = open_cylinder()
        loops = boundary_loops(f)
        assert len(loops) == 2
        assert sorted(len(l) for l in loops) == [16, 16]
        mask = mesh_boundary_mask(f, len(v))
        assert mask.sum() == 32

    def test_longest_loop_by_arclength(self):
        v, f = open_cylinder()
        # scale the top ring to be longer in arc length
        v2 = v.copy()
        top = np.arange(len(v) - 16, len(v))
        v2[top, 0] *= 2
        v2[top, 2] *= 2
        loop = longest_boundary_loop(f, v2, by_length=True)
        assert set(loop).issubset(set(top.tolist()))

    def test_close_holes_watertight(self):
        v, f = open_cylinder()
        v2, f2, orig = close_holes(v, f, subdivide_times=1)
        assert len(boundary_loops(f2)) == 0  # watertight now
        assert len(v2) > len(v)

    def test_subdivide_conforming(self):
        v, f = open_cylinder()
        v2, f2, new_ids = subdivide_faces(v, f, np.arange(8))
        # no boundary introduced in the interior: edge counts consistent
        from recmv_tpu.geometry.mesh_utils import boundary_edges

        assert len(boundary_loops(f2)) == 2

    def test_dense_boundary_grows(self):
        v, f = open_cylinder()
        v2, f2 = dense_boundary(v, f, times=1)
        assert len(f2) > len(f)
        assert len(boundary_loops(f2)) == 2

    def test_merge_and_slice(self):
        v, f = open_cylinder()
        mv, mf = merge_meshes([v, v + 5.0], [f, f])
        assert len(mv) == 2 * len(v) and len(mf) == 2 * len(f)
        sv, sf, old = slice_mesh_by_vertex_ids(mv, mf, np.arange(len(v)))
        assert len(sv) == len(v) and len(sf) == len(f)


class TestPolygons:
    def test_uniform_sample_up(self):
        sq = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
        out = uniform_sample(sq, 40)
        assert out.shape == (40, 2)
        # reference semantics: the rear→head closing edge is dropped, so
        # only consecutive (non-wrapping) gaps are bounded
        seg = np.linalg.norm(out[1:] - out[:-1], axis=1)
        assert seg.max() < 0.2

    def test_uniform_sample_down(self):
        ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
        circle = np.stack([np.cos(ang), np.sin(ang)], 1)
        out = uniform_sample(circle, 30)
        assert out.shape == (30, 2)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)

    def test_resample_arclength(self):
        ang = np.linspace(0, 2 * np.pi, 50, endpoint=False)
        circle = np.stack([np.cos(ang), np.sin(ang), 0 * ang], 1)
        out = resample_loop_arclength(circle, 200)
        seg = np.linalg.norm(np.roll(out, -1, 0) - out, axis=1)
        assert seg.std() / seg.mean() < 0.05


class TestLaplacianDeform:
    def test_constraints_satisfied_shape_kept(self):
        v, f = open_cylinder(12, 6)
        # pull the top ring outward; bottom ring constrained in place
        top = np.arange(len(v) - 12, len(v))
        bottom = np.arange(12)
        targets_top = v[top] * [1.5, 1.0, 1.5]
        cid = np.concatenate([top, bottom])
        ct = np.concatenate([targets_top, v[bottom]])
        out = np.asarray(laplacian_deform(v, f, cid, ct, constrain_weight=10.0, smooth=False))
        np.testing.assert_allclose(out[top], targets_top, atol=5e-2)
        np.testing.assert_allclose(out[bottom], v[bottom], atol=5e-2)
        # middle rings interpolate smoothly: radii between 0.5 and 0.75
        mid = out[2 * 12 : 3 * 12]
        r = np.sqrt(mid[:, 0] ** 2 + mid[:, 2] ** 2)
        assert (r > 0.45).all() and (r < 0.78).all()

    def test_cg_path_matches_dense(self, monkeypatch):
        """The matrix-free CG path (used above DENSE_SOLVE_MAX_N, where
        the dense LU overflows TPU scoped vmem) solves the same normal
        equations as the dense path."""
        from recmv_tpu.geometry import laplacian as lap

        v, f = open_cylinder(24, 12)
        top = np.arange(len(v) - 24, len(v))
        bottom = np.arange(24)
        cid = np.concatenate([top, bottom])
        ct = np.concatenate([v[top] * [1.3, 1.0, 1.3], v[bottom]])
        for disp in (False, True):
            for smooth in (False, True):
                dense = np.asarray(laplacian_deform(
                    v, f, cid, ct, constrain_weight=5.0, smooth=smooth,
                    displacement=disp))
                monkeypatch.setattr(lap, "DENSE_SOLVE_MAX_N", 1)
                cgout = np.asarray(laplacian_deform(
                    v, f, cid, ct, constrain_weight=5.0, smooth=smooth,
                    displacement=disp))
                monkeypatch.setattr(lap, "DENSE_SOLVE_MAX_N", 8192)
                np.testing.assert_allclose(cgout, dense, atol=2e-4)


class TestKnnIcp:
    def test_knn_exact(self):
        rng = np.random.RandomState(0)
        ref = rng.randn(500, 3).astype(np.float32)
        q = rng.randn(100, 3).astype(np.float32)
        d2, idx = knn(jnp.asarray(q), jnp.asarray(ref), 3)
        d_full = ((q[:, None] - ref[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], d_full.argmin(1))
        np.testing.assert_allclose(np.asarray(d2)[:, 0], d_full.min(1), rtol=1e-4, atol=1e-5)

    def test_umeyama_recovers_transform(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.RandomState(1)
        src = rng.randn(200, 3).astype(np.float32)
        R = Rotation.from_euler("xyz", [0.4, -0.3, 0.7]).as_matrix().astype(np.float32)
        s_true, t_true = 1.7, np.array([0.2, -0.5, 1.0], np.float32)
        dst = s_true * src @ R.T + t_true
        s, Re, t = umeyama(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(float(s), s_true, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(Re), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)

    def test_icp_aligns(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.RandomState(2)
        src = rng.rand(300, 3).astype(np.float32)
        R = Rotation.from_euler("xyz", [0.1, 0.15, -0.1]).as_matrix().astype(np.float32)
        dst = src @ R.T + np.array([0.05, -0.03, 0.08], np.float32)
        s, Re, t = icp(src, dst, iters=15)
        aligned = float(s) * src @ np.asarray(Re).T + np.asarray(t)
        assert np.abs(aligned - dst).max() < 1e-2


class TestNricp:
    def test_sphere_to_ellipsoid(self):
        lin = np.linspace(-1, 1, 25, dtype=np.float32)
        z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
        sv, sf = marching_cubes_np(np.sqrt(x**2 + y**2 + z**2) - 0.5, 0.0,
                                   (-1, -1, -1), (lin[1] - lin[0],) * 3)
        tv, tf = marching_cubes_np(
            np.sqrt((x / 1.25) ** 2 + (y / 0.9) ** 2 + z**2) - 0.5, 0.0,
            (-1, -1, -1), (lin[1] - lin[0],) * 3,
        )
        cfg = NricpConfig(epochs=30, inner_iter=10, first_inner_iter=50,
                          stiffness_weight=(50.0, 5.0, 0.5), milestones=(10, 20),
                          laplacian_weight=(5.0, 5.0, 5.0), lr=1e-3)
        out = nricp_fit(sv, sf, tv, cfg=cfg)
        d_before = float(chamfer_distance(jnp.asarray(sv), jnp.asarray(tv)))
        d_after = float(chamfer_distance(jnp.asarray(out, jnp.float32), jnp.asarray(tv)))
        assert d_after < d_before * 0.35, (d_before, d_after)


class TestMatching:
    def test_best_match_identity(self):
        from recmv_tpu.geometry.matching import boundary_curve_best_match

        ang = np.linspace(0, 2 * np.pi, 40, endpoint=False)
        loop = np.stack([np.cos(ang), np.zeros(40), np.sin(ang)], 1)
        # target: same ring, rotated sampling + slight noise
        tgt = np.roll(loop, 7, axis=0) + 0.01
        sel, matched = boundary_curve_best_match(loop, tgt)
        # every source point matched to its (noisy) counterpart
        assert len(sel) == 40
        d = np.linalg.norm(loop[sel] - matched, axis=-1)
        assert float(d.max()) < 0.2

    def test_best_match_beats_nearest_on_offset_loops(self):
        """Shifted loops: naive nearest-point matching collapses many
        sources onto the near side; optimal assignment keeps a bijection."""
        from recmv_tpu.geometry.matching import boundary_curve_best_match

        ang = np.linspace(0, 2 * np.pi, 60, endpoint=False)
        src = np.stack([np.cos(ang), np.zeros(60), np.sin(ang)], 1)
        tgt = src * 0.8 + np.asarray([0.35, 0.0, 0.0])  # smaller, shifted
        sel, matched = boundary_curve_best_match(src, tgt, similarity_gate=0.5)
        # the assignment must be injective on the target side
        keys = [tuple(np.round(m, 6)) for m in matched]
        assert len(set(keys)) == len(keys)

    def test_match_template_boundaries(self):
        from recmv_tpu.geometry.matching import match_template_boundaries

        v, f = open_cylinder()
        loops = boundary_loops(f)
        labels = {"neck": loops[0], "bottom_curve": loops[1]}
        curves = {
            "neck": v[loops[0]] * 1.1,
            "bottom_curve": v[loops[1]] * 1.1,
        }
        cids, tgts = match_template_boundaries(v, labels, curves)
        assert len(cids) == len(tgts) > 0
        # matched targets near the corresponding scaled loop
        d = np.linalg.norm(v[cids] * 1.1 - tgts, axis=-1)
        assert float(np.median(d)) < 0.3


class TestSewUpperBottom:
    def test_waist_sewn(self):
        """An upper tube and a displaced bottom tube: after sewing, the
        bottom's waist loop lies on the upper's waist loop while the
        bottom hemline stays put (lap_deform_optimizer.py:192-300)."""
        from recmv_tpu.geometry.laplacian import sew_upper_bottom

        uv, uf = open_cylinder(n_ring=16, n_h=6, r=0.5, h=1.0)
        bv, bf = open_cylinder(n_ring=16, n_h=6, r=0.55, h=1.0)
        bv = bv + np.asarray([0.08, -1.15, 0.02])  # below + offset
        u_loops = boundary_loops(uf)
        b_loops = boundary_loops(bf)
        # upper's bottom loop (y=0) = waist; bottom's top loop = waist
        u_waist = min(u_loops, key=lambda l: uv[l, 1].mean())
        b_waist = max(b_loops, key=lambda l: bv[l, 1].mean())
        b_hem = min(b_loops, key=lambda l: bv[l, 1].mean())
        hem_before = bv[b_hem].copy()

        out = sew_upper_bottom(uv, u_waist, bv, bf, b_waist,
                               static_ids=b_hem, constrain_weight=10.0,
                               smooth=False)
        # waist loop pulled onto the upper's waist ring
        d = np.min(np.linalg.norm(out[b_waist][:, None] - uv[u_waist][None],
                                  axis=-1), axis=1)
        assert float(d.mean()) < 0.06, d.mean()
        # hemline stayed (static constraint)
        np.testing.assert_allclose(out[b_hem], hem_before, atol=0.05)


class TestRemeshRelabel:
    def test_remesh_registered_keeps_labeled_loops(self):
        from recmv_tpu.core.inference import remesh_registered

        v, f = open_cylinder(n_ring=24, n_h=10)
        loops = boundary_loops(f)
        top = max(loops, key=lambda l: v[l, 1].mean())
        bot = min(loops, key=lambda l: v[l, 1].mean())
        labels = {"neck": top, "bottom_curve": bot}
        nv, nf, nlabels = remesh_registered(v, f, labels, subdivide=True)
        assert len(nf) > len(f)  # subdivision grew the mesh
        assert set(nlabels) == {"neck", "bottom_curve"}
        # relabeled loops sit at the right heights
        assert nv[nlabels["neck"], 1].mean() > nv[nlabels["bottom_curve"], 1].mean()


class TestHandleOutlierGate:
    def test_outlier_handles_dropped(self):
        """A few cross-wired correspondences (far targets) act as point
        torques on the Laplacian solve; match_template_boundaries gates
        them per loop (> 3x median displacement and > 5 cm)."""
        from recmv_tpu.geometry.matching import match_template_boundaries

        v, f = open_cylinder()
        loops = boundary_loops(f)
        tgt = v[loops[0]] + np.asarray([0.0, 0.02, 0.0])  # small move
        tgt[3] += np.asarray([0.0, 0.4, 0.0])             # one wild target
        cids, tgts = match_template_boundaries(
            v, {"neck": loops[0]}, {"neck": tgt})
        d = np.linalg.norm(tgts - v[cids], axis=1)
        assert float(d.max()) < 0.1, "wild handle survived the gate"
        assert len(cids) >= len(loops[0]) - 2

    def test_uniform_large_offset_passes(self):
        """The gate is relative: a genuinely large rigid offset (all
        handles move together) must NOT be dropped."""
        from recmv_tpu.geometry.matching import match_template_boundaries

        v, f = open_cylinder()
        loops = boundary_loops(f)
        tgt = v[loops[0]] + np.asarray([0.0, 0.3, 0.0])
        cids, tgts = match_template_boundaries(
            v, {"neck": loops[0]}, {"neck": tgt})
        assert len(cids) == len(loops[0])
