"""Data layer: synthetic scene generation + SceneDataset round trip."""

import os

import numpy as np
import pytest

from recmv_tpu.data.dataset import (
    ClipSampler,
    RandomSampler,
    SceneDataset,
    init_scene_params,
)
from recmv_tpu.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("scene") / "synthetic-tube"
    generate_scene(str(out), n_frames=6, image_size=128, skinner_res=(25, 41, 13))
    return str(out)


class TestSyntheticScene:
    def test_layout(self, scene):
        for sub in ("imgs", "masks", "parsing_SCH_ATR", "featurelines", "normals"):
            assert os.path.isdir(os.path.join(scene, sub))
        assert os.path.isfile(os.path.join(scene, "smpl_rec.npz"))
        assert os.path.isfile(os.path.join(scene, "camera.npz"))
        assert len(os.listdir(os.path.join(scene, "imgs"))) == 6

    def test_feature_lines_visible_arc_only(self, scene):
        """The generator must annotate only the VISIBLE arc of each gt
        ring (the reference's featurelines are labelme traces of what the
        annotator can see). A full-ring annotation (old SCENE_VERSION<4
        behavior) biases the projection chamfer outward: the gt→pred term
        drags the visible curve to span the whole ring's extent."""
        import json as _json

        for fid in range(6):
            with open(os.path.join(scene, "featurelines", f"{fid}.json")) as f:
                shapes = _json.load(f)["shapes"]
            for s in shapes:
                # boundary_ring samples 100 pts; self-occlusion hides the
                # back of the tube in EVERY view, so a visible arc is
                # always a strict subset. SCENE_VERSION 6 also enforces
                # annotator frame selection: an emitted arc is never a
                # badly-truncated stub (<30% of the ring) — those frames
                # are skipped entirely, like a labelme annotator skipping
                # an arm-occluded keyframe. Stub arcs poison the init
                # scale fit (the visibility gate can't know the arc was
                # truncated, so its extra points drag the fit inward).
                # (the generator's cut is 0.3x the deduped ring length,
                # which is <100 after the lateral-clamp dedup — assert a
                # conservative lower bound)
                assert 20 <= len(s["points"]) < 80, (
                    fid, s["label"], len(s["points"]))

    def test_masks_nonempty_and_rotating(self, scene):
        import cv2

        m0 = cv2.imread(os.path.join(scene, "masks/0.png"))
        m3 = cv2.imread(os.path.join(scene, "masks/3.png"))
        assert (m0 > 0).mean() > 0.02
        # the subject rotates: masks differ between frames
        assert (m0 != m3).mean() > 0.005


class TestSceneDataset:
    def test_roundtrip(self, scene):
        ds = SceneDataset(scene, conds_lens={"deformer": 128, "render": 256},
                          garment_type="synthetic-tube")
        assert ds.frame_num == 6
        assert ds.fl_names == ["neck", "bottom_curve"]
        idx, out = ds[0]
        H = W = 128
        assert out["img"].shape == (H, W, 3)
        assert out["img"].min() >= -1.0 and out["img"].max() <= 1.0
        assert out["mask"].shape == (H, W)
        assert out["fl_pts"].shape == (2, 100, 2)
        assert out["fl_masks"].all()
        assert out["upper"].sum() > 50          # garment pixels labeled
        assert out["body"].sum() > 50           # skin pixels labeled
        assert out["normal"].shape == (H, W, 3)

    def test_feature_lines_on_garment(self, scene):
        ds = SceneDataset(scene, conds_lens={}, garment_type="synthetic-tube")
        _, out = ds[0]
        pts = out["fl_pts"][0]  # neck curve pixels
        valid = (pts[:, 0] >= 0) & (pts[:, 0] < 128) & (pts[:, 1] >= 0) & (pts[:, 1] < 128)
        pix = pts[valid].astype(int)
        # most projected curve points land on the foreground mask
        hit = out["mask"][pix[:, 1], pix[:, 0]]
        assert hit.mean() > 0.6

    def test_params_and_windows(self, scene):
        ds = SceneDataset(scene, conds_lens={"deformer": 16}, garment_type="synthetic-tube")
        p = ds.params
        assert p.poses.shape == (6, 24, 3)
        assert p.conds["deformer"].shape == (6, 16)
        win, centers = ds.get_batchframe_data("poses", np.asarray([0, 3, 5]), 4)
        assert win.shape == (3, 4, 24, 3)
        assert (centers >= 0).all() and (centers < 4).all()
        batch = ds.get_batch([0, 2])
        assert batch["img"].shape == (2, 128, 128, 3)

    def test_samplers(self, scene):
        cs = list(ClipSampler(10, 3, shuffle=False))
        assert len(cs) == 8 and (cs[0] == [0, 1, 2]).all()
        rs = list(RandomSampler(10, 3, shuffle=True, seed=1))
        assert len(rs) == 3
        assert all(len(b) == 3 for b in rs)

    def test_area_statistics(self, scene):
        ds = SceneDataset(scene, conds_lens={}, garment_type="synthetic-tube")
        assert set(ds.fl_weights) == {"neck", "bottom_curve"}
        # the largest curve gets weight 1; smaller curves get boosted
        assert min(ds.fl_weights.values()) == 1.0
        assert all(w >= 1.0 for w in ds.fl_weights.values())


@pytest.fixture(scope="module")
def large_pose_scene(tmp_path_factory):
    """8-frame scene where only frames 0-3 carry feature-line jsons (the
    A-pose sub-range), with a TCMR output pkl and a varying translation
    track — the Large_Pose_SceneDataset preconditions."""
    joblib = pytest.importorskip("joblib")
    out = str(tmp_path_factory.mktemp("lp") / "tube")
    generate_scene(out, n_frames=8, image_size=64, skinner_res=(17, 25, 9))
    for fid in range(4, 8):
        os.remove(os.path.join(out, "featurelines", f"{fid}.json"))
    # translation with depth drift after the A-pose range
    data = dict(np.load(os.path.join(out, "smpl_rec.npz"), allow_pickle=True))
    trans = np.zeros((8, 3), np.float32)
    trans[:, 2] = np.linspace(0.0, 0.7, 8)
    data["trans"] = trans
    np.savez(os.path.join(out, "smpl_rec.npz"), **data)
    # TCMR: distinct poses per frame + betas
    rng = np.random.RandomState(0)
    tc_pose = np.tile(np.load(os.path.join(out, "smpl_rec.npz"))["poses"]
                      .reshape(8, 72), (1, 1)).astype(np.float32)
    tc_pose += 0.01 * np.arange(8, dtype=np.float32)[:, None]
    betas = 0.1 * rng.randn(8, 10).astype(np.float32)
    joints = 32 + 8 * rng.rand(8, 17, 2).astype(np.float32)
    gt_j = np.concatenate([joints, np.ones((8, 17, 1), np.float32)], -1)
    joblib.dump({1: {"frame_ids": np.arange(8), "gt_joints2d": gt_j,
                     "pose": tc_pose, "betas": betas}},
                os.path.join(out, "synthetic-tube_tcmr_output.pkl"))
    return out


class TestLargePoseDataset:
    def test_range_split(self, large_pose_scene):
        from recmv_tpu.data.dataset import LargePoseDataset

        lp = LargePoseDataset(large_pose_scene, conds_lens={},
                              garment_type="synthetic-tube", a_pose=False)
        assert (lp.a_pose_start, lp.a_pose_end) == (0, 3)
        assert lp.start_idx == 4 and lp.frame_num == 4
        ap = LargePoseDataset(large_pose_scene, conds_lens={},
                              garment_type="synthetic-tube", a_pose=True)
        assert ap.start_idx == 0 and ap.frame_num == 4

    def test_translation_frozen_and_smoothed(self, large_pose_scene):
        from recmv_tpu.data.dataset import LargePoseDataset

        from recmv_tpu.core.inference import one_euro_smooth

        lp = LargePoseDataset(large_pose_scene, conds_lens={},
                              garment_type="synthetic-tube", a_pose=False)
        # exact semantics: depth frozen at the a_pose_end value past the
        # annotated range, then the whole track OneEuro-smoothed
        raw = np.zeros((8, 3), np.float32)
        raw[:, 2] = np.linspace(0.0, 0.7, 8)
        raw[lp.a_pose_end:, 2] = raw[lp.a_pose_end, 2]
        expect = one_euro_smooth(raw, min_cutoff=0.004, beta=0.7, d_cutoff=1.0)
        np.testing.assert_allclose(lp.params.trans, expect, atol=1e-6)
        # and the raw 0.7 depth drift is gone
        assert lp.params.trans[-1, 2] < 0.35

    def test_tcmr_poses_and_betas(self, large_pose_scene):
        from recmv_tpu.data.dataset import LargePoseDataset

        lp = LargePoseDataset(large_pose_scene, conds_lens={},
                              garment_type="synthetic-tube", a_pose=False)
        raw = np.load(os.path.join(large_pose_scene, "smpl_rec.npz"))
        import joblib

        tc = joblib.load(os.path.join(large_pose_scene,
                                      "synthetic-tube_tcmr_output.pkl"))[1]
        # poses beyond the A-pose range come from TCMR, not videoavatars
        np.testing.assert_allclose(
            lp.params.poses[4:], tc["pose"][4:].reshape(4, 24, 3), atol=1e-6)
        np.testing.assert_allclose(
            lp.params.poses[:4], raw["poses"][:4].reshape(4, 24, 3), atol=1e-6)
        # betas = mean TCMR betas over the A-pose range
        np.testing.assert_allclose(lp.params.shape,
                                   tc["betas"][:4].mean(0), atol=1e-6)

    def test_supervision_flags(self, large_pose_scene):
        from recmv_tpu.data.dataset import LargePoseDataset

        lp = LargePoseDataset(large_pose_scene, conds_lens={},
                              garment_type="synthetic-tube", a_pose=False)
        assert lp.fl_supervised[:4] == [True] * 4
        assert lp.fl_supervised[4:] == [False] * 4
        # large-motion frames: carried-forward annotations are NOT
        # supervision — fl_masks must come back all-False
        _, out = lp[0]   # frame 4
        assert not out["fl_masks"].any()
        ap = LargePoseDataset(large_pose_scene, conds_lens={},
                              garment_type="synthetic-tube", a_pose=True)
        _, out = ap[0]   # frame 0 has its own annotation
        assert out["fl_masks"].any()

    def test_init_fl_dataset(self, large_pose_scene):
        from recmv_tpu.data.dataset import LargePoseDataset

        lp = LargePoseDataset(large_pose_scene, conds_lens={},
                              garment_type="synthetic-tube", a_pose=False)
        init = lp.get_init_fl_dataset()
        assert len(init) == 4
        _, out = init[0]
        assert out["fl_masks"].any()

    def test_area_statistic_supervised_only(self, large_pose_scene):
        from recmv_tpu.data.dataset import LargePoseDataset

        lp = LargePoseDataset(large_pose_scene, conds_lens={},
                              garment_type="synthetic-tube", a_pose=False)
        assert all(w >= 1.0 for w in lp.fl_weights.values())
        assert min(lp.fl_weights.values()) == 1.0
