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
