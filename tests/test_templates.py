"""DeepFashion3D template-asset path: color-coded obj fixture →
load_template_assets → scene initialization (reference GARMENT_COLOR_MAP
decode, garment_structure.py:357-544; asset layout smpl_clothes_template)."""

import os
import os.path as osp

import numpy as np
import pytest

from recmv_tpu.config.constants import GARMENT_COLOR_MAP
from recmv_tpu.models.garment import (
    GarmentTemplate,
    _swept_tube_template,
    load_template_assets,
)


def _write_colored_obj(path, template: GarmentTemplate, cmap: dict):
    """DF3D-style asset: vertex colors encode boundary labels; interior
    verts carry the back_ground color."""
    colors = np.tile(np.asarray(cmap["back_ground"], np.float32) / 255.0,
                     (len(template.verts), 1))
    for label, ids in template.boundary_labels.items():
        colors[ids] = np.asarray(cmap[label], np.float32) / 255.0
    with open(path, "w") as f:
        for v, c in zip(template.verts, colors):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f} "
                    f"{c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n")
        for a, b, c3 in template.faces + 1:
            f.write(f"f {a} {b} {c3}\n")


@pytest.fixture(scope="module")
def tube_asset_dir(tmp_path_factory):
    """A realistic tube template (swept around a synthetic body) written
    out as a color-coded obj asset."""
    from recmv_tpu.models.smpl import synthetic_body_model, smpl_forward
    import jax.numpy as jnp

    body = synthetic_body_model()
    verts, joints, _ = smpl_forward(body, jnp.zeros(10),
                                    jnp.zeros((1, 24, 3)))
    v = np.asarray(verts[0])
    j = np.asarray(joints[0])
    hip_y = float((j[1, 1] + j[2, 1]) / 2)
    top_y = float(hip_y + 0.8 * (j[16, 1] - hip_y))
    t = _swept_tube_template("tube", v, hip_y, top_y, "neck", "bottom_curve",
                             float(j[16, 0]))
    d = str(tmp_path_factory.mktemp("assets"))
    _write_colored_obj(osp.join(d, "tube.obj"), t, GARMENT_COLOR_MAP["tube"])
    return d, t


class TestTemplateAssets:
    def test_roundtrip_labels(self, tube_asset_dir):
        d, orig = tube_asset_dir
        t = load_template_assets(d, "tube")
        assert t is not None
        assert set(t.boundary_labels) == {"neck", "bottom_curve"}
        np.testing.assert_allclose(t.verts, orig.verts, atol=1e-5)
        # decoded loops land on the right rings: neck is the TOP loop
        neck_y = t.verts[t.boundary_labels["neck"]][:, 1].mean()
        bot_y = t.verts[t.boundary_labels["bottom_curve"]][:, 1].mean()
        assert neck_y > bot_y
        # each decoded loop matches the original ring as a set of heights
        for label in ("neck", "bottom_curve"):
            got = np.sort(t.verts[t.boundary_labels[label]][:, 1])
            ref = np.sort(orig.verts[orig.boundary_labels[label]][:, 1])
            np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_missing_asset_returns_none(self, tmp_path):
        assert load_template_assets(str(tmp_path), "tube") is None

    def test_downstream_pipeline(self, tube_asset_dir):
        """The loaded asset supports the full template pipeline used by
        initialize_tmp_sdf: dense_boundary → extract_featurelines →
        close_hole."""
        d, _ = tube_asset_dir
        t = load_template_assets(d, "tube")
        t2 = t.dense_boundary(1)
        assert set(t2.boundary_labels) == {"neck", "bottom_curve"}
        fls = t2.extract_featurelines(100)
        assert fls["neck"].shape == (100, 3)
        assert fls["bottom_curve"].shape == (100, 3)
        cv, cf, cn = t2.close_hole()
        # closed: watertight (every edge shared by exactly 2 faces)
        e = np.sort(np.concatenate([cf[:, [0, 1]], cf[:, [1, 2]], cf[:, [2, 0]]]), 1)
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert (counts == 2).all()

    @pytest.mark.heavy
    def test_scene_init_consumes_assets(self, tube_asset_dir, tmp_path):
        """initialize_tmp_sdf(template_dir=...) uses the asset template
        instead of the procedural slice and completes initialization
        (curve statics + garment surface)."""
        from recmv_tpu.config import ConfigFactory
        from recmv_tpu.core.builder import build_opt_net
        from recmv_tpu.core.network import TrainConfig
        from recmv_tpu.data.dataset import SceneDataset
        from recmv_tpu.data.synthetic import ensure_scene

        d, orig = tube_asset_dir
        scene = str(tmp_path / "tube")
        ensure_scene(scene, n_frames=4, image_size=64, skinner_res=(17, 25, 9))
        conf = ConfigFactory.parse_file(
            osp.join(osp.dirname(__file__), "..", "configs", "synthetic",
                     "smoke.conf"))
        ds = SceneDataset(scene, conds_lens={"deformer": 256, "render": 256},
                          garment_type="synthetic-tube")
        cfg = TrainConfig(sample_pix=64, point_radius=0.02, remesh_intersect=8,
                          batch_size=2, image_size=(64, 64),
                          mc_capacity_v=1 << 12, mc_capacity_f=1 << 13,
                          raster_tile=16, raster_cap_mesh=128,
                          raster_cap_points=128, points_per_pixel=4,
                          solver_times=4, surface_sample=64)
        net = build_opt_net(conf, ds, str(tmp_path / "result"),
                            resolutions=((7, 9, 5), (13, 17, 9)),
                            skinner_res=(17, 25, 9), train_cfg=cfg)
        net.initialize_tmp_sdf(nepochs=4, save_dir=None, fl_iters=2,
                               template_dir=d)
        assert net.curve_statics is not None
        # the registered template is the ASSET (dense_boundary of it),
        # not the procedural slice: vertex count matches its refinement
        assert net.garment_templates[0].name == "tube"
        meshes = net.discretize_sdf({"sdfRatio": 1.0, "deformerRatio": 1.0,
                                     "renderRatio": 1.0})
        assert meshes[1][2] > 20  # garment SDF has a surface
