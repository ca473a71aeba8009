"""Subject-config parity: every shipped .conf parses, carries the three
phase/loss blocks, and the gap-female (CUHKszCap-A anran — BASELINE
config #3; reference configs/gap-female/config_anran_garment_10-5-1.conf)
schedule builds a real network."""

import glob
import os.path as osp

import pytest

from recmv_tpu.config import ConfigFactory

CONF_ROOT = osp.join(osp.dirname(__file__), "..", "configs")
ALL_CONFS = sorted(glob.glob(osp.join(CONF_ROOT, "*", "*.conf")))


class TestAllConfigsParse:
    @pytest.mark.parametrize("path", ALL_CONFS, ids=lambda p: "/".join(p.split("/")[-2:]))
    def test_parse_and_blocks(self, path):
        conf = ConfigFactory.parse_file(path)
        assert conf.get_string("train.garment_type")
        for phase in ("coarse", "medium", "fine"):
            assert conf.get_float(f"train.{phase}.point_render.radius") > 0
            assert conf.get_int(f"train.{phase}.point_render.batch_size") >= 1
            # loss block present with the pc ladder
            blk = f"loss_{phase}"
            assert conf.get_float(f"{blk}.pc_weight.weight") != 0
            assert conf.get_string(f"{blk}.fl_visible_method", "zbuff")


class TestGapFemaleConfig:
    PATH = osp.join(CONF_ROOT, "gap-female", "config_anran_garment_10-5-1.conf")

    def test_reference_schedule_values(self):
        """The 10-5-1 ladder and schedule match the reference file."""
        conf = ConfigFactory.parse_file(self.PATH)
        assert conf.get_string("train.data_type") == "scene"
        assert conf.get_string("train.garment_type") == "anran"
        assert conf.get_int("train.skinner_pose_type") == 1
        assert conf.get_int("train.nepoch") == 200
        assert conf.get_list("train.scheduler.milestones") == [10, 30, 80, 130]
        assert conf.get_int("train.medium.start_epoch") == 6
        assert conf.get_int("train.fine.start_epoch") == 12
        # fl sdf ladder 10 → 5 → 1 (the config's name)
        assert conf.get_float("loss_coarse.fl_weight.sdf_weight") == 10.0
        assert conf.get_float("loss_medium.fl_weight.sdf_weight") == 5.0
        assert conf.get_float("loss_fine.fl_weight.sdf_weight") == 1.0
        assert conf.get_float("loss_fine.dct_weight") == 12.0
        assert conf.get_int("loss_fine.sample_pix_num") == 6144

    @pytest.mark.e2e
    def test_builds_net(self, tmp_path):
        """The config's loss/schedule blocks drive a real network build
        (two-garment synthetic stand-in for the CUHKszCap scene — the
        conf supplies everything except the on-disk data)."""
        from recmv_tpu.core.builder import build_opt_net
        from recmv_tpu.core.network import TrainConfig
        from recmv_tpu.data.dataset import get_dataset_and_loader
        from recmv_tpu.data.synthetic import generate_scene

        scene = str(tmp_path / "anran_standin")
        generate_scene(scene, n_frames=2, image_size=48,
                       skinner_res=(17, 25, 9), garment_type="synthetic-two")
        conf = ConfigFactory.parse_file(self.PATH)
        dataset, _ = get_dataset_and_loader(
            scene, {"deformer": 384, "render": 256}, 2, shuffle=False,
            garment_type="synthetic-two", data_type="synthe")
        cfg = TrainConfig(sample_pix=64, point_radius=0.02, remesh_intersect=8,
                          batch_size=2, image_size=(48, 48),
                          mc_capacity_v=1 << 11, mc_capacity_f=1 << 12,
                          raster_tile=16, raster_cap_mesh=128,
                          raster_cap_points=128, points_per_pixel=4,
                          solver_times=2, surface_sample=64)
        net = build_opt_net(conf, dataset, str(tmp_path / "result"),
                            resolutions=((7, 9, 5), (13, 17, 9)),
                            skinner_res=(17, 25, 9), train_cfg=cfg)
        assert net is not None
        assert float(net.conf.get_float("loss_coarse.pc_weight.weight")) == 60.0
        net.on_phase_change()
