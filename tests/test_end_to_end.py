"""End-to-end: generate a synthetic scene, initialize, run optimization
steps through the full three-branch pipeline, check losses and outputs.

This is the CPU-runnable PR1 fixture of SURVEY §7.2 / BASELINE config #1
(tiny shapes: 64px, 4 frames, small pyramids) — slow-ish (~5 min) but the
only test exercising the whole train loop."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from recmv_tpu.data.synthetic import generate_scene

    out = tmp_path_factory.mktemp("e2e") / "tube"
    generate_scene(str(out), n_frames=4, image_size=64, skinner_res=(17, 25, 9))
    return str(out)


@pytest.fixture(scope="module")
def net_and_data(scene):
    import jax

    from recmv_tpu.config import ConfigFactory
    from recmv_tpu.core.builder import build_opt_net
    from recmv_tpu.core.network import TrainConfig
    from recmv_tpu.data.dataset import get_dataset_and_loader

    conf = ConfigFactory.parse_file("configs/synthetic/smoke.conf")
    dataset, sampler = get_dataset_and_loader(
        scene, {"deformer": 256, "render": 256}, 2, shuffle=True,
        garment_type="synthetic-tube", data_type="synthe")
    resolutions = ((7, 9, 5), (13, 17, 9), (25, 33, 17))
    cfg = TrainConfig(sample_pix=128, point_radius=0.02, remesh_intersect=8,
                      batch_size=2, image_size=(64, 64),
                      mc_capacity_v=1 << 13, mc_capacity_f=1 << 14,
                      raster_tile=16, raster_cap_mesh=256,
                      raster_cap_points=256, points_per_pixel=8,
                      solver_times=8, surface_sample=256)
    net = build_opt_net(conf, dataset, os.path.join(scene, "result"),
                        resolutions=resolutions, skinner_res=(17, 25, 9),
                        train_cfg=cfg)
    # NOTE: the IGR fit passes through a transient where the initial
    # sphere deforms before settling on the body — ~60+ epochs needed for
    # a stable zero crossing even at tiny scale
    net.initialize_tmp_sdf(nepochs=80, save_dir=os.path.join(scene, "result"),
                           fl_iters=25)
    return net, dataset, sampler


class TestEndToEnd:
    def test_initialization_products(self, net_and_data):
        net, dataset, _ = net_and_data
        # curves exist and are near the garment surface
        assert net.curve_statics is not None
        assert net.params["curves"]["scale"].shape[0] == 2  # neck + bottom
        # the body SDF has a surface
        meshes = net.discretize_sdf({"sdfRatio": 1.0, "deformerRatio": 1.0,
                                     "renderRatio": 1.0})
        assert meshes[0][2] > 100  # body verts
        assert meshes[1][2] > 50   # garment verts

    def test_train_steps_losses_finite_and_moving(self, net_and_data):
        import jax.random as jrandom

        net, dataset, sampler = net_and_data
        key = jrandom.PRNGKey(0)
        ratio = {"sdfRatio": 1.0, "deformerRatio": 0.5, "renderRatio": 1.0}
        fl_losses = []
        for step, fids in enumerate(sampler):
            batch = dataset.get_batch(fids)
            key, sub = jrandom.split(key)
            loss, info = net.train_step(batch, fids, ratio, sub)
            assert np.isfinite(loss), info
            fl_losses.append(info["fl_loss_total"])
            if step >= 2:
                break
        assert all(np.isfinite(l) for l in fl_losses)
        # the curve branch must actually optimize
        assert fl_losses[-1] < fl_losses[0] * 1.5

    def test_checkpoint_roundtrip(self, net_and_data, tmp_path):
        net, dataset, _ = net_and_data
        p = str(tmp_path / "ck.ckpt")
        net.save_checkpoint(p, epoch=3)
        poses_before = dataset.params.poses.copy()
        dataset.params.poses = dataset.params.poses + 1.0  # clobber
        ep = net.load_checkpoint(p)
        assert ep == 3
        np.testing.assert_allclose(dataset.params.poses, poses_before)

    def test_inference_exports(self, net_and_data, tmp_path):
        from recmv_tpu.core.inference import GarmentInference

        net, dataset, _ = net_and_data
        inf = GarmentInference(net)
        ratio = {"sdfRatio": 1.0, "deformerRatio": 1.0, "renderRatio": 1.0}
        out = str(tmp_path / "infer")
        inf.infer_garment_fl(np.asarray([0, 1]), ratio, out)
        files = os.listdir(out)
        assert any("neck" in f for f in files)
        assert any("bottom_curve" in f for f in files)
        from recmv_tpu.utils.io import load_obj

        v, f = load_obj(os.path.join(out, sorted(files)[0]))
        assert len(v) > 100 and len(f) > 100
