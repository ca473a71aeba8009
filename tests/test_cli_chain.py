"""The real delivery surface, driven as subprocesses (VERDICT r4 #7):
disk-layout scene → ``train.py --conf`` → ``infer_fl.py`` →
``infer_fl_animation.py`` — the reference's unit of delivery
(reference train.py:82-110, infer_fl.py, infer_fl_animation.py).

Slow tier: three cold python processes, each recompiling on CPU."""

import glob
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

pytestmark = [pytest.mark.e2e, pytest.mark.slow]


def _run(args, timeout=2400):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    p = subprocess.run([sys.executable] + args, cwd=REPO, timeout=timeout,
                       capture_output=True, text=True, env=env)
    assert p.returncode == 0, (
        f"{' '.join(args)} rc={p.returncode}\n--- stdout ---\n"
        f"{p.stdout[-4000:]}\n--- stderr ---\n{p.stderr[-4000:]}")
    return p


class TestCliChain:
    def test_train_infer_animation_chain(self, tmp_path):
        from recmv_tpu.data.synthetic import generate_scene

        scene = str(tmp_path / "cli_scene")
        generate_scene(scene, n_frames=4, image_size=64,
                       skinner_res=(17, 25, 9))

        # 1) train: smoke config, tiny pyramid, few steps
        _run(["train.py",
              "--conf", "configs/synthetic/smoke.conf",
              "--data-root", scene,
              "--save-folder", "rec",
              "--quality", "tiny",
              "--init-epochs", "8",
              "--max-steps", "2",
              "--platform", "cpu",
              "--no-vis"])
        save = osp.join(scene, "rec")
        assert osp.isfile(osp.join(save, "config.conf"))
        ckpts = glob.glob(osp.join(save, "*.ckpt"))
        assert ckpts, os.listdir(save)

        # 2) infer_fl: registration + per-frame mesh export
        _run(["infer_fl.py",
              "--data-root", scene,
              "--save-folder", "rec",
              "--quality", "small",
              "--frames", "0", "1",
              "--no-images", "--no-color",
              "--platform", "cpu"])
        out = osp.join(save, "infer")
        meshes = glob.glob(osp.join(out, "meshs", "*.obj"))
        assert meshes, os.listdir(out)
        from recmv_tpu.utils.io import load_obj
        for m in meshes:
            v, f = load_obj(m)
            assert len(v) > 10 and len(f) > 10
            assert np.isfinite(v).all()

        # 3) infer_fl_animation: novel pose sequence through the learned
        # deformation field
        motion = str(tmp_path / "motion.npz")
        T = 3
        pose = np.zeros((T, 72), np.float32)
        pose[:, 5] = np.linspace(0.0, 0.3, T)    # swing a hip joint
        np.savez(motion, pose=pose, trans=np.zeros((T, 3), np.float32))
        _run(["infer_fl_animation.py",
              "--data-root", scene,
              "--save-folder", "rec",
              "--motion", motion,
              "--quality", "small",
              "--platform", "cpu"])
        anim = glob.glob(osp.join(save, "animation", "**", "*.obj"),
                         recursive=True)
        assert anim, os.listdir(save)
        for m in anim:
            v, _ = load_obj(m)
            assert np.isfinite(v).all()
