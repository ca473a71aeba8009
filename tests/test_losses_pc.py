"""Regression tests for the packed [pooled, keep] gt-mask layout.

Round-4 shipped a crash: ``_device_batch`` packs the pre-dilated gt
masks channels-last as (N, H, W, 2) [pooled, keep], but the pc branch
fed the packed array straight into ``iou_mask_loss`` and strided its
``ds>1`` downsample over (W, channel). These tests pin the fixed
semantics (losses.unpack_pooled_gt) at the unit level — with H != W so
a wrong-axis stride cannot hide behind square images — and drive the
packed + ds=2 path through a real train step."""

import jax.numpy as jnp
import numpy as np
import pytest

from recmv_tpu.core import losses as L


class TestUnpackPooledGt:
    def test_rect_ds2_strides_spatial_axes(self):
        # H != W: striding (W, channel) instead of (H, W) yields wrong
        # shapes AND wrong values here
        N, H, W = 2, 6, 4
        ds = 2
        rng = np.random.RandomState(0)
        pooled = rng.rand(N, H, W).astype(np.float32)
        keep = (rng.rand(N, H, W) > 0.5).astype(np.float32)
        packed = jnp.stack([jnp.asarray(pooled), jnp.asarray(keep)], -1)
        Hm, Wm = H // ds, W // ds
        p, k = L.unpack_pooled_gt(packed, ds, Hm, Wm)
        assert p.shape == (N, Hm, Wm) and k.shape == (N, Hm, Wm)
        np.testing.assert_array_equal(
            np.asarray(p), pooled[:, ::ds, ::ds][:, :Hm, :Wm])
        np.testing.assert_array_equal(
            np.asarray(k), keep[:, ::ds, ::ds][:, :Hm, :Wm])

    def test_ds1_identity(self):
        packed = jnp.arange(2 * 3 * 5 * 2, dtype=jnp.float32).reshape(2, 3, 5, 2)
        p, k = L.unpack_pooled_gt(packed, 1, 3, 5)
        np.testing.assert_array_equal(np.asarray(p), np.asarray(packed[..., 0]))
        np.testing.assert_array_equal(np.asarray(k), np.asarray(packed[..., 1]))


class TestIouKeepGate:
    def test_keep_excludes_dont_care_pixels(self):
        # pred and gt agree everywhere except one pixel; keep=0 there
        # must make the IoU perfect (loss 0)
        gt = jnp.zeros((1, 4, 6)).at[0, 1, 1].set(1.0).at[0, 2, 2].set(1.0)
        pred = gt.at[0, 3, 4].set(1.0)     # spurious prediction
        keep = jnp.ones_like(gt).at[0, 3, 4].set(0.0)
        gated = L.iou_mask_loss(pred, gt, keep=keep)
        ungated = L.iou_mask_loss(pred, gt)
        assert float(gated) == pytest.approx(0.0, abs=1e-6)
        assert float(ungated) > 0.1

    def test_keep_none_matches_all_ones(self):
        rng = np.random.RandomState(3)
        pred = jnp.asarray(rng.rand(2, 5, 7).astype(np.float32))
        gt = jnp.asarray((rng.rand(2, 5, 7) > 0.5).astype(np.float32))
        a = L.iou_mask_loss(pred, gt)
        b = L.iou_mask_loss(pred, gt, keep=jnp.ones_like(gt))
        assert float(a) == pytest.approx(float(b), rel=1e-6)


@pytest.mark.e2e
class TestDeviceBatchCache:
    def test_rekeys_on_radius_change(self, tiny_scene_net):
        """The pooled gt planes must be recomputed when the splat radius
        anneals (hierarchy phase switch): r4's 512px quality regression
        traced to the IoU target keeping the coarse phase's dilation."""
        net, dataset, ckpt = tiny_scene_net
        fids = jnp.asarray(np.asarray([0, 1]) + dataset.start_idx, jnp.int32)
        batch = dataset.get_batch([0, 1])
        old_radius = net.cfg.point_radius
        key0 = net._garment_mask_keys()[0] + "__pooled"
        try:
            net.cfg.point_radius = 0.02
            a = np.asarray(net._device_batch(batch, fids)[key0][..., 0])
            net.cfg.point_radius = 0.08   # much wider dilation
            b = np.asarray(net._device_batch(batch, fids)[key0][..., 0])
        finally:
            net.cfg.point_radius = old_radius
        assert b.sum() > a.sum()   # wider dilation covers more pixels

    def test_occlusion_gate_off_by_default(self, tiny_scene_net):
        """Reference parity (OptimGarmentNetwork.py:861-869 has no body
        gate): keep plane is all-ones unless pc_weight.occlusion_gate>0."""
        net, dataset, ckpt = tiny_scene_net
        fids = jnp.asarray(np.asarray([2, 3]) + dataset.start_idx, jnp.int32)
        batch = dataset.get_batch([2, 3])
        key0 = net._garment_mask_keys()[0] + "__pooled"
        dev = net._device_batch(batch, fids)
        assert bool(jnp.all(dev[key0][..., 1] == 1.0))

        class GateConf:
            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, k):
                return getattr(self._inner, k)

            def get_float(self, path, default=None):
                if path == "pc_weight.occlusion_gate":
                    return 1.0
                return self._inner.get_float(path, default)

        old_conf = net.conf
        net.conf = GateConf(old_conf)
        try:
            dev_g = net._device_batch(batch, fids)
            keep = np.asarray(dev_g[key0][..., 1])
            body = np.asarray(dev_g["body"], bool)
            pooled = np.asarray(dev_g[key0][..., 0]) > 0
            # keep==0 exactly where the body occludes outside the
            # dilated garment mask
            np.testing.assert_array_equal(
                keep == 0.0, body & ~pooled)
        finally:
            net.conf = old_conf


@pytest.mark.e2e
class TestPackedPcBranch:
    def test_train_step_packed_ds2(self, tiny_scene_net):
        """Full train step with mask_render_downscale=2: exercises the
        packed (N, H, W, 2) gt_pooled through pc_branch_loss at reduced
        render res — the exact configuration that crashed at r4 HEAD."""
        import jax.random as jrandom

        net, dataset, ckpt = tiny_scene_net
        net.load_checkpoint(ckpt)
        net.mesh = None
        net.set_parallel(None)
        old_ds = net.cfg.mask_render_downscale
        net.cfg.mask_render_downscale = 2
        net._jit_cache = {}
        try:
            ratio = {"sdfRatio": 1.0, "deformerRatio": 0.5, "renderRatio": 1.0}
            loss, info = net.train_step(dataset.get_batch([0, 1]), [0, 1],
                                        ratio, jrandom.PRNGKey(11))
            assert np.isfinite(loss), info
            assert np.isfinite(info["pc_loss_total"])
        finally:
            net.cfg.mask_render_downscale = old_ds
            net._jit_cache = {}

    def test_pc_branch_packed_matches_manual_planes(self, tiny_scene_net):
        """pc_branch_loss(gt_pooled=packed) must equal computing the
        planes by hand: pooled = dilated mask, keep folded into the IoU."""
        net, dataset, ckpt = tiny_scene_net
        net.load_checkpoint(ckpt)
        net.mesh = None
        net.set_parallel(None)
        ratio = {"sdfRatio": 1.0, "deformerRatio": 0.5, "renderRatio": 1.0}
        if net.mesh is None:
            net.marching_cube_update(net._ratio_dict(ratio))
        fids_local = [0, 1]
        fids = jnp.asarray(np.asarray(fids_local) + dataset.start_idx, jnp.int32)
        batch = dataset.get_batch(fids_local)
        dev = net._device_batch(batch, fids)
        gt_masks = [dev[k] for k in net._garment_mask_keys()]
        gt_pooled = [dev[k + "__pooled"] for k in net._garment_mask_keys()]
        gparams = net._global_params()
        gvs = tuple(net.mesh.garment_vs)
        counts = jnp.asarray(net.mesh.garment_n, jnp.int32)

        loss_packed, (info_p, masks_p, _) = net.pc_branch_loss(
            gvs, gparams, fids, gt_masks, ratio, counts, gt_pooled)
        loss_fallback, (info_f, masks_f, _) = net.pc_branch_loss(
            gvs, gparams, fids, gt_masks, ratio, counts, None)
        assert np.isfinite(float(loss_packed))
        np.testing.assert_allclose(np.asarray(masks_p), np.asarray(masks_f),
                                   rtol=1e-5, atol=1e-6)
        # the packed pooled plane is the same dilated mask the fallback
        # computes; any difference in the mask losses comes only from
        # the keep gate (absent in the fallback)
        keep_all_ones = all(
            bool(jnp.all(m[..., 1] == 1.0)) for m in gt_pooled)
        for gname in net.statics.garment_names:
            k = f"{gname}_mask_loss"
            if keep_all_ones:
                assert float(info_p[k]) == pytest.approx(
                    float(info_f[k]), rel=1e-4, abs=1e-6)
            else:
                assert np.isfinite(float(info_p[k]))
