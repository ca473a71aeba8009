"""Multi-device sharding tests on the 8-virtual-CPU-device mesh set up
by conftest. Born-new subsystem (the reference is single-GPU, SURVEY
§2.3): these assert that (a) gradients of a ray-sharded loss equal the
single-device gradients (jit's partitioner inserts the all-reduce), and
(b) the REAL three-branch train_step produces the same losses sharded
over the ('data', 'rays') mesh as on one device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from recmv_tpu.parallel.mesh import (
    make_mesh,
    pad_to_devices,
    ray_sharding,
    scene_shardings,
    shard_rays,
)


class TestMeshBasics:
    def test_make_mesh_axes(self):
        mesh = make_mesh(8, data=2)
        assert mesh.axis_names == ("data", "rays")
        assert mesh.devices.shape == (2, 4)
        mesh1 = make_mesh(8)
        assert mesh1.devices.shape == (1, 8)

    def test_pad_to_devices(self):
        mesh = make_mesh(8)
        x = np.arange(13 * 3, dtype=np.float32).reshape(13, 3)
        xp, n = pad_to_devices(x, mesh)
        assert n == 13 and xp.shape == (16, 3)
        np.testing.assert_array_equal(xp[:13], x)
        assert (xp[13:] == 0).all()

    def test_shard_rays_places_on_all_devices(self):
        mesh = make_mesh(8)
        x = np.zeros((64, 3), np.float32)
        xs = shard_rays(mesh, x)
        assert len(xs.sharding.device_set) == 8
        # each device holds 1/8 of the rows
        shard = xs.addressable_shards[0]
        assert shard.data.shape == (8, 3)


class TestShardedGradParity:
    """Sharded-loss grads == single-device grads (the psum/all-reduce
    that jit inserts for replicated params against sharded rays)."""

    def _loss_and_inputs(self):
        from recmv_tpu.models.sdf import init_sdf_net, sdf_value

        params, static = init_sdf_net(jax.random.PRNGKey(0), multires=6,
                                      bias=0.6, feature_vector_size=256)
        pts = np.random.RandomState(0).randn(512, 3).astype(np.float32) * 0.3

        def loss(p, x):
            return jnp.mean(jnp.abs(sdf_value(p, static, x, 1.0)))

        return loss, params, pts

    def test_loss_and_grads_match_single_device(self):
        loss, params, pts = self._loss_and_inputs()
        vg = jax.jit(jax.value_and_grad(loss))
        l1, g1 = vg(params, jnp.asarray(pts))

        mesh = make_mesh(8, data=2)
        l2, g2 = vg(
            jax.device_put(params, NamedSharding(mesh, P())),
            jax.device_put(pts, ray_sharding(mesh)),
        )
        assert np.allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)

    def test_grad_output_replicated(self):
        loss, params, pts = self._loss_and_inputs()
        mesh = make_mesh(8)
        g = jax.jit(jax.grad(loss))(
            jax.device_put(params, NamedSharding(mesh, P())),
            jax.device_put(pts, ray_sharding(mesh)),
        )
        leaf = jax.tree_util.tree_leaves(g)[0]
        # the all-reduced grad must be fully replicated over the mesh
        assert leaf.sharding.is_fully_replicated


@pytest.mark.e2e
class TestTrainStepParity:
    """The full train_step (remesh + curve/pc/ray/main/update) on the
    tiny synthetic scene: sharded == single-device."""

    def test_full_step_parity(self, tiny_scene_net):
        net, dataset, ckpt = tiny_scene_net
        batch = dataset.get_batch([0, 1])
        ratio = {"sdfRatio": 1.0, "deformerRatio": 0.5, "renderRatio": 1.0}
        key = jax.random.PRNGKey(7)

        def fresh():
            net.load_checkpoint(ckpt)
            net.mesh = None            # force deterministic remesh
            net.opt_times = 0.0
            net.info = {}

        fresh()
        net.set_parallel(None)
        loss1, info1 = net.train_step(batch, [0, 1], ratio, key)
        info1 = dict(info1)

        fresh()
        net.set_parallel(make_mesh(8, data=2))
        loss2, info2 = net.train_step(batch, [0, 1], ratio, key)
        net.set_parallel(None)

        assert np.isfinite(loss1) and np.isfinite(loss2)
        # fl and pc branches are deterministic given inputs — GSPMD must
        # reproduce them to reduction-order noise (measured ≤ 2e-7 rel).
        for k in ("fl_loss_total", "pc_loss_total", "tube_project_loss",
                  "tube_mask_loss"):
            assert abs(info1[k] - info2[k]) <= 1e-4 * max(abs(info1[k]), 1.0), (
                k, info1[k], info2[k])
        # The ray branch is convergence-gated: the surface solver's
        # |sdf|+angle acceptance sits on an f32 boundary for marginal
        # rays, so sharded reduction order can flip a ray in or out
        # (measured: rayConv 20 vs 19 → 0.4% m_loss shift). Allow a
        # few flipped rays, not a broken all-reduce.
        for k, v in info1.items():
            if k.endswith("_rayConv"):
                assert abs(info2[k] - v) <= max(2, 0.1 * v), (k, v, info2[k])
            if k.endswith("_rayBudget"):
                assert info2[k] == v
        assert abs(loss1 - loss2) <= 2e-2 * max(abs(loss1), 1.0), (loss1, loss2)
