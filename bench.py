#!/usr/bin/env python
"""Benchmark: REC-MV hot-loop throughput + end-to-end step metrics.

Headline metric — amortized sec/step of the REAL production training
step (1080², 2048 rays, fine pyramid) from the committed
``bench_fullstep.json`` artifact measured on the actual chip, vs the
~1.5 s/step GTX-3090 estimate (vs_baseline > 1 = faster than the
reference hardware). Falls back to the hot-loop rays/s when no fullstep
artifact exists.

Secondary — rays/sec/chip on the per-ray hot path (SURVEY §3.3):
the 20-iteration surface root-find (SDF MLP + full deformer per
iteration, reference ``utils/FindSurfacePs.py:273``), SDF gradient,
Jacobian ray pullback, IDR render MLP, and the backward pass — jitted,
full-size MLPs (8x512 SDF), measured warm on one chip.

Extra metrics embedded in the same JSON line:
- ``mfu_pct``: measured FLOP/s of the hot step (XLA cost analysis) over
  the chip's peak (bf16 peak for TPU v5e = 197 TFLOP/s; the hot loop
  runs f32 matmuls, so this is a conservative lower bound).
- ``fullstep``: production-scale end-to-end step numbers (1080x1080,
  2048 rays, (321,417,225) pyramid) recorded by
  ``tools/bench_fullstep.py`` on the real chip — sec/step warm,
  first-compile wall, remesh time.
- ``quality``: Chamfer-L2 vs the synthetic scene's gt_meshes recorded by
  ``tools/bench_quality.py`` (full loop: init → train → extract).

vs_baseline PROVENANCE: the reference repo publishes no numbers
(BASELINE.md); ``baseline_rays_per_sec`` is an ESTIMATE of the
reference's effective ray throughput from its configuration (2048
rays/step at the ~1.5 s/step a GTX-3090 sustains on this family of
per-scene optimizers), NOT a measurement — no CUDA GPU exists in this
environment to measure the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os.path as osp
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 1365.0  # estimate — see module docstring
TPU_V5E_BF16_PEAK = 197e12
REPO = osp.dirname(osp.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp

    import recmv_tpu  # noqa: F401
    from recmv_tpu.core.surface_ps import optimize_surface_points
    from recmv_tpu.models.render_net import render_net_apply
    from recmv_tpu.models.sdf import sdf_apply, sdf_value
    from recmv_tpu.models.skinner import skinner_apply
    from recmv_tpu.models.translator import translator_apply
    from recmv_tpu.models.deformer import cardinal_rays_from_jac, deformer_jacobian
    from __graft_entry__ import _build_tiny_model

    params, (sdf_static, tr_static, rn_static) = _build_tiny_model()

    R = 8192  # rays per step (fine-phase scale: 6144 + margin)
    N_FRAMES = 2
    rng = np.random.RandomState(0)

    cam = jnp.asarray([0.0, 0.2, 2.6], jnp.float32)
    targets = rng.randn(R, 3).astype(np.float32) * 0.2
    rays = targets - np.asarray(cam)
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    seeds = targets / np.linalg.norm(targets, axis=1, keepdims=True) * 0.6
    seeds += rng.randn(R, 3).astype(np.float32) * 2e-3
    cond = jnp.asarray(rng.randn(N_FRAMES, 128).astype(np.float32) * 0.01)
    poses = jnp.zeros((N_FRAMES, 24, 3))
    trans = jnp.zeros((N_FRAMES, 3))
    batch_inds = jnp.asarray(rng.randint(0, N_FRAMES, R), jnp.int32)
    rays = jnp.asarray(rays)
    seeds = jnp.asarray(seeds)
    gt_rgb = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 2 - 1)

    def deform(prm, pts):
        c = cond[batch_inds]
        off, _ = translator_apply(prm["translator"], tr_static, pts, c, 1.0)
        return skinner_apply(prm["skinner"], off, poses, trans, batch_inds=batch_inds)

    @jax.jit
    def hot_step(prm):
        sdf_fn = lambda p: sdf_value(prm["sdf"], sdf_static, p, 1.0)
        dfn = lambda p: deform(prm, p)
        pts, conv = optimize_surface_points(sdf_fn, dfn, cam, rays, seeds,
                                            jnp.ones(R, bool), times=20)

        def loss_fn(prm):
            sdf, feat = sdf_apply(prm["sdf"], sdf_static, pts, 1.0)
            nx = jax.grad(lambda p: jnp.sum(sdf_value(prm["sdf"], sdf_static, p, 1.0)))(pts)
            nxn = nx / jnp.clip(jnp.linalg.norm(nx, -1, keepdims=True), 1e-9, None)
            jac = deformer_jacobian(lambda p: deform(prm, p), pts)
            crays, _ = cardinal_rays_from_jac(jac, rays)
            rgb = render_net_apply(prm["render"], rn_static, pts, nxn, crays, feat, 1.0)
            color = jnp.mean(jnp.abs(rgb - gt_rgb))
            eik = jnp.mean((jnp.linalg.norm(nx, -1) - 1.0) ** 2)
            return color + 0.1 * eik + 3.0 * jnp.mean(jnp.abs(sdf))

        loss, grads = jax.value_and_grad(loss_fn)(prm)
        return loss, jax.tree_util.tree_map(lambda g: jnp.sum(jnp.abs(g)), grads)

    # warmup/compile (measured: first-call latency)
    t0 = time.perf_counter()
    compiled = hot_step.lower(params).compile()
    compile_s = time.perf_counter() - t0
    jax.block_until_ready(compiled(params))

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = compiled(params)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    rays_per_sec = R / dt

    # MFU from XLA's own FLOP count of the compiled hot step
    mfu = None
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = flops / dt / TPU_V5E_BF16_PEAK * 100.0
    except Exception:
        pass

    extra = {
        "hot_step_ms": round(dt * 1000, 2),
        "compile_s": round(compile_s, 1),
        "baseline_provenance": (
            "ESTIMATE from reference config (2048 rays/step at ~1.5 s/step "
            "GTX-3090, SelfRecon/IDR family); reference publishes no numbers "
            "and no CUDA GPU is available here"),
    }
    if flops:
        extra["hot_step_gflops"] = round(flops / 1e9, 1)
    if mfu is not None:
        extra["mfu_pct_vs_bf16_peak"] = round(mfu, 2)
    for name in ("bench_fullstep.json", "bench_quality.json",
                 "bench_quality_512.json", "bench_quality_512_gateon.json",
                 "bench_quality_two.json",
                 "bench_quality_skirt.json", "bench_largepose.json",
                 "bench_animation.json"):
        p = osp.join(REPO, name)
        if osp.isfile(p):
            with open(p) as f:
                extra[name.replace("bench_", "").replace(".json", "")] = json.load(f)

    # BASELINE.md's sec/frame metric, projected from the measured
    # amortized step time and the female-3-casual schedule (200 epochs:
    # coarse 0-8 @batch3, medium 8-12 @batch2, fine 12-200 @batch1) on a
    # 440-frame PeopleSnapshot sequence.
    fs = extra.get("fullstep")
    if fs and "sec_per_step_amortized" in fs:
        spp = fs["sec_per_step_amortized"]
        frames = 440
        steps = 8 * frames / 3 + 4 * frames / 2 + 188 * frames / 1
        extra["projected_full_sequence"] = {
            "frames": frames, "total_steps": int(steps),
            "sec_per_frame": round(spp * steps / frames, 1),
            "wall_clock_h": round(spp * steps / 3600.0, 1),
            "provenance": "projection: measured amortized sec/step x "
                          "reference female-3-casual schedule",
        }

    extra["rays_per_sec_per_chip"] = round(rays_per_sec, 1)
    extra["rays_vs_baseline_estimate"] = round(
        rays_per_sec / BASELINE_RAYS_PER_SEC, 3)

    # Headline: the REAL production step (bench_fullstep artifact on the
    # actual chip) against the ~1.5 s/step a GTX-3090 sustains at the
    # same reference config (ESTIMATE — the reference publishes no
    # numbers and no CUDA GPU exists here). vs_baseline > 1 = faster.
    if fs and "sec_per_step_amortized" in fs:
        spp = fs["sec_per_step_amortized"]
        print(json.dumps({
            "metric": "sec_per_step_amortized_1080p_fine",
            "value": spp,
            "unit": "s/step",
            "vs_baseline": round(1.5 / spp, 3),
            "extra": extra,
        }))
    else:
        print(json.dumps({
            "metric": "rays_per_sec_per_chip",
            "value": round(rays_per_sec, 1),
            "unit": "rays/s",
            "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            "extra": extra,
        }))


if __name__ == "__main__":
    main()
