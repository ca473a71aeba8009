"""Pallas TPU kernel: per-tile point alpha-compositing.

The hot inner loop of the garment mask renderer (``composite_points``,
ops/rasterizer.py): for each 32x32 pixel tile, over-composite its z-
sorted candidate points front to back. The XLA subtile formulation
spends its time in sorts and gathers; this kernel streams the candidate
list sequentially — each candidate is ~8 VPU ops on the tile's (8, 128)
pixel block — with zero per-pixel sorting and zero K-buffers.

Layout (prepared by the XLA prologue in ``composite_points``):
- ``cx, cy, val``: (T, 1, cap) f32 in SMEM — candidate pixel coords +
  validity, z-sorted front-to-back per tile (scalar reads at dynamic
  candidate index — Mosaic forbids unaligned dynamic *vector* loads),
- ``feat``: (T, C, cap) f32 in SMEM — per-candidate feature channels,
- ``px, py``: (T, 8, 128) f32 — the tile's pixel centers (32x32
  flattened to the native f32 register tile),
- output: (T, C, 8, 128) composited features.

The backward pass is a second kernel (custom_vjp): a forward sweep
stores per-candidate weights and transmittances in VMEM scratch
(2 x cap x 4 KB ≈ 6 MB), then a reverse sweep accumulates the suffix
sums that give ∂out/∂w_k analytically — no autodiff through the
sequential chain, no HBM residuals. Per-candidate gradient scalars are
masked-inserted into 128-lane registers and stored at lane-aligned
offsets. Gradients flow to cx/cy/feat (val/px/py/z-order are gates,
like the fragment path).

Semantics match ``alpha_composite`` exactly: w = clip(1 − d²/r², 0, 1),
out = Σ_k w_k·f_k·Π_{j<k}(1 − w_j + 1e-10).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-10
LANES = 128


UNROLL = 4


def _fwd_kernel(inv_ref, cx_ref, cy_ref, val_ref, feat_ref, cnt_ref, px_ref,
                py_ref, out_ref, *, cap, C):
    inv_r2 = inv_ref[0, 0]
    px = px_ref[0]          # (8, 128)
    py = py_ref[0]

    # UNROLL candidates per trip: the per-candidate loop body is ~9 VPU
    # ops on one (8, 128) register, so SMEM scalar loads + loop
    # bookkeeping dominated the measured cost (~240 ns/iter vs ~85 ns of
    # vector work, r3 probe). The w_u computations are independent
    # (ILP); only the T chain is sequential. Candidates beyond cnt have
    # val == 0 (prologue zero-fill), so the rounded-up tail is a no-op.
    def body(b, carry):
        T = carry[0]
        accs = list(carry[1:])
        k0 = b * UNROLL
        ws = []
        for u in range(UNROLL):
            k = k0 + u
            d2 = (px - cx_ref[0, 0, k]) ** 2 + (py - cy_ref[0, 0, k]) ** 2
            ws.append(jnp.clip(1.0 - d2 * inv_r2, 0.0, 1.0)
                      * val_ref[0, 0, k])
        for u in range(UNROLL):
            wT = ws[u] * T
            for c in range(C):
                accs[c] = accs[c] + wT * feat_ref[0, c, k0 + u]
            T = T * (1.0 - ws[u] + EPS)
        return (T,) + tuple(accs)

    init = (jnp.ones((8, LANES), jnp.float32),) + tuple(
        jnp.zeros((8, LANES), jnp.float32) for _ in range(C))
    # dynamic trip count: sweep only this tile's binned candidates —
    # empty/sparse tiles (most of a 1080² frame) cost nothing
    nb = (cnt_ref[0, 0, 0] + (UNROLL - 1)) // UNROLL
    out = jax.lax.fori_loop(0, nb, body, init)
    for c in range(C):
        out_ref[0, c] = out[1 + c]


def _bwd_kernel(inv_ref, cx_ref, cy_ref, val_ref, feat_ref, cnt_ref, px_ref,
                py_ref, g_ref, dcx_ref, dcy_ref, dfeat_ref, w_scr, t_scr,
                *, cap, C, need_dfeat=True):
    inv_r2 = inv_ref[0, 0]
    px = px_ref[0]
    py = py_ref[0]
    g = [g_ref[0, c] for c in range(C)]
    n_blocks = cap // LANES
    # only ceil(cnt/128) blocks hold real candidates; the rest get the
    # zero-init below and are skipped by both sweeps
    nb = (cnt_ref[0, 0, 0] + (LANES - 1)) // LANES

    # all gradient outputs are whole-block vector stores — zero-init every
    # block so the skipped tail is defined (r2-advice NaN regression)
    def zinit(ob, _):
        off = pl.multiple_of(ob * LANES, LANES)
        zero = jnp.zeros((LANES,), jnp.float32)
        dcx_ref[0, 0, pl.ds(off, LANES)] = zero
        dcy_ref[0, 0, pl.ds(off, LANES)] = zero
        for c in range(C):
            dfeat_ref[0, c, pl.ds(off, LANES)] = zero
        return 0

    jax.lax.fori_loop(0, n_blocks, zinit, 0)

    # forward sweep: store w_k and the prefix transmittance T_k
    # (UNROLL candidates per trip — same rationale as _fwd_kernel; the
    # block count nb is already rounded to whole 128-lane blocks, so the
    # unrolled tail stays in bounds and its val==0 slots are no-ops)
    def fsweep(b, T):
        k0 = b * UNROLL
        ws = []
        for u in range(UNROLL):
            k = k0 + u
            d2 = (px - cx_ref[0, 0, k]) ** 2 + (py - cy_ref[0, 0, k]) ** 2
            ws.append(jnp.clip(1.0 - d2 * inv_r2, 0.0, 1.0)
                      * val_ref[0, 0, k])
        for u in range(UNROLL):
            w_scr[pl.ds(k0 + u, 1)] = ws[u][None]
            t_scr[pl.ds(k0 + u, 1)] = T[None]
            T = T * (1.0 - ws[u] + EPS)
        return T

    jax.lax.fori_loop(0, nb * LANES // UNROLL, fsweep,
                      jnp.ones((8, LANES), jnp.float32))

    # reverse sweep over 128-candidate blocks: S_c = Σ_{m>k} w_m T_m f_mc,
    # ∂out_c/∂w_k = T_k f_kc − S_c/(1 − w_k + eps). Scalars land in
    # 128-lane registers via masked insert, stored lane-aligned.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def rsweep(ob, S):
        base = (nb - 1 - ob) * LANES

        def inner(j, carry):
            S = carry[:C]
            dcxv, dcyv = carry[C], carry[C + 1]
            dfv = carry[C + 2:]
            pos = LANES - 1 - j          # descending within the block
            k = base + pos
            w = w_scr[pl.ds(k, 1)][0]
            T = t_scr[pl.ds(k, 1)][0]
            wT = w * T
            fk = [feat_ref[0, c, k] for c in range(C)]
            dLdw = jnp.zeros((8, LANES), jnp.float32)
            for c in range(C):
                dLdw = dLdw + g[c] * (T * fk[c] - S[c] / (1.0 - w + EPS))
            cx = cx_ref[0, 0, k]
            cy = cy_ref[0, 0, k]
            va = val_ref[0, 0, k]
            d2 = (px - cx) ** 2 + (py - cy) ** 2
            raw = 1.0 - d2 * inv_r2
            active = ((raw > 0.0) & (raw < 1.0)).astype(jnp.float32) * va
            dd2 = dLdw * (-inv_r2) * active
            m = lane == pos
            dcxv = jnp.where(m, jnp.sum(dd2 * (-2.0) * (px - cx)), dcxv)
            dcyv = jnp.where(m, jnp.sum(dd2 * (-2.0) * (py - cy)), dcyv)
            if need_dfeat:
                dfv = tuple(jnp.where(m, jnp.sum(g[c] * wT), dfv[c])
                            for c in range(C))
            S = tuple(S[c] + wT * fk[c] for c in range(C))
            return S + (dcxv, dcyv) + dfv

        zeros = jnp.zeros((1, LANES), jnp.float32)
        carry = tuple(S) + (zeros, zeros) + tuple(zeros for _ in range(C))
        carry = jax.lax.fori_loop(0, LANES, inner, carry)
        S = carry[:C]
        off = pl.multiple_of(base, LANES)
        dcx_ref[0, 0, pl.ds(off, LANES)] = carry[C][0]
        dcy_ref[0, 0, pl.ds(off, LANES)] = carry[C + 1][0]
        for c in range(C):
            dfeat_ref[0, c, pl.ds(off, LANES)] = carry[C + 2 + c][0]
        return S

    S0 = tuple(jnp.zeros((8, LANES), jnp.float32) for _ in range(C))
    jax.lax.fori_loop(0, nb, rsweep, S0)


def _tile_specs(cap, C):
    v = pltpu.VMEM
    sm = pltpu.SMEM
    return dict(
        scal=pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=sm),
        cand=pl.BlockSpec((1, 1, cap), lambda t: (t, 0, 0), memory_space=sm),
        feat=pl.BlockSpec((1, C, cap), lambda t: (t, 0, 0), memory_space=sm),
        cnt=pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0), memory_space=sm),
        pix=pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0), memory_space=v),
        out=pl.BlockSpec((1, C, 8, LANES), lambda t: (t, 0, 0, 0),
                         memory_space=v),
        dcand=pl.BlockSpec((1, 1, cap), lambda t: (t, 0, 0), memory_space=v),
        dfeat=pl.BlockSpec((1, C, cap), lambda t: (t, 0, 0), memory_space=v),
    )


@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def composite_tiles(cx, cy, val, feat, px, py, inv_r2, cnt, interpret=False,
                    need_dfeat=True):
    """(T, cap) candidates + (T, 8, 128) pixels → (T, C, 8, 128).
    inv_r2: () traced scalar = ndc_scale²/radius². cnt: (T,) i32 per-tile
    candidate counts (dynamic kernel loop bounds).

    ``need_dfeat=False`` skips the per-candidate feature-gradient sums in
    the backward kernel (~1/3 of its inner-loop work) — pass it when
    ``feat`` is a constant (the mask renderer's section one-hots)."""
    return _composite_fwd_impl(cx, cy, val, feat, px, py, inv_r2, cnt,
                               interpret)


def _composite_fwd_impl(cx, cy, val, feat, px, py, inv_r2, cnt, interpret):
    T, cap = cx.shape
    C = feat.shape[1]
    s = _tile_specs(cap, C)
    inv = jnp.asarray(inv_r2, jnp.float32).reshape(1, 1)
    cx3, cy3, val3 = (a.reshape(T, 1, cap) for a in (cx, cy, val))
    return pl.pallas_call(
        partial(_fwd_kernel, cap=cap, C=C),
        out_shape=jax.ShapeDtypeStruct((T, C, 8, LANES), jnp.float32),
        grid=(T,),
        in_specs=[s["scal"], s["cand"], s["cand"], s["cand"], s["feat"],
                  s["cnt"], s["pix"], s["pix"]],
        out_specs=s["out"],
        interpret=interpret,
    )(inv, cx3, cy3, val3, feat, cnt.astype(jnp.int32).reshape(T, 1, 1), px, py)


def _composite_fwd(cx, cy, val, feat, px, py, inv_r2, cnt, interpret,
                   need_dfeat):
    out = _composite_fwd_impl(cx, cy, val, feat, px, py, inv_r2, cnt,
                              interpret)
    return out, (cx, cy, val, feat, px, py, inv_r2, cnt)


def _composite_bwd(interpret, need_dfeat, res, g):
    cx, cy, val, feat, px, py, inv_r2, cnt = res
    T, cap = cx.shape
    C = feat.shape[1]
    s = _tile_specs(cap, C)
    inv = jnp.asarray(inv_r2, jnp.float32).reshape(1, 1)
    cx3, cy3, val3 = (a.reshape(T, 1, cap) for a in (cx, cy, val))
    dcx, dcy, dfeat = pl.pallas_call(
        partial(_bwd_kernel, cap=cap, C=C, need_dfeat=need_dfeat),
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, cap), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, cap), jnp.float32),
            jax.ShapeDtypeStruct((T, C, cap), jnp.float32),
        ),
        grid=(T,),
        in_specs=[s["scal"], s["cand"], s["cand"], s["cand"], s["feat"],
                  s["cnt"], s["pix"], s["pix"], s["out"]],
        out_specs=(s["dcand"], s["dcand"], s["dfeat"]),
        scratch_shapes=[
            pltpu.VMEM((cap, 8, LANES), jnp.float32),
            pltpu.VMEM((cap, 8, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(inv, cx3, cy3, val3, feat, cnt.astype(jnp.int32).reshape(T, 1, 1), px, py, g)
    if not need_dfeat:
        dfeat = jnp.zeros_like(feat)
    return (dcx.reshape(T, cap), dcy.reshape(T, cap), jnp.zeros_like(val),
            dfeat, jnp.zeros_like(px), jnp.zeros_like(py), jnp.zeros(()),
            jnp.zeros_like(cnt))


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
