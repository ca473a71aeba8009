"""Pallas TPU kernel: per-tile mesh z-buffer rasterization (K=1).

Streams each 32x32 tile's binned candidate faces sequentially, testing
all 1024 pixels per face on the VPU — edge functions from 12
premultiplied per-face coefficients (SMEM scalars), perspective-correct
depth, running argmin-z with the winner's face id and perspective
barycentrics. Forward-only: every consumer of mesh fragments
(z-buffer curve visibility, surface-seed lookup, registration scans)
is under stop_gradient, so no backward kernel is needed.

Coefficient algebra (matches ops/rasterizer.rasterize_mesh exactly):
w_i(p) = a_i·py + b_i·px + c_i (pre-divided by the signed double area),
inside = all w_i > 0, iz_i = w_i / v_iz, z = 1/Σ iz_i, perspective
barycentric b_i = iz_i · z. Invalid/degenerate candidates have all-zero
coefficients, which fails the strict inside test.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BIG = 3.0e38


def _mesh_kernel(prm_ref, fid_ref, cnt_ref, px_ref, py_ref, zb_ref, fo_ref,
                 bc_ref, *, cap):
    px = px_ref[0]          # (8, 128)
    py = py_ref[0]

    def body(k, carry):
        zbest, fbest, b0, b1, b2 = carry
        a0 = prm_ref[0, 0, k]
        bb0 = prm_ref[0, 1, k]
        c0 = prm_ref[0, 2, k]
        a1 = prm_ref[0, 3, k]
        bb1 = prm_ref[0, 4, k]
        c1 = prm_ref[0, 5, k]
        a2 = prm_ref[0, 6, k]
        bb2 = prm_ref[0, 7, k]
        c2 = prm_ref[0, 8, k]
        q0 = prm_ref[0, 9, k]
        q1 = prm_ref[0, 10, k]
        q2 = prm_ref[0, 11, k]
        fid = fid_ref[0, 0, k]
        w0 = a0 * py + bb0 * px + c0
        w1 = a1 * py + bb1 * px + c1
        w2 = a2 * py + bb2 * px + c2
        inside = (w0 > 0.0) & (w1 > 0.0) & (w2 > 0.0)
        iz0 = w0 * q0
        iz1 = w1 * q1
        iz2 = w2 * q2
        s = jnp.maximum(iz0 + iz1 + iz2, 1e-12)
        zp = 1.0 / s
        zsel = jnp.where(inside, zp, BIG)
        better = zsel < zbest
        zbest = jnp.where(better, zsel, zbest)
        fbest = jnp.where(better, fid, fbest)
        b0 = jnp.where(better, iz0 * zp, b0)
        b1 = jnp.where(better, iz1 * zp, b1)
        b2 = jnp.where(better, iz2 * zp, b2)
        return zbest, fbest, b0, b1, b2

    init = (jnp.full((8, LANES), BIG, jnp.float32),
            jnp.full((8, LANES), -1, jnp.int32),
            jnp.full((8, LANES), -1.0, jnp.float32),
            jnp.full((8, LANES), -1.0, jnp.float32),
            jnp.full((8, LANES), -1.0, jnp.float32))
    # dynamic trip count: only this tile's binned candidates are swept
    # (empty/sparse tiles — most of a 1080² frame — cost nothing)
    zbest, fbest, b0, b1, b2 = jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body, init)
    got = zbest < BIG
    zb_ref[0] = jnp.where(got, zbest, -1.0)
    fo_ref[0] = fbest
    bc_ref[0, 0] = b0
    bc_ref[0, 1] = b1
    bc_ref[0, 2] = b2


def mesh_tiles(prm, fid, px, py, cnt, interpret=False):
    """prm (T, 12, cap) f32, fid (T, 1, cap) i32, px/py (T, 8, 128),
    cnt (T,) i32 per-tile candidate counts →
    (zbuf (T, 8, 128), face (T, 8, 128) i32, bary (T, 3, 8, 128))."""
    T, _, cap = prm.shape
    sm = pltpu.SMEM
    v = pltpu.VMEM
    return pl.pallas_call(
        partial(_mesh_kernel, cap=cap),
        out_shape=(
            jax.ShapeDtypeStruct((T, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((T, 8, LANES), jnp.int32),
            jax.ShapeDtypeStruct((T, 3, 8, LANES), jnp.float32),
        ),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 12, cap), lambda t: (t, 0, 0), memory_space=sm),
            pl.BlockSpec((1, 1, cap), lambda t: (t, 0, 0), memory_space=sm),
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0), memory_space=sm),
            pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0), memory_space=v),
            pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0), memory_space=v),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0), memory_space=v),
            pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0), memory_space=v),
            pl.BlockSpec((1, 3, 8, LANES), lambda t: (t, 0, 0, 0),
                         memory_space=v),
        ),
        interpret=interpret,
    )(prm, fid, cnt.astype(jnp.int32).reshape(T, 1, 1), px, py)
