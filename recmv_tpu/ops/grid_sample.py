"""Trilinear 3D grid sampling and fused 2x upsample + boundary detection.

TPU-native replacements for the reference CUDA extensions:

- ``grid_sample_3d`` replaces ``MCAcc/cuda/GridSamplerMineKernel.cu``
  (forward/backward/backward-backward, ~1500 LoC of CUDA). The reference
  needed hand-written double-backward because skinning weights are
  grid-sampled inside a graph that is itself differentiated (deformer
  Jacobians, ``model/Deformer.py:421``). In JAX the sampler is a pure
  gather+lerp expression, so arbitrary-order derivatives come from the AD
  system; XLA lowers the 8 corner gathers onto the TPU gather unit and
  fuses the lerp arithmetic.

- ``interp2x_boundary3d`` replaces ``MCAcc/cuda/interp2x_boundary3d.cpp``:
  2x trilinear upsampling of an occupancy volume that simultaneously
  returns an ``is_boundary`` mask. The shipped reference configs use the
  non-CUDA path (``model/network.py:303``: F.interpolate with
  align_corners=True + interpolated sign test), which is what we match.

Conventions follow torch.nn.functional.grid_sample: sample locations in
[-1, 1], ordered (x, y, z) indexing (W, H, D); zero padding outside;
``align_corners`` selectable (False on the main path, matching
``model/Deformer.py:253``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_3d(vol: jnp.ndarray, pts: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """Sample a volume at continuous normalized locations.

    vol: (C, D, H, W) feature volume.
    pts: (N, 3) locations in [-1, 1], ordered (x, y, z) → (W, H, D) axes.
    Returns (N, C). Zero padding outside the volume.
    """
    C, D, H, W = vol.shape
    x = _unnormalize(pts[:, 0], W, align_corners)
    y = _unnormalize(pts[:, 1], H, align_corners)
    z = _unnormalize(pts[:, 2], D, align_corners)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1

    wx1 = x - x0
    wy1 = y - y0
    wz1 = z - z0
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1

    def gather(zc, yc, xc):
        valid = (
            (xc >= 0) & (xc < W) & (yc >= 0) & (yc < H) & (zc >= 0) & (zc < D)
        )
        xs = jnp.clip(xc, 0, W - 1)
        ys = jnp.clip(yc, 0, H - 1)
        zs = jnp.clip(zc, 0, D - 1)
        vals = vol[:, zs, ys, xs]  # (C, N)
        return jnp.where(valid[None, :], vals, 0.0)

    out = (
        gather(z0, y0, x0) * (wz0 * wy0 * wx0)[None]
        + gather(z0, y0, x1) * (wz0 * wy0 * wx1)[None]
        + gather(z0, y1, x0) * (wz0 * wy1 * wx0)[None]
        + gather(z0, y1, x1) * (wz0 * wy1 * wx1)[None]
        + gather(z1, y0, x0) * (wz1 * wy0 * wx0)[None]
        + gather(z1, y0, x1) * (wz1 * wy0 * wx1)[None]
        + gather(z1, y1, x0) * (wz1 * wy1 * wx0)[None]
        + gather(z1, y1, x1) * (wz1 * wy1 * wx1)[None]
    )
    return out.T  # (N, C)


def grid_sample_3d_cl(vol: jnp.ndarray, pts: jnp.ndarray,
                      align_corners: bool = False) -> jnp.ndarray:
    """Channel-LAST trilinear sampler: vol (D, H, W, C), pts (N, 3) in
    [-1, 1] ordered (x, y, z). Returns (N, C); zero padding outside.

    Same math as :func:`grid_sample_3d`, different gather layout: each
    corner read pulls one contiguous C-row per point instead of C
    strided single elements. With the 24-channel LBS weight field the
    channel-first gather touches 24 separate 512-byte HBM tiles per
    corner (~13 GB per 131k-point pass, the dominant skinner cost on
    TPU); channel-last makes it one row per corner (~25x less traffic).
    """
    D, H, W, C = vol.shape
    x = _unnormalize(pts[:, 0], W, align_corners)
    y = _unnormalize(pts[:, 1], H, align_corners)
    z = _unnormalize(pts[:, 2], D, align_corners)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1

    wx1 = x - x0
    wy1 = y - y0
    wz1 = z - z0
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1

    def gather(zc, yc, xc):
        valid = (
            (xc >= 0) & (xc < W) & (yc >= 0) & (yc < H) & (zc >= 0) & (zc < D)
        )
        xs = jnp.clip(xc, 0, W - 1)
        ys = jnp.clip(yc, 0, H - 1)
        zs = jnp.clip(zc, 0, D - 1)
        vals = vol[zs, ys, xs]  # (N, C) — contiguous C-rows
        return jnp.where(valid[:, None], vals, 0.0)

    out = (
        gather(z0, y0, x0) * (wz0 * wy0 * wx0)[:, None]
        + gather(z0, y0, x1) * (wz0 * wy0 * wx1)[:, None]
        + gather(z0, y1, x0) * (wz0 * wy1 * wx0)[:, None]
        + gather(z0, y1, x1) * (wz0 * wy1 * wx1)[:, None]
        + gather(z1, y0, x0) * (wz1 * wy0 * wx0)[:, None]
        + gather(z1, y0, x1) * (wz1 * wy0 * wx1)[:, None]
        + gather(z1, y1, x0) * (wz1 * wy1 * wx0)[:, None]
        + gather(z1, y1, x1) * (wz1 * wy1 * wx1)[:, None]
    )
    return out


def grid_sample_2d(img: jnp.ndarray, pts: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sample an image at normalized locations.

    img: (C, H, W); pts: (N, 2) in [-1,1] ordered (x, y). Returns (N, C);
    zero padding outside. (2D analog used by mask max-pool sampling.)
    """
    C, H, W = img.shape
    x = _unnormalize(pts[:, 0], W, align_corners)
    y = _unnormalize(pts[:, 1], H, align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx1, wy1 = x - x0, y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    def gather(yc, xc):
        valid = (xc >= 0) & (xc < W) & (yc >= 0) & (yc < H)
        xs = jnp.clip(xc, 0, W - 1)
        ys = jnp.clip(yc, 0, H - 1)
        return jnp.where(valid[None, :], img[:, ys, xs], 0.0)

    out = (
        gather(y0, x0) * (wy0 * wx0)[None]
        + gather(y0, x1) * (wy0 * wx1)[None]
        + gather(y1, x0) * (wy1 * wx0)[None]
        + gather(y1, x1) * (wy1 * wx1)[None]
    )
    return out.T


def resize_trilinear(vol: jnp.ndarray, out_shape, align_corners: bool = True) -> jnp.ndarray:
    """Trilinear resize of (..., D, H, W) to out_shape=(D2, H2, W2).

    Matches torch F.interpolate(mode='trilinear'). With align_corners=True
    (the Seg3dLossless path) corner voxels map to corner voxels, so a 2x
    upsample of an odd-resolution grid reproduces parent values exactly at
    even output indices — the property the 'lossless' evaluator relies on.
    """
    D2, H2, W2 = out_shape
    *lead, D, H, W = vol.shape

    def axis_coords(n_out, n_in):
        i = jnp.arange(n_out, dtype=jnp.float32)
        if align_corners:
            if n_out == 1:
                return jnp.zeros((1,), jnp.float32)
            return i * (n_in - 1) / (n_out - 1)
        scale = n_in / n_out
        return jnp.clip((i + 0.5) * scale - 0.5, 0.0, n_in - 1)

    zc = axis_coords(D2, D)
    yc = axis_coords(H2, H)
    xc = axis_coords(W2, W)

    def lerp_axis(arr, coords, axis, n_in):
        i0 = jnp.floor(coords).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        w1 = coords - i0
        a0 = jnp.take(arr, i0, axis=axis)
        a1 = jnp.take(arr, i1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = -1
        w1 = w1.reshape(shape)
        return a0 * (1.0 - w1) + a1 * w1

    out = lerp_axis(vol, zc, vol.ndim - 3, D)
    out = lerp_axis(out, yc, vol.ndim - 2, H)
    out = lerp_axis(out, xc, vol.ndim - 1, W)
    return out


def interp2x_boundary3d(occ: jnp.ndarray, out_shape, balance_value: float = 0.0):
    """Fused 2x trilinear upsample + boundary-cell detection.

    occ: (D, H, W) signed field (SDF or occupancy). Returns
    (occ_up, is_boundary) at out_shape, where is_boundary marks voxels
    whose interpolated *sign indicator* is fractional — i.e. cells whose
    8 parents straddle ``balance_value``. Equivalent to the reference's
    `valid = interp((occ>bal).float()); boundary = (valid>0)&(valid<1)`
    (``MCAcc/seg3d_lossless.py:271-282``); XLA fuses both interpolations
    into one pass over the volume.
    """
    occ_up = resize_trilinear(occ, out_shape, align_corners=True)
    sign = (occ > balance_value).astype(jnp.float32)
    valid = resize_trilinear(sign, out_shape, align_corners=True)
    is_boundary = (valid > 0.0) & (valid < 1.0)
    return occ_up, is_boundary


def max_pool_3d_same(mask: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """Boolean 3D dilation with a cubic kernel, SAME padding — replaces
    the reference's SmoothConv3D-then-threshold (`MCAcc/utils.py:133`)."""
    pad = kernel // 2
    return jax.lax.reduce_window(
        mask,
        False,
        jax.lax.bitwise_or,
        window_dimensions=(kernel, kernel, kernel),
        window_strides=(1, 1, 1),
        padding=[(pad, pad)] * 3,
    )
