"""Differentiable point & mesh rasterization — TPU-native pytorch3d
replacement (SURVEY §7 "hard part #1").

Replaces the pytorch3d rasterizers the reference uses everywhere:
- ``MeshRasterizer`` + fragments (pix_to_face, bary_coords, zbuf) with
  faces_per_pixel=1, blur 0, perspective_correct=True
  (``model/network.py:307-322``) — feeds FindSurfacePs
  (``utils/FindSurfacePs.py:7-60``), z-buffer curve visibility, and the
  registration visibility scans.
- ``PointsRasterizer`` (idx, zbuf, dists) with points_per_pixel=50 and
  NDC radius (``engineer/networks/OptimNetwork.py:87-99``) +
  ``AlphaCompositor`` — the differentiable garment mask renderer.

TPU-first design: two-level tile binning with **static capacities**.
Primitives are binned into (tile_y, tile_x) buckets via per-tile top-k
over a bbox-overlap mask (one tile row at a time to bound memory), then
each tile tests its ≤cap primitives against its pixels with dense
VPU-friendly einsum/where math — no atomics, no sorting networks, no
dynamic shapes. Gradients flow through barycentrics / point distances
exactly where pytorch3d's CUDA backward provides them.

Conventions: inputs are *screen-space* vertices (x_pix, y_pix, z_cam) as
produced by ``camera.transform_points_screen`` (with z replaced by camera
z — see ``screen_with_cam_z``); pixel centers at integer coordinates;
z_cam > 0 in front of the camera; nearest-first z ordering. Point radius
and point/pixel distances are measured in pytorch3d NDC units
(2/min(H, W) per pixel) so reference configs transfer unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MeshFragments(NamedTuple):
    pix_to_face: jnp.ndarray  # (H, W, K) int32, -1 = empty
    bary_coords: jnp.ndarray  # (H, W, K, 3) perspective-corrected
    zbuf: jnp.ndarray         # (H, W, K) camera z, -1 = empty


class PointFragments(NamedTuple):
    idx: jnp.ndarray    # (H, W, K) int32 point index, -1 = empty
    zbuf: jnp.ndarray   # (H, W, K) camera z, -1 = empty
    dists: jnp.ndarray  # (H, W, K) squared NDC pixel→point distance, -1 = empty


def screen_with_cam_z(cam, pts):
    """World points → (x_pix, y_pix, z_cam) rasterizer inputs. Mirrors
    pytorch3d's MeshRasterizer.transform, which swaps view-space z into
    the projected coordinates."""
    from ..models.camera import transform_points_screen, world_to_cam

    s = transform_points_screen(cam, pts)
    zc = world_to_cam(cam, pts)[..., 2]
    return jnp.concatenate([s[..., :2], zc[..., None]], axis=-1)


def _pad_to(x, n, axis=0, value=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


def _bin_sorted(tx0, tx1, ty0, ty1, z, valid, Ht, Wt, cap, span=2):
    """Tile binning via ONE fused global sort instead of per-tile-row
    top_k (the r2 profile's dominant raster cost: ~40 ms per
    (Wt, 500k)→cap top_k, ×Ht rows).

    Each primitive is replicated span² times at tile offsets
    (ty0+dy, tx0+dx); a fused u32 key (tile_id·2^zbits | quantized z)
    sorts by tile then near-to-far in a single sort_key_val, tile
    boundaries come from searchsorted, and each tile gathers its first
    ≤cap entries — same nearest-cap overflow semantics as the top_k
    path. z quantization only affects ORDER between nearly-equal depths
    (≤2^-zbits of the z range), not the depth values themselves.

    Primitives spanning more than `span` tiles per axis lose their
    farthest tiles; with 32-px tiles every production primitive
    (point radius ~2 px, MC/SMPL triangles ≪32 px) spans ≤2.

    Returns (T, cap) int32 primitive indices, (T, cap) bool validity
    (z-ascending per tile), and (T,) int32 per-tile candidate counts
    (≤cap) — the kernels use the counts as dynamic loop bounds so
    sparse/empty tiles cost nothing."""
    T = Ht * Wt
    P = z.shape[0]
    tbits = max(int(np.ceil(np.log2(T + 2))), 1)
    zbits = 32 - tbits
    nq = np.uint32(2 ** zbits - 1)

    zmin = jnp.min(jnp.where(valid, z, jnp.inf))
    zmax = jnp.max(jnp.where(valid, z, -jnp.inf))
    zq = ((z - zmin) / jnp.maximum(zmax - zmin, 1e-12) * np.float32(nq))
    # clamp AFTER the uint cast: f32 rounding can land exactly on
    # 2^zbits, which would bleed into the tile bits of the fused key
    zq = jnp.minimum(jnp.maximum(zq, 0.0).astype(jnp.uint32), nq)

    keys = []
    idxs = []
    prim = jnp.arange(P, dtype=jnp.int32)
    for dy in range(span):
        for dx in range(span):
            ty = ty0 + dy
            tx = tx0 + dx
            ok = (valid & (ty <= ty1) & (tx <= tx1)
                  & (ty >= 0) & (ty < Ht) & (tx >= 0) & (tx < Wt))
            tid = jnp.where(ok, ty * Wt + tx, T).astype(jnp.uint32)
            keys.append((tid << zbits) | jnp.where(ok, zq, nq))
            idxs.append(prim)
    keys = jnp.concatenate(keys)
    idxs = jnp.concatenate(idxs)
    keys, idxs = jax.lax.sort_key_val(keys, idxs)

    tile_of = (keys >> zbits).astype(jnp.int32)
    starts = jnp.searchsorted(tile_of, jnp.arange(T + 1, dtype=jnp.int32))
    count = starts[1:] - starts[:-1]                       # (T,)
    j = jnp.arange(cap, dtype=jnp.int32)
    gidx = jnp.minimum(starts[:-1, None] + j[None], keys.shape[0] - 1)
    pidx = idxs[gidx]                                      # (T, cap)
    count = jnp.minimum(count, cap).astype(jnp.int32)
    pvalid = j[None] < count[:, None]
    return jnp.where(pvalid, pidx, 0), pvalid, count


# ---------------------------------------------------------------------------
# Point rasterization
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("image_size", "points_per_pixel", "tile", "cap"))
def rasterize_points(pts: jnp.ndarray, radius: float, image_size,
                     points_per_pixel: int = 50, tile: int = 32,
                     cap: int = 1024) -> PointFragments:
    """pts (P, 3) screen-space points. radius in NDC units.

    Per pixel: the K nearest-by-z points whose NDC distance to the pixel
    center is within radius. cap bounds points binned per tile; overflow
    drops the *farthest-binned* extras (matches pytorch3d's bin overflow
    semantics of dropping primitives, but deterministically).
    """
    H, W = image_size
    K = points_per_pixel
    P = pts.shape[0]
    ndc_scale = 2.0 / min(H, W)
    r_pix = radius / ndc_scale

    Ht = -(-H // tile)
    Wt = -(-W // tile)

    x = pts[:, 0]
    y = pts[:, 1]
    z = pts[:, 2]
    valid = z > 0

    # tile ranges covered by each point (inclusive)
    tx0 = jnp.floor((x - r_pix) / tile).astype(jnp.int32)
    tx1 = jnp.floor((x + r_pix) / tile).astype(jnp.int32)
    ty0 = jnp.floor((y - r_pix) / tile).astype(jnp.int32)
    ty1 = jnp.floor((y + r_pix) / tile).astype(jnp.int32)

    px_all = jnp.arange(tile)

    def do_tile_row(ty):
        # overlap mask for this tile row: (Wt, P)
        row_hit = valid & (ty0 <= ty) & (ty1 >= ty)
        tx = jnp.arange(Wt)
        hit = row_hit[None, :] & (tx0[None, :] <= tx[:, None]) & (tx1[None, :] >= tx[:, None])
        # bin: cap points per tile, prefer nearest (smallest z)
        score = jnp.where(hit, -z[None, :], -jnp.inf)  # (Wt, P)
        _, pidx = jax.lax.top_k(score, min(cap, P))    # (Wt, cap)
        pvalid = jnp.take_along_axis(hit, pidx, axis=1)

        def do_tile(tx_i, pidx_t, pvalid_t):
            # pixel centers of this tile
            py = (ty * tile + px_all).astype(jnp.float32)  # (tile,)
            px = (tx_i * tile + px_all).astype(jnp.float32)
            pxg, pyg = jnp.meshgrid(px, py, indexing="xy")  # (tile, tile) [y, x]
            pyg = py[:, None] + jnp.zeros((1, tile))
            pxg = px[None, :] + jnp.zeros((tile, 1))
            cx = x[pidx_t]
            cy = y[pidx_t]
            cz = jnp.where(pvalid_t, z[pidx_t], jnp.inf)
            d2 = (pxg[..., None] - cx) ** 2 + (pyg[..., None] - cy) ** 2  # (t,t,cap)
            d2_ndc = d2 * (ndc_scale**2)
            inside = (d2_ndc <= radius * radius) & pvalid_t
            zsel = jnp.where(inside, cz, jnp.inf)
            k_eff = min(K, zsel.shape[-1])
            negz, kidx = jax.lax.top_k(-zsel, k_eff)  # (t,t,k) nearest
            if k_eff < K:
                negz = _pad_to(negz, K, axis=-1, value=-jnp.inf)
                kidx = _pad_to(kidx, K, axis=-1, value=0)
            got = jnp.isfinite(negz)
            idx_out = jnp.where(got, jnp.take_along_axis(
                jnp.broadcast_to(pidx_t, (tile, tile, pidx_t.shape[0])), kidx, axis=2), -1)
            z_out = jnp.where(got, -negz, -1.0)
            d_out = jnp.where(got, jnp.take_along_axis(d2_ndc, kidx, axis=2), -1.0)
            return idx_out, z_out, d_out

        return jax.vmap(do_tile)(jnp.arange(Wt), pidx, pvalid)

    idx, zb, d2 = jax.lax.map(do_tile_row, jnp.arange(Ht))
    # (Ht, Wt, tile, tile, K) → (H, W, K)
    def untile(a):
        a = jnp.moveaxis(a, 2, 1)  # (Ht, tile, Wt, tile, K)
        a = a.reshape(Ht * tile, Wt * tile, K)
        return a[:H, :W]

    return PointFragments(untile(idx), untile(zb), untile(d2))


def alpha_composite(frag: PointFragments, radius: float, features: jnp.ndarray,
                    zero_mask=None) -> jnp.ndarray:
    """pytorch3d AlphaCompositor over PointsRendererWithFrags weights
    (``model/CameraMine.py:325-345``): w_k = 1 - dists/r², then
    front-to-back over-compositing C = Σ_k w_k Π_{j<k}(1-w_j) f_k.

    features (P, C); zero_mask (P,) optionally zeroes features per point
    (the _Split renderer's per-garment masking, CameraMine.py:354-415).
    Returns (H, W, C).
    """
    idx = frag.idx
    got = idx >= 0
    w = jnp.where(got, 1.0 - frag.dists / (radius * radius), 0.0)
    w = jnp.clip(w, 0.0, 1.0)
    f = features[jnp.maximum(idx, 0)]  # (H, W, K, C)
    if zero_mask is not None:
        f = f * jnp.where(zero_mask[jnp.maximum(idx, 0)], 1.0, 0.0)[..., None]
    trans = jnp.cumprod(1.0 - w + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    return jnp.einsum("hwk,hwkc->hwc", w * trans, f)


def _pallas_tile_pixels(Ht, Wt, tile):
    """Static (T, 8, 128) pixel-center coordinate planes (flattened
    row-major 32x32 tile → the native f32 register tile)."""
    T = Ht * Wt
    flat = np.arange(tile * tile)
    px = np.empty((T, tile * tile), np.float32)
    py = np.empty((T, tile * tile), np.float32)
    for t in range(T):
        ty, tx = divmod(t, Wt)
        px[t] = tx * tile + (flat % tile)
        py[t] = ty * tile + (flat // tile)
    return (jnp.asarray(px.reshape(T, 8, 128)),
            jnp.asarray(py.reshape(T, 8, 128)))


def _composite_points_pallas(pts, radius, features, image_size, tile, cap,
                             interpret=False, features_const=False):
    """Pallas backend of composite_points: XLA prologue (one fused
    tile+z sort → dense per-tile candidate lists, ``_bin_sorted``) + the
    sequential compositing kernel (ops/pallas_composite.py)."""
    from .pallas_composite import composite_tiles

    H, W = image_size
    P, C = features.shape
    ndc_scale = 2.0 / min(H, W)
    r_pix = radius / ndc_scale
    Ht = -(-H // tile)
    Wt = -(-W // tile)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    valid = z > 0
    tx0 = jnp.floor((x - r_pix) / tile).astype(jnp.int32)
    tx1 = jnp.floor((x + r_pix) / tile).astype(jnp.int32)
    ty0 = jnp.floor((y - r_pix) / tile).astype(jnp.int32)
    ty1 = jnp.floor((y + r_pix) / tile).astype(jnp.int32)

    pidx, pvalid, cnt = _bin_sorted(tx0, tx1, ty0, ty1, z, valid, Ht, Wt,
                                    min(cap, P))
    T = Ht * Wt
    # ONE row-gather of packed per-point data instead of separate scalar
    # gathers for x, y and features: TPU gathers move (sub)rows, so N
    # scalar gathers at (T·cap) indices each ran at ~250 MB/s (r4 trace:
    # the two coordinate gathers + their backward scatters were ~70 ms
    # of a 300 ms production step); one (P, 2+C) row gather amortizes
    # the index walk across the row. Backward is likewise one row
    # scatter-add.
    packed = jnp.concatenate([pts[:, :2], features], axis=1)  # (P, 2+C)
    g = packed[pidx]                                      # (T, cap, 2+C)
    cx = g[..., 0]
    cy = g[..., 1]
    va = pvalid.astype(jnp.float32)
    ft = (g[..., 2:] * pvalid[..., None]).swapaxes(1, 2)      # (T, C, cap)
    # The backward kernel sweeps the candidate axis in whole 128-lane
    # blocks (pallas_composite._bwd_kernel, n_blocks = cap // 128): pad
    # up to a multiple of 128 with val=0 entries (zero weight, so the
    # composite is unchanged and the tail gradients are defined; pad's
    # VJP slices the upstream gradients back to the true length).
    pad = (-cx.shape[1]) % 128
    if pad:
        cx = jnp.pad(cx, ((0, 0), (0, pad)))
        cy = jnp.pad(cy, ((0, 0), (0, pad)))
        va = jnp.pad(va, ((0, 0), (0, pad)))
        ft = jnp.pad(ft, ((0, 0), (0, 0), (0, pad)))
    px, py = _pallas_tile_pixels(Ht, Wt, tile)
    out = composite_tiles(cx, cy, va, ft, px, py,
                          ndc_scale ** 2 / (radius * radius), cnt,
                          interpret, not features_const)      # (T, C, 8, 128)
    out = out.reshape(Ht, Wt, C, tile, tile)
    out = jnp.moveaxis(out, 2, 4)                             # (Ht,Wt,ty,tx,C)
    out = jnp.moveaxis(out, 1, 2).reshape(Ht * tile, Wt * tile, C)
    return out[:H, :W]


@partial(jax.jit, static_argnames=("image_size", "tile", "sub", "cap",
                                   "sub_cap", "backend", "features_const"))
def composite_points(pts: jnp.ndarray, radius: float, features: jnp.ndarray,
                     image_size, tile: int = 32, sub: int = 8,
                     cap: int = 768, sub_cap: int = 128,
                     backend: str | None = None,
                     features_const: bool = False) -> jnp.ndarray:
    """Fused point rasterization + alpha compositing → (H, W, C).

    Same semantics as ``alpha_composite(rasterize_points(...))`` with
    unbounded points_per_pixel, engineered for the TPU's weak spots
    (sorts and gathers — the fragment path spends ~1.7 s/step at 1080²
    on the per-pixel top_k and the (H, W, K) feature gather):

    1. per tile row: bbox binning → ≤cap candidates per 32² tile,
    2. ONE z-sort of each tile's candidate list (front-to-back),
    3. stable prefix-sum compaction into 8² subtiles (≤sub_cap each;
       stability preserves the z order — no further sorting),
    4. per pixel: masked over-compositing across ALL inside-radius
       candidates (cumprod along the z-ordered axis; no top_k, no
       K-buffers, features gathered once per subtile).

    Per-garment mask splits (the reference's PointsRendererWithFrags_Split
    zeroing, ``model/CameraMine.py:347-415``) become feature channels:
    pass section one-hots as ``features`` and read one composited mask
    per channel — mathematically identical to per-section zero_mask
    composites. Overflowing candidates beyond the caps are dropped
    farthest-last (z-sorted), like pytorch3d's bin overflow.

    backend: None = auto (the Pallas kernel on TPU when tile==32; the
    prologue pads the candidate axis to a 128 multiple so any cap/P is
    safe), 'xla', 'pallas', or 'pallas_interpret' (CPU-testable)."""
    if backend is None:
        backend = ("pallas" if (jax.default_backend() == "tpu"
                                and tile == 32)
                   else "xla")
    if backend in ("pallas", "pallas_interpret"):
        # features_const: the caller promises no gradient is needed wrt
        # features (constant section one-hots) — the backward kernel
        # then skips its per-candidate feature-gradient sums (~1/3 of
        # the reverse sweep's inner work)
        return _composite_points_pallas(pts, radius, features, image_size,
                                        tile, cap,
                                        interpret=backend == "pallas_interpret",
                                        features_const=features_const)
    H, W = image_size
    P, C = features.shape
    ndc_scale = 2.0 / min(H, W)
    r_pix = radius / ndc_scale
    Ht = -(-H // tile)
    Wt = -(-W // tile)
    ns = tile // sub                      # subtiles per tile side

    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    valid = z > 0
    tx0 = jnp.floor((x - r_pix) / tile).astype(jnp.int32)
    tx1 = jnp.floor((x + r_pix) / tile).astype(jnp.int32)
    ty0 = jnp.floor((y - r_pix) / tile).astype(jnp.int32)
    ty1 = jnp.floor((y + r_pix) / tile).astype(jnp.int32)

    px_local = jnp.arange(sub)

    def do_tile_row(ty):
        row_hit = valid & (ty0 <= ty) & (ty1 >= ty)
        tx = jnp.arange(Wt)
        hit = row_hit[None, :] & (tx0[None, :] <= tx[:, None]) & (tx1[None, :] >= tx[:, None])
        # bin: nearest-by-z first — this single top_k doubles as the
        # front-to-back sort of each tile's candidate list
        score = jnp.where(hit, -z[None, :], -jnp.inf)
        _, pidx = jax.lax.top_k(score, min(cap, P))          # (Wt, cap) z-asc
        pvalid = jnp.take_along_axis(hit, pidx, axis=1)

        def do_tile(tx_i, pidx_t, pvalid_t):
            cx = x[pidx_t]
            cy = y[pidx_t]
            cz = z[pidx_t]
            feat = features[pidx_t] * pvalid_t[:, None]      # (cap, C)

            # subtile assignment (stable compaction keeps z order)
            sx = jnp.arange(ns)
            sy = jnp.arange(ns)
            sub_x0 = (tx_i * tile + sx * sub).astype(jnp.float32)
            sub_y0 = (ty * tile + sy * sub).astype(jnp.float32)
            inx = ((cx[None, :] >= sub_x0[:, None] - r_pix - 0.5)
                   & (cx[None, :] <= sub_x0[:, None] + sub - 1 + r_pix + 0.5))
            iny = ((cy[None, :] >= sub_y0[:, None] - r_pix - 0.5)
                   & (cy[None, :] <= sub_y0[:, None] + sub - 1 + r_pix + 0.5))
            smask = (iny[:, None, :] & inx[None, :, :]
                     & pvalid_t[None, None, :]).reshape(ns * ns, -1)

            csum = jnp.cumsum(smask.astype(jnp.int32), axis=1)
            slots = csum - 1
            target = jnp.where(smask & (slots < sub_cap), slots, sub_cap)
            src = jnp.broadcast_to(jnp.arange(smask.shape[1]), smask.shape)
            sel = jnp.full((ns * ns, sub_cap + 1), smask.shape[1], jnp.int32)
            sel = jax.vmap(lambda s, t, v: s.at[t].set(v, mode="drop"))(
                sel, target, src)[:, :sub_cap]               # (ns², sub_cap)
            sgot = sel < smask.shape[1]
            sel = jnp.where(sgot, sel, 0)

            scx = jnp.take(cx, sel)                          # (ns², sub_cap)
            scy = jnp.take(cy, sel)
            scz = jnp.take(cz, sel)
            sfeat = feat[sel] * sgot[..., None]              # (ns², sub_cap, C)

            # pixel grid per subtile: (ns², sub, sub)
            pxg = (sub_x0[None, :, None] + px_local[None, None, :])  # (1, ns, sub)
            pyg = (sub_y0[:, None, None] + px_local[None, None, :])  # (ns, 1, sub)
            pxg = jnp.broadcast_to(pxg, (ns, ns, sub)).reshape(ns * ns, 1, sub)
            pyg = jnp.broadcast_to(pyg, (ns, ns, sub)).reshape(ns * ns, sub, 1)

            d2 = ((pxg[:, None, :, :] - scx[:, :, None, None]) ** 2
                  + (pyg[:, None, :, :] - scy[:, :, None, None]) ** 2)
            # (ns², sub_cap, sub, sub) in z order along axis 1
            w = jnp.clip(1.0 - d2 * (ndc_scale ** 2) / (radius * radius),
                         0.0, 1.0)
            w = w * sgot[:, :, None, None]
            trans = jnp.cumprod(1.0 - w + 1e-10, axis=1)
            trans = jnp.concatenate(
                [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1)
            img = jnp.einsum("skyx,skc->syxc", w * trans, sfeat)
            # (ns², sub, sub, C) → (tile, tile, C)
            img = img.reshape(ns, ns, sub, sub, C)
            img = jnp.moveaxis(img, 2, 1).reshape(tile, tile, C)
            return img

        return jax.vmap(do_tile)(jnp.arange(Wt), pidx, pvalid)

    # remat: without it the scan over tile rows saves every row's
    # (ns², sub_cap, sub, sub) compositing intermediates for the backward
    # pass — ~13 GB at 1080². Recomputing a row forward is ~2x cheaper
    # than spilling it to HBM anyway.
    out = jax.lax.map(jax.checkpoint(do_tile_row), jnp.arange(Ht))
    out = jnp.moveaxis(out, 2, 1).reshape(Ht * tile, Wt * tile, C)
    return out[:H, :W]


# ---------------------------------------------------------------------------
# Mesh rasterization
# ---------------------------------------------------------------------------

def _rasterize_mesh_pallas(verts, faces, image_size, tile, cap,
                           interpret=False):
    """Pallas backend (K=1, forward-only): XLA binning + premultiplied
    per-face edge coefficients, then the sequential per-tile z-buffer
    kernel (ops/pallas_raster.py)."""
    from .pallas_raster import mesh_tiles

    H, W = image_size
    F = faces.shape[0]
    Ht = -(-H // tile)
    Wt = -(-W // tile)
    tri = verts[faces]
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    z_ok = (tri[..., 2] > 1e-6).all(-1)
    area = (v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1]) - (
        v1[:, 1] - v0[:, 1]) * (v2[:, 0] - v0[:, 0])
    fvalid = z_ok & (jnp.abs(area) >= 1e-10)
    inv_area = jnp.where(fvalid, 1.0 / jnp.where(fvalid, area, 1.0), 0.0)

    def edge_coeffs(p0, p1):
        # w(p) = [A(py − p0y) + B(px − p0x)]/area, A = p1x−p0x, B = −(p1y−p0y)
        A = (p1[:, 0] - p0[:, 0]) * inv_area
        B = -(p1[:, 1] - p0[:, 1]) * inv_area
        C = -A * p0[:, 1] - B * p0[:, 0]
        return A, B, C

    e0 = edge_coeffs(v1, v2)   # w0 (vertex a)
    e1 = edge_coeffs(v2, v0)   # w1
    e2 = edge_coeffs(v0, v1)   # w2
    qs = tuple(jnp.where(fvalid, 1.0 / jnp.maximum(t[:, 2], 1e-6), 0.0)
               for t in (v0, v1, v2))
    params = jnp.stack(e0 + e1 + e2 + qs, axis=1)   # (F, 12)
    params = params * fvalid[:, None]

    fx0 = jnp.min(tri[..., 0], axis=1)
    fx1 = jnp.max(tri[..., 0], axis=1)
    fy0 = jnp.min(tri[..., 1], axis=1)
    fy1 = jnp.max(tri[..., 1], axis=1)
    tx0 = jnp.floor(fx0 / tile).astype(jnp.int32)
    tx1 = jnp.floor(fx1 / tile).astype(jnp.int32)
    ty0 = jnp.floor(fy0 / tile).astype(jnp.int32)
    ty1 = jnp.floor(fy1 / tile).astype(jnp.int32)
    zmean = tri[..., 2].mean(1)

    fidx, fval, cnt = _bin_sorted(tx0, tx1, ty0, ty1, zmean, fvalid, Ht, Wt,
                                  min(cap, F), span=3)
    T = Ht * Wt
    prm = (params[fidx] * fval[..., None]).swapaxes(1, 2)   # (T, 12, cap)
    fid = jnp.where(fval, fidx, -1).reshape(T, 1, -1).astype(jnp.int32)
    px, py = _pallas_tile_pixels(Ht, Wt, tile)
    zb, fo, bc = mesh_tiles(prm, fid, px, py, cnt, interpret=interpret)

    def untile(a):                                       # (T, 8, 128) → (H, W)
        a = a.reshape(Ht, Wt, tile, tile)
        a = jnp.moveaxis(a, 1, 2).reshape(Ht * tile, Wt * tile)
        return a[:H, :W]

    zbuf = untile(zb)[..., None]
    p2f = untile(fo)[..., None]
    bary = jnp.stack([untile(bc[:, i]) for i in range(3)], -1)[..., None, :]
    return MeshFragments(p2f, bary, zbuf)


@partial(jax.jit, static_argnames=("image_size", "faces_per_pixel", "tile",
                                   "cap", "backend"))
def rasterize_mesh(verts: jnp.ndarray, faces: jnp.ndarray, image_size,
                   faces_per_pixel: int = 1, tile: int = 32,
                   cap: int = 512, backend: str | None = None) -> MeshFragments:
    """verts (V, 3) screen-space; faces (F, 3) int32.

    Inside test: all barycentrics > 0 (either winding — barycentrics are
    normalized by signed area, so interior points give all-positive
    coordinates for both orientations, matching pytorch3d with
    cull_backfaces=False). Barycentrics are perspective-corrected; zbuf
    is the perspective-correct interpolated camera z.

    backend: None = auto (Pallas kernel on TPU for the K=1/tile-32 case
    — every fragment consumer is under stop_gradient; XLA otherwise),
    'xla', 'pallas', 'pallas_interpret'.
    """
    H, W = image_size
    K = faces_per_pixel
    F = faces.shape[0]
    Ht = -(-H // tile)
    Wt = -(-W // tile)
    if backend is None:
        backend = ("pallas" if (jax.default_backend() == "tpu" and K == 1
                                and tile == 32)
                   else "xla")
    if backend in ("pallas", "pallas_interpret"):
        return _rasterize_mesh_pallas(verts, faces, image_size, tile, cap,
                                      interpret=backend == "pallas_interpret")

    tri = verts[faces]  # (F, 3, 3)
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    z_ok = (tri[..., 2] > 1e-6).all(-1)
    # signed double area in pixel space
    area = (v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1]) - (v1[:, 1] - v0[:, 1]) * (
        v2[:, 0] - v0[:, 0]
    )
    degenerate = jnp.abs(area) < 1e-10
    fvalid = z_ok & ~degenerate

    fx0 = jnp.min(tri[..., 0], axis=1)
    fx1 = jnp.max(tri[..., 0], axis=1)
    fy0 = jnp.min(tri[..., 1], axis=1)
    fy1 = jnp.max(tri[..., 1], axis=1)
    tx0 = jnp.floor(fx0 / tile).astype(jnp.int32)
    tx1 = jnp.floor(fx1 / tile).astype(jnp.int32)
    ty0 = jnp.floor(fy0 / tile).astype(jnp.int32)
    ty1 = jnp.floor(fy1 / tile).astype(jnp.int32)

    zmean = tri[..., 2].mean(1)
    px_all = jnp.arange(tile)

    def do_tile_row(ty):
        row_hit = fvalid & (ty0 <= ty) & (ty1 >= ty)
        tx = jnp.arange(Wt)
        hit = row_hit[None, :] & (tx0[None, :] <= tx[:, None]) & (tx1[None, :] >= tx[:, None])
        # bf16 keys halve the dominant bin-sort bandwidth; bin order only
        # sets the overflow-drop preference (per-pixel depth test below
        # stays f32), so the precision loss is inconsequential
        score = jnp.where(hit, -zmean[None, :], -jnp.inf).astype(jnp.bfloat16)
        _, fidx = jax.lax.top_k(score, min(cap, F))
        fval = jnp.take_along_axis(hit, fidx, axis=1)

        def do_tile(tx_i, fidx_t, fval_t):
            py = (ty * tile + px_all).astype(jnp.float32)
            px = (tx_i * tile + px_all).astype(jnp.float32)
            pyg = py[:, None] + jnp.zeros((1, tile))
            pxg = px[None, :] + jnp.zeros((tile, 1))
            a = v0[fidx_t]  # (cap, 3)
            b = v1[fidx_t]
            c = v2[fidx_t]
            ar = area[fidx_t]
            # edge functions → barycentrics (w0 for vertex a, etc.)
            def edge(p0, p1):
                return (
                    (p1[:, 0] - p0[:, 0]) * (pyg[..., None] - p0[:, 1])
                    - (p1[:, 1] - p0[:, 1]) * (pxg[..., None] - p0[:, 0])
                )
            w0 = edge(b, c) / ar
            w1 = edge(c, a) / ar
            w2 = edge(a, b) / ar
            inside = (w0 > 0) & (w1 > 0) & (w2 > 0) & fval_t
            # perspective-correct barycentrics and depth
            iz0 = w0 / a[:, 2]
            iz1 = w1 / b[:, 2]
            iz2 = w2 / c[:, 2]
            s = iz0 + iz1 + iz2
            zp = 1.0 / jnp.maximum(s, 1e-12)  # interpolated camera z
            zsel = jnp.where(inside, zp, jnp.inf)
            k_eff = min(K, zsel.shape[-1])
            negz, kidx = jax.lax.top_k(-zsel, k_eff)
            if k_eff < K:
                negz = _pad_to(negz, K, axis=-1, value=-jnp.inf)
                kidx = _pad_to(kidx, K, axis=-1, value=0)
            got = jnp.isfinite(negz)
            take = lambda q: jnp.take_along_axis(q, kidx, axis=2)
            f_out = jnp.where(got, jnp.take_along_axis(
                jnp.broadcast_to(fidx_t, (tile, tile, fidx_t.shape[0])), kidx, axis=2), -1)
            z_out = jnp.where(got, -negz, -1.0)
            bcp = jnp.stack([take(iz0 * zp), take(iz1 * zp), take(iz2 * zp)], axis=-1)
            b_out = jnp.where(got[..., None], bcp, -1.0)
            return f_out, z_out, b_out

        return jax.vmap(do_tile)(jnp.arange(Wt), fidx, fval)

    fi, zb, bc = jax.lax.map(do_tile_row, jnp.arange(Ht))

    def untile(a, ch=None):
        a = jnp.moveaxis(a, 2, 1)
        shape = (Ht * tile, Wt * tile, K) + ((ch,) if ch else ())
        a = a.reshape(shape)
        return a[:H, :W]

    return MeshFragments(untile(fi), untile(bc, 3), untile(zb))


def mesh_vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals, on device (scatter-add of face
    normals — the jnp counterpart of geometry.mesh_utils.vertex_normals)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    vn = (jnp.zeros_like(verts)
          .at[faces[:, 0]].add(fn)
          .at[faces[:, 1]].add(fn)
          .at[faces[:, 2]].add(fn))
    return vn / jnp.clip(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("image_size", "tile", "cap"))
def phong_render(cam, world_verts, faces, vert_colors, image_size,
                 light_loc, cam_pos, tile: int = 32, cap: int = 512,
                 background: float = 1.0):
    """Hard-Phong render of one mesh → ((H, W, 3) rgb in [0, 1], hit).

    The inference exports' shader (reference ``maskRender`` =
    pytorch3d MeshRenderer + HardPhongShader, infer_garment,
    OptimGarmentNetwork.py:3084-3213): K=1 rasterization, barycentric
    position/normal/color interpolation, point light with pytorch3d's
    default ambient/diffuse/specular weights (0.5/0.3/0.2, shininess 64),
    white background. Normals are flipped toward the viewer so the inside
    of open garments isn't black."""
    H, W = image_size
    scr = screen_with_cam_z(cam, world_verts)
    frag = rasterize_mesh(scr, faces, (H, W), tile=tile, cap=cap)
    hit = frag.pix_to_face[..., 0] >= 0
    fid = jnp.maximum(frag.pix_to_face[..., 0], 0)
    w = jnp.where(hit[..., None], frag.bary_coords[..., 0, :], 0.0)
    tri = faces[fid]                                       # (H, W, 3)
    interp = lambda a: jnp.einsum("hwk,hwkc->hwc", w, a[tri])
    pos = interp(world_verts)
    vn = mesh_vertex_normals(world_verts, faces)
    nrm = interp(vn)
    nrm = nrm / jnp.clip(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    col = interp(vert_colors)

    v = cam_pos - pos
    v = v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    nrm = nrm * jnp.sign(jnp.sum(nrm * v, -1, keepdims=True) + 1e-12)
    l = light_loc - pos
    l = l / jnp.clip(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-12)
    ndl = jnp.maximum(jnp.sum(nrm * l, -1, keepdims=True), 0.0)
    refl = 2.0 * jnp.sum(nrm * l, -1, keepdims=True) * nrm - l
    spec = jnp.maximum(jnp.sum(refl * v, -1, keepdims=True), 0.0) ** 64
    rgb = col * (0.5 + 0.3 * ndl) + 0.2 * spec
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return jnp.where(hit[..., None], rgb, background), hit


def silhouette_from_fragments(frag: MeshFragments) -> jnp.ndarray:
    """Hard silhouette (H, W): pytorch3d SoftSilhouetteShader with
    blur_radius=0, faces_per_pixel=1 degenerates to coverage."""
    return (frag.pix_to_face[..., 0] >= 0).astype(jnp.float32)


def find_surface_points(frag: MeshFragments, verts_canonical: jnp.ndarray,
                        faces: jnp.ndarray):
    """FindSurfacePs (``utils/FindSurfacePs.py:7-60``) on one frame,
    TPU-style: instead of compacting hit pixels with nonzero(), return the
    dense per-pixel canonical surface points + a hit mask; callers
    compact with their own ray-budget top_k.

    Returns (hit (H,W) bool, pts (H,W,3) canonical surface points,
    face_id (H,W) int32).
    """
    hit = (frag.pix_to_face[..., 0] >= 0) & (frag.bary_coords[..., 0, :] > 0).all(-1)
    fid = jnp.maximum(frag.pix_to_face[..., 0], 0)
    w = frag.bary_coords[..., 0, :]  # (H, W, 3)
    tri = verts_canonical[faces[fid]]  # (H, W, 3, 3)
    pts = jnp.einsum("hwk,hwkc->hwc", jnp.where(hit[..., None], w, 0.0), tri)
    return hit, pts, jnp.where(hit, frag.pix_to_face[..., 0], -1)
