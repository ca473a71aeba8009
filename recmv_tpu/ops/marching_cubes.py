"""Marching cubes over a dense SDF volume — TPU-native, fixed capacity.

Replaces the reference MCGpu CUDA extension (``MCGpu/MCGpu.cpp:21-61``,
``CudaKernels.cu``): extracts an indexed triangle mesh (shared vertices on
grid edges) from a dense signed field, emitting world-space vertices via
the same (spacing, origin) scaling as ``scaleVertices``
(``MCGpu/CudaKernels.h:16-22``).

TPU-first design: the variable-size output becomes fixed-capacity vertex/
face buffers plus valid counts, so the whole extraction jits with static
shapes (SURVEY §7.4). The algorithm is fully data-parallel:

1. three dense "active edge" masks (sign change along x/y/z),
2. one exclusive cumsum over the concatenated masks assigns each active
   edge its vertex slot,
3. a scatter compacts active-edge linear ids into the vertex buffer; the
   vertex positions are then *gathered* back from the volume (only
   ``max_verts`` interpolations — no dense position volumes),
4. per cell, the generated tables map the 8-bit corner configuration to
   up to 5 triangles whose edge ids are converted to vertex slots by
   gathering the cumsum volume; a second cumsum+scatter compacts faces.

The output needs no gradients: like the reference (``marching_cube_update``
re-registers MC vertices as fresh leaf parameters each remesh,
``OptimGarmentNetwork.py:709-712``), extraction is a topology event
between jitted optimization segments.

Volume layout: vol[z, y, x] (D, H, W); iso-surface at ``level`` with
"inside" = vol < level; spacing/origin refer to (x, y, z) axes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mc_tables import CORNERS, EDGE_CORNERS, MAX_TRIS, N_TRIS, TRI_TABLE

# Per-cell local-edge → (axis, dz, dy, dx) of the owning global edge.
# axis: 0=x-edge, 1=y-edge, 2=z-edge; offsets relative to cell origin.
_EDGE_AXIS_OFFSET = np.array(
    [
        # e0 (c0,c1): x-edge @ (0,0,0)
        [0, 0, 0, 0],
        # e1 (c1,c2): y-edge @ (0,0,1)
        [1, 0, 0, 1],
        # e2 (c2,c3): x-edge @ (0,1,0)
        [0, 0, 1, 0],
        # e3 (c3,c0): y-edge @ (0,0,0)
        [1, 0, 0, 0],
        # e4 (c4,c5): x-edge @ (1,0,0)
        [0, 1, 0, 0],
        # e5 (c5,c6): y-edge @ (1,0,1)
        [1, 1, 0, 1],
        # e6 (c6,c7): x-edge @ (1,1,0)
        [0, 1, 1, 0],
        # e7 (c7,c4): y-edge @ (1,0,0)
        [1, 1, 0, 0],
        # e8 (c0,c4): z-edge @ (0,0,0)
        [2, 0, 0, 0],
        # e9 (c1,c5): z-edge @ (0,0,1)
        [2, 0, 0, 1],
        # e10 (c2,c6): z-edge @ (0,1,1)
        [2, 0, 1, 1],
        # e11 (c3,c7): z-edge @ (0,1,0)
        [2, 0, 1, 0],
    ],
    dtype=np.int32,
)


@partial(jax.jit, static_argnames=("max_verts", "max_faces", "active_cap"))
def marching_cubes(vol: jnp.ndarray, level: float = 0.0,
                   origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0),
                   max_verts: int = 1 << 17, max_faces: int = 1 << 18,
                   active_cap: int | None = None):
    """Extract the iso-surface mesh.

    Returns (verts (3, max_verts) world-space, faces (3, max_faces) int32,
    n_verts, n_faces, n_active) — lane-major so TPU tiling doesn't pad a
    trailing 3-dim to 128. Slots beyond the counts hold zeros / degenerate
    faces. Callers check n_verts <= max_verts (counts are exact).

    ``active_cap`` bounds the compacted active-cell buffer A. Every
    per-triangle intermediate is (A·15)-sized, so leaving it at the
    worst-case ``max_faces`` made the three triangle-table gathers
    63M-element (4.8 s of the 6.5 s production extract, r3 trace) when
    the real surface occupies ~60k cells. Size it near the expected
    active count; the returned ``n_active`` is exact regardless, so a
    caller seeing ``n_active > active_cap`` must re-extract with a
    larger cap — capacity is a throughput knob, never silent truncation.
    """
    D, H, W = vol.shape
    origin = jnp.asarray(origin, jnp.float32)
    spacing = jnp.asarray(spacing, jnp.float32)
    inside = vol < level

    # --- active edges -----------------------------------------------------
    ax = inside[:, :, :-1] != inside[:, :, 1:]   # (D, H, W-1) x-edges
    ay = inside[:, :-1, :] != inside[:, 1:, :]   # (D, H-1, W) y-edges
    az = inside[:-1, :, :] != inside[1:, :, :]   # (D-1, H, W) z-edges
    sizes = (D * H * (W - 1), D * (H - 1) * W, (D - 1) * H * W)
    active = jnp.concatenate([ax.reshape(-1), ay.reshape(-1), az.reshape(-1)])
    # vertex slot per edge (inclusive cumsum - 1)
    csum = jnp.cumsum(active.astype(jnp.int32))
    slots = csum - 1
    n_verts = csum[-1]

    # --- compact active edge ids into the vertex buffer --------------------
    edge_lin = jnp.arange(active.shape[0], dtype=jnp.int32)
    target = jnp.where(active & (slots < max_verts), slots, max_verts)
    edge_of_vert = jnp.zeros((max_verts + 1,), jnp.int32).at[target].set(edge_lin, mode="drop")
    edge_of_vert = edge_of_vert[:max_verts]

    # --- decode edges → interpolated world positions (gather only) ---------
    o_x, o_y, o_z = 0, sizes[0], sizes[0] + sizes[1]
    is_y = edge_of_vert >= o_y
    is_z = edge_of_vert >= o_z
    axis = is_y.astype(jnp.int32) + is_z.astype(jnp.int32)
    rel = edge_of_vert - jnp.where(is_z, o_z, jnp.where(is_y, o_y, o_x))

    def decode(rel, dims):
        d, h, w = dims
        z = rel // (h * w)
        y = (rel % (h * w)) // w
        x = rel % w
        return z, y, x

    zx, yx, xx = decode(rel, (D, H, W - 1))
    zy, yy, xy = decode(rel, (D, H - 1, W))
    zz, yz, xz = decode(rel, (D - 1, H, W))
    z0 = jnp.where(axis == 0, zx, jnp.where(axis == 1, zy, zz))
    y0 = jnp.where(axis == 0, yx, jnp.where(axis == 1, yy, yz))
    x0 = jnp.where(axis == 0, xx, jnp.where(axis == 1, xy, xz))
    dz = (axis == 2).astype(jnp.int32)
    dy = (axis == 1).astype(jnp.int32)
    dx = (axis == 0).astype(jnp.int32)
    v0 = vol[z0, y0, x0]
    v1 = vol[z0 + dz, y0 + dy, x0 + dx]
    denom = v1 - v0
    t = jnp.where(jnp.abs(denom) < 1e-12, 0.5, (level - v0) / denom)
    t = jnp.clip(t, 0.0, 1.0)
    px = (x0 + dx * t) * spacing[0] + origin[0]
    py = (y0 + dy * t) * spacing[1] + origin[1]
    pz = (z0 + dz * t) * spacing[2] + origin[2]
    vmask = jnp.arange(max_verts) < n_verts
    # (3, V) lane-major: a (V, 3) buffer would tile to (V, 128) on TPU
    verts = jnp.stack([px, py, pz], axis=0) * vmask[None, :]

    # --- per-cell triangles (two-stage: compact active cells first) --------
    # TPU tiling pads the last two dims of every resident tensor to
    # (8,128): a dense (C, 5, 3) per-cell table for a 9M-cell grid would
    # tile to ~37 GB. Instead compact the ~O(surface) active cells to a
    # max_faces-bounded buffer and keep all per-triangle intermediates 1-D.
    Dc, Hc, Wc = D - 1, H - 1, W - 1
    cfg = jnp.zeros((Dc, Hc, Wc), jnp.int32)
    for i, (cx, cy, cz) in enumerate(np.asarray(CORNERS)):
        cfg = cfg | (
            inside[cz : cz + Dc, cy : cy + Hc, cx : cx + Wc].astype(jnp.int32) << i
        )
    cfg = cfg.reshape(-1)  # (C,)
    ntri_tab = jnp.asarray(N_TRIS)
    cell_ntri_all = ntri_tab[cfg]  # (C,)
    cell_active = cell_ntri_all > 0
    ccsum = jnp.cumsum(cell_active.astype(jnp.int32))
    cslots = ccsum - 1
    # every active cell emits ≥1 triangle → #active ≤ #faces bounds it
    A = max_faces if active_cap is None else min(active_cap, max_faces)
    ctarget = jnp.where(cell_active & (cslots < A), cslots, A)
    cell_ids = jnp.zeros((A + 1,), jnp.int32).at[ctarget].set(
        jnp.arange(cfg.shape[0], dtype=jnp.int32), mode="drop")[:A]
    n_active = ccsum[-1]
    a_valid = jnp.arange(A) < n_active

    cfg_a = jnp.where(a_valid, cfg[cell_ids], 0)      # (A,)
    ntri_a = ntri_tab[cfg_a]                          # (A,)
    czc = cell_ids // (Hc * Wc)
    cyc = (cell_ids % (Hc * Wc)) // Wc
    cxc = cell_ids % Wc

    # flatten the (A, 15) local-edge table lookups to 1-D
    tri_tab15 = jnp.asarray(TRI_TABLE)                # (256, 15)
    le = tri_tab15[cfg_a].reshape(-1)                 # (A*15,)
    le_safe = jnp.maximum(le, 0)
    eao = jnp.asarray(_EDGE_AXIS_OFFSET)              # (12, 4)
    rep = lambda q: jnp.repeat(q, MAX_TRIS * 3)       # (A,) → (A*15,)
    e_axis = eao[le_safe, 0]
    gz = rep(czc) + eao[le_safe, 1]
    gy = rep(cyc) + eao[le_safe, 2]
    gx = rep(cxc) + eao[le_safe, 3]
    flat_x = (gz * H + gy) * (W - 1) + gx
    flat_y = o_y + (gz * (H - 1) + gy) * W + gx
    flat_z = o_z + (gz * H + gy) * W + gx
    gedge = jnp.where(e_axis == 0, flat_x, jnp.where(e_axis == 1, flat_y, flat_z))
    tri_vids_flat = slots[gedge]                      # (A*15,)

    # triangle compaction (per active cell, k < ntri)
    k = jnp.arange(MAX_TRIS, dtype=jnp.int32)
    tri_active = (k[None, :] < ntri_a[:, None]) & a_valid[:, None]  # (A,5)
    tri_active = tri_active.reshape(-1)               # (A*5,)
    tcsum = jnp.cumsum(tri_active.astype(jnp.int32))
    tslots = tcsum - 1
    n_faces = tcsum[-1]
    ttarget = jnp.where(tri_active & (tslots < max_faces), tslots, max_faces)
    vids3 = tri_vids_flat.reshape(-1, 3)              # (A*5, 3) small last dim,
    # scattered column-wise to keep every resident buffer 1-D / lane-major
    fcols = []
    for c in range(3):
        col = jnp.zeros((max_faces + 1,), jnp.int32).at[ttarget].set(
            vids3[:, c], mode="drop")[:max_faces]
        fcols.append(col)
    fmask = jnp.arange(max_faces) < n_faces
    faces = jnp.stack([jnp.where(fmask, c, 0) for c in fcols], axis=0)  # (3, F)

    return verts, faces, n_verts, n_faces, n_active


def marching_cubes_np(vol, level=0.0, origin=(0, 0, 0), spacing=(1, 1, 1),
                      max_verts=1 << 17, max_faces=1 << 18):
    """Host wrapper returning trimmed numpy arrays."""
    v, f, nv, nf, _ = marching_cubes(jnp.asarray(vol), level, origin, spacing,
                                     max_verts=max_verts, max_faces=max_faces)
    nv = int(nv)
    nf = int(nf)
    if nv > max_verts or nf > max_faces:
        raise ValueError(f"MC overflow: nv={nv}/{max_verts} nf={nf}/{max_faces}")
    return np.asarray(v).T[:nv].copy(), np.asarray(f).T[:nf].copy()
