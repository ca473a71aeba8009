"""Nearest-neighbor search — TPU-native replacement for pytorch3d
``knn_points``/``knn_gather``. Brute-force chunked distance computation:
each chunk is one (chunk x R) matmul-style pass (MXU work), followed by
``top_k`` — no tree structures, which don't map to TPU."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int = 1, chunk: int = 4096):
    """query (Q,3), ref (R,3) → (dists2 (Q,k), idx (Q,k)), nearest first."""
    Q = query.shape[0]
    ref_sq = jnp.sum(ref * ref, axis=-1)
    pad = (-Q) % chunk
    qp = jnp.pad(query, ((0, pad), (0, 0)))

    def per_chunk(qc):
        d2 = (
            jnp.sum(qc * qc, -1)[:, None]
            - 2.0 * jnp.matmul(qc, ref.T, precision=jax.lax.Precision.HIGHEST)
            + ref_sq[None]
        )
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    d2, idx = jax.lax.map(per_chunk, qp.reshape(-1, chunk, 3))
    d2 = d2.reshape(-1, k)[:Q]
    idx = idx.reshape(-1, k)[:Q]
    return jnp.maximum(d2, 0.0), idx


def nn_gather(ref_feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """ref_feats (R,C), idx (Q,k) → (Q,k,C)."""
    return ref_feats[idx]


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 4096):
    """Symmetric mean squared chamfer between point sets (pytorch3d
    ``chamfer_distance`` semantics: mean over points of squared NN dist,
    summed both ways)."""
    d_ab, _ = knn(a, b, 1, chunk)
    d_ba, _ = knn(b, a, 1, chunk)
    return jnp.mean(d_ab) + jnp.mean(d_ba)
