"""NeRF positional encoding with coarse-to-fine annealing weights.

Parity with reference ``model/Embedder.py:4-65`` (frequency layout:
``[x, sin(2^0 x), cos(2^0 x), ..., sin(2^(L-1) x), cos(2^(L-1) x)]``,
log-sampled bands) and ``utils/utils.py:40-46`` (cosine annealing window).

TPU-first design notes: the embedding is a pure function of the input —
it fuses into the first MLP matmul under XLA, so no kernel is needed.
Frequencies are baked in as compile-time constants; the annealing weights
are a length-2L vector that can be traced (ratio is a scalar operand, not
a Python float), keeping one compiled executable across the anneal.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def annealing_weights(multires: int, ratio) -> jnp.ndarray:
    """Cosine easing window over frequency bands.

    Returns a (2*multires,) weight vector (sin and cos of each band share
    a weight). ``ratio`` may be a traced scalar; weights are computed with
    jnp so the whole schedule stays inside jit.
    """
    alpha = ratio * multires
    ind = jnp.arange(multires, dtype=jnp.float32)
    w = (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - ind, 0.0, 1.0))) / 2.0
    return jnp.repeat(w, 2)


class Embedder:
    """Positional encoder. Call as ``emb(x)`` or ``emb(x, ws)``.

    x: (..., d) input; returns (..., out_dim) with out_dim =
    d * (1 + 2*num_freqs) when include_input.
    """

    def __init__(self, multires: int, input_dims: int = 3, include_input: bool = True):
        self.multires = int(multires)
        self.input_dims = int(input_dims)
        self.include_input = bool(include_input)
        # log-sampled: 2^0 .. 2^(multires-1)
        self.freq_bands = np.asarray(2.0 ** np.arange(self.multires), dtype=np.float32)
        self.out_dim = (input_dims if include_input else 0) + input_dims * 2 * self.multires

    def __call__(self, x: jnp.ndarray, ws=None) -> jnp.ndarray:
        d = self.input_dims
        # (..., L, d): x * freq
        xf = x[..., None, :] * jnp.asarray(self.freq_bands)[:, None]
        # interleave per-frequency [sin, cos] to match reference ordering
        # [sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]
        enc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)  # (..., L, 2, d)
        if ws is not None:
            w = jnp.asarray(ws, dtype=enc.dtype).reshape((self.multires, 2))
            enc = enc * w[..., None]
        enc = enc.reshape(x.shape[:-1] + (2 * self.multires * d,))
        if self.include_input:
            return jnp.concatenate([x, enc], axis=-1)
        return enc

    def embed(self, x, ws=None):
        return self(x, ws)


def get_embedder(multires: int, input_dims: int = 3):
    """Reference-compatible factory: returns (embed_fn, out_dim)."""
    emb = Embedder(multires, input_dims)
    return emb, emb.out_dim


def apply_annealed(emb: Embedder, x: jnp.ndarray, ratio) -> jnp.ndarray:
    """Embed with the reference's ratio semantics:
    ratio None → all-one weights; ratio<=0 → zero weights on the bands
    (input passthrough only); otherwise cosine-annealed weights.
    With a traced ratio, the <=0 case is handled by clip inside
    annealing_weights (alpha<=0 gives zero weights), so a single traced
    branch suffices.
    """
    if ratio is None:
        return emb(x)
    return emb(x, annealing_weights(emb.multires, ratio))
