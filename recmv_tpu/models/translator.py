"""Non-rigid offset field (MLPTranslator) — TPU-native.

Parity with reference ``model/Deformer.py:141-213``: a 5-layer ReLU MLP
mapping [PE(xyz) (39-d), 128-d per-frame latent] → 3-d offset, last layer
initialized N(0, 1e-3)/bias 0 so deformation starts near identity. No
weight norm (the reference deliberately disables it to keep the near-zero
init, Deformer.py:160-162).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.embedder import Embedder, annealing_weights
from .mlp import linear_apply, normal_linear_init, torch_linear_init


class TranslatorStatic:
    def __init__(self, multires: int, condlen: int):
        self.multires = multires
        self.condlen = condlen
        self.embedder = Embedder(multires) if multires > 0 else None
        self.input_ch = (self.embedder.out_dim if self.embedder else 3) + condlen
        self.dims = [self.input_ch, 512, 512, 512, 512, 3]

    def __hash__(self):
        return hash((self.multires, self.condlen))

    def __eq__(self, other):
        return isinstance(other, TranslatorStatic) and (
            (self.multires, self.condlen) == (other.multires, other.condlen)
        )


def init_translator(key, condlen: int = 128, multires: int = 6):
    static = TranslatorStatic(multires, condlen)
    dims = static.dims
    keys = jax.random.split(key, len(dims) - 1)
    params = {}
    for l in range(len(dims) - 1):
        if l == len(dims) - 2:
            params[f"lin{l}"] = normal_linear_init(keys[l], dims[l], dims[l + 1], 0.0, 1e-3, 0.0)
        else:
            params[f"lin{l}"] = torch_linear_init(keys[l], dims[l], dims[l + 1])
    return params, static


def translator_offset(params, static: TranslatorStatic, ps, cond, ratio=None):
    """ps (..., 3) canonical points; cond (..., condlen) per-point latent
    (already gathered per frame). Returns the raw offsets (..., 3)."""
    if isinstance(ratio, dict):
        ratio = ratio.get("deformerRatio")
    emb = static.embedder
    if emb is None:
        x = ps
    elif ratio is None:
        x = emb(ps)
    else:
        r = jnp.maximum(jnp.asarray(ratio, jnp.float32), 0.0)
        x = emb(ps, annealing_weights(emb.multires, r))
    x = jnp.concatenate([x, cond], axis=-1)
    n_layers = len(static.dims)
    # hidden layers run bf16-operand matmuls with f32 accumulation and
    # bf16 activation storage: the offset field is mm-scale (bf16 hidden
    # quantization ⇒ ~µm offset noise) while the 131k-point activation
    # tensors dominate the training step's HBM traffic (see
    # mlp.linear_apply). The final 512→3 layer accumulates and returns
    # f32.
    for l in range(n_layers - 1):
        x = linear_apply(params[f"lin{l}"], x, compute_dtype=jnp.bfloat16)
        if l < n_layers - 2:
            x = jax.nn.relu(x).astype(jnp.bfloat16)
    return x


def translator_apply(params, static: TranslatorStatic, ps, cond, ratio=None):
    """Returns (deformed points, offsets): ps + f(ps, cond)."""
    off = translator_offset(params, static, ps, cond, ratio)
    return ps + off, off
