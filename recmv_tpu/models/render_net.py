"""IDR-style rendering network — TPU-native.

Parity with reference ``model/RenderNet.py:10-103``
(``RenderingNetwork_view_norm``): input [points, PE(view_dirs), normals,
feature_vectors] → 4x512 ReLU MLP (weight-normalized) → tanh RGB.
View dirs use multires_v=4 PE on the main path; normals optionally
embedded (multires_n=0 in shipped configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.embedder import Embedder, annealing_weights
from .mlp import linear_apply, to_weight_norm, torch_linear_init


class RenderNetStatic:
    def __init__(self, condlen: int, multires_v: int = 4, multires_n: int = 0,
                 mode: str = "idr", d_in: int = 9, d_out: int = 3, dims=(512, 512, 512, 512)):
        self.condlen = condlen
        self.multires_v = multires_v
        self.multires_n = multires_n
        self.mode = mode
        self.embed_v = Embedder(multires_v) if multires_v > 0 else None
        self.embed_n = Embedder(multires_n) if multires_n > 0 else None
        input_ch = d_in + condlen
        if self.embed_v is not None:
            input_ch += self.embed_v.out_dim - 3
        if self.embed_n is not None:
            input_ch += self.embed_n.out_dim - 3
        self.dims = [input_ch] + list(dims) + [d_out]

    def __hash__(self):
        return hash((self.condlen, self.multires_v, self.multires_n, self.mode, tuple(self.dims)))

    def __eq__(self, other):
        return isinstance(other, RenderNetStatic) and hash(self) == hash(other)


def init_render_net(key, condlen: int = 256, multires_v: int = 4, multires_n: int = 0,
                    mode: str = "idr", weight_norm: bool = True):
    static = RenderNetStatic(condlen, multires_v, multires_n, mode)
    dims = static.dims
    keys = jax.random.split(key, len(dims) - 1)
    params = {}
    for l in range(len(dims) - 1):
        layer = torch_linear_init(keys[l], dims[l], dims[l + 1])
        if weight_norm:
            layer = to_weight_norm(layer)
        params[f"lin{l}"] = layer
    return params, static


def _embed(emb, x, ratio):
    if emb is None:
        return x
    if ratio is None:
        return emb(x)
    r = jnp.maximum(jnp.asarray(ratio, jnp.float32), 0.0)
    return emb(x, annealing_weights(emb.multires, r))


def render_net_apply(params, static: RenderNetStatic, points, normals, view_dirs,
                     feature_vectors, ratio=None):
    """All inputs (..., 3) except feature_vectors (..., condlen); returns
    tanh RGB in [-1, 1] (the dataset stores images in [-1, 1])."""
    if isinstance(ratio, dict):
        ratio = ratio.get("renderRatio")
    view_dirs = _embed(static.embed_v, view_dirs, ratio)
    normals = _embed(static.embed_n, normals, ratio)
    if static.mode == "idr":
        x = jnp.concatenate([points, view_dirs, normals, feature_vectors], axis=-1)
    elif static.mode == "no_view_dir":
        x = jnp.concatenate([points, normals, feature_vectors], axis=-1)
    elif static.mode == "no_normal":
        x = jnp.concatenate([points, view_dirs, feature_vectors], axis=-1)
    else:
        raise ValueError(static.mode)
    n_layers = len(static.dims)
    for l in range(n_layers - 1):
        x = linear_apply(params[f"lin{l}"], x)
        if l < n_layers - 2:
            x = jax.nn.relu(x)
    return jnp.tanh(x)
