"""The full REC-MV model state: one pytree holding every optimizable
component, plus closure builders used by the losses and the surface
solver.

Mirrors the reference's module graph (getOptNet, ``model/network.py:182``):
body SDF + per-garment SDFs (ImplicitNetwork), one shared non-rigid offset
MLP conditioned on per-garment latent slices, the LBS voxel skinner, the
IDR render net, the intersection-free curves, and the per-scene learnable
parameters (poses/trans/shape/latents/camera). Being a single pytree, the
whole model jits through train steps and shards with jax.sharding.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SceneParams
from .camera import Camera
from .curves import CurveStatics, curves_forward
from .render_net import RenderNetStatic, init_render_net
from .sdf import SdfStatic, init_sdf_net, sdf_apply, sdf_value
from .skinner import SkinnerParams, skinner_apply
from .translator import TranslatorStatic, init_translator, translator_apply


@dataclass
class ModelStatics:
    """Hashable static structure (network shapes, garment names)."""

    sdf: SdfStatic
    garment_sdf: SdfStatic
    translator: TranslatorStatic
    render: RenderNetStatic
    garment_names: tuple
    image_size: tuple  # (W, H)

    def __hash__(self):
        return hash((self.sdf, self.garment_sdf, self.translator, self.render,
                     self.garment_names, self.image_size))

    def __eq__(self, other):
        return hash(self) == hash(other)

    @property
    def garment_size(self):
        return len(self.garment_names)


def init_model(key, conf, garment_names, skinner: SkinnerParams, image_size,
               curve_params=None, curve_statics: CurveStatics | None = None):
    """Build (params_pytree, statics) from a HOCON config (reference
    getOptNet wiring: sdf_net/garment_sdf_net/mlp_deformer/render_net)."""
    keys = jax.random.split(key, 4 + len(garment_names))
    sdf_multires = conf.get_int("sdf_net.multires")
    g_multires = conf.get_int("garment_sdf_net.multires")
    condlen_render = conf.get_int("render_net.condlen")
    condlen_deform = conf.get_int("mlp_deformer.condlen")
    deform_multires = conf.get_int("mlp_deformer.multires")

    body_sdf, sdf_static = init_sdf_net(keys[0], sdf_multires, 0.6, condlen_render)
    garment_sdfs = []
    g_static = None
    for i, name in enumerate(garment_names):
        p, g_static = init_sdf_net(keys[1 + i], g_multires, 0.6, condlen_render)
        garment_sdfs.append(p)
    translator, tr_static = init_translator(keys[-3], condlen_deform, deform_multires)
    render, rn_static = init_render_net(
        keys[-2], condlen_render, conf.get_int("render_net.multires_v"),
        conf.get_int("render_net.multires_n"),
    )

    params = {
        "sdf": body_sdf,
        "garment_sdfs": tuple(garment_sdfs),
        "translator": translator,
        "render": render,
        "skinner": skinner,
        "curves": curve_params if curve_params is not None else {},
    }
    statics = ModelStatics(
        sdf=sdf_static, garment_sdf=g_static or sdf_static, translator=tr_static,
        render=rn_static, garment_names=tuple(garment_names),
        image_size=tuple(image_size),
    )
    return params, statics, curve_statics


def scene_camera(scene: dict, image_size) -> Camera:
    """Camera from the (possibly optimizer-updated) scene param pytree."""
    cam = scene["camera"]
    return Camera(
        focal=jnp.asarray(cam["focal_length"]).reshape(2),
        principal=jnp.asarray(cam["princeple_points"]).reshape(2),
        quat=jnp.asarray(cam["cam2world_coord_quat"]).reshape(4),
        trans=jnp.asarray(cam["world2cam_coord_trans"]).reshape(3),
        image_size=tuple(image_size),
    )


def split_deform_conds(cond: jnp.ndarray, garment_size: int):
    """(N, 128*(1+G)) → list of (N, 128): body slice first, then per
    garment (get_grad_parameters, OptimGarmentNetwork.py:671-678)."""
    L = cond.shape[-1] // (garment_size + 1)
    return [cond[..., i * L : (i + 1) * L] for i in range(garment_size + 1)]


def make_deform_fn(params, statics: ModelStatics, d_cond, poses, trans, ratio,
                   batch_inds=None, with_lbs_only=False):
    """Closure: canonical (M,3)/(B,N,3) → posed points, for one garment's
    cond slice. d_cond (N, condlen) per-frame latents.

    with_lbs_only=True: deform(pts) returns (posed, lbs_only) where
    lbs_only poses the UN-offset pts with the same blended transforms —
    the def-consistency pair (OptimGarmentNetwork.py:651-664) at the
    cost of ONE weight-field sampling instead of two (see
    skinner_apply's also_apply note on the tps approximation)."""

    def deform(pts):
        if batch_inds is not None:
            cond_pp = d_cond[batch_inds]
            off_pts, _ = translator_apply(params["translator"], statics.translator,
                                          pts, cond_pp, ratio)
            return skinner_apply(params["skinner"], off_pts, poses, trans,
                                 batch_inds=batch_inds,
                                 also_apply=pts if with_lbs_only else None)
        B, Np, _ = pts.shape
        cond_b = jnp.broadcast_to(d_cond[:, None, :], (B, Np, d_cond.shape[-1]))
        off_pts, _ = translator_apply(params["translator"], statics.translator,
                                      pts, cond_b, ratio)
        return skinner_apply(params["skinner"], off_pts, poses, trans,
                             also_apply=pts if with_lbs_only else None)

    return deform


def make_sdf_fn(params, statics: ModelStatics, garment_idx: int | None, ratio):
    """Closure: (M,3) → sdf values. garment_idx None → body SDF."""

    def f(pts):
        if garment_idx is None:
            return sdf_value(params["sdf"], statics.sdf, pts, ratio)
        return sdf_value(params["garment_sdfs"][garment_idx], statics.garment_sdf,
                         pts, ratio)

    return f


def garment_sdf_with_feat(params, statics, garment_idx, pts, ratio):
    return sdf_apply(params["garment_sdfs"][garment_idx], statics.garment_sdf, pts, ratio)
