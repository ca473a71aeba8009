"""The per-scene garment optimization network — TPU-native core.

Parity with reference ``engineer/networks/OptimGarmentNetwork.py`` (the
REC-MV "model"): joint optimization of per-garment SDFs + body SDF,
explicit feature curves, the non-rigid deformation field, per-frame
latents, SMPL poses/translation and camera — against 2D curve
projections, garment silhouettes, IDR surface rendering, and temporal
priors; with periodic marching-cubes remeshing.

TPU-first structure (SURVEY §7): the reference's three interleaved
.backward()/step() calls become three *gradient computations* on pure
functions, combined exactly as the reference's grad accumulation does
(train.py:319-329 zero_grads once per step, so curve- and mask-branch
gradients on shared parameters fold into the global Adam step):

  step = ① curve branch: L_fl = 10·sdf(curve)+proj → AdamW on curve
           params, global grads kept;
         ② mask branch: point-render IoU + consistency → SGD on the
           marching-cube vertices, global grads kept;
         ③ main: pc-sdf + curve-aware + IDR render (with the implicit
           surface adjoint attached) + DCT prior → global grads;
         ④ one optax update from ①+②+③ on the model pytree.

Topology events (marching-cube remesh every remesh_intersect steps,
hierarchy promotions) happen on host between jitted eras with
fixed-capacity padded buffers (degenerate padding faces are raster-
and loss-inert).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.constants import CURVE_AWARE, FL_EXTRACT, ZBUF_THRESHOLD
from ..data.dataset import SceneDataset
from ..models import camera as cam_mod
from ..models.curves import CurveStatics, curves_forward, curves_regularization
from ..models.garment_model import (
    ModelStatics,
    make_deform_fn,
    scene_camera,
    split_deform_conds,
)
from ..models.sdf import sdf_apply, sdf_gradient, sdf_value, sdf_value_and_gradient
from ..models.skinner import bbox_size, posed_skeleton, skinner_apply
from ..models.translator import translator_apply
from ..ops.marching_cubes import marching_cubes
from ..ops.math3d import dct_null_space
from ..ops.rasterizer import (
    composite_points,
    rasterize_mesh,
    screen_with_cam_z,
)
from ..ops.seg3d import Seg3dConfig, final_grid_spacing, seg3d_forward
from . import losses as L
from .surface_ps import make_implicit_surface_adjoint, optimize_surface_points, ray_constraint


def _degradable_error(e: BaseException) -> bool:
    """True only for compile-infrastructure failures — remote-compile
    drops, device OOM, exec-cache IO — where degrading the fused step to
    per-phase executables is sound. Structural tracing errors
    (TypeError / shape ValueError) must PROPAGATE: swallowing one turns
    a hard bug into a mysterious fallback that crashes identically
    later with a misleading trace (r4 shipped exactly that)."""
    if isinstance(e, (TypeError, ValueError, AssertionError, KeyError,
                      IndexError, AttributeError, NameError)):
        return False
    try:
        from jaxlib.xla_extension import XlaRuntimeError
        if isinstance(e, XlaRuntimeError):
            return True
    except ImportError:
        pass
    return isinstance(e, (RuntimeError, OSError, MemoryError))


@dataclass
class MeshState:
    """Per-remesh-era explicit meshes (padded to static capacity)."""

    body_vs: jnp.ndarray
    body_fs: jnp.ndarray
    body_n: int
    garment_vs: list            # per garment (cap, 3)
    garment_fs: list            # per garment (capF, 3)
    garment_n: list             # vert counts
    garment_fn: list            # face counts


@dataclass
class TrainConfig:
    """Static per-phase knobs resolved from HOCON."""

    sample_pix: int = 2048
    point_radius: float = 0.006
    remesh_intersect: int = 30
    batch_size: int = 3
    image_size: tuple = (1080, 1080)
    mc_capacity_v: int = 1 << 18
    mc_capacity_f: int = 1 << 19
    raster_tile: int = 32
    raster_cap_mesh: int = 512
    raster_cap_points: int = 768
    points_per_pixel: int = 24
    solver_times: int = 20
    surface_sample: int = 4096
    # visibility z-buffers are bilinearly-probed GATES (ZBUF_THRESHOLD
    # ≈5 cm tolerance) — rendering them at reduced resolution changes
    # nothing downstream while cutting the raster cost ~16x (VERDICT r2
    # next-round #1a). 1 = full resolution.
    zbuf_downscale: int = 4
    # ray-seeding raster resolution divisor (find_and_sample_rays): the
    # seed raster nominates candidate pixels on a 1/s-strided full-res
    # grid; mask test, gt color and the solved intersection stay exact.
    # 1 = nominate from every pixel (reference-exact sampling pool).
    seed_downscale: int = 2
    # pc-branch soft-mask render resolution divisor: the IoU target is
    # the splat-radius-dilated gt mask, so the signal is a coverage map,
    # not a sharp boundary; 1/s rendering (gt subsampled to match, splat
    # radius NDC-relative so coverage is res-invariant) cuts the
    # point-binning/compositing cost ~s². 1 = reference-exact full res.
    mask_render_downscale: int = 1
    # True: block_until_ready at each phase boundary so info['t_*'] are
    # real per-phase walls. False (default): phases are dispatched
    # back-to-back with a single device sync at the end of the step —
    # t_* then measure dispatch, not compute.
    profile_phases: bool = False
    # Directory for the serialized-executable cache (utils/exec_cache):
    # phase/extract executables persist across processes keyed on their
    # StableHLO hash, sidestepping XLA's per-process-unstable cache keys.
    # None → env RECMV_EXEC_CACHE → disabled.
    exec_cache_dir: str | None = None
    # Curve-branch AdamW lr. 1e-4 = the reference's AdamW(curve, 1e-4)
    # (OptimGarmentNetwork.py:709-712), sized for its ~30k-step per-scene
    # schedules. Compressed schedules (benches, smoke fits) should raise
    # it: with the loop-smoothness regularizer dominating Adam's second
    # moment until the curve smooths, the per-step radial motion at 1e-4
    # is ~1e-6 — a 500-step fit leaves the curves essentially frozen
    # (r5 diag: hemline mean-r unchanged to 4 decimals over 125 steps).
    curve_lr: float = 1e-4
    # Garment vertex-capacity floor. Early-training meshes are small, so
    # pure grow-on-demand buckets start a power of 2 below steady state
    # and force a full step recompile (153 s over the axon tunnel, r3)
    # when the mesh crosses the boundary mid-run — and make the
    # serialized-executable cache key differ between a fresh scene and a
    # resumed one. -1 = auto: at production grids (>=2^24 final cells)
    # floor each garment at the expected steady-state surface size
    # ~1.2 * cells^(2/3) / n_garments (fine (321,417,225) single-garment
    # → 131072); smaller grids (tests) keep pure grow-on-demand. 0 = off.
    mesh_cap_floor: int = -1

    def __post_init__(self):
        if self.exec_cache_dir is None:
            self.exec_cache_dir = os.environ.get("RECMV_EXEC_CACHE") or None


@partial(jax.jit, static_argnames=("cv", "cf"))
def _trim_mesh(v, f, cv, cf):
    """Lane-major (3, cap) MC buffers → (cap', 3) trimmed, one executable
    (eager ops each cost a remote-compile round trip over axon)."""
    return v[:, :cv].T, jnp.asarray(f[:, :cf].T, jnp.int32)


class GarmentOptimNetwork:
    """Host orchestrator around jitted pure functions."""

    def __init__(self, conf, dataset: SceneDataset, params: dict,
                 statics: ModelStatics, curve_statics: CurveStatics | None,
                 body_vs, body_fs, seg3d_cfg: Seg3dConfig,
                 train_cfg: TrainConfig | None = None, sdf_shrink: float = 0.0,
                 large_pose: bool = False):
        self.conf = conf                 # active loss_<phase> config block
        self.full_conf = conf
        self.dataset = dataset
        self.params = params
        self.statics = statics
        self.curve_statics = curve_statics
        self.tmp_body_vs = jnp.asarray(body_vs)
        self.tmp_body_fs = jnp.asarray(np.asarray(body_fs), jnp.int32)
        self.seg3d_cfg = seg3d_cfg
        self.cfg = train_cfg or TrainConfig()
        self.sdf_shrink = float(sdf_shrink)
        self.mesh: MeshState | None = None
        self.opt_times = 0.0
        self.remesh_time = 0.0
        self._remeshed_at = -1.0
        # compacted active-cell capacity for MC extraction: sized for the
        # observed ~60-120k active cells at the fine pyramid (capacity_f
        # would be the 33x-oversized worst case); grows on overflow
        self._mc_active_cap = max(2048, self.cfg.mc_capacity_f >> 4)
        self.isfine = False
        self.info = {}
        self.ang_thred = None
        self.dct_null = jnp.asarray(dct_null_space(10, 30))
        self._scene_dev = None   # device-resident scene tree (scene_tree)
        self._scene_dirty = False
        # fused whole-step executable health: the axon remote-compile
        # service occasionally drops very large modules mid-response;
        # when the fused program can't compile we degrade to the
        # per-phase executables instead of failing the run
        self._fused_ok = True
        self._batch_dev_cache = {}   # compact per-frame-batch device arrays
        self._jit_misc = {}          # small cached jitted helpers (mask pool)

        # optimizers
        lr = conf.get_float("train.learning_rate", 1e-4) if "train" in conf else 1e-4
        self.global_opt = optax.adam(lr)
        self.global_opt_state = None
        self.curve_opt = optax.adamw(self.cfg.curve_lr)
        self.curve_opt_state = None
        self.vert_opt = optax.sgd(0.05, momentum=0.9)
        self.vert_opt_state = None
        self._lr_scale = 1.0
        self.pmesh = None        # optional jax.sharding.Mesh (set_parallel)
        self._jit_cache = {}
        self._extract_cache = {}
        self._phase_token = 0
        # Large-pose stage (OptimGarmentNetwork_LargePose,
        # OptimGarmentNetwork_Large_Pose.py:120-474): SDFs frozen, curve
        # losses disabled — only deformer/poses/latents/camera train.
        self.large_pose = bool(large_pose)

        self._init_global_opt()

    # ------------------------------------------------------------------
    # parameter plumbing
    # ------------------------------------------------------------------

    def _global_params(self):
        """The pytree updated by the global optimizer: model nets + scene."""
        return {
            "sdf": self.params["sdf"],
            "garment_sdfs": self.params["garment_sdfs"],
            "translator": self.params["translator"],
            "render": self.params["render"],
            "scene": self.scene_tree(),
        }

    def scene_tree(self):
        """DEVICE-RESIDENT scene tree (poses/trans/conds/camera for all
        frames). Built once from ``dataset.params`` and thereafter updated
        in place by the optimizer — r2 round-tripped the whole tree
        device→numpy→device every step (~0.3 s/step over the axon
        tunnel). Host code that mutates ``dataset.params`` directly must
        call ``invalidate_scene()``; host code reading ``dataset.params``
        after training steps must call ``sync_scene_to_dataset()``."""
        if self._scene_dev is None:
            p = self.dataset.params
            self._scene_dev = {
                "poses": jnp.asarray(p.poses), "trans": jnp.asarray(p.trans),
                "shape": jnp.asarray(p.shape),
                "conds": {k: jnp.asarray(v) for k, v in p.conds.items()},
                "camera": {k: jnp.asarray(v) for k, v in p.camera.items()},
            }
            self._scene_dirty = False
        return self._scene_dev

    def invalidate_scene(self):
        """Drop the device scene copy (call after mutating dataset.params)."""
        self._scene_dev = None

    def sync_scene_to_dataset(self):
        """Copy optimizer-updated scene params back into dataset.params
        (checkpointing, pose smoothing, and any host-side consumer)."""
        if self._scene_dev is None or not self._scene_dirty:
            return
        g = self._scene_dev
        sp = self.dataset.params
        sp.poses = np.asarray(g["poses"])
        sp.trans = np.asarray(g["trans"])
        sp.shape = np.asarray(g["shape"])
        sp.conds = {k: np.asarray(v) for k, v in g["conds"].items()}
        sp.camera = {k: np.asarray(v) for k, v in g["camera"].items()}
        self._scene_dirty = False

    def _write_back(self, g):
        self.params["sdf"] = g["sdf"]
        self.params["garment_sdfs"] = g["garment_sdfs"]
        self.params["translator"] = g["translator"]
        self.params["render"] = g["render"]
        self._scene_dev = g["scene"]
        self._scene_dirty = True

    def _init_global_opt(self):
        from ..data.dataset import trainable_mask

        g = self._global_params()
        freeze_sdf = getattr(self, "large_pose", False)
        mask = {
            "sdf": not freeze_sdf, "garment_sdfs": not freeze_sdf,
            "translator": True, "render": True,
            "scene": trainable_mask(self.full_conf, self.dataset.frame_num),
        }

        def expand(m, tree):
            if isinstance(m, bool):
                return jax.tree_util.tree_map(lambda _: m, tree)
            return {k: expand(m[k], tree[k]) for k in tree}

        self._trainable = expand(mask, g)
        self.global_opt_state = self.global_opt.init(g)
        if self.params.get("curves"):
            self.curve_opt_state = self.curve_opt.init(self.params["curves"])

    def _apply_trainable_mask(self, grads):
        return jax.tree_util.tree_map(
            lambda g, t: g if t else jnp.zeros_like(g), grads, self._trainable
        )

    # ------------------------------------------------------------------
    # marching-cube remesh (topology event)
    # ------------------------------------------------------------------

    def _get_extract_fn(self, cfg, static, balance_value):
        """One jitted executable: seg3d pyramid + marching cubes, with the
        SDF parameters, ratio and an extraction clip box as arguments —
        shared across all SDFs of the same architecture, all remeshes,
        and both extraction passes. (Running the pyramid eagerly costs
        ~8 min of per-op dispatch over the axon tunnel; one executable
        runs it in seconds.)

        The clip box intersects the queried field with an axis-aligned
        box SDF: a short-IGR-initialized garment SDF carries spurious
        far-field zero-crossings (connected sheets over the shoulders in
        the r3 quality diagnosis) that would enter the mesh, the mask
        losses, and registration. The reference avoids this only via its
        1200-epoch inits; clipping extraction to the template bbox (+
        margin, set in initialize_tmp_sdf) is the robust equivalent —
        training losses still see the raw SDF."""
        active_cap = min(self._mc_active_cap, self.cfg.mc_capacity_f)
        key = ("extract", cfg, static, float(balance_value),
               self.cfg.mc_capacity_v, self.cfg.mc_capacity_f, active_cap)
        if key not in self._extract_cache:
            spacing, origin = final_grid_spacing(cfg)

            @jax.jit
            def extract(sdf_params, ratio, bmin, bmax):
                def q(pts):
                    s = sdf_value(sdf_params, static, pts, ratio)
                    box = jnp.max(jnp.maximum(pts - bmax, bmin - pts), -1)
                    return jnp.maximum(s, box)

                vol = seg3d_forward(q, cfg)
                return marching_cubes(
                    vol, balance_value, origin, spacing,
                    max_verts=self.cfg.mc_capacity_v,
                    max_faces=self.cfg.mc_capacity_f,
                    active_cap=active_cap,
                )

            from ..utils.exec_cache import LazyAot, cache_enabled

            if (self.cfg.exec_cache_dir and self.pmesh is None
                    and cache_enabled()):
                extract = LazyAot(extract, self.cfg.exec_cache_dir, "extract")
            self._extract_cache[key] = extract
        return self._extract_cache[key]

    _NO_CLIP = (np.full(3, -1e9, np.float32), np.full(3, 1e9, np.float32))

    def _extract_bbox(self, gi):
        """Extraction clip box for garment gi (template bbox + margin),
        or an unbounded box when none was recorded."""
        boxes = getattr(self, "garment_extract_bboxes", None)
        if gi is None or not boxes or gi >= len(boxes) or boxes[gi] is None:
            return self._NO_CLIP
        return boxes[gi]

    def discretize_sdf(self, ratio, balance_value: float = 0.0, seg3d_cfg=None,
                       include_body: bool = True):
        """Seg3dLossless over each SDF → fixed-capacity meshes
        (discretizeSDF, OptimGarmentNetwork.py:581-618).

        ``include_body=False`` extracts only the garment SDFs: the MC
        body mesh has no consumer during training (visibility gates and
        all exports use the posed SMPL template ``tmp_body_vs``), so
        in-training remeshes skip it — roughly half the remesh wall at
        the fine pyramid. The first remesh (and every inference-time
        call) still extracts it."""
        import sys as _sys, time as _t

        cfg = seg3d_cfg or self.seg3d_cfg
        r = self._ratio_dict(ratio)["sdfRatio"]
        out = []
        nets = [(n, i) for i, n in enumerate(self.statics.garment_names)]
        if include_body:
            nets = [("body", None)] + nets
        for name, gi in nets:
            if gi is None:
                fn = self._get_extract_fn(cfg, self.statics.sdf, balance_value)
                prm = self.params["sdf"]
            else:
                fn = self._get_extract_fn(cfg, self.statics.garment_sdf, balance_value)
                prm = self.params["garment_sdfs"][gi]
            bmin, bmax = self._extract_bbox(gi)
            _t0 = _t.time()
            v, f, nv, nf, n_active = jax.block_until_ready(
                fn(prm, r, jnp.asarray(bmin), jnp.asarray(bmax)))
            # active-cell capacity is a throughput knob, never silent
            # truncation: grow (with hysteresis) and re-extract on
            # overflow — recompiles once, then stays warm
            while (int(n_active) > min(self._mc_active_cap,
                                       self.cfg.mc_capacity_f)
                   and self._mc_active_cap < self.cfg.mc_capacity_f):
                self._mc_active_cap = min(
                    self.cfg.mc_capacity_f,
                    1 << int(np.ceil(np.log2(int(n_active) * 1.3))))
                _sys.stderr.write(f"[net] extract {name}: active cells "
                                  f"{int(n_active)} overflow; growing cap "
                                  f"to {self._mc_active_cap}\n")
                fn = self._get_extract_fn(cfg, (self.statics.sdf if gi is None
                                                else self.statics.garment_sdf),
                                          balance_value)
                v, f, nv, nf, n_active = jax.block_until_ready(
                    fn(prm, r, jnp.asarray(bmin), jnp.asarray(bmax)))
            _sys.stderr.write(f"[net] extract {name}: {_t.time()-_t0:.1f}s "
                              f"nv={int(nv)}\n"); _sys.stderr.flush()
            out.append((v, f, int(nv), int(nf)))
        return out

    def _get_vol_fn(self, cfg, static, stop_after=None):
        """Jitted seg3d pyramid returning the dense finest volume (no MC)
        — feeds the host marching cubes for very large inference grids.
        ``stop_after`` truncates the pyramid (returns (occ, evaluated))
        for the host-orchestrated final level (ops.seg3d.host_refine_level)."""
        key = ("vol", cfg, static, stop_after)
        if key not in self._extract_cache:

            @jax.jit
            def vol_fn(sdf_params, ratio, bmin, bmax):
                def q(pts):
                    s = sdf_value(sdf_params, static, pts, ratio)
                    box = jnp.max(jnp.maximum(pts - bmax, bmin - pts), -1)
                    return jnp.maximum(s, box)

                return seg3d_forward(q, cfg, stop_after=stop_after)

            from ..utils.exec_cache import LazyAot, cache_enabled

            if (self.cfg.exec_cache_dir and self.pmesh is None
                    and cache_enabled()):
                tag = "vol" if stop_after is None else f"vol_pen{stop_after}"
                vol_fn = LazyAot(vol_fn, self.cfg.exec_cache_dir, tag)
            self._extract_cache[key] = vol_fn
        return self._extract_cache[key]

    # final grids beyond this voxel count run the last pyramid level on
    # the host (chunked queries): the fused 513³ seg3d graph needs ~17.7 G
    # HBM on a 16 G chip (dense cumsum compaction double-buffered by the
    # requery while_loop)
    _HOST_LEVEL_VOXELS = 1 << 26

    def _vol_host_hybrid(self, cfg, static, prm, r, bmin, bmax):
        """Dense finest volume for huge grids: device pyramid to the
        penultimate level + host-orchestrated final level."""
        from ..ops.seg3d import host_refine_level

        pen_fn = self._get_vol_fn(cfg, static, stop_after=len(cfg.resolutions) - 1)
        occ, evaluated = pen_fn(prm, r, bmin, bmax)

        chunk = 1 << 18
        qkey = ("volq", static, chunk)
        q_chunk = self._extract_cache.get(qkey)
        if q_chunk is None:
            @jax.jit
            def q_chunk(sdf_params, ratio, bmn, bmx, pts):
                s = sdf_value(sdf_params, static, pts, ratio)
                box = jnp.max(jnp.maximum(pts - bmx, bmn - pts), -1)
                return jnp.maximum(s, box)

            self._extract_cache[qkey] = q_chunk

        def query_np(pts):
            n = pts.shape[0]
            out = np.empty(n, np.float32)
            for s in range(0, n, chunk):
                p = pts[s:s + chunk]
                pad = chunk - p.shape[0]
                if pad:
                    p = np.pad(p, ((0, pad), (0, 0)))
                out[s:s + chunk] = np.asarray(
                    q_chunk(prm, r, bmin, bmax, jnp.asarray(p)))[:n - s]
            return out

        return host_refine_level(query_np, cfg, np.asarray(occ),
                                 np.asarray(evaluated))

    def discretize_sdf_host(self, ratio, balance_value: float = 0.0,
                            seg3d_cfg=None, max_verts: int = 1 << 22,
                            max_faces: int = 1 << 23):
        """Seg3d on device + NATIVE HOST marching cubes — the reference's
        513³ `higher` inference grids (train.py:47-79) where fixed-
        capacity device MC buffers would waste HBM. Returns per net
        (verts (V,3) f32, faces (F,3) i64) trimmed numpy meshes."""
        from ..native import marching_cubes_host
        from ..ops.seg3d import final_grid_spacing

        cfg = seg3d_cfg or self.seg3d_cfg
        r = self._ratio_dict(ratio)["sdfRatio"]
        spacing, origin = final_grid_spacing(cfg)
        out = []
        nets = [("body", None)] + [(n, i) for i, n in
                                   enumerate(self.statics.garment_names)]
        for name, gi in nets:
            static = self.statics.sdf if gi is None else self.statics.garment_sdf
            prm = self.params["sdf"] if gi is None else self.params["garment_sdfs"][gi]
            bmin, bmax = self._extract_bbox(gi)
            if int(np.prod(cfg.resolutions[-1])) > self._HOST_LEVEL_VOXELS:
                vol = self._vol_host_hybrid(cfg, static, prm, r,
                                            jnp.asarray(bmin), jnp.asarray(bmax))
            else:
                vol = np.asarray(self._get_vol_fn(cfg, static)(
                    prm, r, jnp.asarray(bmin), jnp.asarray(bmax)))
            v, f = marching_cubes_host(vol, balance_value,
                                       origin=np.asarray(origin),
                                       spacing=np.asarray(spacing),
                                       max_verts=max_verts,
                                       max_faces=max_faces)
            out.append((v, f))
        return out

    def marching_cube_update_host(self, ratio, seg3d_cfg=None):
        """marching_cube_update via the host MC path: fills the same
        MeshState (device buffers at hysteresis caps) so registration /
        inference downstream is unchanged."""
        meshes = self.discretize_sdf_host(ratio, -self.sdf_shrink,
                                          seg3d_cfg=seg3d_cfg)
        body = meshes[0]
        garments = meshes[1:]
        assert len(body[0]) > 0, "tmp sdf vanished"

        def cap_pad(v, f):
            cv = 1 << int(np.ceil(np.log2(max(len(v), 1) * 1.15 + 1)))
            cf = 1 << int(np.ceil(np.log2(max(len(f), 1) * 1.15 + 1)))
            vp = np.zeros((max(cv, 2048), 3), np.float32)
            vp[: len(v)] = v
            fp = np.zeros((max(cf, 2048), 3), np.int32)
            fp[: len(f)] = f
            return jnp.asarray(vp), jnp.asarray(fp)

        b_v, b_f = cap_pad(*body)
        g_pad = [cap_pad(*g) for g in garments]
        self.mesh = MeshState(
            body_vs=b_v, body_fs=b_f, body_n=len(body[0]),
            garment_vs=[t[0] for t in g_pad],
            garment_fs=[t[1] for t in g_pad],
            garment_n=[len(g[0]) for g in garments],
            garment_fn=[len(g[1]) for g in garments],
        )
        self.remesh_time = 1.0 + np.floor(self.remesh_time)
        self._remeshed_at = self.opt_times
        self.vert_opt_state = self.vert_opt.init(tuple(self.mesh.garment_vs))
        if self.params.get("curves"):
            self.curve_opt_state = self.curve_opt.init(self.params["curves"])

    def marching_cube_update(self, ratio):
        """Extract fresh explicit meshes and reset their optimizers
        (marching_cube_update, OptimGarmentNetwork.py:678-741).

        Buffers are trimmed to a *hysteresis capacity* (next power of two
        above 1.5x the live count) so downstream jitted work scales with
        the real mesh, not the MC extraction ceiling; shapes stay stable
        across remeshes unless the mesh grows past the slack."""
        import sys as _sys, time as _t

        _sys.stderr.write("[net] remesh: discretizing SDFs...\n"); _sys.stderr.flush()
        _t0 = _t.time()
        fresh_body = self.mesh is None
        meshes = self.discretize_sdf(ratio, -self.sdf_shrink,
                                     include_body=fresh_body)
        _t1 = _t.time()
        if fresh_body:
            body = meshes[0]
            garments = meshes[1:]
            assert body[2] > 0, "tmp sdf vanished"
        else:
            # body MC mesh has no in-training consumer; keep the previous
            # extraction (see discretize_sdf docstring)
            body = (None, None, self.mesh.body_n, None)
            garments = meshes

        floor_v = self._garment_cap_floor()

        def cap_of(n, floor=2048):
            # slack 1.15: the padded tail feeds every downstream bin sort
            # and deformer call, so keep it tight; meshes rarely grow >15%
            # between remeshes (recompile if they do)
            c = 1 << int(np.ceil(np.log2(max(n, 1) * 1.15 + 1)))
            return max(c, 2048, floor)

        def trim(v, f, nv, nf):
            # marching_cubes returns lane-major (3, cap); trim then
            # transpose so only the small (cap, 3) buffer materializes.
            # One jitted call — eager slice/transpose ops each cost a
            # remote-compile round trip over the axon tunnel (~12 s of
            # the r3 warm remesh was this).
            cv = min(cap_of(nv, floor_v), v.shape[1])
            cf = min(cap_of(nf, 2 * floor_v), f.shape[1])
            return _trim_mesh(v, f, cv, cf)

        if fresh_body:
            b_v, b_f = trim(*body)
        else:
            b_v, b_f = self.mesh.body_vs, self.mesh.body_fs
        g_trim = [trim(*g) for g in garments]
        self.mesh = MeshState(
            body_vs=b_v, body_fs=b_f, body_n=body[2],
            garment_vs=[t[0] for t in g_trim],
            garment_fs=[t[1] for t in g_trim],
            garment_n=[g[2] for g in garments],
            garment_fn=[g[3] for g in garments],
        )
        self.remesh_time = 1.0 + np.floor(self.remesh_time)
        self._remeshed_at = self.opt_times   # dedupe warm_start + step-1
        self.vert_opt_state = self.vert_opt.init(tuple(self.mesh.garment_vs))
        if self.params.get("curves"):
            self.curve_opt_state = self.curve_opt.init(self.params["curves"])
        self.info["remesh"] = self.remesh_time
        jax.block_until_ready(self.mesh.garment_vs)
        _sys.stderr.write(f"[net] remesh done: extract {_t1-_t0:.1f}s "
                          f"trim+reset {_t.time()-_t1:.1f}s caps="
                          f"{[t[0].shape[0] for t in g_trim]}\n")
        _sys.stderr.flush()

    def step_cost_analysis(self) -> dict | None:
        """FLOP/byte counts of the current step executables (XLA cost
        analysis), for honest MFU accounting in the benches. Sums over
        every phase executable in the live jit cache that has been
        AOT-compiled (fused mode: just ``step``). None when nothing is
        compiled yet or the backend can't report costs."""
        tot = {}
        for tag, fn in (self._jit_cache or {}).items():
            compiled = getattr(fn, "_compiled", None)
            if compiled is None:
                continue
            try:
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                for k in ("flops", "bytes accessed"):
                    if k in ca:
                        tot[k] = tot.get(k, 0.0) + float(ca[k])
            except Exception:
                continue
        return tot or None

    def _garment_cap_floor(self) -> int:
        """Resolved garment vertex-capacity floor (TrainConfig.mesh_cap_floor)."""
        f = int(self.cfg.mesh_cap_floor)
        if f >= 0:
            return f
        cells = 1
        for d in self.seg3d_cfg.resolutions[-1]:
            cells *= int(d)
        if cells < (1 << 24):
            return 0
        n_g = max(1, len(self.statics.garment_names))
        est = 1.2 * cells ** (2.0 / 3.0) / n_g
        return 1 << int(np.ceil(np.log2(est)))

    # ------------------------------------------------------------------
    # shared sub-steps
    # ------------------------------------------------------------------

    def _ratio_dict(self, ratio):
        """Normalize to a dict of *traced* scalars so the annealing ratio
        (which changes every step) does not force retraces."""
        if not isinstance(ratio, dict):
            ratio = {"sdfRatio": 1.0, "deformerRatio": ratio, "renderRatio": 1.0}
        return {k: jnp.asarray(v, jnp.float32) for k, v in ratio.items()}

    def _camera(self, scene):
        return scene_camera(scene, self.statics.image_size)

    def _deform_garment_verts(self, gparams, scene, garment_vs_list, frame_ids, ratio,
                              gi0: int = 0, with_lbs_only: bool = False):
        """Per garment: (N, cap, 3) posed vertices.

        ``gi0`` is the garment index of ``garment_vs_list[0]`` in the
        scene's garment ordering — callers passing a sublist (e.g. a
        single garment's verts) must set it so each garment is deformed
        with ITS deformer latent (conds[gi0+k+1]), not garment 0's.

        with_lbs_only=True: each entry is (posed, lbs_only) — the
        def-consistency pair from one shared weight-field sampling."""
        r = self._ratio_dict(ratio)
        conds = split_deform_conds(scene["conds"]["deformer"][frame_ids], self.statics.garment_size)
        poses = scene["poses"][frame_ids]
        trans = scene["trans"][frame_ids]
        out = []
        for gi, vs in enumerate(garment_vs_list):
            model_params = {"translator": gparams["translator"], "skinner": self.params["skinner"]}
            deform = make_deform_fn(model_params, self.statics, conds[gi0 + gi + 1], poses,
                                    trans, r["deformerRatio"],
                                    with_lbs_only=with_lbs_only)
            N = frame_ids.shape[0]
            out.append(deform(jnp.broadcast_to(vs, (N,) + vs.shape)))
        return out

    # (The loss branches live in core/train_step.py as pure jitted
    # functions; this class wires them together per step.)

    # ------------------------------------------------------------------
    # ① curve (feature-line) branch
    # ------------------------------------------------------------------

    def _body_zbuf_image(self, gparams, scene, frame_ids, cam):
        """LBS-posed SMPL body z-buffer per frame with background filled by
        the max body depth (fl_visible_by_body_zbuff,
        OptimGarmentNetwork.py:1444-1460). Visibility is a gate, not a
        gradient path (the reference computes it under no_grad)."""
        from .visibility import mesh_zbuf_image

        N = frame_ids.shape[0]
        poses = scene["poses"][frame_ids]
        trans = scene["trans"][frame_ids]
        body = jnp.broadcast_to(self.tmp_body_vs, (N,) + self.tmp_body_vs.shape)
        posed = skinner_apply(self.params["skinner"], body, poses, trans)
        zb = mesh_zbuf_image(cam, posed, self.tmp_body_fs,
                             self.statics.image_size,
                             tile=self.cfg.raster_tile,
                             cap=self.cfg.raster_cap_mesh,
                             downscale=self.cfg.zbuf_downscale)
        return zb, posed

    def _sample_zbuf(self, zbuf, screen_pts):
        from .visibility import sample_zbuf

        return sample_zbuf(zbuf, screen_pts, self.statics.image_size)

    def fl_branch_loss(self, gparams, curve_params, frame_ids, fl_pts, fl_masks,
                       ratio, garment_vs_t=None, garment_fs_t=None):
        """project_2d_loss (OptimGarmentNetwork.py:1772-1884): visibility-
        gated, area-weighted 2D chamfer + curve regularizers + garment-SDF
        anchoring of the canonical curves. Returns (10·sdf + 1·proj, info).

        The visibility gate follows ``loss.fl_visible_method``: 'zbuff'
        (body z-buffer, reference default), 'garment_zbuff', 'zbuff_and'
        (both — inter-garment occlusion), 'surface' or 'sdf' (posed-normal
        facing) — see core/visibility.py."""
        from .visibility import (
            combine_visibility,
            mesh_zbuf_image,
            normal_visible,
            outward_curve_normals,
            sample_zbuf,
            warp_normals_to_posed,
            zbuf_visible,
        )

        scene = gparams["scene"]
        cam = self._camera(scene)
        N = frame_ids.shape[0]
        r = self._ratio_dict(ratio)
        cs = self.curve_statics
        curves = curves_forward(curve_params, cs)  # (C, S, 3)
        conds = split_deform_conds(scene["conds"]["deformer"][frame_ids],
                                   self.statics.garment_size)
        poses = scene["poses"][frame_ids]
        trans = scene["trans"][frame_ids]
        method = self.conf.get_string("fl_visible_method", "zbuff")
        # ZBUF_THRESHOLD is tuned for real SMPL bodies (~0.25 m chest
        # depth); scenes with thinner bodies (synthetic humanoid: ~0.08 m)
        # need a smaller gate or back-of-ring points leak through as
        # "visible" and the 2D chamfer collapses the ring inward
        # (measured: back dz 0.099 vs the 0.1 neck threshold).
        thr_scale = float(self.conf.get_float(
            "fl_weight.zbuf_threshold_scale", 1.0))
        need_body = method in ("zbuff", "zbuff_and")
        need_garment = (method in ("garment_zbuff", "zbuff_and")
                        and garment_vs_t is not None)
        zbuf = None
        if need_body:
            zbuf, _ = self._body_zbuf_image(gparams, scene, frame_ids, cam)

        name_to_idx = {n: i for i, n in enumerate(cs.fl_names)}
        # dataset gt columns may be a superset of the parameterized curves
        ds_col = {n: i for i, n in enumerate(self.dataset.fl_names)}
        info = {}
        proj_loss = 0.0
        fl_sdf_loss = 0.0
        S = curves.shape[1]

        for gi, gname in enumerate(self.statics.garment_names):
            fl_names = [n for n in FL_EXTRACT[gname] if n in name_to_idx]
            model_params = {"translator": gparams["translator"],
                            "skinner": self.params["skinner"]}
            deform = make_deform_fn(model_params, self.statics, conds[gi + 1],
                                    poses, trans, r["deformerRatio"])
            g_zbuf = None
            if need_garment:
                # deformed garment MC mesh z-buffer for inter-garment
                # occlusion (fl_visible_by_garment_zbuff :1473-1515)
                def_gvs = self._deform_garment_verts(
                    {"translator": gparams["translator"]}, scene,
                    [garment_vs_t[gi]], frame_ids, ratio, gi0=gi)[0]
                g_zbuf = mesh_zbuf_image(cam, def_gvs, garment_fs_t[gi],
                                         self.statics.image_size,
                                         tile=self.cfg.raster_tile,
                                         cap=self.cfg.raster_cap_mesh,
                                         downscale=self.cfg.zbuf_downscale)
            g_proj = 0.0
            for cname in fl_names:
                ci = name_to_idx[cname]
                cv = curves[ci]  # (S, 3)
                def_fl = deform(jnp.broadcast_to(cv, (N, S, 3)))  # (N,S,3)
                # (x_pix, y_pix, z_cam) — depth probes MUST be in the
                # rasterizer's camera-space depth (r1 compared world z
                # against cam-z zbuf, so the gate never fired)
                scr = screen_with_cam_z(cam, def_fl)
                body_vis = garment_vis = nrm_vis = None
                if need_body:
                    # body z-buffer: smpl-space curve (LBS only)
                    smpl_cv = cs.cano_smpl_verts[ci]
                    def_smpl = skinner_apply(self.params["skinner"],
                                             jnp.broadcast_to(smpl_cv, (N, S, 3)),
                                             poses, trans)
                    scr_smpl = screen_with_cam_z(cam, def_smpl)
                    surf_z = sample_zbuf(zbuf, scr_smpl, self.statics.image_size)
                    body_vis = zbuf_visible(scr_smpl[..., 2], surf_z,
                                            ZBUF_THRESHOLD[cname] * thr_scale)
                if need_garment:
                    scr_ng = jax.lax.stop_gradient(scr)
                    surf_zg = sample_zbuf(g_zbuf, scr_ng,
                                          self.statics.image_size)
                    garment_vis = zbuf_visible(scr_ng[..., 2], surf_zg,
                                               ZBUF_THRESHOLD[cname] * thr_scale)
                if method in ("surface", "sdf"):
                    if method == "surface":
                        nrm = outward_curve_normals(cv)
                    else:
                        nrm = sdf_gradient(gparams["garment_sdfs"][gi],
                                           self.statics.garment_sdf, cv,
                                           r["sdfRatio"])
                        nrm = nrm / jnp.clip(
                            jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                            1e-9, None)
                    S_ = cv.shape[0]
                    flat = jnp.broadcast_to(cv, (N, S_, 3)).reshape(-1, 3)
                    b_inds = jnp.repeat(jnp.arange(N), S_)
                    deform_flat = make_deform_fn(
                        model_params, self.statics, conds[gi + 1], poses,
                        trans, r["deformerRatio"], batch_inds=b_inds)
                    n_flat = jnp.broadcast_to(nrm, (N, S_, 3)).reshape(-1, 3)
                    posed_n = warp_normals_to_posed(
                        deform_flat, jax.lax.stop_gradient(flat),
                        jax.lax.stop_gradient(n_flat))
                    nrm_vis = normal_visible(posed_n.reshape(N, S_, 3))
                visible = jax.lax.stop_gradient(
                    combine_visibility(method, body_vis, garment_vis, nrm_vis))
                col = ds_col[cname]
                frame_mask = fl_masks[:, col]  # (N,)
                pred_valid = visible & frame_mask[:, None]
                gt = fl_pts[:, col]  # (N, G, 2)
                w_curve = float(self.dataset.fl_weights.get(cname, 1.0))

                def frame_cham(scr_f, pv_f, gt_f):
                    d2 = jnp.sum((scr_f[:, None, :2] - gt_f[None, :, :]) ** 2, -1)
                    big = 1e12
                    min_pg = jnp.min(jnp.where(pv_f[:, None], d2, big), axis=0)  # gt→pred
                    min_gp = jnp.min(d2, axis=1)  # pred→gt (gt always full)
                    any_v = jnp.any(pv_f)
                    s = jnp.sum(jnp.where(pv_f, min_gp, 0.0)) + jnp.where(any_v, jnp.sum(min_pg), 0.0)
                    return jnp.where(any_v, s, 0.0)

                chams = jax.vmap(frame_cham)(scr, pred_valid, gt)  # (N,)
                valid_frames = jnp.sum((jnp.sum(pred_valid, -1) > 0).astype(jnp.float32))
                batch_loss = w_curve * jnp.sum(chams) / jnp.clip(valid_frames, 1.0, None)
                n_vis = jnp.sum(pred_valid.astype(jnp.float32))
                g_proj = g_proj + batch_loss / jnp.clip(n_vis, 1.0, None)
            n_fl = max(len(fl_names), 1)
            fl_w = float(self.conf.get_float("fl_weight.weight", 1.0))
            g_proj = g_proj / n_fl * fl_w
            info[f"{gname}_project_loss"] = g_proj
            proj_loss = proj_loss + g_proj

            # canonical curve anchored to the garment SDF
            cano_fl = jnp.concatenate([curves[name_to_idx[n]] for n in fl_names], 0)
            sdfv = sdf_value(gparams["garment_sdfs"][gi], self.statics.garment_sdf,
                             cano_fl, r["sdfRatio"])
            s_loss = jnp.mean(jnp.abs(sdfv + self.sdf_shrink))
            info[f"fl_pc_{gname}_loss_sdf"] = s_loss
            fl_sdf_loss = fl_sdf_loss + s_loss * float(
                self.conf.get_float("fl_weight.sdf_weight", 60.0))

        reg = curves_regularization(curve_params, cs, fl_masks)
        center_w = float(self.conf.get_float("alpha_weight.center_weight", 1.0))
        diff_w = float(self.conf.get_float("alpha_weight.diff_weight", 1.0))
        proj_loss = proj_loss + reg["center_offset"] * center_w + reg["diff_a_loss"] * diff_w
        info["fl_center_loss"] = reg["center_offset"] * center_w
        info["fl_diff_loss"] = reg["diff_a_loss"] * diff_w
        return 10.0 * fl_sdf_loss + 1.0 * proj_loss, info

    # ------------------------------------------------------------------
    # ② mask (point-cloud) branch
    # ------------------------------------------------------------------

    def pc_branch_loss(self, garment_vs_tuple, gparams, frame_ids, gt_garment_masks,
                       ratio, counts, gt_pooled=None):
        """mask_loss (OptimGarmentNetwork.py:841-981): joint point-cloud
        rendering of all garments with per-garment feature split (handles
        inter-garment occlusion), IoU vs max-pooled gt masks + deformation
        consistency. Differentiated wrt the MC vertices (and, through
        rendering/deformation, the global params)."""
        scene = gparams["scene"]
        cam = self._camera(scene)
        N = frame_ids.shape[0]
        r = self._ratio_dict(ratio)
        W, H = self.statics.image_size
        radius = self.cfg.point_radius
        radius_px = L.point_render_radius_px(radius, H, W)

        need_cons = float(self.conf.get_float(
            "pc_weight.def_consistent.weight", -1.0)) > 0
        deformed = self._deform_garment_verts(
            {"translator": gparams["translator"]}, scene, list(garment_vs_tuple),
            frame_ids, ratio, with_lbs_only=need_cons)
        if need_cons:
            def_vs = [d[0] for d in deformed]
            lbs_vs = [d[1] for d in deformed]
        else:
            def_vs, lbs_vs = deformed, None
        all_def = jnp.concatenate(def_vs, axis=1)  # (N, ΣcapV, 3)
        caps = [v.shape[0] for v in garment_vs_tuple]
        valid_sections = [jnp.arange(cap) < counts[i] for i, cap in enumerate(caps)]
        valid_all = jnp.concatenate(valid_sections)

        total = 0.0
        info = {}
        # Soft-mask render resolution: IoU on the dilated gt mask is a
        # coverage signal, not a sharp-boundary one (the gt is max-pooled
        # by the splat radius anyway), so at production image sizes it is
        # rendered at 1/s res — splat radius is NDC-relative so coverage
        # is unchanged, and the point-side binning/compositing cost
        # (the dominant pc-branch line after the deformer, ~60 ms/step
        # at the 1080p fine caps — r4 trace) drops ~s².
        ds = max(1, int(self.cfg.mask_render_downscale))
        Hm, Wm = H // ds, W // ds
        # gt masks travel to the device as bool (_device_batch); their
        # dilation is static per (frame batch, radius) so the device
        # batch caches it (gt_pooled) — recomputing the 1080² 13×13
        # reduce_window every step cost ~20 ms/step on-device in r3
        if gt_pooled is not None:
            # packed channels-last [pooled, keep] (N, H, W, 2) from
            # _device_batch — unpack BEFORE the ds stride so it hits
            # (H, W), not (W, channel)
            mgt_list = [L.unpack_pooled_gt(m, ds, Hm, Wm) for m in gt_pooled]
        else:
            mgt_list = []
            for m in gt_garment_masks:
                pooled = L.max_pool_mask(m.astype(jnp.float32), radius_px)
                if ds > 1:
                    pooled = pooled[..., ::ds, ::ds][..., :Hm, :Wm]
                mgt_list.append((pooled, None))

        # per-garment section one-hots as feature channels: one fused
        # composite pass renders every garment's soft mask at once
        # (identical to the reference's per-section zero_mask renders)
        sections = jnp.concatenate([
            jax.nn.one_hot(jnp.full((caps[s],), s), len(caps))
            for s in range(len(caps))
        ])  # (ΣcapV, G)

        def render_frame(pts_f):
            scr = screen_with_cam_z(cam, pts_f)
            if ds > 1:
                scr = jnp.concatenate([scr[..., :2] / ds, scr[..., 2:]], -1)
            # hide padding points behind the camera
            scr = jnp.where(valid_all[:, None], scr, jnp.asarray([0.0, 0.0, -1.0]))
            # per-tile candidate cap scales with ds (4x fewer tiles → up
            # to 4x the point density per tile; z-ordered binning keeps
            # the nearest, so overflow only drops fully-occluded points)
            img = composite_points(scr, radius, sections, (Hm, Wm),
                                   tile=self.cfg.raster_tile,
                                   cap=self.cfg.raster_cap_points * ds,
                                   features_const=True)
            return jnp.moveaxis(img, -1, 0)  # (G, Hm, Wm)

        masks = jax.lax.map(render_frame, all_def)  # (N, G, Hm, Wm)

        for gi, gname in enumerate(self.statics.garment_names):
            pooled_g, keep_g = mgt_list[gi]
            m_loss = L.iou_mask_loss(masks[:, gi], pooled_g, keep=keep_g)
            info[f"{gname}_mask_loss"] = m_loss
            total = total + m_loss * float(self.conf.get_float("pc_weight.mask_weight", 1.0))
            cw = float(self.conf.get_float("pc_weight.def_consistent.weight", -1.0))
            if cw > 0:
                lbs_only = lbs_vs[gi]
                c = float(self.conf.get_float("pc_weight.def_consistent.c", 0.01))
                off2 = jnp.sum((def_vs[gi] - lbs_only) ** 2, -1)
                vmask = valid_sections[gi][None, :]
                from ..ops.math3d import gm_robust_error
                if c > 0:
                    cons = L.masked_mean(gm_robust_error(off2, c, True), vmask)
                else:
                    cons = L.masked_mean(jnp.sqrt(off2 + 1e-12), vmask)
                info[f"{gname}_defconst_loss"] = cons
                total = total + cons * cw
        return total, (info, masks, def_vs)

    # ------------------------------------------------------------------
    # ray machinery: find surface seeds → sample ray budget → solve
    # ------------------------------------------------------------------

    def find_and_sample_rays(self, gparams, frame_ids, gt_garment_masks, ratio, key,
                             garment_vs_t, garment_fs_t, def_vs=None):
        """find_surface_ps + sample_train_ray (OptimGarmentNetwork.py:742,
        983): rasterize the deformed MC garment meshes, take first-hit
        canonical surface seeds per pixel, keep pixels inside the gt
        garment mask, and compact to a fixed per-garment ray budget with
        random top-k (replacing the reference's rand-subsample of
        dynamic-size index lists).

        Returns per garment dicts of (budget,)-shaped arrays:
        batch_inds, rows, cols, init_pts, rays, valid.
        """
        scene = gparams["scene"]
        cam = self._camera(scene)
        N = frame_ids.shape[0]
        W, H = self.statics.image_size
        budget = max(self.cfg.sample_pix // self.statics.garment_size, 1) * N
        # Seeding runs at 1/s resolution: the raster only nominates
        # candidate pixels + Newton seeds — the sampled pixel itself, its
        # gt mask test and its gt color all stay full-res (strided grid),
        # and the surface solver's distance/angle gate discards any ray
        # the coarser hit test mis-nominates. s=2 quarters the dominant
        # raster + top_k cost of the rays phase.
        s = max(1, int(self.cfg.seed_downscale))
        Hs, Ws = H // s, W // s

        if def_vs is None:
            def_vs = self._deform_garment_verts(
                {"translator": gparams["translator"]}, scene,
                list(garment_vs_t), frame_ids, ratio)

        out = []
        for gi in range(self.statics.garment_size):
            fs = garment_fs_t[gi]
            cano = garment_vs_t[gi]

            def per_frame(pv):
                scr = screen_with_cam_z(cam, pv)
                if s > 1:
                    scr = jnp.concatenate([scr[..., :2] / s, scr[..., 2:]], -1)
                frag = rasterize_mesh(scr, fs, (Hs, Ws), tile=self.cfg.raster_tile,
                                      cap=self.cfg.raster_cap_mesh)
                hit = (frag.pix_to_face[..., 0] >= 0) & (frag.bary_coords[..., 0, :] > 0).all(-1)
                fid = jnp.maximum(frag.pix_to_face[..., 0], 0)
                wts = frag.bary_coords[..., 0, :]
                tri = cano[fs[fid]]
                pts = jnp.einsum("hwk,hwkc->hwc", jnp.where(hit[..., None], wts, 0.0), tri)
                return hit, pts

            hits, pts = jax.lax.map(per_frame, jax.lax.stop_gradient(def_vs[gi]))
            gt_s = gt_garment_masks[gi][:, ::s, ::s][:, :Hs, :Ws]
            eligible = hits & (gt_s > 0)  # (N, Hs, Ws)
            flat = eligible.reshape(-1)
            key, sub = jax.random.split(key)
            scores = jnp.where(flat, jax.random.uniform(sub, flat.shape), -1.0)
            _, idx = jax.lax.top_k(scores, min(budget, flat.shape[0]))
            valid = flat[idx]
            b = idx // (Hs * Ws)
            rr = ((idx % (Hs * Ws)) // Ws) * s
            cc = (idx % Ws) * s
            init_pts = pts.reshape(-1, 3)[idx]
            pix = jnp.stack([cc.astype(jnp.float32), rr.astype(jnp.float32),
                             jnp.ones_like(cc, jnp.float32)], -1)
            rays = cam_mod.view_rays(cam, pix)
            out.append(dict(batch_inds=b, rows=rr, cols=cc, init_pts=init_pts,
                            rays=rays, valid=valid))
        return out, key

    def solve_surface_points(self, gparams, ray_data, frame_ids, ratio):
        """opt_garment_surface_ps (OptimGarmentNetwork.py:1057): refine the
        seeds to exact surface/ray intersections per garment."""
        scene = gparams["scene"]
        cam = self._camera(scene)
        r = self._ratio_dict(ratio)
        conds = split_deform_conds(scene["conds"]["deformer"][frame_ids],
                                   self.statics.garment_size)
        poses = scene["poses"][frame_ids]
        trans = scene["trans"][frame_ids]
        origin = jax.lax.stop_gradient(cam_mod.cam_pos(cam))
        results = []
        for gi, rd in enumerate(ray_data):
            model_params = {"translator": gparams["translator"],
                            "skinner": self.params["skinner"]}
            deform = make_deform_fn(model_params, self.statics, conds[gi + 1],
                                    poses, trans, r["deformerRatio"],
                                    batch_inds=rd["batch_inds"])
            sdf_fn = lambda p, gi=gi: sdf_value(
                gparams["garment_sdfs"][gi], self.statics.garment_sdf, p, r["sdfRatio"])
            pts, conv = optimize_surface_points(
                sdf_fn, deform, origin, jax.lax.stop_gradient(rd["rays"]),
                jax.lax.stop_gradient(rd["init_pts"]), rd["valid"],
                dthreshold=5e-5, athreshold_deg=self.ang_thred,
                times=self.cfg.solver_times,
            )
            results.append(dict(pts=pts, conv=conv, **rd))
        return results

    # ------------------------------------------------------------------
    # ③ main loss (IDR render + pc-sdf + curve-aware + DCT)
    # ------------------------------------------------------------------

    def main_loss(self, gparams, curve_params, solved, frame_ids, batch,
                  garment_vs_t, counts, win_ids, ratio, key):
        scene = gparams["scene"]
        cam = self._camera(scene)
        N = frame_ids.shape[0]
        r = self._ratio_dict(ratio)
        conds = split_deform_conds(scene["conds"]["deformer"][frame_ids],
                                   self.statics.garment_size)
        rendcond = scene["conds"]["render"][frame_ids]
        poses = scene["poses"][frame_ids]
        trans = scene["trans"][frame_ids]
        gtCs = batch["img"]
        info = {}
        total = 0.0

        # pc-sdf: anchor updated explicit verts to the implicit surfaces
        pc_w = float(self.conf.get_float("pc_weight.weight", 60.0))
        for gi, gname in enumerate(self.statics.garment_names):
            vs = garment_vs_t[gi]
            valid = jnp.arange(vs.shape[0]) < counts[gi]
            sdfv = sdf_value(gparams["garment_sdfs"][gi], self.statics.garment_sdf,
                             jax.lax.stop_gradient(vs), r["sdfRatio"],
                             compute_dtype=jnp.bfloat16)
            s_loss = L.sdf_shrink_loss(sdfv, self.sdf_shrink, valid)
            info[f"pc_{gname}_loss_sdf"] = s_loss
            total = total + s_loss * pc_w

        # curve-aware hemline disc loss (OptimGarmentNetwork.py:787-839)
        ca_w = float(self.conf.get_float("pc_weight.curve_aware_weight", 0.0))
        target_curve = None
        if "upper_bottom" in self.curve_statics.fl_names:
            target_curve = "upper_bottom"
        elif self.dataset.garment_type in CURVE_AWARE and self.isfine:
            target_curve = CURVE_AWARE[self.dataset.garment_type]
        if ca_w > 0 and target_curve is not None:
            ci = list(self.curve_statics.fl_names).index(target_curve)
            cv = curves_forward(curve_params, self.curve_statics)[ci]
            center = cv.mean(0, keepdims=True)
            Sn = cv.shape[0]
            key, sub = jax.random.split(key)
            # sample the fan disc: random triangle (i, i+1, center) + bary
            tri_i = jax.random.randint(sub, (50000,), 0, Sn)
            key, sub = jax.random.split(key)
            uv = jax.random.uniform(sub, (50000, 2))
            u = jnp.where(uv[:, 0] + uv[:, 1] > 1, 1 - uv[:, 0], uv[:, 0])
            v = jnp.where(uv[:, 0] + uv[:, 1] > 1, 1 - uv[:, 1], uv[:, 1])
            a = cv[tri_i]
            b = cv[(tri_i + 1) % Sn]
            pts = a * u[:, None] + b * v[:, None] + center * (1 - u - v)[:, None]
            sdfv = sdf_value(gparams["garment_sdfs"][-1], self.statics.garment_sdf,
                             jax.lax.stop_gradient(pts), r["sdfRatio"],
                             compute_dtype=jnp.bfloat16)
            ca_loss = jnp.mean(jnp.abs(sdfv + self.sdf_shrink))
            info["curve_aware_loss"] = ca_loss
            total = total + ca_loss * ca_w

        # IDR surface rendering per garment
        for gi, gname in enumerate(self.statics.garment_names):
            sd = solved[gi]
            gsdf = gparams["garment_sdfs"][gi]
            d_cond = conds[gi + 1]
            model_params = {"translator": gparams["translator"],
                            "skinner": self.params["skinner"]}
            deform = make_deform_fn(model_params, self.statics, d_cond, poses,
                                    trans, r["deformerRatio"],
                                    batch_inds=sd["batch_inds"])

            # eikonal on local+global samples around surface pts + verts
            key, sub = jax.random.split(key)
            vs = garment_vs_t[gi]
            key, s2 = jax.random.split(key)
            vsel = jax.random.randint(s2, (self.cfg.surface_sample,), 0, vs.shape[0])
            vsel = vsel % jnp.maximum(counts[gi], 1)
            base = jnp.concatenate([sd["pts"], jax.lax.stop_gradient(vs[vsel])], 0)
            key, s3 = jax.random.split(key)
            local = base + 0.01 * jax.random.normal(s3, base.shape)
            key, s4 = jax.random.split(key)
            glob = jax.random.uniform(s4, (base.shape[0] // 6, 3), minval=-1.8, maxval=1.8)
            nonmnfld = jnp.concatenate([local, glob], 0)
            _, grads = sdf_value_and_gradient(gsdf, self.statics.garment_sdf,
                                              nonmnfld, r["sdfRatio"])
            g_loss = L.eikonal_loss(grads)
            info[f"{gname}_grad_loss"] = g_loss
            total = total + g_loss * float(self.conf.get_float("grad_weight", 1.0))

            # deformation rigidity on the offset field
            dr_w = float(self.conf.get_float("def_regu.weight", 0.0))
            if dr_w > 0:
                key, s5 = jax.random.split(key)
                reg_base = jnp.concatenate([base, base + 0.01 * jax.random.normal(s5, base.shape)], 0)

                def off_map(p):
                    B = N
                    pb = jnp.broadcast_to(p, (B,) + p.shape)
                    cond_b = jnp.broadcast_to(d_cond[:, None, :], (B, p.shape[0], d_cond.shape[-1]))
                    out, _ = translator_apply(gparams["translator"], self.statics.translator,
                                              pb, cond_b, r["deformerRatio"])
                    return out

                # Jacobian of the canonical offset field per point, frame 0
                def off_single(p):
                    cond_b = d_cond[0]
                    out, _ = translator_apply(gparams["translator"], self.statics.translator,
                                              p[None], cond_b[None], r["deformerRatio"])
                    return out[0]

                Jo = jax.vmap(jax.jacfwd(off_single))(reg_base)
                d_loss = L.def_regularization_loss(Jo, float(self.conf.get_float("def_regu.c", 0.5)))
                info[f"def_{gname}_loss"] = d_loss
                total = total + d_loss * dr_w

            # color + normal on converged rays, with the implicit adjoint
            conv = sd["conv"]
            aux_params = {
                "gsdf": gsdf, "translator": gparams["translator"],
                "scene_poses": poses, "scene_trans": trans, "d_cond": d_cond,
                "camera": scene["camera"],
            }
            rays = sd["rays"]
            b_inds = sd["batch_inds"]

            def sdf_fn_adj(prm, pts):
                return sdf_value(prm["gsdf"], self.statics.garment_sdf, pts, r["sdfRatio"])

            def constraint_fn_adj(prm, pts):
                mp = {"translator": prm["translator"], "skinner": self.params["skinner"]}
                dfn = make_deform_fn(mp, self.statics, prm["d_cond"], prm["scene_poses"],
                                     prm["scene_trans"], r["deformerRatio"],
                                     batch_inds=b_inds)
                camera = scene_camera({"camera": prm["camera"]}, self.statics.image_size)
                origin = cam_mod.cam_pos(camera)
                return ray_constraint(dfn(pts), origin, rays)

            attach = make_implicit_surface_adjoint(sdf_fn_adj, constraint_fn_adj)
            TmpPs = attach(aux_params, sd["pts"])

            sdfs, feat = sdf_apply(gsdf, self.statics.garment_sdf, TmpPs, r["sdfRatio"])
            # forward-mode point gradient (reverse-mode trips the axon
            # TPU compiler — see models/sdf.py docstring)
            nx = sdf_gradient(gsdf, self.statics.garment_sdf, TmpPs, r["sdfRatio"])
            nx = nx / jnp.clip(jnp.linalg.norm(nx, axis=-1, keepdims=True), 1e-9, None)

            from ..models.deformer import cardinal_rays_from_jac, deformer_jacobian

            jac = deformer_jacobian(deform, TmpPs)
            crays, _ = cardinal_rays_from_jac(jac, rays)
            defVs = deform(TmpPs)

            cw = float(self.conf.get_float("color_weight", 0.0))
            if cw > 0:
                from ..models.render_net import render_net_apply

                # feature = the SDF's 256-d rendcond (the reference's
                # compute_netRender_color ignores the per-frame rendcond
                # argument, utils/utils.py:252-264 — kept for parity)
                colors = render_net_apply(gparams["render"], self.statics.render,
                                          TmpPs, nx, crays, feat,
                                          ratio=r["renderRatio"])
                gt_rgb = gtCs[b_inds, sd["rows"], sd["cols"]]
                if gt_rgb.dtype == jnp.uint8:   # compact upload: expand
                    gt_rgb = gt_rgb.astype(jnp.float32) / 127.5 - 1.0
                c_loss = L.color_loss(colors, gt_rgb, b_inds, conv, N)
                info[f"{gname}_color_loss"] = c_loss
                total = total + cw * c_loss

            nw = float(self.conf.get_float("normal_weight", 0.0))
            if nw > 0 and "normal" in batch:
                gtn = batch["normal"][b_inds, sd["rows"], sd["cols"]]
                if gtn.dtype == jnp.uint8:      # compact upload: expand
                    gtn = gtn.astype(jnp.float32) / 127.5 - 1.0
                from ..models.deformer import deformed_normals_from_grads

                cnx, _ = deformed_normals_from_grads(jax.lax.stop_gradient(jac),
                                                     jax.lax.stop_gradient(nx))
                n_loss = L.normal_pullback_loss(
                    gtn, jac, nx, rays, cam.R, b_inds, conv, N,
                    weighted=bool(self.conf.get_bool("weighted_normal", True)),
                    deformed_normals=cnx,
                )
                info[f"{gname}_normal_loss"] = n_loss
                total = total + nw * n_loss

        # DCT temporal prior over posed joints
        dct_w = float(self.conf.get_float("dct_weight", 0.0))
        if dct_w > 0 and win_ids is not None:
            Nlen = self.dct_null.shape[1]
            wp = scene["poses"][win_ids.reshape(-1)]
            wt = scene["trans"][win_ids.reshape(-1)]
            js = posed_skeleton(self.params["skinner"], wp) + wt[:, None, :]
            d_loss = L.dct_pose_loss(self.dct_null, js.reshape(N, Nlen, 24, 3))
            info["dct_loss"] = d_loss
            total = total + d_loss * dct_w

        return total, info

    def _window_ids(self, fids, Nlen):
        """Global frame indices of the DCT windows (sliding, clamped to
        video segment bounds — matches dataset.get_batchframe_data)."""
        idx_helper = np.arange(self.dataset.frame_num) + self.dataset.start_idx
        self.dataset._frame_index_helper = idx_helper
        win, _ = self.dataset.get_batchframe_data("_frame_index_helper", fids, Nlen)
        return win

    # ------------------------------------------------------------------
    # the full optimization step (reference forward + train.py loop body)
    # ------------------------------------------------------------------

    def _garment_mask_keys(self):
        """gt garment mask key per garment from parsing groups
        (forward, OptimGarmentNetwork.py:1888-1904): upper-type garments
        read 'upper', pants/skirts read 'bottom'; single-garment subjects
        with is_upper_bottom use the joint mask."""
        keys = []
        for gname in self.statics.garment_names:
            if self.statics.garment_size == 1 and bool(
                self.full_conf.get_bool("train.is_upper_bottom", False)
            ):
                keys.append("upper_bottom")
            elif gname in ("long_pants", "short_pants", "skirt"):
                keys.append("bottom")
            else:
                keys.append("upper")
        return keys

    def garment_masks_from_batch(self, batch):
        return [jnp.asarray(batch[k]) for k in self._garment_mask_keys()]

    _MASK_KEYS = ("mask", "upper", "bottom", "upper_bottom", "body")

    def _device_batch(self, batch, frame_ids):
        """Upload one step's frame data in COMPACT dtypes, cached per
        frame-id tuple. Images/normals come from 8-bit sources, so u8
        upload is lossless (the f32 expansion happens on device after the
        2048-pixel gather); masks travel as bool. This cuts the per-step
        host→device traffic ~4x and makes repeated visits free — at
        1080² over the axon tunnel the f32 uploads alone were ~0.3 s/step
        in r2."""
        W, H = self.statics.image_size
        radius_px = L.point_render_radius_px(self.cfg.point_radius, H, W)
        gate = float(self.conf.get_float("pc_weight.occlusion_gate", -1.0)) > 0
        # the pooled planes depend on the dilation radius and the gate
        # flag — both change at hierarchy phase switches, so they are
        # part of the cache key (r4's 512px quality run degraded after
        # each phase switch because the IoU target kept the coarse
        # phase's wider dilation: an equilibrium the finer splats can
        # never reach, pushing verts outward)
        key = (tuple(int(f) for f in np.asarray(frame_ids)), radius_px, gate)
        hit = self._batch_dev_cache.get(key)
        if hit is not None:
            return hit
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if k in ("img", "normal"):
                out[k] = jnp.asarray(
                    np.rint((v + 1.0) * 127.5).astype(np.uint8))
            elif k in self._MASK_KEYS:
                out[k] = jnp.asarray(v > 0)
            else:
                out[k] = jnp.asarray(v)
        # pre-dilated garment masks for the pc branch (static per frame
        # batch; saves a 1080² reduce_window inside every step). Packed
        # channels-last with a KEEP plane (1=score, 0=body-occluded
        # garment don't-care — see losses.iou_mask_loss): (N, H, W, 2)
        # so the ('data','rays') image sharding still splits N and rows.
        # The gate is OFF unless pc_weight.occlusion_gate > 0: the
        # reference's mask loss has no such gate
        # (OptimGarmentNetwork.py:861-869), so reference parity is the
        # default and the gate is an opt-in for body-occluded scenes.
        pool = self._pool_jit(radius_px)
        occ = out.get("body")
        for k in self._garment_mask_keys():
            if k in out:
                pooled = pool(out[k])
                if gate and occ is not None:
                    keep = jnp.maximum(pooled, 1.0 - occ.astype(jnp.float32))
                else:
                    keep = jnp.ones_like(pooled)
                out[k + "__pooled"] = jnp.stack([pooled, keep], axis=-1)
        if len(self._batch_dev_cache) >= 16:   # FIFO bound on HBM use
            self._batch_dev_cache.pop(next(iter(self._batch_dev_cache)))
        self._batch_dev_cache[key] = out
        return out

    def _pool_jit(self, radius_px):
        fn = self._jit_misc.get(("pool", radius_px))
        if fn is None:
            fn = jax.jit(lambda m: L.max_pool_mask(m.astype(jnp.float32),
                                                   radius_px))
            self._jit_misc[("pool", radius_px)] = fn
        return fn

    def _get_jitted(self, N, caps):
        """Phase functions jitted once per (batch size, mesh capacities,
        loss phase) — all per-step-varying state flows through arguments,
        so steps after the first reuse compiled executables."""
        sig = (N, caps, self._phase_token)
        if self._jit_cache.get("sig") == sig:
            return self._jit_cache
        cache = {"sig": sig}
        from ..utils.exec_cache import LazyAot, cache_enabled

        def _wrap(tag, jitted):
            if self.cfg.exec_cache_dir and self.pmesh is None and cache_enabled():
                return LazyAot(jitted, self.cfg.exec_cache_dir, tag)
            return jitted

        def fl_fn(gp, cp, fids, fl_pts, fl_masks, r, vs_t, fs_t):
            return self.fl_branch_loss(gp, cp, fids, fl_pts, fl_masks, r,
                                       vs_t, fs_t)

        # The curve branch trains ONLY the curve parameters: the reference
        # steps fl_optimizer (AdamW over inter_free_curve alone,
        # OptimGarmentNetwork.py:712,1860-1864) and immediately wipes the
        # backward's gradients from every global param with
        # global_optimizer.zero_grad() (:1934). Feeding g_fl into the
        # global update (r2-r4) let the SDF-anchor term (10*60 effective
        # weight, :1862) drag the garment SDF toward the curves — measured
        # as the 250-500-step chamfer degradation in bench_quality_512.
        cache["fl"] = _wrap("fl", jax.jit(
            jax.value_and_grad(fl_fn, argnums=1, has_aux=True)))

        def pc_fn(vs_t, gp, fids, gt_masks, r, counts, gt_pooled=None):
            loss, (info, _, def_vs) = self.pc_branch_loss(
                vs_t, gp, fids, gt_masks, r, counts, gt_pooled)
            # hand the (stop-gradient) deformed verts to the rays phase:
            # recomputing the full-capacity skinner+translator pass there
            # cost ~40 ms/step on-device at the fine caps
            return loss, (info, jax.tree_util.tree_map(
                jax.lax.stop_gradient, def_vs))

        cache["pc"] = _wrap("pc", jax.jit(
            jax.value_and_grad(pc_fn, argnums=(0, 1), has_aux=True)))

        def rays_fn(gp, fids, gt_masks, r, key, vs_t, fs_t, def_vs=None):
            ray_data, key = self.find_and_sample_rays(gp, fids, gt_masks, r, key,
                                                      vs_t, fs_t, def_vs=def_vs)
            solved = self.solve_surface_points(gp, ray_data, fids, r)
            return solved, key

        cache["rays"] = _wrap("rays", jax.jit(rays_fn))

        def main_fn(gp, cp, solved, fids, imgs, normals, vs_t, counts, win_ids,
                    r, key):
            batch = {"img": imgs}
            if normals is not None:
                batch["normal"] = normals
            return self.main_loss(gp, cp, solved, fids, batch, vs_t, counts,
                                  win_ids, r, key)

        cache["main"] = _wrap("main", jax.jit(
            jax.value_and_grad(main_fn, has_aux=True)))

        def update_fn(g_pc, g_main, gparams, opt_state, lr_scale):
            grads = jax.tree_util.tree_map(lambda b, c: b + c, g_pc, g_main)
            grads = self._apply_trainable_mask(grads)
            grads = jax.tree_util.tree_map(lambda g: g * lr_scale, grads)
            up, opt_state = self.global_opt.update(grads, opt_state, gparams)
            norms = {"gnorm_pc": optax.global_norm(g_pc),
                     "gnorm_main": optax.global_norm(g_main)}
            return optax.apply_updates(gparams, up), opt_state, norms

        cache["update"] = _wrap("update", jax.jit(update_fn))

        def curve_update_fn(g_curve, cp, st):
            up, st = self.curve_opt.update(g_curve, st, cp)
            return optax.apply_updates(cp, up), st

        cache["curve_update"] = _wrap("curve_update", jax.jit(curve_update_fn))

        def vert_update_fn(g_verts, gvs, st, counts):
            g_verts = tuple(
                jnp.where((jnp.arange(v.shape[0]) < n)[:, None], g, 0.0)
                for g, v, n in zip(g_verts, gvs, counts)
            )
            up, st = self.vert_opt.update(g_verts, st, gvs)
            return optax.apply_updates(gvs, up), st

        cache["vert_update"] = _wrap("vert_update", jax.jit(vert_update_fn))

        # ---- the fused whole-step program -------------------------------
        # One traced/compiled executable for the entire step. Running the
        # phases as six separate executables left ~40 % of the step wall
        # in host/device round trips over the axon transport (module
        # walls summed to 0.30 s of a 0.59 s step, r3 trace); one program
        # also lets XLA share work across branches (the garment
        # deformation feeds pc, rays AND main) and returns every info
        # scalar in ONE packed vector so the step pays a single D2H
        # fetch (~30 ms flat latency per fresh buffer on the tunnel).
        has_curves = (not self.large_pose) and bool(self.params.get("curves"))

        def step_fn(gp, cp, gvs_in, fs_in, cur_st, vert_st, glob_st,
                    fids, fl_pts, fl_masks, gt_masks, gt_pooled, imgs,
                    normals, counts, win_ids, r, key, lr_scale):
            info = {}
            if has_curves:
                (fl_loss, info_fl), g_cur = jax.value_and_grad(
                    fl_fn, argnums=1, has_aux=True)(
                        gp, cp, fids, fl_pts, fl_masks, r, gvs_in, fs_in)
                new_cp, cur_st = curve_update_fn(g_cur, cp, cur_st)
                info.update(info_fl)
                info["fl_loss_total"] = fl_loss
                info["gnorm_fl"] = optax.global_norm(g_cur)
            else:
                new_cp = cp

            (pc_loss, (info_pc, pc_def_vs)), (g_verts, g_pc) = jax.value_and_grad(
                pc_fn, argnums=(0, 1), has_aux=True)(
                    gvs_in, gp, fids, gt_masks, r, counts, gt_pooled)
            new_gvs, vert_st = vert_update_fn(g_verts, gvs_in, vert_st, counts)
            info.update(info_pc)
            info["pc_loss_total"] = pc_loss

            # Seed rays from the PRE-update mesh so the pc branch's
            # deformation is reused (the reference samples rays after its
            # garment SGD step, OptimGarmentNetwork.py:1949 after :961 —
            # one 0.05-lr step of vertex drift; the seeds only NOMINATE
            # pixels and Newton start points, and the surface solver's
            # |sdf| + angle gate re-validates every ray, so the nomination
            # is insensitive to sub-mm seed drift).
            solved, key = rays_fn(gp, fids, gt_masks, r, key, gvs_in, fs_in,
                                  pc_def_vs)
            for gi, gname in enumerate(self.statics.garment_names):
                info[f"{gname}_rayConv"] = jnp.sum(solved[gi]["conv"])

            (m_loss, info_m), g_main = jax.value_and_grad(
                main_fn, has_aux=True)(
                    gp, new_cp, solved, fids, imgs, normals, new_gvs,
                    counts, win_ids, r, key)
            info.update(info_m)

            new_gp, glob_st, gnorms = update_fn(g_pc, g_main, gp,
                                                glob_st, lr_scale)
            info.update(gnorms)
            info["m_loss_total"] = m_loss
            names = sorted(info)
            packed = jnp.stack(
                [jnp.asarray(info[k], jnp.float32).reshape(()) for k in names])
            # names travel as a dict-of-positions so the output TREE (which
            # the exec cache serializes) carries them — a cache hit never
            # re-traces this function.
            name_tree = {k: jnp.asarray(i, jnp.int32)
                         for i, k in enumerate(names)}
            return (new_gp, new_cp, new_gvs, cur_st, vert_st, glob_st,
                    m_loss, packed, name_tree)

        cache["step"] = _wrap("step", jax.jit(step_fn))

        self._jit_cache = cache
        return cache

    def set_parallel(self, mesh):
        """Attach a ('data', 'rays') device mesh: training batches are
        sharded (frames over 'data', image rows over 'rays'), parameters
        and mesh buffers replicated; jit's partitioner turns every phase
        function into an SPMD program with psum-reduced losses/grads over
        ICI. Born-new subsystem — the reference is single-GPU (SURVEY
        §2.3). Pass None to return to single-device execution."""
        self.pmesh = mesh

    def _shard_step_inputs(self, gparams, imgs, normals, gt_masks, fl_pts,
                           fl_masks, gt_pooled=None):
        """device_put the step inputs per scene_shardings(pmesh)."""
        from ..parallel.mesh import scene_shardings

        sh = scene_shardings(self.pmesh)
        put = jax.device_put
        imgs = put(imgs, sh["image"])
        if normals is not None:
            normals = put(normals, sh["image"])
        gt_masks = [put(m, sh["image"]) for m in gt_masks]
        if gt_pooled is not None:
            gt_pooled = [put(m, sh["image"]) if m is not None else None
                         for m in gt_pooled]
        fl_pts = put(fl_pts, sh["frame"])
        fl_masks = put(fl_masks, sh["frame"])
        gparams = put(gparams, sh["replicated"])
        if self.params.get("curves"):
            self.params["curves"] = put(self.params["curves"], sh["replicated"])
        self.mesh.garment_vs = [put(v, sh["replicated"]) for v in self.mesh.garment_vs]
        self.mesh.garment_fs = [put(f, sh["replicated"]) for f in self.mesh.garment_fs]
        return gparams, imgs, normals, gt_masks, fl_pts, fl_masks, gt_pooled

    def warm_start(self, batch, frame_ids, ratio, key=None):
        """AOT-compile the phase executables in PARALLEL threads before
        the first step. The axon remote-compile service overlaps
        concurrent requests (~1.7x measured on 4 medium graphs) and the
        persistent cache is populated either way, so the first
        train_step's serial compile-on-first-call chain (r3: ~670 s even
        with a warm cache) shrinks to roughly the longest single phase.
        ``main`` needs the ray solve's output structure, so compilation
        runs in two waves: (fl, pc, rays) then (main, update)."""
        import threading

        local_fids = np.asarray(frame_ids)
        frame_ids = jnp.asarray(local_fids + self.dataset.start_idx, jnp.int32)
        r = self._ratio_dict(ratio)
        if self.mesh is None:
            self.marching_cube_update(r)
        if self.ang_thred is None:
            self.ang_thred = cam_mod.ang_threshold(self._camera(self.scene_tree()))
        N = int(frame_ids.shape[0])
        gvs = tuple(self.mesh.garment_vs)
        fs_t = tuple(self.mesh.garment_fs)
        caps = tuple(v.shape[0] for v in gvs) + tuple(f.shape[0] for f in fs_t)
        counts = jnp.asarray(self.mesh.garment_n, jnp.int32)
        fns = self._get_jitted(N, caps)
        gparams = self._global_params()
        dev = self._device_batch(batch, frame_ids)
        gt_masks = [dev[k] for k in self._garment_mask_keys()]
        key = jax.random.PRNGKey(0) if key is None else key

        if not self.cfg.profile_phases and self._fused_ok:
            # fused path: one program to build (exec-cache hit = one
            # deserialize). Compiling it serially is also what keeps its
            # StableHLO — and so its cache key — deterministic: parallel
            # phase lowering raced on the shared Pallas kernel cache and
            # stamped the winner's call-stack locations into every
            # consumer module (see utils/exec_cache).
            dct_w = float(self.conf.get_float("dct_weight", 0.0))
            win_ids = None
            if dct_w > 0 and self.dataset.frame_num > self.dct_null.shape[1]:
                win_ids = jnp.asarray(
                    self._window_ids(local_fids, self.dct_null.shape[1]))
            gt_pooled = [dev.get(k + "__pooled")
                         for k in self._garment_mask_keys()]
            args = (gparams, self.params.get("curves"), gvs, fs_t,
                    self.curve_opt_state, self.vert_opt_state,
                    self.global_opt_state, frame_ids, dev["fl_pts"],
                    dev["fl_masks"], gt_masks, gt_pooled, dev["img"],
                    dev.get("normal"), counts, win_ids, r, key,
                    jnp.asarray(self._lr_scale, jnp.float32))
            try:
                if hasattr(fns["step"], "warm"):
                    fns["step"].warm(*args)
                else:
                    fns["step"].lower(*args).compile()
                return
            except Exception as e:  # remote-compile drop / OOM: degrade
                if not _degradable_error(e):
                    raise
                import sys as _sys
                _sys.stderr.write(f"[warm_start] fused step compile failed "
                                  f"({type(e).__name__}: {e}); falling back "
                                  f"to per-phase executables\n")
                self._fused_ok = False

        structural = []   # tracing/shape errors from worker threads → re-raise

        def compile_one(name, args):
            try:
                if hasattr(fns[name], "warm"):   # LazyAot: exec-cache load
                    fns[name].warm(*args)
                else:
                    fns[name].lower(*args).compile()
            except Exception as e:
                if not _degradable_error(e):
                    structural.append((name, e))
                    return
                import sys   # pragma: no cover — infra warmup is advisory
                sys.stderr.write(f"[warm_start] {name}: {e}\n")

        wave1 = [("pc", (gvs, gparams, frame_ids, gt_masks, r, counts,
                         [dev.get(k + "__pooled")
                          for k in self._garment_mask_keys()])),
                 ("rays", (gparams, frame_ids, gt_masks, r, key, gvs, fs_t))]
        if not self.large_pose:
            wave1.append(("fl", (gparams, self.params["curves"], frame_ids,
                                 dev["fl_pts"], dev["fl_masks"], r, gvs, fs_t)))
        ths = [threading.Thread(target=compile_one, args=j) for j in wave1]
        [t.start() for t in ths]
        [t.join() for t in ths]
        if structural:
            name, err = structural[0]
            raise RuntimeError(f"warm_start: structural error compiling "
                               f"'{name}' phase") from err

        solved, _ = fns["rays"](gparams, frame_ids, gt_masks, r, key, gvs, fs_t)
        dct_w = float(self.conf.get_float("dct_weight", 0.0))
        win_ids = None
        if dct_w > 0 and self.dataset.frame_num > self.dct_null.shape[1]:
            win_ids = jnp.asarray(
                self._window_ids(local_fids, self.dct_null.shape[1]))
        g0 = jax.tree_util.tree_map(jnp.zeros_like, gparams)
        gv0 = tuple(jnp.zeros_like(v) for v in gvs)
        wave2 = [("main", (gparams, self.params["curves"], solved, frame_ids,
                           dev["img"], dev.get("normal"), gvs, counts,
                           win_ids, r, key)),
                 ("update", (g0, g0, gparams, self.global_opt_state,
                             jnp.asarray(1.0, jnp.float32))),
                 ("vert_update", (gv0, gvs, self.vert_opt_state, counts))]
        if not self.large_pose and self.params.get("curves"):
            c0 = jax.tree_util.tree_map(jnp.zeros_like, self.params["curves"])
            wave2.append(("curve_update", (c0, self.params["curves"],
                                           self.curve_opt_state)))
        ths = [threading.Thread(target=compile_one, args=j) for j in wave2]
        [t.start() for t in ths]
        [t.join() for t in ths]

    def train_step(self, batch, frame_ids, ratio, key):
        """One optimization step. batch: numpy dict from
        dataset.get_batch; frame_ids (N,) local ids; ratio dict.
        Returns (total_loss, info). Phase wall-times land in info['t_*'].
        """
        import time as _time

        # frame_ids come in as LOCAL dataset indices (0..frame_num);
        # scene arrays cover the full video, so convert to global indices
        # here — the distinction only matters when the dataset is a
        # sub-range (PeopleSnapshot a_pose split, large-pose stage).
        local_fids = np.asarray(frame_ids)
        frame_ids = jnp.asarray(local_fids + self.dataset.start_idx, jnp.int32)
        self.info = {}
        r = self._ratio_dict(ratio)

        _t0 = _time.time()
        if self.mesh is None or (self.opt_times % self.cfg.remesh_intersect == 0
                                 and self._remeshed_at != self.opt_times):
            self.marching_cube_update(r)
        self.info["t_remesh"] = _time.time() - _t0

        if self.ang_thred is None:
            self.ang_thred = cam_mod.ang_threshold(self._camera(self.scene_tree()))

        _t0 = _time.time()
        N = int(frame_ids.shape[0])
        gvs = tuple(self.mesh.garment_vs)
        fs_t = tuple(self.mesh.garment_fs)
        caps = tuple(v.shape[0] for v in gvs) + tuple(f.shape[0] for f in fs_t)
        counts = jnp.asarray(self.mesh.garment_n, jnp.int32)
        fns = self._get_jitted(N, caps)

        gparams = self._global_params()
        dev = self._device_batch(batch, frame_ids)
        gt_garment_masks = [dev[k] for k in self._garment_mask_keys()]
        gt_pooled = [dev.get(k + "__pooled") for k in self._garment_mask_keys()]
        fl_pts = dev["fl_pts"]
        fl_masks = dev["fl_masks"]
        imgs = dev["img"]
        normals = dev.get("normal")
        if self.pmesh is not None:
            (gparams, imgs, normals, gt_garment_masks, fl_pts,
             fl_masks, gt_pooled) = self._shard_step_inputs(
                gparams, imgs, normals, gt_garment_masks, fl_pts, fl_masks,
                gt_pooled)
            gvs = tuple(self.mesh.garment_vs)
            fs_t = tuple(self.mesh.garment_fs)

        dct_w_f = float(self.conf.get_float("dct_weight", 0.0))
        win_ids_f = None
        if dct_w_f > 0 and self.dataset.frame_num > self.dct_null.shape[1]:
            win_ids_f = jnp.asarray(
                self._window_ids(local_fids, self.dct_null.shape[1]))

        if not self.cfg.profile_phases and self._fused_ok:
            # fused path: ONE executable for the whole step, ONE packed
            # info fetch (see _get_jitted's step_fn)
            key_f = jax.random.PRNGKey(int(self.opt_times)) if key is None else key
            cp = self.params.get("curves")
            try:
                (gparams_n, new_cp, new_gvs, cur_st, vert_st, glob_st,
                 m_loss, packed, name_tree) = fns["step"](
                    gparams, cp, gvs, fs_t, self.curve_opt_state,
                    self.vert_opt_state, self.global_opt_state, frame_ids,
                    fl_pts, fl_masks, gt_garment_masks, gt_pooled, imgs,
                    normals, counts, win_ids_f, r, key_f,
                    jnp.asarray(self._lr_scale, jnp.float32))
            except Exception as e:  # compile drop: degrade to split phases
                if not _degradable_error(e):
                    raise
                import sys as _sys
                _sys.stderr.write(f"[train_step] fused step failed "
                                  f"({type(e).__name__}: {e}); falling back "
                                  f"to per-phase executables\n")
                self._fused_ok = False
            else:
                self.curve_opt_state = cur_st
                self.vert_opt_state = vert_st
                self.global_opt_state = glob_st
                if cp is not None:
                    self.params["curves"] = new_cp
                self.mesh.garment_vs = list(new_gvs)
                self._write_back(gparams_n)
                budget = max(self.cfg.sample_pix // self.statics.garment_size, 1) * N
                for gname in self.statics.garment_names:
                    self.info[f"{gname}_rayBudget"] = budget
                vals = np.asarray(packed)   # single D2H for every info scalar
                order = sorted(name_tree)
                self.info.update({k: float(vals[i]) for i, k in enumerate(order)})
                total = self.info.get("m_loss_total", float("nan"))
                self.info["t_update"] = _time.time() - _t0
                self.opt_times += 1.0
                return total, self.info

        # All phases are dispatched back-to-back; info scalars stay on
        # device until ONE sync at the end of the step (per-phase float()
        # conversions serialized host and device in r2). With
        # cfg.profile_phases the boundaries block so t_* are real walls.
        pending = {}
        _sync = jax.block_until_ready if self.cfg.profile_phases else (lambda x: x)

        # ① curve branch (zeroed in the large-pose stage — the reference
        # multiplies both curve losses by 0, Large_Pose.py:219)
        if not self.large_pose:
            (fl_loss, fl_info), g_fl_curve = fns["fl"](
                gparams, self.params["curves"], frame_ids, fl_pts, fl_masks, r,
                gvs, fs_t)
            self.params["curves"], self.curve_opt_state = fns["curve_update"](
                g_fl_curve, self.params["curves"], self.curve_opt_state)
            pending.update(fl_info)
            pending["fl_loss_total"] = fl_loss
            pending["gnorm_fl"] = optax.global_norm(g_fl_curve)
            _sync(fl_loss)
        self.info["t_fl"] = _time.time() - _t0; _t0 = _time.time()

        # ② mask branch
        (pc_loss, (pc_info, pc_def_vs)), (g_verts, g_pc_global) = fns["pc"](
            gvs, gparams, frame_ids, gt_garment_masks, r, counts, gt_pooled)
        new_gvs, self.vert_opt_state = fns["vert_update"](
            g_verts, gvs, self.vert_opt_state, counts)
        self.mesh.garment_vs = list(new_gvs)
        pending.update(pc_info)
        pending["pc_loss_total"] = pc_loss
        _sync(pc_loss)
        self.info["t_pc"] = _time.time() - _t0; _t0 = _time.time()

        # rays + surface solve (no grad) — seeded from the pre-update
        # mesh so the pc branch's deformation is reused (see step_fn)
        key = jax.random.PRNGKey(int(self.opt_times)) if key is None else key
        solved, key = fns["rays"](gparams, frame_ids, gt_garment_masks, r, key,
                                  gvs, fs_t, pc_def_vs)
        for gi, gname in enumerate(self.statics.garment_names):
            pending[f"{gname}_rayConv"] = jnp.sum(solved[gi]["conv"])
            self.info[f"{gname}_rayBudget"] = int(solved[gi]["valid"].shape[0])
        _sync(solved)
        self.info["t_rays"] = _time.time() - _t0; _t0 = _time.time()

        # ③ main loss (+ implicit adjoint inside)
        dct_w = float(self.conf.get_float("dct_weight", 0.0))
        win_ids = None
        if dct_w > 0 and self.dataset.frame_num > self.dct_null.shape[1]:
            win_ids = jnp.asarray(
                self._window_ids(local_fids, self.dct_null.shape[1]))
        (m_loss, m_info), g_main = fns["main"](
            gparams, self.params["curves"], solved, frame_ids, imgs, normals,
            tuple(self.mesh.garment_vs), counts, win_ids, r, key)
        pending.update(m_info)
        _sync(m_loss)
        self.info["t_main"] = _time.time() - _t0; _t0 = _time.time()

        # ④ combine and update globals (grad accumulation parity)
        gparams, self.global_opt_state, gnorms = fns["update"](
            g_pc_global, g_main, gparams, self.global_opt_state,
            jnp.asarray(self._lr_scale, jnp.float32))
        self._write_back(gparams)
        pending.update(gnorms)

        # single host sync for the whole step
        total = float(m_loss)
        self.info.update({k: float(v) for k, v in
                          zip(pending, jax.device_get(list(pending.values())))})
        self.info["t_update"] = _time.time() - _t0

        self.opt_times += 1.0
        return total, self.info

    def on_phase_change(self):
        """Invalidate compiled phase functions (loss block / curve
        parameterization changed)."""
        self._phase_token += 1

    def set_lr_scale(self, scale: float):
        """MultiStepLR-equivalent: scale applied to gradients feeding the
        fixed-lr Adam (lr·factor schedule, reference train.py scheduler)."""
        self._lr_scale = float(scale)

    # ------------------------------------------------------------------
    # one-time initializations (reference initializeTmpSDF path)
    # ------------------------------------------------------------------

    def igr_fit_sdf(self, which, verts, normals, nepochs: int = 1200,
                    batch_size: int = 5000, lr: float = 5e-3, seed: int = 0):
        """IGR fit of one SDF to a surface point set (initializeSDF,
        OptimGarmentNetwork.py:387-443): |sdf| + 0.1·eikonal + normal
        term; Adam with StepLR(500, 0.5). `which` = 'sdf' or ('garment', i).
        Jitted epoch loop with scan over shuffled minibatches."""
        if which == "sdf":
            params = self.params["sdf"]
            static = self.statics.sdf
        else:
            params = self.params["garment_sdfs"][which[1]]
            static = self.statics.garment_sdf
        verts = jnp.asarray(verts, jnp.float32)
        normals = jnp.asarray(normals, jnp.float32) if normals is not None else None
        V = verts.shape[0]
        bs = min(batch_size, V)
        nb = max(V // bs, 1)

        # the reference's 5e-3 assumes its 1200-epoch budget; short fits
        # (tests, quick benches) oscillate at that rate and can leave the
        # SDF with no zero crossing at all ("tmp sdf vanished"): Adam's
        # early steps move every param by ~lr regardless of gradient
        # scale, so a budget of a few dozen steps lands mid-transient —
        # measured on the smoke fixture: 8 epochs @2e-3 → min sdf +0.04
        # (no surface), @5e-4 → crossing preserved, 40 epochs @2e-3 →
        # converged. Derate lr to the budget.
        if nepochs < 32:
            lr = min(lr, 5e-4)
        elif nepochs < 200:
            lr = min(lr, 2e-3)

        # geometric re-init to the data scale: the geo-init sphere
        # (radius=bias, origin-centered) can sit far inside/outside the
        # target surface (a torso-band garment is ~0.3-scale, off-origin);
        # the L1 |sdf| term then drives a uniform sign-coherent shift that
        # Adam overshoots on short budgets, leaving NO zero crossing.
        # Shifting the sdf-channel bias so the point-set mean is zero
        # guarantees the init surface already crosses the data.
        from ..models.sdf import sdf_value

        v0 = sdf_value(params, static, verts[: min(V, 4096)], -1.0)
        last = f"lin{static.n_layers - 2}"
        params = dict(params)
        params[last] = dict(params[last])
        params[last]["b"] = params[last]["b"].at[0].add(-jnp.mean(v0))
        sched = optax.exponential_decay(lr, 500, 0.5, staircase=True)
        opt = optax.adam(sched)
        opt_state = opt.init(params)

        def loss_fn(p, pts, nrm, key):
            vals, grads_s = sdf_value_and_gradient(p, static, pts, -1.0)
            k1, k2 = jax.random.split(key)
            local = pts + 0.01 * jax.random.normal(k1, pts.shape)
            glob = jax.random.uniform(k2, (pts.shape[0] // 6, 3), minval=-1.8, maxval=1.8)
            off = jnp.concatenate([local, glob], 0)
            _, grads_o = sdf_value_and_gradient(p, static, off, -1.0)
            loss, aux = L.igr_init_loss(vals, grads_s, grads_o, nrm)
            return loss, aux

        def epoch_body(carry, _):
            params, opt_state, key = carry
            key, ks = jax.random.split(key)
            perm = jax.random.permutation(ks, V)
            evs = verts[perm[: nb * bs]].reshape(nb, bs, 3)
            ens = (normals[perm[: nb * bs]].reshape(nb, bs, 3)
                   if normals is not None else jnp.zeros((nb, bs, 3)))

            def body(carry, inp):
                p, s, k = carry
                pts, nrm = inp
                k, ku = jax.random.split(k)
                (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, pts, nrm if normals is not None else None, ku)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s, k), l

            (params, opt_state, key), ls = jax.lax.scan(
                body, (params, opt_state, key), (evs, ens))
            return (params, opt_state, key), ls[-1]

        # chunk epochs into one jitted scan per call: per-call dispatch
        # costs ~seconds over the axon tunnel, and the 1200-epoch
        # production fit would otherwise pay it 1200 times
        CHUNK = 50

        @partial(jax.jit, static_argnames=("n",))
        def epochs(params, opt_state, key, n):
            (params, opt_state, key), ls = jax.lax.scan(
                epoch_body, (params, opt_state, key), None, length=n)
            return params, opt_state, key, ls[-1]

        key = jax.random.PRNGKey(seed)
        last = None
        done = 0
        while done < nepochs:
            n = min(CHUNK, nepochs - done)
            params, opt_state, key, last = epochs(params, opt_state, key, n)
            done += n
        if which == "sdf":
            self.params["sdf"] = params
        else:
            gs = list(self.params["garment_sdfs"])
            gs[which[1]] = params
            self.params["garment_sdfs"] = tuple(gs)
        return float(last) if last is not None else None

    # ------------------------------------------------------------------
    # curve initialization (scale_rigid_optimizer) + align_fl
    # ------------------------------------------------------------------

    def initialize_fl(self, fl_template_curves: dict, n_iters: int = 150,
                      lr: float = 5e-3, cache_path: str | None = None):
        """Per-curve rigid translation then scale fit against gt 2D curves
        (scale_rigid_optimizer, engineer/core/fl_optimizer.py:111-520):
        stage 1 optimizes per-curve translation T, stage 2 per-curve scale
        s (around the curve center, R fixed to identity as the reference's
        ortho6d stays at its init), with body-z-buffer visibility gating.
        fl_template_curves: curve name → (S, 3) canonical template curve.
        Returns {name: (T (3,), s ()), ...} and the aligned curves.
        """
        from ..config.constants import INI_FL_SCALE

        fl_names = [n for n in self.dataset.fl_names if n in fl_template_curves]
        curves0 = jnp.asarray(np.stack([fl_template_curves[n] for n in fl_names]))
        centers = curves0.mean(1, keepdims=True)
        C, S, _ = curves0.shape

        if cache_path and os.path.isfile(cache_path):
            data = np.load(cache_path)
            T = jnp.asarray(data["T"])
            s = jnp.asarray(data["s"])
            aligned = (curves0 - centers) * s[:, None, None] + centers + T[:, None, :]
            return dict(zip(fl_names, zip(np.asarray(T), np.asarray(s)))), \
                {n: np.asarray(a) for n, a in zip(fl_names, aligned)}, fl_names

        # supervised frames only
        sup = [i for i, x in enumerate(self.dataset.fl_supervised) if x]
        sup = sup[:: max(len(sup) // 16, 1)][:16] or [0]
        batch = self.dataset.get_batch([i - self.dataset.start_idx for i in sup])
        fl_pts = jnp.asarray(batch["fl_pts"])
        fl_masks = jnp.asarray(batch["fl_masks"])
        # sup are global video indices — scene arrays are indexed globally
        fids = jnp.asarray(sup, jnp.int32)
        scene = self.scene_tree()
        cam = self._camera(scene)
        poses = scene["poses"][fids]
        trans = scene["trans"][fids]
        N = fids.shape[0]
        zbuf, _ = self._body_zbuf_image(self._global_params(), scene, fids, cam)
        name_to_col = {n: i for i, n in enumerate(self.dataset.fl_names)}

        # FROZEN visibility gate, reference parity (fl_optimizer.py:244-249):
        # the reference probes the body z-buffer with the INITIAL curve
        # configuration (``init_meshes_vertices``, computed once before the
        # fit loops) at the tight 0.01 threshold. Recomputing the gate from
        # the current fit (r2-r5) is a feedback loop — shrinking the curve
        # changes which points count as visible, which lets the 2D chamfer
        # collapse a ring onto the annotated arc (observed: neck fitted to
        # r 0.106 vs gt 0.140, and the whole pipeline inherits the collapse).
        def frozen_vis(T, s):
            aligned = (curves0 - centers) * s[:, None, None] + centers + T[:, None, :]
            flat = aligned.reshape(1, -1, 3)
            posed = skinner_apply(self.params["skinner"],
                                  jnp.broadcast_to(flat, (N, C * S, 3)), poses, trans)
            scr = screen_with_cam_z(cam, posed)
            surf_z = self._sample_zbuf(zbuf, scr)
            return (scr[..., 2] - surf_z) < 0.01

        def proj_loss(T, s, vis):
            aligned = (curves0 - centers) * s[:, None, None] + centers + T[:, None, :]
            flat = aligned.reshape(1, -1, 3)
            posed = skinner_apply(self.params["skinner"],
                                  jnp.broadcast_to(flat, (N, C * S, 3)), poses, trans)
            scr = screen_with_cam_z(cam, posed)  # z = camera depth (zbuf space)
            loss = 0.0
            for ci, name in enumerate(fl_names):
                col = name_to_col[name]
                sc = scr[:, ci * S : (ci + 1) * S, :2]
                v = vis[:, ci * S : (ci + 1) * S] & fl_masks[:, col][:, None]
                gt = fl_pts[:, col]
                d2 = jnp.sum((sc[:, :, None, :] - gt[:, None, :, :]) ** 2, -1)
                big = 1e12
                m_pg = jnp.min(jnp.where(v[:, :, None], d2, big), axis=1)
                m_gp = jnp.min(d2, axis=2)
                anyv = jnp.any(v, axis=1)
                # Trimmed pred→gt: the frozen body-zbuf gate admits more
                # of the ring than the human-annotated arc covers (side/
                # back points near the silhouette), and chamfer-matching
                # those to the arc's ENDPOINTS is a pure shrink force —
                # the fit's fixed point sits 15–19% under gt with it
                # (measured, synthetic tube hem). Points beyond 2× the
                # median distance are exactly that population; the
                # self-scaling cap keeps the term active while the ring
                # is uniformly far (prior misfit) and trims only the
                # asymmetric tail.
                cap = 4.0 * jax.lax.stop_gradient(
                    jnp.nanmedian(jnp.where(v, m_gp, jnp.nan),
                                  axis=1, keepdims=True))
                vtrim = v & (m_gp <= jnp.where(jnp.isnan(cap), big, cap))
                cham = (L.masked_mean(m_gp, vtrim, axis=1)
                        + jnp.where(anyv, jnp.mean(m_pg, axis=1), 0.0))
                loss = loss + jnp.sum(jnp.where(anyv, cham, 0.0)) / jnp.clip(
                    jnp.sum(anyv), 1.0, None)
            return loss

        T = jnp.zeros((C, 3))
        s = jnp.asarray([INI_FL_SCALE.get(n, 1.5) for n in fl_names], jnp.float32)

        # Closed-form scale pre-alignment: when a template ring starts far
        # from the annotation in BOTH height and radius (SMPL-sliced skirt
        # templates end mid-thigh while the gt hem sits at the ankle), the
        # joint Adam fit below translates correctly but COLLAPSES the
        # scale on the way — while the ring is at the wrong height the 2D
        # chamfer to the partial gt arc is minimized by shrinking toward
        # the arc centroid, and the 150-iter budget (Adam travel
        # ≈ lr·iters = 0.75 scale units) can't recover it (measured on
        # the synthetic two-garment scene: s 2.0 → 1.195 vs needed ~2.05).
        # The silhouette WIDTH of a ring is scale-equivariant and height-
        # robust, so the ratio of x-extents (gt arc vs projected template
        # curve) is a direct estimate of the missing scale factor.
        def _extent_scale(T0, s0):
            aligned = (curves0 - centers) * s0[:, None, None] + centers \
                + T0[:, None, :]
            flat = aligned.reshape(1, -1, 3)
            posed = skinner_apply(self.params["skinner"],
                                  jnp.broadcast_to(flat, (N, C * S, 3)),
                                  poses, trans)
            scr = screen_with_cam_z(cam, posed)
            mults = []
            for ci, name in enumerate(fl_names):
                col = name_to_col[name]
                px = scr[:, ci * S:(ci + 1) * S, 0]         # (N, S)
                ext_p = jnp.ptp(px, axis=1)                  # (N,)
                ext_g = jnp.ptp(fl_pts[:, col, :, 0], axis=1)
                ok = fl_masks[:, col] & (ext_p > 1.0) & (ext_g > 1.0)
                ratio = jnp.where(ok, ext_g / jnp.clip(ext_p, 1.0, None), 1.0)
                # median over supervised frames, robust to bad arcs
                med = jnp.nanmedian(jnp.where(ok, ratio, jnp.nan), axis=0)
                med = jnp.where(jnp.isnan(med), 1.0, med)
                # UPWARD rescues only. Downward: the Adam fit can travel
                # down on its own, and the fit's fixed point sits 15-19%
                # BELOW gt anyway (the frozen body-zbuf gate admits
                # off-silhouette back-arc points whose projection matches
                # the annotation best at a smaller radius — loss-shape
                # bias, measured by s-sweep: min at s 1.26 vs gt 1.54);
                # a downward pre-scale just converges faster to that
                # biased minimum, while the reference-shaped 150-iter
                # fit from the INI_FL_SCALE prior stops closer to gt.
                # Upward (skirt hem: ratio ≈ 2): the fit CANNOT travel
                # there in budget and the closed-form estimate is the
                # rescue.
                med = jnp.where(med > 1.3, med, 1.0)
                mults.append(jnp.clip(med, 0.5, 2.5))
            return jnp.asarray(mults)

        mult = _extent_scale(T, s)
        rescued = jnp.abs(mult - 1.0) > 1e-6          # (C,) bool
        s = jnp.clip(s * mult, 0.3, 3.0)
        optT = optax.adam(lr)
        optS = optax.adam(lr)
        vis0 = jax.lax.stop_gradient(frozen_vis(T, s))

        # both stages as single jitted scans (one dispatch each instead
        # of n_iters round trips over the axon tunnel).
        # Stage 1 fits T AND s jointly — the reference's "rigid_T stage"
        # runs Adam([rigid_T, rigid_scale], lr=5e-3) for ~150 steps
        # (fl_optimizer.py:149,216-270); only stage 2 is scale-only. A
        # T-only stage 1 leaves the INI_FL_SCALE prior to the short stage
        # 2, which cannot travel (Adam ≈ lr/step ⇒ ≤0.15 scale units in
        # 30 steps) — measured +14–20% inflated rings at init on the
        # synthetic 512px scene, which the fl branch then propagates into
        # the garment SDF through the hemline curve_aware term.
        @partial(jax.jit, static_argnames=("n",))
        def fitT(T, s, vis, n):
            def step(carry, _):
                (T, s), st = carry
                g = jax.grad(proj_loss, argnums=(0, 1))(T, s, vis)
                u, st = optT.update(g, st, (T, s))
                T, s = optax.apply_updates((T, s), u)
                return ((T, jnp.clip(s, 0.3, 3.0)), st), None

            ((T, s), _), _ = jax.lax.scan(
                step, ((T, s), optT.init((T, s))), None, length=n)
            return T, s

        @partial(jax.jit, static_argnames=("n",))
        def fitS(s, T, vis, n):
            def step(carry, _):
                s, st = carry
                g = jax.grad(proj_loss, argnums=1)(T, s, vis)
                u, st = optS.update(g, st, s)
                # projection: a curve scale outside [0.3, 3] is never a
                # garment fit, it's the optimizer exploiting a bad
                # template prior or a depth/visibility artifact
                s = jnp.clip(optax.apply_updates(s, u), 0.3, 3.0)
                return (s, st), None

            (s, _), _ = jax.lax.scan(step, (s, optS.init(s)), None, length=n)
            return s

        @partial(jax.jit, static_argnames=("n",))
        def fitTonly(T, s, vis, n):
            def step(carry, _):
                T, st = carry
                g = jax.grad(proj_loss, argnums=0)(T, s, vis)
                u, st = optT.update(g, st, T)
                return (optax.apply_updates(T, u), st), None

            (T, _), _ = jax.lax.scan(step, (T, optT.init(T)), None, length=n)
            return T

        # RESCUED curves only (pre-scale fired → the template ring was
        # far off in extent, typically also in height):
        # 1. T-only warmup at the pre-aligned scale — brings a ring that
        #    starts at the wrong HEIGHT to the annotation before the
        #    scale may move (the joint fit's scale gradient is only
        #    meaningful once the heights roughly agree);
        # 2. re-freeze the visibility gate at the warmed-up pose — the
        #    gate stays frozen through the fit (reference parity;
        #    per-iter recompute is the collapse feedback loop,
        #    fl_optimizer.py:244-249), but a gate probed 16 cm from
        #    where the ring now sits keeps a stale visible subset and
        #    the joint chamfer shrinks the ring onto it (measured:
        #    skirt hem s 2.0 → 0.84 stale, ~1.6 re-frozen).
        # Non-rescued curves keep the reference path untouched — warming
        # T for an already-close ring re-orders the joint fit's
        # transient and measurably worsens its equilibrium (tube hem
        # −12% → −19%).
        if bool(jnp.any(rescued)):
            rm = rescued[:, None].astype(jnp.float32)
            T_w = fitTonly(T, s, vis0, max(n_iters // 3, 10))
            T = jnp.where(rm > 0, T_w, T)
            vis1 = jax.lax.stop_gradient(frozen_vis(T, s))
            v0 = vis0.reshape(N, C, S)
            v1 = vis1.reshape(N, C, S)
            vis1 = jnp.where(rescued[None, :, None], v1, v0).reshape(N, C * S)
        else:
            vis1 = vis0
        T, s = fitT(T, s, vis1, n_iters)
        # the scale-only refinement stage is an order of magnitude shorter
        # than stage 1 (S_epoch capped at 10 vs T_epoch 150,
        # fl_optimizer.py:123-124) — long scale-only fits exploit the
        # one-sided visible-vs-annotated mismatch at the arc ends and
        # shrink rings (observed r2–r5).
        s = fitS(s, T, vis1, max(n_iters // 5, 10))

        if cache_path:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            np.savez(cache_path, T=np.asarray(T), s=np.asarray(s))
        aligned = (curves0 - centers) * s[:, None, None] + centers + T[:, None, :]
        return dict(zip(fl_names, zip(np.asarray(T), np.asarray(s)))), \
            {n: np.asarray(a) for n, a in zip(fl_names, aligned)}, fl_names

    def align_fl(self, aligned_curves: dict, template_curves: dict, rigid: dict):
        """Build the Intersect_Free_Curve parameterization from the
        aligned curves + the inverse map to canonical SMPL space
        (align_fl, OptimGarmentNetwork.py:3485-3548)."""
        from ..models.curves import init_curves
        from ..models.deformer import InverseFlBody

        fl_names = [n for n in self.dataset.fl_names if n in aligned_curves]
        inv = InverseFlBody(
            fl_names,
            [template_curves[n] for n in fl_names],
            [np.asarray(rigid[n][0]) for n in fl_names],
            [np.asarray(rigid[n][1]) for n in fl_names],
        )
        cano_smpl = inv([jnp.asarray(aligned_curves[n]) for n in fl_names], fl_names)
        params, statics = init_curves(
            [aligned_curves[n] for n in fl_names],
            [np.asarray(c) for c in cano_smpl], fl_names)
        self.params["curves"] = params
        self.curve_statics = statics
        self.curve_opt_state = self.curve_opt.init(params)
        self.inverse_fl_body = inv
        self._phase_token += 1
        return params, statics

    def initialize_tmp_sdf(self, nepochs: int = 1200, save_dir: str | None = None,
                           with_normals: bool = True, template_dir: str | None = None,
                           body_normals=None, fl_iters: int = 150):
        """Full one-time scene initialization (initializeTmpSDF,
        OptimGarmentNetwork.py:490-578): build garment templates from the
        A-pose body, extract template feature lines, rigid+scale-fit them
        to the 2D annotations, Laplacian-register the template patches to
        the aligned curves, close the holes, and IGR-fit body + garment
        SDFs. Returns the curve parameterization."""
        from ..geometry.laplacian import laplacian_deform
        from ..models.garment import garment_templates_from_body
        from ..models.smpl import smpl_skeleton

        joints = np.asarray(self.params["skinner"].Js)
        templates = garment_templates_from_body(
            self.statics.garment_names, np.asarray(self.tmp_body_vs),
            np.asarray(self.tmp_body_fs), joints, template_dir)
        templates = [t.dense_boundary(2) for t in templates]

        # template feature lines (merged across garments; first wins)
        template_curves = {}
        for t in templates:
            for name, curve in t.extract_featurelines().items():
                template_curves.setdefault(name, curve)

        cache = os.path.join(save_dir, "fl_init", "init_trans_matrix.npz") if save_dir else None
        rigid, aligned_curves, fl_names = self.initialize_fl(
            template_curves, n_iters=fl_iters, cache_path=cache)

        # Laplacian-register each template's boundary loops onto the
        # aligned curves (align_init_temp → Laplacian_Optimizer) with
        # optimal-assignment correspondences (best_match,
        # garment_structure.py:569-726)
        from ..geometry.matching import match_template_boundaries

        registered = []
        for t in templates:
            cids, targets = match_template_boundaries(
                t.verts, t.boundary_labels, aligned_curves)
            if len(cids):
                new_v = np.asarray(laplacian_deform(
                    t.verts, t.faces, cids, targets,
                    constrain_weight=1.0, smooth=True))
                t.verts = new_v
            registered.append(t)
        self.garment_templates = registered

        # curves parameterization
        self.align_fl(aligned_curves, template_curves, rigid)

        # IGR fits
        if body_normals is None:
            from ..geometry.mesh_utils import vertex_normals

            body_normals = vertex_normals(np.asarray(self.tmp_body_vs),
                                          np.asarray(self.tmp_body_fs))
        self.igr_fit_sdf("sdf", self.tmp_body_vs,
                         body_normals if with_normals else None, nepochs)
        self.garment_extract_bboxes = []
        for gi, t in enumerate(registered):
            cv, cf, cn = t.close_hole()
            # area-weighted resample: raw closed-mesh vertices are
            # density-biased (subdivided cap fans can hold most of the
            # vertices), which skews short IGR fits toward the caps
            from ..geometry.mesh_utils import sample_mesh_surface

            sp, sn = sample_mesh_surface(cv, cf, max(len(cv), 8192), seed=gi)
            self.igr_fit_sdf(("garment", gi), sp, sn if with_normals else None, nepochs)
            # extraction clip box: template bbox + 20% margin (the
            # garment may grow during training; far-field IGR junk may
            # not — see _get_extract_fn)
            lo, hi = cv.min(0), cv.max(0)
            m = 0.2 * float(np.linalg.norm(hi - lo))
            self.garment_extract_bboxes.append(
                ((lo - m).astype(np.float32), (hi + m).astype(np.float32)))
        if save_dir:
            self.save_checkpoint(os.path.join(save_dir, "initial_sdf.ckpt"), epoch=0)

    # ------------------------------------------------------------------
    # checkpointing (save_model/load_model parity, utils/utils.py:350-420)
    # ------------------------------------------------------------------

    def save_checkpoint(self, path: str, epoch: int):
        import pickle

        state = {
            "epoch": epoch,
            "params": jax.tree_util.tree_map(np.asarray, {
                k: v for k, v in self.params.items() if k != "skinner"
            }),
            "skinner": jax.tree_util.tree_map(np.asarray, self.params["skinner"]),
            "scene": jax.tree_util.tree_map(np.asarray, self.scene_tree()),
            "opt_times": self.opt_times,
            "garment_extract_bboxes": getattr(self, "garment_extract_bboxes",
                                              None),
        }
        if self.curve_statics is not None:
            state["curve_statics"] = jax.tree_util.tree_map(
                np.asarray, jax.tree_util.tree_flatten(self.curve_statics)[0])
            state["curve_fl_names"] = tuple(self.curve_statics.fl_names)
        if getattr(self, "garment_templates", None):
            state["garment_templates"] = [
                {"name": t.name, "verts": np.asarray(t.verts),
                 "faces": np.asarray(t.faces),
                 "boundary_labels": {k: np.asarray(v)
                                     for k, v in t.boundary_labels.items()}}
                for t in self.garment_templates
            ]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_checkpoint(self, path: str):
        import pickle

        from ..models.curves import CurveStatics
        from ..models.skinner import SkinnerParams

        with open(path, "rb") as f:
            state = pickle.load(f)
        for k, v in state["params"].items():
            self.params[k] = jax.tree_util.tree_map(jnp.asarray, v)
        self.params["skinner"] = jax.tree_util.tree_map(jnp.asarray, state["skinner"])
        sc = state["scene"]
        sp = self.dataset.params
        sp.poses, sp.trans, sp.shape = sc["poses"], sc["trans"], sc["shape"]
        sp.conds = dict(sc["conds"])
        sp.camera = dict(sc["camera"])
        self.invalidate_scene()
        if "curve_statics" in state:
            leaves = [jnp.asarray(x) for x in state["curve_statics"]]
            self.curve_statics = CurveStatics(*leaves, fl_names=state["curve_fl_names"])
        if "garment_templates" in state:
            from ..models.garment import GarmentTemplate

            self.garment_templates = [
                GarmentTemplate(d["name"], d["verts"], d["faces"],
                                dict(d["boundary_labels"]))
                for d in state["garment_templates"]
            ]
        self.opt_times = state.get("opt_times", 0.0)
        if state.get("garment_extract_bboxes") is not None:
            self.garment_extract_bboxes = state["garment_extract_bboxes"]
        elif getattr(self, "garment_templates", None):
            # older checkpoints: recover the extraction clip boxes from
            # the saved templates (same rule as initialize_tmp_sdf)
            self.garment_extract_bboxes = []
            for t in self.garment_templates:
                v = np.asarray(t.verts)
                lo, hi = v.min(0), v.max(0)
                m = 0.2 * float(np.linalg.norm(hi - lo))
                self.garment_extract_bboxes.append(
                    ((lo - m).astype(np.float32), (hi + m).astype(np.float32)))
        self._init_global_opt()
        return state["epoch"]
