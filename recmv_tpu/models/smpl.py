"""SMPL body model — TPU-native replacement for the external
``smpl_pytorch`` package the reference symlinks in (``model/Deformer.py:12-13``).

Provides:
- ``SMPLModel``: host-side container for the model assets (template verts,
  shape/pose blendshapes, joint regressor, skinning weights, kinematic
  tree, faces). Loads the standard SMPL ``.pkl``/``.npz`` layouts when the
  licensed assets are present (same external-asset convention as the
  reference, SURVEY §"hard parts (6)").
- ``synthetic_body_model``: a deterministic procedural humanoid with the
  same tensor layout (V verts, 24 joints, SMPL parents) so tests and
  benchmarks run without licensed assets.
- ``forward_kinematics`` / ``smpl_forward`` / ``smpl_skeleton``: pure-JAX
  LBS with pose-dependent blendshapes, matching SMPL semantics
  (vertices = LBS(shaped + pose blendshapes)). The 24-joint chain is
  unrolled at trace time (parents are static), so XLA sees a fixed DAG of
  4x4 composes — no dynamic control flow.

SMPL joint rotation convention: axis-angle per joint (B, 24, 3).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math3d import batch_rodrigues

SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)
NUM_JOINTS = 24


class SMPLModel:
    """Host container; fields are numpy arrays moved to device on use.

    v_template (V,3), shapedirs (V,3,NB), posedirs (V,3,207) or None,
    J_regressor (24,V), weights (V,24), parents (24,), faces (F,3).
    """

    def __init__(self, v_template, shapedirs, posedirs, J_regressor, weights, parents, faces,
                 gender: str = "neutral"):
        self.v_template = np.asarray(v_template, np.float32)
        self.shapedirs = np.asarray(shapedirs, np.float32)
        self.posedirs = None if posedirs is None else np.asarray(posedirs, np.float32)
        self.J_regressor = np.asarray(J_regressor, np.float32)
        self.weights = np.asarray(weights, np.float32)
        self.parents = np.asarray(parents, np.int32)
        self.faces = np.asarray(faces, np.int64)
        self.gender = gender

    @property
    def num_verts(self):
        return self.v_template.shape[0]


def _as_dense(x):
    if hasattr(x, "toarray"):
        return x.toarray()
    if hasattr(x, "todense"):
        return np.asarray(x.todense())
    return np.asarray(x)


def load_smpl(gender: str = "neutral", smpl_dir: str | None = None) -> SMPLModel:
    """Load licensed SMPL assets. Searches ``smpl_dir`` (or $SMPL_DATA_DIR,
    defaulting to ../SMPL like the reference's ``utils/constant.py:33``)
    for ``SMPL_{GENDER}.{pkl,npz}`` / ``basicmodel_*`` layouts."""
    smpl_dir = smpl_dir or os.environ.get("SMPL_DATA_DIR", "../SMPL/")
    cands = [
        f"SMPL_{gender.upper()}.pkl",
        f"SMPL_{gender.upper()}.npz",
        f"basicmodel_{'m' if gender == 'male' else 'f' if gender == 'female' else 'neutral'}_lbs_10_207_0_v1.0.0.pkl",
        f"smpl_{gender}.npz",
    ]
    path = None
    for c in cands:
        p = os.path.join(smpl_dir, c)
        if os.path.isfile(p):
            path = p
            break
    if path is None:
        raise FileNotFoundError(
            f"No SMPL asset for gender={gender} under {smpl_dir}; "
            "set SMPL_DATA_DIR or use synthetic_body_model() for tests."
        )
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        shapedirs = _as_dense(data["shapedirs"])[:, :, :10]
        return SMPLModel(
            _as_dense(data["v_template"]), shapedirs, _as_dense(data["posedirs"]),
            _as_dense(data["J_regressor"]), _as_dense(data["weights"]),
            _as_dense(data["kintree_table"])[0] if "kintree_table" in data else SMPL_PARENTS,
            _as_dense(data["f"]), gender,
        )
    data = np.load(path, allow_pickle=True)
    return SMPLModel(
        data["v_template"], data["shapedirs"][:, :, :10],
        data["posedirs"] if "posedirs" in data else None,
        data["J_regressor"], data["weights"],
        data["parents"] if "parents" in data else SMPL_PARENTS,
        data["f"] if "f" in data else data["faces"], gender,
    )


# ---------------------------------------------------------------------------
# Synthetic humanoid (deterministic; for tests/benchmarks without assets)
# ---------------------------------------------------------------------------

# Approximate T-pose SMPL joint locations (meters, y-up, pelvis near origin).
_TPOSE_JOINTS = np.array(
    [
        [0.00, -0.20, 0.00],   # 0 pelvis
        [0.07, -0.30, 0.00],   # 1 L hip
        [-0.07, -0.30, 0.00],  # 2 R hip
        [0.00, -0.08, 0.00],   # 3 spine1
        [0.10, -0.70, 0.00],   # 4 L knee
        [-0.10, -0.70, 0.00],  # 5 R knee
        [0.00, 0.05, 0.00],    # 6 spine2
        [0.09, -1.10, -0.02],  # 7 L ankle
        [-0.09, -1.10, -0.02], # 8 R ankle
        [0.00, 0.18, 0.00],    # 9 spine3
        [0.11, -1.16, 0.10],   # 10 L foot
        [-0.11, -1.16, 0.10],  # 11 R foot
        [0.00, 0.38, 0.00],    # 12 neck
        [0.08, 0.30, 0.00],    # 13 L collar
        [-0.08, 0.30, 0.00],   # 14 R collar
        [0.00, 0.50, 0.02],    # 15 head
        [0.18, 0.32, 0.00],    # 16 L shoulder
        [-0.18, 0.32, 0.00],   # 17 R shoulder
        [0.44, 0.32, 0.00],    # 18 L elbow
        [-0.44, 0.32, 0.00],   # 19 R elbow
        [0.70, 0.32, 0.00],    # 20 L wrist
        [-0.70, 0.32, 0.00],   # 21 R wrist
        [0.78, 0.32, 0.00],    # 22 L hand
        [-0.78, 0.32, 0.00],   # 23 R hand
    ],
    dtype=np.float32,
)

_BONE_RADII = {
    (0, 1): 0.09, (0, 2): 0.09, (0, 3): 0.12, (1, 4): 0.07, (2, 5): 0.07,
    (3, 6): 0.12, (4, 7): 0.05, (5, 8): 0.05, (6, 9): 0.12, (7, 10): 0.04,
    (8, 11): 0.04, (9, 12): 0.09, (9, 13): 0.07, (9, 14): 0.07, (12, 15): 0.07,
    (13, 16): 0.06, (14, 17): 0.06, (16, 18): 0.05, (17, 19): 0.05,
    (18, 20): 0.04, (19, 21): 0.04, (20, 22): 0.035, (21, 23): 0.035,
}


def _capsule_sdf(p, a, b, r):
    ab = b - a
    t = np.clip(((p - a) @ ab) / max(float(ab @ ab), 1e-9), 0.0, 1.0)
    return np.linalg.norm(p - (a + t[..., None] * ab), axis=-1) - r


def synthetic_body_sdf(pts: np.ndarray) -> np.ndarray:
    """Union-of-capsules SDF of the synthetic humanoid; used by tests and
    by the synthetic-scene generator as ground truth geometry."""
    d = np.full(pts.shape[0], 1e9, np.float32)
    for (pi, ci), r in _BONE_RADII.items():
        d = np.minimum(d, _capsule_sdf(pts, _TPOSE_JOINTS[pi], _TPOSE_JOINTS[ci], r))
    return d


def synthetic_body_model(n_subdiv: int = 40) -> SMPLModel:
    """Deterministic humanoid with SMPL tensor layout.

    The surface is a UV-sphere warped onto the capsule-union body via
    sphere tracing toward the SDF zero set; skinning weights are inverse
    squared distances to the two nearest bones. This yields a closed
    manifold mesh — adequate for skinning-field construction, IGR
    initialization, and end-to-end tests without licensed assets.
    """
    # UV sphere
    n_lat, n_lon = n_subdiv, n_subdiv
    lat = np.linspace(1e-3, np.pi - 1e-3, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    LAT, LON = np.meshgrid(lat, lon, indexing="ij")
    dirs = np.stack(
        [np.sin(LAT) * np.cos(LON), np.cos(LAT), np.sin(LAT) * np.sin(LON)], axis=-1
    ).reshape(-1, 3).astype(np.float32)
    center = np.array([0.0, -0.2, 0.0], np.float32)

    # March each ray from far outside toward the body along -dir
    verts = center + dirs * 2.0
    for _ in range(48):
        sd = synthetic_body_sdf(verts)
        verts = verts - dirs * np.maximum(sd, 0.0)[:, None] * 0.9
    # faces of the lat-lon grid (two triangles per quad, wrap lon)
    faces = []
    def vid(i, j):
        return i * n_lon + (j % n_lon)
    for i in range(n_lat - 1):
        for j in range(n_lon):
            # winding chosen so face normals point outward (IGR fitting
            # and the mask/normal losses depend on outward orientation)
            faces.append([vid(i, j), vid(i, j + 1), vid(i + 1, j)])
            faces.append([vid(i, j + 1), vid(i + 1, j + 1), vid(i + 1, j)])
    faces = np.asarray(faces, np.int64)

    # Skinning weights: softmax over negative distance to child bones
    V = verts.shape[0]
    dists = np.zeros((V, NUM_JOINTS), np.float32)
    dists[:] = 1e9
    for (pi, ci), r in _BONE_RADII.items():
        d = np.maximum(_capsule_sdf(verts, _TPOSE_JOINTS[pi], _TPOSE_JOINTS[ci], r) + r, 1e-4)
        dists[:, ci] = np.minimum(dists[:, ci], d)
    w = 1.0 / np.maximum(dists, 1e-4) ** 2
    w = np.where(dists > 1e8, 0.0, w)
    w[:, 0] += 1e-6  # ensure nonzero rows
    w = w / w.sum(axis=1, keepdims=True)

    # Joint regressor: joints are fixed functions of nearby verts
    jr = np.zeros((NUM_JOINTS, V), np.float32)
    vd = np.linalg.norm(verts[None, :, :] - _TPOSE_JOINTS[:, None, :], axis=-1)
    nearest = np.argsort(vd, axis=1)[:, :8]
    for j in range(NUM_JOINTS):
        jr[j, nearest[j]] = 1.0 / 8.0

    shapedirs = np.zeros((V, 3, 10), np.float32)
    # beta0 = global scale-ish blendshape so shape optimization has signal
    shapedirs[:, :, 0] = (verts - center) * 0.1
    shapedirs[:, 1, 1] = 0.1  # beta1 = height shift

    return SMPLModel(verts, shapedirs, None, jr, w, SMPL_PARENTS, faces, "synthetic")


def get_smpl(gender: str = "neutral", smpl_dir: str | None = None) -> SMPLModel:
    """Reference-compatible factory (smpl_pytorch.getSMPL): real assets if
    present, otherwise the deterministic synthetic body."""
    try:
        return load_smpl(gender, smpl_dir)
    except FileNotFoundError:
        return synthetic_body_model()


# ---------------------------------------------------------------------------
# Kinematics and LBS (pure JAX)
# ---------------------------------------------------------------------------

def forward_kinematics(rotmats: jnp.ndarray, joints: jnp.ndarray, parents) -> jnp.ndarray:
    """Compose the joint transform chain.

    rotmats (B,24,3,3) local joint rotations; joints (B,24,3) or (24,3)
    rest joint locations; parents static (24,). Returns world transforms
    A (B,24,4,4) with A[:, j, :3, 3] = posed joint positions — the
    ``make_A`` chain of the reference (``model/Deformer.py:379-396``),
    unrolled at trace time.
    """
    parents = np.asarray(parents)
    if joints.ndim == 2:
        joints = joints[None]
    B = rotmats.shape[0]

    def make_A(R, t):
        A = jnp.zeros((B, 4, 4), rotmats.dtype)
        A = A.at[:, :3, :3].set(R)
        A = A.at[:, :3, 3].set(t)
        A = A.at[:, 3, 3].set(1.0)
        return A

    results = [make_A(rotmats[:, 0], jnp.broadcast_to(joints[:, 0], (B, 3)))]
    for i in range(1, parents.shape[0]):
        j_rel = joints[:, i] - joints[:, parents[i]]
        A_loc = make_A(rotmats[:, i], jnp.broadcast_to(j_rel, (B, 3)))
        results.append(jnp.matmul(results[parents[i]], A_loc, precision=jax.lax.Precision.HIGHEST))
    return jnp.stack(results, axis=1)


def relative_transforms(A: jnp.ndarray, joints: jnp.ndarray) -> jnp.ndarray:
    """Subtract the rest-joint contribution: A_rel = A - pad(A @ [J;0]).
    Skinning transforms that map rest-pose points to posed points."""
    if joints.ndim == 2:
        joints = joints[None]
    B = A.shape[0]
    Jw0 = jnp.concatenate(
        [jnp.broadcast_to(joints, (B,) + joints.shape[-2:]), jnp.zeros((B, joints.shape[-2], 1))],
        axis=-1,
    )
    init_bone = jnp.einsum("bjxy,bjy->bjx", A, Jw0, precision=jax.lax.Precision.HIGHEST)  # (B,24,4)
    # subtract as the last column: A - pad(init_bone) with pad [3,0] on cols
    return A - jnp.pad(init_bone[..., None], ((0, 0), (0, 0), (0, 0), (3, 0)))


def smpl_skeleton(model: SMPLModel, betas: jnp.ndarray):
    """betas (NB,) or (1,NB) → rest joints (24,3) for the shaped body."""
    betas = jnp.asarray(betas).reshape(-1)
    v_shaped = jnp.asarray(model.v_template) + jnp.einsum(
        "vdn,n->vd", jnp.asarray(model.shapedirs), betas
    )
    return jnp.matmul(jnp.asarray(model.J_regressor), v_shaped, precision=jax.lax.Precision.HIGHEST)


def smpl_forward(model: SMPLModel, betas: jnp.ndarray, pose: jnp.ndarray,
                 with_pose_blend: bool = True):
    """betas (NB,), pose (B,24,3) axis-angle → (verts (B,V,3), joints
    (B,24,3), A (B,24,4,4)). No global translation (handled by callers)."""
    betas = jnp.asarray(betas).reshape(-1)
    pose = jnp.asarray(pose)
    if pose.ndim == 2:
        pose = pose[None]
    B = pose.shape[0]
    v_template = jnp.asarray(model.v_template)
    v_shaped = v_template + jnp.einsum("vdn,n->vd", jnp.asarray(model.shapedirs), betas)
    J = jnp.matmul(jnp.asarray(model.J_regressor), v_shaped, precision=jax.lax.Precision.HIGHEST)  # (24,3)

    rotmats = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, NUM_JOINTS, 3, 3)
    v_posed = jnp.broadcast_to(v_shaped, (B,) + v_shaped.shape)
    if with_pose_blend and model.posedirs is not None:
        ident = jnp.eye(3)
        pose_feat = (rotmats[:, 1:] - ident).reshape(B, -1)  # (B, 207)
        v_posed = v_posed + jnp.einsum("vdp,bp->bvd", jnp.asarray(model.posedirs), pose_feat)

    A = forward_kinematics(rotmats, J, model.parents)
    A_rel = relative_transforms(A, J)
    W = jnp.asarray(model.weights)  # (V,24)
    T = jnp.einsum("vj,bjxy->bvxy", W, A_rel, precision=jax.lax.Precision.HIGHEST)
    v_h = jnp.concatenate([v_posed, jnp.ones((B, v_posed.shape[1], 1))], axis=-1)
    verts = jnp.einsum("bvxy,bvy->bvx", T, v_h, precision=jax.lax.Precision.HIGHEST)[..., :3]
    joints = A[:, :, :3, 3]
    return verts, joints, A
