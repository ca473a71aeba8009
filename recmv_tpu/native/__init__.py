"""ctypes bindings for the native meshops runtime (builds on first use)."""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SO = osp.join(_DIR, "libmeshops.so")
_LIB = None


def _build():
    src = osp.join(_DIR, "meshops.cpp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not osp.isfile(_SO) or osp.getmtime(_SO) < osp.getmtime(osp.join(_DIR, "meshops.cpp")):
        _build()
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    lib.mc_run.restype = i64
    lib.mc_run.argtypes = [f32p, i64, i64, i64, ctypes.c_float, f32p, f32p,
                           i32p, i32p, f32p, i64, i32p, i64, i64p]
    lib.isotropic_remesh.restype = i64
    lib.isotropic_remesh.argtypes = [f32p, i64, i32p, i64, ctypes.c_float,
                                     ctypes.c_int32, f32p, i64, i32p, i64, i64p]
    _LIB = lib
    return lib


def marching_cubes_host(vol: np.ndarray, level: float = 0.0,
                        origin=(0, 0, 0), spacing=(1, 1, 1),
                        max_verts: int = 1 << 21, max_faces: int = 1 << 22):
    """Host C++ marching cubes — for very large inference grids (513³)
    where the fixed-capacity device path would waste HBM. Byte-compatible
    with ops.marching_cubes (shares the generated tables)."""
    from ..ops.mc_tables import N_TRIS, TRI_TABLE

    lib = get_lib()
    vol = np.ascontiguousarray(vol, np.float32)
    D, H, W = vol.shape
    out_v = np.empty((max_verts, 3), np.float32)
    out_f = np.empty((max_faces, 3), np.int32)
    counts = np.zeros(2, np.int64)
    ret = lib.mc_run(vol.reshape(-1), D, H, W, np.float32(level),
                     np.asarray(origin, np.float32), np.asarray(spacing, np.float32),
                     np.ascontiguousarray(TRI_TABLE.reshape(-1), np.int32),
                     np.ascontiguousarray(N_TRIS, np.int32),
                     out_v.reshape(-1), max_verts, out_f.reshape(-1), max_faces,
                     counts)
    if ret != 0:
        raise ValueError("mc_run overflow: raise max_verts/max_faces")
    return out_v[: counts[0]].copy(), out_f[: counts[1]].astype(np.int64)


def isotropic_remesh(verts: np.ndarray, faces: np.ndarray,
                     target_len: float, iters: int = 3,
                     grow: float = 8.0):
    """Native isotropic remesh (pymeshlab replacement for registration:
    garment_structure.py:402-460). Boundary vertices are pinned."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    max_v = int(len(verts) * grow) + 1024
    max_f = int(len(faces) * grow) + 2048
    out_v = np.empty((max_v, 3), np.float32)
    out_f = np.empty((max_f, 3), np.int32)
    counts = np.zeros(2, np.int64)
    ret = lib.isotropic_remesh(verts.reshape(-1), len(verts), faces.reshape(-1),
                               len(faces), np.float32(target_len), np.int32(iters),
                               out_v.reshape(-1), max_v, out_f.reshape(-1), max_f,
                               counts)
    if ret != 0:
        raise ValueError("isotropic_remesh overflow")
    return out_v[: counts[0]].copy(), out_f[: counts[1]].astype(np.int64)
