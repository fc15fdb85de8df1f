"""ctypes bindings to the native runtime library (_native.so).

Native components (native/src/*, built by `make -C native`):
- prt_build_lbvh: LBVH construction (Morton + Karras + threading) — the
  C++ counterpart of accel/lbvh.py, for meshes where the Python DFS loops
  are interpreter-bound.
- prt_ply_load/...: PLY mesh parsing (tinyply replacement, core/mesh.py
  counterpart).
- prt_encode_png: zlib PNG encoding for the film display path.

Everything degrades gracefully: `available()` is False when the .so is
missing and all callers fall back to the pure-Python implementations,
which remain the reference semantics."""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_native.so")


def _try_build() -> None:
    """Build _native.so from source if a toolchain is present.

    The binary is not committed (unreviewable, host-specific); it is
    compiled on first use from native/src/ — a ~2s one-time cost."""
    makefile = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "Makefile")
    if not os.path.exists(makefile):
        return
    import subprocess
    try:
        subprocess.run(["make", "-C", os.path.dirname(makefile)],
                       capture_output=True, timeout=120, check=False)
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        _try_build()
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")

    lib.prt_build_lbvh.restype = ctypes.c_int
    lib.prt_build_lbvh.argtypes = [f64p, f64p, ctypes.c_int64,
                                   f64p, f64p, i32p, i32p, i32p, i32p]

    lib.prt_ply_load.restype = ctypes.c_void_p
    lib.prt_ply_load.argtypes = [ctypes.c_char_p]
    lib.prt_ply_counts.restype = None
    lib.prt_ply_counts.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int64),
                                   ctypes.POINTER(ctypes.c_int64),
                                   ctypes.POINTER(ctypes.c_int32),
                                   ctypes.POINTER(ctypes.c_int32)]
    lib.prt_ply_fill.restype = None
    lib.prt_ply_fill.argtypes = [ctypes.c_void_p, f32p, f32p, f32p, u32p]
    lib.prt_ply_free.restype = None
    lib.prt_ply_free.argtypes = [ctypes.c_void_p]

    lib.prt_encode_png.restype = ctypes.c_int64
    lib.prt_encode_png.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int, u8p,
                                   ctypes.c_int64]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


# ------------------------------------------------------------------- LBVH

def build_lbvh(prim_min: np.ndarray, prim_max: np.ndarray):
    """Native threaded-LBVH build. Returns (node_min, node_max, is_leaf,
    payload, miss, order) with the same semantics as the Python builder
    (accel/lbvh.py thread_tree outputs)."""
    lib = _load()
    assert lib is not None, "native library not built (make -C native)"
    n = len(prim_min)
    m = 2 * n - 1 if n > 1 else 1
    pmin = np.ascontiguousarray(prim_min, np.float64)
    pmax = np.ascontiguousarray(prim_max, np.float64)
    node_min = np.zeros((m, 3), np.float64)
    node_max = np.zeros((m, 3), np.float64)
    leaf = np.zeros(m, np.int32)
    payload = np.zeros(m, np.int32)
    miss = np.zeros(m, np.int32)
    order = np.zeros(n, np.int32)
    rc = lib.prt_build_lbvh(pmin, pmax, n, node_min, node_max, leaf,
                            payload, miss, order)
    if rc != 0:
        raise RuntimeError(f"prt_build_lbvh failed with code {rc}")
    return node_min, node_max, leaf.astype(bool), payload, miss, order


# -------------------------------------------------------------------- PLY

def load_ply(path: str):
    """Native PLY parse. Returns (verts, normals|None, uvs|None, indices)."""
    lib = _load()
    assert lib is not None
    h = lib.prt_ply_load(path.encode())
    if not h:
        raise IOError(f"native PLY parse failed for {path}")
    try:
        nv = ctypes.c_int64()
        ni = ctypes.c_int64()
        hn = ctypes.c_int32()
        hu = ctypes.c_int32()
        lib.prt_ply_counts(h, ctypes.byref(nv), ctypes.byref(ni),
                           ctypes.byref(hn), ctypes.byref(hu))
        verts = np.zeros((nv.value, 3), np.float32)
        normals = np.zeros((nv.value, 3), np.float32)
        uvs = np.zeros((nv.value, 2), np.float32)
        idx = np.zeros(ni.value, np.uint32)
        lib.prt_ply_fill(h, verts, normals, uvs, idx)
        return (verts,
                normals if hn.value else None,
                uvs if hu.value else None,
                idx)
    finally:
        lib.prt_ply_free(h)


# -------------------------------------------------------------------- PNG

def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Native PNG encode of (H,W,3|4) uint8."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    cap = img.nbytes + (img.nbytes >> 1) + 4096
    out = np.zeros(cap, np.uint8)
    n = lib.prt_encode_png(img, h, w, c, level, out, cap)
    if n < 0:
        raise RuntimeError("prt_encode_png failed")
    return out[:n].tobytes()
