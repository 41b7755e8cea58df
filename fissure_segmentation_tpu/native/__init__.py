"""Native host-runtime layer (C++ via ctypes).

The reference's host-side heavy lifting lives in third-party C++ wheels
(Open3D raycasting metrics.py:11-25, Open3D mesh surgery
utils/general_utils.py:157-209, SimpleITK/scipy morphology). Here those
components are first-party C++ (src/fseg_native.cpp), compiled on first use
with g++ into a cached shared library and bound through ctypes — no build
step required, and every entry point has a pure NumPy/SciPy fallback so the
package works even without a toolchain.

Public API (all NumPy in / NumPy out):
    available()                 -> bool
    cc_label_3d(grid)           -> (labels int32 zyx, n_components)
    cc_stats(labels, n)         -> (sizes int64, x_sums float64) per label
    point_mesh_distance(verts, tris, queries) -> (nq,) float32
    voxelize_triangles(tris, valid, shape, label, out=None) -> uint8 zyx
    binary_dilate_3d(grid, iters) -> uint8 zyx
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "fseg_native.cpp")
_LIB_PATH = os.path.join(_HERE, "_fseg_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    """Compile the shared library; atomic rename so concurrent builds race
    safely. Returns the .so path or None on failure."""
    try:
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
        os.close(fd)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-fno-math-errno", _SRC, "-o", tmp]
        res = subprocess.run(cmd, capture_output=True, timeout=300)
        if res.returncode != 0:
            os.unlink(tmp)
            return None
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH
        if not (os.path.exists(path)
                and os.path.getmtime(path) >= os.path.getmtime(_SRC)):
            path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64, i32, u8p = ctypes.c_int64, ctypes.c_int32, \
            ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.fseg_cc_label_3d.restype = i32
        lib.fseg_cc_label_3d.argtypes = [u8p, i64, i64, i64, i32p]
        lib.fseg_cc_stats.restype = None
        lib.fseg_cc_stats.argtypes = [i32p, i64, i64, i64, i32,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_double)]
        lib.fseg_point_mesh_dist.restype = None
        lib.fseg_point_mesh_dist.argtypes = [f32p, i64, i32p, i64, f32p, i64,
                                             f32p]
        lib.fseg_voxelize_tris.restype = None
        lib.fseg_voxelize_tris.argtypes = [f32p, u8p, i64, i64, i64, i64,
                                           ctypes.c_uint8, u8p]
        lib.fseg_binary_dilate_3d.restype = None
        lib.fseg_binary_dilate_3d.argtypes = [u8p, i64, i64, i64, i32, u8p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def cc_label_3d(grid: np.ndarray):
    """26-connected components of a boolean/uint8 zyx grid.

    :return: (labels int32, n) — labels 0 = background, 1..n components.
    Fallback: scipy.ndimage.label with a full 3x3x3 structure.
    """
    grid = np.ascontiguousarray(grid.astype(np.uint8, copy=False))
    lib = _load()
    if lib is None:
        from scipy import ndimage
        labels, n = ndimage.label(grid, structure=np.ones((3, 3, 3)))
        return labels.astype(np.int32), int(n)
    labels = np.empty(grid.shape, np.int32)
    nz, ny, nx = grid.shape
    n = lib.fseg_cc_label_3d(_ptr(grid, ctypes.c_uint8), nz, ny, nx,
                             _ptr(labels, ctypes.c_int32))
    return labels, int(n)


def cc_stats(labels: np.ndarray, n: int):
    """Per-component (voxel count, x-sum) for a `cc_label_3d` labeling —
    the inputs of keep_largest_component's size/side scoring, in one native
    pass. Fallback: numpy bincounts.

    :return: (sizes (n,) int64, xsum (n,) float64)
    """
    labels = np.ascontiguousarray(labels, np.int32)
    lib = _load()
    if lib is None or n <= 0:
        sizes = np.bincount(labels.ravel(), minlength=n + 1)[1:n + 1]
        xs = np.broadcast_to(np.arange(labels.shape[2], dtype=np.float64),
                             labels.shape)
        xsum = np.bincount(labels.ravel(), weights=xs.ravel(),
                           minlength=n + 1)[1:n + 1]
        return sizes.astype(np.int64), xsum
    sizes = np.empty(n, np.int64)
    xsum = np.empty(n, np.float64)
    nz, ny, nx = labels.shape
    lib.fseg_cc_stats(_ptr(labels, ctypes.c_int32), nz, ny, nx, n,
                      _ptr(sizes, ctypes.c_int64),
                      _ptr(xsum, ctypes.c_double))
    return sizes, xsum


def point_mesh_distance(verts: np.ndarray, tris: np.ndarray,
                        queries: np.ndarray) -> np.ndarray:
    """Unsigned distance from each query point to the mesh (BVH, exact).

    Host-native counterpart of metrics.point_surface_distance (which runs
    on device); same semantics as the reference's Open3D RaycastingScene
    compute_distance (metrics.py:11-25). Fallback: the device XLA path.
    """
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    queries = np.ascontiguousarray(queries, np.float32)
    lib = _load()
    if lib is None:
        from ..metrics import point_surface_distance
        import jax.numpy as jnp
        return np.asarray(point_surface_distance(
            jnp.asarray(queries), jnp.asarray(verts), jnp.asarray(tris)))
    out = np.empty(queries.shape[0], np.float32)
    lib.fseg_point_mesh_dist(
        _ptr(verts, ctypes.c_float), verts.shape[0],
        _ptr(tris, ctypes.c_int32), tris.shape[0],
        _ptr(queries, ctypes.c_float), queries.shape[0],
        _ptr(out, ctypes.c_float))
    return out


def voxelize_triangles(tris: np.ndarray, valid: np.ndarray | None, shape,
                       label: int, out: np.ndarray | None = None) -> np.ndarray:
    """Exact conservative rasterization of a triangle soup into a zyx grid.

    :param tris: (T, 3, 3) float xyz *voxel* coordinates
    :param valid: optional (T,) bool
    :param out: optional existing uint8 labelmap to write into
    Marks every voxel cube [i, i+1)^3 that overlaps a triangle. Replaces the
    reference's 1e7-random-sample approximation (surface_fitting.py:144-163)
    with the exact covering. Fallback: dense surface sampling.
    """
    tris = np.ascontiguousarray(tris, np.float32)
    if out is None:
        out = np.zeros(shape, np.uint8)
    lib = _load()
    if lib is None:
        # sampling fallback (matches reference semantics)
        import jax
        import jax.numpy as jnp
        from ..ops.marching import sample_points_on_triangles
        v = np.ones(tris.shape[0], bool) if valid is None else \
            np.asarray(valid, bool)
        if v.any():
            pts = np.asarray(sample_points_on_triangles(
                jax.random.PRNGKey(0), jnp.asarray(tris), jnp.asarray(v),
                10 ** 6))
            idx = np.floor(pts[:, ::-1]).astype(int)
            ok = np.all((idx >= 0) & (idx < np.asarray(shape)), axis=1)
            idx = idx[ok]
            out[idx[:, 0], idx[:, 1], idx[:, 2]] = label
        return out
    v = None if valid is None else \
        np.ascontiguousarray(np.asarray(valid, np.uint8))
    nz, ny, nx = shape
    lib.fseg_voxelize_tris(
        _ptr(tris, ctypes.c_float),
        None if v is None else _ptr(v, ctypes.c_uint8),
        tris.shape[0], nz, ny, nx, label, _ptr(out, ctypes.c_uint8))
    return out


def binary_dilate_3d(grid: np.ndarray, iters: int = 1) -> np.ndarray:
    """Iterated 6-connected dilation (scipy binary_dilation default)."""
    grid = np.ascontiguousarray(grid.astype(np.uint8, copy=False))
    if iters <= 0:
        return grid.copy()
    lib = _load()
    if lib is None:
        from scipy import ndimage
        return ndimage.binary_dilation(grid, iterations=iters).astype(np.uint8)
    out = np.empty(grid.shape, np.uint8)
    nz, ny, nx = grid.shape
    lib.fseg_binary_dilate_3d(_ptr(grid, ctypes.c_uint8), nz, ny, nx, iters,
                              _ptr(out, ctypes.c_uint8))
    return out
