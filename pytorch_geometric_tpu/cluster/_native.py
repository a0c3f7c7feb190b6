"""ctypes bridge to the native graphcore library.

Builds ``libgraphcore.so`` lazily with g++ on first use (cached next to
the source); every entry point has a pure-numpy fallback so the package
works without a toolchain.  pybind11 is unavailable in this image, hence
the C ABI + ctypes.
"""

import ctypes
import os
import os.path as osp
import subprocess
import warnings

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "native", "graphcore.cpp")
_SO = osp.join(_HERE, "native", "libgraphcore.so")

_lib = None
_tried = False

_I64 = ctypes.POINTER(ctypes.c_int64)
_F64 = ctypes.POINTER(ctypes.c_double)


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Return the loaded native library, building it if necessary, or
    None when no toolchain is available."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not osp.exists(_SO) or \
                os.stat(_SRC).st_mtime > os.stat(_SO).st_mtime:
            _build()
        try:
            lib = _bind(ctypes.CDLL(_SO))
        except (OSError, AttributeError):
            # A stale .so (e.g. restored by a fresh checkout with equal
            # mtimes) may miss newer symbols — rebuild once and retry.
            _build()
            lib = _bind(ctypes.CDLL(_SO))
        _lib = lib
    except Exception as exc:  # no toolchain / build failure
        warnings.warn(f"graphcore native build unavailable ({exc}); "
                      "using numpy fallbacks.")
        _lib = None
    return _lib


def _bind(lib):
        lib.graclus_cluster.argtypes = [
            _I64, _I64, _F64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, _I64]
        lib.voxel_grid.argtypes = [
            _F64, ctypes.c_int64, ctypes.c_int64, _I64, _F64, _F64, _F64,
            _I64]
        lib.fps.restype = ctypes.c_int64
        lib.fps.argtypes = [
            _F64, ctypes.c_int64, ctypes.c_int64, _I64, ctypes.c_double,
            ctypes.c_int64, ctypes.c_uint64, _I64]
        lib.radius.restype = ctypes.c_int64
        lib.radius.argtypes = [
            _F64, ctypes.c_int64, _F64, ctypes.c_int64, ctypes.c_int64,
            _I64, _I64, ctypes.c_double, ctypes.c_int64, _I64, _I64]
        lib.knn.restype = ctypes.c_int64
        lib.knn.argtypes = [
            _F64, ctypes.c_int64, _F64, ctypes.c_int64, ctypes.c_int64,
            _I64, _I64, ctypes.c_int64, _I64, _I64]
        lib.coalesce.restype = ctypes.c_int64
        lib.coalesce.argtypes = [
            _I64, _I64, _F64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, _I64, _I64, _F64]
        lib.sample_neighbors.restype = ctypes.c_int64
        lib.sample_neighbors.argtypes = [
            _I64, _I64, _I64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, _I64, _I64]
        _I32 = ctypes.POINTER(ctypes.c_int32)
        lib.pack_edges.restype = ctypes.c_int64
        lib.pack_edges.argtypes = [
            _I64, _I64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            _I32, _I32, _I32, _I32, _I32, _I32]
        lib.pack_edges_bi.restype = ctypes.c_int64
        lib.pack_edges_bi.argtypes = [
            _I64, _I64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _I32, _I32, _I32, _I32, _I32, _I32]
        lib.pack_edges_asym.restype = ctypes.c_int64
        lib.pack_edges_asym.argtypes = [
            _I64, _I64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            _I32, _I32, _I32, _I32, _I32, _I32]
        return lib


def as_i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def as_f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def ptr_i64(a):
    return a.ctypes.data_as(_I64) if a is not None else None


def ptr_f64(a):
    return a.ctypes.data_as(_F64) if a is not None else None
