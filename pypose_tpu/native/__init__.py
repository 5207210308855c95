r"""Native (C++) runtime components, loaded via ctypes.

Currently: fast dataset loaders (g2o / BAL text parsing — the IO path the
reference leaves to Python, examples/module/pgo/pgo_dataset.py).  The
shared library builds on first use with the system g++ and is cached next
to the source; every entry point has a pure-Python fallback so the package
works without a toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'src', 'loader.cpp')
_LIB = os.path.join(_DIR, 'libppt_loader.so')

_lib = None
_tried = False


def _build():
    cmd = ['g++', '-O2', '-shared', '-fPIC', '-std=c++17', '-o', _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native loader; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.ppt_g2o_parse.restype = ctypes.c_int
        lib.ppt_g2o_parse.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.ppt_bal_parse.restype = ctypes.c_int
        lib.ppt_bal_parse.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.c_void_p)


def parse_g2o(path):
    """Native g2o parse -> (vertex_ids, vertices[N,7], edges[E,2],
    measures[E,7], infos[E,21]) as numpy arrays, or None on fallback."""
    lib = get_lib()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    ne = ctypes.c_int64()
    if lib.ppt_g2o_parse(path.encode(), ctypes.byref(nv),
                         ctypes.byref(ne)) != 0:
        return None
    V, E = nv.value, ne.value
    vertex_ids = np.empty(V, np.int64)
    vertices = np.empty((V, 7), np.float64)
    edges = np.empty((E, 2), np.int64)
    measures = np.empty((E, 7), np.float64)
    infos = np.empty((E, 21), np.float64)
    lib.ppt_g2o_copy(_ptr(vertex_ids), _ptr(vertices), _ptr(edges),
                     _ptr(measures), _ptr(infos))
    lib.ppt_g2o_free()
    return vertex_ids, vertices, edges, measures, infos


def parse_bal(path):
    """Native BAL parse -> (cam_idx, pt_idx, pixels, cameras, points)."""
    lib = get_lib()
    if lib is None:
        return None
    nc = ctypes.c_int64()
    npt = ctypes.c_int64()
    no = ctypes.c_int64()
    if lib.ppt_bal_parse(path.encode(), ctypes.byref(nc), ctypes.byref(npt),
                         ctypes.byref(no)) != 0:
        return None
    C, P, O = nc.value, npt.value, no.value
    cam_idx = np.empty(O, np.int64)
    pt_idx = np.empty(O, np.int64)
    pixels = np.empty((O, 2), np.float64)
    cameras = np.empty((C, 9), np.float64)
    points = np.empty((P, 3), np.float64)
    lib.ppt_bal_copy(_ptr(cam_idx), _ptr(pt_idx), _ptr(pixels),
                     _ptr(cameras), _ptr(points))
    lib.ppt_bal_free()
    return cam_idx, pt_idx, pixels, cameras, points
