"""Native (C++) setup kernels, loaded via ctypes with numpy fallbacks.

Build on demand with g++ (cached as libtps_setup.so next to the source).
All entry points degrade gracefully to the pure-numpy implementations when
the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "setup_kernels.cpp")
_LIB = os.path.join(_HERE, "libtps_setup.so")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        lib.build_face_topology.restype = ctypes.c_int64
        lib.build_face_topology.argtypes = [
            i64p, i32p, i32p, ctypes.c_int64, ctypes.c_int32,
            i32p, i32p, i32p, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.match_face_points.restype = ctypes.c_double
        lib.match_face_points.argtypes = [
            f64p, f64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        lib.build_ef_tables.restype = ctypes.c_int64
        lib.build_ef_tables.argtypes = [
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int64, i32p, i32p, i32p, i32p, i32p, i32p, i32p, f64p,
        ]
        lib.locate_points.restype = ctypes.c_int64
        lib.locate_points.argtypes = [
            f64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            f64p, ctypes.c_int64, ctypes.c_double, i32p, f64p, u8p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


# -- high-level wrappers ----------------------------------------------------


def face_topology(keys: np.ndarray, rec_e: np.ndarray, rec_lf: np.ndarray):
    """Group (element, local face) records by canonical vertex key.

    keys [n_records, nvpf] int64 (sorted vertex ids per record).
    Returns (int_l, int_lfl, int_r, int_lfr, bdr_e, bdr_lf) or None."""
    lib = get_lib()
    if lib is None:
        return None
    n, nvpf = keys.shape
    int_l = np.zeros(n, dtype=np.int32)
    int_lfl = np.zeros(n, dtype=np.int32)
    int_r = np.zeros(n, dtype=np.int32)
    int_lfr = np.zeros(n, dtype=np.int32)
    bdr_e = np.zeros(n, dtype=np.int32)
    bdr_lf = np.zeros(n, dtype=np.int32)
    n_bdr = ctypes.c_int64(0)
    n_int = lib.build_face_topology(
        np.ascontiguousarray(keys, np.int64),
        np.ascontiguousarray(rec_e, np.int32),
        np.ascontiguousarray(rec_lf, np.int32),
        n, nvpf, int_l, int_lfl, int_r, int_lfr, bdr_e, bdr_lf,
        ctypes.byref(n_bdr),
    )
    nb = n_bdr.value
    return (int_l[:n_int], int_lfl[:n_int], int_r[:n_int], int_lfr[:n_int],
            bdr_e[:nb], bdr_lf[:nb])


def match_face_points(xl: np.ndarray, xr: np.ndarray):
    """qperm[nfi, nqf] aligning R points to L points; None if native absent."""
    lib = get_lib()
    if lib is None:
        return None
    nf, nqf, dim = xl.shape
    qperm = np.zeros((nf, nqf), dtype=np.int32)
    lib.match_face_points(
        np.ascontiguousarray(xl, np.float64),
        np.ascontiguousarray(xr, np.float64),
        nf, nqf, dim, qperm,
    )
    return qperm


def build_ef_tables(ne, nlf, nqf, nfi, nft, f_elem_l, f_slot_l, f_elem_r,
                    f_slot_r, f_qperm_r, allow_unassigned=False):
    """Native ef-table builder; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ef_face = np.zeros((ne, nlf), dtype=np.int32)
    ef_qmap = np.zeros((ne, nlf, nqf), dtype=np.int32)
    ef_sign = np.zeros((ne, nlf), dtype=np.float64)
    unassigned = lib.build_ef_tables(
        ne, nlf, nqf, nfi, nft,
        np.ascontiguousarray(f_elem_l, np.int32),
        np.ascontiguousarray(f_slot_l, np.int32),
        np.ascontiguousarray(f_elem_r, np.int32) if nfi else np.zeros(1, np.int32),
        np.ascontiguousarray(f_slot_r, np.int32) if nfi else np.zeros(1, np.int32),
        np.ascontiguousarray(f_qperm_r, np.int32) if nfi else np.zeros(1, np.int32),
        ef_face, ef_qmap, ef_sign,
    )
    if unassigned and not allow_unassigned:
        raise ValueError("unassigned (element, local face) slot — topology bug")
    return ef_face, ef_qmap, ef_sign


def locate_points(verts: np.ndarray, points: np.ndarray, tol=1e-8):
    """(elem_ids, ref_coords, found) or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ne, nverts, dim = verts.shape
    npts = len(points)
    elem_ids = np.zeros(npts, dtype=np.int32)
    ref = np.zeros((npts, dim), dtype=np.float64)
    found = np.zeros(npts, dtype=np.uint8)
    lib.locate_points(
        np.ascontiguousarray(verts, np.float64), ne, nverts, dim,
        np.ascontiguousarray(points, np.float64), npts, tol,
        elem_ids, ref, found,
    )
    return elem_ids, ref, found.astype(bool)
