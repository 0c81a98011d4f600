"""Python binding for the C++ BSDS boundary matcher (ctypes).

Replaces the reference's external ``bsds_metric.bsds.{thin,
correspond_pixels}`` C++/Cython dependency (``eval_depth_edges.py:7``).
Builds ``native/bsds/matcher.cpp`` with g++ on first use; falls back to a
scipy Hopcroft-Karp implementation (same max-cardinality counts) when no
compiler is available.
"""

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))
_SRC = os.path.join(_REPO_ROOT, 'native', 'bsds', 'matcher.cpp')
_LIB = os.path.join(_REPO_ROOT, 'native', 'bsds', 'libbsds_matcher.so')

_lib = None
_lib_failed = False


def _build():
    subprocess.check_call(
        ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _LIB])


def _get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.correspond_pixels.restype = ctypes.c_int
        lib.correspond_pixels.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
        lib.binary_thin.restype = None
        lib.binary_thin.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def _as_u8(m):
    return np.ascontiguousarray((np.asarray(m) != 0).astype(np.uint8))


def correspond_pixels(pred, gt, max_dist=0.0075):
    """Match pred/gt boundary pixels within max_dist * diagonal.

    Returns (match1, match2, cost, oc) mirroring the reference call shape
    (``eval_depth_edges.py:130-133``): match1/match2 are {0,1} maps over
    pred/gt pixels that found a partner.  cost/oc are returned as the match
    count and 0 (the reference only consumes match1/match2).
    """
    pred = _as_u8(pred)
    gt = _as_u8(gt)
    h, w = pred.shape
    assert gt.shape == (h, w), f'shape mismatch {pred.shape} vs {gt.shape}'

    lib = _get_lib()
    if lib is not None:
        match1 = np.zeros((h, w), dtype=np.uint8)
        match2 = np.zeros((h, w), dtype=np.uint8)
        n = lib.correspond_pixels(
            pred.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            gt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, float(max_dist),
            match1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            match2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return match1, match2, float(n), 0.0
    return _correspond_pixels_scipy(pred, gt, max_dist)


def _correspond_pixels_scipy(pred, gt, max_dist):
    """Fallback: scipy sparse Hopcroft-Karp (identical match counts)."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_bipartite_matching

    h, w = pred.shape
    r = max_dist * np.hypot(h, w)
    ri = int(np.ceil(r))
    py, px = np.nonzero(pred)
    gy, gx = np.nonzero(gt)
    match1 = np.zeros((h, w), dtype=np.uint8)
    match2 = np.zeros((h, w), dtype=np.uint8)
    if len(py) == 0 or len(gy) == 0:
        return match1, match2, 0.0, 0.0

    gt_id = -np.ones((h, w), dtype=np.int64)
    gt_id[gy, gx] = np.arange(len(gy))
    rows, cols = [], []
    offsets = [(dy, dx) for dy in range(-ri, ri + 1)
               for dx in range(-ri, ri + 1) if dy * dy + dx * dx <= r * r]
    for k in range(len(py)):
        y, x = py[k], px[k]
        for dy, dx in offsets:
            yy, xx = y + dy, x + dx
            if 0 <= yy < h and 0 <= xx < w and gt_id[yy, xx] >= 0:
                rows.append(k)
                cols.append(gt_id[yy, xx])
    if not rows:
        return match1, match2, 0.0, 0.0
    graph = csr_matrix((np.ones(len(rows), dtype=np.int8), (rows, cols)),
                       shape=(len(py), len(gy)))
    col_match = maximum_bipartite_matching(graph, perm_type='column')
    matched_left = np.nonzero(col_match >= 0)[0]
    matched_right = col_match[matched_left]
    match1[py[matched_left], px[matched_left]] = 1
    match2[gy[matched_right], gx[matched_right]] = 1
    return match1, match2, float(len(matched_left)), 0.0


def binary_thin(img):
    """Zhang-Suen morphological thinning of a binary map."""
    img = _as_u8(img).copy()
    lib = _get_lib()
    if lib is not None:
        lib.binary_thin(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            img.shape[0], img.shape[1])
        return img.astype(bool)
    raise RuntimeError('binary_thin requires the native matcher (g++)')
