"""Native (C++) host-side symbolic analysis with a ctypes binding.

The shared library is compiled on first use (g++, cached next to the
source); if no compiler is available the pure-numpy fallback is used — same
results, slower at extreme scale."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "symbolic.cpp")
_LIB = os.path.join(_HERE, "libsymbolic.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True,
                capture_output=True,
            )
        except Exception:
            _lib = False
            return False
    try:
        lib = ctypes.CDLL(_LIB)
        lib.jtdj_pair_count.restype = ctypes.c_int64
        lib.jtdj_pair_count.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64
        ]
        lib.jtdj_pair_map.restype = None
        lib.jtdj_pair_map.argtypes = [ctypes.POINTER(ctypes.c_int64)] * 2 + [
            ctypes.c_int64, ctypes.c_int64
        ] + [ctypes.POINTER(ctypes.c_int64)] * 5
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def jtdj_pair_map(rows: np.ndarray, cols: np.ndarray, m: int):
    """Pair map for JᵀDJ assembly: returns (pr, pc, pa, pb, pk) int64 arrays
    with one record per ordered pair of Jacobian entries sharing a row.

    C++ fast path; numpy fallback below is identical."""
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    nnz = len(rows)
    lib = _load()
    if lib:
        total = lib.jtdj_pair_count(_ptr(rows), nnz, m)
        out = [np.empty(total, dtype=np.int64) for _ in range(5)]
        lib.jtdj_pair_map(
            _ptr(rows), _ptr(cols), nnz, m,
            _ptr(out[0]), _ptr(out[1]), _ptr(out[2]), _ptr(out[3]), _ptr(out[4]),
        )
        return tuple(out)
    return _jtdj_pair_map_numpy(rows, cols, m)


def _jtdj_pair_map_numpy(rows, cols, m):
    """Vectorized numpy fallback (grouped by row count)."""
    order = np.argsort(rows, kind="stable")
    counts = np.bincount(rows, minlength=m)
    rowptr = np.concatenate([[0], np.cumsum(counts)])
    pr, pc, pa, pb, pk = [], [], [], [], []
    for k in np.unique(counts):
        if k == 0:
            continue
        rws = np.nonzero(counts == k)[0]
        # (nrows, k) entry indices of each row in this group
        starts = rowptr[rws]
        ent = starts[:, None] + np.arange(k)[None, :]
        ent = order[ent]                           # (nrows, k)
        a = np.repeat(ent, k, axis=1)              # (nrows, k*k)
        b = np.tile(ent, (1, k))
        pa.append(a.reshape(-1))
        pb.append(b.reshape(-1))
        pr.append(cols[a].reshape(-1))
        pc.append(cols[b].reshape(-1))
        pk.append(np.repeat(rws, k * k))
    cat = lambda xs: (
        np.concatenate(xs) if xs else np.zeros(0, dtype=np.int64)
    )
    return cat(pr), cat(pc), cat(pa), cat(pb), cat(pk)
