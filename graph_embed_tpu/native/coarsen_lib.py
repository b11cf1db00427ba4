"""ctypes bindings + lazy build of the native coarsener.

Same pattern as fastload: the shared library is compiled on first use with
g++ -O3 (cached next to the source); callers fall back to the device
coarsener if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

from . import build_shared

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "coarsen.cpp")
_SO = os.path.join(_HERE, "_coarsen.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> str:
    return build_shared(_SRC, _SO, extra_flags=("-ffp-contract=off",))  # no FMA: must round like numpy


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            lib.ge_coarsen_run.restype = ctypes.c_void_p
            lib.ge_coarsen_run.argtypes = [
                ctypes.c_int64, ctypes.c_int64,              # n, e
                ctypes.c_void_p, ctypes.c_void_p,            # s, r
                ctypes.c_void_p, ctypes.c_int,               # w, is_f64
                ctypes.c_double, ctypes.c_int64,             # cf, num_parts
                ctypes.c_int, ctypes.c_int,                  # match_iters, pos
                ctypes.c_double, ctypes.c_int,               # stall, leaves
                ctypes.c_int, ctypes.c_double,               # hash_tb, jitter
                ctypes.c_int64, ctypes.c_double,             # max_agg, absorb
                ctypes.c_int64, ctypes.c_int,                # force_coarsen_to, emit_graphs
                ctypes.POINTER(ctypes.c_int64),              # num_levels out
                ctypes.POINTER(ctypes.c_double),             # Q out
            ]
            lib.ge_coarsen_graph_edges.restype = ctypes.c_int64
            lib.ge_coarsen_graph_edges.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_int64]
            lib.ge_coarsen_fill_graph.restype = None
            lib.ge_coarsen_fill_graph.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_int64,
                                                  ctypes.c_void_p,
                                                  ctypes.c_void_p,
                                                  ctypes.c_void_p]
            lib.ge_coarsen_level_sizes.restype = None
            lib.ge_coarsen_level_sizes.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_void_p]
            lib.ge_coarsen_fill_assign.restype = None
            lib.ge_coarsen_fill_assign.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_int64,
                                                   ctypes.c_void_p]
            lib.ge_coarsen_free.restype = None
            lib.ge_coarsen_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


def coarsen_run(n, senders, receivers, weights, *, coarsening_factor=0.0,
                num_parts=0, matching_iterations=2, positive_merging=True,
                stall_stop_threshold=1.0, merge_leaves=False,
                tie_break="hash", weight_jitter=0.0, max_agg_size=0,
                absorb_below=0.0, force_coarsen_to=0, emit_graphs=False):
    """Run the native hierarchy coarsener.

    Returns (assignments, level_sizes, Q[, graphs]): ``assignments[l]`` is
    an int32 array mapping level-l vertices to level-(l+1) aggregate ids;
    ``level_sizes`` is [n0, n1, ..., nk].  With ``emit_graphs`` a fourth
    element is returned: per snapshot the coarse adjacency
    A_{l+1} = P^T A P as a canonical COO (s, r, w) -- sorted by (s, r),
    deduplicated, diagonal = intra-aggregate weight -- so the Galerkin
    chain (examples/embed.cpp:95-98) costs a memcpy instead of a
    per-level relabel+sort."""
    lib = _lib()
    s = np.ascontiguousarray(senders, dtype=np.int32)
    r = np.ascontiguousarray(receivers, dtype=np.int32)
    w = np.ascontiguousarray(weights)
    if w.dtype == np.float64:
        is_f64 = 1
    elif w.dtype == np.float32:
        is_f64 = 0
    else:
        w = w.astype(np.float64)
        is_f64 = 1
    num_levels = ctypes.c_int64(0)
    q = ctypes.c_double(0.0)
    handle = lib.ge_coarsen_run(
        int(n), int(s.shape[0]),
        s.ctypes.data_as(ctypes.c_void_p), r.ctypes.data_as(ctypes.c_void_p),
        w.ctypes.data_as(ctypes.c_void_p), is_f64,
        float(coarsening_factor), int(num_parts), int(matching_iterations),
        int(bool(positive_merging)), float(stall_stop_threshold),
        int(bool(merge_leaves)), int(tie_break == "hash"),
        float(weight_jitter), int(max_agg_size), float(absorb_below),
        int(force_coarsen_to), int(bool(emit_graphs)),
        ctypes.byref(num_levels), ctypes.byref(q))
    if not handle:
        raise OSError("native coarsener failed")
    try:
        k = num_levels.value
        sizes = np.empty(k + 1, dtype=np.int64)
        lib.ge_coarsen_level_sizes(handle,
                                   sizes.ctypes.data_as(ctypes.c_void_p))
        assignments = []
        for lvl in range(k):
            a = np.empty(int(sizes[lvl]), dtype=np.int32)
            lib.ge_coarsen_fill_assign(handle, lvl,
                                       a.ctypes.data_as(ctypes.c_void_p))
            assignments.append(a)
        if not emit_graphs:
            return assignments, sizes.tolist(), float(q.value)
        graphs = []
        for lvl in range(k):
            e = int(lib.ge_coarsen_graph_edges(handle, lvl))
            cs = np.empty(e, dtype=np.int32)
            cr = np.empty(e, dtype=np.int32)
            cw = np.empty(e, dtype=np.float64)
            if e:
                lib.ge_coarsen_fill_graph(
                    handle, lvl, cs.ctypes.data_as(ctypes.c_void_p),
                    cr.ctypes.data_as(ctypes.c_void_p),
                    cw.ctypes.data_as(ctypes.c_void_p))
            graphs.append((cs, cr, cw))
        return assignments, sizes.tolist(), float(q.value), graphs
    finally:
        lib.ge_coarsen_free(handle)
