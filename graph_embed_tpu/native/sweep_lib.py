"""ctypes bindings + lazy build of the native first-collision sweep
(embed/radii host-sweep semantics; see native/sweep.cpp)."""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

from . import build_shared

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sweep.cpp")
_SO = os.path.join(_HERE, "_sweep.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> str:
    return build_shared(_SRC, _SO, extra_flags=("-ffp-contract=off",))  # no FMA: must round like numpy


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            for name in ("ge_sweep_run_f32", "ge_sweep_run_f64"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int64
                fn.argtypes = [ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_void_p, ctypes.c_void_p]
            for name in ("ge_sweep_batch_f32", "ge_sweep_batch_f64"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int64
                fn.argtypes = [ctypes.c_int64] + [ctypes.c_void_p] * 6
            _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def sweep_run(tau0, pi, pj, num_local: int) -> np.ndarray:
    """First-collision sweep; bit-identical to radii._sweep_host.

    tau0: [P] f32/f64 initial times; pi/pj: [P] vertex ids in
    [0, num_local).  Returns r [num_local] in tau0's dtype (0 = never
    assigned)."""
    lib = _lib()
    tau0 = np.ascontiguousarray(tau0)
    if tau0.dtype == np.float64:
        fn = lib.ge_sweep_run_f64
    elif tau0.dtype == np.float32:
        fn = lib.ge_sweep_run_f32
    else:
        tau0 = tau0.astype(np.float64)
        fn = lib.ge_sweep_run_f64
    pi = np.ascontiguousarray(pi, dtype=np.int32)
    pj = np.ascontiguousarray(pj, dtype=np.int32)
    r = np.empty(int(num_local), dtype=tau0.dtype)
    rc = fn(int(tau0.shape[0]), int(num_local),
            tau0.ctypes.data_as(ctypes.c_void_p),
            pi.ctypes.data_as(ctypes.c_void_p),
            pj.ctypes.data_as(ctypes.c_void_p),
            r.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise OSError("native sweep failed")
    return r


def sweep_batch(tau0, pi, pj, p_starts, v_starts) -> np.ndarray:
    """Independent per-row sweeps in one call (two worker threads).

    Row b: pairs [p_starts[b], p_starts[b+1]) with pi/pj local to a
    vertex space of size v_starts[b+1] - v_starts[b]; returns the
    concatenated radii [v_starts[-1]] in tau0's dtype."""
    lib = _lib()
    tau0 = np.ascontiguousarray(tau0)
    if tau0.dtype == np.float64:
        fn = lib.ge_sweep_batch_f64
    elif tau0.dtype == np.float32:
        fn = lib.ge_sweep_batch_f32
    else:
        tau0 = tau0.astype(np.float64)
        fn = lib.ge_sweep_batch_f64
    pi = np.ascontiguousarray(pi, dtype=np.int32)
    pj = np.ascontiguousarray(pj, dtype=np.int32)
    p_starts = np.ascontiguousarray(p_starts, dtype=np.int64)
    v_starts = np.ascontiguousarray(v_starts, dtype=np.int64)
    R = int(p_starts.shape[0]) - 1
    assert v_starts.shape[0] == R + 1
    r = np.empty(int(v_starts[-1]), dtype=tau0.dtype)
    rc = fn(R, p_starts.ctypes.data_as(ctypes.c_void_p),
            v_starts.ctypes.data_as(ctypes.c_void_p),
            tau0.ctypes.data_as(ctypes.c_void_p),
            pi.ctypes.data_as(ctypes.c_void_p),
            pj.ctypes.data_as(ctypes.c_void_p),
            r.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise OSError("native batched sweep failed")
    return r
