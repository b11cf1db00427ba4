"""Flat ForceAtlas2 layout: one jitted step, lax.fori_loop over iterations.

TPU-native re-design of ``partition::forceAtlas`` (include/forceatlas.hpp:
89-312).  One reference iteration reads coords and writes coords in separate
phases, so it is a pure function (coords, forces_prev) -> (coords',
forces) -- directly a jitted step (SURVEY.md SS3.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph.csr import Graph
from ..utils.params import ForceAtlasParams
from . import forces as F


def compute_forces(coords, g: Graph, deg, params: ForceAtlasParams,
                   key=None, groups=None, members=None):
    """Total force vector per vertex for one iteration
    (forceatlas.hpp:146-212).  ``key`` is required for sampled repulsion;
    ``groups`` (a Partition into ~1-4k groups) for 'centroids' repulsion."""
    deg_p1 = deg + 1.0
    eps = params.epsilon
    if params.repulsion == "exact":
        rep = F.repulsion_exact(coords, deg_p1, params.repel, eps)
    elif params.repulsion == "gram":
        rep = F.repulsion_gram(coords, deg_p1, params.repel, eps)
    elif params.repulsion == "sampled":
        if key is None:
            raise ValueError("sampled repulsion needs a PRNG key")
        rep = F.repulsion_sampled(coords, deg_p1, params.repel, eps, key,
                                  params.num_negative_samples)
    elif params.repulsion == "centroids":
        if groups is None:
            raise ValueError("centroids repulsion needs a groups Partition")
        from .farfield import centroid_repulsion

        rep = centroid_repulsion(coords, deg_p1, groups, params.repel, eps,
                                 members=members)
    else:
        raise ValueError(f"unknown repulsion {params.repulsion!r}")
    att = F.attraction_csr(
        coords, g.senders, g.receivers, g.weights, deg_p1, g.num_edges,
        attract=params.attract, eps=eps, linlog=params.linlog,
        delta=params.delta, nohubs=params.nohubs,
        use_weights=params.use_weights)
    grav = F.gravity_force(coords, deg_p1, params.gravity)
    return rep + att + grav


def fa_step(coords, forces_prev, g: Graph, deg, params: ForceAtlasParams,
            key=None, groups=None, members=None):
    """One full iteration: forces -> swing/speed -> displacement.
    Returns (coords', forces)."""
    f = compute_forces(coords, g, deg, params, key, groups, members)
    new_coords = F.speed_update(coords, f, forces_prev, deg + 1.0,
                                ks=params.ks, ksmax=params.ksmax,
                                tolerate=params.tolerate)
    return new_coords, f


@partial(jax.jit, static_argnames=("params", "iterations"))
def _fa_loop(coords0, g: Graph, deg, key, params: ForceAtlasParams,
             iterations: int, groups=None, members=None):
    def body(it, carry):
        coords, forces_prev, key = carry
        key, sub = jax.random.split(key)
        coords, f = fa_step(coords, forces_prev, g, deg, params,
                            sub if params.repulsion == "sampled" else None,
                            groups, members)
        return coords, f, key

    forces_prev = jnp.zeros_like(coords0)
    coords, _, _ = jax.lax.fori_loop(0, iterations, body,
                                     (coords0, forces_prev, key))
    if params.normalize:
        coords = F.normalize_coords(coords)
    return coords


# Measured per-iteration cost model (2026-08-19 session, v5e + 2-core host;
# exact-repulsion fa_step in a fori_loop):
#   CPU:  ~n^2 * 3.3 ns + 10 us        (56 -> 21 us, 512 -> 1.0 ms, 2048 -> 15 ms)
#   TPU:  ~n^2 * 26 ps + 13 us          (56 -> 20 us, 512 -> 67 us, 2048 -> 339 us)
# plus LARGE per-process fixed costs for the compiled loop program:
#   TPU (remote tunnel): ~14 s persistent-cache load (MINUTES on a miss);
#   CPU: ~80 s XLA:CPU compile EVERY process -- the persistent cache's AOT
#        entries fail their machine-feature check on this host
#        (cpu_aot_loader "prefer-no-scatter not supported") and recompile,
#        so the CPU compile cannot be amortized across processes (only the
#        ~1.7 s/100k-iter re-RUN within one process is cheap).
# Net: "auto" only routes to the host when the per-iteration advantage
# covers the one-time compile, which at the multilevel base case's n ~ 50-500
# it does not; device="cpu" remains for many-layouts-per-process callers.
_CPU_S_PER_ITER = lambda n: n * n * 3.3e-9 + 1e-5
_TPU_S_PER_ITER = lambda n: n * n * 2.6e-11 + 1.3e-5
# fixed program-load costs, overridable per deployment: the defaults were
# measured on one remote-attached v5e host and WILL misroute elsewhere
# (a local TPU loads cached programs in <1s).  Set GE_TPU_FIXED_S=0.5 /
# GE_CPU_FIXED_S=... for your host, or pass device= explicitly.
import os as _os

_TPU_FIXED_S = float(_os.environ.get("GE_TPU_FIXED_S", 14.0))
_CPU_FIXED_S = float(_os.environ.get("GE_CPU_FIXED_S", 80.0))
_CPU_COMPILED: set = set()  # (n, iterations) loop shapes compiled this process


def _flat_device(n: int, iterations: int):
    """The device force_atlas should run on: a CPU device when the cost
    model says the host loop beats remote dispatch + program load, else
    None (stay wherever the default backend is)."""
    if jax.default_backend() == "cpu":
        return None
    cpu_fixed = 0.0 if (n, iterations) in _CPU_COMPILED else _CPU_FIXED_S
    est_cpu = iterations * _CPU_S_PER_ITER(n) + cpu_fixed
    est_dev = iterations * _TPU_S_PER_ITER(n) + _TPU_FIXED_S
    if est_cpu <= min(30.0, est_dev):
        return jax.devices("cpu")[0]
    return None


def force_atlas(g: Graph, dim: int = 2, *, coords=None, key=None,
                params: ForceAtlasParams | None = None,
                iterations: int | None = None, groups=None,
                device: str = "auto"):
    """Flat ForceAtlas layout (forceatlas.hpp:89-312).

    ``coords`` warm-starts the layout (the reference's resume hook,
    forceatlas.hpp:118-125); otherwise random U(-1,1)^dim init.  The
    reference seeds from ``std::random_device`` (non-deterministic,
    :104-105); here an explicit PRNG key gives reproducibility
    (SURVEY.md SS7 #3).

    ``device``: "auto" routes tiny layouts to the host CPU backend (see the
    cost model above -- identical math, threefry PRNG is backend-invariant);
    "cpu" forces the host; "default" pins the default backend.
    """
    params = params or ForceAtlasParams()
    if iterations is None:
        iterations = params.iterations
    if key is None:
        key = jax.random.PRNGKey(0)
    key, init_key = jax.random.split(key)
    if coords is None:
        coords = jax.random.uniform(init_key, (g.n, dim), dtype=g.dtype,
                                    minval=-1.0, maxval=1.0)
    deg = g.degrees(params.use_weights)
    members = None
    if params.repulsion == "centroids":
        if groups is None:
            from ..partition.hierarchy import partition_num_parts

            groups = partition_num_parts(g, max(32, g.n // 64))
        from .multilevel import build_member_buckets

        members = build_member_buckets(groups)
    dev = None
    if device == "auto" and groups is None:
        dev = _flat_device(g.n, iterations)
    elif device == "cpu":
        dev = jax.devices("cpu")[0]
    if dev is not None:
        default_dev = jax.devices()[0]
        coords, g, deg, key = jax.device_put((coords, g, deg, key), dev)
        out = _fa_loop(coords, g, deg, key, params, iterations, None, None)
        _CPU_COMPILED.add((g.n, iterations))
        return jax.device_put(out, default_dev)
    return _fa_loop(coords, g, deg, key, params, iterations, groups, members)
