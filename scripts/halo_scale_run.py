"""Halo-sharded flat FA at LiveJournal scale on the real chip (round-3
VERDICT item 3: the config-5 design had only ever met real hardware at toy
sizes).

Loads the rmat(22,8) prep cache (scripts/lj_scale_run.py prep 22 8),
partition-orders the fine graph with the CACHED hierarchy assignment (no
re-partition), then:

  1. host-side: build_halo_plan at ndev=8 -- the plan that WOULD shard an
     8-chip pod -- and record boundary_fraction + per-step comm floats
     (the config-5 comm model on the partition-ordered graph);
  2. real chip (ndev=1 mesh, the single-chip proxy): halo_force_atlas's
     jitted step with the windowed-SpMV tiled attraction -- compile time,
     warm ms/iter, edges/s;
  3. same session: the replicated flat tiled step (prepare_tiled +
     fa_step_tiled_T) on the same ordered graph -- the halo-vs-replicated
     wall-clock comparison the judge asked for.

Prints one JSON summary line; append the table to BENCHMARKS.md.

  PYTHONPATH=. python scripts/halo_scale_run.py [scale] [ef]
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lj_scale_run import load_cache, log  # noqa: E402


def main(argv):
    scale = int(argv[1]) if len(argv) > 1 else 22
    ef = int(argv[2]) if len(argv) > 2 else 8
    # optional tile-shape override: [B W] (host fill study, BENCHMARKS
    # round-4: at n=2M, 8192^2 cells lift fill 0.26 -> 0.69)
    shape = ((int(argv[3]), int(argv[4])) if len(argv) > 4 else None)

    import jax
    import jax.numpy as jnp

    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.reorder import apply_order
    from graph_embed_tpu.parallel.halo import (build_halo_plan,
                                               build_halo_tiles,
                                               make_halo_fa_step)
    from graph_embed_tpu.parallel.mesh import make_mesh
    from graph_embed_tpu.utils.params import ForceAtlasParams
    from jax.sharding import NamedSharding, PartitionSpec as P
    from graph_embed_tpu.parallel.mesh import EDGE_AXIS

    graphs, parts, prep_rec = load_cache(scale, ef)
    g = graphs[0]
    rec = {"workload": f"rmat({scale},{ef}) halo", "n": g.n,
           "edges": g.num_edges}

    # hierarchy order from the CACHE (no re-partition)
    t0 = time.perf_counter()
    from graph_embed_tpu.graph.reorder import partition_order

    perm = partition_order(g, levels=parts)
    g_ord, inv = apply_order(g, perm)
    rec["order_seconds"] = round(time.perf_counter() - t0, 1)
    log(f"hierarchy order applied ({rec['order_seconds']}s)")

    xprec = os.environ.get("LJ_X_PRECISION", "f32")
    params = ForceAtlasParams(repulsion="sampled", num_negative_samples=64,
                              x_precision=xprec)
    if xprec != "f32":
        rec["x_precision"] = xprec

    # --- 1. the 8-device plan: config-5 comm model on this graph
    t0 = time.perf_counter()
    plan8 = build_halo_plan(g_ord, 8)
    rec["plan8_seconds"] = round(time.perf_counter() - t0, 1)
    rec["plan8_boundary_fraction"] = round(plan8.boundary_fraction, 4)
    rec["plan8_comm_floats_per_step"] = plan8.comm_floats_per_step(3, 64)
    rec["plan8_replicated_comm_floats"] = 2 * plan8.ndev * plan8.blk * 3
    log(f"ndev=8 plan: boundary_fraction={plan8.boundary_fraction:.4f} "
        f"comm {rec['plan8_comm_floats_per_step']:.3e} vs replicated "
        f"{rec['plan8_replicated_comm_floats']:.3e} floats/step")

    # --- 2. ndev=1 halo step on the real chip (tiled attraction)
    #        (HALO_SCALE_REP_ONLY=1 skips to the replicated phase)
    mesh = make_mesh(1)
    import os as _os
    if _os.environ.get("HALO_SCALE_REP_ONLY"):
        _run_replicated(rec, g_ord, g, params, shape)
        print(json.dumps(rec), flush=True)
        return 0
    t0 = time.perf_counter()
    plan1 = build_halo_plan(g_ord, 1)
    if shape is not None:
        rec["shape"] = list(shape)
        tiles = build_halo_tiles(plan1, params, sender_block=shape[0],
                                 window=shape[1])
    else:
        tiles = build_halo_tiles(plan1, params)
    rec["tiles_seconds"] = round(time.perf_counter() - t0, 1)
    rec["tiles_slabs"] = int(tiles.sbf.shape[1])
    rec["tiles_fill"] = round(tiles.aux.fill, 3)
    rec["tiles_chunks"] = len(tiles.aux.chunks) or 1
    log(f"halo tiles: slabs={rec['tiles_slabs']} fill={rec['tiles_fill']} "
        f"calls={rec['tiles_chunks']} ({rec['tiles_seconds']}s)")

    dtype = g_ord.dtype
    put = lambda a, spec=P(EDGE_AXIS): jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, spec))
    nblk = plan1.ndev * plan1.blk
    key = jax.random.PRNGKey(0)
    x = put(jax.random.uniform(key, (nblk, 3), dtype, -1.0, 1.0))
    fprev = put(jnp.zeros((nblk, 3), dtype))
    args = (put(tiles.sbf), put(tiles.rw), put(tiles.packed),
            put(tiles.deg_w_att), put(plan1.boundary_idx),
            put(jnp.asarray(plan1.deg, dtype)), put(plan1.n_real))
    step = make_halo_fa_step(mesh, plan1, 3, params, dtype,
                             sample_mode="invariant", tiles=tiles)

    t0 = time.perf_counter()
    x, fprev = step(x, fprev, *args, key)
    float(jnp.sum(x))
    rec["halo_compile_seconds"] = round(time.perf_counter() - t0, 1)
    log(f"halo step compiled+first iter: {rec['halo_compile_seconds']}s")
    times = []
    iters = 10
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            key, sub = jax.random.split(key)
            x, fprev = step(x, fprev, *args, sub)
        float(jnp.sum(x))
        times.append((time.perf_counter() - t0) / iters)
    spi = sorted(times)[1]
    rec["halo_ms_per_iter"] = round(spi * 1e3, 2)
    rec["halo_edges_per_sec"] = round(g.num_edges / spi)
    log(f"halo step: {spi*1e3:.2f} ms/iter = "
        f"{g.num_edges/spi/1e6:.0f} M edges/s")

    # --- 3. replicated flat tiled step, same session, same ordered graph
    _run_replicated(rec, g_ord, g, params, shape, spi)
    print(json.dumps(rec), flush=True)
    return 0


def _run_replicated(rec, g_ord, g, params, shape, spi=None):
    import jax
    import jax.numpy as jnp

    from graph_embed_tpu.forceatlas import tiled as TL
    from graph_embed_tpu.ops.pallas import edge_spmm as ES

    t0 = time.perf_counter()
    if shape is not None:
        B, W = shape
        tfa = TL.prepare_tiled(g_ord, 3, params, sender_block=B, window=W,
                               tile=1024)
    else:
        # prepare_tiled's big-n shape rule picks the measured optimum
        # ((4096, 8192) f32 / (4096, 16384) bf16 past 1.5M vertices)
        tfa = TL.prepare_tiled(g_ord, 3, params)
    rec["replicated_tiles_seconds"] = round(time.perf_counter() - t0, 1)
    coords = ES.pad_coords_T(
        jax.random.uniform(jax.random.PRNGKey(1), (g_ord.n, 3), jnp.float32,
                           -1.0, 1.0), tfa.n_pad)
    fprevT = jnp.zeros_like(coords)

    # single-step jit, stepped from Python like the halo side; tfa MUST be
    # an argument -- closing over it bakes the packed tiles into the
    # program as constants, which blew the remote compile service's
    # request-size limit (HTTP 413) at this scale (the CLAUDE.md
    # closure-constant rule, enforced the hard way)
    @jax.jit
    def step_rep(c, f, tfa, key):
        c, f = TL.fa_step_tiled_T(c, f, tfa, params, key)
        return c, f

    t0 = time.perf_counter()
    coords, fprevT = step_rep(coords, fprevT, tfa, jax.random.PRNGKey(2))
    float(jnp.sum(coords))
    rec["replicated_compile_seconds"] = round(time.perf_counter() - t0, 1)
    times = []
    key2 = jax.random.PRNGKey(3)
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(10):
            key2, sub = jax.random.split(key2)
            coords, fprevT = step_rep(coords, fprevT, tfa, sub)
        float(jnp.sum(coords))
        times.append((time.perf_counter() - t0) / 10)
    spi_r = sorted(times)[1]
    rec["replicated_ms_per_iter"] = round(spi_r * 1e3, 2)
    rec["replicated_edges_per_sec"] = round(g.num_edges / spi_r)
    if spi is not None:
        rec["halo_vs_replicated"] = round(spi / spi_r, 2)
    log(f"replicated step: {spi_r*1e3:.2f} ms/iter = "
        f"{g.num_edges/spi_r/1e6:.0f} M edges/s")


if __name__ == "__main__":
    sys.path.insert(0, "scripts")
    sys.exit(main(sys.argv))
