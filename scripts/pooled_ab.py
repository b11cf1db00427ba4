"""On-chip A/B: region-pooled two-stage SpMV vs the single windowed SpMV
at LJ scale (round-4 VERDICT item 1 / ROADMAP round-5 queue #2).

The host fill study (scripts/pool_fill_study.py) measured that compacting
each 64k-sender REGION's distinct receivers into a dense rank space lets
the main SpMV ride W=1024 windows at fill ~0.54 (vs 0.685 at W=8192 on the
raw space), and the per-iteration pool gather is itself a dense staircase
SpMV (fill ~0.8 at 8192^2).  Both stages are the EXISTING v12 kernels over
one concatenated index space [vertices | region pools]:

  stage 1 (gather):  y1[slot]  = sum_v sel[slot, v] x[v]   (unit weights,
                     one nonzero per slot row -- pure compaction)
  stage 2 (main):    y2[i]    += w_ij x_pool[slot(j)]       (small windows)

Per-slab VPU cost scales with G = window/128 (ROADMAP kernel facts), so
2-stage total ~ 45ms-model vs ~104ms-model for the status quo -- this
script measures the real thing on the chip, interleaved A/B/A/B.

  python -u scripts/pooled_ab.py [scale] [ef] [R] [B] [W]
"""
from __future__ import annotations

import os
import sys
import time


import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def round_up(x, m):
    return -(-x // m) * m


def build_pool_maps(s, r, n, R, seg_align=8192):
    """Region pools over sender regions of R vertices.

    Returns (edge_slot[e] -- pooled receiver slot id in the upper segment,
    gslot/gvert -- the gather pairs, space -- total index-space size,
    n_seg -- where the pool segment starts)."""
    n_seg = round_up(n, seg_align)
    reg = (s // R).astype(np.int64)
    order = np.lexsort((r, reg))
    rg, rs = reg[order], r[order].astype(np.int64)
    same = rg[1:] == rg[:-1]
    first = np.ones(rs.size, bool)
    first[1:] = (~same) | (rs[1:] != rs[:-1])
    csum = np.cumsum(first)
    starts = np.flatnonzero(np.concatenate([[True], ~same]))
    block_start = np.zeros(rs.size, np.int64)
    block_start[starts] = csum[starts] - 1
    block_start = np.maximum.accumulate(block_start)
    rank = csum - 1 - block_start
    ends = np.concatenate([starts[1:], [rs.size]]) - 1
    pool_sizes = rank[ends] + 1
    nreg = int(rg.max()) + 1
    base = np.zeros(nreg + 1, np.int64)
    psz = np.zeros(nreg, np.int64)
    psz[rg[starts]] = pool_sizes
    base[1:] = np.cumsum(round_up(psz, seg_align))
    slot_sorted = n_seg + base[rg] + rank
    edge_slot = np.empty(s.size, np.int64)
    edge_slot[order] = slot_sorted
    sel = np.flatnonzero(first)
    gslot = slot_sorted[sel]
    gvert = rs[sel]
    space = int(n_seg + base[nreg])
    return edge_slot, gslot, gvert, space, n_seg


def main(argv):
    scale = int(argv[1]) if len(argv) > 1 else 22
    ef = int(argv[2]) if len(argv) > 2 else 8
    R = int(argv[3]) if len(argv) > 3 else 65536
    B = int(argv[4]) if len(argv) > 4 else 8192
    W = int(argv[5]) if len(argv) > 5 else 1024

    import jax
    import jax.numpy as jnp

    from graph_embed_tpu.graph.reorder import partition_order
    from graph_embed_tpu.ops.pallas import edge_spmm as ES
    from graph_embed_tpu.parallel.sharded import _CooShim
    from lj_scale_run import load_cache

    graphs, parts, _ = load_cache(scale, ef)
    g0 = graphs[0]
    perm = partition_order(g0, levels=parts)
    inv = np.empty_like(perm); inv[perm] = np.arange(perm.size)
    s0, r0, _ = g0.to_coo_numpy()
    s, r = inv[s0], inv[r0]
    n, E = g0.n, s0.size
    w1 = np.ones(E, np.float32)
    print(f"rmat({scale},{ef}) ordered: n={n} E={E}", flush=True)

    # ---- baseline tiles: the status-quo 8192^2 jumbo layout over [0, n)
    t0 = time.perf_counter()
    base_tiles = ES.build_window_tiles(_CooShim(s, r, w1, n), tile=1024,
                                       sender_block=8192, window=8192,
                                       packing="unit")
    kb = ES.jumbo_group(base_tiles)
    base_dev = jax.device_put(ES.pair_window_tiles(base_tiles, kb))
    print(f"baseline tiles: slabs={base_tiles.num_tiles} "
          f"fill={base_tiles.fill:.3f} k={kb} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # ---- pooled structures
    t0 = time.perf_counter()
    edge_slot, gslot, gvert, space, n_seg = build_pool_maps(s, r, n, R)
    print(f"pool maps: space={space} pool={gslot.size} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    t0 = time.perf_counter()
    mtiles = ES.build_window_tiles(
        _CooShim(s, edge_slot, w1, space), tile=1024, sender_block=B,
        window=W, packing="unit")
    km = ES.jumbo_group(mtiles)
    mt_dev = jax.device_put(ES.pair_window_tiles(mtiles, km))
    print(f"main tiles: slabs={mtiles.num_tiles} fill={mtiles.fill:.3f} "
          f"k={km} ({time.perf_counter()-t0:.0f}s)", flush=True)
    t0 = time.perf_counter()
    gtiles = ES.build_window_tiles(
        _CooShim(gslot, gvert, np.ones(gslot.size, np.float32), space),
        tile=1024, sender_block=8192, window=8192, packing="unit")
    kg = ES.jumbo_group(gtiles)
    gt_dev = jax.device_put(ES.pair_window_tiles(gtiles, kg))
    print(f"gather tiles: slabs={gtiles.num_tiles} fill={gtiles.fill:.3f} "
          f"k={kg} ({time.perf_counter()-t0:.0f}s)", flush=True)

    key = jax.random.PRNGKey(0)

    # single-step jits, stepped from Python: a fori_loop over chunked
    # pallas calls can wedge the remote compile service (ROADMAP round-4
    # failure modes); dispatches queue async, one readback closes timing
    @jax.jit
    def step_base(xT, tiles):
        y = ES.spmv_windowed(xT, tiles, dmax=4)
        return xT + 1e-6 * y

    @jax.jit
    def step_pooled(xT, gtl, mtl):
        y1 = ES.spmv_windowed(xT, gtl, dmax=4)     # pools (upper seg)
        y2 = ES.spmv_windowed(y1, mtl, dmax=4)     # attraction (lower)
        low = jax.lax.dynamic_slice(
            xT, (0, 0), (xT.shape[0], n_seg)) + 1e-6 * jax.lax.dynamic_slice(
            y2, (0, 0), (y2.shape[0], n_seg))
        return jax.lax.dynamic_update_slice(xT, low, (0, 0))

    x0 = jax.random.uniform(key, (n, 3), jnp.float32, -1., 1.)
    xb = ES.pad_coords_T(x0, base_tiles.n_pad)
    xp = jnp.zeros((ES.D_PAD, mtiles.n_pad), jnp.float32).at[
        :3, :n].set(jnp.asarray(x0).T)

    iters = 20

    def run(tag, x, one):
        t0 = time.perf_counter()
        for _ in range(iters):
            x = one(x)
        float(jnp.sum(jax.lax.dynamic_slice(x, (0, 0),
                                            (x.shape[0], min(n_seg,
                                                             x.shape[1])))))
        return x, time.perf_counter() - t0

    arms = [("base", xb, lambda x: step_base(x, base_dev)),
            ("pooled", xp, lambda x: step_pooled(x, gt_dev, mt_dev))]
    state = {tag: x for tag, x, _ in arms}
    for rep in range(3):
        for tag, _, one in arms:
            out, dt = run(tag, state[tag], one)
            state[tag] = out
            note = " (compile)" if rep == 0 else ""
            print(f"[{rep}] {tag}: {dt/iters*1e3:.2f} ms/iter  "
                  f"{E/(dt/iters)/1e6:.0f} M edges/s{note}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
