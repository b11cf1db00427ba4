"""Python-stepped vs fori_loop dispatch A/B for the LJ-scale step.

Every LJ-scale measurement so far steps from Python (the chunked-pallas
fori_loop wedge precaution); if per-call dispatch through the remote
tunnel costs ~ms, the kernel is faster than the record shows.  Raise the
slab cap so the (4096, 16384) tiling fits ONE pallas call (750KB of the
1MB SMEM), then time the same 20 iterations both ways.

  python -u scripts/dispatch_ab.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from graph_embed_tpu.graph.reorder import partition_order
    from graph_embed_tpu.ops.pallas import edge_spmm as ES
    from graph_embed_tpu.parallel.sharded import _CooShim
    from lj_scale_run import load_cache

    ES.MAX_SLABS_PER_CALL = 98304          # experiment: single-call tiling

    graphs, parts, _ = load_cache(22, 8)
    g0 = graphs[0]
    perm = partition_order(g0, levels=parts)
    inv = np.empty_like(perm); inv[perm] = np.arange(perm.size)
    s0, r0, _ = g0.to_coo_numpy()
    s, r = inv[s0], inv[r0]
    n, E = g0.n, s0.size
    t = ES.build_window_tiles(_CooShim(s, r, np.ones(E, np.float32), n),
                              tile=1024, sender_block=4096, window=16384,
                              packing="unit")
    tk = jax.device_put(ES.pair_window_tiles(t, 8))
    print(f"slabs={t.num_tiles} fill={t.fill:.3f} "
          f"chunks={len(t.chunks) or 1}", flush=True)

    @jax.jit
    def step(xT, tiles):
        y = ES.spmv_windowed(xT, tiles, dmax=4, variant="v12bp8")
        return xT + 1e-6 * y

    @partial(jax.jit, static_argnames=("iters",))
    def run_loop(xT, tiles, iters):
        def body(i, x):
            y = ES.spmv_windowed(x, tiles, dmax=4, variant="v12bp8")
            return x + 1e-6 * y
        return jax.lax.fori_loop(0, iters, body, xT)

    x = ES.pad_coords_T(
        jax.random.uniform(jax.random.PRNGKey(0), (n, 3), jnp.float32,
                           -1., 1.), t.n_pad)
    iters = 20
    for rep in range(3):
        t0 = time.perf_counter()
        xa = x
        for _ in range(iters):
            xa = step(xa, tk)
        float(jnp.sum(xa))
        dt_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        xb = run_loop(x, tk, iters)
        float(jnp.sum(xb))
        dt_loop = time.perf_counter() - t0
        print(f"[{rep}] python-stepped {dt_py/iters*1e3:.2f} ms/iter "
              f"({E/(dt_py/iters)/1e6:.0f} M)  fori_loop "
              f"{dt_loop/iters*1e3:.2f} ms/iter "
              f"({E/(dt_loop/iters)/1e6:.0f} M)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
