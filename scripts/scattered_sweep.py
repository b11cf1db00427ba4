"""Sweep (sender_block, window, tile) for the windowed SpMV on SCATTERED
(power-law RMAT) graphs.

Mesh graphs optimize at 1024/1024/T1024 (scripts/spmv_shape_sweep.py) where
fill is ordering-limited; scattered graphs have a DENSE (block, window) pair
matrix at small shapes (fill ~0.02, slab explosion).  Growing block/window
makes cells dense again: edges/cell = E*B*W/n^2, so at B=W=2048-4096 every
cell holds hundreds-thousands of edges and fill returns to ~1.  The tax is
the per-slab hi-mask selection loops (G = W/128 passes over [d, T]), linear
in G -- this sweep measures where the trade lands on real hardware.

Usage: python -u scripts/scattered_sweep.py [scale] [ef] > out.log 2>&1
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def main(argv):
    scale = int(argv[1]) if len(argv) > 1 else 18
    ef = int(argv[2]) if len(argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.synth import rmat
    from graph_embed_tpu.ops.pallas import edge_spmm as ES

    t0 = time.perf_counter()
    g = rmat(scale, ef, seed=1)
    # simple-graph weights (com-lj is unweighted): drop dedup multiplicities
    s, r, _ = g.to_coo_numpy()
    g = gt.from_edges(s, r, np.ones(s.size, np.float32), n=g.n,
                      symmetrize=False)
    print(f"rmat({scale},{ef}): n={g.n} E={g.num_edges} "
          f"gen {time.perf_counter()-t0:.1f}s", flush=True)

    @partial(jax.jit, static_argnames=("iters",))
    def run(xT, tiles, iters):
        def body(i, x):
            y = ES.spmv_windowed(x, tiles, dmax=4)
            # keep x live, feed result back so iterations chain
            return x + 1e-6 * y

        out = jax.lax.fori_loop(0, iters, body, xT)
        return out, jnp.sum(out)

    for B, W, T in [(1024, 1024, 512), (1024, 2048, 512),
                    (2048, 2048, 512), (2048, 2048, 1024),
                    (2048, 4096, 1024), (4096, 4096, 1024),
                    (4096, 8192, 1024), (8192, 8192, 1024)]:
        t0 = time.perf_counter()
        try:
            tiles = ES.build_window_tiles(g, tile=T, sender_block=B,
                                          window=W, packing="unit")
        except Exception as e:
            print(f"B={B} W={W} T={T}: build failed: {e}", flush=True)
            continue
        build_s = time.perf_counter() - t0
        xT = ES.pad_coords_T(
            jax.random.uniform(jax.random.PRNGKey(0), (g.n, 3),
                               dtype=jnp.float32, minval=-1., maxval=1.),
            tiles.n_pad)
        iters = 20
        out, chk = run(xT, tiles, iters)
        float(chk)  # compile + settle
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out, chk = run(out, tiles, iters)
            float(chk)
            times.append(time.perf_counter() - t0)
        spi = sorted(times)[1] / iters
        print(f"B={B} W={W} T={T}: slabs={tiles.num_tiles} "
              f"fill={tiles.fill:.3f} chunks={len(tiles.chunks)} "
              f"build={build_s:.1f}s  {spi*1e3:.2f} ms/iter  "
              f"{g.num_edges/spi/1e6:.0f} M edges/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
