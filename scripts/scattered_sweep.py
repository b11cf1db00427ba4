"""Sweep (sender_block, window, tile) for the windowed SpMV on SCATTERED
(power-law RMAT) graphs.

Mesh graphs optimize at 1024/1024/T1024 (scripts/spmv_shape_sweep.py) where
fill is ordering-limited; scattered graphs have a DENSE (block, window) pair
matrix at small shapes (fill ~0.02, slab explosion).  Growing block/window
makes cells dense again: edges/cell = E*B*W/n^2, so at B=W=2048-4096 every
cell holds hundreds-thousands of edges and fill returns to ~1.  The tax is
the per-slab hi-mask selection loops (G = W/128 passes over [d, T]), linear
in G -- this sweep measures where the trade lands on real hardware.

Clustered (community_rmat) graphs add the TIERED configs: a dense-cell
tier at a standard shape + a jumbo tier for the scattered inter-community
residual (ES.TieredTiles).

Usage: python -u scripts/scattered_sweep.py [family] [scale] [ef]
       family: rmat (uniform scatter, worst case) | crmat (clustered)
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

CONFIGS = {
    "rmat": [(1024, 1024, 512), (2048, 2048, 512), (2048, 2048, 1024),
             (2048, 4096, 1024), (4096, 4096, 1024), (4096, 8192, 1024),
             (8192, 8192, 1024)],
    # follow-up: T should track edges/cell (= E*B*W/n^2); at rmat-20
    # scale T=1024 wastes half of every 2048^2 cell (fill 0.22) while
    # 4096^2 cells hold ~900 edges.  Probe small-T large-block corners.
    "rmat2": [(4096, 4096, 512), (8192, 4096, 512), (4096, 8192, 512),
              (8192, 8192, 512), (8192, 8192, 2048), (16384, 16384, 1024),
              (16384, 16384, 2048)],
    # NOTE stay at shapes the remote compiler has survived (<= 8192 blocks,
    # T >= 1024): the 4096/4096/T512 probe hung the compile service for
    # 25 min (recovered ~100s after killing the client -- see ROADMAP)
    "crmat": [(2048, 2048, 1024), (4096, 4096, 1024),
              # tiered: (dense spec, jumbo spec, threshold)
              (("tier", (1024, 1024, 1024), (4096, 4096, 1024), 256),),
              (("tier", (1024, 2048, 1024), (8192, 8192, 1024), 256),),
              (("tier", (2048, 2048, 1024), (8192, 8192, 1024), 512),)],
}


def main(argv):
    fam = argv[1] if len(argv) > 1 else "rmat"
    scale = int(argv[2]) if len(argv) > 2 else 18
    ef = int(argv[3]) if len(argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.synth import community_rmat, rmat
    from graph_embed_tpu.ops.pallas import edge_spmm as ES

    t0 = time.perf_counter()
    if fam == "rmat":
        g = rmat(scale, ef, seed=1)
    else:
        g = community_rmat(64, scale, ef, seed=1)
    # simple-graph weights (com-lj is unweighted): drop dedup multiplicities
    s, r, _ = g.to_coo_numpy()
    g = gt.from_edges(s, r, np.ones(s.size, np.float32), n=g.n,
                      symmetrize=False)
    print(f"{fam}({scale},{ef}): n={g.n} E={g.num_edges} "
          f"gen {time.perf_counter()-t0:.1f}s", flush=True)

    @partial(jax.jit, static_argnames=("iters",))
    def run(xT, tiles, iters):
        def body(i, x):
            if isinstance(tiles, ES.TieredTiles):
                y = ES.spmv_tiered(x, tiles, dmax=4)
            else:
                y = ES.spmv_windowed(x, tiles, dmax=4)
            # keep x live, feed result back so iterations chain
            return x + 1e-6 * y

        out = jax.lax.fori_loop(0, iters, body, xT)
        return out, jnp.sum(out)

    for cfg in CONFIGS[fam]:
        t0 = time.perf_counter()
        try:
            if isinstance(cfg[0], tuple):
                _, spec0, spec1, thresh = cfg[0]
                B, W, T = spec1
                tiles = ES.build_tiered_tiles(g, specs=[spec0, spec1],
                                              thresholds=[thresh],
                                              packing="unit")
                label = f"tier {spec0}+{spec1}@{thresh}"
            else:
                B, W, T = cfg
                tiles = ES.build_window_tiles(g, tile=T, sender_block=B,
                                              window=W, packing="unit")
                label = f"B={B} W={W} T={T}"
        except Exception as e:
            print(f"{cfg}: build failed: {e}", flush=True)
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
        print(f"{label}: slabs={tiles.num_tiles} "
              f"fill={tiles.fill:.3f} "
              f"build={build_s:.1f}s  {spi*1e3:.2f} ms/iter  "
              f"{g.num_edges/spi/1e6:.0f} M edges/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
