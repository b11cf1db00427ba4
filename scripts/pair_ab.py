"""Bare windowed-SpMV A/B: v9 (one slab/grid step) vs v9p2 (two slabs per
step on pair-padded tiles -- half the per-step pipeline overhead, same
per-slab math; bitwise-identical outputs).

  python -u scripts/pair_ab.py [scale] [ef]
"""
import sys
import time
from functools import partial

import numpy as np


def main(argv):
    scale = int(argv[1]) if len(argv) > 1 else 20
    ef = int(argv[2]) if len(argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.synth import rmat
    from graph_embed_tpu.ops.pallas import edge_spmm as ES

    g = rmat(scale, ef, seed=1)
    s, r, _ = g.to_coo_numpy()
    g = gt.from_edges(s, r, np.ones(s.size, np.float32), n=g.n,
                      symmetrize=False)
    tiles_h = ES.build_window_tiles(g, tile=1024, sender_block=4096,
                                    window=4096, packing="unit")
    paired_h = ES.pair_window_tiles(tiles_h)
    quad_h = ES.pair_window_tiles(tiles_h, 4)
    oct_h = ES.pair_window_tiles(tiles_h, 8)
    tiles = jax.device_put(tiles_h)
    paired = jax.device_put(paired_h)
    quad = jax.device_put(quad_h)
    octt = jax.device_put(oct_h)
    print(f"slabs={tiles_h.num_tiles} paired={paired_h.num_tiles} "
          f"fill={tiles_h.fill:.3f}", flush=True)
    xT = ES.pad_coords_T(
        jax.random.uniform(jax.random.PRNGKey(0), (g.n, 3),
                           dtype=jnp.float32, minval=-1., maxval=1.),
        tiles_h.n_pad)

    @partial(jax.jit, static_argnames=("iters", "variant"))
    def run(xT, tiles, iters, variant):
        def body(i, x):
            y = ES.spmv_windowed(x, tiles, dmax=4, variant=variant)
            return x + 1e-6 * y

        out = jax.lax.fori_loop(0, iters, body, xT)
        return out, jnp.sum(out)

    iters = 20
    for variant, tt in (("v9p4", quad), ("v9p8", octt),
                        ("v9p4", quad), ("v9p8", octt)):
        out, chk = run(xT, tt, iters, variant)
        float(chk)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out, chk = run(out, tt, iters, variant)
            float(chk)
            times.append(time.perf_counter() - t0)
        spi = sorted(times)[1] / iters
        print(f"{variant}: {spi*1e3:.2f} ms/iter  "
              f"{g.num_edges/spi/1e6:.0f} M edges/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
