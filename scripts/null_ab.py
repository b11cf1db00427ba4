"""Null-kernel probe: v9 vs the no-compute variant over the identical
grid + streams -- measures the BlockSpec pipeline fixed cost, i.e. the
floor every per-slab compute optimization converges to.

  python -u scripts/null_ab.py [scale] [ef]
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
    tiles = jax.device_put(ES.build_window_tiles(
        g, tile=1024, sender_block=4096, window=4096, packing="unit"))
    print(f"slabs={tiles.num_tiles} fill={tiles.fill:.3f}", flush=True)
    xT = ES.pad_coords_T(
        jax.random.uniform(jax.random.PRNGKey(0), (g.n, 3),
                           dtype=jnp.float32, minval=-1., maxval=1.),
        tiles.n_pad)

    @partial(jax.jit, static_argnames=("iters", "dmax", "variant"))
    def run(xT, tiles, iters, dmax, variant):
        def body(i, x):
            y = ES.spmv_windowed(x, tiles, dmax=dmax, variant=variant)
            return x + 1e-6 * y

        out = jax.lax.fori_loop(0, iters, body, xT)
        return out, jnp.sum(out)

    iters = 20
    for variant, dmax in (("v9", 4), ("vnull", 4), ("v9", 4), ("vnull", 4)):
        out, chk = run(xT, tiles, iters, dmax, variant)
        float(chk)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out, chk = run(out, tiles, iters, dmax, variant)
            float(chk)
            times.append(time.perf_counter() - t0)
        spi = sorted(times)[1] / iters
        print(f"{variant} dmax={dmax}: {spi*1e3:.2f} ms/iter  "
              f"{g.num_edges/spi/1e6:.0f} M edges/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
