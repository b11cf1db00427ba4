"""SpMV shape sweep on the real TPU: time spmv_windowed across
(sender_block, window, tile) configs on the bench mesh.

The v7 kernel's measured cost splits into per-grid-step pipeline overhead
and MXU issue count at padded M (BENCHMARKS.md).  Larger windows/tiles cut
the slab count (fewer grid steps, fuller matmul N); this sweep measures
where that saturates.  Run:  python scripts/spmv_shape_sweep.py [L]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graph_embed_tpu.graph.synth import mesh3d
from graph_embed_tpu.ops.pallas import edge_spmm as ES


def time_config(g, sender_block, window, tile, iters=20, repeats=3):
    t = ES.build_window_tiles(g, tile=tile, sender_block=sender_block,
                              window=window, packing="unit")
    t = jax.device_put(t)
    xT = ES.pad_coords_T(
        jax.random.uniform(jax.random.PRNGKey(0), (g.n, 3), jnp.float32,
                           minval=-1.0, maxval=1.0), t.n_pad)

    from functools import partial

    @partial(jax.jit, static_argnames=("iters",))
    def run(xT, t, iters):
        def body(i, x):
            y = ES.spmv_windowed(x, t, dmax=4)
            # keep shape: feed the output back (renormalized to stay finite)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0)

        out = jax.lax.fori_loop(0, iters, body, xT)
        return out, jnp.sum(out)

    out, chk = run(xT, t, iters)
    float(chk)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, chk = run(out, t, iters)
        float(chk)
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    return ms, t.num_tiles, t.fill


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    g = mesh3d(L)
    print(f"mesh3d({L}): n={g.n} edges={g.num_edges}", flush=True)
    configs = [
        (1024, 1024, 1024),   # current production default
        (1024, 2048, 1024),
        (2048, 2048, 1024),
        (1024, 1024, 2048),
        (2048, 2048, 2048),
        (2048, 4096, 2048),
        (4096, 4096, 4096),
    ]
    for sb, w, t in configs:
        try:
            ms, slabs, fill = time_config(g, sb, w, t)
            meps = g.num_edges / (ms * 1e-3) / 1e6
            print(f"sb={sb:5d} win={w:5d} T={t:5d}: slabs={slabs:6d} "
                  f"fill={fill:.2f}  {ms:7.2f} ms  {meps:7.0f} M edges/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives bad configs
            print(f"sb={sb:5d} win={w:5d} T={t:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
