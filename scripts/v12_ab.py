"""Same-session A/B of the v12 dynamic-gather SpMV vs the v9 family.

v12 replaces the v9 gather join (one-hot build + G-term hi-digit
accumulate, ~860 VPU vreg-issues/slab) with two-stage tpu.dynamic_gather
shuffles (~460), and its packed x layout (pack_gather_layout) halves the
x-window DMA at d=4.  Run bare-SpMV A/B interleaved on the bench scattered
workload, on both the natural and the partition-ordered (product-pipeline)
graph.

Usage: python -u scripts/v12_ab.py [scale] [ef] [variants...]
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np


def main(argv):
    scale = int(argv[1]) if len(argv) > 1 else 20
    ef = int(argv[2]) if len(argv) > 2 else 8
    variants = argv[3:] or ["v9p4", "v12", "v12p4", "v9p4", "v12", "v12p4"]

    import jax
    import jax.numpy as jnp

    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.reorder import apply_order, partition_order
    from graph_embed_tpu.graph.synth import rmat
    from graph_embed_tpu.ops.pallas import edge_spmm as ES

    t0 = time.perf_counter()
    g = rmat(scale, ef, seed=1)
    s, r, _ = g.to_coo_numpy()
    g = gt.from_edges(s, r, np.ones(s.size, np.float32), n=g.n,
                      symmetrize=False)
    print(f"rmat({scale},{ef}): n={g.n} E={g.num_edges} "
          f"gen {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    g_ord, _ = apply_order(g, partition_order(g))
    print(f"partition_order {time.perf_counter()-t0:.1f}s", flush=True)

    B, W, T = 4096, 4096, 1024

    @partial(jax.jit, static_argnames=("iters", "variant"))
    def run(xT, tiles, iters, variant):
        def body(i, x):
            y = ES.spmv_windowed(x, tiles, dmax=4, variant=variant)
            return x + 1e-6 * y

        out = jax.lax.fori_loop(0, iters, body, xT)
        return out, jnp.sum(out)

    for tag, gg in (("natural", g), ("ordered", g_ord)):
        tiles0 = ES.build_window_tiles(gg, tile=T, sender_block=B, window=W,
                                       packing="unit")
        tiles1 = jax.device_put(tiles0)
        grouped = {}   # k -> device tiles (pair-padded); built lazily

        def tiles_for(variant):
            if "p" not in variant[1:]:
                return tiles1
            k = int(variant.rsplit("p", 1)[1])
            if k not in grouped:
                grouped[k] = jax.device_put(ES.pair_window_tiles(tiles0, k))
            return grouped[k]

        print(f"[{tag}] slabs={tiles0.num_tiles} fill={tiles0.fill:.3f}",
              flush=True)
        xT = ES.pad_coords_T(
            jax.random.uniform(jax.random.PRNGKey(0), (gg.n, 3),
                               dtype=jnp.float32, minval=-1., maxval=1.),
            tiles0.n_pad)
        iters = 20
        for variant in variants:
            tiles = tiles_for(variant)
            t0 = time.perf_counter()
            out, chk = run(xT, tiles, iters, variant)
            float(chk)
            tc = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out, chk = run(out, tiles, iters, variant)
                float(chk)
                times.append(time.perf_counter() - t0)
            spi = sorted(times)[1] / iters
            print(f"[{tag}] spmv {variant}: {spi*1e3:.2f} ms/iter  "
                  f"{gg.num_edges/spi/1e6:.0f} M edges/s  "
                  f"(first call {tc:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
