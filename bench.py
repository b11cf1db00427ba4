"""Benchmark: ForceAtlas iteration throughput in edges/s/chip.

Prints ONE JSON line:
  {"metric": "fa_edges_per_sec_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": N}

Metric (BASELINE.md north star): stored adjacency entries traversed per
second by the full jitted ForceAtlas iteration -- Pallas windowed-SpMV
attraction + sampled (negative-sampling) repulsion + gravity + adaptive
speed schedule -- on one chip.  ``vs_baseline`` = value / 1e9 (the
>= 1e9 edges/s/chip target).

Workload: a 3D mesh graph (the reference roster's mesh/roadnet family --
mat_*, delaunay_n24, roadNet-*; run-tests.cpp:361-400) at ~12.6M stored
entries, natural row-major order (locality comparable to what
graph.reorder's RCM/partition ordering achieves on irregular graphs).
Timing is a device-side fori_loop closed by a scalar host readback
(block_until_ready does not reliably synchronize through remote tunnels).
"""

from __future__ import annotations

import json
import sys
import time


def build_bench_graph(L=128, extra_frac=0.0, seed=0):
    """3D L^3 grid + a sprinkle of random long-range edges (to exercise the
    low-fill tile path too), unit weights, symmetrized CSR."""
    from graph_embed_tpu.graph.synth import mesh3d

    return mesh3d(L, extra_frac=extra_frac, seed=seed)


def bench_fa(iters_per_call=20, repeats=5, dim=3, num_samples=64, tile=None):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from graph_embed_tpu.forceatlas import tiled as TL
    from graph_embed_tpu.utils.params import ForceAtlasParams

    from graph_embed_tpu.ops.pallas import edge_spmm as ES

    g = build_bench_graph()
    params = ForceAtlasParams(repulsion="sampled",
                              num_negative_samples=num_samples)
    tfa = TL.prepare_tiled(g, dim, params, tile=tile)
    key = jax.random.PRNGKey(0)
    coords = jax.random.uniform(key, (g.n, dim), dtype=jnp.float32,
                                minval=-1.0, maxval=1.0)
    # transposed loop state: no [n, d] <-> [D_PAD, n_pad] relayouts per iter
    coords = ES.pad_coords_T(coords, tfa.n_pad)
    fprev = jnp.zeros_like(coords)

    @partial(jax.jit, static_argnames=("iters",))
    def run(coords, fprev, key, tfa, iters):
        def body(i, carry):
            c, f, k = carry
            k, sub = jax.random.split(k)
            c, f = TL.fa_step_tiled_T(c, f, tfa, params, sub)
            return c, f, k

        c, f, k = jax.lax.fori_loop(0, iters, body, (coords, fprev, key))
        return c, f, jnp.sum(c)

    c, f, chk = run(coords, fprev, key, tfa, iters_per_call)
    float(chk)  # compile + settle
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        c, f, chk = run(c, f, jax.random.PRNGKey(i), tfa, iters_per_call)
        float(chk)  # host readback closes the timing
        times.append(time.perf_counter() - t0)
    times.sort()
    sec_per_iter = times[len(times) // 2] / iters_per_call
    return g.num_edges / sec_per_iter, g, tfa


def main():
    edges_per_sec, g, tfa = bench_fa()
    print(json.dumps({
        "metric": "fa_edges_per_sec_per_chip",
        "value": edges_per_sec,
        "unit": "edges/s",
        "vs_baseline": edges_per_sec / 1e9,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
