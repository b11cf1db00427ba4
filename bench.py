"""Benchmark: ForceAtlas iteration throughput in edges/s/chip.

Prints ONE JSON line:
  {"metric": "fa_edges_per_sec_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": N}

The metric is the north-star from BASELINE.md: stored adjacency entries
traversed per second by the jitted ForceAtlas iteration (sampled repulsion +
edge attraction + gravity + adaptive speed schedule), on one chip.
``vs_baseline`` is value / 1e9 (the >= 1e9 edges/s/chip target).

Synthetic power-law-ish graph (no network access on the bench host); the
iteration loop is one jitted lax.fori_loop so dispatch overhead is excluded,
timed over several repeats taking the median.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_bench_graph(n=1 << 20, e_undirected=8 << 20, seed=0):
    """Random multigraph with a mild power-law skew: endpoints drawn from a
    squared-uniform distribution so hubs exist (exercises segment sums with
    nonuniform rows) -- dedup'd + symmetrized to CSR."""
    import jax.numpy as jnp

    import graph_embed_tpu as gt

    rng = np.random.default_rng(seed)
    u = rng.random(e_undirected)
    v = rng.random(e_undirected)
    s = (u * u * n).astype(np.int64)
    r = (v * n).astype(np.int64)
    keep = s != r
    return gt.from_edges(s[keep], r[keep], None, n=n, symmetrize=True,
                         dtype=jnp.float32)


def bench_fa(iters_per_call=20, repeats=3, dim=3, num_samples=64):
    """Median seconds/iteration of the jitted FA step.  The iteration loop is
    a device-side fori_loop and timing is closed by a *scalar host readback*
    (block_until_ready alone does not reliably synchronize through remote
    device tunnels)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    import graph_embed_tpu as gt
    from graph_embed_tpu.forceatlas.flat import fa_step
    from graph_embed_tpu.utils.params import ForceAtlasParams

    g = build_bench_graph()
    params = ForceAtlasParams(repulsion="sampled",
                              num_negative_samples=num_samples)
    deg = g.degrees(True)
    key = jax.random.PRNGKey(0)
    coords = jax.random.uniform(key, (g.n, dim), dtype=jnp.float32,
                                minval=-1.0, maxval=1.0)
    fprev = jnp.zeros_like(coords)

    @partial(jax.jit, static_argnames=("iters",))
    def run(coords, fprev, key, g, deg, iters):
        def body(i, carry):
            c, f, k = carry
            k, sub = jax.random.split(k)
            c, f = fa_step(c, f, g, deg, params, sub)
            return c, f, k

        c, f, k = jax.lax.fori_loop(0, iters, body, (coords, fprev, key))
        return c, f, jnp.sum(c)

    c, f, chk = run(coords, fprev, key, g, deg, iters_per_call)
    float(chk)  # compile + settle
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        c, f, chk = run(c, f, jax.random.PRNGKey(i), g, deg, iters_per_call)
        float(chk)  # host readback closes the timing
        times.append(time.perf_counter() - t0)
    times.sort()
    sec_per_iter = times[len(times) // 2] / iters_per_call
    edges_per_sec = g.num_edges / sec_per_iter
    return edges_per_sec, g


def main():
    edges_per_sec, g = bench_fa()
    print(json.dumps({
        "metric": "fa_edges_per_sec_per_chip",
        "value": edges_per_sec,
        "unit": "edges/s",
        "vs_baseline": edges_per_sec / 1e9,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
