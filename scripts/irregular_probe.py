"""Probe: irregular (RMAT) flat-FA throughput on the real chip, A/B over
orderings.  Informs bench.py's second workload (VERDICT round-1 item #2)."""
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from graph_embed_tpu.graph.synth import rmat
from graph_embed_tpu.graph.reorder import partition_order, rcm_order, apply_order
from graph_embed_tpu.forceatlas import tiled as TL
from graph_embed_tpu.ops.pallas import edge_spmm as ES
from graph_embed_tpu.utils.params import ForceAtlasParams

def bench_graph(g, iters=20, repeats=5, dim=3, num_samples=64):
    params = ForceAtlasParams(repulsion="sampled", num_negative_samples=num_samples)
    t0 = time.perf_counter()
    tfa = TL.prepare_tiled(g, dim, params)
    print("prep", round(time.perf_counter()-t0, 1), "s; tiles:",
          "none" if tfa.tiles is None else f"{tfa.tiles.num_tiles} slabs fill {tfa.tiles.fill:.3f} "
          f"{tfa.tiles.sender_block}/{tfa.tiles.window}/T{tfa.tiles.tile} pack={tfa.tiles.packing}",
          "dia offsets:", len(tfa.dia_offsets) if tfa.dia_offsets else 0, flush=True)
    key = jax.random.PRNGKey(0)
    coords = jax.random.uniform(key, (g.n, dim), dtype=jnp.float32, minval=-1., maxval=1.)
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
    c, f, chk = run(coords, fprev, key, tfa, iters)
    float(chk)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        c, f, chk = run(c, f, jax.random.PRNGKey(i), tfa, iters)
        float(chk)
        times.append(time.perf_counter() - t0)
    times.sort()
    spi = times[len(times)//2] / iters
    print("  ms/iter:", round(spi*1e3, 2), " edges/s:", f"{g.num_edges/spi:.3e}", flush=True)
    return g.num_edges / spi

if __name__ == "__main__":
    scale, ef = int(sys.argv[1]) if len(sys.argv) > 1 else 20, int(sys.argv[2]) if len(sys.argv) > 2 else 8
    t0 = time.perf_counter()
    g = rmat(scale, ef, seed=1)
    print(f"rmat({scale},{ef}): n={g.n} stored={g.num_edges}", round(time.perf_counter()-t0,1), "s", flush=True)
    print("== natural order ==", flush=True)
    bench_graph(g)
    t0 = time.perf_counter()
    perm = partition_order(g, 0.1)
    print("partition_order:", round(time.perf_counter()-t0,1), "s", flush=True)
    g2, _ = apply_order(g, perm)
    print("== partition order ==", flush=True)
    bench_graph(g2)
