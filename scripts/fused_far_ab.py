"""A/B: fused far-offset FA step vs the composed fallback it replaces.

Workload: 184^3 mesh (n = 6.23M, ~37M stored entries) whose L^2 stride
33856 exceeds the fused kernel's one-block halo at the n_pad-forced block
size -- before the far-offset split this graph fell back to the composed
path (DIA rolls + repulsion kernel + XLA epilogue as separate HBM passes).

Usage: python scripts/fused_far_ab.py [L]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from graph_embed_tpu.graph.synth import mesh3d
from graph_embed_tpu.forceatlas import tiled as TL
from graph_embed_tpu.forceatlas import forces as F
from graph_embed_tpu.ops.pallas import edge_spmm as ES
from graph_embed_tpu.ops.pallas import fused_step as FS
from graph_embed_tpu.utils.params import ForceAtlasParams


def composed_step(xT, fprevT, tfa, params, key):
    """The pre-split fallback: separate force/epilogue programs."""
    fT = TL.tiled_forces_T(xT, tfa, params, key)
    swing = jnp.sqrt(jnp.sum((fT - fprevT) ** 2, axis=0))
    speed = params.ks * params.tolerate / (
        1.0 + params.tolerate * jnp.sqrt(swing))
    total_f = jnp.sqrt(jnp.sum(fT * fT, axis=0))
    constraint = jnp.where(total_f > 0,
                           params.ksmax / jnp.maximum(total_f, F.TINY),
                           jnp.inf)
    speed = jnp.minimum(speed, constraint)
    return xT + fT * speed[None, :], fT


def time_loop(step, coords, fprev, tfa, params, iters=20, repeats=5):
    @partial(jax.jit, static_argnames=("iters",))
    def run(c, f, key, tfa, iters):
        def body(i, carry):
            c, f, k = carry
            k, sub = jax.random.split(k)
            c, f = step(c, f, tfa, params, sub)
            return c, f, k

        c, f, k = jax.lax.fori_loop(0, iters, body, (c, f, key))
        return c, f, jnp.sum(c)

    c, f, chk = run(coords, fprev, jax.random.PRNGKey(0), tfa, iters)
    float(chk)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        c, f, chk = run(c, f, jax.random.PRNGKey(i), tfa, iters)
        float(chk)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / iters


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 184
    g = mesh3d(L)
    params = ForceAtlasParams(repulsion="sampled", num_negative_samples=64)
    tfa = TL.prepare_tiled(g, 3, params)
    block = FS.fused_block_for(tfa.n_pad)
    near, far = FS.split_offsets(tfa.dia_offsets, block)
    print(f"n={g.n} E={g.num_edges} n_pad={tfa.n_pad} block={block} "
          f"offsets={tfa.dia_offsets} near={len(near)} far={len(far)}",
          flush=True)
    key = jax.random.PRNGKey(0)
    coords = jax.random.uniform(key, (g.n, 3), dtype=jnp.float32,
                                minval=-1.0, maxval=1.0)
    coords = ES.pad_coords_T(coords, tfa.n_pad)
    fprev = jnp.zeros_like(coords)

    t_comp = time_loop(composed_step, coords, fprev, tfa, params)
    print(f"composed: {t_comp*1e3:.2f} ms/iter "
          f"({g.num_edges/t_comp/1e9:.3f} Ge/s)", flush=True)
    t_fused = time_loop(TL.fa_step_tiled_T, coords, fprev, tfa, params)
    print(f"fused:    {t_fused*1e3:.2f} ms/iter "
          f"({g.num_edges/t_fused/1e9:.3f} Ge/s)  "
          f"speedup {t_comp/t_fused:.2f}x", flush=True)


if __name__ == "__main__":
    main()
