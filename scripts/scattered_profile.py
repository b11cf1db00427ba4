"""Where does the scattered (RMAT) FA iteration spend its time?

Same-session A/B on the real chip (absolute ms drift day to day on the
shared chip -- trust ratios):
  1. bare windowed SpMV at the bench shape (4096/4096/T1024), kernel v7
     (per-[1,T]-op hi joins) vs v9 (full-vreg joins, [G,T] one-hot);
  2. the full fused FA step (what bench.py measures).

Usage: python -u scripts/scattered_profile.py [scale] [ef]
"""
from __future__ import annotations

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

    t0 = time.perf_counter()
    g = rmat(scale, ef, seed=1)
    s, r, _ = g.to_coo_numpy()
    g = gt.from_edges(s, r, np.ones(s.size, np.float32), n=g.n,
                      symmetrize=False)
    print(f"rmat({scale},{ef}): n={g.n} E={g.num_edges} "
          f"gen {time.perf_counter()-t0:.1f}s", flush=True)

    B, W, T = 4096, 4096, 1024
    tiles = ES.build_window_tiles(g, tile=T, sender_block=B, window=W,
                                  packing="unit")
    # device-put ONCE: passing host-numpy tiles into the jit re-ships ~90MB
    # of packed words through the tunnel on every call (this artifact also
    # polluted the round-2 sweep's absolute numbers)
    tiles = jax.device_put(tiles)
    print(f"tiles: slabs={tiles.num_tiles} fill={tiles.fill:.3f}", flush=True)
    xT = ES.pad_coords_T(
        jax.random.uniform(jax.random.PRNGKey(0), (g.n, 3),
                           dtype=jnp.float32, minval=-1., maxval=1.),
        tiles.n_pad)

    @partial(jax.jit, static_argnames=("iters", "variant"))
    def run(xT, tiles, iters, variant):
        def body(i, x):
            y = ES.spmv_windowed(x, tiles, dmax=4, variant=variant)
            return x + 1e-6 * y

        out = jax.lax.fori_loop(0, iters, body, xT)
        return out, jnp.sum(out)

    iters = 20
    results = {}
    for variant in ("v9", "v11", "v9", "v11"):
        out, chk = run(xT, tiles, iters, variant)
        float(chk)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out, chk = run(out, tiles, iters, variant)
            float(chk)
            times.append(time.perf_counter() - t0)
        spi = sorted(times)[1] / iters
        results.setdefault(variant, []).append(spi)
        print(f"spmv {variant}: {spi*1e3:.2f} ms/iter  "
              f"{g.num_edges/spi/1e6:.0f} M edges/s", flush=True)

    # full fused step (bench.py path)
    from graph_embed_tpu.forceatlas import tiled as TL
    from graph_embed_tpu.utils.params import ForceAtlasParams

    params = ForceAtlasParams(repulsion="sampled", num_negative_samples=64)
    tfa = TL.prepare_tiled(g, 3, params, sender_block=B, window=W, tile=T)
    coords = ES.pad_coords_T(
        jax.random.uniform(jax.random.PRNGKey(1), (g.n, 3),
                           dtype=jnp.float32, minval=-1., maxval=1.),
        tfa.n_pad)
    fprev = jnp.zeros_like(coords)

    @partial(jax.jit, static_argnames=("iters", "tag"))
    def step_run(c, f, key, iters, tag):
        def body(i, carry):
            c, f, k = carry
            k, sub = jax.random.split(k)
            c, f = TL.fa_step_tiled_T(c, f, tfa, params, sub)
            return c, f, k

        c, f, k = jax.lax.fori_loop(0, iters, body, (c, f, key))
        return c, f, jnp.sum(c)

    # kernel variants inside the FULL step (the choice is baked at trace
    # time via JUMBO_JOIN_MIN/JUMBO_VARIANT; the static tag forces retrace)
    saved = (ES.JUMBO_JOIN_MIN, ES.JUMBO_VARIANT)
    for tag in ("step-v9", "step-v11", "step-v9", "step-v11"):
        ES.JUMBO_JOIN_MIN, ES.JUMBO_VARIANT = saved
        if tag.endswith("v7"):
            ES.JUMBO_JOIN_MIN = 1 << 30
        elif tag.endswith(("v10", "v11")):
            ES.JUMBO_VARIANT = tag.split("-")[1]
        c, f, chk = step_run(coords, fprev, jax.random.PRNGKey(0), iters,
                             tag)
        float(chk)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            c, f, chk = step_run(c, f, jax.random.PRNGKey(i), iters, tag)
            float(chk)
            times.append(time.perf_counter() - t0)
        spi = sorted(times)[1] / iters
        print(f"full {tag}: {spi*1e3:.2f} ms/iter  "
              f"{g.num_edges/spi/1e6:.0f} M edges/s", flush=True)
    ES.JUMBO_JOIN_MIN, ES.JUMBO_VARIANT = saved
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
