"""Per-term profile of one flat tiled FA iteration on the real TPU.

Times, on the bench mesh (bench.py workload): the full step, the
attraction term only (DIA rolls and/or windowed SpMV), the fused sampled
repulsion only, and the gravity/swing/speed remainder -- each as a jitted
20-iteration fori_loop closed by a scalar readback.

  python scripts/flat_profile.py [L] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return time.perf_counter() - t0


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from functools import partial

    import jax
    import jax.numpy as jnp

    from graph_embed_tpu.forceatlas import tiled as TL
    from graph_embed_tpu.graph.synth import mesh3d
    from graph_embed_tpu.ops.pallas import edge_spmm as ES
    from graph_embed_tpu.ops.pallas import repulsion as RP
    from graph_embed_tpu.utils.params import ForceAtlasParams

    g = mesh3d(L)
    dim = 3
    params = ForceAtlasParams(repulsion="sampled", num_negative_samples=64)
    t0 = time.perf_counter()
    tfa = TL.prepare_tiled(g, dim, params)
    print(f"prepare_tiled: {time.perf_counter() - t0:.1f}s  "
          f"dia_offsets={tfa.dia_offsets} "
          f"tiles={'None' if tfa.tiles is None else type(tfa.tiles).__name__}",
          flush=True)

    key = jax.random.PRNGKey(0)
    coords = jax.random.uniform(key, (g.n, dim), dtype=jnp.float32,
                                minval=-1.0, maxval=1.0)
    xT0 = ES.pad_coords_T(coords, tfa.n_pad)
    n = g.n

    def loop(fn):
        @jax.jit
        def run(xT):
            def body(i, x):
                return fn(x, i)
            return jax.lax.fori_loop(0, iters, body, xT)
        return run

    def full_step(xT, i):
        x2, _ = TL.fa_step_tiled_T(xT, jnp.zeros_like(xT), tfa, params,
                                   jax.random.fold_in(key, i))
        return x2

    def att_only(xT, i):
        return xT + 1e-6 * TL._attraction_T(xT, tfa, params)

    def rep_only(xT, i):
        deg_pad = jnp.zeros(tfa.n_pad, jnp.float32).at[:n].set(tfa.deg + 1.0)
        repT = RP.repulsion_sampled_fused(
            xT, deg_pad, jax.random.fold_in(key, i), n=n,
            num_samples=params.num_negative_samples, repel=params.repel,
            eps=params.epsilon, dim=dim)
        return xT + 1e-6 * repT

    def misc_only(xT, i):
        deg_p1_pad = jnp.zeros(tfa.n_pad, jnp.float32).at[:n].set(
            tfa.deg + 1.0)
        mag = jnp.maximum(jnp.sqrt(jnp.sum(xT * xT, axis=0)), 1e-12)
        fT = -(xT / mag[None, :]) * (params.gravity * deg_p1_pad)[None, :]
        swing = jnp.sqrt(jnp.sum(fT * fT, axis=0))
        speed = params.ks * params.tolerate / (
            1.0 + params.tolerate * jnp.sqrt(swing))
        return xT + fT * jnp.minimum(speed, 1.0)[None, :]

    for name, fn in (("full", full_step), ("attraction", att_only),
                     ("repulsion", rep_only), ("misc+speed", misc_only)):
        dt = timed(loop(fn), xT0)
        print(f"  {name:11s} {dt / iters * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
