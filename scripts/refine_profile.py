"""Per-term profile of one multilevel-refinement iteration on the real TPU.

Times, on the bench mesh's level-0 refinement layout:
  * the full refine step (forces + speed update),
  * repulsion only, attraction (slot SpMV) only, pull/gravity/speed only,
each as a jitted 20-iteration fori_loop closed by a scalar readback.

  python scripts/refine_profile.py [L] [iters]
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

    import graph_embed_tpu as gt
    from graph_embed_tpu.forceatlas import multilevel_tiled as MT
    from graph_embed_tpu.forceatlas import forces as F
    from graph_embed_tpu.graph.synth import mesh3d
    from graph_embed_tpu.ops.pallas import edge_spmm as ES
    from graph_embed_tpu.utils.params import MultilevelFAParams

    g = mesh3d(L)
    t0 = time.perf_counter()
    res = gt.partition_hierarchy(g, 0.1)
    part = res.levels[0]
    print(f"partition: {time.perf_counter() - t0:.1f}s  m={part.num_aggs}",
          flush=True)

    params = MultilevelFAParams()
    t0 = time.perf_counter()
    layout = MT.prepare_refine(g, part, params)
    print(f"prepare_refine: {time.perf_counter() - t0:.1f}s  "
          f"n_slots={layout.n_slots} buckets="
          f"{[(S, m_b, C, k) for (_, m_b, S, C, k) in layout.bucket_meta]} "
          f"tiles: slabs={layout.tiles.num_tiles} fill={layout.tiles.fill:.3f} "
          f"sb={layout.tiles.sender_block} win={layout.tiles.window} "
          f"packing={layout.tiles.packing}", flush=True)

    m = part.num_aggs
    key = jax.random.PRNGKey(0)
    coords_A = jax.random.uniform(key, (m, 3), minval=-1.0, maxval=1.0)
    r_A = jnp.full((m,), 0.05, jnp.float32)
    dim = 3
    n_slots = layout.n_slots
    pull_slot = jnp.zeros((n_slots, dim), jnp.float32)
    coords0 = jax.random.uniform(key, (n_slots, dim), dtype=jnp.float32,
                                 minval=-1.0, maxval=1.0)
    coords0 = jnp.where(layout.valid_slot[:, None], coords0, 0.0)
    rep_key = jax.random.PRNGKey(1)

    def loop(fn):
        @partial(jax.jit, static_argnames=())
        def run(coords):
            def body(i, c):
                return fn(c, i)
            return jax.lax.fori_loop(0, iters, body, coords)
        return run

    # full step
    deg_p1 = layout.deg_loc + 1.0
    valid = layout.valid_slot

    def full_step(coords, i):
        f = MT.refine_forces(coords, layout, pull_slot, params, dim, False,
                             key=jax.random.fold_in(rep_key, i))
        nc = F.speed_update(coords, f, jnp.zeros_like(f), deg_p1,
                            ks=params.ks, ksmax=params.ksmax,
                            tolerate=params.tolerate,
                            swing_clamp_eps=params.epsilon)
        return jnp.where(valid[:, None], nc, coords)

    def rep_only(coords, i):
        xT = jnp.zeros((ES.D_PAD, n_slots), jnp.float32)
        xT = xT.at[:dim, :].set(coords.T)
        xT_deg = xT.at[ES.D_PAD - 1, :].set(
            jnp.where(valid, layout.deg_loc, -1.0))
        repT = MT.bucket_repulsion(
            xT_deg, layout, params.repel, params.epsilon, dim=dim,
            key=jax.random.fold_in(rep_key, i),
            num_samples=params.num_negative_samples,
            sampled_threshold=params.sampled_slots_threshold)
        return coords + 1e-6 * repT[:dim, :].T

    def att_only(coords, i):
        xT = jnp.zeros((ES.D_PAD, layout.tiles.n_pad), jnp.float32)
        xT = xT.at[:dim, :n_slots].set(coords.T)
        attT = ES.attraction_spmv(xT, layout.tiles, layout.deg_w_att,
                                  attract=params.attract, dmax=4)
        return coords + 1e-6 * attT[:dim, :n_slots].T

    def misc_only(coords, i):
        mag = jnp.maximum(jnp.sqrt(jnp.sum(coords * coords, axis=1)),
                          params.epsilon)
        ext = pull_slot / mag[:, None]
        grav = -(coords / mag[:, None]) * (params.gravity * deg_p1)[:, None]
        f = jnp.where(valid[:, None], ext + grav, 0.0)
        nc = F.speed_update(coords, f, jnp.zeros_like(f), deg_p1,
                            ks=params.ks, ksmax=params.ksmax,
                            tolerate=params.tolerate,
                            swing_clamp_eps=params.epsilon)
        return jnp.where(valid[:, None], nc, coords)

    for name, fn in (("full", full_step), ("repulsion", rep_only),
                     ("attraction", att_only), ("misc+speed", misc_only)):
        dt = timed(loop(fn), coords0)
        print(f"  {name:11s} {dt / iters * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
