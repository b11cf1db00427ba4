"""Full fused FA step on the PARTITION-ORDERED rmat20 graph (fill 0.787)
-- the in-pipeline throughput, where the hierarchy provides the order."""
import sys, time
from functools import partial
import numpy as np

def main():
    import jax, jax.numpy as jnp
    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.synth import rmat
    from graph_embed_tpu.graph.reorder import partition_order, apply_order
    from graph_embed_tpu.ops.pallas import edge_spmm as ES
    from graph_embed_tpu.forceatlas import tiled as TL
    from graph_embed_tpu.utils.params import ForceAtlasParams

    g = rmat(20, 8, seed=1)
    s, r, _ = g.to_coo_numpy()
    g = gt.from_edges(s, r, np.ones(s.size, np.float32), n=g.n, symmetrize=False)
    t0 = time.time(); perm = partition_order(g)
    g2, _ = apply_order(g, perm)
    print(f"order {time.time()-t0:.0f}s", flush=True)
    params = ForceAtlasParams(repulsion="sampled", num_negative_samples=64)
    tfa = TL.prepare_tiled(g2, 3, params, sender_block=4096, window=4096, tile=1024)
    print(f"tiles slabs={tfa.tiles.num_tiles} fill={tfa.tiles.fill:.3f}", flush=True)
    coords = ES.pad_coords_T(jax.random.uniform(jax.random.PRNGKey(1), (g2.n, 3),
        dtype=jnp.float32, minval=-1., maxval=1.), tfa.n_pad)
    fprev = jnp.zeros_like(coords)

    @partial(jax.jit, static_argnames=("iters",))
    def run(c, f, key, iters):
        def body(i, carry):
            c, f, k = carry
            k, sub = jax.random.split(k)
            c, f = TL.fa_step_tiled_T(c, f, tfa, params, sub)
            return c, f, k
        c, f, k = jax.lax.fori_loop(0, iters, body, (c, f, key))
        return c, f, jnp.sum(c)

    iters = 20
    c, f, chk = run(coords, fprev, jax.random.PRNGKey(0), iters); float(chk)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        c, f, chk = run(c, f, jax.random.PRNGKey(i), iters); float(chk)
        times.append(time.perf_counter() - t0)
    spi = sorted(times)[1] / iters
    print(f"ordered full step: {spi*1e3:.2f} ms/iter  "
          f"{g.num_edges/spi/1e6:.0f} M edges/s", flush=True)

if __name__ == "__main__":
    main()
