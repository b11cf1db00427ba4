"""On-chip direct-layout shape sweep at LJ scale: skinny sender blocks x
tall windows (round-5 follow-up to the pooled A/B).

The pooled A/B measured per-slab cost as SENDER-BLOCK-driven (scatter
join; ~1.0us at B=8192 vs ~0.58us at B=4096) and ~flat in window width,
while the host grid says fill at (2048, 65536) is 0.808 with 31.9GB/iter
of window DMA.  This sweeps real shapes interleaved A/B on the chip:
compute-bound small-B shapes vs the 8192^2 status quo.

  python -u scripts/shape_ab.py [scale] [ef] [B,W[,k[,T[,dmax[,b]]]] ...]  (6th field 'b' = v12b bf16-x)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv):
    scale = int(argv[1]) if len(argv) > 1 else 22
    ef = int(argv[2]) if len(argv) > 2 else 8
    shapes = [tuple(int(v) if v != "b" else v for v in a.split(","))
              for a in argv[3:]] or [
        (8192, 8192), (4096, 8192), (2048, 16384), (2048, 32768),
        (2048, 65536), (4096, 65536)]

    import jax
    import jax.numpy as jnp

    from graph_embed_tpu.graph.reorder import partition_order
    from graph_embed_tpu.ops.pallas import edge_spmm as ES
    from graph_embed_tpu.parallel.sharded import _CooShim
    from lj_scale_run import load_cache

    graphs, parts, _ = load_cache(scale, ef)
    lvl = int(os.environ.get("SHAPE_AB_LEVEL", "0"))
    g0 = graphs[lvl]
    if lvl == 0:
        perm = partition_order(g0, levels=parts)
        inv = np.empty_like(perm); inv[perm] = np.arange(perm.size)
        s0, r0, _ = g0.to_coo_numpy()
        s, r = inv[s0], inv[r0]
    else:
        # coarse levels are already hierarchy-ordered by construction
        s0, r0, _ = g0.to_coo_numpy()
        s, r = s0, r0
    n, E = g0.n, s0.size
    w1 = np.ones(E, np.float32)
    print(f"rmat({scale},{ef}) ordered: n={n} E={E}", flush=True)

    arms = []
    for shp in shapes:
        B, W = shp[0], shp[1]
        T = shp[3] if len(shp) > 3 else 1024
        dmax = shp[4] if len(shp) > 4 else 4
        bf16 = len(shp) > 5 and shp[5] == "b"
        t0 = time.perf_counter()
        t = ES.build_window_tiles(_CooShim(s, r, w1, n), tile=T,
                                  sender_block=B, window=W, packing="unit")
        # k grouped window blocks live double-buffered in VMEM at 16*W
        # bytes each (packed f32, dmax=4); (4096, 65536) at k=8 overflowed
        # the 16MB scoped budget by 320KB -- cap k so 2*k*16*W <= ~6MB
        k_cap = max(1, (6 << 20) // (32 * W))
        k_cap = 1 << (k_cap.bit_length() - 1)       # power of two
        k = shp[2] if len(shp) > 2 else min(ES.jumbo_group(t), k_cap)
        dev = jax.device_put(ES.pair_window_tiles(t, k))
        print(f"[{B}x{W}k{k}T{T}] slabs={t.num_tiles} fill={t.fill:.3f} "
              f"n_pad={t.n_pad} chunks={len(t.chunks) or 1} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
        variant = (f"v12{'b' if bf16 else ''}p{k}" if k > 1
                   else ("v12b" if bf16 else "auto"))
        arms.append((f"{B}x{W}k{k}T{T}d{dmax}{'b' if bf16 else ''}",
                     dev, dmax, variant))

    import functools

    @functools.partial(jax.jit, static_argnames=("dmax", "variant"))
    def step(xT, tiles, dmax, variant):
        y = ES.spmv_windowed(xT, tiles, dmax=dmax, variant=variant)
        return xT + 1e-6 * y

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (n, 3), jnp.float32, -1., 1.)
    state = {}
    iters = 20
    for rep in range(3):
        for tag, dev, dmax, variant in arms:
            x = state.get(tag)
            if x is None:
                x = ES.pad_coords_T(x0, dev.n_pad)
            t0 = time.perf_counter()
            for _ in range(iters):
                x = step(x, dev, dmax, variant)
            float(jnp.sum(x))
            dt = time.perf_counter() - t0
            state[tag] = x
            note = " (compile)" if rep == 0 else ""
            print(f"[{rep}] {tag}: {dt/iters*1e3:.2f} ms/iter  "
                  f"{E/(dt/iters)/1e6:.0f} M edges/s{note}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
