"""LJ-scale per-iteration regression probe (round-4 VERDICT item 4).

BASELINE.md's verification row defines the north star at com-LiveJournal
scale ("per-iteration timer over edge count, com-LiveJournal"); bench.py's
headline shape is rmat20 (n=547k).  Nothing tracked the rmat22 number
machine-readably -- this probe does: it loads the cached rmat22 prep
(scripts/lj_scale_run.py prep 22 8), partition-orders with the cached
hierarchy, runs the FULL flat FA step (attraction + sampled repulsion +
gravity + swing/speed, the product pipeline's base-iteration step) on the
real chip, and APPENDS one JSON line to BENCH_LJ.jsonl at the repo root.

ROADMAP's honest-bench rule names this file: regressions that re-open the
LJ-scale gap move a committed number.

  python -u scripts/lj_step_probe.py [scale] [ef] [B] [W]
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_LJ.jsonl")


def main(argv):
    scale = int(argv[1]) if len(argv) > 1 else 22
    ef = int(argv[2]) if len(argv) > 2 else 8
    B = int(argv[3]) if len(argv) > 3 else 8192
    W = int(argv[4]) if len(argv) > 4 else 8192
    mpe = int(argv[5]) if len(argv) > 5 else 0   # min_pair_edges (overflow)
    xprec = argv[6] if len(argv) > 6 else "f32"  # 'bf16' = v12b gather

    import jax
    import jax.numpy as jnp

    import graph_embed_tpu as gt
    from graph_embed_tpu.forceatlas import tiled as TL

    if os.environ.get("LJ_NO_FUSED"):
        # A/B the non-fused epilogue branch (plain XLA repulsion+speed)
        from graph_embed_tpu.ops.pallas import fused_step as FS
        FS.fused_feasible = lambda n_pad: False
    from graph_embed_tpu.graph.reorder import apply_order, partition_order
    from graph_embed_tpu.ops.pallas import edge_spmm as ES
    from graph_embed_tpu.utils.params import ForceAtlasParams
    from lj_scale_run import load_cache

    if str(scale) == "0":
        # realistic com-lj proxy: community_rmat at com-lj's own scale
        # (4.19M V, ~60M stored vs com-lj's 4M V / 69M stored).  Real
        # social/web graphs have community structure (synth.py notes);
        # Graph500 rmat with id permutation is the no-community WORST
        # case.  The generator emits vertices community-sorted -- the
        # order the pipeline's own partition_order pass produces -- so no
        # separate ordering pass is needed (equivalent to in-pipeline).
        from graph_embed_tpu.graph.csr import from_canonical_coo
        from graph_embed_tpu.graph.synth import cached as synth_cached

        gge = synth_cached("community_rmat", 512, 22, ef, seed=1)
        s0, r0, _ = gge.to_coo_numpy()
        g = from_canonical_coo(s0, r0, np.ones(s0.size, np.float32), gge.n)
        workload = f"community_rmat(512,22,{ef}) full step"
    else:
        graphs, parts, _ = load_cache(scale, ef)
        g0 = graphs[0]
        perm = partition_order(g0, levels=parts)
        s0, r0, _ = g0.to_coo_numpy()
        inv = np.empty_like(perm); inv[perm] = np.arange(perm.size)
        g = gt.from_edges(inv[s0], inv[r0], np.ones(s0.size, np.float32),
                          n=g0.n, symmetrize=False)
        workload = f"rmat({scale},{ef}) ordered full step"
    E = g.num_edges
    print(f"{workload}: n={g.n} E={E}", flush=True)

    params = ForceAtlasParams(repulsion="sampled", num_negative_samples=64,
                              x_precision=xprec)
    t0 = time.perf_counter()
    tfa = TL.prepare_tiled(g, 3, params, sender_block=B, window=W, tile=1024,
                           min_pair_edges=mpe)
    tiles_s = round(time.perf_counter() - t0, 1)
    print(f"tiles: slabs={tfa.tiles.num_tiles} fill={tfa.tiles.fill:.3f} "
          f"overflow={tfa.tiles.num_overflow} ({tiles_s}s)", flush=True)
    tfa = jax.device_put(tfa)

    @jax.jit
    def step(c, f, key, tfa):
        key, sub = jax.random.split(key)
        c, f = TL.fa_step_tiled_T(c, f, tfa, params, sub)
        return c, f, key

    coords = ES.pad_coords_T(
        jax.random.uniform(jax.random.PRNGKey(1), (g.n, 3),
                           dtype=jnp.float32, minval=-1., maxval=1.),
        tfa.tiles.n_pad)
    fprev = jnp.zeros_like(coords)
    key = jax.random.PRNGKey(0)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        coords, fprev, key = step(coords, fprev, key, tfa)
    float(jnp.sum(coords))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            coords, fprev, key = step(coords, fprev, key, tfa)
        float(jnp.sum(coords))
        times.append(time.perf_counter() - t0)
    spi = sorted(times)[1] / iters
    rec = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
           "workload": workload,
           "n": g.n, "edges": E, "shape": [B, W],
           "fill": round(float(tfa.tiles.fill), 3),
           "ms_per_iter": round(spi * 1e3, 2),
           "edges_per_sec": round(E / spi),
           "vs_1e9": round(E / spi / 1e9, 3),
           "min_pair_edges": mpe, "x_precision": xprec,
           "overflow": (int(tfa.tiles.num_overflow)
                        if tfa.tiles is not None else 0),
           "first_block_seconds": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
