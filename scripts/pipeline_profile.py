"""End-to-end embed pipeline profile on the bench mesh (real TPU).

Times each stage of the examples/embed.cpp pipeline -- graph build,
partition hierarchy, Galerkin chain, multilevel embed (per-phase JSONL via
MetricsLogger) -- to find where the steady-state seconds go.

  python scripts/pipeline_profile.py [L] [metrics.jsonl]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/embed_profile.jsonl"

    import jax

    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.synth import mesh3d
    from graph_embed_tpu.utils.timing import MetricsLogger

    t0 = time.perf_counter()
    g = mesh3d(L)
    t_build = time.perf_counter() - t0
    print(f"build: {t_build:.1f}s  n={g.n} edges={g.num_edges}", flush=True)

    t0 = time.perf_counter()
    res = gt.partition_hierarchy(g, 0.1)
    t_part = time.perf_counter() - t0
    print(f"partition: {t_part:.1f}s  levels="
          f"{[p.num_aggs for p in res.levels]}", flush=True)

    t0 = time.perf_counter()
    graphs = gt.build_galerkin_chain(g, res.levels)
    t_gal = time.perf_counter() - t0
    print(f"galerkin: {t_gal:.1f}s  edges="
          f"{[gr.num_edges for gr in graphs]}", flush=True)

    metrics = MetricsLogger(out)
    t0 = time.perf_counter()
    coords = gt.embed(graphs, res.levels, 3, key=jax.random.PRNGKey(0),
                      metrics=metrics)
    t_embed = time.perf_counter() - t0
    metrics.close()
    import numpy as np

    # deterministic scalar summary; also closes any straggling device work
    import jax.numpy as jnp

    chk = float(jnp.sum(coords))
    print(f"embed: {t_embed:.1f}s  checksum={chk:.6g}", flush=True)
    print(f"TOTAL: {t_build + t_part + t_gal + t_embed:.1f}s", flush=True)
    print(open(out).read(), flush=True)


if __name__ == "__main__":
    main()
