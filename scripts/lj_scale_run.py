"""LiveJournal-scale end-to-end run on the real chip (VERDICT round-1 #7).

com-lj is 4M vertices / 34.7M edges (~69M stored symmetric entries,
run-tests.cpp:399); its synthetic stand-in here is rmat(22, 8) -- hub-heavy
power-law at the same scale.  Pipeline = examples/embedder.cpp:140-295:
partition (native backend) -> Galerkin chain -> multilevel embed (tiled
refinement, sampled oversize buckets, host radii heap for hub grandparents)
-> NaN assert + stress.  Per-phase JSONL via MetricsLogger; wall-clock
closed by scalar readbacks.

  PYTHONPATH=.:$PYTHONPATH python scripts/lj_scale_run.py [scale] [ef]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(argv):
    scale = int(argv[1]) if len(argv) > 1 else 22
    ef = int(argv[2]) if len(argv) > 2 else 8

    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.synth import rmat
    from graph_embed_tpu.harness.runtests import layout_stress
    from graph_embed_tpu.utils.timing import MetricsLogger

    rec = {"workload": f"rmat({scale},{ef})"}
    t0 = time.perf_counter()
    g = rmat(scale, ef, seed=1)
    rec["gen_seconds"] = round(time.perf_counter() - t0, 1)
    rec["n"] = g.n
    rec["edges"] = g.num_edges
    print(f"graph: n={g.n} stored={g.num_edges} "
          f"({rec['gen_seconds']}s gen)", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    hier = gt.partition_hierarchy(g, 0.1)
    rec["partition_seconds"] = round(time.perf_counter() - t0, 1)
    rec["level_sizes"] = hier.level_sizes
    rec["modularity"] = round(float(hier.modularity), 4)
    print(f"partition: {hier.level_sizes} Q={hier.modularity:.4f} "
          f"({rec['partition_seconds']}s)", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    graphs = gt.build_galerkin_chain(g, hier.levels)
    rec["galerkin_seconds"] = round(time.perf_counter() - t0, 1)
    rec["level_edges"] = [gg.num_edges for gg in graphs]
    print(f"galerkin: {rec['level_edges']} "
          f"({rec['galerkin_seconds']}s)", file=sys.stderr, flush=True)

    metrics = MetricsLogger(f"lj_scale_rmat{scale}_{ef}.metrics.jsonl")
    t0 = time.perf_counter()
    coords = gt.embed(graphs, hier.levels, 3, metrics=metrics)
    coords_np = np.asarray(coords)
    rec["embed_seconds"] = round(time.perf_counter() - t0, 1)
    metrics.close()

    assert np.isfinite(coords_np).all(), "non-finite coords"
    rec["coords_finite"] = True
    rec["stress"] = round(layout_stress(g, coords_np), 4)
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
