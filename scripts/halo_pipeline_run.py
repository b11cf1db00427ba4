"""Full-pipeline halo record: ``embed(mesh=..., sharding="halo")`` end to
end at LiveJournal scale on the real chip (ROADMAP round-5 queue #4).

The flat-step halo-vs-replicated A/B exists (BENCHMARKS "Halo-sharded step
at LiveJournal scale"), but the PRODUCT pipeline had never run with
``sharding="halo"`` at scale.  The halo design applies to the flat coarsest
level (embed.driver._halo_base_case); a full-depth rmat22 hierarchy bottoms
out at 1,630 vertices -- far below any sensible mesh_min_n -- so this run
drops the coarse tail the way the reference's own batch pipeline does
(examples/embedder.cpp:189-200, the startLevel knob): keep only the finest
``levels`` levels so the coarsest KEPT level is large enough that the halo
base case actually engages.

  base case  = _halo_base_case on A_{levels-1}: partition-order the level,
               halo windowed tiles over [blk | pool], invariant sampling
               (the BASELINE config-5 flat design);
  refinement = refine_level_sharded per finer level (aggregate-sharded,
               zero per-iteration collectives) -- itself a first at 2M
               vertices on real hardware (the lj_scale records ran the
               non-mesh tiled refine).

A second pass runs ``sharding="replicated"`` with identical budgets in the
same session -- the pipeline-level halo-vs-replicated A/B (same chip, same
compile-cache state; run the halo arm FIRST so the replicated arm, if
anything, benefits from warmer caches).  Per-phase JSONL via MetricsLogger;
one JSON summary line per arm + a combined line at the end.

``base_iters`` is explicit (default 1000) rather than the library policy:
the truncated base level is an INTERMEDIATE level of the full hierarchy,
where the reference budget analogue is the 100-iteration refinement pass
(src/embed.cpp:793), not the 100k-iteration flat default -- and the A/B
only needs both arms to pay the same budget.

  PYTHONPATH=. python scripts/halo_pipeline_run.py [levels] [base_iters] \
      [scale] [ef] [arms]          # arms: both (default) | halo | replicated
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lj_scale_run import cache_dir, load_cache, log, run_tag  # noqa: E402


def run_arm(sharding, graphs, parts, base_iters, tag, rec, base_order=None):
    import jax
    import jax.numpy as jnp

    import graph_embed_tpu as gt
    from graph_embed_tpu.embed.checkpoint import CheckpointStore
    from graph_embed_tpu.harness.runtests import layout_stress
    from graph_embed_tpu.parallel.mesh import make_mesh
    from graph_embed_tpu.utils.timing import MetricsLogger

    mesh = make_mesh(1)
    mesh_min_n = min(65536, graphs[-1].n)
    xprec = os.environ.get("LJ_X_PRECISION", "f32")
    kw = {}
    if xprec != "f32":
        from graph_embed_tpu.utils.params import (ForceAtlasParams,
                                                  MultilevelFAParams)

        kw = dict(base_params=ForceAtlasParams(x_precision=xprec),
                  refine_params=MultilevelFAParams(x_precision=xprec))
    store = CheckpointStore(os.path.join(
        cache_dir_for(tag),
        f"ckpt_pipe_{sharding}_{len(graphs)}"
        + ("" if xprec == "f32" else f"_{xprec}")))
    metrics = MetricsLogger(
        f"halo_pipeline_{tag}_{sharding}.metrics.jsonl")
    arm = {"sharding": sharding, "levels": len(graphs),
           "base_n": graphs[-1].n, "base_edges": graphs[-1].num_edges,
           "base_iterations": base_iters, "mesh_min_n": mesh_min_n}
    log(f"--- arm {sharding}: base level n={graphs[-1].n} "
        f"e={graphs[-1].num_edges}, {len(graphs)-1} refine levels")
    t0 = time.perf_counter()
    if xprec != "f32":
        arm["x_precision"] = xprec
    coords = gt.embed(graphs, parts, 3, mesh=mesh, sharding=sharding,
                      base_iterations=base_iters, metrics=metrics,
                      store=store, base_order=base_order, **kw)
    coords_np = np.asarray(coords)
    arm["embed_seconds"] = round(time.perf_counter() - t0, 1)
    metrics.close()
    arm["coords_finite"] = bool(np.isfinite(coords_np).all())
    t0 = time.perf_counter()
    arm["stress"] = round(layout_stress(graphs[0], coords_np), 4)
    arm["stress_seconds"] = round(time.perf_counter() - t0, 1)
    log(f"arm {sharding}: embed {arm['embed_seconds']}s "
        f"stress {arm['stress']} finite={arm['coords_finite']}")
    rec[sharding] = arm
    print(json.dumps({"arm": arm}), flush=True)


_TAG_DIR = {}


def cache_dir_for(tag):
    return _TAG_DIR[tag]


def main(argv):
    levels = int(argv[1]) if len(argv) > 1 else 2
    base_iters = int(argv[2]) if len(argv) > 2 else 1000
    scale = argv[3] if len(argv) > 3 else "22"
    scale = "mesh" if scale == "mesh" else int(scale)
    ef = int(argv[4]) if len(argv) > 4 else 8
    tag = run_tag(scale, ef)
    _TAG_DIR[tag] = cache_dir(scale, ef)

    graphs, parts, prep_rec = load_cache(scale, ef)
    if levels < 2 or levels > len(graphs):
        raise SystemExit(f"levels must be in [2, {len(graphs)}]")
    # the truncated-away coarse levels carry the base level's locality
    # ordering for free (embed's base_order doc): no re-partition
    dropped = parts[levels - 1:]
    graphs = graphs[:levels]
    parts = parts[: levels - 1]
    base_order = None
    if dropped:
        from graph_embed_tpu.graph.reorder import partition_order

        t0 = time.perf_counter()
        base_order = partition_order(graphs[-1], levels=dropped)
        log(f"base_order from dropped levels "
            f"({time.perf_counter() - t0:.1f}s)")
    rec = {"workload": f"{tag} pipeline", "levels_kept": levels,
           "level_sizes": [g.n for g in graphs],
           "level_edges": [g.num_edges for g in graphs]}

    arms = argv[5] if len(argv) > 5 else "both"
    arm_list = (("halo", "replicated") if arms == "both" else (arms,))
    for sharding in arm_list:
        run_arm(sharding, graphs, parts, base_iters, tag, rec,
                base_order=base_order if sharding == "halo" else None)
    if "halo" in rec and "replicated" in rec:
        h, r = rec["halo"], rec["replicated"]
        rec["halo_vs_replicated_embed"] = round(
            h["embed_seconds"] / max(r["embed_seconds"], 1e-9), 2)
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
