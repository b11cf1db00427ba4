"""Does max_agg_size recover planted-1M precision?  (round-2 VERDICT #5)

The planted 1000x1000 roster row recovered ground truth at precision 0.206
(recall 0.681): size-skewed aggregates mix communities once intra-degree is
sparse (p_in=0.012 -> ~12 intra-edges/vertex), and the hierarchy level
nearest the true 1000 communities lands at ~2x the count with a few
snowballs carrying most of the mass.  PartitionParams.max_agg_size is the
documented lever; this script MEASURES it: baseline vs capped hierarchies,
precision/recall/Q at the truth-nearest level, appended as JSONL.

  python -u scripts/planted_precision.py [-o out.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def nearest_level(hier, k_true):
    upto = min(range(1, len(hier.levels) + 1),
               key=lambda u: abs(np.log(hier.levels[u - 1].num_aggs
                                        / k_true)))
    return upto


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="bench_planted_precision.jsonl")
    ap.add_argument("--caps", default="0,1200,1500,2500")
    ap.add_argument("--k", type=int, default=1000, help="communities")
    ap.add_argument("--m", type=int, default=1000, help="community size")
    args = ap.parse_args(argv)
    os.environ["JAX_PLATFORMS"] = "cpu"   # in-process, before importing jax

    import graph_embed_tpu as gt
    from graph_embed_tpu.harness.runtests import (_load_roster_graph,
                                                  pair_counting_similarity)
    from graph_embed_tpu.utils.params import PartitionParams

    spec = f"synth:planted:{args.k}:{args.m}:0.012:0.000002"
    g, truth = _load_roster_graph(spec, "coolist")
    truth = np.asarray(truth)
    print(f"{spec}: n={g.n} stored={g.num_edges}", file=sys.stderr,
          flush=True)

    # same +-0.1% vertex reweighting as the roster (tie-break degeneracy)
    rng = np.random.default_rng(0)
    s, r, w = g.to_coo_numpy()
    vw = rng.uniform(1 - 0.001, 1 + 0.001, size=g.n)
    g = gt.from_edges(s, r, w * vw[s] * vw[r], n=g.n, symmetrize=False,
                      dtype=g.dtype)

    records = []
    for cap in (int(c) for c in args.caps.split(",")):
        # the cap must bound ORIGINAL-vertex mass: the per-level default
        # resets sizes at each snapshot, so a community-scale cap of ~1000
        # never binds on the way to the truth level (measured round 3 --
        # identical hierarchies at caps 1200-2500)
        params = PartitionParams() if cap == 0 else PartitionParams(
            max_agg_size=cap, cap_unit="original")
        t0 = time.perf_counter()
        hier = gt.partition_hierarchy(g, 0.1, params)
        secs = round(time.perf_counter() - t0, 1)
        upto = nearest_level(hier, args.k)
        hp = gt.compose(hier.levels, upto)
        sim = pair_counting_similarity(hp.vertex_to_agg_numpy(), truth)
        rec = {
            "graph": spec, "max_agg_size": cap,
            "hierarchy_seconds": secs,
            "level_sizes": hier.level_sizes,
            "truth_level": [upto, hp.num_aggs],
            "Q_at_level": round(float(gt.modularity(g, hp)), 4),
            "similarity": {k: round(v, 4) if isinstance(v, float) else v
                           for k, v in sim.items()},
        }
        print(json.dumps(rec), flush=True)
        records.append(rec)

    with open(args.out, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
