"""Quality roster at scale (VERDICT round-1 item #3).

Runs the run-tests-style quality suite on 100k-1M+-vertex synthetic
stand-ins of the reference roster families (run-tests.cpp:361-400:
roadNet/delaunay meshes, com-lj/com-youtube power-law, email-Eu-core
ground-truth communities) and records, per graph:

  * partition_base (greedy, the reference's benchmark variant) wall-clock
    + modularity, vs partition_test (mutual) -- the A/B of
    run-tests.cpp:285-300;
  * modularity vs networkx Louvain (the comparison-oracle row of
    run-tests.cpp:204-227) where Louvain is tractable (`--louvain-max-n`);
  * ground-truth pair-counting similarity for planted-partition graphs;
  * the full hierarchy's per-level aggregate counts
    (partitioner.cpp:1880-1889 prints these);
  * multilevel-embed wall-clock + layout stress (embedder.cpp:219-222 role)
    when --embed is given (needs the TPU chip or patience on CPU).

Writes one JSON line per roster entry to stdout and (with -o) a JSONL file
so rounds can diff results.  Typical invocation (from the repo root):

  PYTHONPATH=.:$PYTHONPATH python scripts/quality_roster.py --embed \
      -o bench_quality.jsonl
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


# (spec, do_embed_default) -- families + sizes mirroring run-tests.cpp:361-400
ROSTER = [
    # email-Eu-core role (ground truth), scaled to 100k and 1M
    "synth:planted:200:500:0.05:0.0001",        # 100k V, ~2.4M intra + inter
    "synth:planted:1000:1000:0.012:0.000002",   # 1M V, ~6M intra + ~1M inter
    # com-youtube / com-lj role (power-law)
    "synth:rmat:17:16",                          # ~128k V, ~2M stored
    "synth:rmat:20:8",                           # ~1M V, ~8M stored
    # roadNet / delaunay / mat_* role (mesh)
    "synth:mesh3d:48",                           # 110k V, 650k stored
    "synth:mesh3d:100",                          # 1M V, 6M stored
]


def run_entry(spec, *, louvain_max_n, do_embed, embed_max_n, out_records):
    import graph_embed_tpu as gt
    from graph_embed_tpu.harness.runtests import (
        _load_roster_graph, louvain_networkx, pair_counting_similarity,
        layout_stress)

    g, truth = _load_roster_graph(spec, "coolist")
    rec = {"graph": spec, "n": g.n, "edges": g.num_edges}
    print(f"== {spec}: n={g.n} stored={g.num_edges}", file=sys.stderr,
          flush=True)

    # +-0.1% random vertex reweighting (run-tests.cpp:162-181): synthetic
    # families are uniform-weight, and the one-sided greedy degenerates on
    # exact eta ties (best-neighbor points at the smallest index, the i<j
    # commit gate then rejects nearly every pair -- reference behavior; its
    # harness ships this reweighting as the documented workaround)
    rng = np.random.default_rng(0)
    s, r, w = g.to_coo_numpy()
    vw = rng.uniform(1 - 0.001, 1 + 0.001, size=g.n)
    g = gt.from_edges(s, r, w * vw[s] * vw[r], n=g.n, symmetrize=False,
                      dtype=g.dtype)
    rec["randomized"] = True

    # greedy benchmark variant (partitionBase role, run-tests.cpp:199)
    t0 = time.perf_counter()
    part = gt.partition_base(g, 0.999)
    rec["partition_seconds"] = round(time.perf_counter() - t0, 3)
    rec["aggregates"] = part.num_aggs
    rec["modularity"] = round(float(gt.modularity(g, part)), 4)

    # mutual-best variant (partitionTest role; the A/B of :285-300)
    t0 = time.perf_counter()
    part2 = gt.partition_test(g, 0.999)
    rec["variant_seconds"] = round(time.perf_counter() - t0, 3)
    rec["variant_modularity"] = round(float(gt.modularity(g, part2)), 4)

    # Louvain oracle where tractable (nx is pure python: O(minutes) at 100k)
    if g.n <= louvain_max_n:
        t0 = time.perf_counter()
        nx_assign = louvain_networkx(g)
        rec["louvain_seconds"] = round(time.perf_counter() - t0, 1)
        lp = gt.partition_from_labels(nx_assign)
        rec["louvain_modularity"] = round(float(gt.modularity(g, lp)), 4)

    if truth is not None:
        truth = np.asarray(truth)
        rec["ground_truth_similarity"] = {
            k: round(v, 4) if isinstance(v, float) else v
            for k, v in pair_counting_similarity(
                part.vertex_to_agg_numpy(), truth).items()}

    # full hierarchy: per-level aggregate counts + per-level modularity
    t0 = time.perf_counter()
    hier = gt.partition_hierarchy(g, 0.1)
    rec["hierarchy_seconds"] = round(time.perf_counter() - t0, 3)
    rec["level_sizes"] = hier.level_sizes
    rec["level_modularity"] = [
        round(float(gt.modularity(g, gt.compose(hier.levels, upto))), 4)
        for upto in range(1, len(hier.levels) + 1)]

    if truth is not None:
        # the hierarchy level whose aggregate count is nearest the true
        # community count (the greedy single-level stalls early at scale --
        # faithful reference behavior -- so the hierarchy is the meaningful
        # recovery comparison)
        k_true = int(np.unique(truth).size)
        upto = min(range(1, len(hier.levels) + 1),
                   key=lambda u: abs(np.log(hier.levels[u - 1].num_aggs
                                            / k_true)))
        hp = gt.compose(hier.levels, upto)
        rec["hierarchy_truth_level"] = [upto, hp.num_aggs]
        rec["hierarchy_truth_similarity"] = {
            k: round(v, 4) if isinstance(v, float) else v
            for k, v in pair_counting_similarity(
                hp.vertex_to_agg_numpy(), np.asarray(truth)).items()}

    if do_embed and g.n <= embed_max_n:
        t0 = time.perf_counter()
        graphs = gt.build_galerkin_chain(g, hier.levels)
        rec["galerkin_seconds"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        coords = gt.embed(graphs, hier.levels, 3)
        coords_np = np.asarray(coords)
        rec["embed_seconds"] = round(time.perf_counter() - t0, 1)
        assert np.isfinite(coords_np).all(), "non-finite coords"
        rec["stress"] = round(layout_stress(g, coords_np), 4)

    print(json.dumps(rec), flush=True)
    out_records.append(rec)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--louvain-max-n", type=int, default=150_000)
    ap.add_argument("--embed", action="store_true")
    ap.add_argument("--embed-max-n", type=int, default=1_100_000)
    ap.add_argument("--only", default=None,
                    help="substring filter over roster specs")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in-process (the safe way; "
                    "a JAX_PLATFORMS=cpu SHELL var routes CPU compiles "
                    "through the remote compile service -- see "
                    ".claude/skills/verify/SKILL.md)")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"

    records = []
    for spec in ROSTER:
        if args.only and args.only not in spec:
            continue
        try:
            run_entry(spec, louvain_max_n=args.louvain_max_n,
                      do_embed=args.embed, embed_max_n=args.embed_max_n,
                      out_records=records)
        except Exception as e:  # keep the roster going; record the failure
            print(json.dumps({"graph": spec, "error": repr(e)}), flush=True)
            records.append({"graph": spec, "error": repr(e)})
    if args.out:
        with open(args.out, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
