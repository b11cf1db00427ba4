"""Native-greedy vs device-hierarchy partition quality at EMBEDDED scale
(round-3 VERDICT item 6: the quality roster topped out at 1M vertices while
the scale runs embed 2-17M; this closes the loop at the sizes actually
embedded).

For each lj_scale prep cache given (e.g. ``22 8``, ``23 8``, ``mesh 256``):
  * per-level modularity of the CACHED mutual-best hierarchy (host
    bincount math, no device traffic);
  * the native one-sided greedy (partitionBase semantics,
    run-tests.cpp:199 role) on the fine graph, same stall threshold the
    reference harness uses (0.999), with wall-clock and Q.

Usage: PYTHONPATH=. python scripts/quality_ab.py 22 8 [23 8] [mesh 256]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lj_scale_run import cache_dir, log  # noqa: E402


def q_host(s, r, w, v2a, m):
    """Modularity (src/partitioner.cpp:69-114 math, no int truncation)."""
    a, b = v2a[s], v2a[r]
    T = w.sum()
    intra = a == b
    d = np.bincount(a[intra], w[intra], minlength=m)
    out = np.bincount(a[~intra], w[~intra], minlength=m)
    alpha = (d + out) / T
    return float((d / T).sum() - (alpha ** 2).sum())


def run_one(scale, ef):
    d = cache_dir(scale, ef)
    with open(os.path.join(d, "prep.json")) as f:
        rec = json.load(f)
    z = np.load(os.path.join(d, "graph0.npz"))
    s, r, w = z["s"], z["r"], np.asarray(z["w"], np.float64)
    n = int(z["n"])
    pz = np.load(os.path.join(d, "parts.npz"))
    nlev = len(rec["level_sizes"]) - 1
    out = {"workload": rec["workload"], "n": n, "edges": int(s.size),
           "hierarchy_q_per_level": [], "partition_seconds":
           rec.get("partition_seconds")}
    comp = None
    for l in range(nlev):
        v2a = pz[f"v2a{l}"]
        comp = v2a if comp is None else v2a[comp]
        m = int(comp.max()) + 1
        q = q_host(s, r, w, comp, m)
        out["hierarchy_q_per_level"].append(
            {"level": l + 1, "aggs": m, "q": round(q, 4)})
        log(f"{rec['workload']} hierarchy level {l+1}: m={m} Q={q:.4f}")

    from graph_embed_tpu.native import greedy_lib

    t0 = time.perf_counter()
    assign, m_g, q_native = greedy_lib.greedy_run(
        n, s, r, np.asarray(z["w"], np.float32),
        stall_stop_threshold=0.999, variant="base")
    out["greedy_seconds"] = round(time.perf_counter() - t0, 1)
    out["greedy_aggs"] = int(m_g)
    out["greedy_q"] = round(q_host(s, r, w, assign, int(m_g)), 4)
    log(f"{rec['workload']} native greedy: m={m_g} Q={out['greedy_q']:.4f} "
        f"({out['greedy_seconds']}s)")
    print(json.dumps(out), flush=True)


def main(argv):
    args = argv[1:] or ["22", "8"]
    for i in range(0, len(args), 2):
        scale = args[i] if args[i] == "mesh" else int(args[i])
        run_one(scale, int(args[i + 1]))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
