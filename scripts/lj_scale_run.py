"""LiveJournal-scale end-to-end run on the real chip (BASELINE config 4).

com-lj is 4M vertices / 34.7M edges (~69M stored symmetric entries,
run-tests.cpp:399); its synthetic stand-in here is rmat(22, 8) -- hub-heavy
power-law at the same scale.  Pipeline = examples/embedder.cpp:140-295:
partition (native backend) -> Galerkin chain -> multilevel embed (tiled
refinement, sampled oversize buckets, host radii heap for hub grandparents)
-> NaN assert + stress.  Per-phase JSONL via MetricsLogger; wall-clock
closed by scalar readbacks.

The round-2 attempt died mid `refine level 0` when the round ended, so this
runner is STAGED and RESUMABLE: prep artifacts (graph, hierarchy, Galerkin
chain) are cached as .npz under ``.lj_cache/`` and the embed runs with a
CheckpointStore, so a re-run resumes after the last completed level instead
of paying the whole pipeline again.

  PYTHONPATH=. python scripts/lj_scale_run.py [stage] [scale] [ef]
  PYTHONPATH=. python scripts/lj_scale_run.py [stage] mesh <L>   # mesh3d(L)

``mesh 256`` is the delaunay_n24 stand-in (16.8M V / 50M E,
run-tests.cpp:397) -- the top of the reference's capability envelope.

stages:
  prep     generate rmat + partition + Galerkin, cache to disk
  refine0  diagnostic probe of the finest-level refinement only (sub-phase
           timings: host layout build, tile build, compile, warm per-iter)
  embed    full multilevel embed from the cache (checkpointed); prints the
           summary record
  all      prep (if not cached) + embed            [default]

The coarsest-level flat-FA budget uses the LIBRARY default
(embed.driver.default_base_iterations: min(100k, max(10k, 12n)) -- the
policy the round-3 n=1630 no-visible-change measurement justified); no
script-local caps (round-3 VERDICT item 5).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".lj_cache")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def cache_dir(scale, ef):
    tag = f"mesh3d_{ef}" if scale == "mesh" else f"rmat{scale}_{ef}"
    d = os.path.join(CACHE_ROOT, tag)
    os.makedirs(d, exist_ok=True)
    return d


def run_tag(scale, ef):
    return f"mesh3d_{ef}" if scale == "mesh" else f"rmat{scale}_{ef}"


def prep(scale, ef, rec):
    """Generate + partition + Galerkin; cache per-level COOs and v2a."""
    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.synth import cached as synth_cached

    d = cache_dir(scale, ef)
    done = os.path.join(d, "prep.json")
    if os.path.exists(done):
        with open(done) as f:
            rec.update(json.load(f))
        log(f"prep: cached ({rec['level_sizes']})")
        return
    t0 = time.perf_counter()
    if scale == "mesh":
        g = synth_cached("mesh3d", ef)
    else:
        # simple-graph weights (com-lj is unweighted): drop dedup counts.
        # The cached COO is canonical, so the unit rebuild is ONE
        # from_canonical_coo -- no sort, no intermediate Graph, weight
        # member never read (synth.cached_arrays load_weights=False).
        from graph_embed_tpu.graph.csr import from_canonical_coo
        from graph_embed_tpu.graph.synth import cached_arrays
        s, r, _, n = cached_arrays("rmat", scale, ef, seed=1,
                                   load_weights=False)
        g = from_canonical_coo(s, r, np.ones(s.size, np.float32), n)
    rec["gen_seconds"] = round(time.perf_counter() - t0, 1)
    rec["n"], rec["edges"] = g.n, g.num_edges
    log(f"graph: n={g.n} stored={g.num_edges} ({rec['gen_seconds']}s)")

    t0 = time.perf_counter()
    hier = gt.partition_hierarchy(g, 0.1, emit_graphs=True)
    rec["partition_seconds"] = round(time.perf_counter() - t0, 1)
    rec["level_sizes"] = hier.level_sizes
    rec["modularity"] = round(float(hier.modularity), 4)
    log(f"partition: {hier.level_sizes} Q={hier.modularity:.4f} "
        f"({rec['partition_seconds']}s)")

    t0 = time.perf_counter()
    graphs = ([g] + hier.coarse_graphs if hier.coarse_graphs is not None
              else gt.build_galerkin_chain(g, hier.levels))
    rec["galerkin_seconds"] = round(time.perf_counter() - t0, 1)
    rec["level_edges"] = [gg.num_edges for gg in graphs]
    log(f"galerkin: {rec['level_edges']} ({rec['galerkin_seconds']}s)")

    for l, gg in enumerate(graphs):
        ss, rr, ww = gg.to_coo_numpy()
        np.savez(os.path.join(d, f"graph{l}.npz"), s=ss, r=rr, w=ww, n=gg.n)
    np.savez(os.path.join(d, "parts.npz"),
             **{f"v2a{l}": p.vertex_to_agg_numpy()
                for l, p in enumerate(hier.levels)})
    with open(done, "w") as f:
        json.dump(rec, f)
    log("prep: cached to disk")


def load_cache(scale, ef):
    import graph_embed_tpu as gt
    from graph_embed_tpu.partition.interpolation import Partition

    d = cache_dir(scale, ef)
    with open(os.path.join(d, "prep.json")) as f:
        rec = json.load(f)
    graphs = []
    for l in range(len(rec["level_sizes"])):
        z = np.load(os.path.join(d, f"graph{l}.npz"))
        t0 = time.perf_counter()
        graphs.append(gt.from_edges(z["s"], z["r"], z["w"], n=int(z["n"]),
                                    symmetrize=False))
        log(f"load graph{l}: n={int(z['n'])} e={z['s'].size} "
            f"({time.perf_counter() - t0:.1f}s)")
    pz = np.load(os.path.join(d, "parts.npz"))
    parts = []
    for l in range(len(graphs) - 1):
        v2a = pz[f"v2a{l}"]
        parts.append(Partition.from_numpy(v2a, graphs[l + 1].n))
    return graphs, parts, rec


def probe_refine0(scale, ef):
    """Sub-phase timing of the finest-level refinement (the round-2 stall)."""
    import jax
    import jax.numpy as jnp

    from graph_embed_tpu.forceatlas.multilevel_tiled import (
        prepare_refine, refine_level_tiled)
    from graph_embed_tpu.utils.params import MultilevelFAParams

    graphs, parts, rec = load_cache(scale, ef)
    g, part = graphs[0], parts[0]
    m = part.num_aggs
    params = MultilevelFAParams()
    log(f"refine0 probe: n={g.n} e={g.num_edges} aggs={m}")

    t0 = time.perf_counter()
    layout = prepare_refine(g, part, params)
    log(f"prepare_refine: {time.perf_counter() - t0:.1f}s  "
        f"n_slots={layout.n_slots}")
    for (base, m_b, S, C, kind) in layout.bucket_meta:
        log(f"  bucket S={S:<7} m_b={m_b:<7} kind={kind} C={C}")

    # synthetic parent layout -- shapes identical to the real pipeline
    kk = jax.random.PRNGKey(0)
    coords_A = jax.random.uniform(kk, (m, 3), jnp.float32, -1.0, 1.0)
    r_A = jnp.full((m,), 0.05, jnp.float32)

    for iters in (2, 2, 10, 10):
        t0 = time.perf_counter()
        out = refine_level_tiled(g, part, coords_A, r_A, 3, iterations=iters,
                                 params=params, layout=layout)
        chk = float(jnp.sum(out))
        log(f"refine iters={iters}: {time.perf_counter() - t0:.1f}s "
            f"(chk={chk:.3e})")


def run_embed(scale, ef, rec):
    import jax.numpy as jnp

    import graph_embed_tpu as gt
    from graph_embed_tpu.embed.checkpoint import CheckpointStore
    from graph_embed_tpu.harness.runtests import layout_stress
    from graph_embed_tpu.utils.timing import MetricsLogger

    from graph_embed_tpu.embed.driver import default_base_iterations
    from graph_embed_tpu.utils.params import ForceAtlasParams

    graphs, parts, prep_rec = load_cache(scale, ef)
    rec.update(prep_rec)
    g = graphs[0]
    rec["base_iterations"] = default_base_iterations(graphs[-1].n,
                                                     ForceAtlasParams())

    # LJ_X_PRECISION=bf16 runs the whole pipeline on the v12b gather
    # layout (ForceAtlasParams.x_precision; base + refinement attraction)
    xprec = os.environ.get("LJ_X_PRECISION", "f32")
    kw = {}
    if xprec != "f32":
        from graph_embed_tpu.utils.params import MultilevelFAParams

        kw = dict(base_params=ForceAtlasParams(x_precision=xprec),
                  refine_params=MultilevelFAParams(x_precision=xprec))
        rec["x_precision"] = xprec
    ck = "ckpt" if xprec == "f32" else f"ckpt_{xprec}"
    store = CheckpointStore(os.path.join(cache_dir(scale, ef), ck))
    metrics = MetricsLogger(f"lj_scale_{run_tag(scale, ef)}.metrics.jsonl")
    t0 = time.perf_counter()
    coords = gt.embed(graphs, parts, 3, metrics=metrics, store=store, **kw)
    coords_np = np.asarray(coords)
    rec["embed_seconds"] = round(time.perf_counter() - t0, 1)
    metrics.close()

    assert np.isfinite(coords_np).all(), "non-finite coords"
    rec["coords_finite"] = True
    t0 = time.perf_counter()
    rec["stress"] = round(layout_stress(g, coords_np), 4)
    rec["stress_seconds"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(rec), flush=True)


def main(argv):
    stage = argv[1] if len(argv) > 1 else "all"
    raw = argv[2] if len(argv) > 2 else "22"
    scale = "mesh" if raw == "mesh" else int(raw)
    ef = int(argv[3]) if len(argv) > 3 else 8
    name = f"mesh3d({ef})" if scale == "mesh" else f"rmat({scale},{ef})"
    rec = {"workload": name}
    if stage == "prep" and os.environ.get("JAX_PLATFORMS") != "cpu":
        # prep is pure host work (generation, native partition, host
        # Galerkin, npz caching) but graph construction device_puts edge
        # arrays -- through the remote tunnel that shipped ~GBs for nothing
        # (round-3 rmat23 prep 607s vs embed 432s).  Pin the CPU backend
        # UNCONDITIONALLY: the harness shell exports JAX_PLATFORMS=axon, so
        # a presence check never fires -- and if the axon register() ever
        # fails (swallowed by sitecustomize), the first jnp.asarray dies
        # with "Backend 'axon' is not in the list of known backends".
        os.environ["JAX_PLATFORMS"] = "cpu"
    if stage == "all" and not os.path.exists(
            os.path.join(cache_dir(scale, ef), "prep.json")):
        # run prep in a subprocess whose own prep branch pins the CPU
        # backend IN-PROCESS (a JAX_PLATFORMS shell env var would route CPU
        # compiles through the remote service -- the ROADMAP gotcha), then
        # embed on the TPU in this process
        import subprocess
        rc = subprocess.call([sys.executable, os.path.abspath(__file__),
                              "prep", str(raw), str(ef)])
        if rc != 0:
            return rc
    if stage in ("prep", "all"):
        prep(scale, ef, rec)
    if stage == "refine0":
        probe_refine0(scale, ef)
    if stage in ("embed", "all"):
        run_embed(scale, ef, rec)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
