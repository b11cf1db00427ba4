"""Worker for scripts/dist_halo_record.py: one jax.distributed process of
the multi-process halo pipeline record (round-4 VERDICT item 8).

  python scripts/_dist_halo_worker.py <pid> <nprocs> <port> <out.jsonl>
"""
import json
import os
import sys
import time


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    ndev_local = int(os.environ.get("DIST_WORKER_DEVICES", "4"))
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={ndev_local}")

    import jax

    t_boot = time.perf_counter()
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs, process_id=pid)
    boot_s = time.perf_counter() - t_boot

    import numpy as np
    import jax.numpy as jnp

    import graph_embed_tpu as gt
    from graph_embed_tpu.graph.reorder import apply_order, partition_order
    from graph_embed_tpu.graph.synth import rmat
    from graph_embed_tpu.parallel.halo import build_halo_plan
    from graph_embed_tpu.parallel.multihost import global_mesh
    from graph_embed_tpu.utils.timing import MetricsLogger

    scale = int(os.environ.get("DIST_HALO_SCALE", "17"))
    t0 = time.perf_counter()
    g = rmat(scale, 8, seed=1, dtype=jnp.float32)
    gen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = gt.partition_hierarchy(g, 0.1)
    part_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    graphs = gt.build_galerkin_chain(g, res.levels)
    gal_s = time.perf_counter() - t0

    mesh = global_mesh()
    ndev = mesh.devices.size
    # the analytic comm model on the partition-ordered base level (the
    # plan the halo base case will build): boundary pool vs replicated
    perm = partition_order(g, levels=res.levels)
    g_ord, _ = apply_order(g, perm)
    plan = build_halo_plan(g_ord, ndev)
    dim, samp = 3, 64
    comm = {"ndev": ndev, "B_max": plan.B_max,
            "boundary_fraction": round(plan.boundary_fraction, 4),
            "halo_floats_per_step": plan.comm_floats_per_step(dim, samp),
            "replicated_floats_per_step": 2 * ndev * plan.blk * dim}

    metrics_path = out_path + f".metrics.p{pid}.jsonl" if pid == 0 else None
    logger = MetricsLogger(metrics_path) if metrics_path else None
    t0 = time.perf_counter()
    coords = gt.embed(graphs, res.levels, dim, key=jax.random.PRNGKey(5),
                      base_iterations=200, refine_iterations=20,
                      mesh=mesh, mesh_min_n=64, sharding="halo",
                      metrics=logger)
    if hasattr(coords, "addressable_data"):
        out = np.asarray(coords.addressable_data(0))
    else:
        out = np.asarray(coords)
    embed_s = time.perf_counter() - t0
    assert np.isfinite(out).all()
    if logger:
        logger.close()

    if pid == 0:
        rec = {"workload": f"rmat({scale},8) 2-process halo pipeline",
               "nprocs": nprocs, "ndev_local": ndev_local,
               "n": g.n, "edges": g.num_edges,
               "levels": len(res.levels) + 1,
               "boot_seconds": round(boot_s, 1),
               "gen_seconds": round(gen_s, 1),
               "partition_seconds": round(part_s, 1),
               "galerkin_seconds": round(gal_s, 1),
               "embed_seconds": round(embed_s, 1),
               "comm_model": comm,
               "coords_checksum": float(np.abs(out).sum())}
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
