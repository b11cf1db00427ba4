"""Multi-process halo pipeline wall-clock record (round-4 VERDICT item 8).

The two-process halo pipeline TEST (tests/test_aux.py) proves correctness
at toy size; this records the config-5 DCN story's best obtainable
evidence without multi-chip hardware: a committed metrics run at ~100k
vertices (rmat17, ~80k compacted / ~2M stored edges) across 2 real OS
processes x 4 virtual CPU devices, with per-phase seconds and the
analytic comm-model counters (HaloPlan.comm_floats_per_step vs the
replicated design's 2*n_pad*d) in one JSONL line.

Writes/updates dist_halo_record.jsonl at the repo root (committed).
Also runs the single-process 8-device arm for the wall-clock comparison.

  python -u scripts/dist_halo_record.py [scale]
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "_dist_halo_worker.py")
OUT = os.path.join(ROOT, "dist_halo_record.jsonl")


def main(argv):
    scale = argv[1] if len(argv) > 1 else "17"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PALLAS_AXON_POOL_IPS"] = ""     # CPU only; keep the TPU plugin out
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["DIST_HALO_SCALE"] = scale

    # arm 1: single process, 8 virtual devices (the baseline mesh shape)
    env1 = dict(env)
    env1["DIST_WORKER_DEVICES"] = "8"
    print("== single-process arm (1x8)", flush=True)
    rc = subprocess.run([sys.executable, "-u", WORKER, "0", "1", "0", OUT],
                        env=env1, cwd=ROOT, timeout=3000).returncode
    if rc != 0:
        print(f"single-process arm failed rc={rc}", flush=True)
        return rc

    # arm 2: two processes x 4 devices over a localhost coordinator
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        port = sock.getsockname()[1]
    print("== two-process arm (2x4)", flush=True)
    procs = [subprocess.Popen(
        [sys.executable, "-u", WORKER, str(pid), "2", str(port), OUT],
        env=env, cwd=ROOT) for pid in (0, 1)]
    rcs = [p.wait(timeout=3000) for p in procs]
    if any(rcs):
        print(f"two-process arm failed rcs={rcs}", flush=True)
        return 1
    print(f"records appended to {OUT}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
