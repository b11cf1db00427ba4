"""Host-side sweep: window-tile fill vs vertex ordering on the bench mesh.

ROADMAP 3b closed the SpMV *shape* sweep at 1024/2048/T1024 and identified
fill (vertex ordering) as the remaining lever.  This measures fill + slab
count for several orderings, pure numpy -- no TPU needed.

  JAX_PLATFORMS=cpu python scripts/fill_sweep.py [L]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def morton_order(coords_int: np.ndarray, bits: int) -> np.ndarray:
    """perm[new] = old by interleaved-bit (Z-curve) key of integer coords."""
    key = np.zeros(coords_int.shape[0], dtype=np.int64)
    ndim = coords_int.shape[1]
    for b in range(bits):
        for d in range(ndim):
            key |= ((coords_int[:, d].astype(np.int64) >> b) & 1) << (
                b * ndim + d)
    return np.argsort(key, kind="stable")


def block_order(coords_int: np.ndarray, box: tuple) -> np.ndarray:
    """perm[new] = old sorting by box id (row-major boxes), then row-major
    within the box -- contiguous rectangular boxes of size prod(box)."""
    nd = coords_int.shape[1]
    key_box = np.zeros(coords_int.shape[0], dtype=np.int64)
    key_in = np.zeros_like(key_box)
    mul_b, mul_i = 1, 1
    for d in range(nd):
        c = coords_int[:, d].astype(np.int64)
        key_box += (c // box[d]) * mul_b
        key_in += (c % box[d]) * mul_i
        mul_b *= 1 + int(c.max()) // box[d]
        mul_i *= box[d]
    return np.lexsort((key_in, key_box))


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from graph_embed_tpu.graph.synth import mesh3d
    from graph_embed_tpu.graph.reorder import apply_order, rcm_order
    from graph_embed_tpu.ops.pallas.edge_spmm import build_window_tiles

    g = mesh3d(L)
    idx = np.arange(L ** 3)
    ci = np.stack([idx % L, (idx // L) % L, idx // (L * L)], axis=1)

    orders = {
        "natural": None,
        "morton": morton_order(ci, bits=int(np.log2(L))),
        # boxes sized to one sender block (1024 vertices each)
        "box_16x16x4": block_order(ci, (16, 16, 4)),
        "box_32x32x1": block_order(ci, (32, 32, 1)),
        "box_16x8x8": block_order(ci, (16, 8, 8)),
        # boxes sized to one receiver window (2048)
        "box_16x16x8": block_order(ci, (16, 16, 8)),
        "box_32x8x8": block_order(ci, (32, 8, 8)),
    }
    try:
        t0 = time.perf_counter()
        orders["rcm"] = rcm_order(g)
        print(f"# rcm built in {time.perf_counter() - t0:.1f}s", flush=True)
    except Exception as e:  # scipy may choke at this scale
        print(f"# rcm skipped: {e}", flush=True)

    for sb, win, T in ((1024, 2048, 1024), (1024, 1024, 1024)):
        print(f"== sender_block={sb} window={win} tile={T}")
        for name, perm in orders.items():
            gg = g if perm is None else apply_order(g, perm)[0]
            t0 = time.perf_counter()
            tiles = build_window_tiles(gg, tile=T, sender_block=sb,
                                       window=win, packing="unit")
            dt = time.perf_counter() - t0
            print(f"  {name:14s} slabs={tiles.num_tiles:7d} "
                  f"fill={tiles.fill:.3f} chunks={len(tiles.chunks)} "
                  f"({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
