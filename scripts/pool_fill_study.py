"""Host fill study for the LJ-scale (rmat22) scattered gap (round-4 VERDICT
missing #1): can an edge layout ride SMALLER windows at EQUAL fill at n>=2M?

Pure numpy over the cached rmat22 edge arrays (scripts/lj_scale_run.py prep).
Measures slab counts for:

  1. baseline orderings x window shapes (partition order = the round-4
     status quo: fill 0.26 @ 4096^2 / 0.685 @ 8192^2);
  2. hub-split relabeling: top-H receivers by weighted degree get ids
     [0, H) (every sender block's hub edges then share DENSE windows over
     the prefix -- no gather needed), tail keeps partition order;
  3. per-sender-block receiver POOLING: each block's distinct receivers
     are compacted to a dense per-block pool, windows ride the pool (the
     halo [blk|pool] index-space trick applied single-device).  Reports
     the total pool size = per-iteration gather volume the design buys.

Cost model for reading the table (ROADMAP "kernel facts" + round-4 ledger):
per-slab VPU cost ~ a + b*G with G = window/128 (8192-window slabs cost
~1.9x 4096-window slabs), so 'wcost' = slabs * (0.08 + 0.0163 * G) in
~us-equivalents is the comparable figure, NOT raw fill.

  env PALLAS_AXON_POOL_IPS= python scripts/pool_fill_study.py [scale] [ef]
"""
from __future__ import annotations

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def slab_count(s, r, B, W, T, nblocks_hint=None):
    """Number of [T]-edge slabs for cells (s//B, r//W) -> (slabs, cells)."""
    nw = int(r.max() // W) + 1
    key = (s // B).astype(np.int64) * nw + (r // W).astype(np.int64)
    counts = np.bincount(key)
    counts = counts[counts > 0]
    slabs = int(np.sum(-(-counts // T)))
    return slabs, counts.size


def pooled_slabs(s, r, B, W, T):
    """Per-sender-block receiver pooling: block b's distinct receivers are
    ranked 0..P_b-1 (sorted by global id); windows cover the rank space.
    Returns (slabs, cells, total_pool, max_pool)."""
    blk = (s // B).astype(np.int64)
    order = np.lexsort((r, blk))
    bs, rs = blk[order], r[order].astype(np.int64)
    # new-distinct flags within each block run
    first = np.ones(rs.size, bool)
    same_blk = bs[1:] == bs[:-1]
    first[1:] = (~same_blk) | (rs[1:] != rs[:-1])
    # per-block pool rank = inclusive scan of `first` minus block base
    csum = np.cumsum(first)
    block_start = np.zeros(rs.size, np.int64)
    starts = np.flatnonzero(np.concatenate([[True], ~same_blk]))
    base = (csum[starts] - first[starts]).astype(np.int64)
    block_start[starts] = base
    block_start = np.maximum.accumulate(block_start)
    rank = csum - 1 - block_start
    # pool size per block = last rank + 1 per run
    ends = np.concatenate([starts[1:], [rs.size]]) - 1
    pool_per_block = rank[ends] + 1
    nw = int(rank.max() // W) + 1
    key = bs * nw + rank // W
    counts = np.bincount(key)
    counts = counts[counts > 0]
    slabs = int(np.sum(-(-counts // T)))
    return slabs, counts.size, int(pool_per_block.sum()), int(pool_per_block.max())


def runchop_slabs(s, r, B, W, T):
    """Gather-free anchored-window layout: per sender block, edges sorted
    by receiver are chopped greedily into slabs of <= T edges whose
    receiver span fits an (arbitrary 128-aligned) W-wide window.  Each
    slab's x window is a manual DMA from HBM at its own anchor -- no pool
    gather exists.  Returns (slabs, anchors=slabs)."""
    blk = (s // B).astype(np.int64)
    order = np.lexsort((r, blk))
    bs, rs = blk[order], r[order].astype(np.int64)
    anchor = (rs // 128) * 128
    # greedy chop: new slab when (a) block changes, (b) span > W, or (c)
    # T edges consumed.  Vectorized two-pass: first cut at block changes
    # and span overflow relative to a running anchor -- needs a scan; do
    # it with a python loop over BLOCK RUNS but numpy inside.
    slabs = 0
    starts = np.flatnonzero(np.concatenate([[True], bs[1:] != bs[:-1]]))
    ends = np.concatenate([starts[1:], [rs.size]])
    for a, b in zip(starts, ends):
        rr = rs[a:b]
        anc = anchor[a:b]
        i = 0
        m = rr.size
        while i < m:
            # furthest j with rr[j] < anc[i] + W
            j = np.searchsorted(rr, anc[i] + W, side="left")
            j = min(j, i + T)
            slabs += 1
            i = j
    return slabs


def region_pool(s, r, R, B, W, T, gather_shapes=((8192, 8192),
                                                 (8192, 16384))):
    """Region-pooled layout: sender blocks grouped into regions of R
    senders; each region's distinct receivers are compacted to ranks
    (ONE gather per region per iteration, itself a windowed SpMV over the
    staircase selection matrix); main-SpMV windows ride the rank space.
    Reports main slabs + the gather's own slab count."""
    reg = (s // R).astype(np.int64)
    order = np.lexsort((r, reg))
    rg, rs, ss = reg[order], r[order].astype(np.int64), s[order]
    same = rg[1:] == rg[:-1]
    first = np.ones(rs.size, bool)
    first[1:] = (~same) | (rs[1:] != rs[:-1])
    csum = np.cumsum(first)
    starts = np.flatnonzero(np.concatenate([[True], ~same]))
    base = (csum[starts] - 1).astype(np.int64)
    block_start = np.zeros(rs.size, np.int64)
    block_start[starts] = base
    block_start = np.maximum.accumulate(block_start)
    rank = csum - 1 - block_start            # region-local pool rank
    ends = np.concatenate([starts[1:], [rs.size]]) - 1
    pool_per_region = rank[ends] + 1
    # main SpMV cells: (sender block, region-local rank window)
    nw = int(rank.max() // W) + 1
    key = (ss // B).astype(np.int64) * nw + rank // W
    counts = np.bincount(key)
    counts = counts[counts > 0]
    slabs = int(np.sum(-(-counts // T)))
    # gather SpMV: slot = global pool position, receiver = vertex id
    sel = np.flatnonzero(first)
    reg_of_slot = rg[sel]
    rank_of_slot = rank[sel]
    reg_base = np.zeros(int(rg.max()) + 2, np.int64)
    reg_base[1:] = np.cumsum(np.bincount(
        reg_of_slot, minlength=int(rg.max()) + 1))
    slot = reg_base[reg_of_slot] + rank_of_slot
    vert = rs[sel]
    gslabs = {}
    for GB, GW in gather_shapes:
        gs, _ = slab_count(slot, vert, GB, GW, T)
        gslabs[(GB, GW)] = gs
    return slabs, int(pool_per_region.sum()), int(pool_per_region.max()), \
        gslabs


def wcost(slabs, W):
    g = W // 128
    return slabs * (0.08 + 0.0163 * g) * 1e-6  # ~seconds-equivalent


def report(tag, s, r, E, shapes, T=1024, pooled=False):
    for B, W in shapes:
        t0 = time.perf_counter()
        if pooled:
            slabs, cells, tot_pool, max_pool = pooled_slabs(s, r, B, W, T)
            extra = f" pool_total={tot_pool/1e6:.1f}M pool_max={max_pool}"
        else:
            slabs, cells = slab_count(s, r, B, W, T)
            extra = ""
        fill = E / (slabs * T)
        print(f"{tag:34s} B={B:5d} W={W:5d}: slabs={slabs:7d} "
              f"fill={fill:.3f} wcost={wcost(slabs, W)*1e3:7.1f}ms{extra} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from lj_scale_run import load_cache

    from graph_embed_tpu.graph.reorder import partition_order

    graphs, parts, _ = load_cache(scale, ef)
    g = graphs[0]
    perm = partition_order(g, levels=parts)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    s0, r0, w0 = g.to_coo_numpy()
    deg = np.bincount(s0, weights=w0, minlength=g.n)
    E = s0.size
    print(f"# rmat({scale},{ef}) n={g.n} E={E}", flush=True)

    s_p, r_p = inv[s0], inv[r0]          # partition order (status quo)

    if len(sys.argv) > 3 and sys.argv[3] == "shapes":
        # direct-layout grid: the on-chip pooled A/B measured per-slab cost
        # is SENDER-BLOCK-driven (scatter join), ~flat in window size --
        # so skinny blocks x tall windows may beat both the 8192^2 status
        # quo and pooling.  Report slabs AND cells (cells ~ window-DMA
        # count: consecutive same-cell slabs reuse the fetched window).
        for B in (1024, 2048, 4096):
            for W in (8192, 16384, 32768, 65536):
                t0 = time.perf_counter()
                nw = int(r_p.max() // W) + 1
                key = (s_p // B).astype(np.int64) * nw + (r_p // W)
                counts = np.bincount(key)
                counts = counts[counts > 0]
                slabs = int(np.sum(-(-counts // 1024)))
                cells = int(counts.size)
                fill = E / (slabs * 1024)
                dma_gb = cells * 16 * W / 1e9
                print(f"shapes B={B:5d} W={W:6d}: slabs={slabs:7d} "
                      f"cells={cells:7d} fill={fill:.3f} "
                      f"dma={dma_gb:5.1f}GB "
                      f"({time.perf_counter()-t0:.1f}s)", flush=True)
        return

    if len(sys.argv) > 3 and sys.argv[3] == "regionpool":
        for R in (65536, 131072, 262144, 524288):
            for W in (1024, 2048, 4096):
                t0 = time.perf_counter()
                slabs, ptot, pmax, gsl = region_pool(s_p, r_p, R, 8192, W,
                                                     1024)
                fill = E / (slabs * 1024)
                gtxt = " ".join(
                    f"g{GB}x{GW}={gs}({wcost(gs, GW)*1e3:.1f}ms)"
                    for (GB, GW), gs in gsl.items())
                print(f"regionpool R={R:6d} W={W:5d}: slabs={slabs:7d} "
                      f"fill={fill:.3f} wcost={wcost(slabs, W)*1e3:7.1f}ms "
                      f"pool_total={ptot/1e6:.1f}M pool_max={pmax} {gtxt} "
                      f"({time.perf_counter()-t0:.1f}s)", flush=True)
        return

    if len(sys.argv) > 3 and sys.argv[3] == "runchop":
        for B in (4096, 8192):
            for W in (512, 1024, 2048, 4096):
                t0 = time.perf_counter()
                slabs = runchop_slabs(s_p, r_p, B, W, 1024)
                fill = E / (slabs * 1024)
                print(f"runchop(partition) B={B:5d} W={W:5d}: "
                      f"slabs={slabs:7d} fill={fill:.3f} "
                      f"wcost={wcost(slabs, W)*1e3:7.1f}ms "
                      f"({time.perf_counter()-t0:.1f}s)", flush=True)
        return

    shapes_base = [(4096, 4096), (8192, 8192), (4096, 8192), (8192, 16384)]
    report("partition(baseline)", s_p, r_p, E, shapes_base)

    # degree sort (hubs first globally)
    od = np.argsort(-deg, kind="stable")
    invd = np.empty_like(od); invd[od] = np.arange(od.size)
    report("degree-sort", invd[s0], invd[r0], E, shapes_base)

    # hub-split: top-H receivers first (degree-desc), tail in partition order
    for H in (8192, 32768, 131072):
        hubs = od[:H]
        is_hub = np.zeros(g.n, bool); is_hub[hubs] = True
        tail_old = perm[~is_hub[perm]]            # partition order, hubs removed
        new_order = np.concatenate([hubs, tail_old])
        invh = np.empty_like(new_order); invh[new_order] = np.arange(g.n)
        report(f"hub-split H={H}", invh[s0], invh[r0], E,
               [(4096, 4096), (8192, 8192), (4096, 8192)])

    # per-block pooled (on the partition order), small windows
    shapes_pool = [(8192, 1024), (8192, 2048), (8192, 4096),
                   (4096, 1024), (4096, 2048), (16384, 2048), (16384, 4096)]
    report("pooled(partition)", s_p, r_p, E, shapes_pool, pooled=True)


if __name__ == "__main__":
    main()
