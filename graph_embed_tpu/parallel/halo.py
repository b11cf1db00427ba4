"""Boundary-aware flat FA sharding: vertex-partitioned coords + halo exchange.

The baseline multi-chip step (parallel/sharded.py) keeps coordinates
REPLICATED and all_gathers the full [n_pad, d] block every iteration -- fine
at mesh scale, but at the 100M-vertex / 1e9-edge target (BASELINE configs
4/5) the per-step all_gather payload and the replicated-coords HBM footprint
become the ceiling (round-1 VERDICT gap #2).  This module is the
boundary-aware design from SURVEY.md SS2.2 row 3 / SS5 (long-context row):

* vertices are partitioned into contiguous blocks (one per device) -- run a
  locality ordering first (graph.reorder.partition_order) so communities are
  contiguous and the cut is small;
* every edge lives on its SENDER's device, so attraction accumulates locally
  (the symmetric adjacency stores both directions -- each device computes
  exactly the forces on its own vertices);
* per step each device all_gathers only its BOUNDARY vertices (those any
  remote edge receives from): comm = ndev * B_max * d floats instead of
  n_pad * d, and per-device HBM holds blk + ndev*B_max coords instead of
  n_pad;
* sampled repulsion draws samples from each device's own block and
  all_gathers the tiny [samples, d] sample set (+ degrees) -- an unbiased
  global estimator with O(samples) comm, stratified by block;
* gravity / swing / speed run on the local block; no force exchange exists
  at all (senders own their forces).

Per-step comm model (floats):
  replicated design:  2 * n_pad * d            (all_gather + psum_scatter)
  halo design:        ndev * B_max * d  +  samples * (d + 1)
For a partition-ordered graph B is the vertex boundary of the cut, typically
a few percent of n: the bench mesh at 8 blocks has B_max/n ~ 1.5%, RMAT ~ 20%
(hubs touch everything; see BENCHMARKS.md "Boundary-aware sharding").

Overlapping the halo exchange with local attraction via Pallas
``make_async_remote_copy`` double-buffering is the planned next step on real
multi-chip hardware; on a single remote-attached chip it cannot be measured,
so this module keeps the collective explicit (correctness first).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..forceatlas import forces as F
from ..graph.csr import Graph
from ..utils.params import ForceAtlasParams
from .mesh import EDGE_AXIS, round_up


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Host-built static exchange plan.

    Per-device arrays are stacked on axis 0 (sharded with P('x')).
    Receiver indices address the concatenation [local block | boundary pool]
    where the pool is the all_gathered [ndev * B_max, d] boundary coords.
    """

    ndev: int
    n: int
    blk: int                   # vertices per device (padded)
    B_max: int                 # boundary slots per device (padded, >= 1)
    e_max: int                 # edges per device (padded)
    senders_loc: np.ndarray    # [ndev, e_max] local sender index (pad blk)
    recv_idx: np.ndarray       # [ndev, e_max] index into [blk | pool]
    weights: np.ndarray        # [ndev, e_max] (pad 0)
    boundary_idx: np.ndarray   # [ndev, B_max] local idx of exported vertices
    boundary_counts: np.ndarray  # [ndev] real exported count per device
    deg: np.ndarray            # [ndev, blk]
    n_real: np.ndarray         # [ndev, 1] real vertex count per device

    @property
    def boundary_fraction(self) -> float:
        """Exported-vertex fraction of n (the comm-model B/n)."""
        return float(self.boundary_counts.sum()) / max(self.n, 1)

    def comm_floats_per_step(self, dim: int, num_samples: int) -> int:
        """Interconnect floats per step (gathered boundary + sample set:
        coords + degree + row id + stratum weight per sample) -- compare
        against the replicated design's 2 * n_pad * dim."""
        return (self.ndev * self.B_max * dim
                + num_samples * (dim + 3))


def build_halo_plan(g: Graph, ndev: int, *, block_multiple: int = 8,
                    edge_multiple: int = 8,
                    boundary_multiple: int | None = None) -> HaloPlan:
    """Partition vertices into ``ndev`` contiguous blocks and build the
    static halo-exchange plan.  Reorder the graph first (partition_order /
    rcm_order) -- the plan's boundary size IS the cut of this ordering.
    ``boundary_multiple`` rounds B_max separately (the ring-overlap kernel
    needs 128; the default collective path is happy with 8)."""
    s, r, w = g.to_coo_numpy()
    n = g.n
    blk = round_up(max(-(-n // ndev), 1), block_multiple)
    dev_of = np.minimum(np.arange(n) // blk, ndev - 1)

    e_dev = np.minimum(s // blk, ndev - 1)
    r_dev = np.minimum(r // blk, ndev - 1)

    # boundary of device e: owned vertices some OTHER device receives from
    cross = e_dev != r_dev
    bnd_ids = [np.unique(r[cross & (r_dev == e)]) for e in range(ndev)]
    B_max = max(max((b.size for b in bnd_ids), default=0), 1)
    B_max = round_up(B_max, boundary_multiple or block_multiple)
    boundary_idx = np.zeros((ndev, B_max), np.int32)   # pad with slot 0
    pool_pos = np.full(n, -1, np.int64)                # vertex -> pool slot
    for e in range(ndev):
        ids = bnd_ids[e]
        boundary_idx[e, : ids.size] = (ids - e * blk).astype(np.int32)
        pool_pos[ids] = e * B_max + np.arange(ids.size)

    counts = np.bincount(e_dev, minlength=ndev)
    e_max = round_up(max(int(counts.max()), 1), edge_multiple)
    senders_loc = np.full((ndev, e_max), blk, np.int32)   # pad -> ghost row
    recv_idx = np.zeros((ndev, e_max), np.int32)
    weights = np.zeros((ndev, e_max), np.asarray(w).dtype)
    order = np.argsort(e_dev, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)])
    for e in range(ndev):
        sel = order[starts[e]: starts[e + 1]]
        k = sel.size
        senders_loc[e, :k] = (s[sel] - e * blk).astype(np.int32)
        local = r_dev[sel] == e
        ri = np.where(local, r[sel] - e * blk, blk + pool_pos[r[sel]])
        recv_idx[e, :k] = ri.astype(np.int32)
        weights[e, :k] = w[sel]

    deg = np.zeros((ndev, blk), np.asarray(w).dtype)
    dall = np.asarray(g.degrees(True))
    for e in range(ndev):
        lo = min(e * blk, n)
        hi = min((e + 1) * blk, n)
        if hi > lo:
            deg[e, : hi - lo] = dall[lo:hi]
    n_real = np.array([[max(min((e + 1) * blk, n) - e * blk, 0)]
                       for e in range(ndev)], np.int32)
    return HaloPlan(ndev=ndev, n=n, blk=blk, B_max=B_max, e_max=e_max,
                    senders_loc=senders_loc, recv_idx=recv_idx,
                    weights=weights, boundary_idx=boundary_idx,
                    boundary_counts=np.array([b.size for b in bnd_ids],
                                             np.int64),
                    deg=deg, n_real=n_real)


@dataclasses.dataclass(frozen=True)
class HaloTiles:
    """Per-device WindowTiles over the [blk | pool] concatenated index space
    (round-3 VERDICT item 2): the halo step's local+cross attraction as the
    windowed Pallas SpMV instead of per-edge XLA gathers + segment_sum
    (~18ns/row -- the cost the rest of the framework avoids; ROADMAP
    "kernel facts").  Receiver indices already address [blk | pool], so the
    tile builder runs unchanged over that space; sender blocks only cover
    [0, blk) and empty blocks get a dead first-flag slab so the kernel
    zero-initializes every output block it may read."""

    sbf: np.ndarray          # [ndev, S_max]
    rw: np.ndarray           # [ndev, S_max]
    packed: np.ndarray       # [ndev, S_max, planes, T]
    deg_w_att: np.ndarray    # [ndev, n_pad] f32 row sums (SpMV-exact)
    aux: object              # shard-0 WindowTiles (static geometry)


@dataclasses.dataclass(frozen=True)
class HaloEdgeTiles:
    """Per-device v1 per-edge tiles over the [blk | pool] index space --
    the linlog fast path (forceatlas.hpp:180-186): attraction magnitude
    depends on the per-edge distance, so the linear-form windowed SpMV
    cannot represent it; the per-edge kernel (ops/pallas/edge_spmm.py::
    attraction_tiled) computes distances in-kernel instead.  Same stacking
    convention as HaloTiles (axis 0 = device, shard with P('x'))."""

    sb: np.ndarray           # [ndev, S_max]
    rb: np.ndarray           # [ndev, S_max]
    first: np.ndarray        # [ndev, S_max]
    sloc: np.ndarray         # [ndev, S_max, T]
    rloc: np.ndarray         # [ndev, S_max, T]
    wt: np.ndarray           # [ndev, S_max, T]
    aux: object              # shard-0 EdgeTiles (static geometry)


def _build_halo_edge_tiles(plan: HaloPlan, params: ForceAtlasParams,
                           coos, folded_list, space: int,
                           tile: int) -> HaloEdgeTiles:
    """Stack one EdgeTiles per device (linlog dispatch of
    build_halo_tiles).  Pad slabs carry first=0 / wt=0 so they accumulate
    nothing into the last real sender block."""
    from ..ops.pallas import edge_spmm as ES
    from .sharded import _CooShim

    tiles_list = []
    for (s, r), f in zip(coos, folded_list):
        shim = _CooShim(s, r, f, space)
        tiles_list.append(ES.build_edge_tiles(shim, tile=tile, weights=f))
    S_max = max(t.num_tiles for t in tiles_list)
    ndev = plan.ndev
    T = tiles_list[0].tile
    sb = np.zeros((ndev, S_max), np.int32)
    rb = np.zeros((ndev, S_max), np.int32)
    first = np.zeros((ndev, S_max), np.int32)
    sloc = np.zeros((ndev, S_max, T), np.int32)
    rloc = np.zeros((ndev, S_max, T), np.int32)
    wt = np.zeros((ndev, S_max, T), np.float32)
    for e, t in enumerate(tiles_list):
        S = t.num_tiles
        sb[e, :S] = t.sb
        rb[e, :S] = t.rb
        first[e, :S] = t.first
        sloc[e, :S] = t.sloc
        rloc[e, :S] = t.rloc
        wt[e, :S] = t.wt
        if S < S_max:
            sb[e, S:] = t.sb[-1]
    aux = dataclasses.replace(tiles_list[0], sb=sb[0], rb=rb[0],
                              first=first[0], sloc=sloc[0], rloc=rloc[0],
                              wt=wt[0])
    return HaloEdgeTiles(sb=sb, rb=rb, first=first, sloc=sloc, rloc=rloc,
                         wt=wt, aux=aux)


def _cover_sender_blocks(t, nblocks: int):
    """Insert an all-dead first-flag slab for every sender block in
    [0, nblocks) with no edges, so its output block is zero-initialized
    rather than read back as garbage."""
    import dataclasses as _dc

    from ..ops.pallas import edge_spmm as ES

    sb = t.sbf >> 1
    missing = np.setdiff1d(np.arange(nblocks), np.unique(sb))
    if missing.size == 0:
        return t
    S, planes, T = t.packed.shape
    sbf2 = np.concatenate([t.sbf,
                           ((missing << 1) | 1).astype(np.int32)])
    rw2 = np.concatenate([t.rw, np.zeros(missing.size, np.int32)])
    pk2 = np.concatenate(
        [t.packed, np.zeros((missing.size, planes, T), np.int32)])
    order = np.argsort(sbf2 >> 1, kind="stable")
    return _dc.replace(t, sbf=sbf2[order], rw=rw2[order], packed=pk2[order],
                       chunks=ES._slab_chunks(sbf2[order]))


def build_halo_tiles(plan: HaloPlan, params: ForceAtlasParams, *,
                     tile: int | None = None, sender_block: int | None = None,
                     window: int | None = None,
                     group: int | None = None,
                     local_only: bool = False) -> HaloTiles:
    """Windowed-SpMV attraction plan for the halo step (see HaloTiles).

    Per-edge constants fold exactly like the flat tiled path
    (fold_edge_weights); unit-weight shards take the jumbo unit packing at
    the scattered-optimal 4096/4096/T1024 shape with ``group`` slabs per
    grid step, weighted shards the bf16 packing at the 256/256 defaults.
    ``params.linlog`` dispatches to the per-edge v1 kernel tiles
    (HaloEdgeTiles) -- the distance-dependent magnitude needs in-kernel
    distances the linear SpMV form cannot represent.

    ``local_only=True`` builds tiles over ONLY the intra-device edges
    (receiver < blk): the overlap composition (SURVEY SS5 long-context
    row) runs these tiles while the boundary blocks ride the Pallas ring,
    which computes the cross-edge attraction itself."""
    from ..ops.pallas import edge_spmm as ES
    from .sharded import _CooShim

    space = plan.blk if local_only else plan.blk + plan.ndev * plan.B_max
    coos, folded_list = [], []
    for e in range(plan.ndev):
        live = plan.senders_loc[e] < plan.blk
        if local_only:
            live &= plan.recv_idx[e] < plan.blk
        s = plan.senders_loc[e][live].astype(np.int64)
        r = plan.recv_idx[e][live].astype(np.int64)
        w = np.asarray(plan.weights[e][live])
        folded = ES.fold_edge_weights(
            np.asarray(w, np.float32), np.asarray(plan.deg[e], np.float32)[s],
            use_weights=params.use_weights, delta=params.delta,
            nohubs=params.nohubs)
        coos.append((s, r))
        folded_list.append(np.asarray(folded, np.float32))
    if params.linlog:
        return _build_halo_edge_tiles(plan, params, coos, folded_list,
                                      space, tile or 512)
    unit = all(f.size == 0 or bool((f == 1.0).all()) for f in folded_list)
    if unit:
        T = tile or 1024
        # cells must stay populated: edges/cell ~ E*B*W/space^2, so the
        # shape scales with the index space.  Round-5 on-chip sweep
        # (scripts/shape_ab.py, ordered rmat22): (4096, 8192) = 83.6ms
        # beats 8192^2 = 90.5ms (per-slab cost is sender-block-driven;
        # window DMA caps W at 8192) and every pooled/tall-window/T2048
        # alternative; the n=547k bench optimum stays 4096^2.  The bf16
        # x layout (params.x_precision) halves window DMA, so its big
        # optimum is (4096, 16384): 64.8ms = 1.007e9 edges/s bare.
        big = space > 1_500_000
        bf16_x = params.x_precision == "bf16"
        # dense small spaces (truncated-pipeline coarse levels: deg ~640
        # at n=72.6k) fill small cells completely -- (1024, 2048) beat
        # (4096, 4096) 2.1x there on chip (scripts/shape_ab.py
        # SHAPE_AB_LEVEL=1: 11.85 vs 24.7 ms/iter); the scattered bench
        # shape (deg ~29) keeps 4096^2
        e_total = sum(len(c[0]) for c in coos)
        dense = not big and e_total >= 128 * max(space, 1)
        sb = sender_block or (1024 if dense else 4096)
        win = window or ((16384 if bf16_x else 8192) if big
                         else (2048 if dense else 4096))
        packing = "unit"
    else:
        T = tile or 512
        sb = sender_block or ES.SENDER_BLOCK
        win = window or ES.WINDOW
        packing = "bf16"
        group = 1
    tiles_list = []
    for (s, r), f in zip(coos, folded_list):
        shim = _CooShim(s, r, f, space)
        t = ES.build_window_tiles(shim, tile=T, sender_block=sb, window=win,
                                  packing=packing)
        if t.num_overflow:
            raise ValueError(f"halo tiles diverted {t.num_overflow} edges "
                             "to overflow; rebuild with min_pair_edges=0")
        t = _cover_sender_blocks(t, -(-plan.blk // sb))
        if group is None:
            # adaptive k (see ES.jumbo_group): 8 for long per-block slab
            # runs, 4 otherwise, 1 for the bf16 (weighted) packing
            group = ES.jumbo_group(t) if packing == "unit" else 1
        if group > 1:
            t = ES.pair_window_tiles(t, group)
        if t.chunks and plan.ndev > 1:
            # chunk layouts are per-device static structure; stacking
            # devices with different chunk boundaries into one shard_map
            # program is not expressible.  (ndev == 1 -- the single-chip
            # scale proxy -- is fine: one device, its own chunks.)
            raise ValueError(
                f"{t.num_tiles} slabs exceed one pallas call at ndev="
                f"{plan.ndev}; raise tile/sender_block or shard over more "
                "devices")
        tiles_list.append(t)
    S_max = max(t.num_tiles for t in tiles_list)
    S_max = -(-S_max // max(group, 1)) * max(group, 1)
    planes = tiles_list[0].packed.shape[1]
    ndev = plan.ndev
    sbf = np.zeros((ndev, S_max), np.int32)
    rw = np.zeros((ndev, S_max), np.int32)
    packed = np.zeros((ndev, S_max, planes, T), np.int32)
    deg_w = np.zeros((ndev, tiles_list[0].n_pad), np.float32)
    for e, t in enumerate(tiles_list):
        S = t.num_tiles
        sbf[e, :S] = t.sbf
        rw[e, :S] = t.rw
        packed[e, :S] = t.packed
        if S < S_max:
            # dead pad slabs: same block as the last real slab, not-first,
            # zero packed words (invalid under both packings)
            sbf[e, S:] = t.sbf[-1] & ~1
            rw[e, S:] = 0
        deg_w[e] = ES.tiled_row_sums(t)
    aux = dataclasses.replace(
        tiles_list[0], sbf=sbf[0], rw=rw[0], packed=packed[0],
        chunks=tiles_list[0].chunks if ndev == 1 else (),
        group=max(group, 1))
    return HaloTiles(sbf=sbf, rw=rw, packed=packed, deg_w_att=deg_w,
                     aux=aux)


def make_halo_fa_step(mesh: Mesh, plan: HaloPlan, dim: int,
                      params: ForceAtlasParams, dtype=jnp.float32, *,
                      overlap: bool = False, interpret: bool = False,
                      sample_mode: str = "stratified",
                      tiles: HaloTiles | None = None):
    """Jitted halo-exchange FA step.

    step(x_blk[ndev*blk, d] block-sharded, fprev same, key) over the static
    plan arrays (closed over as device-put constants is WRONG for big
    graphs -- they are passed as sharded arguments instead).
    Returns (x_blk', forces_blk).

    ``overlap=True`` replaces the boundary all_gather with the Pallas ring
    kernel (parallel/overlap.py): cross-edge attraction is computed per
    boundary block as it lands while the next block is in flight.  The
    caller must pass the deadened ``OverlapGroups.local_*`` arrays as the
    edge shard and four extra grouped operands (halo_force_atlas does).

    ``sample_mode`` picks the repulsion sample design:
      'stratified'  (default) each device draws samp_per from its own
                    block (per-sample weight nr_e/samp_per) -- lowest
                    variance, but the draw depends on the device count;
      'invariant'   ALL devices draw the same num_negative_samples global
                    indices from the shared replicated key; each device
                    contributes the samples it owns and a psum assembles
                    the set -- bitwise device-count-INVARIANT layouts
                    (the SURVEY SS5 determinism contract with repulsion
                    ON), at uniform-sampling variance.
    """
    ndev = plan.ndev
    blk = plan.blk
    eps = params.epsilon
    samp_per = max(params.num_negative_samples // ndev, 1)
    if sample_mode not in ("stratified", "invariant"):
        raise ValueError(f"unknown sample_mode {sample_mode!r}")
    edge_mode = isinstance(tiles, HaloEdgeTiles)
    if tiles is not None:
        if params.linlog and not edge_mode:
            raise ValueError("linlog needs HaloEdgeTiles (build_halo_tiles "
                             "dispatches on params.linlog -- rebuild the "
                             "tiles with the same params)")
        from ..ops.pallas import edge_spmm as ES
        aux = tiles.aux
        empty_i = np.zeros(0, np.int32)
        empty_f = np.zeros(0, np.float32)
    if overlap:
        from . import overlap as OV

    def local_step(x_blk, fprev, *rest):
        if edge_mode:
            tsb, trb, tfirst, tsloc, trloc, twt, bidx, deg, n_real, key, \
                *groups = rest
        elif tiles is not None:
            sbf, rw, packed, dwa, bidx, deg, n_real, key, *groups = rest
        else:
            s_loc, r_idx, w, bidx, deg, n_real, key, *groups = rest
        me = jax.lax.axis_index(EDGE_AXIS)
        nr = n_real[0, 0]
        deg_p1 = deg[0] + 1.0
        xb = x_blk                                     # [blk, d]

        if overlap:
            # cross edges ride the ring kernel; local edges index xb only
            xcat = jnp.concatenate([xb, jnp.zeros((1, dim), xb.dtype)], 0)
        else:
            # --- halo exchange: ONLY boundary coords ride the interconnect
            bnd = xb[bidx[0]]                          # [B_max, d]
            pool = jax.lax.all_gather(bnd, EDGE_AXIS)  # [ndev, B_max, d]
            xcat = jnp.concatenate([xb, pool.reshape(-1, dim)], axis=0)

        if edge_mode:
            # --- linlog: per-edge v1 kernel over [blk | pool] -- distances
            # computed in-kernel (forceatlas.hpp:180-186 magnitude)
            tiles_local = ES.EdgeTiles(
                sb=tsb[0], rb=trb[0], first=tfirst[0], sloc=tsloc[0],
                rloc=trloc[0], wt=twt[0], n_blocks=aux.n_blocks,
                tile=aux.tile, fill=aux.fill)
            xsrc = xcat[: aux.n_pad]
            xTf = jnp.zeros((ES.D_PAD, aux.n_pad), jnp.float32)
            xTf = xTf.at[:dim, : xsrc.shape[0]].set(
                xsrc.astype(jnp.float32).T)
            attT = ES.attraction_tiled(xTf, tiles_local,
                                       attract=params.attract,
                                       linlog=params.linlog, eps=eps,
                                       interpret=interpret)
            att = attT[:dim].T[:blk].astype(xb.dtype)
        elif tiles is not None:
            # --- windowed-SpMV attraction over [blk | pool] (HaloTiles):
            # att_i = attract * (sum_j w_ij x_j - x_i sum_j w_ij), the
            # linear form the folded tile weights encode
            tiles_local = ES.WindowTiles(
                sbf=sbf[0], rw=rw[0], packed=packed[0],
                overflow_s=jnp.asarray(empty_i),
                overflow_r=jnp.asarray(empty_i),
                overflow_w=jnp.asarray(empty_f),
                n_sblocks=aux.n_sblocks, tile=aux.tile, fill=aux.fill,
                sender_block=aux.sender_block, window=aux.window,
                packing=aux.packing, chunks=aux.chunks, group=aux.group)
            # overlap mode: local-only tiles (space = blk) may have
            # n_pad == blk, and xcat's ghost row is never tile-referenced
            xsrc = xcat[: aux.n_pad]
            xTf = jnp.zeros((ES.D_PAD, aux.n_pad), jnp.float32)
            xTf = xTf.at[:dim, : xsrc.shape[0]].set(
                xsrc.astype(jnp.float32).T)
            yT = ES.spmv_windowed(xTf, tiles_local, interpret=interpret,
                                  dmax=4 if dim <= 4 else ES.D_PAD,
                                  x_precision=params.x_precision)
            attT = yT[:dim] - xTf[:dim] * dwa[0][None, :]
            att = (params.attract * attT.T[:blk]).astype(xb.dtype)
        else:
            # --- attraction over the local edge shard (senders all mine)
            sc = jnp.clip(s_loc[0], 0, blk - 1)
            xs_e = xcat[sc]
            xr_e = xcat[r_idx[0]]
            diff = xr_e - xs_e
            dist_e = jnp.maximum(jnp.sqrt(jnp.sum(diff * diff, axis=-1)),
                                 eps)
            fa = F.attraction_fa(dist_e, w[0], deg_p1[sc],
                                 linlog=params.linlog, delta=params.delta,
                                 nohubs=params.nohubs,
                                 use_weights=params.use_weights)
            live = s_loc[0] < blk
            per_edge = jnp.where(
                live[:, None],
                diff * (params.attract * fa / dist_e)[:, None], 0.0)
            seg = jnp.where(live, s_loc[0], blk)
            att = jax.ops.segment_sum(per_edge, seg,
                                      num_segments=blk + 1)[:blk]

        if overlap:
            cs, cr, cw, cmask = (a[0] for a in groups)
            fcr = OV.ring_cross_forces(
                xb, deg_p1, bidx[0], cs, cr, cw, cmask, ndev=ndev,
                b_max=plan.B_max, params=params, interpret=interpret)
            att = att + jax.ops.segment_sum(
                fcr.reshape(-1, dim), jnp.clip(cs.reshape(-1), 0, blk),
                num_segments=blk + 1)[:blk]

        # --- sampled repulsion: global sample set, O(samp) comm
        if sample_mode == "invariant":
            # every device draws the SAME global indices from the shared
            # replicated key; each contributes the samples it owns, a psum
            # assembles the set.  The draw never references ndev/blk, so
            # layouts are bitwise identical across device counts.
            K = params.num_negative_samples
            idx_g = jax.random.randint(key, (K,), 0,
                                       jnp.asarray(max(plan.n, 1)))
            own = (idx_g >= me * blk) & (idx_g - me * blk < nr)
            loc = jnp.clip(idx_g - me * blk, 0, blk - 1)
            xs_all = jax.lax.psum(
                jnp.where(own[:, None], xb[loc], 0.0), EDGE_AXIS)
            ds_all = jax.lax.psum(
                jnp.where(own, deg_p1[loc], 0.0), EDGE_AXIS)
            rows_all = idx_g
            w_all = jnp.full((K,), 1.0, dtype) * (
                jnp.asarray(plan.n, dtype) / K)
        else:
            key_d = jax.random.fold_in(key, me)
            idx = jax.random.randint(key_d, (samp_per,), 0,
                                     jnp.maximum(nr, 1))
            xs_mine = xb[idx]                          # [samp_per, d]
            ds_mine = deg_p1[idx]
            rows_mine = me * blk + idx
            # per-sample stratum weight nr_e / samp_per: each device is a
            # stratum of nr_e real vertices sampled samp_per times, so the
            # unbiased estimator of the full n-vertex sum weights its
            # samples by nr_e/samp_per -- NOT the uniform n/(samp*ndev),
            # which biases whenever blocks are uneven (last device short /
            # empty) or num_negative_samples < ndev clamps samp_per to 1
            # (round-2 VERDICT weak #7).  Empty strata (nr_e == 0) get
            # weight 0, so their ghost draws never pollute the sum.
            w_mine = jnp.full((samp_per,), 1.0, dtype) * (
                nr.astype(dtype) / samp_per)
            xs_all = jax.lax.all_gather(xs_mine, EDGE_AXIS).reshape(-1, dim)
            ds_all = jax.lax.all_gather(ds_mine, EDGE_AXIS).reshape(-1)
            rows_all = jax.lax.all_gather(rows_mine, EDGE_AXIS).reshape(-1)
            w_all = jax.lax.all_gather(w_mine, EDGE_AXIS).reshape(-1)
        sq_b = jnp.sum(xb * xb, axis=1)
        d2 = sq_b[:, None] + jnp.sum(xs_all * xs_all, axis=1)[None, :] \
            - 2.0 * jnp.matmul(xb, xs_all.T,
                               precision=jax.lax.Precision.HIGHEST)
        dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), eps)
        wgt = (ds_all * w_all)[None, :] / (dist * dist * dist)
        rows = me * blk + jnp.arange(blk)
        wgt = jnp.where(rows[:, None] == rows_all[None, :], 0.0, wgt)
        f = xb * jnp.sum(wgt, axis=1, keepdims=True) - jnp.matmul(
            wgt, xs_all, precision=jax.lax.Precision.HIGHEST)
        # unbiased estimator of the exact n-vertex sum (weights above)
        rep = (params.repel * deg_p1)[:, None] * f

        grav = F.gravity_force(xb, deg_p1, params.gravity)
        f_blk = rep + att + grav
        real = (jnp.arange(blk) < nr)[:, None]
        f_blk = jnp.where(real, f_blk, 0.0)
        new_blk = F.speed_update(xb, f_blk, fprev, deg_p1, ks=params.ks,
                                 ksmax=params.ksmax,
                                 tolerate=params.tolerate)
        new_blk = jnp.where(real, new_blk, xb)
        return new_blk, f_blk

    bs = P(EDGE_AXIS)
    n_grouped = 4 if overlap else 0
    n_sharded = 11 if edge_mode else (9 if tiles is not None else 8)
    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(bs,) * n_sharded + (P(),) + (bs,) * n_grouped,
        out_specs=(bs, bs),
        check_vma=False,
    )
    return jax.jit(step)


def halo_force_atlas(g: Graph, dim: int = 2, *, mesh: Mesh,
                     params: ForceAtlasParams | None = None,
                     iterations: int = 100, key=None, coords0=None,
                     plan: HaloPlan | None = None, overlap: bool = False,
                     interpret: bool = False,
                     sample_mode: str = "stratified",
                     tiled: bool | str = "auto"):
    """Flat FA layout with vertex-partitioned coords + boundary-only halo
    exchange.  ``params.repulsion`` must be 'sampled' (the point of the
    design is never materializing remote coords); use sharded_force_atlas
    for the replicated/gram baseline.  ``overlap=True`` routes the boundary
    exchange through the Pallas ring kernel overlapped with cross-edge
    attraction (parallel/overlap.py; ``interpret=True`` simulates the
    inter-chip DMAs on the virtual CPU mesh).

    ``tiled`` routes the local+cross attraction through per-device
    WindowTiles (build_halo_tiles) instead of per-edge gathers +
    segment_sum: True forces it, False keeps the portable segment path,
    "auto" (default) enables it for linear-form attraction at
    >= 100k edges.  Composed with ``overlap=True`` the tiles cover ONLY
    the intra-device edges (local_only) -- they run while the boundary
    blocks ride the ring, whose kernel computes the cross-edge attraction
    itself (the SURVEY SS5 'exchange overlapped with kernel-grade local
    aggregation' configuration)."""
    params = params or ForceAtlasParams(repulsion="sampled")
    if params.repulsion != "sampled":
        raise ValueError("halo_force_atlas supports repulsion='sampled' "
                         "only (remote coords are never replicated)")
    if key is None:
        key = jax.random.PRNGKey(0)
    ndev = mesh.devices.size
    if plan is None:
        plan = build_halo_plan(
            g, ndev, boundary_multiple=128 if overlap else None)
    if tiled == "auto":
        tiled = (g.num_edges >= 100_000
                 and (interpret or jax.default_backend() != "cpu"))
    tiles_b = (build_halo_tiles(plan, params, local_only=overlap)
               if tiled else None)
    dtype = g.dtype

    key, init_key = jax.random.split(key)
    if coords0 is None:
        coords0 = jax.random.uniform(init_key, (g.n, dim), dtype=dtype,
                                     minval=-1.0, maxval=1.0)
    nblk = ndev * plan.blk
    x = jnp.zeros((nblk, dim), dtype).at[: g.n].set(
        jnp.asarray(coords0, dtype))
    fprev = jnp.zeros_like(x)

    put = lambda a: jax.device_put(jnp.asarray(a),
                                   NamedSharding(mesh, P(EDGE_AXIS)))
    x = put(x)
    fprev = put(fprev)

    def _tile_args(tb):
        if isinstance(tb, HaloEdgeTiles):     # linlog per-edge tiles
            return (put(tb.sb), put(tb.rb), put(tb.first), put(tb.sloc),
                    put(tb.rloc), put(tb.wt))
        return (put(tb.sbf), put(tb.rw), put(tb.packed),
                put(tb.deg_w_att))

    if overlap:
        from .overlap import build_overlap_groups

        groups = build_overlap_groups(plan)
        if tiles_b is not None:
            # local attraction via local-only tiles; cross edges ride
            # the ring kernel (the overlap + kernel composition)
            args = _tile_args(tiles_b) + (
                put(plan.boundary_idx), put(jnp.asarray(plan.deg, dtype)),
                put(plan.n_real))
        else:
            args = (put(groups.local_senders), put(groups.local_recv),
                    put(jnp.asarray(groups.local_weights, dtype)),
                    put(plan.boundary_idx), put(jnp.asarray(plan.deg, dtype)),
                    put(plan.n_real))
        extra = (put(groups.cs), put(groups.cr),
                 put(jnp.asarray(groups.cw, dtype)), put(groups.mask))
    elif tiles_b is not None:
        args = _tile_args(tiles_b) + (
            put(plan.boundary_idx), put(jnp.asarray(plan.deg, dtype)),
            put(plan.n_real))
        extra = ()
    else:
        args = (put(plan.senders_loc), put(plan.recv_idx),
                put(jnp.asarray(plan.weights, dtype)), put(plan.boundary_idx),
                put(jnp.asarray(plan.deg, dtype)), put(plan.n_real))
        extra = ()
    step = make_halo_fa_step(mesh, plan, dim, params, dtype,
                             overlap=overlap, interpret=interpret,
                             sample_mode=sample_mode, tiles=tiles_b)
    for i in range(iterations):
        key, sub = jax.random.split(key)
        x, fprev = step(x, fprev, *args, sub, *extra)
    # final readout: re-replicate once, then slice to the real vertices
    x = jax.device_put(x, NamedSharding(mesh, P()))
    return x[: g.n]
