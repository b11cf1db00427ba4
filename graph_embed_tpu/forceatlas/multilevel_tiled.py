"""TPU fast path for the multilevel refinement (forceAtlasMultilevel).

The portable implementation (multilevel.py) gathers member coordinates row
by row -- the ~18ns/row TPU gather tax again.  This module removes every
gather by re-laying out the level in *slot space*:

* aggregates are ordered by (size bucket, id) and each aggregate of bucket
  size-class S_b occupies a contiguous, S_b-aligned slot range; ghost slots
  pad each aggregate to exactly S_b (total slots <= 2n);
* within-aggregate repulsion becomes one Pallas kernel per bucket: the grid
  walks chunks of C consecutive aggregates, whose coordinates are ONE
  contiguous [D_PAD, C*S_b] block (BlockSpec-pipelined -- no DMA of scattered
  rows at all); the masked gram-matmul batch runs on the MXU;
* intra-aggregate attraction reuses the windowed SpMV kernel over the slot
  space (inter-aggregate edges get weight 0; the cut-edge pull is the usual
  precomputed vector);
* the epilogue (center / max-norm / pack into parent balls,
  forceatlas.hpp:539-570) is segment ops over slots;
* one host-built permutation maps slots back to vertices at level end.

Semantics match multilevel.ml_forces (same reference citations); the
attraction weights ride the packed bf16 fast path (exact for unit weights).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import Graph
from ..partition.interpolation import Partition
from ..utils.params import MultilevelFAParams
from ..ops.pallas import edge_spmm as ES
from . import forces as F

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RefineLayout:
    """Slot-space layout of one level (host-built once per level)."""

    slot_of_vertex: jnp.ndarray   # [n] vertex -> slot
    agg_of_slot: jnp.ndarray      # [n_slots] aggregate id (ghosts -> m)
    valid_slot: jnp.ndarray       # [n_slots] bool
    deg_loc: jnp.ndarray          # [n_slots] local degree (ghosts 0)
    tiles: ES.WindowTiles         # intra-aggregate attraction over slots
    deg_w_att: jnp.ndarray        # [tiles.n_pad] packed-weight row sums
    bucket_meta: tuple            # static: ((base, m_b, S_b, chunk, kern?),)
    n: int
    n_slots: int
    num_aggs: int

    def tree_flatten(self):
        return ((self.slot_of_vertex, self.agg_of_slot, self.valid_slot,
                 self.deg_loc, self.tiles, self.deg_w_att),
                (self.bucket_meta, self.n, self.n_slots, self.num_aggs))

    @classmethod
    def tree_unflatten(cls, aux, children):
        (slot_of_vertex, agg_of_slot, valid_slot, deg_loc, tiles,
         deg_w_att) = children
        bucket_meta, n, n_slots, num_aggs = aux
        return cls(slot_of_vertex, agg_of_slot, valid_slot, deg_loc, tiles,
                   deg_w_att, bucket_meta, n, n_slots, num_aggs)


# scoped-VMEM budget for sizing the repulsion chunk C: the kernel keeps a
# handful of [C, S, S] f32 intermediates live at once (lane dim padded to
# 128); the hardware scoped limit is 16MB and a C=256/S=32 chunk measured
# 17.16MB there (compile-time OOM on the embed pipeline), i.e. ~4.3 live
# lane-padded buffers -- model 5 and stay under 10MB for headroom
_VMEM_CHUNK_BUDGET = 10 << 20
_LIVE_BUFFERS = 5

# small-bucket kernels (2 <= S <= SMALL_MAX_S).  Two families, dispatched
# per size class by what measured fastest (scripts/chunk_ab.py, v5e):
#   * roll: partner-by-offset lane rotations; S-1 passes of [1, blk] row
#     math at 1/8 sublane utilization -- wins at S <= 16 (few partners);
#   * chunk: per 128-lane chunk, one [128, 128] block-diagonal diff-form
#     pairwise tile (both vreg dims full), force accumulation either by
#     sublane reductions ("vpu", wins at S = 32: 4.7 vs roll 5.6 ms on the
#     bench-mesh bucket) or one [8,128]x[128,128] MXU matmul ("mxu", wins
#     at S = 64: 2.3 vs roll 4.0 ms; at S = 32 the matmul's per-chunk issue
#     cost loses to the reductions).
# The [C, S, S] gram kernel wastes 128/S of the VPU below S = 128 either way.
SMALL_MAX_S = 64
ROLL_MAX_S = 16      # "auto": roll below this, chunk above
CHUNK_MXU_MIN_S = 64  # "auto": chunk accumulates on the MXU from this S
ROLL_LANES = 16384
CHUNK_LANES = 4096  # lanes per grid step of the chunk kernel (32 chunks)


def bucket_size_classes(counts, *, min_bucket: int = 8):
    """Power-of-two size class per aggregate (>= min_bucket)."""
    return np.maximum(min_bucket,
                      1 << np.ceil(np.log2(np.maximum(counts, 1))
                                   ).astype(np.int64))


def plan_bucket(S: int, m_b: int, *, chunk_budget: int = _VMEM_CHUNK_BUDGET,
                small_kind: str = "auto"):
    """Kernel plan for one size class: (kind, C, m_b_pad, base_align).

    kind: 'roll' | 'chunk' | 'gram' | False (oversize XLA path); C =
    aggregates per grid step; m_b_pad = padded aggregate count; base_align =
    required slot alignment of the bucket base.  Shared by the single-chip
    layout (prepare_refine) and the sharded layout (parallel/sharded_ml) so
    per-aggregate arithmetic is identical across device counts."""
    lane = max(S, 128)
    C_try = (chunk_budget // (_LIVE_BUFFERS * S * lane * 4)) // 8 * 8
    if 2 <= S <= SMALL_MAX_S:
        kind_s = (small_kind if small_kind != "auto"
                  else ("roll" if S <= ROLL_MAX_S else "chunk"))
        if kind_s == "chunk":
            # chunk kernel bucket: S divides 128, so every 128-lane chunk
            # holds whole aggregates; C aggregates per grid step with
            # C*S = CHUNK_LANES exactly
            C = CHUNK_LANES // S
        else:
            # lane-rotation kernel bucket: partner-by-offset rolls; C*S must
            # be a multiple of 128 (block lane dim)
            c_mult = max(8, 128 // S)
            C = min(ROLL_LANES // S, -(-m_b // c_mult) * c_mult)
        return kind_s, C, -(-m_b // C) * C, C * S
    if S <= 256 and C_try >= 8:
        # gram kernel bucket ([C, S, S] masked pairwise; lane-efficient at
        # S >= 128): C aggregates per grid step, C a multiple of 8 (Mosaic
        # block rule), bounded by the scoped-VMEM model
        C = min(256, C_try)
        return "gram", C, -(-m_b // C) * C, C * S
    # oversize aggregates (snowballs): XLA batched gram over the contiguous
    # slot ranges -- rare by construction
    return False, m_b, m_b, S


def prepare_refine(g: Graph, part: Partition, params: MultilevelFAParams,
                   *, tile: int = 512, min_bucket: int = 8,
                   chunk_budget: int = _VMEM_CHUNK_BUDGET,
                   small_kind: str = "auto") -> RefineLayout:
    """Build the slot layout + attraction tiles for one level (host)."""
    v2a = part.vertex_to_agg_numpy()
    m = part.num_aggs
    n = g.n
    counts = np.bincount(v2a, minlength=m)

    # bucket size classes (power of two >= min_bucket)
    S_of_agg = bucket_size_classes(counts, min_bucket=min_bucket)
    # order aggregates by (bucket, id); slots per bucket are S-aligned and
    # each bucket base is aligned to its chunk extent so BlockSpec indices
    # stay pure block counts
    order_a = np.lexsort((np.arange(m), S_of_agg))
    bucket_meta = []
    base = 0
    slot_start = np.zeros(m, dtype=np.int64)
    S_in_order = S_of_agg[order_a]
    i = 0
    while i < m:
        S = int(S_in_order[i])
        j = i
        while j < m and S_in_order[j] == S:
            j += 1
        m_b = j - i
        kind, C, m_b_pad, align = plan_bucket(S, m_b,
                                              chunk_budget=chunk_budget,
                                              small_kind=small_kind)
        base = -(-base // align) * align
        for k in range(i, j):
            slot_start[order_a[k]] = base + (k - i) * S
        bucket_meta.append((int(base), int(m_b_pad), int(S), int(C), kind))
        base += m_b_pad * S
        i = j
    n_slots = -(-base // 128) * 128

    # vertex -> slot
    order_v = np.argsort(v2a, kind="stable")
    vstart = np.concatenate([[0], np.cumsum(counts)])
    pos = np.arange(n) - vstart[v2a[order_v]]
    slot_of_vertex = np.zeros(n, dtype=np.int64)
    slot_of_vertex[order_v] = slot_start[v2a[order_v]] + pos

    agg_of_slot = np.full(n_slots, m, dtype=np.int32)
    agg_of_slot[slot_of_vertex] = v2a
    valid = np.zeros(n_slots, dtype=bool)
    valid[slot_of_vertex] = True

    # intra-aggregate attraction tiles over slot space
    s, r, w = g.to_coo_numpy()
    intra = (v2a[s] == v2a[r]) & (s != r)
    deg_np = np.zeros(n, np.float64)
    both = v2a[s] == v2a[r]
    if params.use_weights:
        np.add.at(deg_np, s[both], w[both])
    else:
        np.add.at(deg_np, s[both], 1.0)
    folded = ES.fold_edge_weights(w, deg_np[s],
                                  use_weights=params.use_weights,
                                  delta=params.delta, nohubs=params.nohubs)
    # inter-aggregate edges carry weight 0 in the refinement SpMV; drop them
    # here (build_window_tiles would anyway) -- they'd fragment the slot-space
    # tiling arbitrarily since slots of different aggregates are far apart
    ss = slot_of_vertex[s[intra]]
    rr = slot_of_vertex[r[intra]]
    shim = _slot_shim(ss, rr, folded[intra], n_slots)
    # unit folded weights ride the wide-slab 'unit' packing exactly like the
    # flat fast path (tiled.py): intra-aggregate edges are ultra-local in
    # slot space (members sit in one S-sized range), so 1024-lane blocks
    # pack near-full and the v7 block-stacked kernel applies
    unit = bool(intra.any()) and bool(np.all(folded[intra] == 1.0))
    if unit:
        from .tiled import UNIT_SENDER_BLOCK, UNIT_TILE, UNIT_WINDOW

        tiles = ES.build_window_tiles(shim, tile=UNIT_TILE,
                                      sender_block=UNIT_SENDER_BLOCK,
                                      window=UNIT_WINDOW, packing="unit")
        if (UNIT_WINDOW >= ES.JUMBO_JOIN_MIN and not tiles.chunks
                and ES.JUMBO_GROUP > 1):
            # k slabs per grid step (bitwise-identical; see prepare_tiled)
            tiles = ES.pair_window_tiles(tiles, ES.jumbo_group(tiles))
    else:
        tiles = ES.build_window_tiles(shim, tile=tile)
    deg_w_att = ES.tiled_row_sums(tiles)

    deg_loc = np.zeros(n_slots, np.float32)
    deg_loc[slot_of_vertex] = deg_np

    return RefineLayout(
        slot_of_vertex=jnp.asarray(slot_of_vertex.astype(np.int32)),
        agg_of_slot=jnp.asarray(agg_of_slot),
        valid_slot=jnp.asarray(valid),
        deg_loc=jnp.asarray(deg_loc),
        tiles=jax.device_put(tiles),
        deg_w_att=jnp.asarray(deg_w_att),
        bucket_meta=tuple(bucket_meta),
        n=n, n_slots=int(n_slots), num_aggs=m)


class _slot_shim:
    def __init__(self, s, r, w, n):
        self._coo = (np.asarray(s), np.asarray(r), np.asarray(w))
        self.n = int(n)

    def to_coo_numpy(self):
        return self._coo


def _bucket_repulsion_roll_kernel(x_ref, out_ref, *, S: int, dim: int,
                                  repel: float, eps: float):
    """Dense-lane within-aggregate repulsion by partner-offset rotation.

    Block [D_PAD, C*S]: lanes are slots (aggregates contiguous, S-aligned,
    S a power of two); coords in rows 0..dim-1, deg_loc on row D_PAD-1 with
    ghosts at exactly -1.0 (so w = max(dval+1, 0) folds the validity mask).
    For offset o = 1..S-1 the in-group partner of lane i is lane
    base + ((i-base+o) mod S) == select(pos < S-o, x[i+o], x[i+o-S]) -- two
    full-lane rotations plus a positional select, never crossing group (or
    block) boundaries since C*S is a multiple of S.  Unlike the [C, S, S]
    gram kernel, every one of the 128 lanes carries a real pair term."""
    x = x_ref[...]                                         # [D_PAD, BLK]
    blk = x.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) & (S - 1)
    acc = [jnp.zeros((1, blk), jnp.float32) for _ in range(dim)]
    for o in range(1, S):
        a = pltpu.roll(x, blk - o, 1)                      # x[i+o]
        b = pltpu.roll(x, S - o, 1)                        # x[i+o-S]
        xo = jnp.where(pos < (S - o), a, b)
        w_j = jnp.maximum(xo[ES.D_PAD - 1: ES.D_PAD] + 1.0, 0.0)
        d2 = jnp.zeros((1, blk), jnp.float32)
        diffs = []
        for k in range(dim):
            dk = x[k: k + 1] - xo[k: k + 1]
            diffs.append(dk)
            d2 = d2 + dk * dk
        dist = jnp.maximum(jnp.sqrt(d2), eps)
        W = w_j / (dist * dist * dist)
        for k in range(dim):
            acc[k] = acc[k] + W * diffs[k]
    scale = repel * jnp.maximum(x[ES.D_PAD - 1: ES.D_PAD] + 1.0, 0.0)
    rows = [scale * acc[k] for k in range(dim)]
    rows.append(jnp.zeros((ES.D_PAD - dim, blk), jnp.float32))
    out_ref[...] = jnp.concatenate(rows, axis=0)


def _bucket_repulsion_chunk_kernel(x_ref, xcol_ref, out_ref, *, S: int,
                                   dim: int, repel: float, eps: float,
                                   use_mxu: bool):
    """Small-bucket repulsion as 128-slot pairwise tiles (S divides 128).

    Per 128-lane chunk: ONE [128, 128] diff-form d2 tile over all slot pairs
    in the chunk (both vreg dimensions full -- the roll kernel's per-offset
    [1, blk] chain uses 1 of 8 sublanes), masked to the block-diagonal
    (same-aggregate, not-self) pattern, ghosts killed by w = 0 on both
    sides (M[a, b] = w_a / d^3).  ``xcol_ref`` carries the coordinates
    chunk-transposed ([chunks, 128, D_PAD], built once per call in XLA) so
    the kernel never transposes.

    Accumulation (gathered sums + row sum) is the per-S-measured choice
    (scripts/chunk_ab.py): ``use_mxu`` rides one [8,128] @ [128,128] MXU
    matmul at HIGHEST precision (wins at S = 64; the d2 itself stays exact
    diff-form -- see the gram-cancellation note in ops/pallas/repulsion.py);
    otherwise sublane reductions of M * xcol_k (wins at S = 32, where the
    matmul's per-chunk issue cost exceeds the reduction chain)."""
    x = x_ref[...]                                          # [D_PAD, BLK]
    blk = x.shape[1]
    nchunks = blk // 128
    a_idx = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    mask = ((a_idx // S) == (b_idx // S)) & (a_idx != b_idx)
    out_cols = []
    for c in range(nchunks):
        xc = x[:, c * 128:(c + 1) * 128]                    # [D_PAD, 128]
        xcol = xcol_ref[c]                                  # [128, D_PAD]
        w_col = jnp.maximum(xcol[:, ES.D_PAD - 1:ES.D_PAD] + 1.0, 0.0)
        d2 = jnp.zeros((128, 128), jnp.float32)
        for k in range(dim):
            dk = xcol[:, k:k + 1] - xc[k:k + 1, :]          # [128(a),128(b)]
            d2 = d2 + dk * dk
        inv = jax.lax.rsqrt(jnp.maximum(d2, eps * eps))
        M = jnp.where(mask, w_col * (inv * inv * inv), 0.0)  # M[a,b]=w_a/d^3
        scale = repel * jnp.maximum(xc[ES.D_PAD - 1:ES.D_PAD] + 1.0, 0.0)
        if use_mxu:
            # V rows 0..dim-1 = coords, row dim = ones: G = V' @ M gives the
            # gathered sums (rows k) and the row sum (row dim) in one pass
            ones = jnp.ones((1, 128), jnp.float32)
            V = jnp.concatenate(
                [xc[:dim], ones,
                 jnp.zeros((ES.D_PAD - dim - 1, 128), jnp.float32)], axis=0)
            G = jnp.dot(V, M, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # [D_PAD, 128]
            rows = [scale * (xc[k:k + 1] * G[dim:dim + 1] - G[k:k + 1])
                    for k in range(dim)]
        else:
            rowsum = jnp.sum(M, axis=0, keepdims=True)      # [1, 128]
            rows = []
            for k in range(dim):
                gath = jnp.sum(M * xcol[:, k:k + 1], axis=0, keepdims=True)
                rows.append(scale * (xc[k:k + 1] * rowsum - gath))
        rows.append(jnp.zeros((ES.D_PAD - dim, 128), jnp.float32))
        out_cols.append(jnp.concatenate(rows, axis=0))
    out_ref[...] = jnp.concatenate(out_cols, axis=1)


def _bucket_repulsion_kernel(xT_ref, out_ref, *, C: int, S: int, dim: int,
                             repel: float, eps: float):
    """Chunk of C aggregates, each S slots: masked pairwise repulsion.

    xT block: [D_PAD, C, S]; rows 0..dim-1 carry coordinates, row D_PAD-1
    carries deg_loc on real slots and -1 on ghosts (the validity mask).
    With dim <= 3, the pairwise distance/accumulation terms are unrolled over
    the coordinate axis as pure VPU broadcasts (Mosaic's batched matmuls do
    not support middle batch dims, and the arithmetic is tiny anyway)."""
    x = xT_ref[...]                                        # [D_PAD, C, S]
    dval = x[ES.D_PAD - 1]                                 # [C, S]
    valid = dval >= 0.0
    w = jnp.where(valid, dval + 1.0, 0.0)                  # [C, S]
    y = [jnp.where(valid, x[k], 0.0) for k in range(dim)]  # dim x [C, S]

    d2 = jnp.zeros((C, S, S), jnp.float32)
    for k in range(dim):
        diff_k = y[k][:, :, None] - y[k][:, None, :]       # [C, S, T]
        d2 = d2 + diff_k * diff_k
    dist = jnp.maximum(jnp.sqrt(d2), eps)
    W = w[:, None, :] / (dist * dist * dist)               # [C, S, T]
    eye = jnp.eye(S, dtype=bool)
    W = jnp.where(eye[None] | ~valid[:, None, :], 0.0, W)
    rowsum = jnp.sum(W, axis=-1)                           # [C, S]
    out = jnp.zeros((ES.D_PAD, C, S), jnp.float32)
    scale = jnp.where(valid, repel * w, 0.0)               # [C, S]
    rows = []
    for k in range(ES.D_PAD):
        if k < dim:
            gathered_k = jnp.sum(W * y[k][:, None, :], axis=-1)  # [C, S]
            rows.append(scale * (y[k] * rowsum - gathered_k))
        else:
            rows.append(jnp.zeros((C, S), jnp.float32))
    out_ref[...] = jnp.stack(rows, axis=0)


def bucket_repulsion(xT_deg, layout: RefineLayout, repel: float, eps: float,
                     *, dim: int = 3, interpret: bool = False, key=None,
                     num_samples: int = 256, sampled_threshold: int = 0):
    """[D_PAD, n_slots] within-aggregate repulsion in slot space.

    ``xT_deg``: [D_PAD, n_slots] with coords in rows 0..d-1 and deg_loc in
    row D_PAD-1 (so the kernel needs a single input stream).

    Buckets whose size class S reaches ``sampled_threshold`` (> 0, and a
    ``key`` is given) use the unbiased negative-sampling estimator of
    forces.repulsion_sampled restricted to each aggregate, instead of the
    exact O(S^2) gram -- snowballed aggregates otherwise dominate the level
    (bench mesh level 1: 48 aggregates of 2k-8k slots are ~1e9 padded pair
    terms per iteration; sampling at 256 partners is ~20x less)."""
    n_slots = layout.n_slots
    out = jnp.zeros((ES.D_PAD, n_slots), jnp.float32)
    for (base, m_b, S, C, kind) in layout.bucket_meta:
        width = m_b * S
        # the chunk kernel's transposed view [w/128, 128, D_PAD] pads its
        # minor D_PAD=8 dim to 128 lanes -- 16x expansion (512 B/slot).  A
        # full-slot-space build OOM'd HBM at 25.7M slots (mesh3d(256) level
        # 0: 12.3 GB); build it PER BUCKET and hand oversize buckets to the
        # XLA gram paths below
        chunk_ok = width * 512 <= _XCOLS_MAX_BYTES
        if (kind == "chunk" and chunk_ok and HAVE_PALLAS and not interpret
                and not (sampled_threshold > 0 and S >= sampled_threshold
                         and key is not None)):
            xcols_b = xT_deg[:, base: base + width].reshape(
                ES.D_PAD, width // 128, 128).transpose(1, 2, 0)
            bw = C * S
            cpb = bw // 128
            kernel = partial(_bucket_repulsion_chunk_kernel, S=S, dim=dim,
                             repel=repel, eps=eps,
                             use_mxu=S >= CHUNK_MXU_MIN_S)
            res2 = pl.pallas_call(
                kernel,
                grid=(width // bw,),
                in_specs=[
                    pl.BlockSpec((ES.D_PAD, bw), lambda i: (0, i)),
                    pl.BlockSpec((cpb, 128, ES.D_PAD), lambda i: (i, 0, 0)),
                ],
                out_specs=pl.BlockSpec((ES.D_PAD, bw), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((ES.D_PAD, width),
                                               jnp.float32),
                interpret=interpret,
            )(xT_deg[:, base: base + width], xcols_b)
            out = out.at[:, base: base + width].set(res2)
            continue
        if (kind == "roll" and HAVE_PALLAS and not interpret
                and not (sampled_threshold > 0 and S >= sampled_threshold
                         and key is not None)):
            kernel = partial(_bucket_repulsion_roll_kernel, S=S, dim=dim,
                             repel=repel, eps=eps)
            res2 = pl.pallas_call(
                kernel,
                grid=(m_b // C,),
                in_specs=[pl.BlockSpec((ES.D_PAD, C * S), lambda i: (0, i))],
                out_specs=pl.BlockSpec((ES.D_PAD, C * S), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((ES.D_PAD, width), jnp.float32),
                interpret=interpret,
            )(xT_deg[:, base: base + width])
            out = out.at[:, base: base + width].set(res2)
            continue
        use_kernel = kind in ("gram", True)
        # 3D view so the kernel never splits the lane dimension
        seg3 = xT_deg[:, base: base + width].reshape(ES.D_PAD, m_b, S)
        if (sampled_threshold > 0 and S >= sampled_threshold
                and key is not None):
            res = _bucket_repulsion_sampled(
                seg3, jax.random.fold_in(key, base), num_samples, repel, eps,
                dim)
        elif use_kernel and HAVE_PALLAS and not interpret:
            grid = m_b // C
            kernel = partial(_bucket_repulsion_kernel, C=C, S=S, dim=dim,
                             repel=repel, eps=eps)
            res = pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec((ES.D_PAD, C, S),
                                       lambda i: (0, i, 0))],
                out_specs=pl.BlockSpec((ES.D_PAD, C, S),
                                       lambda i: (0, i, 0)),
                out_shape=jax.ShapeDtypeStruct((ES.D_PAD, m_b, S),
                                               jnp.float32),
                interpret=interpret,
            )(seg3)
        elif m_b * S * S * 4 <= 512 << 20:
            # batched gram while the [m_b, S, S] interaction tensor stays
            # modest (<= 512 MiB) -- one einsum, compile-size O(1)
            res = _gram_batch_xla(seg3, repel, eps)
        elif S <= 512:
            # many small/medium aggregates past the byte budget (e.g. a
            # chunk-kernel bucket whose transposed view outgrew HBM):
            # lax.map over LARGE slices of the aggregate axis -- a per-
            # aggregate map would run hundreds of thousands of sequential
            # steps
            res = _gram_batch_sliced(seg3, repel, eps)
        else:
            # giant aggregates: row-blocked gram per aggregate (a full
            # [S, S] interaction tensor would be gigabytes)
            res = _gram_blocked_xla(seg3, dim, repel, eps)
        out = out.at[:, base: base + width].set(
            res.reshape(ES.D_PAD, width))
    return out


def _bucket_repulsion_sampled(x3, key, num_samples: int, repel: float,
                              eps: float, dim: int):
    """Per-aggregate negative-sampling repulsion estimator over one bucket.

    x3: [D_PAD, m_b, S] slot block (coords rows 0..dim-1, deg/validity row
    D_PAD-1).  Members are packed at offsets [0, cnt_b) of each aggregate's
    range (prepare_refine), so sampling offset = floor(u * cnt_b) draws
    uniformly from the aggregate's members; the estimator and its self-pair
    masking follow forces.repulsion_sampled with n := cnt_b per aggregate."""
    d_pad, m_b, S = x3.shape
    K = num_samples
    dval = x3[ES.D_PAD - 1]                                  # [m_b, S]
    valid = dval >= 0.0
    cnt = jnp.sum(valid, axis=-1)                            # [m_b]
    w_i = jnp.where(valid, dval + 1.0, 0.0)
    y = jnp.where(valid[None], x3[:dim], 0.0)                # [dim, m_b, S]

    u = jax.random.uniform(key, (m_b, K))
    idx = jnp.minimum((u * cnt[:, None]).astype(jnp.int32),
                      jnp.maximum(cnt[:, None] - 1, 0))      # [m_b, K]
    take = jnp.broadcast_to(idx[None], (dim, m_b, K))
    ys = jnp.take_along_axis(y, take, axis=2)                # [dim, m_b, K]
    dval_s = jnp.take_along_axis(dval, idx, axis=1)          # [m_b, K]
    w_s = dval_s + 1.0                                       # samples valid

    sq = jnp.sum(y * y, axis=0)                              # [m_b, S]
    sqs = jnp.sum(ys * ys, axis=0)                           # [m_b, K]
    cross = jnp.einsum("dms,dmk->msk", y, ys,
                       precision=jax.lax.Precision.HIGHEST)  # cancellation: see forces.py
    d2 = sq[:, :, None] + sqs[:, None, :] - 2.0 * cross
    dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), eps)
    W = w_s[:, None, :] / (dist * dist * dist)               # [m_b, S, K]
    own = jax.lax.broadcasted_iota(jnp.int32, (m_b, S, 1), 1)
    W = jnp.where(idx[:, None, :] == own, 0.0, W)
    gathered = jnp.einsum("msk,dmk->dms", W, ys,
                          precision=jax.lax.Precision.HIGHEST)
    f = y * jnp.sum(W, axis=-1)[None] - gathered             # [dim, m_b, S]
    scale = (cnt.astype(jnp.float32) / K)[None, :, None]
    f = (repel * w_i)[None] * f * scale
    out = jnp.zeros((ES.D_PAD, m_b, S), jnp.float32)
    return out.at[:dim].set(jnp.where(valid[None], f, 0.0))


def _gram_batch_sliced(x3, repel: float, eps: float,
                       max_bytes: int = 256 << 20):
    """_gram_batch_xla over slices of the aggregate axis: [d, m, S] split
    into ceil(m/per) slices with per*S*S*4 <= max_bytes, mapped with
    lax.map (one trace, few large steps).  Ghost-padded slices contribute
    nothing (dval = -1 -> weight 0 on both sides)."""
    d, m, S = x3.shape
    per = max(1, max_bytes // (S * S * 4))
    k = -(-m // per)
    pad = k * per - m
    if pad:
        ghost = jnp.zeros((d, pad, S), x3.dtype).at[ES.D_PAD - 1].set(-1.0)
        x3 = jnp.concatenate([x3, ghost], axis=1)
    sl = jnp.moveaxis(x3.reshape(d, k, per, S), 1, 0)      # [k, d, per, S]
    res = jax.lax.map(lambda seg: _gram_batch_xla(seg, repel, eps), sl)
    return jnp.moveaxis(res, 0, 1).reshape(d, k * per, S)[:, :m]


# padded-bytes ceiling for the chunk kernel's transposed coordinate view
# ([width/128, 128, D_PAD] pads D_PAD -> 128 lanes: 512 B/slot)
_XCOLS_MAX_BYTES = 2 << 30


def _gram_blocked_xla(x3, dim: int, repel: float, eps: float):
    """Giant-aggregate repulsion: per aggregate, the row-blocked gram of
    forces.repulsion_gram over its contiguous slot slice.  x3: [d, m, S].

    ``lax.map`` over the aggregate axis traces the per-aggregate body ONCE:
    the round-2 Python loop inlined it m_b times, and at power-law levels
    (rmat22 has hundreds of oversize snowballs) the unrolled HLO drove the
    remote compiler into the multi-hour range -- the round-2 LJ-scale
    'stall' after radii level 0."""
    def one(seg):                                      # seg: [D_PAD, S]
        dval = seg[ES.D_PAD - 1]
        valid = dval >= 0.0
        deg_p1 = jnp.where(valid, dval + 1.0, 0.0)
        coords = seg[:dim].T                           # [S, dim]
        rep = F.repulsion_gram(coords, deg_p1, repel, eps, block=1024)
        full = jnp.zeros((ES.D_PAD, seg.shape[1]), jnp.float32)
        return full.at[:dim, :].set(
            jnp.where(valid[:, None], rep, 0.0).T)

    return jnp.moveaxis(jax.lax.map(one, jnp.moveaxis(x3, 1, 0)), 0, 1)


def _gram_batch_xla(x3, repel: float, eps: float):
    """Same math as the kernel, plain XLA (contiguous slices, no gathers);
    used for oversize buckets and interpret-mode tests.  x3: [d, m, S]."""
    dval = x3[ES.D_PAD - 1]
    valid = dval >= 0.0
    w = jnp.where(valid, dval + 1.0, 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, x3.shape, 0)
    yc = jnp.where(row == ES.D_PAD - 1, 0.0, x3)
    sq = jnp.sum(yc * yc, axis=0)
    cross = jnp.einsum("dms,dmt->mst", yc, yc,
                       precision=jax.lax.Precision.HIGHEST)  # cancellation: see forces.py
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * cross
    dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), eps)
    W = w[:, None, :] / (dist * dist * dist)
    S = x3.shape[-1]
    eye = jnp.eye(S, dtype=bool)
    W = jnp.where(eye[None] | ~valid[:, None, :], 0.0, W)
    gathered = jnp.einsum("mst,dmt->dms", W, yc)
    f = yc * jnp.sum(W, axis=-1)[None] - gathered
    f = (repel * w)[None] * f
    return jnp.where(valid[None], f, 0.0)


def refine_forces(coords, layout: RefineLayout, pull_slot,
                  params: MultilevelFAParams, dim: int,
                  interpret: bool = False, key=None):
    """Total per-slot force of one refinement iteration (slot space);
    semantics of multilevel.ml_forces (forceatlas.hpp:390-475).  ``key``
    enables the sampled estimator for oversize buckets (see
    bucket_repulsion); without one, repulsion is exact everywhere."""
    n_slots = layout.n_slots
    eps = params.epsilon
    valid = layout.valid_slot
    deg_p1 = layout.deg_loc + 1.0
    # pack coords + deg into one [D_PAD, n_slots] stream for repulsion
    xT = jnp.zeros((ES.D_PAD, n_slots), jnp.float32)
    xT = xT.at[:dim, :].set(coords.T)
    xT_deg = xT.at[ES.D_PAD - 1, :].set(
        jnp.where(valid, layout.deg_loc, -1.0))
    repT = bucket_repulsion(xT_deg, layout, params.repel, eps, dim=dim,
                            interpret=interpret, key=key,
                            num_samples=params.num_negative_samples,
                            sampled_threshold=params.sampled_slots_threshold)
    rep = repT[:dim, :].T
    # intra attraction via windowed SpMV over slots (tiles.n_pad >= n_slots)
    xT_att = jnp.pad(xT, ((0, 0), (0, layout.tiles.n_pad - n_slots)))
    attT = ES.attraction_spmv(xT_att, layout.tiles, layout.deg_w_att,
                              attract=params.attract, interpret=interpret,
                              dmax=4 if dim <= 4 else ES.D_PAD,
                              x_precision=params.x_precision)
    att = attT[:dim, : n_slots].T
    mag = jnp.maximum(jnp.sqrt(jnp.sum(coords * coords, axis=1)), eps)
    ext = pull_slot / mag[:, None]
    grav = -(coords / mag[:, None]) * (params.gravity * deg_p1)[:, None]
    f = rep + att + ext + grav
    return jnp.where(valid[:, None], f, 0.0)


def refine_level_tiled(g: Graph, part: Partition, coords_A, r_A, dim: int,
                       *, key=None, iterations: int = 100,
                       params: MultilevelFAParams | None = None,
                       layout: RefineLayout | None = None,
                       interpret: bool | None = None, coords0=None):
    """Drop-in for multilevel.force_atlas_multilevel on TPU.

    ``coords0``: optional [n, dim] warm-start member offsets in the local
    aggregate frame (same contract as force_atlas_multilevel)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    params = params or MultilevelFAParams()
    if key is None:
        key = jax.random.PRNGKey(0)
    if layout is None:
        layout = prepare_refine(g, part, params)

    # per-slot external pull (cut edges), computed once in slot space
    from .multilevel import external_pull

    pull_v = external_pull(g, part, jnp.asarray(coords_A), pull=params.pull,
                           eps=params.epsilon)              # [n, d] vertex
    pull_slot = jnp.zeros((layout.n_slots, dim), jnp.float32).at[
        layout.slot_of_vertex].set(pull_v.astype(jnp.float32))

    key, rep_key = jax.random.split(key)
    if coords0 is None:
        coords0 = jax.random.uniform(key, (layout.n_slots, dim),
                                     dtype=jnp.float32, minval=-1.0,
                                     maxval=1.0)
    else:
        coords0 = jnp.zeros((layout.n_slots, dim), jnp.float32).at[
            layout.slot_of_vertex].set(jnp.asarray(coords0, jnp.float32))
    coords0 = jnp.where(layout.valid_slot[:, None], coords0, 0.0)

    out_slots = _refine_loop(coords0, layout, pull_slot,
                             jnp.asarray(coords_A, jnp.float32),
                             jnp.asarray(r_A, jnp.float32), params,
                             iterations, dim, interpret, rep_key)
    return out_slots[layout.slot_of_vertex]


@partial(jax.jit, static_argnames=("params", "iterations", "dim",
                                   "interpret"))
def _refine_loop(coords0, layout: RefineLayout, pull_slot, coords_A, r_A,
                 params: MultilevelFAParams, iterations: int, dim: int,
                 interpret: bool, rep_key=None):
    n_slots = layout.n_slots
    eps = params.epsilon
    deg_p1 = layout.deg_loc + 1.0
    valid = layout.valid_slot

    def forces(coords, i):
        key_i = (jax.random.fold_in(rep_key, i)
                 if rep_key is not None else None)
        return refine_forces(coords, layout, pull_slot, params, dim,
                             interpret, key=key_i)

    def body(i, carry):
        coords, fprev = carry
        f = forces(coords, i)
        new_coords = F.speed_update(coords, f, fprev, deg_p1, ks=params.ks,
                                    ksmax=params.ksmax,
                                    tolerate=params.tolerate,
                                    swing_clamp_eps=eps)
        new_coords = jnp.where(valid[:, None], new_coords, coords)
        return new_coords, f

    fprev = jnp.zeros_like(coords0)
    coords, _ = jax.lax.fori_loop(0, iterations, body, (coords0, fprev))

    # epilogue in slot space (forceatlas.hpp:539-570)
    agg = layout.agg_of_slot
    mm = layout.num_aggs
    ones = jnp.where(valid, 1.0, 0.0)
    cnt = jax.ops.segment_sum(ones, agg, num_segments=mm + 1)[:mm]
    mean = jax.ops.segment_sum(
        jnp.where(valid[:, None], coords, 0.0), agg,
        num_segments=mm + 1)[:mm] / jnp.maximum(cnt, 1.0)[:, None]
    agg_c = jnp.clip(agg, 0, mm - 1)
    centered = coords - mean[agg_c]
    norms = jnp.where(valid, jnp.sqrt(jnp.sum(centered * centered, axis=1)),
                      0.0)
    mx = jax.ops.segment_max(norms, agg, num_segments=mm + 1)[:mm]
    mx = jnp.maximum(mx, eps)
    placed = coords_A[agg_c] + (r_A[agg_c] / mx[agg_c])[:, None] * centered
    return jnp.where(valid[:, None], placed, 0.0)
