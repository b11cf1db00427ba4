"""Pallas TPU kernel: edge-tiled attraction SpMM via one-hot MXU gathers.

Why this kernel exists (SURVEY.md SS7 hard-part #4): XLA lowers per-edge
gathers/scatters (coords[receivers], segment_sum) to ~18ns-per-row loops on
TPU -- ~5e7 rows/s, three orders of magnitude off the >=1e9 edges/s target.
The TPU-native formulation turns both the gather and the scatter into MXU
matmuls:

* coordinates live transposed, ``xT [d_pad, n_pad]`` (vertices along lanes);
* vertices are grouped into 128-wide blocks; edges are sorted by
  (sender_block, receiver_block) and packed into fixed-size tiles that each
  touch exactly one block pair;
* inside the kernel, gathering the T receiver coordinates of a tile is
  ``xJ [d,128] @ onehot [128,T] -> [d,T]`` (one-hot built on the VPU by an
  iota compare), and scattering the per-edge force contributions back is
  ``contrib [d,T] @ onehot_s^T [T,128] -> [d,128]`` -- both systolic-array
  work at thousands of MACs/edge of headroom;
* tiles of one sender block are consecutive in the grid, so the output block
  stays resident in VMEM and accumulates across revisits (the matmul-K-loop
  pattern); per-edge weight constants (use_weights/delta/nohubs folding) are
  precomputed on the host so only the linlog flag remains in-kernel.

Tiling quality depends on vertex-ordering locality -- use
``graph.reorder`` (RCM or partition-based) first; meshes/roadnets and
partition-clustered graphs pack densely.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imports fail gracefully on builds without TPU support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from ...graph.csr import Graph

BLOCK = 128   # lane width: vertices per block
D_PAD = 8     # sublane pad for the coordinate dimension


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EdgeTiles:
    """Host-built tiling of an edge list for the SpMM kernel.

    sb, rb:  [num_tiles] sender/receiver block ids (sorted by sb).
    first:   [num_tiles] 1 where a tile is the first of its sender block.
    sloc:    [num_tiles, T] local sender index within the sender block.
    rloc:    [num_tiles, T] local receiver index within the receiver block.
    wt:      [num_tiles, T] folded per-edge weight constant (0 = pad slot).
    n_blocks: number of 128-vertex blocks (defines the padded vertex count).
    fill:    fraction of tile slots holding real edges (packing quality).
    """

    sb: np.ndarray
    rb: np.ndarray
    first: np.ndarray
    sloc: np.ndarray
    rloc: np.ndarray
    wt: np.ndarray
    n_blocks: int
    tile: int
    fill: float

    def tree_flatten(self):
        return ((self.sb, self.rb, self.first, self.sloc, self.rloc,
                 self.wt), (self.n_blocks, self.tile, self.fill))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_tiles(self) -> int:
        return int(self.sb.shape[0])

    @property
    def n_pad(self) -> int:
        return self.n_blocks * BLOCK


def fold_edge_weights(weights, deg_senders, *, use_weights: bool,
                      delta: float, nohubs: bool):
    """Per-edge multiplicative constant c_e of the attraction magnitude
    (forceatlas.hpp:180-196): fa = g(dist) * c_e with g = dist (or
    log1p(dist) under linlog) and
      c_e = w            (delta == 1)
      c_e = 1            (delta == 0)
      c_e = sign(w)|w|^delta  otherwise
    all divided by (deg_i + 1) when nohubs.  use_weights=False sets w = 1."""
    w = weights if use_weights else np.ones_like(weights)
    if delta == 1.0:
        c = w
    elif delta == 0.0:
        c = np.ones_like(w)
    else:
        c = np.sign(w) * np.abs(w) ** delta
    if nohubs:
        c = c / (deg_senders + 1.0)
    return c


def build_edge_tiles(g: Graph, *, tile: int = 512, weights=None,
                     edge_mask=None) -> EdgeTiles:
    """Sort edges by (sender_block, receiver_block) and pack into tiles.

    ``weights``: optional [num_edges] folded constants (default: raw edge
    weights).  ``edge_mask``: optional bool[num_edges] -- masked-out edges
    get weight 0 (used for intra-aggregate attraction in the multilevel
    refinement).  Pure numpy; one-time per level.
    """
    s, r, w = g.to_coo_numpy()
    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
    if edge_mask is not None:
        w = np.where(np.asarray(edge_mask), w, 0.0)
    n_blocks = max((g.n + BLOCK - 1) // BLOCK, 1)

    sblk = s // BLOCK
    rblk = r // BLOCK
    order = np.lexsort((rblk, sblk))
    s, r, w, sblk, rblk = s[order], r[order], w[order], sblk[order], rblk[order]

    pair_key = sblk.astype(np.int64) * n_blocks + rblk
    if pair_key.size:
        new_pair = np.concatenate([[True], pair_key[1:] != pair_key[:-1]])
        pair_id = np.cumsum(new_pair) - 1
        counts = np.bincount(pair_id)
        pair_s = sblk[new_pair]
        pair_r = rblk[new_pair]
    else:
        counts = np.zeros(0, dtype=np.int64)
        pair_s = pair_r = np.zeros(0, dtype=np.int64)

    tiles_per_pair = np.maximum(-(-counts // tile), 1) if counts.size else counts
    # ensure every sender block appears at least once (so its output block is
    # zero-initialized by the kernel even if it has no edges)
    blocks_with_edges = set(pair_s.tolist())
    missing = [b for b in range(n_blocks) if b not in blocks_with_edges]

    num_tiles = int(tiles_per_pair.sum()) + len(missing)
    sb = np.zeros(num_tiles, dtype=np.int32)
    rb = np.zeros(num_tiles, dtype=np.int32)
    first = np.zeros(num_tiles, dtype=np.int32)
    sloc = np.zeros((num_tiles, tile), dtype=np.int32)
    rloc = np.zeros((num_tiles, tile), dtype=np.int32)
    wt = np.zeros((num_tiles, tile), dtype=np.float32)

    # fill tiles pair by pair (pairs are already sorted by sender block)
    t = 0
    e = 0
    prev_sb = -1
    for p in range(counts.size):
        c = int(counts[p])
        b_s, b_r = int(pair_s[p]), int(pair_r[p])
        off = 0
        while off < c or (off == 0 and c == 0):
            take = min(tile, c - off)
            sb[t] = b_s
            rb[t] = b_r
            first[t] = 1 if b_s != prev_sb else 0
            prev_sb = b_s
            sl = s[e + off: e + off + take] % BLOCK
            rl = r[e + off: e + off + take] % BLOCK
            sloc[t, :take] = sl
            rloc[t, :take] = rl
            wt[t, :take] = w[e + off: e + off + take]
            off += take
            t += 1
            if take == 0:
                break
        e += c
    for b in missing:
        sb[t] = b
        rb[t] = 0
        first[t] = 1
        t += 1
    assert t == num_tiles

    # grid order must keep sender blocks contiguous: stable-sort by sb
    order_t = np.argsort(sb[:t], kind="stable")
    sb, rb, sloc, rloc, wt = (sb[order_t], rb[order_t], sloc[order_t],
                              rloc[order_t], wt[order_t])
    first = np.zeros_like(sb)
    first[0] = 1
    first[1:] = sb[1:] != sb[:-1]

    fill = float((wt != 0).sum()) / max(wt.size, 1)
    return EdgeTiles(sb=sb, rb=rb, first=first, sloc=sloc, rloc=rloc, wt=wt,
                     n_blocks=n_blocks, tile=tile, fill=fill)


def _attraction_kernel(sb_ref, rb_ref, first_ref, sloc_ref, rloc_ref, wt_ref,
                       xs_ref, xr_ref, out_ref, *, tile: int, attract: float,
                       linlog: bool, eps: float):
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    sl = sloc_ref[0, 0, :]                                 # [T]
    rl = rloc_ref[0, 0, :]
    w = wt_ref[0, 0, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, tile), 0)
    onehot_r = (rl[None, :] == lane).astype(jnp.float32)   # [128, T]
    onehot_s = (sl[None, :] == lane).astype(jnp.float32)   # [128, T]
    xj = xr_ref[...]                                       # [d_pad, 128]
    xi = xs_ref[...]
    # HIGHEST precision: the MXU natively multiplies in bf16; gathering f32
    # coordinates through a one-hot must not truncate them
    xr = jnp.dot(xj, onehot_r, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)           # [d, T]
    xs = jnp.dot(xi, onehot_s, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    diff = xr - xs
    if linlog:
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=0, keepdims=True))
        dist = jnp.maximum(dist, eps)
        coef = attract * w[None, :] * jnp.log1p(dist) / dist
    else:
        # plain FA: fa/dist = c_e exactly -- no distance needed
        coef = attract * w[None, :]
    contrib = diff * coef                                  # [d, T]
    out_ref[...] += jnp.dot(contrib, onehot_s.T,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)


def attraction_tiled(xT, tiles: EdgeTiles, *, attract: float = 1.0,
                     linlog: bool = False, eps: float = 1e-5,
                     interpret: bool = False):
    """F_att^T [d_pad, n_pad] from transposed coords xT [d_pad, n_pad].

    The per-edge semantics match forces.attraction_csr given the folded
    weight constants in ``tiles.wt`` (test-verified).
    """
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    n_pad = tiles.n_pad
    assert xT.shape == (D_PAD, n_pad), (xT.shape, n_pad)
    T = tiles.tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # sb, rb, first
        grid=(tiles.num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda t, sb, rb, fr: (t, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda t, sb, rb, fr: (t, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda t, sb, rb, fr: (t, 0, 0)),
            pl.BlockSpec((D_PAD, BLOCK), lambda t, sb, rb, fr: (0, sb[t])),
            pl.BlockSpec((D_PAD, BLOCK), lambda t, sb, rb, fr: (0, rb[t])),
        ],
        out_specs=pl.BlockSpec((D_PAD, BLOCK),
                               lambda t, sb, rb, fr: (0, sb[t])),
    )
    kernel = partial(_attraction_kernel, tile=T, attract=attract,
                     linlog=linlog, eps=eps)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D_PAD, n_pad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(tiles.sb), jnp.asarray(tiles.rb), jnp.asarray(tiles.first),
      jnp.asarray(tiles.sloc.reshape(-1, 1, T)),
      jnp.asarray(tiles.rloc.reshape(-1, 1, T)),
      jnp.asarray(tiles.wt.reshape(-1, 1, T)),
      xT, xT)


def pad_coords_T(coords, n_pad: int):
    """[n, d] -> transposed padded [D_PAD, n_pad] float32."""
    n, d = coords.shape
    assert d <= D_PAD
    xT = jnp.zeros((D_PAD, n_pad), jnp.float32)
    return xT.at[:d, :n].set(coords.T.astype(jnp.float32))


def unpad_coords_T(xT, n: int, d: int):
    return xT[:d, :n].T




def _split_dot(a, b):
    """f32-accurate matmul in two bf16 MXU passes: a is split into a bf16
    high part and a bf16 residual; b (a one-hot) is bf16-exact."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    bb = b.astype(jnp.bfloat16)
    return (jnp.dot(a_hi.astype(jnp.bfloat16), bb,
                    preferred_element_type=jnp.float32)
            + jnp.dot(a_lo.astype(jnp.bfloat16), bb,
                      preferred_element_type=jnp.float32))



# v4: windowed SpMV kernel -- the production fast path.
#
# Profiling on TPU v5e showed the per-grid-step cost is dominated by a fixed
# ~120ns per *stream* per step (3 streams: packed slab, x window, output
# block), not by compute, so v4 minimizes streams x steps:
#   * the kernel computes ONLY the SpMV  y_i = sum_j w_ij x_j ; the
#     -x_i * sum_j w_ij term of plain-FA attraction is a global elementwise
#     op left to XLA;
#   * vertices are grouped into SENDER BLOCKS of ``sender_block`` lanes
#     (output granularity) and RECEIVER WINDOWS of ``window`` lanes (gather
#     granularity); both default to 256, which on mesh-ordered graphs makes
#     the average (block, window) pair hold about one tile of edges --
#     near-unit fill and a minimal step count;
#   * per edge, sender-local index, window-local receiver index and the bf16
#     weight are packed into ONE int32:
#         word = wbits16 << 16 | rloc << bits_s | sloc
#     (requires log2(sender_block) + log2(window) <= 16; bf16 -> f32 is
#     exact zero-padding, so the weight decode is a mask + bitcast; unit
#     weights are exact);
#   * gather and scatter are one-hot MXU matmuls in two bf16 passes
#     (hi/lo split) for f32-exact coordinates.
# Weighted graphs see bf16-rounded weights on this path; the v1 kernel keeps
# full-f32 weights and the linlog/distance-dependent variants.
# ---------------------------------------------------------------------------

JUMBO_JOIN_MIN = 2048   # window lanes from which unit packing takes the
                        # full-vreg-join kernel over v7
JUMBO_VARIANT = "v9"    # which full-vreg-join variant 'auto' resolves to
                        # ("v9" plain builds / "v10" factored one-hots)
JUMBO_GROUP = 4         # slabs per grid step on the scattered fast path
                        # (prepare_tiled pair-pads unit tiles at jumbo
                        # windows; measured v9 19.5 -> v9p4 17.7 ms/iter)


def jumbo_group(tiles) -> int:
    """Slabs per grid step for the scattered fast path.  k=8 beats k=4 by
    ~1-4% when per-block slab runs are long (the pad-to-k-multiple waste is
    then ~2%: measured v12p4 13.05 -> v12p8 12.74/12.60 ms natural and
    12.37 -> 12.15 ordered on rmat(20,8) @ 4096/4096/T1024,
    scripts/v12_ab.py round 4); short runs (small graphs, refinement slot
    spaces) keep k=4, where padding each sender block's slab run to a
    k-multiple would cost more than the per-step overhead saved."""
    blocks = max(int(tiles.n_sblocks), 1)
    return 8 if tiles.num_tiles / blocks >= 64 else JUMBO_GROUP
SENDER_BLOCK = 256      # default output-block lanes
WIN_BLOCKS = 2          # default receiver window, in units of SENDER_BLOCK/2
WINDOW = 256            # default receiver-window lanes


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class WindowTiles:
    """Slabs keyed by (sender_block, receiver_window).

    ``sbf`` packs the sender block id and the first-slab flag into one int32
    (sb << 1 | first) -- scalar-prefetch arrays live in the 1MB SMEM, so
    metadata is two words per slab.  Edges whose (block, window) pair holds
    fewer than ``min_pair_edges`` entries are diverted to the ``overflow_*``
    COO arrays (XLA segment path) so scattered long-range edges cannot
    explode the slab count.

    ``packing`` selects the per-edge word layout:
      'bf16'  wbits16 << 16 | rloc << bits_s | sloc  (index bits <= 16)
      'unit'  1 << 31 | rloc << bits_s | sloc        (index bits <= 31);
              every edge weighs exactly 1.0 and the sign bit marks a live
              slot.  Frees the weight bits so blocks/windows can grow to
              512x512+ -- fewer (block, window) pairs means fewer grid steps,
              which is where the measured per-step pipeline cost lives.
    """

    sbf: np.ndarray       # [S] int32: sender block << 1 | first-flag
    rw: np.ndarray        # [S] receiver window ids
    packed: np.ndarray    # [S, 1, T] int32 packed edge words
    overflow_s: np.ndarray
    overflow_r: np.ndarray
    overflow_w: np.ndarray
    n_sblocks: int
    tile: int
    fill: float
    sender_block: int = SENDER_BLOCK
    window: int = WINDOW
    packing: str = "bf16"
    # static block-aligned slab ranges (slab_lo, slab_hi, blk_lo, blk_hi);
    # non-empty when the slab count exceeds MAX_SLABS_PER_CALL, in which
    # case the SpMV runs one pallas_call per range (the sbf+rw scalar
    # prefetch costs 8B/slab of the 1MB SMEM).  Every sender block has at
    # least one slab by construction, so the ranges tile [0, n_sblocks)
    chunks: tuple = ()
    # slabs per grid step (pair_window_tiles): > 1 means per-block slab
    # counts are padded to this multiple and 'auto' dispatches v9p<group>
    group: int = 1

    def tree_flatten(self):
        return ((self.sbf, self.rw, self.packed, self.overflow_s,
                 self.overflow_r, self.overflow_w),
                (self.n_sblocks, self.tile, self.fill, self.sender_block,
                 self.window, self.packing, self.chunks, self.group))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_overflow(self) -> int:
        return int(self.overflow_s.shape[0])

    @property
    def num_tiles(self) -> int:
        return int(self.sbf.shape[0])

    @property
    def n_pad(self) -> int:
        # padded so both the last sender block and receiver window are full
        import math

        unit = math.lcm(self.sender_block, self.window)
        n = self.n_sblocks * self.sender_block
        return -(-n // unit) * unit


# slabs per pallas_call: the (sbf, rw) scalar-prefetch arrays cost 8B/slab
# of the 1MB SMEM; 64k slabs = 512KB leaves headroom.  Larger tilings run
# as multiple block-aligned calls (chunks field) whose outputs concatenate.
MAX_SLABS_PER_CALL = 65536


def _slab_chunks(sbf, max_slabs: int = MAX_SLABS_PER_CALL) -> tuple:
    """Static block-aligned (slab_lo, slab_hi, blk_lo, blk_hi) ranges; ()
    when one call suffices.  A block's slab count is bounded by the window
    count (n_pad/window << max_slabs), so block-aligned splits always make
    progress."""
    S = int(sbf.shape[0])
    if S <= max_slabs:
        return ()
    sb = np.asarray(sbf) >> 1
    out = []
    lo = 0
    while lo < S:
        hi = min(lo + max_slabs, S)
        if hi < S:
            b = sb[hi]
            while hi > lo and sb[hi - 1] == b:
                hi -= 1
        out.append((int(lo), int(hi), int(sb[lo]), int(sb[hi - 1]) + 1))
        lo = hi
    return tuple(out)


def build_window_tiles(g: Graph, *, tile: int = 512, weights=None,
                       edge_mask=None, min_pair_edges: int = 0,
                       sender_block: int = SENDER_BLOCK,
                       window: int = WINDOW,
                       packing: str = "bf16") -> WindowTiles:
    """Pack edges into (sender_block, receiver_window) slabs (host, numpy)."""
    bits_s = sender_block.bit_length() - 1
    bits_r = window.bit_length() - 1
    assert sender_block == 1 << bits_s and window == 1 << bits_r
    if packing == "bf16":
        assert bits_s + bits_r <= 16, "index bits must fit below the bf16 weight"
    elif packing == "unit":
        assert bits_s + bits_r <= 31, "index bits must fit below the valid bit"
    else:
        # 'wide': a separate f32 weight plane ([S, 2, T] packed words) buys
        # 31 index bits AND exact weights -- the jumbo-window tier of
        # TieredTiles needs both (weighted graphs at 2048+-wide windows)
        assert packing == "wide", packing
        assert bits_s + bits_r <= 31, "index bits must fit in an int32"
    assert sender_block % 128 == 0 and window % 128 == 0

    s, r, w = g.to_coo_numpy()
    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
    if edge_mask is not None:
        w = np.where(np.asarray(edge_mask), w, 0.0)
    # zero-weight (masked) edges contribute nothing to the SpMV -- drop them
    # before tiling.  This is not just waste trimming: a masked edge still
    # occupies a (block, window) pair, and scattered zero-weight edges can
    # fragment the slab list arbitrarily (the multilevel refinement masks
    # inter-aggregate edges; at 2.1M vertices that packed 719k slabs whose
    # scalar-prefetch metadata alone exceeded the 1MB SMEM at compile time)
    keep_e = w != 0.0
    if not np.all(keep_e):
        s, r, w = s[keep_e], r[keep_e], w[keep_e]
    if packing == "unit":
        assert np.all(w == 1.0), "unit packing requires unit weights"
    n_sblocks = max((g.n + sender_block - 1) // sender_block, 1)

    if packing != "wide" and min_pair_edges <= 1 and s.size >= 1 << 16:
        # hot host path (np.lexsort ~10s at 12.5M edges): the native radix
        # sort + linear packer is bit-identical (tests/test_native_pack.py)
        try:
            from ...native import pack_lib

            sbf, rw, packed, _ = pack_lib.pack_tiles(
                s, r, None if packing == "unit" else w, g.n,
                sender_block=sender_block, window=window, tile=tile)
            S = int(sbf.shape[0])
            fill = float(np.count_nonzero(packed)) / max(packed.size, 1)
            zi = np.zeros(0, dtype=np.int32)
            return WindowTiles(sbf=sbf, rw=rw,
                               packed=packed.reshape(S, 1, tile),
                               overflow_s=zi, overflow_r=zi,
                               overflow_w=np.zeros(0, dtype=np.float32),
                               n_sblocks=n_sblocks, tile=tile, fill=fill,
                               sender_block=sender_block, window=window,
                               packing=packing, chunks=_slab_chunks(sbf))
        except Exception:
            pass

    sblk = (s // sender_block).astype(np.int64)
    rwin = (r // window).astype(np.int64)
    order = np.lexsort((rwin, sblk))
    s, r, w, sblk, rwin = s[order], r[order], w[order], sblk[order], rwin[order]

    nwin = max(-(-(n_sblocks * sender_block) // window), 1)
    key = sblk * nwin + rwin
    if key.size:
        new = np.concatenate([[True], key[1:] != key[:-1]])
        kid = np.cumsum(new) - 1
        counts = np.bincount(kid)
        if min_pair_edges > 1:
            is_ovf = (counts < min_pair_edges)[kid]
        else:
            is_ovf = np.zeros(s.size, dtype=bool)
        ovf_s, ovf_r, ovf_w = s[is_ovf], r[is_ovf], w[is_ovf]
        keep = ~is_ovf
        s, r, w, sblk, rwin, kid = (s[keep], r[keep], w[keep], sblk[keep],
                                    rwin[keep], kid[keep])
        if kid.size:
            _, kid = np.unique(kid, return_inverse=True)
            counts = np.bincount(kid)
            new = np.concatenate([[True], kid[1:] != kid[:-1]])
            k_s = sblk[new]
            k_w = rwin[new]
        else:
            counts = np.zeros(0, dtype=np.int64)
            k_s = k_w = np.zeros(0, dtype=np.int64)
    else:
        counts = np.zeros(0, dtype=np.int64)
        k_s = k_w = np.zeros(0, dtype=np.int64)
        ovf_s = ovf_r = np.zeros(0, dtype=np.int64)
        ovf_w = np.zeros(0, dtype=np.float64)

    tiles_per = -(-counts // tile) if counts.size else counts
    blocks_seen = set(k_s.tolist())
    # dummy slabs for every edgeless sender block up to the lcm-padded
    # vertex count, so ALL output columns are zero-initialized (a block the
    # grid never visits would return uninitialized memory)
    import math

    unit = math.lcm(sender_block, window)
    n_out_blocks = (-(-(n_sblocks * sender_block) // unit) * unit
                    ) // sender_block
    missing = [b for b in range(n_out_blocks) if b not in blocks_seen]
    S = int(tiles_per.sum()) + len(missing)

    sb = np.zeros(S, dtype=np.int32)
    rw = np.zeros(S, dtype=np.int32)
    planes = 2 if packing == "wide" else 1
    packed = np.zeros((S, planes, tile), dtype=np.int32)

    sloc = (s % sender_block).astype(np.int32)
    rloc = (r % window).astype(np.int32)
    if packing == "unit":
        word = (rloc << bits_s) | sloc | np.int32(-(1 << 31))
    elif packing == "wide":
        # index word + separate f32 weight plane; dead slots carry weight
        # bits 0 so their (0, 0)-pointing gather/scatter contributes exactly
        # nothing (the v8 invariant, without the bf16 truncation)
        word = (rloc << bits_s) | sloc
        wplane = np.ascontiguousarray(w.astype(np.float32)).view(np.int32)
    else:
        wb = np.ascontiguousarray(w.astype(np.float32))
        wbits = wb.view(np.int32) & np.int32(-65536)  # bf16 truncation
        word = wbits | (rloc << bits_s) | sloc

    if counts.size:
        tile_base = np.concatenate([[0], np.cumsum(tiles_per)])
        starts = np.concatenate([[0], np.cumsum(counts)])
        local = np.arange(s.size) - starts[kid]
        slab_of = tile_base[kid] + local // tile
        col_of = local % tile
        packed[slab_of, 0, col_of] = word
        if packing == "wide":
            packed[slab_of, 1, col_of] = wplane
        slab_kid = np.repeat(np.arange(counts.size), tiles_per)
        sb[: slab_kid.size] = k_s[slab_kid]
        rw[: slab_kid.size] = k_w[slab_kid]
        t = int(slab_kid.size)
    else:
        t = 0
    for b in missing:
        sb[t] = b
        rw[t] = 0
        t += 1
    assert t == S

    order_t = np.argsort(sb, kind="stable")
    sb, rw, packed = sb[order_t], rw[order_t], packed[order_t]
    first = np.zeros_like(sb)
    if S:
        first[0] = 1
        first[1:] = sb[1:] != sb[:-1]
    fill = (float((packed[:, -1] != 0).sum()) / max(packed[:, -1].size, 1)
            if packing == "wide" else
            float((packed != 0).sum()) / max(packed.size, 1))
    sbf_all = (sb.astype(np.int32) << 1) | first.astype(np.int32)
    return WindowTiles(sbf=sbf_all,
                       rw=rw,
                       packed=packed.reshape(S, planes, tile),
                       overflow_s=ovf_s.astype(np.int32),
                       overflow_r=ovf_r.astype(np.int32),
                       overflow_w=ovf_w.astype(np.float32),
                       n_sblocks=n_sblocks, tile=tile, fill=fill,
                       sender_block=sender_block, window=window,
                       packing=packing, chunks=_slab_chunks(sbf_all))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TieredTiles:
    """Two (or more) window tilings over one edge set.

    Real-world (community-bearing) power-law graphs are bimodal after a
    community ordering: most edges fall in dense near-diagonal cells, but a
    scattered residual (inter-community edges, ~5-20%) spreads near-uniformly
    -- at any single (block, window) shape one of the regimes loses (dense
    cells want small windows for a small G = window/128 hi-mask tax;
    scattered cells are near-empty unless block*window is huge).  Tiers fix
    the shape per regime: tier i claims the cells holding >= threshold_i
    edges at its shape, the last tier (jumbo blocks) catches the rest.
    ``spmv_tiered`` sums the per-tier SpMVs; the result is exact (every edge
    lives in exactly one tier)."""

    tiers: tuple  # of WindowTiles

    def tree_flatten(self):
        return (tuple(self.tiers),), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_pad(self) -> int:
        return max(t.n_pad for t in self.tiers)

    @property
    def num_overflow(self) -> int:
        return sum(t.num_overflow for t in self.tiers)

    @property
    def num_tiles(self) -> int:
        return sum(t.num_tiles for t in self.tiers)

    @property
    def fill(self) -> float:
        slots = sum(t.packed.size for t in self.tiers)
        live = sum(t.fill * t.packed.size for t in self.tiers)
        return live / max(slots, 1)


def build_tiered_tiles(g: Graph, *, specs, thresholds, weights=None,
                       packing: str = "bf16") -> TieredTiles:
    """Build a TieredTiles: ``specs`` = [(sender_block, window, tile), ...]
    coarse-to-jumbo; ``thresholds`` = per-tier min edges/cell to claim a
    cell (len(specs) - 1 entries -- the last tier takes every remaining
    edge)."""
    assert len(thresholds) == len(specs) - 1
    s, r, w = g.to_coo_numpy()
    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
    remaining = w != 0.0
    tiers = []
    for i, (B, W, T) in enumerate(specs):
        if i < len(specs) - 1:
            nwin = max(-(-g.n // W), 1)
            cell = (s // B) * nwin + (r // W)
            live_cells, counts = np.unique(cell[remaining],
                                           return_counts=True)
            claim = remaining & np.isin(
                cell, live_cells[counts >= thresholds[i]])
        else:
            claim = remaining
        pk = packing
        if pk == "bf16" and (B.bit_length() + W.bit_length() - 2) > 16:
            pk = "wide"  # jumbo shapes: f32 weight plane + 31 index bits
        tiers.append(build_window_tiles(
            g, tile=T, weights=w, edge_mask=claim, sender_block=B,
            window=W, packing=pk))
        remaining = remaining & ~claim
    return TieredTiles(tuple(tiers))


def spmv_tiered(xT, tiles: TieredTiles, *, interpret: bool = False,
                dmax: int = D_PAD):
    """y^T = (A x)^T summed over tiers.  ``xT`` is [D_PAD, tiles.n_pad]
    (the max over tiers); smaller tiers see a column-slice view."""
    n_pad = tiles.n_pad
    y = None
    for t in tiles.tiers:
        yi = spmv_windowed(xT[:, : t.n_pad], t, interpret=interpret,
                           dmax=dmax)
        if yi.shape[1] < n_pad:
            yi = jnp.pad(yi, ((0, 0), (0, n_pad - yi.shape[1])))
        y = yi if y is None else y + yi
    return y


def tiered_row_sums(tiles: TieredTiles) -> np.ndarray:
    n_pad = tiles.n_pad
    out = np.zeros(n_pad, np.float32)
    for t in tiles.tiers:
        out[: t.n_pad] += tiled_row_sums(t)
    return out


def _spmv_kernel_v4(sbf_ref, rw_ref, slab_ref, xw_ref, out_ref, *,
                    tile: int, window: int, sender_block: int):
    t = pl.program_id(0)

    @pl.when((sbf_ref[t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bits_s = sender_block.bit_length() - 1
    word = slab_ref[0, :, :]                                   # [1, T] int32
    w = pltpu.bitcast(word & jnp.int32(-65536), jnp.float32)   # [1, T]
    rl = (word >> bits_s) & (window - 1)
    sl = word & (sender_block - 1)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (window, tile), 0)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (sender_block, tile), 0)
    oh_r = (rl == lane_w).astype(jnp.float32)                  # [W, T]
    oh_s = (sl == lane_b).astype(jnp.float32)                  # [SB, T]
    xr = _split_dot(xw_ref[...], oh_r)                         # [d, T]
    y = xr * w                                                 # [d, T]
    out_ref[...] += _split_dot(y, oh_s.T)


def _spmv_kernel_v6(sbf_ref, rw_ref, slab_ref, xw_ref, out_ref, *,
                    tile: int, window: int, sender_block: int):
    """Unit-weight variant: no weight bits, validity = sign bit.  Invalid
    slots point their *scatter* one-hot out of range (no column match), so no
    weight multiply happens at all; the SpMV is two one-hot matmul pairs."""
    t = pl.program_id(0)

    @pl.when((sbf_ref[t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bits_s = sender_block.bit_length() - 1
    word = slab_ref[0, :, :]                                   # [1, T] int32
    valid = word < 0
    rl = (word >> bits_s) & (window - 1)
    sl = jnp.where(valid, word & (sender_block - 1), sender_block)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (window, tile), 0)
    if sender_block == window:
        lane_b = lane_w
    else:
        lane_b = jax.lax.broadcasted_iota(jnp.int32, (sender_block, tile), 0)
    oh_r = (rl == lane_w).astype(jnp.float32)                  # [W, T]
    oh_s = (sl == lane_b).astype(jnp.float32)                  # [SB, T]
    xr = _split_dot(xw_ref[...], oh_r)                         # [d, T]
    out_ref[...] += _split_dot(xr, oh_s.T)


def _spmv_kernel_v7(sbf_ref, rw_ref, slab_ref, xw_ref, out_ref, *,
                    tile: int, window: int, sender_block: int,
                    dmax: int = D_PAD):
    """Factorized-one-hot variant of the unit-weight SpMV.

    Measured on v5e: the [window, T] iota-compare one-hot construction is the
    kernel's dominant cost -- (window + sender_block) VPU compares per edge
    slot (~1T compares/s), not the MXU matmuls and not the grid overhead
    alone.  Factorize each local index as hi*128 + lo: one shared [128, T]
    lo-one-hot (128 compares/slot) plus (window/128) cheap [1, T] hi-masks,
    with one K=128 MXU pass per hi value.  Total MAC is unchanged; VPU work
    drops ~3x, making 512-1024-wide windows (fewer, fuller slabs) affordable.

    ``dmax``: coordinate rows actually carrying data (3D layouts use 3 of
    the 8 padded rows); trimming the stacked matmuls to 2*dmax*G rows halves
    the MAC count at dmax=4 vs the full D_PAD=8, and doubling the window
    restores the full M=128 at half the MACs/edge.
    """
    t = pl.program_id(0)

    @pl.when((sbf_ref[t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bits_s = sender_block.bit_length() - 1
    word = slab_ref[0, :, :]                                   # [1, T] int32
    valid = word < 0
    rl = (word >> bits_s) & (window - 1)
    sl = jnp.where(valid, word & (sender_block - 1), sender_block)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, tile), 0)  # [128, T]
    oh_rlo = ((rl & (BLOCK - 1)) == lane).astype(jnp.bfloat16)
    oh_slo = (jnp.where(valid, sl & (BLOCK - 1), BLOCK) == lane
              ).astype(jnp.bfloat16)
    r_hi = rl >> 7                                             # [1, T]
    s_hi = sl >> 7
    d = dmax

    # f32-exact hi+lo residual rows AND all hi-slices stacked along M: the
    # whole gather is ONE [(W/128)*2d, 128] @ [128, T] matmul (M = 64 at
    # W=512, M = 128 at W=1024 -- the full MXU), the scatter one
    # [(SB/128)*2d, T] @ [T, 128].  The padded-M matmul issue count is the
    # measured cost driver; stacking cut the SpMV 24 -> ~13 ms on the bench
    # mesh vs the per-slice version.
    G = window // BLOCK
    S = sender_block // BLOCK
    xw = xw_ref[...][:d]
    xw_hi = xw.astype(jnp.bfloat16)
    xw_lo = (xw - xw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    xg = jnp.concatenate(
        [part[:, g * BLOCK:(g + 1) * BLOCK]
         for g in range(G) for part in (xw_hi, xw_lo)], axis=0)  # [2dG, 128]
    ph = jnp.dot(xg, oh_rlo, preferred_element_type=jnp.float32)  # [2dG, T]
    xr = jnp.zeros((d, tile), jnp.float32)
    for g in range(G):
        xr = xr + (ph[2 * d * g:2 * d * g + d]
                   + ph[2 * d * g + d:2 * d * (g + 1)]
                   ) * (r_hi == g).astype(jnp.float32)

    xr_hi = xr.astype(jnp.bfloat16)
    xr_lo = (xr - xr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ys = jnp.concatenate(
        [part * (s_hi == h).astype(jnp.bfloat16)
         for h in range(S) for part in (xr_hi, xr_lo)], axis=0)  # [2dS, T]
    ch = jnp.dot(ys, oh_slo.T, preferred_element_type=jnp.float32)
    for h in range(S):
        out_ref[:d, h * BLOCK:(h + 1) * BLOCK] += (
            ch[2 * d * h:2 * d * h + d] + ch[2 * d * h + d:2 * d * (h + 1)])


def _onehot128_factored(idx, tile, dtype):
    """[128, T] one-hot of idx [1, T] built from 8x16 digit one-hots.

    The direct iota-compare build costs 128 compare + 128 cast vreg-rows;
    the digit form costs 24 compare/cast rows + 128 bf16 multiply rows
    (row j = a*16+b gets oh8[a] * oh16[b]) -- ~30% fewer VPU issues, and
    the products are exact 0/1 in any dtype.  Out-of-range idx (ghost
    slots >= 128) gets digit a >= 8 and matches nothing, preserving the
    plain build's no-match convention."""
    a = idx >> 4
    b = idx & 15
    ia = jax.lax.broadcasted_iota(jnp.int32, (8, tile), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (16, tile), 0)
    oh_a = (a == ia).astype(dtype)                             # [8, T]
    oh_b = (b == ib).astype(dtype)                             # [16, T]
    return jnp.concatenate([oh_a[i:i + 1] * oh_b for i in range(8)],
                           axis=0)                             # [128, T]


def _spmv_kernel_v9(sbf_ref, rw_ref, slab_ref, xw_ref, out_ref, *,
                    tile: int, window: int, sender_block: int,
                    dmax: int = D_PAD, factored_oh: bool = False):
    """Full-vreg-join variant of v7 for JUMBO windows (unit packing).

    At scattered-graph shapes (4096x4096 cells, G = S = 32 sub-blocks) the
    v7 hi-digit joins dominate: per hi value it runs several [1, T] / [d, T]
    partial-sublane ops (a [1, T] op occupies a whole 8-sublane vreg row, so
    7/8 of the issue is waste).  v9 restructures both joins around full
    [2d, T] tiles:

    * ONE [G, T] hi-digit one-hot (single iota compare) replaces G separate
      [1, T] compare+cast pairs; row g is sliced off per step;
    * the gather join keeps the bf16 hi/lo residual parts STACKED ([2d, T]
      multiply-accumulate per hi value) and folds hi+lo once at the end --
      exact, because each slot matches exactly one hi digit so every other
      term is a true zero;
    * the scatter join multiplies one pre-stacked [2d, T] y-tile by the
      sliced s-hi mask (one op per hi value instead of two).

    Bit-identical to v7 (same products, zeros elsewhere); dispatched for
    unit packing when window/sender_block reach JUMBO_JOIN_MIN lanes."""
    t = pl.program_id(0)

    @pl.when((sbf_ref[t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bits_s = sender_block.bit_length() - 1
    word = slab_ref[0, :, :]                                   # [1, T] int32
    valid = word < 0
    rl = (word >> bits_s) & (window - 1)
    sl = jnp.where(valid, word & (sender_block - 1), sender_block)
    slo = jnp.where(valid, sl & (BLOCK - 1), BLOCK)
    if factored_oh:
        oh_rlo = _onehot128_factored(rl & (BLOCK - 1), tile, jnp.bfloat16)
        oh_slo = _onehot128_factored(slo, tile, jnp.bfloat16)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, tile), 0)
        oh_rlo = ((rl & (BLOCK - 1)) == lane).astype(jnp.bfloat16)
        oh_slo = (slo == lane).astype(jnp.bfloat16)
    d = dmax
    G = window // BLOCK
    S = sender_block // BLOCK
    r_hi = rl >> 7                                             # [1, T]
    s_hi = sl >> 7
    gi = jax.lax.broadcasted_iota(jnp.int32, (G, tile), 0)
    hi_mask_r = (r_hi == gi).astype(jnp.float32)               # [G, T]
    si = jax.lax.broadcasted_iota(jnp.int32, (S, tile), 0)
    hi_mask_s = (s_hi == si).astype(jnp.bfloat16)              # [S, T]

    xw = xw_ref[...][:d]
    xw_hi = xw.astype(jnp.bfloat16)
    xw_lo = (xw - xw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    xg = jnp.concatenate(
        [part[:, g * BLOCK:(g + 1) * BLOCK]
         for g in range(G) for part in (xw_hi, xw_lo)], axis=0)  # [2dG, 128]
    ph = jnp.dot(xg, oh_rlo, preferred_element_type=jnp.float32)  # [2dG, T]
    acc = jnp.zeros((2 * d, tile), jnp.float32)
    for g in range(G):
        acc = acc + ph[2 * d * g:2 * d * (g + 1)] * hi_mask_r[g:g + 1]
    xr = acc[:d] + acc[d:]                                     # [d, T]

    xr_hi = xr.astype(jnp.bfloat16)
    xr_lo = (xr - xr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    y2 = jnp.concatenate([xr_hi, xr_lo], axis=0)               # [2d, T] bf16
    ys = jnp.concatenate(
        [y2 * hi_mask_s[h:h + 1] for h in range(S)], axis=0)   # [2dS, T]
    ch = jnp.dot(ys, oh_slo.T, preferred_element_type=jnp.float32)
    for h in range(S):
        out_ref[:d, h * BLOCK:(h + 1) * BLOCK] += (
            ch[2 * d * h:2 * d * h + d] + ch[2 * d * h + d:2 * d * (h + 1)])


def _spmv_kernel_v11(sbf_ref, rw_ref, slab_ref, xw_ref, out_ref, *,
                     tile: int, window: int, sender_block: int,
                     dmax: int = D_PAD):
    """v9 with the bf16 hi/lo coordinate split hoisted OUT of the kernel.

    ``xw_ref`` carries a PRE-SPLIT stream: rows 0:d = bf16-rounded hi part
    (f32 container), rows d:2d = the residual lo part (requires 2d <=
    D_PAD).  v9 recomputes cast/sub/cast on the [d, window] block in every
    slab (~96 vreg-rows); here one [2d, window] cast remains.  Bit-identical
    to v9 (same hi/lo values, same matmul layouts)."""
    t = pl.program_id(0)

    @pl.when((sbf_ref[t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bits_s = sender_block.bit_length() - 1
    word = slab_ref[0, :, :]                                   # [1, T] int32
    valid = word < 0
    rl = (word >> bits_s) & (window - 1)
    sl = jnp.where(valid, word & (sender_block - 1), sender_block)
    slo = jnp.where(valid, sl & (BLOCK - 1), BLOCK)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, tile), 0)
    oh_rlo = ((rl & (BLOCK - 1)) == lane).astype(jnp.bfloat16)
    oh_slo = (slo == lane).astype(jnp.bfloat16)
    d = dmax
    G = window // BLOCK
    S = sender_block // BLOCK
    r_hi = rl >> 7                                             # [1, T]
    s_hi = sl >> 7
    gi = jax.lax.broadcasted_iota(jnp.int32, (G, tile), 0)
    hi_mask_r = (r_hi == gi).astype(jnp.float32)               # [G, T]
    si = jax.lax.broadcasted_iota(jnp.int32, (S, tile), 0)
    hi_mask_s = (s_hi == si).astype(jnp.bfloat16)              # [S, T]

    xw_b = xw_ref[...][:2 * d].astype(jnp.bfloat16)            # [2d, W]
    xg = jnp.concatenate(
        [xw_b[:, g * BLOCK:(g + 1) * BLOCK] for g in range(G)],
        axis=0)                                                # [2dG, 128]
    ph = jnp.dot(xg, oh_rlo, preferred_element_type=jnp.float32)  # [2dG, T]
    acc = jnp.zeros((2 * d, tile), jnp.float32)
    for g in range(G):
        acc = acc + ph[2 * d * g:2 * d * (g + 1)] * hi_mask_r[g:g + 1]
    xr = acc[:d] + acc[d:]                                     # [d, T]

    xr_hi = xr.astype(jnp.bfloat16)
    xr_lo = (xr - xr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    y2 = jnp.concatenate([xr_hi, xr_lo], axis=0)               # [2d, T] bf16
    ys = jnp.concatenate(
        [y2 * hi_mask_s[h:h + 1] for h in range(S)], axis=0)   # [2dS, T]
    ch = jnp.dot(ys, oh_slo.T, preferred_element_type=jnp.float32)
    for h in range(S):
        out_ref[:d, h * BLOCK:(h + 1) * BLOCK] += (
            ch[2 * d * h:2 * d * h + d] + ch[2 * d * h + d:2 * d * (h + 1)])


def _spmv_kernel_vnull(sbf_ref, rw_ref, slab_ref, xw_ref, out_ref, *,
                       tile: int, window: int, sender_block: int,
                       dmax: int = D_PAD):
    """Diagnostic no-compute kernel: identical grid + streams (packed slab,
    x window, revisited output block) with the per-slab math removed.  Its
    measured ms/iter is the BlockSpec pipeline's fixed cost -- the
    irreducible floor any per-slab compute optimization converges to.
    Never dispatched automatically; request variant='vnull' explicitly."""
    t = pl.program_id(0)

    @pl.when((sbf_ref[t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    w0 = slab_ref[0, :, 0:BLOCK].astype(jnp.float32)       # [1, 128]
    out_ref[0:1, 0:BLOCK] += w0 * 1e-30 + xw_ref[0:1, 0:BLOCK] * 1e-30


def pair_window_tiles(tiles: WindowTiles, k: int = 2) -> WindowTiles:
    """Pad each sender block's slab list to a multiple of ``k`` with dummy
    slabs (packed 0 = no valid slots under unit packing) so a kernel can
    process ``k`` slabs per grid step without pairs straddling blocks.
    Host-side; apply BEFORE device_put."""
    assert tiles.packing == "unit", "pairing implemented for unit packing"
    import dataclasses as _dc

    sb = (tiles.sbf >> 1).astype(np.int64)
    # lcm padding can add dummy output blocks past n_sblocks -- cover them
    counts = np.bincount(sb)
    pad = (-counts) % k
    if pad.sum() == 0:
        return _dc.replace(tiles, group=k)
    S, planes, T = tiles.packed.shape
    total = S + int(pad.sum())
    sbf2 = np.zeros(total, np.int32)
    rw2 = np.zeros(total, np.int32)
    packed2 = np.zeros((total, planes, T), np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    pos = 0
    for b in range(counts.size):
        c = int(counts[b])
        sl = slice(starts[b], starts[b] + c)
        sbf2[pos: pos + c] = tiles.sbf[sl]
        rw2[pos: pos + c] = tiles.rw[sl]
        packed2[pos: pos + c] = tiles.packed[sl]
        pos += c
        for _ in range(int(pad[b])):
            sbf2[pos] = b << 1       # not first; zero packed = all dead
            rw2[pos] = 0
            pos += 1
    assert pos == total
    import dataclasses

    return dataclasses.replace(
        tiles, sbf=sbf2, rw=rw2, packed=packed2,
        chunks=_slab_chunks(sbf2), group=k)


def _scatter_join(word, xr, out_ref, *, tile: int, sender_block: int,
                  dmax: int, single_plane: bool = False):
    """Scatter y[sender] += xr[t] via the one-hot MXU join (the v9 tail):
    bf16 hi/lo split of xr, per-s_hi masked stack, one [2dS, T] @ [T, 128]
    matmul, fold into the resident output block.  Invalid slots carry
    sl = sender_block (no one-hot column match) so they contribute zero.

    ``single_plane``: xr values are EXACTLY bf16-representable (the v12b
    gather unpacks bf16 pairs), so the lo residual plane is identically
    zero -- skip it: half the masked-stack multiplies and matmul M-rows
    (the scatter join is the biggest VPU term, round-3 ledger)."""
    bits_s = sender_block.bit_length() - 1
    d = dmax
    S = sender_block // BLOCK
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, tile), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (S, tile), 0)
    valid = word < 0
    sl = jnp.where(valid, word & (sender_block - 1), sender_block)
    slo = jnp.where(valid, sl & (BLOCK - 1), BLOCK)
    oh_slo = (slo == lane).astype(jnp.bfloat16)
    s_hi = sl >> 7
    hi_mask_s = (s_hi == si).astype(jnp.bfloat16)

    xr_hi = xr.astype(jnp.bfloat16)
    if single_plane:
        ys = jnp.concatenate(
            [xr_hi * hi_mask_s[h:h + 1] for h in range(S)], axis=0)
        ch = jnp.dot(ys, oh_slo.T, preferred_element_type=jnp.float32)
        for h in range(S):
            out_ref[:d, h * BLOCK:(h + 1) * BLOCK] += ch[d * h:d * (h + 1)]
        return
    xr_lo = (xr - xr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    y2 = jnp.concatenate([xr_hi, xr_lo], axis=0)
    ys = jnp.concatenate(
        [y2 * hi_mask_s[h:h + 1] for h in range(S)], axis=0)
    ch = jnp.dot(ys, oh_slo.T, preferred_element_type=jnp.float32)
    for h in range(S):
        out_ref[:d, h * BLOCK:(h + 1) * BLOCK] += (
            ch[2 * d * h:2 * d * h + d]
            + ch[2 * d * h + d:2 * d * (h + 1)])


def _v9_slab_body(word, xw_ref, out_ref, *, tile: int, window: int,
                  sender_block: int, dmax: int):
    """One slab's v9 math (gather join + scatter join) accumulated into the
    resident output block; shared by the k-slabs-per-step kernels."""
    bits_s = sender_block.bit_length() - 1
    d = dmax
    G = window // BLOCK
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, tile), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (G, tile), 0)
    rl = (word >> bits_s) & (window - 1)
    oh_rlo = ((rl & (BLOCK - 1)) == lane).astype(jnp.bfloat16)
    r_hi = rl >> 7
    hi_mask_r = (r_hi == gi).astype(jnp.float32)

    xw = xw_ref[...][:d]
    xw_hi = xw.astype(jnp.bfloat16)
    xw_lo = (xw - xw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    xg = jnp.concatenate(
        [part[:, g * BLOCK:(g + 1) * BLOCK]
         for g in range(G) for part in (xw_hi, xw_lo)], axis=0)
    ph = jnp.dot(xg, oh_rlo, preferred_element_type=jnp.float32)
    acc = jnp.zeros((2 * d, tile), jnp.float32)
    for g in range(G):
        acc = acc + ph[2 * d * g:2 * d * (g + 1)] * hi_mask_r[g:g + 1]
    xr = acc[:d] + acc[d:]
    _scatter_join(word, xr, out_ref, tile=tile, sender_block=sender_block,
                  dmax=dmax)


def _spmv_kernel_v9pk(sbf_ref, rw_ref, slab_ref, *refs, tile: int,
                      window: int, sender_block: int, dmax: int = D_PAD,
                      k: int = 2):
    """k slabs per grid step (pair_window_tiles(k)-padded tiles): same
    per-slab math as v9, 1/k the per-step pipeline overhead.  A step's k
    slabs always belong to one sender block, so the zero-init check reads
    slab k*t's first flag only.  ``refs`` = k x-window refs + out_ref."""
    xw_refs, out_ref = refs[:k], refs[k]
    t = pl.program_id(0)

    @pl.when((sbf_ref[k * t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for j in range(k):
        _v9_slab_body(slab_ref[j, :, :], xw_refs[j], out_ref, tile=tile,
                      window=window, sender_block=sender_block, dmax=dmax)


# ---------------------------------------------------------------------------
# v12: hardware-gather variant.  Mosaic lowers jnp.take_along_axis on [8,128]
# vregs to tpu.dynamic_gather -- a per-vreg lane (or sublane) shuffle.  A
# two-stage gather (lane shuffle by rl&127, then sublane shuffle by
# (rl>>7)&7) selects 1-of-1024 window values in TWO VPU ops, replacing the
# v9 gather join's [128, T] one-hot build + G-term hi-digit accumulate
# (~860 vreg-issues/slab -> ~460).  Requires a packed x layout
# (pack_gather_layout): each 1024-vertex group stores coordinate c as one
# [8, 128] vreg, so the x-window block shrinks from [D_PAD, W] (8 sublanes
# regardless of d) to [8, d*W/8] -- at d=4 HALF the per-slab DMA.  Gathered
# values are exact f32 (no bf16 hi/lo reconstruction on the gather side);
# the scatter join is unchanged from v9.
# ---------------------------------------------------------------------------

def pack_gather_layout(xT, dmax: int):
    """[D_PAD, n_pad] -> [8, n_pad*dmax//8] v12 gather layout.

    Vertex v = g*1024 + sub*128 + lane, coordinate c lands at sublane
    ``sub``, column ``g*dmax*128 + c*128 + lane``: one [8, 128] vreg per
    (1024-vertex group, coordinate)."""
    D, n_pad = xT.shape
    assert n_pad % 1024 == 0, n_pad
    g = n_pad // 1024
    x = xT[:dmax].reshape(dmax, g, 8, BLOCK)
    return x.transpose(2, 1, 0, 3).reshape(8, g * dmax * BLOCK)


def pack_gather_layout_bf16(xT, dmax: int):
    """[D_PAD, n_pad] -> [8, n_pad*ceil(dmax/2)//8] int32 bf16-pair layout.

    Coordinate pair (2p, 2p+1) packs into one 32-bit word (bf16 bits of
    2p in the upper half, 2p+1 in the lower), so the v12b gather moves
    HALF the words of the f32 layout: half the window DMA and half the
    shuffle/select chains.  x is quantized to bf16 (rel err <= 2^-9 --
    the established bf16-packing tolerance class)."""
    D, n_pad = xT.shape
    assert n_pad % 1024 == 0, n_pad
    d2 = (dmax + 1) // 2
    xb = xT[:2 * d2].astype(jnp.bfloat16)
    bits = jax.lax.bitcast_convert_type(xb, jnp.uint16).astype(jnp.uint32)
    words = (bits[0::2] << 16) | bits[1::2]            # [d2, n_pad]
    w = jax.lax.bitcast_convert_type(words, jnp.int32)
    g = n_pad // 1024
    x = w.reshape(d2, g, 8, BLOCK)
    return x.transpose(2, 1, 0, 3).reshape(8, g * d2 * BLOCK)


def _v12_gather(word, xw_ref, *, tile: int, window: int, sender_block: int,
                dmax: int, bf16_x: bool = False):
    """xr[c, t] = x[receiver_local[t], c] via two-stage dynamic_gather.

    ``xw_ref`` is the pack_gather_layout block [8, (window/1024)*dmax*128].
    Per output vreg (128 slots): for each of the window's V = W/1024 vertex
    groups, one lane shuffle + one sublane shuffle into a candidate, then a
    select chain on the group digit rl>>10; coordinates pack into their
    output sublane via an iota select.  All f32-exact.

    ``bf16_x``: the pack_gather_layout_bf16 layout -- coordinate PAIRS ride
    one 32-bit word (half the planes, half the shuffles); the pair is
    unpacked to f32 after the select chain (v8's weight-bitcast trick)."""
    bits_s = sender_block.bit_length() - 1
    d = dmax
    V = window // 1024
    rl = (word >> bits_s) & (window - 1)               # [1, T]
    lane_r = rl & (BLOCK - 1)
    sub_r = (rl >> 7) & 7
    grp_r = rl >> 10
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, BLOCK), 0)
    # [1,T] -> [8,T]: Mosaic rejects vector.broadcast of replicated-sublane
    # layouts outright (both i32 and f32 when lane-sliced), so replicate
    # across sublanes the way v9's mask multiplies do -- a FULL-WIDTH
    # elementwise op against an [8,T] operand, sliced afterwards.  Index
    # values are < 2048, exactly representable in f32.
    ones8 = jnp.ones((8, tile), jnp.float32)
    lane_b = (lane_r.astype(jnp.float32) * ones8).astype(jnp.int32)
    sub_b = (sub_r.astype(jnp.float32) * ones8).astype(jnp.int32)
    grp_b = (grp_r.astype(jnp.float32) * ones8).astype(jnp.int32)
    xw = xw_ref[...]
    nplanes = (d + 1) // 2 if bf16_x else d
    cols = []
    for tv in range(tile // BLOCK):
        ts = slice(tv * BLOCK, (tv + 1) * BLOCK)
        li = lane_b[:, ts]
        si = sub_b[:, ts]
        gv = grp_b[:, ts]
        gmask = [gv == v for v in range(1, V)]
        acc = jnp.zeros((8, BLOCK), jnp.float32)
        for c in range(nplanes):
            res = None
            for v in range(V):
                src = xw[:, (v * nplanes + c) * BLOCK:
                         (v * nplanes + c + 1) * BLOCK]
                g = jnp.take_along_axis(
                    jnp.take_along_axis(src, li, axis=1), si, axis=0)
                res = g if res is None else jnp.where(gmask[v - 1], g, res)
            if bf16_x:
                hi = pltpu.bitcast(res & jnp.int32(-65536), jnp.float32)
                acc = jnp.where(ci == 2 * c, hi, acc)
                if 2 * c + 1 < d:
                    lo = pltpu.bitcast(res << 16, jnp.float32)
                    acc = jnp.where(ci == 2 * c + 1, lo, acc)
            else:
                acc = jnp.where(ci == c, res, acc)
        cols.append(acc)
    return jnp.concatenate(cols, axis=1)[:d]           # [d, T]


def _spmv_kernel_v12pk(sbf_ref, rw_ref, slab_ref, *refs, tile: int,
                       window: int, sender_block: int, dmax: int = D_PAD,
                       k: int = 1, bf16_x: bool = False):
    """k slabs per grid step with the dynamic-gather join (see above) and
    the v9 scatter join.  ``refs`` = k packed x-window refs + out_ref."""
    xw_refs, out_ref = refs[:k], refs[k]
    t = pl.program_id(0)

    @pl.when((sbf_ref[k * t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for j in range(k):
        word = slab_ref[j, :, :]
        xr = _v12_gather(word, xw_refs[j], tile=tile, window=window,
                         sender_block=sender_block, dmax=dmax,
                         bf16_x=bf16_x)
        _scatter_join(word, xr, out_ref, tile=tile,
                      sender_block=sender_block, dmax=dmax,
                      single_plane=bf16_x)


def split_coords_hi_lo(xT, dmax: int):
    """[D_PAD, n] f32 -> pre-split stream for v11: rows 0:d bf16-rounded hi
    (f32 container), rows d:2d residual lo, rest zero."""
    d = dmax
    x = xT[:d]
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi
    pad = jnp.zeros((D_PAD - 2 * d, xT.shape[1]), jnp.float32)
    return jnp.concatenate([hi, lo, pad], axis=0)


def _spmv_kernel_v8(sbf_ref, rw_ref, slab_ref, xw_ref, out_ref, *,
                    tile: int, window: int, sender_block: int,
                    dmax: int = D_PAD):
    """bf16-weight layout with the v7 factorized/stacked structure.

    Dead slots carry weight bits 0, so their (arbitrary) scatter target
    receives exactly 0 -- no validity handling needed (v4's invariant).
    The weight multiply happens once on the gathered f32 coordinates, so
    coordinate exactness matches v7; weights are bf16 by the packing
    contract (exact for unit weights)."""
    t = pl.program_id(0)

    @pl.when((sbf_ref[t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bits_s = sender_block.bit_length() - 1
    word = slab_ref[0, :, :]                                   # [1, T] int32
    w = pltpu.bitcast(word & jnp.int32(-65536), jnp.float32)   # [1, T]
    rl = (word >> bits_s) & (window - 1)
    sl = word & (sender_block - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, tile), 0)  # [128, T]
    oh_rlo = ((rl & (BLOCK - 1)) == lane).astype(jnp.bfloat16)
    oh_slo = ((sl & (BLOCK - 1)) == lane).astype(jnp.bfloat16)
    r_hi = rl >> 7
    s_hi = sl >> 7
    d = dmax
    G = window // BLOCK
    S = sender_block // BLOCK

    xw = xw_ref[...][:d]
    xw_hi = xw.astype(jnp.bfloat16)
    xw_lo = (xw - xw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    xg = jnp.concatenate(
        [part[:, g * BLOCK:(g + 1) * BLOCK]
         for g in range(G) for part in (xw_hi, xw_lo)], axis=0)  # [2dG, 128]
    ph = jnp.dot(xg, oh_rlo, preferred_element_type=jnp.float32)  # [2dG, T]
    xr = jnp.zeros((d, tile), jnp.float32)
    for g in range(G):
        xr = xr + (ph[2 * d * g:2 * d * g + d]
                   + ph[2 * d * g + d:2 * d * (g + 1)]
                   ) * (r_hi == g).astype(jnp.float32)
    y = xr * w                                                 # [d, T] f32

    y_hi = y.astype(jnp.bfloat16)
    y_lo = (y - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ys = jnp.concatenate(
        [part * (s_hi == h).astype(jnp.bfloat16)
         for h in range(S) for part in (y_hi, y_lo)], axis=0)   # [2dS, T]
    ch = jnp.dot(ys, oh_slo.T, preferred_element_type=jnp.float32)
    for h in range(S):
        out_ref[:d, h * BLOCK:(h + 1) * BLOCK] += (
            ch[2 * d * h:2 * d * h + d] + ch[2 * d * h + d:2 * d * (h + 1)])


def _spmv_kernel_vw(sbf_ref, rw_ref, slab_ref, xw_ref, out_ref, *,
                    tile: int, window: int, sender_block: int,
                    dmax: int = D_PAD):
    """'wide' packing: v8's factorized/stacked structure with the weight
    read from a separate f32 plane (exact weights, 31 index bits -- the
    jumbo-window tier).  Dead slots carry weight 0, so their (0, 0) slot
    contributes exactly nothing."""
    t = pl.program_id(0)

    @pl.when((sbf_ref[t] & 1) == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bits_s = sender_block.bit_length() - 1
    word = slab_ref[0, 0:1, :]                                 # [1, T] int32
    w = pltpu.bitcast(slab_ref[0, 1:2, :], jnp.float32)        # [1, T] f32
    rl = (word >> bits_s) & (window - 1)
    sl = word & (sender_block - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, tile), 0)  # [128, T]
    oh_rlo = ((rl & (BLOCK - 1)) == lane).astype(jnp.bfloat16)
    oh_slo = ((sl & (BLOCK - 1)) == lane).astype(jnp.bfloat16)
    r_hi = rl >> 7
    s_hi = sl >> 7
    d = dmax
    G = window // BLOCK
    S = sender_block // BLOCK

    xw = xw_ref[...][:d]
    xw_hi = xw.astype(jnp.bfloat16)
    xw_lo = (xw - xw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    xg = jnp.concatenate(
        [part[:, g * BLOCK:(g + 1) * BLOCK]
         for g in range(G) for part in (xw_hi, xw_lo)], axis=0)  # [2dG, 128]
    ph = jnp.dot(xg, oh_rlo, preferred_element_type=jnp.float32)  # [2dG, T]
    xr = jnp.zeros((d, tile), jnp.float32)
    for g in range(G):
        xr = xr + (ph[2 * d * g:2 * d * g + d]
                   + ph[2 * d * g + d:2 * d * (g + 1)]
                   ) * (r_hi == g).astype(jnp.float32)
    y = xr * w                                                 # [d, T] f32

    y_hi = y.astype(jnp.bfloat16)
    y_lo = (y - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ys = jnp.concatenate(
        [part * (s_hi == h).astype(jnp.bfloat16)
         for h in range(S) for part in (y_hi, y_lo)], axis=0)   # [2dS, T]
    ch = jnp.dot(ys, oh_slo.T, preferred_element_type=jnp.float32)
    for h in range(S):
        out_ref[:d, h * BLOCK:(h + 1) * BLOCK] += (
            ch[2 * d * h:2 * d * h + d] + ch[2 * d * h + d:2 * d * (h + 1)])


def spmv_windowed(xT, tiles: WindowTiles, *, interpret: bool = False,
                  variant: str = "auto", dmax: int = D_PAD,
                  x_precision: str = "f32"):
    """y^T [D_PAD, n_pad] = (A x)^T with A given by the window tiling.

    ``xT`` must be [D_PAD, tiles.n_pad] (use pad_coords_T with tiles.n_pad).
    ``x_precision='bf16'`` routes auto-variant selection to the v12b
    bf16-pair gather layout where it applies (unit packing, 1024-aligned
    windows); other paths ignore it.
    """
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    if x_precision not in ("f32", "bf16"):
        # a typo silently falling back to f32 would misattribute A/B runs
        raise ValueError(f"unknown x_precision {x_precision!r} "
                         "('f32' or 'bf16')")
    n_pad = tiles.n_pad
    assert xT.shape == (D_PAD, n_pad), (xT.shape, n_pad)
    T = tiles.tile
    window = tiles.window
    sblock = tiles.sender_block
    if variant == "auto":
        if tiles.packing == "unit" and tiles.group > 1:
            # grouped slabs: the dynamic-gather join when the window admits
            # [8,128]-vreg groups (measured v9p4 17.8 -> v12p4 13.0 ms/iter
            # on the bench scattered workload, scripts/v12_ab.py)
            if window % 1024 == 0:
                pk = "v12bp" if x_precision == "bf16" else "v12p"
            else:
                pk = "v9p"
            variant = f"{pk}{tiles.group}"
        elif tiles.packing == "unit" and window >= JUMBO_JOIN_MIN:
            variant = JUMBO_VARIANT
        else:
            variant = "v7"
    extra = {}
    if tiles.packing == "unit":
        if variant in ("v12", "v12p2", "v12p4", "v12p8", "v12p16"):
            if window % 1024 != 0:
                raise ValueError("v12 needs window % 1024 == 0 (the "
                                 "dynamic-gather groups are [8,128] vregs)")
            kern = _spmv_kernel_v12pk
            extra["k"] = int(variant[4:]) if len(variant) > 3 else 1
            xT = pack_gather_layout(xT, dmax)
        elif variant in ("v12b", "v12bp2", "v12bp4", "v12bp8", "v12bp16"):
            # bf16-pair x layout: half the window DMA + half the gather
            # shuffle/select chains; x quantized to bf16 (the bf16-packing
            # tolerance class) -- opt-in, the exact default stays v12
            if window % 1024 != 0:
                raise ValueError("v12b needs window % 1024 == 0")
            kern = _spmv_kernel_v12pk
            extra["k"] = int(variant[5:]) if len(variant) > 4 else 1
            extra["bf16_x"] = True
            xT = pack_gather_layout_bf16(xT, dmax)
        elif variant in ("v9p2", "v9p4", "v9p8"):
            kern = _spmv_kernel_v9pk
            extra["k"] = int(variant[-1])
        elif variant == "vnull":
            kern = _spmv_kernel_vnull
        elif variant == "v11":
            if 2 * dmax > D_PAD:
                raise ValueError(
                    f"variant='v11' splits coords into hi/lo rows and needs "
                    f"2*dmax <= D_PAD (got dmax={dmax}, D_PAD={D_PAD})")
            kern = _spmv_kernel_v11
            xT = split_coords_hi_lo(xT, dmax)
        elif variant == "v10":
            kern = _spmv_kernel_v9
            extra = {"factored_oh": True}
        elif variant == "v9":
            kern = _spmv_kernel_v9
        elif variant == "v7":
            kern = _spmv_kernel_v7
        elif variant == "v6":
            kern = _spmv_kernel_v6
        else:
            # an unrecognized string silently falling through to the slow v6
            # kernel would misattribute A/B probe results (round-3 ADVICE)
            raise ValueError(f"unknown spmv_windowed variant {variant!r} "
                             "for unit packing")
    elif tiles.packing == "wide":
        kern = _spmv_kernel_vw
    else:
        if variant in ("v7", "v8"):
            kern = _spmv_kernel_v8
        elif variant in ("v4", "v6"):
            kern = _spmv_kernel_v4
        else:
            raise ValueError(f"unknown spmv_windowed variant {variant!r} "
                             "for bf16 packing")
    if kern in (_spmv_kernel_v7, _spmv_kernel_v8, _spmv_kernel_v9,
                _spmv_kernel_v9pk, _spmv_kernel_v11, _spmv_kernel_vw,
                _spmv_kernel_v12pk):
        # rows above dmax never carry data; trimming them from the stacked
        # matmuls halves the MACs at dmax=4 (out rows dmax..D_PAD stay zero)
        extra["dmax"] = dmax
    kernel = partial(kern, tile=T, window=window, sender_block=sblock,
                     **extra)

    planes = 2 if tiles.packing == "wide" else 1

    def call(sbf, rw, packed, num_slabs, out_cols):
        if kern in (_spmv_kernel_v9pk, _spmv_kernel_v12pk):
            # k slabs per grid step; groups never straddle sender blocks
            # (pair_window_tiles pads per-block slab counts to k-multiples)
            k = extra["k"]
            assert num_slabs % k == 0, \
                f"k={k} slabs/step needs pair_window_tiles(k={k}) tiles"
            if kern is _spmv_kernel_v12pk:
                nplanes = ((dmax + 1) // 2 if extra.get("bf16_x")
                           else dmax)
                xw_shape = (8, nplanes * window // 8)
            else:
                xw_shape = (D_PAD, window)

            def xw_spec(j):
                return pl.BlockSpec(
                    xw_shape,
                    lambda t, sbf, rw, j=j: (0, rw[k * t + j]))

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(num_slabs // k,),
                in_specs=[
                    pl.BlockSpec((k, planes, T),
                                 lambda t, sbf, rw: (t, 0, 0)),
                ] + [xw_spec(j) for j in range(k)],
                out_specs=pl.BlockSpec(
                    (D_PAD, sblock),
                    lambda t, sbf, rw: (0, sbf[k * t] >> 1)),
            )
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((D_PAD, out_cols),
                                               jnp.float32),
                interpret=interpret,
            )(sbf, rw, packed, *([xT] * k))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # sbf, rw
            grid=(num_slabs,),
            in_specs=[
                pl.BlockSpec((1, planes, T), lambda t, sbf, rw: (t, 0, 0)),
                pl.BlockSpec((D_PAD, window), lambda t, sbf, rw: (0, rw[t])),
            ],
            out_specs=pl.BlockSpec((D_PAD, sblock),
                                   lambda t, sbf, rw: (0, sbf[t] >> 1)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((D_PAD, out_cols), jnp.float32),
            interpret=interpret,
        )(sbf, rw, packed, xT)

    if tiles.chunks:
        # slab count exceeds the scalar-prefetch SMEM budget: one call per
        # block-aligned range; ranges tile [0, n_sblocks) (every block has
        # at least one slab), so the outputs concatenate
        sbf_a = jnp.asarray(tiles.sbf)
        rw_a = jnp.asarray(tiles.rw)
        pk_a = jnp.asarray(tiles.packed)
        parts = []
        for (lo, hi, blo, bhi) in tiles.chunks:
            parts.append(call(sbf_a[lo:hi] - (blo << 1), rw_a[lo:hi],
                              pk_a[lo:hi], hi - lo, (bhi - blo) * sblock))
        y = jnp.concatenate(parts, axis=1)
        y = jnp.pad(y, ((0, 0), (0, n_pad - y.shape[1])))
    else:
        y = call(jnp.asarray(tiles.sbf), jnp.asarray(tiles.rw),
                 jnp.asarray(tiles.packed), tiles.num_tiles, n_pad)
    if tiles.num_overflow:
        y = y + _overflow_spmv(xT, tiles)
    return y


def _overflow_spmv(xT, tiles: WindowTiles):
    """XLA segment path for edges diverted from the tiled kernel.

    Gather ROWS of the transposed-back coords, not columns of xT: a
    column gather from the [D_PAD, n] layout touches 8 strided elements
    per edge (~90ns/edge measured on the community residual); one [n, d]
    transpose up front makes both the gather and the segment scatter
    contiguous-row ops (~2-3x less per edge)."""
    n_pad = tiles.n_pad
    s = jnp.asarray(tiles.overflow_s)
    r = jnp.asarray(tiles.overflow_r)
    w = jnp.asarray(tiles.overflow_w)
    x_rows = xT.T                                     # [n_pad, D_PAD]
    vals = x_rows[r] * w[:, None]                     # [Eo, D_PAD]
    contrib = jax.ops.segment_sum(vals, s, num_segments=n_pad)
    return contrib.T


def tiled_row_sums(tiles: WindowTiles) -> np.ndarray:
    """[n_pad] row sums exactly as the SpMV computes them: bf16-truncated
    weights for tiled edges, full f32 for overflow edges (host, numpy)."""
    S, planes, T = tiles.packed.shape
    pk = np.ascontiguousarray(tiles.packed[:, 0, :])
    sb = (tiles.sbf >> 1).astype(np.int64)
    if tiles.packing == "unit":
        w = (pk < 0).astype(np.float32)
    elif tiles.packing == "wide":
        w = np.ascontiguousarray(tiles.packed[:, 1, :]).view(np.float32)
    else:
        w = (pk & np.int32(-65536)).view(np.float32)
    sl = pk & (tiles.sender_block - 1)
    v = sb[:, None] * tiles.sender_block + sl
    deg = np.zeros(tiles.n_pad, np.float64)
    np.add.at(deg, v.ravel(), w.ravel().astype(np.float64))
    if tiles.num_overflow:
        np.add.at(deg, tiles.overflow_s.astype(np.int64),
                  tiles.overflow_w.astype(np.float64))
    return deg.astype(np.float32)


def attraction_spmv(xT, tiles: WindowTiles, deg_w, *, attract: float = 1.0,
                    interpret: bool = False, dmax: int = D_PAD,
                    x_precision: str = "f32"):
    """Plain-FA attraction via the windowed SpMV:
    F_att = attract * (A @ x - x * deg_w)  (valid for delta=1/0 paths where
    fa/dist reduces to the per-edge constant; forceatlas.hpp:176-202)."""
    y = spmv_windowed(xT, tiles, interpret=interpret, dmax=dmax,
                      x_precision=x_precision)
    return attract * (y - xT * deg_w[None, :])


# ---------------------------------------------------------------------------
# v5: manual deep-pipelined DMA variant of the windowed SpMV.
#
# The BlockSpec-pipelined v4 pays a fixed per-grid-step cost per stream; v5
# runs ONE grid step per sender block and hand-pipelines the per-slab DMAs
# (packed words + x window) with a DEPTH-slot ring of buffers/semaphores, so
# slab-level overhead is the DMA issue cost only (pallas_guide
# double-buffering pattern, deepened).
# ---------------------------------------------------------------------------

V5_DEPTH = 4


def v5_block_starts(tiles: WindowTiles) -> np.ndarray:
    """[n_sblocks + 1] slab ranges (slabs sorted by sender block; every
    block has at least one slab by construction)."""
    sb = (tiles.sbf >> 1).astype(np.int64)
    counts = np.bincount(sb, minlength=tiles.n_sblocks)
    starts = np.zeros(tiles.n_sblocks + 1, dtype=np.int32)
    starts[1:] = np.cumsum(counts)
    return starts


def _spmv_kernel_v5(start_ref, rw_ref, slab_hbm, xT_hbm, out_ref,
                    slab_buf, xw_buf, sems, *, tile: int, window: int,
                    sender_block: int):
    b = pl.program_id(0)
    lo = start_ref[b]
    hi = start_ref[b + 1]
    nslab = hi - lo
    bits_s = sender_block.bit_length() - 1

    def start_dmas(i):
        slot = jax.lax.rem(i, V5_DEPTH)
        slab = lo + i
        pltpu.make_async_copy(slab_hbm.at[slab], slab_buf.at[slot],
                              sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            xT_hbm.at[:, pl.ds(rw_ref[slab] * window, window)],
            xw_buf.at[slot], sems.at[slot, 1]).start()

    # prologue: fill the pipeline
    for k in range(V5_DEPTH - 1):
        @pl.when(k < nslab)
        def _():
            start_dmas(k)

    out_ref[...] = jnp.zeros_like(out_ref)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (window, tile), 0)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (sender_block, tile), 0)

    def body(i, _):
        slot = jax.lax.rem(i, V5_DEPTH)

        @pl.when(i + V5_DEPTH - 1 < nslab)
        def _():
            start_dmas(i + V5_DEPTH - 1)

        pltpu.make_async_copy(slab_hbm.at[lo + i], slab_buf.at[slot],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(
            xT_hbm.at[:, pl.ds(rw_ref[lo + i] * window, window)],
            xw_buf.at[slot], sems.at[slot, 1]).wait()

        word = slab_buf[slot, 0, :][None, :]                    # [1, T]
        w = pltpu.bitcast(word & jnp.int32(-65536), jnp.float32)
        rl = (word >> bits_s) & (window - 1)
        sl = word & (sender_block - 1)
        oh_r = (rl == lane_w).astype(jnp.float32)
        oh_s = (sl == lane_b).astype(jnp.float32)
        xr = _split_dot(xw_buf[slot], oh_r)
        y = xr * w
        out_ref[...] += _split_dot(y, oh_s.T)
        return 0

    jax.lax.fori_loop(0, nslab, body, 0)


def spmv_windowed_v5(xT, tiles: WindowTiles, starts=None, *,
                     interpret: bool = False):
    """v5 entry: same contract as spmv_windowed."""
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    assert tiles.packing == "bf16", "v5 decodes the bf16 word layout only"
    n_pad = tiles.n_pad
    assert xT.shape == (D_PAD, n_pad)
    T = tiles.tile
    window = tiles.window
    sblock = tiles.sender_block
    if starts is None:
        starts = jnp.asarray(v5_block_starts(tiles))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # starts, rw
        grid=(tiles.n_sblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed slabs in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # xT in HBM
        ],
        out_specs=pl.BlockSpec((D_PAD, sblock), lambda b, st, rw: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((V5_DEPTH, 1, T), jnp.int32),
            pltpu.VMEM((V5_DEPTH, D_PAD, window), jnp.float32),
            pltpu.SemaphoreType.DMA((V5_DEPTH, 2)),
        ],
    )
    kernel = partial(_spmv_kernel_v5, tile=T, window=window,
                     sender_block=sblock)
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D_PAD, n_pad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(starts), jnp.asarray(tiles.rw),
      jnp.asarray(tiles.packed), xT)
    if tiles.num_overflow:
        y = y + _overflow_spmv(xT, tiles)
    return y
