"""Block-sparse-row (BSR) SpMM: dense MXU adjacency blocks for local graphs.

Why this exists (the measured wall of the packed Pallas kernels,
ops/pallas/edge_spmm.py): gather/scatter-as-one-hot-matmul pads the
coordinate dimension (M = 8) up to the MXU's 128 rows, so every edge costs
~10^5 *padded* MACs and the windowed kernel tops out ~19 ms on a 12.6M-edge
mesh.  The adjacency is STATIC across ForceAtlas iterations -- so for
(sender_block x receiver_window) pairs that hold enough edges, materialize
the dense [SB, W] bf16 weight block ONCE and make each iteration a batched
matmul:

    y[d, p, SB] = sum_W  blocks[p, SB, W] * x[d, window(p), W]

gather of x windows and scatter-add of y blocks happen at *block*
granularity (256-wide rows), where XLA's ~18ns/row gather cost is amortized
to ~0.07ns/element.  No Pallas needed; XLA's batched dot hits the MXU
directly.  The cost is HBM: 2*SB*W bytes per resident pair (131 KB at
256x256), so pairs below ``min_pair_edges`` go to a packed/COO overflow path
and ``max_bytes`` caps the total.  Weights are bf16 (exact for unit weights,
same contract as the packed 'bf16' path); x stays f32-exact via a hi/lo
split (two bf16 passes).

Reference role: this is the attraction SpMV of forceAtlas
(include/forceatlas.hpp:169-203) -- the TPU-native formulation, not a
transcription.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import Graph

D_PAD = 8
BSR_SB = 256
BSR_W = 256


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BsrBlocks:
    """Dense-block representation of the (locality-rich part of the) graph.

    blocks: [P, SB, W] bf16 -- blocks[p, i, j] = w(sb[p]*SB + i, rw[p]*W + j).
    sb, rw: [P] sender-block / receiver-window ids of each resident pair.
    overflow_*: COO edges of pairs too sparse to densify (XLA segment path).
    """

    blocks: jnp.ndarray
    sb: jnp.ndarray
    rw: jnp.ndarray
    overflow_s: jnp.ndarray
    overflow_r: jnp.ndarray
    overflow_w: jnp.ndarray
    n_sblocks: int
    density: float          # edges / dense slots over resident pairs
    coverage: float         # fraction of edges that went dense
    sender_block: int = BSR_SB
    window: int = BSR_W

    def tree_flatten(self):
        return ((self.blocks, self.sb, self.rw, self.overflow_s,
                 self.overflow_r, self.overflow_w),
                (self.n_sblocks, self.density, self.coverage,
                 self.sender_block, self.window))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_pairs(self) -> int:
        return int(self.blocks.shape[0])

    @property
    def num_overflow(self) -> int:
        return int(self.overflow_s.shape[0])

    @property
    def n_pad(self) -> int:
        import math

        unit = math.lcm(self.sender_block, self.window)
        n = self.n_sblocks * self.sender_block
        return -(-n // unit) * unit

    @property
    def nbytes(self) -> int:
        return self.num_pairs * self.sender_block * self.window * 2


def plan_bsr(g: Graph, *, min_pair_edges: int = 64,
             sender_block: int = BSR_SB, window: int = BSR_W):
    """Host-side pair census: how much of the graph densifies.

    Returns (coverage, resident_bytes) without building anything -- used by
    the auto path selection."""
    s, r, _ = g.to_coo_numpy()
    key = (s // sender_block).astype(np.int64) * (1 << 32) + r // window
    _, counts = np.unique(key, return_counts=True)
    dense = counts >= min_pair_edges
    cov = float(counts[dense].sum()) / max(s.size, 1)
    return cov, int(dense.sum()) * sender_block * window * 2


def build_bsr(g: Graph, *, weights=None, edge_mask=None,
              min_pair_edges: int = 64, sender_block: int = BSR_SB,
              window: int = BSR_W) -> BsrBlocks:
    """Build the dense blocks.  Host computes pair metadata; the O(E) block
    scatter runs on device (the blocks never exist in host RAM)."""
    s, r, w = g.to_coo_numpy()
    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
    if edge_mask is not None:
        w = np.where(np.asarray(edge_mask), w, 0.0)
    n_sblocks = max((g.n + sender_block - 1) // sender_block, 1)

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
        dense_pair = counts >= min_pair_edges
        is_dense = dense_pair[kid]
    else:
        counts = np.zeros(0, dtype=np.int64)
        kid = np.zeros(0, dtype=np.int64)
        dense_pair = np.zeros(0, dtype=bool)
        is_dense = np.zeros(0, dtype=bool)

    ovf_s, ovf_r, ovf_w = s[~is_dense], r[~is_dense], w[~is_dense]
    ds, dr, dw, dkid = s[is_dense], r[is_dense], w[is_dense], kid[is_dense]
    if dkid.size:
        _, pid = np.unique(dkid, return_inverse=True)
        P = int(pid.max()) + 1
        first = np.concatenate([[True], pid[1:] != pid[:-1]])
        pair_sb = (ds[first] // sender_block).astype(np.int32)
        pair_rw = (dr[first] // window).astype(np.int32)
    else:
        P = 0
        pid = np.zeros(0, dtype=np.int64)
        pair_sb = pair_rw = np.zeros(0, dtype=np.int32)

    P_eff = max(P, 1)
    # device-side scatter-set: (s, r) pairs are unique in a CSR graph, so a
    # plain set (no add) in bf16 is exact to the bf16 rounding of w.  2D
    # index space (P*SB can exceed nothing; P*SB*W would overflow int32)
    rows = pid * sender_block + (ds % sender_block).astype(np.int64)
    cols = (dr % window).astype(np.int64)
    blocks = jnp.zeros((P_eff * sender_block, window), jnp.bfloat16)
    if rows.size:
        blocks = blocks.at[jnp.asarray(rows.astype(np.int32)),
                           jnp.asarray(cols.astype(np.int32))].set(
            jnp.asarray(w[is_dense].astype(np.float32)).astype(jnp.bfloat16))
    blocks = blocks.reshape(P_eff, sender_block, window)

    dense_edges = int(is_dense.sum())
    density = dense_edges / max(P_eff * sender_block * window, 1)
    coverage = dense_edges / max(s.size, 1)
    if P == 0:
        pair_sb = np.zeros(1, np.int32)
        pair_rw = np.zeros(1, np.int32)
    return BsrBlocks(blocks=blocks,
                     sb=jnp.asarray(pair_sb), rw=jnp.asarray(pair_rw),
                     overflow_s=jnp.asarray(ovf_s.astype(np.int32)),
                     overflow_r=jnp.asarray(ovf_r.astype(np.int32)),
                     overflow_w=jnp.asarray(ovf_w.astype(np.float32)),
                     n_sblocks=n_sblocks, density=density, coverage=coverage,
                     sender_block=sender_block, window=window)


def spmv_bsr(xT, bsr: BsrBlocks):
    """y^T [D_PAD, n_pad] = (A x)^T.  Jit-compatible; all shapes static."""
    n_pad = bsr.n_pad
    assert xT.shape == (D_PAD, n_pad), (xT.shape, n_pad)
    W, SB = bsr.window, bsr.sender_block
    nwin = n_pad // W

    xwin = xT.reshape(D_PAD, nwin, W)[:, bsr.rw, :]          # [d, P, W]
    # f32-exact x through two bf16 MXU passes (blocks are bf16 by contract)
    x_hi = xwin.astype(jnp.bfloat16)
    x_lo = (xwin - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    y = (jnp.einsum("psw,dpw->dps", bsr.blocks, x_hi,
                    preferred_element_type=jnp.float32)
         + jnp.einsum("psw,dpw->dps", bsr.blocks, x_lo,
                      preferred_element_type=jnp.float32))   # [d, P, SB]
    out = jax.ops.segment_sum(jnp.swapaxes(y, 0, 1), bsr.sb,
                              num_segments=n_pad // SB)      # [nsb, d, SB]
    out = jnp.swapaxes(out, 0, 1).reshape(D_PAD, n_pad)
    if bsr.num_overflow:
        s, r = bsr.overflow_s, bsr.overflow_r
        vals = xT[:, r] * bsr.overflow_w[None, :]
        out = out + jax.ops.segment_sum(vals.T, s,
                                        num_segments=n_pad).T
    return out


def bsr_row_sums(bsr: BsrBlocks) -> np.ndarray:
    """[n_pad] row sums exactly as spmv_bsr applies them (bf16 block weights
    + f32 overflow weights)."""
    sums = jnp.sum(bsr.blocks.astype(jnp.float32), axis=2)   # [P, SB]
    nsb = bsr.n_pad // bsr.sender_block
    deg = jax.ops.segment_sum(sums, bsr.sb, num_segments=nsb)
    deg = np.asarray(deg).reshape(-1)
    if bsr.num_overflow:
        np.add.at(deg, np.asarray(bsr.overflow_s, dtype=np.int64),
                  np.asarray(bsr.overflow_w, dtype=np.float64).astype(np.float32))
    return deg.astype(np.float32)
