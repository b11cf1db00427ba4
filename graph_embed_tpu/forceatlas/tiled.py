"""ForceAtlas step with the Pallas edge-SpMM attraction (the TPU fast path).

Single-chip speed-of-light composition (SURVEY.md SS3.3):
  * attraction: windowed SpMV kernel (ops/pallas/edge_spmm.py) -- gathers and
    scatters as MXU one-hot matmuls, F_att = attract*(A@x - x*deg_w);
  * repulsion: sampled negative-sampling estimator as an [n, s] MXU matmul
    (or dense gram for small n) -- already MXU-shaped in XLA;
  * gravity/swing/speed: elementwise, fused by XLA.

Per-iteration semantics match ``flat.fa_step`` up to bf16-rounded edge
weights on the packed fast path (exact for unit weights) -- verified by
tests/test_tiled_step.py.  linlog needs in-kernel distances and falls back
to the v1 per-edge kernel.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import Graph
from ..utils.params import ForceAtlasParams
from ..ops.pallas import edge_spmm as ES
from . import forces as F


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TiledFA:
    """Precomputed per-graph state for the tiled FA step (host-built once).

    ``tiles`` is one of: WindowTiles (packed Pallas SpMV), EdgeTiles (v1
    per-edge kernel, linlog), ops.bsr.BsrBlocks (dense-block MXU SpMM for
    locality-rich graphs -- picked automatically when most edges densify
    within the HBM budget), or None when the DIA decomposition absorbed
    every edge.

    ``dia_offsets``/``dia_w`` hold the DIA (stencil) part of the adjacency:
    edges at a constant index offset are applied as weighted lane rolls
    (ops/dia.py) and are EXCLUDED from ``tiles``."""

    tiles: object
    deg: jnp.ndarray        # [n] reference degrees (forceatlas.hpp:127-140)
    deg_w_att: jnp.ndarray  # [n_pad] row sums exactly as the SpMV applies
    n: int
    dim: int
    interpret: bool = False  # run the kernel in interpreter mode (CPU tests)
    linlog: bool = False     # v1 per-edge kernel path (f32 weights, dist)
    dia_w: object = None     # [K, n_pad] f32 or None
    dia_offsets: tuple = ()  # K static index offsets
    n_pad_hint: int = 0      # n_pad when tiles is None (pure-DIA graphs)

    def tree_flatten(self):
        return ((self.tiles, self.deg, self.deg_w_att, self.dia_w),
                (self.n, self.dim, self.interpret, self.linlog,
                 self.dia_offsets, self.n_pad_hint))

    @classmethod
    def tree_unflatten(cls, aux, children):
        tiles, deg, deg_w_att, dia_w = children
        n, dim, interpret, linlog, dia_offsets, n_pad_hint = aux
        return cls(tiles, deg, deg_w_att, n, dim, interpret, linlog,
                   dia_w, dia_offsets, n_pad_hint)

    @property
    def n_pad(self) -> int:
        return self.tiles.n_pad if self.tiles is not None else self.n_pad_hint


UNIT_SENDER_BLOCK = 1024  # wide-slab defaults for the unit-weight packing:
UNIT_WINDOW = 2048        # with dmax=4 row-trimming the stacked gather still
UNIT_TILE = 1024          # runs at M=128 (2*4*(2048/128)) at HALF the MACs
#                           per edge; 2048-wide windows pack ~13% fuller on
#                           the bench mesh (9.91 -> 9.46 ms SpMV)

BSR_MIN_PAIR_EDGES = 64   # densify a (block, window) pair at >= 2KB/edge
BSR_MIN_COVERAGE = 0.85   # fraction of edges that must densify
# HBM budget for resident dense blocks: a 5.3GB block set built fine but
# OOMed the SpMM on the shared v5e chip, so the auto gate stays conservative
BSR_MAX_BYTES = 2 << 30


def prepare_tiled(g: Graph, dim: int, params: ForceAtlasParams,
                  *, tile: int | None = None, interpret: bool | None = None,
                  min_pair_edges: int = 0,
                  sender_block: int | None = None,
                  window: int | None = None,
                  spmv_mode: str = "auto",
                  dia_min_count: int | None = None,
                  tiered_specs=None,
                  tiered_thresholds=None) -> TiledFA:
    if interpret is None:
        # Mosaic kernels need a TPU; interpreter mode keeps the path usable
        # (slowly) on CPU backends
        interpret = jax.default_backend() == "cpu"
    s, r, w = g.to_coo_numpy()
    deg = g.degrees_numpy(params.use_weights)
    folded = ES.fold_edge_weights(w, deg[s], use_weights=params.use_weights,
                                  delta=params.delta, nohubs=params.nohubs)
    if params.linlog:
        # distance-dependent magnitude: per-edge v1 kernel (f32 weights)
        tiles = ES.build_edge_tiles(g, tile=tile or 512, weights=folded)
        deg_w = np.zeros(tiles.n_pad, np.float32)
        return TiledFA(tiles=jax.device_put(tiles),
                       deg=jnp.asarray(deg, jnp.float32),
                       deg_w_att=jnp.asarray(deg_w), n=g.n, dim=dim,
                       interpret=interpret, linlog=True)

    # unit folded weights (unweighted graphs at delta 1/0, no nohubs) take
    # the wide-slab 'unit' packing: no weight bits -> 1024x1024 blocks whose
    # block-stacked gather/scatter matmuls run at the MXU's full 128 rows.
    # Past 1.5M vertices the big-space shape rule applies (round-5 on-chip
    # sweep, scripts/shape_ab.py -- same rule as build_halo_tiles): (4096,
    # 8192) f32 / (4096, 16384) under the bf16 x layout; the small-n
    # optimum stays 1024/2048.
    unit = bool(np.all(folded == 1.0))
    big = unit and g.n > 1_500_000
    if sender_block is None:
        sender_block = (4096 if big
                        else (UNIT_SENDER_BLOCK if unit else ES.SENDER_BLOCK))
    if window is None:
        if big:
            window = 16384 if params.x_precision == "bf16" else 8192
        else:
            window = UNIT_WINDOW if unit else ES.WINDOW
    if tile is None:
        tile = UNIT_TILE if unit else 512

    if tiered_specs is not None:
        # explicit two-regime tiling (dense community cells at a small
        # shape, scattered residual at jumbo blocks -- see ES.TieredTiles)
        tiles = ES.build_tiered_tiles(
            g, specs=tiered_specs, thresholds=tiered_thresholds,
            weights=folded, packing="unit" if unit else "bf16")
        deg_w = ES.tiered_row_sums(tiles)
        tiles = jax.device_put(tiles)
        return TiledFA(tiles=tiles, deg=jnp.asarray(deg, jnp.float32),
                       deg_w_att=jnp.asarray(deg_w), n=g.n, dim=dim,
                       interpret=interpret)

    # DIA (stencil) decomposition first: edges at a dominant constant offset
    # become weighted lane rolls (ops/dia.py) -- on mesh-family graphs this
    # absorbs most (often all) edges at a fraction of the kernel's cost.
    # n_pad is fixed by (n, sender_block, window) alone, so it can be
    # computed before the residual tiling exists.
    dia = None
    if spmv_mode in ("auto", "dia"):
        import math

        from ..ops import dia as DIA

        lcm = math.lcm(sender_block, window)
        n_sblocks = max(-(-g.n // sender_block), 1)
        n_pad = -(-(n_sblocks * sender_block) // lcm) * lcm
        dia = DIA.plan_dia(s, r, folded, g.n, n_pad,
                           min_count=dia_min_count)

    # dense-block SpMM when the graph is locality-rich enough: most edges
    # fall in (256, 256) blocks holding >= BSR_MIN_PAIR_EDGES entries and the
    # resident blocks fit the HBM budget.  Pure-XLA batched matmul -- fast
    # when applicable (no one-hot construction, full-row gathers); DIA
    # coverage supersedes it.
    if dia is None and spmv_mode in ("auto", "bsr"):
        from ..ops import bsr as BS

        cov, nbytes = BS.plan_bsr(g, min_pair_edges=BSR_MIN_PAIR_EDGES)
        if spmv_mode == "bsr" or (cov >= BSR_MIN_COVERAGE
                                  and nbytes <= BSR_MAX_BYTES):
            blocks = BS.build_bsr(g, weights=folded,
                                  min_pair_edges=BSR_MIN_PAIR_EDGES)
            deg_w = BS.bsr_row_sums(blocks)
            return TiledFA(tiles=blocks, deg=jnp.asarray(deg, jnp.float32),
                           deg_w_att=jnp.asarray(deg_w), n=g.n, dim=dim,
                           interpret=interpret)

    packing = "unit" if unit else "bf16"
    if dia is not None and not dia.residual_mask.any():
        # every edge lives on a chosen diagonal: no windowed kernel at all
        deg_w = DIA.dia_row_sums(dia.weights)
        return TiledFA(tiles=None, deg=jnp.asarray(deg, jnp.float32),
                       deg_w_att=jnp.asarray(deg_w), n=g.n, dim=dim,
                       interpret=interpret,
                       dia_w=jnp.asarray(dia.weights),
                       dia_offsets=dia.offsets, n_pad_hint=n_pad)
    edge_mask = dia.residual_mask if dia is not None else None
    tiles = ES.build_window_tiles(g, tile=tile, weights=folded,
                                  edge_mask=edge_mask,
                                  min_pair_edges=min_pair_edges,
                                  sender_block=sender_block, window=window,
                                  packing=packing)
    # the -x*deg_w term must see exactly the weights the SpMV applies
    deg_w = ES.tiled_row_sums(tiles)
    if packing == "unit" and window >= ES.JUMBO_JOIN_MIN \
            and ES.JUMBO_GROUP > 1:
        # scattered-shape fast path: k slabs per grid step cuts the
        # pipeline's per-step overhead (bitwise-identical output).  deg_w
        # is computed BEFORE padding -- dead slabs carry no weight anyway.
        # Chunked (multi-call) tilings pair fine: pair_window_tiles pads
        # per-block slab counts to k-multiples and recomputes block-aligned
        # chunks (test_windowed_paired_chunked_matches) -- the old
        # not-chunks gate silently left LJ-scale graphs on the k=1 kernel
        tiles = ES.pair_window_tiles(tiles, ES.jumbo_group(tiles))
    dia_w = None
    dia_offsets = ()
    if dia is not None:
        assert tiles.n_pad == n_pad, (tiles.n_pad, n_pad)
        deg_w = deg_w + DIA.dia_row_sums(dia.weights)
        dia_w = jnp.asarray(dia.weights)
        dia_offsets = dia.offsets
    # move tile arrays to device ONCE -- numpy leaves would otherwise be
    # re-uploaded on every jitted call
    tiles = jax.device_put(tiles)
    return TiledFA(tiles=tiles, deg=jnp.asarray(deg, jnp.float32),
                   deg_w_att=jnp.asarray(deg_w), n=g.n, dim=dim,
                   interpret=interpret, dia_w=dia_w, dia_offsets=dia_offsets)


def _attraction_T(xT, tfa: TiledFA, params: ForceAtlasParams):
    """attT [D_PAD, n_pad]: the attraction term on the transposed layout,
    composed from the DIA rolls and/or the residual kernel path."""
    from ..ops import bsr as BS

    if tfa.linlog:
        return ES.attraction_tiled(xT, tfa.tiles, attract=params.attract,
                                   linlog=True, eps=params.epsilon,
                                   interpret=tfa.interpret)
    if isinstance(tfa.tiles, BS.BsrBlocks):
        y = BS.spmv_bsr(xT, tfa.tiles)
        return params.attract * (y - xT * tfa.deg_w_att[None, :])
    y = None
    if tfa.dia_offsets:
        from ..ops import dia as DIA

        y = DIA.dia_spmv(xT, tfa.dia_w, tfa.dia_offsets)
    if tfa.tiles is not None:
        dmax = 4 if tfa.dim <= 4 else ES.D_PAD
        if isinstance(tfa.tiles, ES.TieredTiles):
            ys = ES.spmv_tiered(xT, tfa.tiles, interpret=tfa.interpret,
                                dmax=dmax)
        else:
            ys = ES.spmv_windowed(xT, tfa.tiles, interpret=tfa.interpret,
                                  dmax=dmax,
                                  x_precision=params.x_precision)
        y = ys if y is None else y + ys
    return params.attract * (y - xT * tfa.deg_w_att[None, :])


def tiled_forces(coords, tfa: TiledFA, params: ForceAtlasParams, key=None):
    """Total force [n, dim] for one iteration (fast path)."""
    n, dim = tfa.n, tfa.dim
    deg_p1 = tfa.deg + 1.0
    eps = params.epsilon

    xT = ES.pad_coords_T(coords, tfa.n_pad)
    attT = _attraction_T(xT, tfa, params)
    att = ES.unpad_coords_T(attT, n, dim)

    if params.repulsion == "sampled":
        # fused estimator: keeps the [n, s] distance/weight tiles in VMEM
        # (the XLA version writes ~0.5GB of intermediates per iteration)
        from ..ops.pallas import repulsion as RP

        deg_pad = jnp.zeros(tfa.n_pad, jnp.float32).at[:n].set(deg_p1)
        repT = RP.repulsion_sampled_fused(
            xT, deg_pad, key, n=n, num_samples=params.num_negative_samples,
            repel=params.repel, eps=eps, dim=dim, interpret=tfa.interpret)
        rep = ES.unpad_coords_T(repT, n, dim)
    elif params.repulsion == "gram":
        rep = F.repulsion_gram(coords, deg_p1, params.repel, eps)
    else:
        rep = F.repulsion_exact(coords, deg_p1, params.repel, eps)
    grav = F.gravity_force(coords, deg_p1, params.gravity)
    return rep + att + grav


def fa_step_tiled(coords, forces_prev, tfa: TiledFA,
                  params: ForceAtlasParams, key=None):
    """One full iteration; contract identical to flat.fa_step."""
    f = tiled_forces(coords, tfa, params, key)
    new_coords = F.speed_update(coords, f, forces_prev, tfa.deg + 1.0,
                                ks=params.ks, ksmax=params.ksmax,
                                tolerate=params.tolerate)
    return new_coords, f


# ---------------------------------------------------------------------------
# Transposed-state iteration: the per-iteration [n, d] <-> [D_PAD, n_pad]
# relayouts of the row-major step cost ~2ms at n = 2M (several full passes
# over HBM).  Keeping the loop state transposed removes them: every force
# term already produces [D_PAD, n_pad] (attraction SpMV, fused repulsion),
# and the gravity/swing/speed reductions run over the 8 sublanes instead of
# the d columns -- numerically identical (rows dim..D_PAD are exact zeros in
# every term).  Semantics tested against fa_step_tiled.
# ---------------------------------------------------------------------------

def tiled_forces_T(xT, tfa: TiledFA, params: ForceAtlasParams, key=None):
    """Total force [D_PAD, n_pad] (transposed fast path; repulsion='sampled'
    or 'gram'/'exact' via a local relayout)."""
    n, dim = tfa.n, tfa.dim
    eps = params.epsilon

    attT = _attraction_T(xT, tfa, params)

    deg_p1_pad = jnp.zeros(tfa.n_pad, jnp.float32).at[:n].set(tfa.deg + 1.0)
    if params.repulsion == "sampled":
        from ..ops.pallas import repulsion as RP

        repT = RP.repulsion_sampled_fused(
            xT, deg_p1_pad, key, n=n, num_samples=params.num_negative_samples,
            repel=params.repel, eps=eps, dim=dim, interpret=tfa.interpret)
    else:
        coords = ES.unpad_coords_T(xT, n, dim)
        if params.repulsion == "gram":
            rep = F.repulsion_gram(coords, tfa.deg + 1.0, params.repel, eps)
        else:
            rep = F.repulsion_exact(coords, tfa.deg + 1.0, params.repel, eps)
        repT = jnp.zeros_like(xT).at[:dim, :n].set(rep.T)

    # gravity on the transposed layout: rows dim.. are zero, so the column
    # norm equals the [n, d] row norm; padded columns have deg 0 -> force 0
    mag = jnp.maximum(jnp.sqrt(jnp.sum(xT * xT, axis=0)), F.TINY)
    gravT = -(xT / mag[None, :]) * (params.gravity * deg_p1_pad)[None, :]
    return repT + attT + gravT


def fa_step_tiled_T(xT, fprevT, tfa: TiledFA, params: ForceAtlasParams,
                    key=None):
    """One full iteration on transposed state; the [:dim, :n] slice of the
    result equals fa_step_tiled's coords (tests/test_tiled_step.py).

    Sampled-repulsion graphs take the whole-iteration fused kernel
    (ops/pallas/fused_step.py): one HBM pass instead of a materialized
    force term per op.  Near DIA offsets (within one block of halo) roll
    in-kernel; far offsets and windowed-SpMV residual edges are pre-applied
    into the kernel's y_res stream."""
    from ..ops import bsr as BS
    from ..ops.pallas import fused_step as FS

    if (params.repulsion == "sampled" and key is not None
            and not tfa.linlog
            and not isinstance(tfa.tiles, BS.BsrBlocks)
            and (tfa.dia_offsets or tfa.tiles is not None)
            and FS.fused_feasible(tfa.n_pad)):
        block = FS.fused_block_for(tfa.n_pad)
        near, far = FS.split_offsets(tfa.dia_offsets, block)
        y_res = None
        if tfa.tiles is not None:
            y_res = ES.spmv_windowed(xT, tfa.tiles, interpret=tfa.interpret,
                                     dmax=4 if tfa.dim <= 4 else ES.D_PAD,
                                     x_precision=params.x_precision)
        if far:
            from ..ops import dia as DIA

            y_far = DIA.dia_spmv(xT, tfa.dia_w[np.asarray(far)],
                                 tuple(tfa.dia_offsets[k] for k in far))
            y_res = y_far if y_res is None else y_res + y_far
        if far and near:
            dia_w = tfa.dia_w[np.asarray(near)]
        else:
            dia_w = tfa.dia_w if near else None
        near_offsets = tuple(tfa.dia_offsets[k] for k in near)
        deg_p1_pad = jnp.zeros(tfa.n_pad, jnp.float32).at[:tfa.n].set(
            tfa.deg + 1.0)
        return FS.fa_step_fused(
            xT, fprevT, dia_w, near_offsets, tfa.deg_w_att,
            deg_p1_pad, key, n=tfa.n,
            num_samples=params.num_negative_samples, dim=tfa.dim,
            params=params, y_res=y_res, block=block,
            interpret=tfa.interpret)
    fT = tiled_forces_T(xT, tfa, params, key)
    swing = jnp.sqrt(jnp.sum((fT - fprevT) ** 2, axis=0))
    speed = params.ks * params.tolerate / (
        1.0 + params.tolerate * jnp.sqrt(swing))
    total_f = jnp.sqrt(jnp.sum(fT * fT, axis=0))
    constraint = jnp.where(total_f > 0,
                           params.ksmax / jnp.maximum(total_f, F.TINY),
                           jnp.inf)
    speed = jnp.minimum(speed, constraint)
    return xT + fT * speed[None, :], fT


@partial(jax.jit, static_argnames=("params", "iterations"))
def _tiled_loop_T(xT0, tfa: TiledFA, key, params, iterations: int):
    def body(i, carry):
        xT, fprevT, key = carry
        key, sub = jax.random.split(key)
        xT, fT = fa_step_tiled_T(xT, fprevT, tfa, params, sub)
        return xT, fT, key

    fprevT = jnp.zeros_like(xT0)
    xT, _, _ = jax.lax.fori_loop(0, iterations, body, (xT0, fprevT, key))
    coords = ES.unpad_coords_T(xT, tfa.n, tfa.dim)
    if params.normalize:
        coords = F.normalize_coords(coords)
    return coords


@partial(jax.jit, static_argnames=("params", "iterations"))
def _tiled_loop(coords0, tfa: TiledFA, key, params, iterations: int):
    def body(i, carry):
        coords, fprev, key = carry
        key, sub = jax.random.split(key)
        coords, f = fa_step_tiled(coords, fprev, tfa, params, sub)
        return coords, f, key

    fprev = jnp.zeros_like(coords0)
    coords, _, _ = jax.lax.fori_loop(0, iterations, body,
                                     (coords0, fprev, key))
    if params.normalize:
        coords = F.normalize_coords(coords)
    return coords


def force_atlas_tiled(g: Graph, dim: int = 2, *, coords=None, key=None,
                      params: ForceAtlasParams | None = None,
                      iterations: int | None = None, tile: int | None = None):
    """Flat FA layout on the Pallas fast path (drop-in for flat.force_atlas
    on TPU; reorder the graph first -- graph.reorder -- for tiling fill)."""
    params = params or ForceAtlasParams(repulsion="sampled")
    if iterations is None:
        iterations = params.iterations
    if key is None:
        key = jax.random.PRNGKey(0)
    key, init_key = jax.random.split(key)
    if coords is None:
        coords = jax.random.uniform(init_key, (g.n, dim), dtype=jnp.float32,
                                    minval=-1.0, maxval=1.0)
    tfa = prepare_tiled(g, dim, params, tile=tile)
    if params.repulsion == "sampled" or params.repulsion == "gram":
        xT0 = ES.pad_coords_T(jnp.asarray(coords), tfa.n_pad)
        return _tiled_loop_T(xT0, tfa, key, params, iterations)
    return _tiled_loop(coords, tfa, key, params, iterations)
