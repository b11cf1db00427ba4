"""Multi-chip ForceAtlas: edge-sharded attraction + vertex-block repulsion.

The distributed design (SURVEY.md SS2.2 row 'graph partitioned across
devices' and SS5 long-context row): the edge list -- the long axis, up to
1e9 edges -- is 1D-sharded over the mesh; vertex coordinate state is kept
replicated between steps while the *work* is split two ways:

* attraction: each device segment-sums its local edge shard into a full
  [n_pad, d] partial force, combined with ``psum_scatter`` so each device
  ends up with exactly its vertex block -- the graph analogue of
  sequence-sharded attention, with the collective riding ICI;
* repulsion (dense gram or sampled): each device computes only its vertex
  row-block against the replicated coordinates -- a row-parallel matmul
  (tensor-parallel-like split of the n x n interaction);
* gravity/swing/speed: on the local vertex block;
* one ``all_gather`` of the updated blocks re-replicates coordinates for the
  next step.

Per step the comm volume is 2 * n_pad * d floats, independent of E: edges
dominate compute, so scaling efficiency follows the edge shard.  Small
coarse levels should simply be run replicated (single-device path) -- the
multilevel driver does exactly that below a size threshold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..forceatlas import forces as F
from ..graph.csr import Graph
from ..utils.params import ForceAtlasParams
from .mesh import EDGE_AXIS, make_mesh, round_up


def pad_graph_for_mesh(g: Graph, n_devices: int, *, edge_multiple: int = 128):
    """Host-side: pad edge arrays to a multiple of n_devices*edge_multiple
    and the vertex count to a multiple of n_devices.  Returns
    (senders, receivers, weights, n_pad) numpy arrays; ghost slots use
    sender = receiver = n_pad with zero weight."""
    s, r, w = g.to_coo_numpy()
    e_pad = round_up(max(g.num_edges, 1), n_devices * edge_multiple)
    n_pad = round_up(g.n, n_devices)
    sp = np.full(e_pad, n_pad, dtype=np.int32)
    rp = np.full(e_pad, n_pad, dtype=np.int32)
    wp = np.zeros(e_pad, dtype=np.asarray(g.weights).dtype)
    sp[: g.num_edges] = s
    rp[: g.num_edges] = r
    wp[: g.num_edges] = w
    return sp, rp, wp, n_pad


def make_sharded_fa_step(mesh: Mesh, n_pad: int, e_pad: int, dim: int,
                         params: ForceAtlasParams, n_real: int,
                         dtype=jnp.float32):
    """Build the jitted multi-chip FA step.

    Returns step(coords[n_pad,d] replicated, fprev[n_pad,d] block-sharded,
    senders/receivers/weights [e_pad] edge-sharded, deg [n_pad] replicated,
    key) -> (coords', fprev').
    """
    ndev = mesh.devices.size
    blk = n_pad // ndev
    eps = params.epsilon

    def local_step(coords, fprev_blk, s, r, w, deg, key):
        # --- vertex block this device owns
        me = jax.lax.axis_index(EDGE_AXIS)
        row0 = me * blk
        x_blk = jax.lax.dynamic_slice(coords, (row0, jnp.zeros((), row0.dtype)),
                                      (blk, dim))
        deg_blk = jax.lax.dynamic_slice(deg, (row0,), (blk,))
        deg_p1 = deg + 1.0
        deg_blk_p1 = deg_blk + 1.0

        # --- repulsion on the row block (TP-like row split)
        if params.repulsion == "sampled":
            samp = params.num_negative_samples
            idx = jax.random.randint(key, (samp,), 0, n_real)
            xs = coords[idx]
            degs = deg_p1[idx]
            sq_b = jnp.sum(x_blk * x_blk, axis=1)
            d2 = sq_b[:, None] + jnp.sum(xs * xs, axis=1)[None, :] - 2.0 * (
                jnp.matmul(x_blk, xs.T,
                           precision=jax.lax.Precision.HIGHEST))  # cancellation, see forces.py
            dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), eps)
            wgt = degs[None, :] / (dist * dist * dist)
            rows = row0 + jnp.arange(blk)
            wgt = jnp.where(rows[:, None] == idx[None, :], 0.0, wgt)
            f = x_blk * jnp.sum(wgt, axis=1, keepdims=True) - jnp.matmul(
                wgt, xs, precision=jax.lax.Precision.HIGHEST)  # cancellation, see forces.py
            rep_blk = (params.repel * deg_blk_p1)[:, None] * f * (
                jnp.asarray(n_real / samp, dtype))
        else:
            sq_b = jnp.sum(x_blk * x_blk, axis=1)
            sq_all = jnp.sum(coords * coords, axis=1)
            d2 = sq_b[:, None] + sq_all[None, :] - 2.0 * jnp.matmul(
                x_blk, coords.T, precision=jax.lax.Precision.HIGHEST)  # cancellation, see forces.py
            dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), eps)
            wgt = deg_p1[None, :] / (dist * dist * dist)
            rows = row0 + jnp.arange(blk)
            cols = jnp.arange(n_pad)
            wgt = jnp.where(rows[:, None] == cols[None, :], 0.0, wgt)
            # ghost (padded) vertices must not repel
            wgt = jnp.where(cols[None, :] < n_real, wgt, 0.0)
            f = x_blk * jnp.sum(wgt, axis=1, keepdims=True) - jnp.matmul(
                wgt, coords, precision=jax.lax.Precision.HIGHEST)
            rep_blk = (params.repel * deg_blk_p1)[:, None] * f

        # --- attraction over the local edge shard (SP-like edge split)
        sc = jnp.clip(s, 0, n_pad - 1)
        rc = jnp.clip(r, 0, n_pad - 1)
        xs_e, xr_e = coords[sc], coords[rc]
        diff = xr_e - xs_e
        dist_e = jnp.maximum(jnp.sqrt(jnp.sum(diff * diff, axis=-1)), eps)
        fa = F.attraction_fa(dist_e, w, deg_p1[sc], linlog=params.linlog,
                             delta=params.delta, nohubs=params.nohubs,
                             use_weights=params.use_weights)
        live = s < n_pad
        per_edge = jnp.where(live[:, None],
                             diff * (params.attract * fa / dist_e)[:, None],
                             0.0)
        seg = jnp.where(live, s, n_pad)
        att_full = jax.ops.segment_sum(per_edge, seg,
                                       num_segments=n_pad)
        # combine partial attraction across devices; land on my block
        att_blk = jax.lax.psum_scatter(att_full, EDGE_AXIS, scatter_dimension=0,
                                       tiled=True)

        # --- gravity + speed update on the block
        grav_blk = F.gravity_force(x_blk, deg_blk_p1, params.gravity)
        f_blk = rep_blk + att_blk + grav_blk
        # freeze padded ghost rows
        rows = row0 + jnp.arange(blk)
        real = (rows < n_real)[:, None]
        f_blk = jnp.where(real, f_blk, 0.0)
        new_blk = F.speed_update(x_blk, f_blk, fprev_blk, deg_blk_p1,
                                 ks=params.ks, ksmax=params.ksmax,
                                 tolerate=params.tolerate)
        new_blk = jnp.where(real, new_blk, x_blk)
        coords_new = jax.lax.all_gather(new_blk, EDGE_AXIS, axis=0,
                                        tiled=True)
        return coords_new, f_blk

    spec_rep = P()
    spec_blk = P(EDGE_AXIS)
    spec_edge = P(EDGE_AXIS)
    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_rep, spec_blk, spec_edge, spec_edge, spec_edge,
                  spec_rep, spec_rep),
        out_specs=(spec_rep, spec_blk),
        # coords_new is replicated by construction (all_gather); the static
        # varying-manual-axes check cannot see that
        check_vma=False,
    )
    return jax.jit(step)


# Largest per-device dense-repulsion distance block [blk, n_pad] (f32
# bytes) before sharded_force_atlas auto-switches params.repulsion to
# 'sampled'.  The default gram path materializes that block per device; at
# the default mesh_min_n=65536 a single-chip gram is 65536^2 * 4B = 17.2 GB
# -- beyond the whole 16 GB HBM (measured OOM at n=72647, round 4).
DENSE_D2_MAX_BYTES = 2 << 30


def sharded_force_atlas(g: Graph, dim: int = 2, *, mesh: Mesh | None = None,
                        params: ForceAtlasParams | None = None,
                        iterations: int = 100, key=None, coords0=None,
                        tiled: bool | str = "auto"):
    """Run the flat FA layout over a device mesh (BASELINE.md config 4/5
    path).  Results are allclose to the single-device path up to float
    reduction order (SURVEY.md SS4 multi-chip test contract).

    ``coords0``: optional [n, dim] warm start (the forceatlas.hpp:118-125
    hook).  Random init draws [n, dim] BEFORE padding, so layouts are
    device-count invariant given the same key.

    If the per-device dense-repulsion block [blk, n_pad] would exceed
    DENSE_D2_MAX_BYTES, repulsion auto-switches to the sampled estimator
    (same policy spirit as the halo path, which always samples) -- the
    dense gram at embed()'s mesh_min_n scale cannot fit HBM.

    ``tiled`` routes attraction through per-device WindowTiles + the
    Pallas SpMV (make_sharded_fa_step_tiled) instead of per-edge XLA
    gathers: True forces it, False keeps the portable path, "auto"
    (default) enables it for linear-form attraction at >= 100k edges on
    non-CPU meshes."""
    import dataclasses

    params = params or ForceAtlasParams()
    if mesh is None:
        mesh = make_mesh()
    if key is None:
        key = jax.random.PRNGKey(0)
    ndev = mesh.devices.size
    n_pad_v = round_up(max(g.n, 1), ndev)
    itemsize = float(np.dtype(g.dtype).itemsize)  # d2 block is g.dtype
    if (params.repulsion != "sampled"
            and itemsize * (n_pad_v // ndev) * n_pad_v > DENSE_D2_MAX_BYTES):
        params = dataclasses.replace(params, repulsion="sampled")
    if tiled == "auto":
        tiled = (g.num_edges >= 100_000
                 and mesh.devices.flat[0].platform != "cpu")
    dtype = g.dtype

    key, init_key = jax.random.split(key)
    if coords0 is None:
        coords0 = jax.random.uniform(init_key, (g.n, dim), dtype=dtype,
                                     minval=-1.0, maxval=1.0)
    if tiled:
        return _sharded_force_atlas_tiled(g, dim, mesh, params, iterations,
                                          key, coords0)
    s, r, w, n_pad = pad_graph_for_mesh(g, ndev)
    coords = jnp.zeros((n_pad, dim), dtype).at[: g.n].set(
        jnp.asarray(coords0, dtype))
    deg = np.zeros(n_pad, dtype=np.asarray(g.weights).dtype)
    deg[: g.n] = np.asarray(g.degrees(params.use_weights))
    deg = jnp.asarray(deg, dtype=dtype)

    from jax.sharding import NamedSharding
    shard_e = NamedSharding(mesh, P(EDGE_AXIS))
    shard_r = NamedSharding(mesh, P())
    shard_b = NamedSharding(mesh, P(EDGE_AXIS))
    s = jax.device_put(jnp.asarray(s), shard_e)
    r = jax.device_put(jnp.asarray(r), shard_e)
    w = jax.device_put(jnp.asarray(w, dtype=dtype), shard_e)
    coords = jax.device_put(coords, shard_r)
    deg = jax.device_put(deg, shard_r)
    fprev = jax.device_put(jnp.zeros((n_pad, dim), dtype), shard_b)

    step = make_sharded_fa_step(mesh, n_pad, s.shape[0], dim, params, g.n,
                                dtype)
    for _ in range(iterations):
        key, sub = jax.random.split(key)
        coords, fprev = step(coords, fprev, s, r, w, deg, sub)
    return coords[: g.n]


def _sharded_force_atlas_tiled(g: Graph, dim: int, mesh: Mesh, params,
                               iterations: int, key, coords0, *,
                               interpret: bool | None = None):
    """sharded_force_atlas's Pallas-SpMV attraction path: per-shard window
    tiles (weights folded for the linear form), DIA stencil rolls for
    dominant offsets, psum'd partial SpMVs -- the same kernel class the
    single-chip fast path and the halo step ride, so a replicated-design
    flat base case at embed() scale costs ~the windowed kernel instead of
    ~18ns/row XLA gathers."""
    from jax.sharding import NamedSharding

    from ..ops import dia as DIA
    from ..ops.pallas import edge_spmm as ES

    if interpret is None:
        # tiled=True on a virtual CPU mesh runs the kernels interpreted
        # (the refine_level_sharded convention)
        interpret = mesh.devices.flat[0].platform == "cpu"
    ndev = mesh.devices.size
    if params.linlog:
        return _sharded_force_atlas_linlog(g, dim, mesh, params, iterations,
                                           key, coords0, interpret=interpret)
    stacked, aux, dia = build_sharded_tiles(g, ndev, dia_min_count=None,
                                            params=params)
    deg_w = np.zeros(aux.n_pad, np.float32)
    for d in range(ndev):
        t = ES.WindowTiles(
            sbf=stacked["sbf"][d], rw=stacked["rw"][d],
            packed=stacked["packed"][d],
            overflow_s=np.zeros(0, np.int32),
            overflow_r=np.zeros(0, np.int32),
            overflow_w=np.zeros(0, np.float32),
            n_sblocks=aux.n_sblocks, tile=aux.tile, fill=aux.fill,
            sender_block=aux.sender_block, window=aux.window,
            packing=aux.packing)
        deg_w += ES.tiled_row_sums(t)
    offsets = dia.offsets if dia is not None else ()
    if dia is not None:
        deg_w += DIA.dia_row_sums(dia.weights)
    step, n_pad = make_sharded_fa_step_tiled(
        mesh, aux, aux.n_pad, dim, params, g.n, jnp.asarray(deg_w),
        interpret=interpret, dia_offsets=offsets)
    k_dia = max(len(offsets), 1)
    dia_w = np.zeros((k_dia, n_pad), np.float32)
    if dia is not None:
        dia_w[:, : dia.weights.shape[1]] = dia.weights

    put = lambda a, spec: jax.device_put(jnp.asarray(a),
                                         NamedSharding(mesh, spec))
    coords = put(jnp.zeros((n_pad, dim), jnp.float32).at[: g.n].set(
        jnp.asarray(coords0, jnp.float32)), P())
    fprev = put(jnp.zeros((n_pad, dim), jnp.float32), P(EDGE_AXIS))
    args = (put(stacked["sbf"], P(EDGE_AXIS)),
            put(stacked["rw"], P(EDGE_AXIS)),
            put(stacked["packed"], P(EDGE_AXIS)),
            put(dia_w, P(None, EDGE_AXIS)),
            put(jnp.zeros(n_pad, jnp.float32).at[: g.n].set(
                jnp.asarray(g.degrees(params.use_weights), jnp.float32)),
                P()))
    for _ in range(iterations):
        key, sub = jax.random.split(key)
        coords, fprev = step(coords, fprev, *args, sub)
    return coords[: g.n].astype(g.dtype)


def _sharded_force_atlas_linlog(g: Graph, dim: int, mesh: Mesh, params,
                                iterations: int, key, coords0, *,
                                interpret: bool):
    """Linlog fast path of the replicated sharded design (round-4 VERDICT
    item 6; forceatlas.hpp:180-186): the distance-dependent magnitude
    cannot ride the linear windowed SpMV, so each shard packs per-edge v1
    tiles (ops/pallas/edge_spmm.py::attraction_tiled computes distances
    in-kernel) and the partial forces psum like the windowed path."""
    from jax.sharding import NamedSharding

    from ..ops.pallas import edge_spmm as ES

    ndev = mesh.devices.size
    stacked, aux = build_sharded_edge_tiles(g, ndev, params=params)
    step, n_pad = make_sharded_fa_step_tiled(
        mesh, aux, aux.n_pad, dim, params, g.n,
        jnp.zeros(aux.n_pad, jnp.float32), interpret=interpret)
    put = lambda a, spec: jax.device_put(jnp.asarray(a),
                                         NamedSharding(mesh, spec))
    coords = put(jnp.zeros((n_pad, dim), jnp.float32).at[: g.n].set(
        jnp.asarray(coords0, jnp.float32)), P())
    fprev = put(jnp.zeros((n_pad, dim), jnp.float32), P(EDGE_AXIS))
    args = tuple(put(stacked[k], P(EDGE_AXIS))
                 for k in ("sb", "rb", "first", "sloc", "rloc", "wt"))
    args += (put(jnp.zeros(n_pad, jnp.float32).at[: g.n].set(
        jnp.asarray(g.degrees(params.use_weights), jnp.float32)), P()),)
    for _ in range(iterations):
        key, sub = jax.random.split(key)
        coords, fprev = step(coords, fprev, *args, sub)
    return coords[: g.n].astype(g.dtype)


def build_sharded_edge_tiles(g: Graph, n_devices: int, *, tile: int = 512,
                             params: ForceAtlasParams | None = None):
    """Per-shard v1 EdgeTiles over the GLOBAL vertex space, stacked to a
    common slab count (the linlog analogue of build_sharded_tiles).
    Returns (dict of [ndev, ...] arrays, aux EdgeTiles)."""
    from ..ops.pallas import edge_spmm as ES

    s, r, w = g.to_coo_numpy()
    if params is not None:
        deg_send = np.asarray(g.degrees(params.use_weights))[s]
        w = np.asarray(ES.fold_edge_weights(
            np.asarray(w, np.float32), deg_send.astype(np.float32),
            use_weights=params.use_weights, delta=params.delta,
            nohubs=params.nohubs), np.float32)
    e = s.shape[0]
    per = -(-e // n_devices)
    tiles_list = []
    for d in range(n_devices):
        lo, hi = d * per, min((d + 1) * per, e)
        shard = _CooShim(s[lo:hi], r[lo:hi], w[lo:hi], g.n)
        tiles_list.append(ES.build_edge_tiles(shard, tile=tile))
    S_max = max(t.num_tiles for t in tiles_list)
    T = tiles_list[0].tile
    out = {k: np.zeros((n_devices, S_max) + tail, dt)
           for k, tail, dt in (("sb", (), np.int32), ("rb", (), np.int32),
                               ("first", (), np.int32),
                               ("sloc", (T,), np.int32),
                               ("rloc", (T,), np.int32),
                               ("wt", (T,), np.float32))}
    for d, t in enumerate(tiles_list):
        S = t.num_tiles
        out["sb"][d, :S] = t.sb
        out["rb"][d, :S] = t.rb
        out["first"][d, :S] = t.first
        out["sloc"][d, :S] = t.sloc
        out["rloc"][d, :S] = t.rloc
        out["wt"][d, :S] = t.wt
        if S < S_max:
            # pad slabs: same block as the last real slab, not-first,
            # zero weights -- they accumulate nothing
            out["sb"][d, S:] = t.sb[-1]
    import dataclasses as _dc
    aux = _dc.replace(tiles_list[0], sb=out["sb"][0], rb=out["rb"][0],
                      first=out["first"][0], sloc=out["sloc"][0],
                      rloc=out["rloc"][0], wt=out["wt"][0])
    return out, aux


# ---------------------------------------------------------------------------
# Tiled (Pallas SpMV) attraction inside the sharded step: each device owns an
# edge shard pre-packed into WindowTiles; partial SpMV results are combined
# with a psum.  Comm volume per step: one [D_PAD, n_pad] psum + the final
# block all_gather.
# ---------------------------------------------------------------------------

# folded-unit graphs at least this large take the jumbo unit packing in
# build_sharded_tiles (below it the bf16 256^2 default wins on fill)
UNIT_JUMBO_MIN_EDGES = 1_000_000


def build_sharded_tiles(g: Graph, n_devices: int, *, tile: int = 512,
                        weights=None, sender_block=None, window=None,
                        dia_min_count: int | None = 0,
                        params: ForceAtlasParams | None = None):
    """Split the edge list into ``n_devices`` contiguous (sender-sorted)
    shards and build one WindowTiles per shard over the GLOBAL vertex space,
    padded to a common slab count.  Returns (stacked arrays dict, aux tiles
    object of shard 0 for the static fields, DiaPlan or None).

    ``dia_min_count``: 0 disables the DIA decomposition; None picks the
    auto threshold (ops/dia.py).  DIA edges are removed from the shards --
    in this replicated-coords design each device applies the rolls for its
    own vertex block with NO extra communication (x[i + o] is local), so
    the stencil part scales perfectly while only residual edges ride the
    psum'd SpMV.

    ``params``: fold the attraction's per-edge constants into the tile
    weights (fold_edge_weights -- use_weights/delta/nohubs), so the linear
    SpMV form is exact for any ForceAtlasParams.  Without it the raw edge
    weights are packed (exact only for the default delta=1/use_weights
    semantics, which is what the dryrun and tests exercise).

    When the folded weights are all exactly 1.0 and the edge count reaches
    UNIT_JUMBO_MIN_EDGES, shards take the scattered-optimal jumbo unit
    packing (4096/4096/T1024, k-grouped slabs) instead of the bf16 256^2
    default -- the same fast path prepare_tiled rides."""
    import math

    from ..ops.pallas import edge_spmm as ES

    s, r, w = g.to_coo_numpy()
    if weights is not None:
        w = np.asarray(weights)
    if params is not None:
        deg_send = np.asarray(g.degrees(params.use_weights))[s]
        w = np.asarray(ES.fold_edge_weights(
            np.asarray(w, np.float32), deg_send.astype(np.float32),
            use_weights=params.use_weights, delta=params.delta,
            nohubs=params.nohubs), np.float32)
    packing = "bf16"
    unit = (np.asarray(w).size >= UNIT_JUMBO_MIN_EDGES
            and bool((np.asarray(w) == 1.0).all()))
    if unit and sender_block is None and window is None:
        # (4096, 8192) past 1.5M vertices -- (4096, 16384) under the bf16
        # x layout; DENSE small graphs (avg deg >= 128, the truncated-
        # pipeline coarse levels) take (1024, 2048): the round-5 on-chip
        # shape sweeps (scripts/shape_ab.py; same rules as
        # build_halo_tiles)
        bf16_x = params is not None and params.x_precision == "bf16"
        big = g.n > 1_500_000
        dense = not big and np.asarray(w).size >= 128 * max(g.n, 1)
        sender_block, tile = (1024 if dense else 4096), 1024
        window = ((16384 if bf16_x else 8192) if big
                  else (2048 if dense else 4096))
        packing = "unit"

    dia = None
    if dia_min_count is None or dia_min_count > 0:
        from ..ops import dia as DIA

        sb = sender_block or ES.SENDER_BLOCK
        win = window or ES.WINDOW
        unit = math.lcm(sb, win)
        n_sb = max(-(-g.n // sb), 1)
        n_pad_t = -(-(n_sb * sb) // unit) * unit
        dia = DIA.plan_dia(s, r, w, g.n, n_pad_t, min_count=dia_min_count)
        if dia is not None:
            keep = dia.residual_mask
            s, r, w = s[keep], r[keep], w[keep]
    e = s.shape[0]
    per = -(-e // n_devices)
    tiles_list = []
    unit_k = None   # one shared slab group across shards (kernel is one)
    for d in range(n_devices):
        lo, hi = d * per, min((d + 1) * per, e)
        # build directly from the shard's COO via a lightweight shim
        shard = _CooShim(s[lo:hi], r[lo:hi], w[lo:hi], g.n)
        kw = {}
        if sender_block is not None:
            kw["sender_block"] = sender_block
        if window is not None:
            kw["window"] = window
        kw["packing"] = packing
        t = ES.build_window_tiles(shard, tile=tile, **kw)
        if packing == "unit" and t.window >= ES.JUMBO_JOIN_MIN:
            if unit_k is None:
                unit_k = ES.jumbo_group(t)
            t = ES.pair_window_tiles(t, unit_k)
        tiles_list.append(t)

    S_max = max(t.num_tiles for t in tiles_list)
    k0 = tiles_list[0].group
    S_max = -(-S_max // k0) * k0   # pad slabs keep group alignment
    T = tiles_list[0].tile
    sbf = np.zeros((n_devices, S_max), np.int32)
    rw = np.zeros((n_devices, S_max), np.int32)
    packed = np.zeros((n_devices, S_max, 1, T), np.int32)
    for d, t in enumerate(tiles_list):
        S = t.num_tiles
        sbf[d, :S] = t.sbf
        rw[d, :S] = t.rw
        packed[d, :S] = t.packed
        # dummy pad slabs accumulate zeros into the last real sender block
        if S < S_max:
            sbf[d, S:] = t.sbf[-1] & ~1  # same block, not-first
            rw[d, S:] = 0
        if t.num_overflow != 0:
            raise ValueError(
                f"shard {d}: {t.num_overflow} overflow edges -- sharded "
                "tiles require min_pair_edges=0 (every edge inside the "
                "windowed kernel); rebuild without tile kwargs that "
                "produce an overflow list")
        if t.chunks and n_devices > 1:
            # chunk layouts are per-device static structure (same reason
            # as build_halo_tiles): at ndev == 1 the aux tiles carry their
            # own chunks and spmv_windowed splits the calls itself
            raise ValueError(
                f"shard {d}: {t.num_tiles} slabs exceed one pallas call "
                f"at ndev={n_devices}; raise tile/sender_block or shard "
                "over more devices")
    return {"sbf": sbf, "rw": rw, "packed": packed}, tiles_list[0], dia


class _CooShim:
    """Duck-typed minimal Graph for the tile builder (COO + n only)."""

    def __init__(self, s, r, w, n):
        self._coo = (np.asarray(s), np.asarray(r), np.asarray(w))
        self.n = n

    def to_coo_numpy(self):
        return self._coo


def make_sharded_fa_step_tiled(mesh: Mesh, aux_tiles, n_pad_tiles: int,
                               dim: int, params: ForceAtlasParams,
                               n_real: int, deg_w_att,
                               *, interpret: bool = False,
                               dia_offsets: tuple = ()):
    """Multi-chip FA step with the Pallas SpMV attraction.

    State layout matches make_sharded_fa_step (coords replicated at
    [n_pad, dim] where n_pad >= tiles.n_pad is also a multiple of the device
    count; fprev block-sharded).  ``aux_tiles`` supplies the static tile
    geometry; per-device slab arrays are passed as sharded inputs.

    With ``dia_offsets`` the step additionally takes ``dia_w``
    ([K, n_pad], vertex-block sharded): each device applies the stencil
    rolls of its own rows against the replicated coordinates -- zero extra
    communication (``deg_w_att`` must already include the DIA row sums).
    """
    from ..ops.pallas import edge_spmm as ES

    ndev = mesh.devices.size
    n_pad = round_up(max(n_pad_tiles, n_real), ndev)
    blk = n_pad // ndev
    eps = params.epsilon
    empty = np.zeros(0, np.int32)
    emptyf = np.zeros(0, np.float32)
    H = max(abs(int(o)) for o in dia_offsets) if dia_offsets else 0
    edge_mode = isinstance(aux_tiles, ES.EdgeTiles)  # linlog per-edge path
    if edge_mode and dia_offsets:
        raise ValueError("per-edge (linlog) tiles cannot combine with DIA "
                         "offsets -- the stencil rolls encode the linear "
                         "attraction form only")

    def local_step(coords, fprev_blk, *rest):
        if edge_mode:
            tsb, trb, tfirst, tsloc, trloc, twt, deg, key = rest
            tiles_local = ES.EdgeTiles(
                sb=tsb[0], rb=trb[0], first=tfirst[0], sloc=tsloc[0],
                rloc=trloc[0], wt=twt[0], n_blocks=aux_tiles.n_blocks,
                tile=aux_tiles.tile, fill=aux_tiles.fill)
            tiles_n_pad = tiles_local.n_pad
            xT = jnp.zeros((ES.D_PAD, tiles_n_pad), jnp.float32)
            xT = xT.at[:dim, :].set(coords.T[:, : tiles_n_pad])
            partial_T = ES.attraction_tiled(
                xT, tiles_local, attract=params.attract,
                linlog=params.linlog, eps=eps, interpret=interpret)
            att_full = jax.lax.psum(partial_T, EDGE_AXIS)[:dim, :].T
        else:
            sbf, rw, packed, dia_wb, deg, key = rest
            tiles_local = ES.WindowTiles(
                sbf=sbf[0], rw=rw[0], packed=packed[0],
                overflow_s=jnp.asarray(empty), overflow_r=jnp.asarray(empty),
                overflow_w=jnp.asarray(emptyf),
                n_sblocks=aux_tiles.n_sblocks, tile=aux_tiles.tile,
                fill=aux_tiles.fill, sender_block=aux_tiles.sender_block,
                window=aux_tiles.window, packing=aux_tiles.packing,
                chunks=aux_tiles.chunks, group=aux_tiles.group)
            tiles_n_pad = tiles_local.n_pad
            xT = jnp.zeros((ES.D_PAD, tiles_n_pad), jnp.float32)
            xT = xT.at[:dim, :].set(coords.T[:, : tiles_n_pad])
            partial_T = ES.spmv_windowed(xT, tiles_local, interpret=interpret,
                                         dmax=4 if dim <= 4 else ES.D_PAD,
                                         x_precision=params.x_precision)
            full_T = jax.lax.psum(partial_T, EDGE_AXIS)
            att_full = (params.attract
                        * (full_T - xT * deg_w_att[None, :])[:dim, :].T)
        att_full = jnp.pad(att_full, ((0, n_pad - tiles_n_pad), (0, 0)))

        me = jax.lax.axis_index(EDGE_AXIS)
        row0 = me * blk
        z = jnp.zeros((), row0.dtype)
        x_blk = jax.lax.dynamic_slice(coords, (row0, z), (blk, dim))
        att_blk = jax.lax.dynamic_slice(att_full, (row0, z), (blk, dim))
        deg_blk = jax.lax.dynamic_slice(deg, (row0,), (blk,))
        deg_p1 = deg + 1.0
        deg_blk_p1 = deg_blk + 1.0

        if dia_offsets:
            # stencil attraction for MY rows against the replicated coords:
            # x[i + o] is local, so no communication; out-of-range partners
            # carry zero weight, the halo pad only keeps slices in bounds
            xpad = jnp.pad(coords, ((H, H), (0, 0)))
            y_dia = jnp.zeros((blk, dim), coords.dtype)
            for k, o in enumerate(dia_offsets):
                sl = jax.lax.dynamic_slice(xpad, (row0 + H + int(o), z),
                                           (blk, dim))
                y_dia = y_dia + dia_wb[k][:, None] * sl
            att_blk = att_blk + params.attract * y_dia

        if params.repulsion == "sampled":
            samp = params.num_negative_samples
            idx = jax.random.randint(key, (samp,), 0, n_real)
            xs = coords[idx]
            degs = deg_p1[idx]
            sq_b = jnp.sum(x_blk * x_blk, axis=1)
            d2 = sq_b[:, None] + jnp.sum(xs * xs, axis=1)[None, :] - 2.0 * (
                jnp.matmul(x_blk, xs.T,
                           precision=jax.lax.Precision.HIGHEST))  # cancellation, see forces.py
            dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), eps)
            wgt = degs[None, :] / (dist * dist * dist)
            rows = row0 + jnp.arange(blk)
            wgt = jnp.where(rows[:, None] == idx[None, :], 0.0, wgt)
            f = x_blk * jnp.sum(wgt, axis=1, keepdims=True) - jnp.matmul(
                wgt, xs, precision=jax.lax.Precision.HIGHEST)  # cancellation, see forces.py
            rep_blk = (params.repel * deg_blk_p1)[:, None] * f * (
                jnp.asarray(n_real / samp, jnp.float32))
        else:
            sq_b = jnp.sum(x_blk * x_blk, axis=1)
            sq_all = jnp.sum(coords * coords, axis=1)
            d2 = sq_b[:, None] + sq_all[None, :] - 2.0 * jnp.matmul(
                x_blk, coords.T, precision=jax.lax.Precision.HIGHEST)  # cancellation, see forces.py
            dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), eps)
            wgt = deg_p1[None, :] / (dist * dist * dist)
            rows = row0 + jnp.arange(blk)
            cols = jnp.arange(n_pad)
            wgt = jnp.where(rows[:, None] == cols[None, :], 0.0, wgt)
            wgt = jnp.where(cols[None, :] < n_real, wgt, 0.0)
            f = x_blk * jnp.sum(wgt, axis=1, keepdims=True) - jnp.matmul(
                wgt, coords, precision=jax.lax.Precision.HIGHEST)
            rep_blk = (params.repel * deg_blk_p1)[:, None] * f

        grav_blk = F.gravity_force(x_blk, deg_blk_p1, params.gravity)
        f_blk = rep_blk + att_blk + grav_blk
        rows = row0 + jnp.arange(blk)
        real = (rows < n_real)[:, None]
        f_blk = jnp.where(real, f_blk, 0.0)
        new_blk = F.speed_update(x_blk, f_blk, fprev_blk, deg_blk_p1,
                                 ks=params.ks, ksmax=params.ksmax,
                                 tolerate=params.tolerate)
        new_blk = jnp.where(real, new_blk, x_blk)
        coords_new = jax.lax.all_gather(new_blk, EDGE_AXIS, axis=0,
                                        tiled=True)
        return coords_new, f_blk

    spec_rep = P()
    spec_blk = P(EDGE_AXIS)
    spec_dev = P(EDGE_AXIS)
    spec_dia = P(None, EDGE_AXIS)  # dia_w [K, n_pad] split by vertex block
    if edge_mode:
        in_specs = (spec_rep, spec_blk) + (spec_dev,) * 6 + (spec_rep,
                                                             spec_rep)
    else:
        in_specs = (spec_rep, spec_blk, spec_dev, spec_dev, spec_dev,
                    spec_dia, spec_rep, spec_rep)
    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=in_specs,
        out_specs=(spec_rep, spec_blk),
        check_vma=False,
    )
    return jax.jit(step), n_pad
