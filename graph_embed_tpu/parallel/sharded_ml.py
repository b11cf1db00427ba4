"""Multi-chip multilevel refinement: aggregates sharded across the mesh.

The reference's refinement parallelizes over aggregates -- independent local
subproblems (forceAtlasMultilevel, include/forceatlas.hpp:340-341, OpenMP
``parallel for`` over aggregates).  The TPU-native equivalent shards
AGGREGATES over the device mesh: within-aggregate repulsion, intra-aggregate
attraction (both endpoints share the aggregate by definition), the
precomputed cut-edge pull, gravity, the swing/speed schedule and the
pack-into-parent-ball epilogue (forceatlas.hpp:539-570) are ALL local to the
device that owns the aggregate.  One refinement iteration therefore needs
ZERO collectives; the only communication in a level is the final read of the
placed coordinates.  This is the scaling design BASELINE.md configs 4/5 need
for the multilevel pipeline (the flat coarsest level rides the edge-sharded
step in parallel/sharded.py).

Layout: device-major slot space.  Aggregates are bucketed into power-of-two
size classes with exactly the single-chip rule (multilevel_tiled.
bucket_size_classes / plan_bucket) and dealt contiguously to devices within
each bucket.  Every device's local slot space then has IDENTICAL static
structure -- same buckets, same padded aggregate counts, same Pallas grid --
so the whole level runs as ONE shard_map program; devices that run out of
real aggregates in a bucket carry ghost aggregates (valid=False, weight 0).
Per-aggregate arithmetic is identical across device counts, so 1-device and
N-device embeddings agree allclose (SURVEY.md SS4 multi-chip contract); the
only reduction-order difference is edge order inside the per-device
attraction tiles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.csr import Graph
from ..partition.interpolation import Partition
from ..utils.params import MultilevelFAParams
from ..ops.pallas import edge_spmm as ES
from ..forceatlas import forces as F
from ..forceatlas.multilevel_tiled import (RefineLayout, bucket_size_classes,
                                           plan_bucket, refine_forces)
from .mesh import EDGE_AXIS


@dataclasses.dataclass(frozen=True)
class ShardedRefineLayout:
    """Host-built per-level layout for the aggregate-sharded refinement.

    All per-slot arrays are GLOBAL [ndev * n_slots_local] (device-major:
    device d owns slots [d*n_slots_local, (d+1)*n_slots_local)), sharded
    with PartitionSpec('x') so each device sees its local slot space.  Tile
    arrays are stacked [ndev, ...] like parallel.sharded.build_sharded_tiles.
    """

    ndev: int
    n: int                       # fine vertices
    n_slots_local: int           # identical per device
    m_local: int                 # padded local aggregate count (identical)
    bucket_meta_local: tuple     # static, identical per device
    slot_of_vertex: np.ndarray   # [n] -> global slot
    global_agg_of_slot: np.ndarray  # [ndev*n_slots_local] -> agg id (ghost m)
    agg_of_slot: np.ndarray      # [ndev*n_slots_local] -> LOCAL agg (ghost m_local)
    valid_slot: np.ndarray       # [ndev*n_slots_local] bool
    deg_loc: np.ndarray          # [ndev*n_slots_local] f32
    sbf: np.ndarray              # [ndev, S_max]
    rw: np.ndarray               # [ndev, S_max]
    packed: np.ndarray           # [ndev, S_max, 1, T]
    deg_w_att: np.ndarray        # [ndev, n_pad_local]
    aux_tiles: ES.WindowTiles    # static tile geometry (shared)

    @property
    def n_slots_global(self) -> int:
        return self.ndev * self.n_slots_local


def prepare_refine_sharded(g: Graph, part: Partition,
                           params: MultilevelFAParams, ndev: int, *,
                           tile: int = 512, min_bucket: int = 8,
                           small_kind: str = "auto") -> ShardedRefineLayout:
    """Build the device-major slot layout + per-device attraction tiles."""
    v2a = part.vertex_to_agg_numpy()
    m = part.num_aggs
    n = g.n
    counts = np.bincount(v2a, minlength=m)
    S_of_agg = bucket_size_classes(counts, min_bucket=min_bucket)

    # ---- per-bucket device deal + one shared local plan
    order_a = np.lexsort((np.arange(m), S_of_agg))
    S_in_order = S_of_agg[order_a]
    bucket_meta_local = []
    base = 0
    # per aggregate: owning device and local slot start
    dev_of_agg = np.zeros(m, dtype=np.int64)
    local_start_of_agg = np.zeros(m, dtype=np.int64)
    local_agg_rows = []   # (local_agg_base, aggregate ids in device order)
    i = 0
    while i < m:
        S = int(S_in_order[i])
        j = i
        while j < m and S_in_order[j] == S:
            j += 1
        ids = order_a[i:j]
        q = -(-ids.size // ndev)                      # aggregates per device
        kind, C, m_b_pad, align = plan_bucket(S, q, small_kind=small_kind)
        base = -(-base // align) * align
        for k, a in enumerate(ids):
            d, rank = divmod(k, q)
            dev_of_agg[a] = d
            local_start_of_agg[a] = base + rank * S
        m_agg_base = sum(mb for (_, mb, _, _, _) in bucket_meta_local)
        local_agg_rows.append((m_agg_base, base, S, q, ids))
        bucket_meta_local.append((int(base), int(m_b_pad), int(S), int(C),
                                  kind))
        base += m_b_pad * S
        i = j
    n_slots_local = -(-base // 128) * 128
    m_local = sum(mb for (_, mb, _, _, _) in bucket_meta_local)

    # ---- global slot of every vertex (device-major)
    order_v = np.argsort(v2a, kind="stable")
    vstart = np.concatenate([[0], np.cumsum(counts)])
    pos = np.arange(n) - vstart[v2a[order_v]]
    slot_of_vertex = np.zeros(n, dtype=np.int64)
    slot_of_vertex[order_v] = (dev_of_agg[v2a[order_v]] * n_slots_local
                               + local_start_of_agg[v2a[order_v]] + pos)

    n_glob = ndev * n_slots_local
    global_agg_of_slot = np.full(n_glob, m, dtype=np.int32)
    global_agg_of_slot[slot_of_vertex] = v2a
    # local aggregate id per slot (bucket-local rank within the device);
    # whole S-ranges are labeled -- ghost member slots of a real aggregate
    # carry its id too, so the epilogue's segment ops see one id per range
    agg_of_slot = np.full(n_glob, m_local, dtype=np.int32)
    for (m_agg_base, b_base, S, q, ids) in local_agg_rows:
        ranks = np.arange(ids.size) % q
        local_ids = (m_agg_base + ranks).astype(np.int32)
        start = (dev_of_agg[ids] * n_slots_local + local_start_of_agg[ids])
        offs = np.arange(S)
        rows = (start[:, None] + offs[None, :]).reshape(-1)
        agg_of_slot[rows] = np.repeat(local_ids, S)

    valid = np.zeros(n_glob, dtype=bool)
    valid[slot_of_vertex] = True

    # ---- local degrees (same-aggregate incident weight incl. self-loops,
    # forceatlas.hpp:362-383) and folded attraction weights
    s, r, w = g.to_coo_numpy()
    both = v2a[s] == v2a[r]
    intra = both & (s != r)
    deg_np = np.zeros(n, np.float64)
    if params.use_weights:
        np.add.at(deg_np, s[both], w[both])
    else:
        np.add.at(deg_np, s[both], 1.0)
    folded = ES.fold_edge_weights(w, deg_np[s],
                                  use_weights=params.use_weights,
                                  delta=params.delta, nohubs=params.nohubs)
    deg_loc = np.zeros(n_glob, np.float32)
    deg_loc[slot_of_vertex] = deg_np

    # ---- per-device attraction tiles over the LOCAL slot space
    es_, er_, ew_ = s[intra], r[intra], folded[intra]
    e_dev = dev_of_agg[v2a[es_]]
    ls = slot_of_vertex[es_] - e_dev * n_slots_local
    lr = slot_of_vertex[er_] - e_dev * n_slots_local
    unit = bool(intra.any()) and bool(np.all(ew_ == 1.0))
    if unit:
        from ..forceatlas.tiled import (UNIT_SENDER_BLOCK, UNIT_TILE,
                                        UNIT_WINDOW)

        kw = dict(tile=UNIT_TILE, sender_block=UNIT_SENDER_BLOCK,
                  window=UNIT_WINDOW, packing="unit")
    else:
        kw = dict(tile=tile)
    tiles_list = []
    for d in range(ndev):
        sel = e_dev == d
        shim = _Shim(ls[sel], lr[sel], ew_[sel], n_slots_local)
        tiles_list.append(ES.build_window_tiles(shim, **kw))
    S_max = max(t.num_tiles for t in tiles_list)
    if S_max > ES.MAX_SLABS_PER_CALL:
        raise ValueError(
            f"{S_max} slabs on one device exceeds the single-call limit "
            f"({ES.MAX_SLABS_PER_CALL}); use more devices or the single-chip "
            "tiled path for this level")
    T = tiles_list[0].tile
    sbf = np.zeros((ndev, S_max), np.int32)
    rw = np.zeros((ndev, S_max), np.int32)
    packed = np.zeros((ndev, S_max, 1, T), np.int32)
    deg_w_att = np.zeros((ndev, tiles_list[0].n_pad), np.float32)
    for d, t in enumerate(tiles_list):
        St = t.num_tiles
        sbf[d, :St] = t.sbf
        rw[d, :St] = t.rw
        packed[d, :St] = t.packed
        if St < S_max:
            # dummy pad slabs accumulate zeros into the last real block
            sbf[d, St:] = t.sbf[-1] & ~1 if St else 0
            rw[d, St:] = 0
        deg_w_att[d] = ES.tiled_row_sums(t)

    return ShardedRefineLayout(
        ndev=ndev, n=n, n_slots_local=int(n_slots_local),
        m_local=int(m_local), bucket_meta_local=tuple(bucket_meta_local),
        slot_of_vertex=slot_of_vertex,
        global_agg_of_slot=global_agg_of_slot, agg_of_slot=agg_of_slot,
        valid_slot=valid, deg_loc=deg_loc, sbf=sbf, rw=rw, packed=packed,
        deg_w_att=deg_w_att, aux_tiles=tiles_list[0])


class _Shim:
    """Duck-typed minimal Graph for the tile builder (COO + n only)."""

    def __init__(self, s, r, w, n):
        self._coo = (np.asarray(s), np.asarray(r), np.asarray(w))
        self.n = int(n)

    def to_coo_numpy(self):
        return self._coo


def make_refine_sharded_step(mesh: Mesh, shl: ShardedRefineLayout, dim: int,
                             params: MultilevelFAParams, iterations: int,
                             *, interpret: bool = False):
    """Jitted whole-level refinement: shard_map over aggregates, zero
    per-iteration collectives, epilogue included.

    step(coords0[gs,d], valid[gs], deg_loc[gs], agg[gs], sbf/rw/packed
    [ndev,...], deg_w_att[ndev,np], pull[gs,d], center[gs,d], r_slot[gs],
    key) -> placed[gs,d], everything slot-sharded with P('x').
    """
    aux = shl.aux_tiles
    meta = shl.bucket_meta_local
    nsl = shl.n_slots_local
    m_local = shl.m_local
    eps = params.epsilon
    empty = np.zeros(0, np.int32)
    emptyf = np.zeros(0, np.float32)

    def local_refine(coords0, valid, deg_loc, agg, sbf, rw, packed,
                     deg_w_att, pull_slot, center_slot, r_slot, key):
        tiles_local = ES.WindowTiles(
            sbf=sbf[0], rw=rw[0], packed=packed[0],
            overflow_s=jnp.asarray(empty), overflow_r=jnp.asarray(empty),
            overflow_w=jnp.asarray(emptyf),
            n_sblocks=aux.n_sblocks, tile=aux.tile, fill=aux.fill,
            sender_block=aux.sender_block, window=aux.window,
            packing=aux.packing)
        layout = RefineLayout(
            slot_of_vertex=jnp.zeros(1, jnp.int32),  # unused device-side
            agg_of_slot=agg, valid_slot=valid, deg_loc=deg_loc,
            tiles=tiles_local, deg_w_att=deg_w_att[0],
            bucket_meta=meta, n=shl.n, n_slots=nsl, num_aggs=m_local)
        me = jax.lax.axis_index(EDGE_AXIS)
        key_dev = jax.random.fold_in(key, me)
        deg_p1 = deg_loc + 1.0

        def body(i, carry):
            coords, fprev = carry
            key_i = jax.random.fold_in(key_dev, i)
            f = refine_forces(coords, layout, pull_slot, params, dim,
                              interpret, key=key_i)
            new_coords = F.speed_update(coords, f, fprev, deg_p1,
                                        ks=params.ks, ksmax=params.ksmax,
                                        tolerate=params.tolerate,
                                        swing_clamp_eps=eps)
            new_coords = jnp.where(valid[:, None], new_coords, coords)
            return new_coords, f

        fprev = jnp.zeros_like(coords0)
        coords, _ = jax.lax.fori_loop(0, iterations, body, (coords0, fprev))

        # epilogue in local slot space (forceatlas.hpp:539-570): center per
        # aggregate, scale by max member norm, pack into the parent ball
        ones = jnp.where(valid, 1.0, 0.0)
        cnt = jax.ops.segment_sum(ones, agg, num_segments=m_local + 1)
        mean = jax.ops.segment_sum(
            jnp.where(valid[:, None], coords, 0.0), agg,
            num_segments=m_local + 1) / jnp.maximum(cnt, 1.0)[:, None]
        centered = coords - mean[agg]
        norms = jnp.where(valid,
                          jnp.sqrt(jnp.sum(centered * centered, axis=1)),
                          0.0)
        mx = jax.ops.segment_max(norms, agg, num_segments=m_local + 1)
        mx = jnp.maximum(mx, eps)
        placed = center_slot + (r_slot / mx[agg])[:, None] * centered
        return jnp.where(valid[:, None], placed, 0.0)

    gs = P(EDGE_AXIS)           # global slot arrays, sharded by device block
    dv = P(EDGE_AXIS)           # [ndev, ...] stacked per-device arrays
    rep = P()
    step = jax.shard_map(
        local_refine, mesh=mesh,
        in_specs=(gs, gs, gs, gs, dv, dv, dv, dv, gs, gs, gs, rep),
        out_specs=gs,
        check_vma=False,
    )
    return jax.jit(step)


def refine_level_sharded(g: Graph, part: Partition, coords_A, r_A, dim: int,
                         *, mesh: Mesh, key=None, iterations: int = 100,
                         params: MultilevelFAParams | None = None,
                         layout: ShardedRefineLayout | None = None,
                         interpret: bool | None = None, coords0=None):
    """Multi-chip drop-in for refine_level_tiled / force_atlas_multilevel
    (forceatlas.hpp:314-574 semantics; called per level by embed's mesh
    path, the src/embed.cpp:786-793 slot of the recursion).

    ``coords0``: optional [n, dim] warm-start member offsets in the local
    aggregate frame.  Random init is drawn per VERTEX (device-count
    invariant), so layouts agree across mesh sizes given the same key."""
    if interpret is None:
        # decide by the MESH's devices, not the default backend: a dry-run
        # mesh of virtual CPU devices can coexist with a TPU default backend
        # (remote plugins ignore JAX_PLATFORMS=cpu)
        interpret = mesh.devices.flat[0].platform == "cpu"
    params = params or MultilevelFAParams()
    if key is None:
        key = jax.random.PRNGKey(0)
    ndev = mesh.devices.size
    if layout is None:
        layout = prepare_refine_sharded(g, part, params, ndev)

    from ..forceatlas.multilevel import external_pull

    coords_A = jnp.asarray(coords_A, jnp.float32)
    r_A = jnp.asarray(r_A, jnp.float32)
    pull_v = external_pull(g, part, coords_A, pull=params.pull,
                           eps=params.epsilon)                 # [n, d]
    n_glob = layout.n_slots_global
    sov = jnp.asarray(layout.slot_of_vertex.astype(np.int64))
    pull_slot = jnp.zeros((n_glob, dim), jnp.float32).at[sov].set(
        pull_v.astype(jnp.float32))

    key, init_key = jax.random.split(key)
    if coords0 is None:
        coords0 = jax.random.uniform(init_key, (layout.n, dim),
                                     dtype=jnp.float32, minval=-1.0,
                                     maxval=1.0)
    c0 = jnp.zeros((n_glob, dim), jnp.float32).at[sov].set(
        jnp.asarray(coords0, jnp.float32))

    # per-slot parent centers/radii (ghost aggregates -> row m is 0/1)
    ga = jnp.asarray(layout.global_agg_of_slot.astype(np.int64))
    cA_pad = jnp.concatenate([coords_A, jnp.zeros((1, dim), jnp.float32)], 0)
    rA_pad = jnp.concatenate([r_A, jnp.ones((1,), jnp.float32)], 0)
    center_slot = cA_pad[jnp.minimum(ga, coords_A.shape[0])]
    r_slot = rA_pad[jnp.minimum(ga, coords_A.shape[0])]

    step = make_refine_sharded_step(mesh, layout, dim, params, iterations,
                                    interpret=interpret)
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    gs, dv = P(EDGE_AXIS), P(EDGE_AXIS)
    placed = step(
        put(c0, gs), put(jnp.asarray(layout.valid_slot), gs),
        put(jnp.asarray(layout.deg_loc), gs),
        put(jnp.asarray(layout.agg_of_slot), gs),
        put(jnp.asarray(layout.sbf), dv), put(jnp.asarray(layout.rw), dv),
        put(jnp.asarray(layout.packed), dv),
        put(jnp.asarray(layout.deg_w_att), dv),
        put(pull_slot, gs), put(center_slot, gs), put(r_slot, gs), key)
    # the ONE communication of the level: re-replicate the placed slots and
    # read them out in vertex order
    placed = jax.device_put(placed, NamedSharding(mesh, P()))
    return placed[sov]
