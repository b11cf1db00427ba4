"""Ring halo exchange overlapped with cross-edge attraction (Pallas).

The halo design (parallel/halo.py) exchanges boundary coords with one
``all_gather`` and only then computes the cross-edge attraction -- comm and
compute serialize.  This module is the comm/compute-overlap variant that
SURVEY.md SS2.2 row 3 / SS5 (long-context row) blueprint as the graph
analogue of ring attention: boundary blocks travel around the 1D ring via
``pltpu.make_async_remote_copy`` and each device computes the attraction of
the cross edges that *receive from* a block as soon as that block lands,
while the next block is already in flight.

One Pallas kernel per device, ``grid = (ndev,)`` ring steps.  Step ``k``:

  1. wait for block ``(me - k) % ndev`` to land in slot ``k`` (step 0 is a
     local DMA of this device's own boundary block);
  2. start forwarding slot ``k`` to the right neighbor's slot ``k + 1``
     (skipped on the last step) -- the DMA flies over ICI while 3. runs;
  3. gather the remote endpoints of this slot's cross-edge group out of the
     landed block ([128, Ec] lo-one-hot + hi masks, the factorized-gather
     structure of ops/pallas/edge_spmm.py) and emit the per-edge attraction
     force (forceatlas.hpp:169-203 semantics via forces.attraction_fa);
  4. wait the send so slot ``k`` may be read by the neighbor-side arrival
     in flight order (per-slot receive semaphores; slots are never reused,
     so late senders can never overwrite a block still being read).

Cross edges are grouped on the host by ring *arrival* slot -- group ``k``
of device ``d`` holds the edges whose receiver is exported by device
``(d - k) % ndev`` -- so the kernel's BlockSpec index map is simply
``k -> k`` and no per-device rotation happens on device.

The reference has no counterpart (it is single-address-space OpenMP,
CMakeLists.txt:18-24); the baseline this replaces is the XLA ``all_gather``
in halo.py.  Correctness is validated on the virtual CPU mesh through the
TPU interpreter (``pltpu.InterpretParams`` simulates the inter-chip DMAs);
speedup over the collective needs real multi-chip hardware.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..forceatlas import forces as F
from ..utils.params import ForceAtlasParams
from .mesh import EDGE_AXIS

D_PAD = 8           # sublane-padded coordinate rows ([d] -> [8, :] layout)
_LANE = 128

# Pallas collective_id namespace for this package (round-3 ADVICE): barrier
# semaphores are keyed by collective_id, so two barrier-using collective
# kernels composed into one program MUST use distinct ids.  Reserve ids
# here; the ring kernel owns 13.  Allocate any future collective kernel's
# id in this table.
RING_BARRIER_COLLECTIVE_ID = 13

# VMEM budget for the ring scratch buffer (v5e has ~16 MiB/core shared with
# the pipelined operands); past it the ring stages blocks in HBM and the
# gather runs over double-buffered VMEM chunk copies.
RING_VMEM_BUDGET_BYTES = 8 * 1024 * 1024
_HBM_CHUNK = 1024   # lanes per staged VMEM chunk in HBM mode


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class OverlapGroups:
    """Cross-edge groups in ring-arrival order + the local-only edge split.

    All arrays are stacked per device on axis 0 (shard with P('x')).
    ``cs/cr/cw/mask[dev, slot, Ec_max]``: slot ``k`` holds the cross edges
    of ``dev`` receiving from the boundary block of ``(dev - k) % ndev``
    (slot 0 -- the device's own block -- is empty by construction).  ``cr``
    indexes the *source device's* boundary export list (< B_max).
    ``local_*`` mirror HaloPlan.senders_loc/recv_idx/weights with the cross
    edges deadened (sender -> ghost row) so the local segment-sum path and
    the ring kernel partition the edge set exactly.
    """

    ndev: int
    ec_max: int
    cs: np.ndarray            # [ndev, ndev, Ec_max] int32, pad = blk (ghost)
    cr: np.ndarray            # [ndev, ndev, Ec_max] int32, pad = 0
    cw: np.ndarray            # [ndev, ndev, Ec_max] weight, pad = 0
    mask: np.ndarray          # [ndev, ndev, Ec_max] 1.0 live / 0.0 pad
    local_senders: np.ndarray  # [ndev, e_max] int32
    local_recv: np.ndarray     # [ndev, e_max] int32
    local_weights: np.ndarray  # [ndev, e_max]


def build_overlap_groups(plan) -> OverlapGroups:
    """Derive ring-ordered cross-edge groups from a HaloPlan.

    Requires ``plan.B_max % 128 == 0`` (build the plan with
    ``boundary_multiple=128``) so the kernel's hi/lo factorized gather
    tiles the boundary block exactly.
    """
    if plan.B_max % _LANE != 0:
        raise ValueError(
            f"overlap groups need B_max % {_LANE} == 0 (got {plan.B_max}); "
            "build_halo_plan(..., boundary_multiple=128)")
    ndev, blk, B_max = plan.ndev, plan.blk, plan.B_max

    per = [[[] for _ in range(ndev)] for _ in range(ndev)]
    for d in range(ndev):
        s_loc = plan.senders_loc[d]
        r_idx = plan.recv_idx[d]
        w = plan.weights[d]
        cross = (r_idx >= blk) & (s_loc < blk)
        pool = r_idx[cross] - blk
        src = pool // B_max
        slot = (d - src) % ndev
        within = pool % B_max
        cs_d = s_loc[cross]
        cw_d = w[cross]
        for k in range(ndev):
            sel = slot == k
            per[d][k] = (cs_d[sel], within[sel], cw_d[sel])

    ec_max = max((g[0].size for row in per for g in row), default=0)
    ec_max = max(_round_up(max(ec_max, 1), _LANE), _LANE)
    cs = np.full((ndev, ndev, ec_max), blk, np.int32)
    cr = np.zeros((ndev, ndev, ec_max), np.int32)
    cw = np.zeros((ndev, ndev, ec_max), plan.weights.dtype)
    mask = np.zeros((ndev, ndev, ec_max), np.float32)
    for d in range(ndev):
        for k in range(ndev):
            a, b, c = per[d][k]
            m = a.size
            cs[d, k, :m] = a
            cr[d, k, :m] = b
            cw[d, k, :m] = c
            mask[d, k, :m] = 1.0

    local_senders = plan.senders_loc.copy()
    local_recv = plan.recv_idx.copy()
    local_weights = plan.weights.copy()
    is_cross = local_recv >= blk
    local_senders[is_cross] = blk            # ghost row: dropped by segment
    local_recv[is_cross] = 0
    local_weights[is_cross] = 0
    return OverlapGroups(ndev=ndev, ec_max=ec_max, cs=cs, cr=cr, cw=cw,
                         mask=mask, local_senders=local_senders,
                         local_recv=local_recv, local_weights=local_weights)


def _ring_kernel(bnd_ref, xs_ref, cr_ref, cw_ref, degs_ref, mask_ref,
                 out_ref, *rest, ndev, b_max,
                 ec, params: ForceAtlasParams, barrier: bool,
                 hbm: bool = False):
    # ``rest``: in compiled HBM mode the ring buffer is an extra ANY-space
    # OUTPUT (Mosaic has no HBM scratch -- "only vmem, smem and
    # semaphore_mem"), otherwise a scratch buffer; either way it lands
    # right after out_ref, followed by the DMA semaphores (+ the VMEM
    # chunk double-buffer and its semaphores in HBM mode)
    buf, send_sem, recv_sems, *scratch = rest
    k = pl.program_id(0)
    me = jax.lax.axis_index(EDGE_AXIS)
    right = jax.lax.rem(me + jnp.int32(1), jnp.int32(ndev))

    # 0. cross-device startup barrier (round-2 ADVICE medium): the step runs
    #    every iteration, so a neighbor may still be inside its PREVIOUS
    #    invocation when we enter -- an early RDMA would land in scratch /
    #    semaphores the neighbor still owns.  Before the first send, signal
    #    both ring neighbors and wait for both of their signals.
    if barrier:
        @pl.when(k == 0)
        def _():
            bsem = pltpu.get_barrier_semaphore()
            left = jax.lax.rem(me + jnp.int32(ndev - 1), jnp.int32(ndev))
            pltpu.semaphore_signal(
                bsem, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(
                bsem, inc=1, device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(bsem, 2)

    # 1. slot k's block: own boundary (local DMA) at step 0, ring arrival
    #    after (per-slot receive semaphore; byte count = one slot)
    @pl.when(k == 0)
    def _():
        cp = pltpu.make_async_copy(bnd_ref, buf.at[0], send_sem)
        cp.start()
        cp.wait()

    @pl.when(k > 0)
    def _():
        pltpu.make_async_copy(buf.at[k], buf.at[k], recv_sems.at[k]).wait()

    # 2. forward slot k rightward while 3. computes
    @pl.when(k < ndev - 1)
    def _():
        pltpu.make_async_remote_copy(
            src_ref=buf.at[k], dst_ref=buf.at[k + 1],
            send_sem=send_sem, recv_sem=recv_sems.at[k + 1],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL).start()

    # 3. gather remote endpoints from the landed block and emit per-edge
    #    attraction (hi/lo factorized one-hot gather -> [D_PAD, ec])
    cr = cr_ref[0]                                    # [ec] int32
    lo = jax.lax.rem(cr, jnp.int32(_LANE))
    hi = jax.lax.div(cr, jnp.int32(_LANE))
    oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (_LANE, ec), 0)
             == lo[None, :]).astype(bnd_ref.dtype)    # [128, ec]
    zero = jnp.zeros((D_PAD, ec), bnd_ref.dtype)

    if not hbm:
        def gather_h(h, acc):
            blk_h = buf[k, :, pl.ds(h * _LANE, _LANE)]  # [D_PAD, 128]
            sel = jnp.where((hi == h)[None, :], oh_lo, 0.0)
            return acc + jnp.dot(blk_h, sel,
                                 precision=jax.lax.Precision.HIGHEST)

        xr = jax.lax.fori_loop(0, b_max // _LANE, gather_h, zero)
    else:
        # HBM-staged mode (round-3 VERDICT weak #2): the ring slots live in
        # HBM; the landed block is gathered over double-buffered VMEM chunk
        # copies, so B_max is bounded by HBM, not the 8 MiB VMEM budget.
        vbuf, chunk_sems = scratch
        CH = _HBM_CHUNK
        nch = b_max // CH
        gpc = CH // _LANE                    # hi groups per chunk

        def chunk_cp(c, slot):
            return pltpu.make_async_copy(
                buf.at[k, :, pl.ds(c * CH, CH)], vbuf.at[slot],
                chunk_sems.at[slot])

        chunk_cp(jnp.int32(0), jnp.int32(0)).start()

        def outer(c, acc):
            c = c.astype(jnp.int32)      # fori counter is int64 under x64
            slot = jax.lax.rem(c, jnp.int32(2))
            chunk_cp(c, slot).wait()

            @pl.when(c + 1 < nch)
            def _():
                chunk_cp(c + 1, jax.lax.rem(c + 1, jnp.int32(2))).start()

            def gather_h(h, acc2):
                blk_h = vbuf[slot, :, pl.ds(h * _LANE, _LANE)]
                sel = jnp.where((hi == c * gpc + h)[None, :], oh_lo, 0.0)
                return acc2 + jnp.dot(blk_h, sel,
                                      precision=jax.lax.Precision.HIGHEST)

            return jax.lax.fori_loop(0, gpc, gather_h, acc)

        xr = jax.lax.fori_loop(0, nch, outer, zero)
    xs = xs_ref[0]                                    # [D_PAD, ec]
    diff = xr - xs
    dist = jnp.maximum(jnp.sqrt(jnp.sum(diff * diff, axis=0)),
                       params.epsilon)
    fa = F.attraction_fa(dist, cw_ref[0], degs_ref[0],
                         linlog=params.linlog, delta=params.delta,
                         nohubs=params.nohubs, use_weights=params.use_weights)
    out_ref[0] = diff * (params.attract * fa / dist * mask_ref[0])[None, :]

    # 4. close the forward before the grid step ends
    @pl.when(k < ndev - 1)
    def _():
        pltpu.make_async_copy(buf.at[k], buf.at[k], send_sem).wait()


def ring_cross_forces(xb, deg_p1, bidx, cs, cr, cw, mask, *, ndev, b_max,
                      params: ForceAtlasParams, interpret: bool = False):
    """Per-edge cross-boundary attraction via the ring kernel.

    Call INSIDE shard_map (per-device operands, no leading device axis):
    ``xb [blk, d]`` local coords, ``deg_p1 [blk]``, ``bidx [B_max]`` local
    indices of exported vertices, ``cs/cr/cw/mask [ndev, Ec_max]`` the
    ring-ordered groups.  Returns per-edge forces ``[ndev, Ec_max, d]``
    aligned with ``cs`` (segment-sum by ``cs`` outside).
    """
    blk, d = xb.shape
    ec = cs.shape[-1]
    dtype = xb.dtype
    # the VMEM-resident ring buffer must fit the ~16 MB/core VMEM (shared
    # with the pipelined group operands); past the budget the ring stages
    # blocks in HBM with double-buffered VMEM chunk copies -- power-law
    # cuts at scale (B_max ~ 20% of n, halo.py:30) need this mode.
    scratch_bytes = ndev * D_PAD * b_max * jnp.dtype(dtype).itemsize
    hbm = scratch_bytes > RING_VMEM_BUDGET_BYTES
    if hbm and b_max % _HBM_CHUNK != 0:
        raise ValueError(
            f"HBM-staged ring needs B_max % {_HBM_CHUNK} == 0 (got "
            f"{b_max}); build_halo_plan(..., boundary_multiple="
            f"{_HBM_CHUNK})")
    ghost = jnp.zeros((1, d), xb.dtype)
    xcat = jnp.concatenate([xb, ghost], axis=0)
    dcat = jnp.concatenate([deg_p1, jnp.ones((1,), deg_p1.dtype)])

    def to_T(a):                                       # [..., m, d] -> [..., D_PAD, m]
        a = jnp.swapaxes(a, -1, -2)
        pad = [(0, 0)] * (a.ndim - 2) + [(0, D_PAD - d), (0, 0)]
        return jnp.pad(a, pad)

    bnd_T = to_T(xcat[jnp.clip(bidx, 0, blk)])         # [D_PAD, B_max]
    xs_T = to_T(xcat[cs])                              # [ndev, D_PAD, ec]
    degs = dcat[cs]                                    # [ndev, ec]

    kern = functools.partial(_ring_kernel, ndev=ndev, b_max=b_max, ec=ec,
                             params=params, barrier=ndev > 1, hbm=hbm)
    vec = pl.BlockSpec((1, ec), lambda k: (k, 0))
    mat = pl.BlockSpec((1, D_PAD, ec), lambda k: (k, 0, 0))
    # collective_id keys the startup-barrier semaphore (required by
    # get_barrier_semaphore in both compiled and interpret modes); Mosaic
    # REJECTS a collective_id when no barrier is used, so only set it when
    # the kernel actually barriers (ndev > 1 -- found by the ndev=1
    # real-TPU compile probe)
    cp = {"dimension_semantics": ("arbitrary",)}
    if ndev > 1:
        cp["collective_id"] = RING_BARRIER_COLLECTIVE_ID
    kwargs = {"compiler_params": pltpu.CompilerParams(**cp)}
    # the ring buffer: VMEM scratch normally; in compiled HBM mode an extra
    # ANY-space OUTPUT (Mosaic supports no HBM scratch -- "only vmem, smem
    # and semaphore_mem"); in interpret HBM mode VMEM scratch again (the
    # interpreter's VMEM is unbounded, the chunked gather still exercises)
    hbm_out = hbm and not interpret
    scratch = [] if hbm_out else [pltpu.VMEM((ndev, D_PAD, b_max), dtype)]
    scratch += [pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((ndev,))]
    if hbm:
        scratch += [pltpu.VMEM((2, D_PAD, _HBM_CHUNK), dtype),
                    pltpu.SemaphoreType.DMA((2,))]
    out_specs = mat
    out_shape = jax.ShapeDtypeStruct((ndev, D_PAD, ec), dtype)
    if hbm_out:
        out_specs = (mat, pl.BlockSpec(memory_space=pl.ANY))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((ndev, D_PAD, b_max), dtype))
    out = pl.pallas_call(
        kern,
        grid=(ndev,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), mat, vec, vec, vec,
                  vec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=pltpu.InterpretParams() if interpret else False,
        **kwargs,
    )(bnd_T, xs_T, cr, cw.astype(dtype), degs.astype(dtype),
      mask.astype(dtype))
    if hbm_out:
        out = out[0]
    return jnp.swapaxes(out, -1, -2)[..., :d]          # [ndev, ec, d]
