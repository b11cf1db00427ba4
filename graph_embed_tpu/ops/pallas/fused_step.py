"""Whole-iteration fused FA step kernel for sampled-repulsion graphs.

When repulsion is the sampled estimator, every term of a ForceAtlas
iteration is local to a lane block: DIA (stencil) attraction needs only a
+-block halo of x, residual attraction arrives as a precomputed SpMV
stream, repulsion needs the (tiny, broadcast) sample tiles, and
gravity/swing/speed are per-column math.  Fusing the whole iteration into
ONE Pallas kernel collapses the step's HBM traffic to reading x (with halo
views when DIA offsets exist), f_prev, the DIA weight rows and degree rows,
and writing (x', f) -- the composed path instead materializes every force
term.  Semantics are identical to forceatlas.tiled.fa_step_tiled_T (same
key => same samples => same floats, up to documented kernel precision),
verified by tests/test_tiled_step.py.

The halo is carried by passing x three times with shifted index maps
(prev/cur/next block); in-kernel offsets must satisfy |o| <= block.  DIA
offsets beyond one block of halo, residual (non-DIA) windowed-SpMV edges,
or graphs with no DIA structure at all enter through the optional
precomputed ``y_res`` stream -- the caller (forceatlas.tiled.fa_step_tiled_T)
splits offsets into near (in-kernel rolls) and far (pre-applied rolls)
around ``fused_block_for(n_pad)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from . import repulsion as RP

D_PAD = RP.D_PAD
TINY = 1e-30  # forces.TINY
FUSED_BLOCK = 32768


def fused_block_for(n_pad: int, block: int | None = None) -> int:
    """The largest power-of-two block <= FUSED_BLOCK (or the hint) that
    divides n_pad -- the kernel's lane-block size."""
    block = block or FUSED_BLOCK
    while n_pad % block and block >= 2:
        block //= 2
    return block


def fused_feasible(n_pad: int, block: int | None = None) -> bool:
    """True when n_pad admits a >=128-lane block grid.  DIA offsets play no
    role: offsets beyond one block of halo are pre-applied by the caller
    into the residual stream (split_offsets)."""
    return fused_block_for(n_pad, block) >= 128


def split_offsets(offsets: tuple, block: int) -> tuple[tuple, tuple]:
    """(near_idx, far_idx) positions into ``offsets``: near offsets become
    in-kernel lane rolls (|o| <= block, one block of halo per side); far
    ones must be pre-applied into ``y_res``."""
    near = tuple(k for k, o in enumerate(offsets) if abs(o) <= block)
    far = tuple(k for k, o in enumerate(offsets) if abs(o) > block)
    return near, far


def _shifted(prev, cur, nxt, o: int, block: int):
    """x[j + o] for the block's lanes j, from the three neighbor views.
    |o| <= block; wrap values are finite garbage masked by zero weights."""
    if o == 0:
        return cur
    if o > 0:
        if o == block:
            return nxt
        return jnp.concatenate([cur[:, o:], nxt[:, :o]], axis=1)
    if o == -block:
        return prev
    return jnp.concatenate([prev[:, block + o:], cur[:, :block + o]], axis=1)


def _fused_kernel(x_ref, fprev_ref, degw_ref, degp1_ref,
                  xs_ref, xs_sub_ref, degs_ref, idx_ref,
                  out_x_ref, out_f_ref, *, offsets: tuple, block: int,
                  s: int, dim: int, scale: float, params_t: tuple,
                  xp_ref=None, xn_ref=None, diaw_ref=None, yres_ref=None):
    (repel, attract, gravity, ks, ksmax, tolerate, eps) = params_t
    b = pl.program_id(0)
    x = x_ref[...]                                          # [8, B]
    prev = xp_ref[...] if xp_ref is not None else None
    nxt = xn_ref[...] if xn_ref is not None else None

    # attraction: y = sum_k w_k * x[.+o_k]  (+ optional residual SpMV:
    # windowed-kernel edges, far-offset DIA rolls, or -- for graphs with no
    # DIA structure -- the whole A @ x)
    y = yres_ref[...] if yres_ref is not None else jnp.zeros_like(x)
    for k, o in enumerate(offsets):
        y = y + diaw_ref[k:k + 1, :] * _shifted(prev, x, nxt, o, block)
    att = attract * (y - x * degw_ref[...])

    rep = RP._rep_math(x, degp1_ref[...], xs_ref[...], xs_sub_ref[...],
                       degs_ref[...], idx_ref[...], b * block, block=block,
                       s=s, dim=dim, repel=repel, eps=eps, scale=scale)

    mag = jnp.maximum(jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True)), TINY)
    grav = -(x / mag) * (gravity * degp1_ref[...])

    f = att + rep + grav

    # adaptive speed (forceatlas.hpp:214-261 with globals == 1.0):
    # swing/traction reductions run over the 8 sublanes -- rows dim..D_PAD
    # are exact zeros in every term, so they match the [n, d] row norms
    df = f - fprev_ref[...]
    swing = jnp.sqrt(jnp.sum(df * df, axis=0, keepdims=True))
    speed = ks * tolerate / (1.0 + tolerate * jnp.sqrt(swing))
    total_f = jnp.sqrt(jnp.sum(f * f, axis=0, keepdims=True))
    constraint = jnp.where(total_f > 0,
                           ksmax / jnp.maximum(total_f, TINY), jnp.inf)
    speed = jnp.minimum(speed, constraint)
    out_x_ref[...] = x + f * speed
    out_f_ref[...] = f


def fa_step_fused(xT, fprevT, dia_w, offsets: tuple, deg_w, deg_p1_pad, key,
                  *, n: int, num_samples: int, dim: int, params,
                  y_res=None, block: int | None = None,
                  interpret: bool = False):
    """One full FA iteration on transposed state, fully fused.

    ``params`` is a ForceAtlasParams (repulsion='sampled' semantics);
    ``offsets``/``dia_w`` carry only the NEAR diagonals (|o| <= block;
    pass ()/None for graphs without them); ``y_res`` optionally carries
    everything else (residual windowed SpMV and/or far-offset rolls) as a
    [D_PAD, n_pad] stream.  Returns (new_xT, fT), bit-compatible with
    fa_step_tiled_T."""
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    d_pad, n_pad = xT.shape
    assert d_pad == D_PAD
    block = fused_block_for(n_pad, block)
    assert block >= 128, (n_pad, "not a multiple of a 128+ lane block")
    assert all(abs(o) <= block for o in offsets), (offsets, block)
    s = num_samples
    xs_lane, xs_sub, degs_b, idx_b, s_pad = RP.prep_samples(
        xT, deg_p1_pad, key, n=n, num_samples=s, dim=dim)
    nb = n_pad // block
    params_t = (params.repel, params.attract, params.gravity, params.ks,
                params.ksmax, params.tolerate, params.epsilon)
    kernel = partial(_fused_kernel, offsets=tuple(offsets), block=block,
                     s=s, dim=dim, scale=n / s, params_t=params_t)

    def blk(ix):
        return pl.BlockSpec((D_PAD, block), ix)

    in_specs = [
        blk(lambda b: (0, b)),                         # x cur
        blk(lambda b: (0, b)),                         # f_prev
        pl.BlockSpec((1, block), lambda b: (0, b)),    # deg_w
        pl.BlockSpec((1, block), lambda b: (0, b)),    # deg_p1
        pl.BlockSpec((D_PAD, s_pad), lambda b: (0, 0)),
        pl.BlockSpec((s_pad, dim * 128), lambda b: (0, 0)),
        pl.BlockSpec((s_pad, 128), lambda b: (0, 0)),
        pl.BlockSpec((s_pad, 128), lambda b: (0, 0)),
    ]
    args = [xT, fprevT, deg_w.reshape(1, n_pad),
            deg_p1_pad.reshape(1, n_pad), xs_lane, xs_sub, degs_b, idx_b]
    # optional streams, in kernel-keyword order: the +-block halo views of x
    # (only when a nonzero near offset needs them), the near DIA weight
    # rows, the residual SpMV
    has_halo = any(o != 0 for o in offsets)
    has_dia = len(offsets) > 0
    has_res = y_res is not None
    opt_keys = []
    if has_halo:
        in_specs.append(blk(lambda b: (0, jnp.maximum(b - 1, 0))))
        in_specs.append(blk(lambda b: (0, jnp.minimum(b + 1, nb - 1))))
        args.extend([xT, xT])
        opt_keys.extend(["xp_ref", "xn_ref"])
    if has_dia:
        in_specs.append(pl.BlockSpec((len(offsets), block),
                                     lambda b: (0, b)))
        args.append(dia_w)
        opt_keys.append("diaw_ref")
    if has_res:
        in_specs.append(blk(lambda b: (0, b)))
        args.append(y_res)
        opt_keys.append("yres_ref")

    n_fixed = 8

    def kern(*refs):
        kw = dict(zip(opt_keys, refs[n_fixed:n_fixed + len(opt_keys)]))
        out_x, out_f = refs[n_fixed + len(opt_keys):]
        kernel(*refs[:n_fixed], out_x, out_f, **kw)

    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[blk(lambda b: (0, b)), blk(lambda b: (0, b))],
        out_shape=[jax.ShapeDtypeStruct((D_PAD, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((D_PAD, n_pad), jnp.float32)],
        interpret=interpret,
    )(*args)
