"""Fused negative-sampling repulsion kernel.

The XLA estimator (forceatlas/forces.py::repulsion_sampled) materializes
several [n, s] f32 intermediates (distance matrix, weight matrix) -- ~0.5GB
of HBM traffic per iteration at n = 2M, s = 64, measured ~2ms of the FA
step.  Fusing the whole estimator keeps the [s, B] tile in VMEM: per
1024-lane vertex block, two small MXU matmuls (sample dots, force
accumulation) and a VPU chain; HBM traffic drops to reading x/deg and
writing the force block.

Semantics identical to repulsion_sampled given the same sample indices
(forceatlas.hpp:151-167's n^2 sum, estimated): verified by
tests/test_tiled_step.py.
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

D_PAD = 8
REP_BLOCK = 8192  # measured: 1024-lane blocks paid ~0.5 ms of grid overhead
#                   at n = 2M; 8192 amortizes it (4.7 -> 4.2 ms), and VMEM
#                   holds the [s, 8192] tile comfortably


def _rep_math(x, deg_row, xs_full, xs_sub, degs, idx, lane0, *, block: int,
              s: int, dim: int, repel: float, eps: float, scale: float):
    """The estimator math on one [D_PAD, block] tile (shared by the
    standalone kernel and the fused FA-step kernel; ``lane0`` is the global
    lane id of column 0)."""
    # diff-form d2, unrolled over the (tiny) coordinate dimension: exact in
    # f32 -- the gram identity cancels catastrophically at small distances
    # (and a HIGHEST-precision matmul costs 6 bf16 passes); d <= 3 makes the
    # VPU broadcast-subtract form cheaper AND exact.  Sample coordinates come
    # sublane-oriented (xs_sub [S, dim*128], column block k lane-replicating
    # coordinate k) so the [S, 1] slices below avoid lane->sublane relayouts.
    d2 = jnp.zeros((s, block), jnp.float32)
    for k in range(dim):
        dk = xs_sub[:s, k * 128:k * 128 + 1] - x[k][None, :]      # [S, B]
        d2 = d2 + dk * dk
    # 1/max(sqrt(d2), eps)^3 as rsqrt + multiplies: the sqrt-then-divide
    # chain was ~0.3 ms/step of multi-pass VPU transcendentals; the hardware
    # rsqrt is ~2e-4 relative -- far below the estimator's 1/sqrt(s)
    # sampling noise (and the bf16 accumulation tolerance documented below)
    inv = jax.lax.rsqrt(jnp.maximum(d2, eps * eps))      # [S, B]
    # degs/idx arrive lane-replicated [S, 128]; a [S, 1] static slice
    # broadcasts along lanes (cheaper than a [1, S] -> [S, 1] relayout)
    w = degs[:s, :1] * (inv * inv * inv)                 # [S, B]
    gid = jax.lax.broadcasted_iota(jnp.int32, (s, block), 1) + lane0
    w = jnp.where(idx[:s, :1] == gid, 0.0, w)
    colsum = jnp.sum(w, axis=0, keepdims=True)           # [1, B]
    # accumulation runs at native bf16 matmul precision: the x*colsum - xs@w
    # cancellation then carries an O(0.4%) error on near-pair-dominated rows,
    # which is far below the estimator's own ~1/sqrt(s) sampling noise.  (A
    # K-stacked hi/lo split version measured 1.9ms slower per FA step for no
    # visible quality change.)  What MUST stay exact is d2 above: the gram
    # form's eps-collapse scaled single terms by ~1e9, a systematic blowup,
    # not noise.
    xs = xs_full[:, :s]                                  # [8, S] f32
    f = x * colsum - jnp.dot(xs, w,
                             preferred_element_type=jnp.float32)
    return (repel * scale) * deg_row * f


def _rep_kernel(x_ref, deg_ref, xs_ref, xs_sub_ref, degs_ref, idx_ref,
                out_ref, *, block: int, s: int, dim: int, repel: float,
                eps: float, scale: float):
    b = pl.program_id(0)
    out_ref[...] = _rep_math(x_ref[...], deg_ref[...], xs_ref[...],
                             xs_sub_ref[...], degs_ref[...], idx_ref[...],
                             b * block, block=block, s=s, dim=dim,
                             repel=repel, eps=eps, scale=scale)


def repulsion_sampled_fused(xT, deg_p1_pad, key, *, n: int, num_samples: int,
                            repel: float, eps: float, dim: int = 3,
                            interpret: bool = False, block: int | None = None):
    """rep^T [D_PAD, n_pad]: fused equivalent of forces.repulsion_sampled
    over transposed padded coords (same key => same samples => same value).

    ``deg_p1_pad``: [n_pad] with deg+1 in the first n slots (pad value free;
    pad columns are discarded by the caller's unpad)."""
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    d_pad, n_pad = xT.shape
    assert d_pad == D_PAD
    block = block or REP_BLOCK
    while n_pad % block:
        block //= 2
    assert block >= 128, (n_pad, "not a multiple of a 128+ lane block")
    s = num_samples
    xs_lane, xs_sub, degs_b, idx_b, s_pad = prep_samples(
        xT, deg_p1_pad, key, n=n, num_samples=s, dim=dim)
    grid = n_pad // block
    kernel = partial(_rep_kernel, block=block, s=s, dim=dim, repel=repel,
                     eps=eps, scale=n / s)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((D_PAD, block), lambda b: (0, b)),
            pl.BlockSpec((1, block), lambda b: (0, b)),
            pl.BlockSpec((D_PAD, s_pad), lambda b: (0, 0)),
            pl.BlockSpec((s_pad, dim * 128), lambda b: (0, 0)),
            pl.BlockSpec((s_pad, 128), lambda b: (0, 0)),
            pl.BlockSpec((s_pad, 128), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((D_PAD, block), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((D_PAD, n_pad), jnp.float32),
        interpret=interpret,
    )(xT, deg_p1_pad.reshape(1, n_pad), xs_lane, xs_sub, degs_b, idx_b)


def prep_samples(xT, deg_p1_pad, key, *, n: int, num_samples: int, dim: int):
    """Draw the negative samples and lay them out for the kernels:
    (xs_lane [D_PAD, s_pad], xs_sub [s_pad, dim*128], degs [s_pad, 128],
    idx [s_pad, 128], s_pad).  The sample axis is padded to a lane multiple:
    degs = 0 makes pad samples weightless, idx = -1 never matches a vertex."""
    s = num_samples
    s_pad = -(-s // 128) * 128
    idx = jax.random.randint(key, (s,), 0, n)
    xs = jnp.zeros((dim, s_pad), jnp.float32).at[:, :s].set(xT[:dim, idx])
    xs_lane = jnp.zeros((D_PAD, s_pad), jnp.float32).at[:dim].set(xs)
    degs = jnp.zeros((s_pad,), jnp.float32).at[:s].set(deg_p1_pad[idx])
    idx_p = jnp.full((s_pad,), -1, jnp.int32).at[:s].set(idx.astype(jnp.int32))
    xs_sub = jnp.broadcast_to(
        xs.T[:, :, None], (s_pad, dim, 128)).reshape(s_pad, dim * 128)
    return (xs_lane, xs_sub,
            jnp.broadcast_to(degs[:, None], (s_pad, 128)),
            jnp.broadcast_to(idx_p[:, None], (s_pad, 128)), s_pad)
