"""A/B the small-bucket refinement repulsion kernels on the real TPU.

Synthesizes one bucket's slot block (no partition needed) and times, per
variant, a 20-iteration jitted loop: the roll kernel, and the chunk kernel
at each matmul orientation/precision.

  python scripts/chunk_ab.py [S] [m_b]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    m_b = int(sys.argv[2]) if len(sys.argv) > 2 else 48640
    iters = 20

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    from graph_embed_tpu.forceatlas import multilevel_tiled as mlt

    D = mlt.ES.D_PAD
    width = m_b * S
    rng = np.random.default_rng(0)
    x = np.zeros((D, width), np.float32)
    x[:3] = rng.uniform(-1, 1, size=(3, width))
    x[D - 1] = rng.integers(0, 5, size=width).astype(np.float32)
    ghost = rng.random(width) < 0.3
    x[D - 1, ghost] = -1.0
    xj = jnp.asarray(x)

    def timed(fn):
        @jax.jit
        def run(xv):
            def body(i, acc):
                return acc + 1e-9 * fn(xv + 1e-9 * acc)
            return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(xv))
        out = run(xj)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        out = run(xj)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / iters * 1e3

    # roll
    C_roll = min(mlt.ROLL_LANES // S, m_b)
    while m_b % C_roll:
        C_roll //= 2

    def roll(xv):
        kern = partial(mlt._bucket_repulsion_roll_kernel, S=S, dim=3,
                       repel=1.0, eps=1e-5)
        return pl.pallas_call(
            kern, grid=(m_b // C_roll,),
            in_specs=[pl.BlockSpec((D, C_roll * S), lambda i: (0, i))],
            out_specs=pl.BlockSpec((D, C_roll * S), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((D, width), jnp.float32),
        )(xv)

    print(f"S={S} m_b={m_b} width={width}", flush=True)
    print(f"  roll (C={C_roll}):        {timed(roll):7.2f} ms/iter",
          flush=True)

    bw = mlt.CHUNK_LANES
    cpb = bw // 128

    for prec in ("highest", "default"):
        p = (jax.lax.Precision.HIGHEST if prec == "highest"
             else jax.lax.Precision.DEFAULT)

        def chunk_o1(xv, p=p):
            def kern(x_ref, xcol_ref, out_ref):
                xx = x_ref[...]
                a_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                b_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                mask = ((a_i // S) == (b_i // S)) & (a_i != b_i)
                outs = []
                for c in range(cpb):
                    xc = xx[:, c * 128:(c + 1) * 128]
                    xcol = xcol_ref[c]
                    w_col = jnp.maximum(xcol[:, D - 1:D] + 1.0, 0.0)
                    d2 = jnp.zeros((128, 128), jnp.float32)
                    for k in range(3):
                        dk = xcol[:, k:k + 1] - xc[k:k + 1, :]
                        d2 = d2 + dk * dk
                    inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-10))
                    M = jnp.where(mask, w_col * (inv * inv * inv), 0.0)
                    ones = jnp.ones((1, 128), jnp.float32)
                    V = jnp.concatenate(
                        [xc[:3], ones, jnp.zeros((D - 4, 128), jnp.float32)],
                        axis=0)
                    G = jnp.dot(V, M, preferred_element_type=jnp.float32,
                                precision=p)
                    scale = jnp.maximum(xc[D - 1:D] + 1.0, 0.0)
                    rows = [scale * (xc[k:k + 1] * G[3:4] - G[k:k + 1])
                            for k in range(3)]
                    rows.append(jnp.zeros((D - 3, 128), jnp.float32))
                    outs.append(jnp.concatenate(rows, axis=0))
                out_ref[...] = jnp.concatenate(outs, axis=1)

            xcols = xv.reshape(D, width // 128, 128).transpose(1, 2, 0)
            return pl.pallas_call(
                kern, grid=(width // bw,),
                in_specs=[pl.BlockSpec((D, bw), lambda i: (0, i)),
                          pl.BlockSpec((cpb, 128, D), lambda i: (i, 0, 0))],
                out_specs=pl.BlockSpec((D, bw), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((D, width), jnp.float32),
            )(xv, xcols)

        print(f"  chunk o1 {prec:8s}:   {timed(chunk_o1):7.2f} ms/iter",
              flush=True)

    # VPU-reduction variant: no matmul at all; gathered + rowsum by
    # sublane-reductions of M * xcol_k
    def chunk_vpu(xv):
        def kern(x_ref, xcol_ref, out_ref):
            xx = x_ref[...]
            a_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            b_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            mask = ((a_i // S) == (b_i // S)) & (a_i != b_i)
            outs = []
            for c in range(cpb):
                xc = xx[:, c * 128:(c + 1) * 128]
                xcol = xcol_ref[c]
                w_col = jnp.maximum(xcol[:, D - 1:D] + 1.0, 0.0)
                d2 = jnp.zeros((128, 128), jnp.float32)
                for k in range(3):
                    dk = xcol[:, k:k + 1] - xc[k:k + 1, :]
                    d2 = d2 + dk * dk
                inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-10))
                M = jnp.where(mask, w_col * (inv * inv * inv), 0.0)
                rowsum = jnp.sum(M, axis=0, keepdims=True)      # [1, 128]
                scale = jnp.maximum(xc[D - 1:D] + 1.0, 0.0)
                rows = []
                for k in range(3):
                    gath = jnp.sum(M * xcol[:, k:k + 1], axis=0,
                                   keepdims=True)
                    rows.append(scale * (xc[k:k + 1] * rowsum - gath))
                rows.append(jnp.zeros((D - 3, 128), jnp.float32))
                outs.append(jnp.concatenate(rows, axis=0))
            out_ref[...] = jnp.concatenate(outs, axis=1)

        xcols = xv.reshape(D, width // 128, 128).transpose(1, 2, 0)
        return pl.pallas_call(
            kern, grid=(width // bw,),
            in_specs=[pl.BlockSpec((D, bw), lambda i: (0, i)),
                      pl.BlockSpec((cpb, 128, D), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((D, bw), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((D, width), jnp.float32),
        )(xv, xcols)

    print(f"  chunk vpu-reduce:    {timed(chunk_vpu):7.2f} ms/iter",
          flush=True)


if __name__ == "__main__":
    main()
