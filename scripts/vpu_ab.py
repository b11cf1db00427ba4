"""Microbenchmark: does the v5e VPU run bf16 elementwise chains faster
than f32?  Decides whether a bf16 sample-chain variant of the repulsion
estimator (the fused FA step's dominant ~2.3 ms term, BENCHMARKS.md
roofline) is worth building: the [s=64, B] d2/rsqrt/weight chain is ~18
f32 VPU ops per sample-lane; a 2x bf16 rate would halve it.

Run on the real chip: python -u scripts/vpu_ab.py
"""
from __future__ import annotations

import sys
import time
from functools import partial


def main():
    import jax
    import jax.numpy as jnp

    S, B = 64, 8192
    REP = 200

    def chain(x, c):
        # the estimator's op mix: sub, mul, add x3 (d2), max, rsqrt,
        # 3 muls, compare+select, colsum
        d2 = jnp.zeros_like(x)
        for _ in range(3):
            dk = x - c
            d2 = d2 + dk * dk
        inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-10))
        w = inv * inv * inv
        w = jnp.where(x > c, w, 0.0)
        return jnp.sum(w, axis=0, keepdims=True)

    @partial(jax.jit, static_argnames=("n",))
    def run(x, c, n):
        def body(i, acc):
            return acc + chain(x + acc[0, :1] * 0, c)[0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1, 1), x.dtype))

    for dt in (jnp.float32, jnp.bfloat16):
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (S, B), dtype=jnp.float32).astype(dt)
        c = jnp.full((S, 1), 0.5, dt)
        out = run(x, c, REP)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        out = run(x, c, REP)
        float(jnp.sum(out))
        dt_s = time.perf_counter() - t0
        ops = 18 * S * B * REP
        print(f"{dt.__name__}: {dt_s*1e3:.1f} ms for {REP} chains "
              f"-> {ops/dt_s/1e12:.2f} T lane-ops/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
