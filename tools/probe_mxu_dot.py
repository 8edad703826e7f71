"""Mosaic MXU dot-throughput probe: what raw TF/s can a Pallas kernel reach
for the (M, K) @ (K, N) shapes a conv-as-matmul kernel would use?

Decides whether a z-paired im2col conv kernel (K=256 = 4 z-planes x 64ch,
N=128 paired outputs, 75% useful MACs) can beat XLA's ~50 TF/s at the C=64
conv sites (PERF.md "Hard-won rules"). All variants keep the lhs resident in
VMEM and repeat dots with a varying *rhs* scale (33K-element VPU op, ~free)
so Mosaic cannot CSE — the first probe revision scaled the lhs and measured
the VPU, not the MXU.

Variants:
- single: acc += lhs @ (rhs * c_i), one (M,K)x(K,N) dot per repeat.
- taps9:  the conv kernel's real inner loop — 9 consecutive dots per repeat
          from 9 row-shifted views of a resident (M + 8, K) lhs against 9
          distinct rhs tiles, accumulating into one (M, N) fp32 register.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()

DT = jnp.bfloat16


def _single_kernel(x_ref, w_ref, o_ref, *, repeats):
    x = x_ref[...]

    def body(i, acc):
        c = (i + 1).astype(DT)
        return acc + jax.lax.dot_general(
            x, w_ref[...] * c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jnp.zeros(o_ref.shape, jnp.float32)
    o_ref[...] = jax.lax.fori_loop(0, repeats, body, acc).astype(DT)


def _taps9_kernel(x_ref, w_ref, o_ref, *, repeats):
    m = o_ref.shape[0]

    def body(i, acc):
        c = (i + 1).astype(DT)
        for t in range(9):
            acc = acc + jax.lax.dot_general(
                x_ref[t : t + m, :], w_ref[t] * c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jnp.zeros(o_ref.shape, jnp.float32)
    o_ref[...] = jax.lax.fori_loop(0, repeats, body, acc).astype(DT)


def bench(mode, m, k, n, *, grid=8, repeats=64, iters=4):
    if mode == "single":
        x = jax.random.normal(jax.random.PRNGKey(0), (grid * m, k), DT)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), DT)
        kern = functools.partial(_single_kernel, repeats=repeats)
        in_specs = [
            pl.BlockSpec((m, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ]
        dots = repeats
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (grid * (m + 8), k), DT)
        w = jax.random.normal(jax.random.PRNGKey(1), (9, k, n), DT)
        kern = functools.partial(_taps9_kernel, repeats=repeats)
        in_specs = [
            pl.BlockSpec((m + 8, k), lambda i: (i, 0)),
            pl.BlockSpec((9, k, n), lambda i: (0, 0, 0)),
        ]
        dots = repeats * 9

    f = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((grid * m, n), DT),
    )

    @jax.jit
    def step(carry, x, w):
        return jnp.sum(f(x + carry.astype(DT), w).astype(jnp.float32)) * 0.0

    try:
        c = jnp.float32(0)
        float(step(c, x, w))
    except Exception as e:  # noqa: BLE001
        print(f"{mode:7s} M={m:<6d} K={k:<5d} N={n:<4d}  FAILED {type(e).__name__}",
              flush=True)
        return None
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(iters):
        c = step(c, x, w)
    float(c)
    dt = (time.time() - t0) / iters
    tfs = 2.0 * m * k * n * grid * dots / dt / 1e12
    print(f"{mode:7s} M={m:<6d} K={k:<5d} N={n:<4d}  R={dots:<4d} {dt * 1e3:8.2f} ms  {tfs:7.1f} TF/s",
          flush=True)
    return dt, 2.0 * m * k * n * grid * dots


def bench_diff(mode, m, k, n, *, grid=8, repeats=64, iters=4):
    """Differential rate: t(2R) - t(R) isolates compute from the constant
    dispatch/fetch overhead that floors small runs at ~5 ms."""
    r1 = bench(mode, m, k, n, grid=grid, repeats=repeats, iters=iters)
    r2 = bench(mode, m, k, n, grid=grid, repeats=2 * repeats, iters=iters)
    if r1 and r2:
        dt, flops = r2[0] - r1[0], r2[1] - r1[1]
        if dt > 1e-5:
            print(f"{'->diff':7s} M={m:<6d} K={k:<5d} N={n:<4d}       "
                  f"{dt * 1e3:8.2f} ms  {flops / dt / 1e12:7.1f} TF/s", flush=True)


def main():
    # repeats high enough that compute (tens of ms) dwarfs the ~5-7 ms
    # dispatch overhead — the R-vs-2R differential runs were noise-limited.
    for m, k, n in [
        (4096, 256, 128),
        (4096, 192, 64),
        (4096, 256, 64),
        (2048, 256, 128),
        (4096, 128, 128),
    ]:
        bench("single", m, k, n, repeats=2048, iters=3)
    print()
    bench("taps9", 4096, 256, 128, repeats=228, iters=3)
    bench("taps9", 4096, 192, 64, repeats=228, iters=3)


if __name__ == "__main__":
    main()
