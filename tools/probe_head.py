"""Probe formulations of the 64 -> 14 output head at (8,96,96,96,64) bf16.

The microbench (tools/microbench_blocks.py) shows the Conv3d 1x1 head at
13.3 ms standalone — ~4x over its ~3 ms HBM floor (read 906 MB + write
198 MB at ~340 GB/s). Tries XLA-level rewrites before reaching for Pallas.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()

DT = jnp.bfloat16
B, S, CIN, COUT = 8, 96, 64, 14
ITERS = 10


def timeit(name, fn, *args):
    f = jax.jit(fn)

    @jax.jit
    def step(carry, *a):
        out = f(*[a[0] + carry.astype(DT), *a[1:]])
        return jnp.sum(out.astype(jnp.float32)) * 0.0

    c = jnp.float32(0)
    float(step(c, *args))
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(ITERS):
        c = step(c, *args)
    float(c)
    print(f"{name:28s} {(time.time() - t0) / ITERS * 1e3:8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, S, S, CIN), DT)
    w = jax.random.normal(key, (CIN, COUT), DT)
    b = jax.random.normal(key, (COUT,), DT)
    w128 = jnp.pad(w, ((0, 0), (0, 128 - COUT)))
    b128 = jnp.pad(b, ((0, 128 - COUT),))

    def conv1x1(x, w, b):
        return lax.conv_general_dilated(
            x, w[None, None, None], (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ).astype(DT) + b

    def flatdot(x, w, b):
        m = x.reshape(-1, CIN)
        return (jnp.dot(m, w, preferred_element_type=jnp.float32).astype(DT)
                + b).reshape(*x.shape[:-1], COUT)

    def paddot(x, w128, b128):
        m = x.reshape(-1, CIN)
        y = jnp.dot(m, w128, preferred_element_type=jnp.float32).astype(DT) + b128
        return y.reshape(*x.shape[:-1], 128)[..., :COUT]

    def paddot_keep(x, w128, b128):
        # keep the padded 128-lane output (consumer slices later; measures
        # whether the slice/copy is the cost)
        m = x.reshape(-1, CIN)
        y = jnp.dot(m, w128, preferred_element_type=jnp.float32).astype(DT) + b128
        return y.reshape(*x.shape[:-1], 128)

    def fp32dot(x, w, b):
        m = x.reshape(-1, CIN)
        y = jnp.dot(m, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)
        return y.reshape(*x.shape[:-1], COUT)

    timeit("conv1x1 (current head)", conv1x1, x, w, b)
    timeit("flat dot N=14", flatdot, x, w, b)
    timeit("flat dot N=128 + slice", paddot, x, w128, b128)
    timeit("flat dot N=128 keep-padded", paddot_keep, x, w128, b128)
    timeit("flat dot N=14 fp32 out", fp32dot, x, w, b)


if __name__ == "__main__":
    main()
