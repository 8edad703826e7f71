"""Standalone v5e rates: alternating-parity fold convs vs the native path.

Chained-iteration timing per PERF.md tunnel protocol. The interesting number
is the ResBlock-style conv1->IN->LeakyReLU->conv2 chain: altfold keeps 75%
useful MACs at 2C lanes vs the native path's min(C,C)-lane rate.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.ops.conv import (  # noqa: E402
    conv3d_altfold_a2o, conv3d_altfold_o2a, conv3d_same, fold_z,
    mask_odd_edges, unfold_z,
)
from hybrid_ctunet_tpu.ops.norm import (  # noqa: E402
    instance_norm_leaky, instance_norm_leaky_folded,
)
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()
DT = jnp.bfloat16
ITERS = 10


def timeit(name, fn, *args):
    f = jax.jit(fn)

    @jax.jit
    def step(carry, *a):
        out = f(a[0] + carry.astype(DT), *a[1:])
        return jnp.sum(out.astype(jnp.float32)) * 0.0

    c = jnp.float32(0)
    float(step(c, *args))
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(ITERS):
        c = step(c, *args)
    float(c)
    print(f"{name:44s} {(time.time() - t0) / ITERS * 1e3:8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    for B, S, C in [(8, 96, 64), (8, 96, 32), (4, 96, 128)]:
        x = jax.random.normal(key, (B, S, S, S, C), DT)
        w1 = jax.random.normal(key, (3, 3, 3, C, C), DT) * 0.1
        w2 = jax.random.normal(key, (3, 3, 3, C, C), DT) * 0.1

        def native_chain(x, w1, w2):
            y = instance_norm_leaky(conv3d_same(x, w1, 1, preferred_dtype=DT))
            return conv3d_same(y, w2, 1, preferred_dtype=DT)

        def altfold_chain(x, w1, w2):
            n = x.shape[1] * x.shape[2] * x.shape[3]
            y = mask_odd_edges(conv3d_altfold_a2o(fold_z(x), w1, preferred_dtype=DT))
            y = mask_odd_edges(instance_norm_leaky_folded(y, count=n))
            return unfold_z(conv3d_altfold_o2a(y, w2, preferred_dtype=DT))

        tag = f"B{B} {S}^3 C{C}"
        timeit(f"native  conv-IN-lrelu-conv {tag}", native_chain, x, w1, w2)
        timeit(f"altfold conv-IN-lrelu-conv {tag}", altfold_chain, x, w1, w2)

        def native_one(x, w1):
            return conv3d_same(x, w1, 1, preferred_dtype=DT)

        def altfold_one(x, w1):
            return conv3d_altfold_a2o(fold_z(x), w1, preferred_dtype=DT)

        timeit(f"native  single conv        {tag}", native_one, x, w1)
        timeit(f"altfold single conv (a2o)  {tag}", altfold_one, x, w1)
        print()


if __name__ == "__main__":
    main()
