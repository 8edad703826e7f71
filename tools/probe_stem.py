"""Rate probe for ResNet 7^3 stem conv formulations (v5e).

Current production path (_stem_s2d_conv): 2x2 xy space-to-depth -> conv
(4,4,7,4,64) — 9.2 ms at 11 TF/s in the device trace (Cin=4 lanes).
Candidates fold z as well so Cin/Cout grow; taps duplicated into parity
classes exactly as in the xy s2d (shapes only here — rates first, exact
weight scatter later if a candidate wins).
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
ITERS = 10


def timeit(name, fn, *args):
    f = jax.jit(fn)

    @jax.jit
    def step(carry, *a):
        out = f(a[0] + carry.astype(DT), *a[1:])
        return jnp.sum(out.astype(jnp.float32)) * 0.0

    try:
        c = jnp.float32(0)
        float(step(c, *args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED {type(e).__name__}", flush=True)
        return
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(ITERS):
        c = step(c, *args)
    float(c)
    print(f"{name:52s} {(time.time() - t0) / ITERS * 1e3:8.2f} ms", flush=True)


def conv(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=DT,
    )


def main():
    key = jax.random.PRNGKey(0)
    B = 8
    # current: xs (B, 51, 51, 102, 4) w (4,4,7,4,64)
    x0 = jax.random.normal(key, (B, 52, 52, 102, 4), DT)
    w0 = jax.random.normal(key, (4, 4, 7, 4, 64), DT) * 0.1
    timeit("current  s2d xy     (4,4,7)x4 ->64", conv, x0, w0)

    # z-fold2 aligned pairs: Cin 8, Cout 128, kz 5
    x1 = jax.random.normal(key, (B, 52, 52, 52, 8), DT)
    w1 = jax.random.normal(key, (4, 4, 5, 8, 128), DT) * 0.1
    timeit("zfold2   s2d xy+z2  (4,4,5)x8 ->128", conv, x1, w1)

    # z-fold4 aligned quads: Cin 16, Cout 256, kz 4
    x2 = jax.random.normal(key, (B, 52, 52, 27, 16), DT)
    w2 = jax.random.normal(key, (4, 4, 4, 16, 256), DT) * 0.1
    timeit("zfold4   s2d xy+z4  (4,4,4)x16->256", conv, x2, w2)

    # z-fold8: Cin 32, Cout 512, kz 3
    x3 = jax.random.normal(key, (B, 52, 52, 14, 32), DT)
    w3 = jax.random.normal(key, (4, 4, 3, 32, 512), DT) * 0.1
    timeit("zfold8   s2d xy+z8  (4,4,3)x32->512", conv, x3, w3)


if __name__ == "__main__":
    main()
