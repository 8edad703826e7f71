"""Why does the z-folded conv underperform its lane width?

Probes kz/z-extent variants of the folded shape (Cin=Cout=64 after folding
C=32) to find which structural property gates the rate.
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

ITERS = 10


def probe(shape, cin, cout, k, pad="VALID"):
    x = jax.random.normal(jax.random.PRNGKey(0), (*shape, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (*k, cin, cout), jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    padding = pad if pad == "VALID" else [(p, p) for p in pad]

    @jax.jit
    def step(c, x, w):
        y = lax.conv_general_dilated(
            x + c.astype(x.dtype), w, (1, 1, 1), padding,
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return jnp.sum(y) * 0.0

    c = jnp.float32(0)
    float(step(c, x, w))
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(ITERS):
        c = step(c, x, w)
    float(c)
    ms = (time.time() - t0) / ITERS * 1e3
    oz = [s - kk + 1 if pad == "VALID" else s for s, kk in zip(shape[1:], k)]
    vox = shape[0] * oz[0] * oz[1] * oz[2]
    tf = vox * k[0] * k[1] * k[2] * cin * cout * 2 / (ms / 1e3) / 1e12
    print(f"k={k} {cin}->{cout} @ {shape} {pad if pad=='VALID' else 'SAME'}: "
          f"{ms:7.2f} ms  {tf:6.1f} TF/s", flush=True)


def main():
    # folded stage-1 shape family (Cin=Cout=64)
    probe((8, 50, 50, 49), 64, 64, (3, 3, 2))           # actual zfold shape
    probe((8, 50, 50, 56), 64, 64, (3, 3, 2))           # 8-aligned z folds
    probe((8, 50, 50, 50), 64, 64, (3, 3, 3))           # kz=3 same z count
    probe((8, 48, 48, 48), 64, 64, (3, 3, 3), (1, 1, 1))  # SAME cube baseline
    probe((8, 48, 48, 96), 64, 64, (3, 3, 3), (1, 1, 1))  # tall-z baseline
    probe((8, 48, 48, 96), 64, 64, (3, 3, 2))           # kz=2 on tall z
    # does growing x*y rows help at fixed z? (M-dependence check)
    probe((8, 98, 98, 49), 64, 64, (3, 3, 2))
    # folded with z in X position instead (fold axis ordering)
    probe((8, 49, 50, 50), 64, 64, (2, 3, 3))


if __name__ == "__main__":
    main()
