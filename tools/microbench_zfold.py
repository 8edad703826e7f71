"""A/B of the z-fold conv rewrite on the real chip.

Times the ResNet stage-1 tail bottleneck (planes=32, the lane-starved site:
reference networks/resnet.py:97-126) and the full d101 encoder, XLA default
vs HYBRID_CTUNET_ZFOLD=1, at the flagship in-model shapes (B=8, 96^3 input
-> stage-1 at 48x48x96).

Timing protocol per PERF.md: chain ITERS calls between scalar fetches.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu import flags  # noqa: E402
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()

ITERS = 10
DT = jnp.bfloat16


def time_identity_block(mod, x):
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(carry, params, x):
        y = mod.apply(params, x + carry.astype(x.dtype))
        leaves = jax.tree_util.tree_leaves(y)
        return sum(jnp.sum(l.astype(jnp.float32)) * 0.0 for l in leaves)

    c = jnp.float32(0)
    float(step(c, params, x))
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(ITERS):
        c = step(c, params, x)
    float(c)
    return (time.time() - t0) / ITERS * 1e3


def main():
    from hybrid_ctunet_tpu.models.resnet3d import Bottleneck, ResNet3D

    x1 = jax.random.normal(jax.random.PRNGKey(1), (8, 48, 48, 96, 128), DT)
    x_in = jax.random.normal(jax.random.PRNGKey(2), (8, 96, 96, 96, 1), DT)

    for zf in ("0", "1"):
        with flags.override(ZFOLD=zf):
            ms_b = time_identity_block(Bottleneck(32, 1, dtype=DT), x1)
            ms_e = time_identity_block(
                ResNet3D(101, ((2, 2, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2)), dtype=DT),
                x_in,
            )
            print(f"ZFOLD={zf}: stage1 tail bottleneck {ms_b:7.2f} ms | "
                  f"d101 encoder {ms_e:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
