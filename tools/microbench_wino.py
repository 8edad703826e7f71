"""Block-level A/B of the Winograd v2 fused-IN chain on the real chip.

Times a stride-1 ResBlock (the flagship full-res site: TUNet stem /
decoder blocks, reference networks/hybrid_CTUNet.py:29-105) under the
default XLA path vs HYBRID_CTUNET_WINOGRAD=2 at the channel widths the
pf8 models actually run (C=64) plus the C=32 width where the bare kernel
already won.

Timing protocol per PERF.md: chain ITERS calls between scalar fetches
(dispatch+fetch costs ~26 ms through the tunnel; block_until_ready does
not sync).
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

ITERS = 20


def time_block(apply_fn, params, x):
    y = apply_fn(params, x)
    float(jnp.sum(y.astype(jnp.float32)))  # warm compile + sync
    t0 = time.time()
    y = x
    for _ in range(ITERS):
        y = apply_fn(params, y)
    float(jnp.sum(y.astype(jnp.float32)))
    return (time.time() - t0) / ITERS * 1e3


def main():
    from hybrid_ctunet_tpu.models.layers import ResBlock, set_remat_blocks

    set_remat_blocks(False)
    dtype = jnp.bfloat16
    for c, shape in [
        (64, (8, 96, 96, 96)),
        (32, (8, 96, 96, 96)),
    ]:
        x = jax.random.normal(jax.random.PRNGKey(0), (*shape, c), dtype)
        blk = ResBlock(c, 3, 1, dtype=dtype)
        params = jax.jit(blk.init)(jax.random.PRNGKey(1), x)

        results = {}
        for label, env in [
            ("xla", dict(WINOGRAD="0")),
            ("wino2", dict(WINOGRAD="2", WINOGRAD_CH=str(c))),
        ]:
            with flags.override(**env):
                fn = jax.jit(blk.apply)
                ms = time_block(fn, params, x)
            results[label] = ms
            print(f"C={c} {shape} {label}: {ms:.2f} ms", flush=True)
        r = results["xla"] / results["wino2"]
        print(f"C={c} speedup wino2/xla = {r:.3f}x", flush=True)


if __name__ == "__main__":
    main()
