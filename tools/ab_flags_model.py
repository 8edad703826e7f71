"""Full-model chunk-forward A/B over arbitrary flag settings (sw=8, 96^3).

Usage: python tools/ab_flags_model.py KEY=V[,KEY=V...] [KEY=V...]
Each argv element is one configuration; 'base' = defaults.
"""
from __future__ import annotations

import contextlib
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


def bench(name, mod, x):
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(carry, params, x):
        out = mod.apply(params, x + carry.astype(x.dtype))
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) * 0.0 for l in leaves)

    c = jnp.float32(0)
    float(step(c, params, x))
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(ITERS):
        c = step(c, params, x)
    float(c)
    print(f"{name:28s} {(time.time() - t0) / ITERS * 1e3:8.2f} ms", flush=True)


def main():
    from hybrid_ctunet_tpu.models.ctunet import CTUNet
    from hybrid_ctunet_tpu.models.tunet import TUNet
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks

    set_remat_blocks(False)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 96, 96, 96, 1), DT)
    configs = sys.argv[1:] or ["base"]
    for cfg in configs:
        env = {}
        if cfg != "base":
            for kv in cfg.split(","):
                k, v = kv.split("=")
                env[k] = v
        with flags.override(**env) if env else contextlib.nullcontext():
            print(f"--- {cfg}")
            bench("TUNet chunk (sw8)", TUNet(out_channels=14, dtype=DT), x)
            bench("CTUNet chunk (sw8)", CTUNet(out_channels=14, dtype=DT), x)


if __name__ == "__main__":
    main()
