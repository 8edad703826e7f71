"""Full-model forward equivalence check over arbitrary flag settings.

Usage: python tools/equiv_flags_model.py KEY=V[,KEY=V...]
Compares TUNet + CTUNet chunk-forward outputs under the given flags against
the defaults ('base') on the current backend, printing max abs diffs.
"""
from __future__ import annotations

import contextlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu import flags  # noqa: E402
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()
DT = jnp.bfloat16


def run(mod, x):
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mod.apply)(params, x)
    return [np.asarray(l, np.float32) for l in jax.tree_util.tree_leaves(out)]


def main():
    from hybrid_ctunet_tpu.models.ctunet import CTUNet
    from hybrid_ctunet_tpu.models.tunet import TUNet
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks

    set_remat_blocks(False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 96, 96, 1), DT)
    env = {}
    for kv in sys.argv[1].split(","):
        k, v = kv.split("=")
        env[k] = v
    for name, mod in [
        ("TUNet", TUNet(out_channels=14, dtype=DT)),
        ("CTUNet", CTUNet(out_channels=14, dtype=DT)),
    ]:
        base = run(mod, x)
        with flags.override(**env):
            got = run(mod, x)
        for i, (a, b) in enumerate(zip(base, got)):
            d = float(np.max(np.abs(a - b)))
            scale = float(np.max(np.abs(a))) or 1.0
            print(f"{name} leaf{i}: max|diff| {d:.3e}  rel {d / scale:.3e}",
                  flush=True)


main()
