"""Which in-kernel shape casts does Mosaic support on this toolchain?

Each case: load (M, F) bf16, reshape, store. PASS/FAIL per case guides the
stage-3 folded-output shuffle design (sublane-pair -> lane merges)."""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()


def try_case(name, in_shape, fn, out_shape):
    def kernel(x_ref, o_ref):
        o_ref[...] = fn(x_ref[...])

    x = jnp.asarray(np.random.default_rng(0).standard_normal(in_shape), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
        )(x)
        ref = fn(x)
        ok = np.array_equal(np.asarray(out, np.float32), np.asarray(ref, np.float32))
        print(f"{name}: COMPILES, values {'OK' if ok else 'WRONG'}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"{name}: FAIL ({msg})")


if __name__ == "__main__":
    M, F = 512, 64
    try_case("rowpair->lanes 2D (M,64)->(M/2,128)", (M, F),
             lambda t: t.reshape(M // 2, 2 * F), (M // 2, 2 * F))
    try_case("lanes->rowpair 2D (M/2,128)->(M,64)", (M // 2, 2 * F),
             lambda t: t.reshape(M, F), (M, F))
    try_case("3D fold (8,64,64)->(8,32,128)", (8, 64, 64),
             lambda t: t.reshape(8, 32, 128), (8, 32, 128))
    try_case("lane split (256,256)->(256,2,128)", (256, 256),
             lambda t: t.reshape(256, 2, 128), (256, 2, 128))
    try_case("interleave (64,32,256)->(64,64,128)", (64, 32, 256),
             lambda t: t.reshape(64, 64, 128), (64, 64, 128))
