"""Standalone A/B of the fused Pallas pixel-shuffle vs the XLA path on the
real chip, at the pyramid's actual stage shapes (sw=8 chunk)."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.ops import shuffle_pallas as sp  # noqa: E402
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()
DT = jnp.bfloat16
ITERS = 30

STAGES = [
    ("stage1", (8, 12, 12, 24, 512), (2, 2, 2), 256),
    ("stage2", (8, 24, 24, 48, 256), (2, 2, 2), 128),
    ("stage3", (8, 48, 48, 96, 128), (2, 2, 1), 64),
]


def timeit(fn, *args):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else None
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    g = np.random.default_rng(0)
    for name, shape, factor, F in STAGES:
        B, X, Y, Z, C = shape
        cp = C // (factor[0] * factor[1] * factor[2])
        x = jnp.asarray(g.standard_normal(shape), DT)
        w = jnp.asarray(g.standard_normal((cp, F)) * 0.1, jnp.float32)
        b = jnp.asarray(g.standard_normal((F,)) * 0.1, jnp.float32)
        if not sp.supports(shape, factor, F, DT):
            print(f"{name} {shape} f={factor} F={F}: UNSUPPORTED (lane/align gate)")
            continue

        ref = jax.jit(lambda x_, w_, b_: sp.reference_shuffle(x_, w_, b_, factor, DT))
        fus = jax.jit(lambda x_, w_, b_: sp.fused_pixel_shuffle(x_, w_, b_, factor, DT))
        a = np.asarray(ref(x, w, b), np.float32)
        c = np.asarray(fus(x, w, b), np.float32)
        rel = np.abs(a - c).max() / (np.abs(a).max() + 1e-9)
        tr = timeit(ref, x, w, b)
        tf = timeit(fus, x, w, b)
        fz = jax.jit(
            lambda x_, w_, b_: sp.fused_pixel_shuffle(x_, w_, b_, factor, DT, False, True)
        )
        cz = np.asarray(fz(x, w, b), np.float32)
        Bz, Xz, Yz, Zh, F2 = cz.shape
        relz = np.abs(a - cz.reshape(Bz, Xz, Yz, Zh * 2, F2 // 2)).max() / (
            np.abs(a).max() + 1e-9
        )
        tz = timeit(fz, x, w, b)
        print(f"{name} {shape} f={factor} F={F}: xla {tr:.2f} ms, pallas {tf:.2f} ms "
              f"({tr / tf:.2f}x), zfold {tz:.2f} ms ({tr / tz:.2f}x), "
              f"max rel diff {rel:.2e}/{relz:.2e}")


if __name__ == "__main__":
    main()
