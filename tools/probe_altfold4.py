"""Probe: factor-4 SHIFTED z-fold conv vs the aligned factor-4 fold.

Stage-1 of the ResNet encoder runs its 3^3 C=32 convs in the aligned
factor-4 z-fold (conv3d_folded): a (3,3,3,4C,4F) kernel with 12/48 live
blocks = 25% useful MACs, measured 185 TF/s raw => ~46 TF/s useful
(tools/profile_encoder.py round 5). A HALF-FOLD-SHIFTED output quad
(planes 4q-2..4q+1) needs only input quads q-1,q => a (3,3,2,4C,4F)
kernel with 12/32 live = 37.5% useful. If the raw rate holds, conv2 drops
~1.5x. This probe measures the raw rates standalone before building the
model path (a2s/s2a chaining, masked IN, shifted residual reads).

Usage: python tools/probe_altfold4.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402
from hybrid_ctunet_tpu.ops.conv import _DN  # noqa: E402

enable_cache()
DT = jnp.bfloat16


def timeit(fn, *args, iters=30):
    """Chained dispatches with one scalar fetch (block_until_ready does not
    sync through the axon tunnel — PERF.md 'Hard-won rules')."""

    @jax.jit
    def step(carry, *args):
        r = fn(*args)
        return carry + jnp.sum(r.astype(jnp.float32)) * 0.0

    float(step(jnp.float32(0), *args))
    best = float("inf")
    for _ in range(3):
        c = jnp.float32(0)
        t0 = time.time()
        for _ in range(iters):
            c = step(c, *args)
        float(c)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def conv(x, w, pads):
    dn = _DN(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), pads, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


def main():
    B, X, Y, Zf = 8, 48, 48, 24
    C = F = 32
    f = 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, X, Y, Zf, f * C), DT)
    x_s = jax.random.normal(key, (B, X, Y, Zf + 1, f * C), DT)
    useful = 2 * 27 * C * F * B * X * Y * Zf * f / 1e9  # GF

    # aligned factor-4 fold (production): (3,3,3,4C,4F), 25% live
    wa = jax.random.normal(key, (3, 3, 3, f * C, f * F), DT)
    t = timeit(lambda x, w: conv(x, w, [(1, 1)] * 3), x, wa)
    raw = useful * f / t  # raw MACs = f * useful
    print(f"aligned f4 (3,3,3):  {t:7.3f} ms  raw {raw:6.1f} TF/s  "
          f"useful {useful / t:6.1f} TF/s")

    # shifted factor-4: a->s (3,3,2), pad fold axis (1,0)+(0,1) -> out Zf+1
    ws = jax.random.normal(key, (3, 3, 2, f * C, f * F), DT)
    t = timeit(lambda x, w: conv(x, w, [(1, 1), (1, 1), (1, 1)]), x, ws)
    raw = useful * (f * 2 / 3) / t  # raw = (32/12) * useful = useful*8/3
    print(f"shifted a2s (3,3,2): {t:7.3f} ms  raw {raw:6.1f} TF/s  "
          f"useful {useful / t:6.1f} TF/s   (out slots {Zf + 1})")

    # shifted s2a: input Zf+1 slots, pad (0,0) -> out Zf
    t = timeit(lambda x, w: conv(x, w, [(1, 1), (1, 1), (0, 0)]), x_s, ws)
    print(f"shifted s2a (3,3,2): {t:7.3f} ms  raw {useful * 8 / 3 / t:6.1f} TF/s  "
          f"useful {useful / t:6.1f} TF/s")

    # 1x1 block-diag at both extents (conv1/conv3 shapes, folded)
    for (ci, co, name) in ((128, 32, "conv1 512->128"), (32, 128, "conv3 128->512")):
        w1 = jax.random.normal(key, (1, 1, 1, f * ci, f * co), DT)
        xx = jax.random.normal(key, (B, X, Y, Zf, f * ci), DT)
        u1 = 2 * ci * co * B * X * Y * Zf * f / 1e9
        t = timeit(lambda x, w: conv(x, w, [(0, 0)] * 3), xx, w1)
        print(f"1x1 {name}: {t:7.3f} ms  raw {u1 * f / t:6.1f} TF/s  "
              f"useful {u1 / t:6.1f} TF/s")


if __name__ == "__main__":
    main()
