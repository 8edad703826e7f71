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


if __name__ == "__main__" and "pair" not in sys.argv:
    main()


def pair_chain_probe():
    """Full bottleneck-PAIR chain A/B: the aligned-f4 production path vs the
    alternating shifted-f4 path (conv1 1x1 block-diag, conv2 3^3 a2s/s2a,
    conv3 1x1 block-diag, masked folded IN, shift-indexed residual reads).
    Stage-1 shapes: inter-block 4*128=512 lanes, planes 32, 8x48x48x(96/4)."""
    import numpy as np
    from hybrid_ctunet_tpu.ops.conv import (
        altfold_kernel, conv3d_folded, fold_z, odd_edge_mask, unfold_z,
    )
    from hybrid_ctunet_tpu.ops.norm import (
        instance_norm_folded, instance_norm_leaky_folded,
    )
    from hybrid_ctunet_tpu.ops.act import leaky_relu

    f = 4
    B, X, Y, Zf = 8, 48, 48, 24
    P, C = 32, 128  # planes, inter-block channels
    n_vox = X * Y * Zf * f
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, X, Y, Zf, f * C), DT)
    w1 = jax.random.normal(key, (1, 1, 1, C, P), DT) * 0.05
    w2 = jax.random.normal(key, (3, 3, 3, P, P), DT) * 0.05
    w3 = jax.random.normal(key, (1, 1, 1, P, C), DT) * 0.05

    def aligned_block(x):
        y = conv3d_folded(x, w1, factor=f, preferred_dtype=DT)
        y = instance_norm_leaky_folded(y, factor=f)
        y = conv3d_folded(y, w2, factor=f, preferred_dtype=DT)
        y = instance_norm_leaky_folded(y, factor=f)
        y = conv3d_folded(y, w3, factor=f, preferred_dtype=DT)
        y = instance_norm_folded(y, factor=f)
        return leaky_relu(y + x)

    def aligned_pair(x):
        return aligned_block(aligned_block(x))

    def conv_fold(xx, w, pads):
        return conv(xx, w, pads)

    def shift_a2s(t):
        half = t.shape[-1] // 2
        lo = jnp.pad(t[..., half:], ((0, 0),) * 3 + ((1, 0), (0, 0)))
        hi = jnp.pad(t[..., :half], ((0, 0),) * 3 + ((0, 1), (0, 0)))
        return jnp.concatenate([lo, hi], axis=-1)

    def shift_s2a(t):
        half = t.shape[-1] // 2
        return jnp.concatenate(
            [t[:, :, :, :-1, half:], t[:, :, :, 1:, :half]], axis=-1
        )

    wk = altfold_kernel(w2, factor=f)  # (3,3,2,4P,4P)

    def shifted_pair(x):
        # block A: aligned in -> shifted out
        y = conv3d_folded(x, w1, factor=f, preferred_dtype=DT)
        y = instance_norm_leaky_folded(y, factor=f)
        y = conv_fold(y, wk, [(1, 1), (1, 1), (1, 1)]).astype(DT)  # a2s
        mA = odd_edge_mask(Zf + 1, f * P, jnp.float32)[None, None, None]
        y = instance_norm_leaky_folded(y, factor=f, count=n_vox, mask=mA)
        y = conv3d_folded(y, w3, factor=f, preferred_dtype=DT)
        mC = odd_edge_mask(Zf + 1, f * C, jnp.float32)[None, None, None]
        y = instance_norm_folded(y, factor=f, count=n_vox, mask=mC)
        xs = leaky_relu(y + shift_a2s(x))
        # block B: shifted in -> aligned out
        y = conv3d_folded(xs, w1, factor=f, preferred_dtype=DT)
        mP = odd_edge_mask(Zf + 1, f * P, jnp.float32)[None, None, None]
        y = instance_norm_leaky_folded(y, factor=f, count=n_vox, mask=mP)
        y = conv_fold(y, wk, [(1, 1), (1, 1), (0, 0)]).astype(DT)  # s2a
        y = instance_norm_leaky_folded(y, factor=f)
        y = conv3d_folded(y, w3, factor=f, preferred_dtype=DT)
        y = instance_norm_folded(y, factor=f)
        return leaky_relu(y + shift_s2a(xs))

    # correctness: shifted pair == aligned pair == plain unfolded pair
    xu = unfold_z(x, f)
    ref = None
    from hybrid_ctunet_tpu.ops.conv import conv3d_same
    from hybrid_ctunet_tpu.ops.norm import instance_norm, instance_norm_leaky

    def plain_block(t):
        y = conv3d_same(t, w1, 1, preferred_dtype=DT)
        y = instance_norm_leaky(y)
        y = conv3d_same(y, w2, 1, preferred_dtype=DT)
        y = instance_norm_leaky(y)
        y = conv3d_same(y, w3, 1, preferred_dtype=DT)
        y = instance_norm(y)
        return leaky_relu(y + t)

    ref = jax.jit(lambda t: plain_block(plain_block(t)))(xu)
    got_a = unfold_z(jax.jit(aligned_pair)(x), f)
    got_s = unfold_z(jax.jit(shifted_pair)(x), f)
    for nm, got in (("aligned", got_a), ("shifted", got_s)):
        d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        r = d / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        print(f"pair equivalence {nm}: maxabs={d:.3e} rel={r:.3e}")

    ta = timeit(aligned_pair, x)
    ts = timeit(shifted_pair, x)
    print(f"bottleneck PAIR aligned-f4: {ta:7.3f} ms   shifted-f4: {ts:7.3f} ms "
          f"({ta / ts:.2f}x)")


if __name__ == "__main__" and "pair" in sys.argv:
    pair_chain_probe()
