"""Decisive A/B: whole-stage z-folded bottleneck chain vs native.

Runs N stride-1 stage-1 bottlenecks (cin=cout=128, planes=32) on
(8,48,48,96) input either natively or entirely in the z-folded layout
(fold once -> all convs/INs on 2x channels -> unfold once). Plain fold
alignment: the 3^3 conv becomes kz=3 over folds with 6 of 12 live blocks
(2x MACs) but zero relayout per conv; 1x1 convs become block-diagonal
(2x MACs) at 2x lane width.
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()

ITERS = 10
NBLOCKS = 8
LEAK = 0.01


def _dn(xs, ws):
    return lax.conv_dimension_numbers(xs, ws, ("NDHWC", "DHWIO", "NDHWC"))


def conv(x, w, pad):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), pad, dimension_numbers=_dn(x.shape, w.shape),
        preferred_element_type=jnp.float32)


def in_leaky(y, leak=LEAK):
    m = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
    v = jnp.mean(jnp.square(y), axis=(1, 2, 3), keepdims=True) - jnp.square(m)
    y = (y - m) * jax.lax.rsqrt(v + 1e-5)
    return jnp.where(y >= 0, y, leak * y)


def in_folded_leaky(y, leak=LEAK):
    # y: (..., 2C); stats per original channel combine the two slot copies
    C2 = y.shape[-1]
    C = C2 // 2
    s1 = jnp.sum(y, axis=(1, 2, 3))            # (B, 2C)
    s2 = jnp.sum(jnp.square(y), axis=(1, 2, 3))
    n = 2 * y.shape[1] * y.shape[2] * y.shape[3]
    m = (s1[:, :C] + s1[:, C:]) / n
    v = (s2[:, :C] + s2[:, C:]) / n - jnp.square(m)
    m2 = jnp.tile(m, 2)[:, None, None, None, :]
    r2 = jnp.tile(jax.lax.rsqrt(v + 1e-5), 2)[:, None, None, None, :]
    y = (y - m2) * r2
    return jnp.where(y >= 0, y, leak * y)


def fold_w1x1(w):
    C, F = w.shape
    wf = jnp.zeros((1, 1, 1, 2 * C, 2 * F), w.dtype)
    wf = wf.at[0, 0, 0, :C, :F].set(w)
    wf = wf.at[0, 0, 0, C:, F:].set(w)
    return wf


def fold_w3(w):
    # w: (3,3,3,C,C) -> (3,3,3,2C,2C) plain-alignment folded taps
    C = w.shape[3]
    F = w.shape[4]
    wk = jnp.zeros((3, 3, 3, 2 * C, 2 * F), w.dtype)
    wk = wk.at[:, :, 0, C:, :F].set(w[:, :, 0])
    wk = wk.at[:, :, 1, :C, :F].set(w[:, :, 1])
    wk = wk.at[:, :, 1, C:, :F].set(w[:, :, 2])
    wk = wk.at[:, :, 1, :C, F:].set(w[:, :, 0])
    wk = wk.at[:, :, 1, C:, F:].set(w[:, :, 1])
    wk = wk.at[:, :, 2, :C, F:].set(w[:, :, 2])
    return wk


def make_ws(key, cin, planes):
    ks = jax.random.split(key, 3)
    cout = planes * 4
    w1 = jax.random.normal(ks[0], (cin, planes), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(ks[1], (3, 3, 3, planes, planes), jnp.bfloat16) * 0.05
    w3 = jax.random.normal(ks[2], (planes, cout), jnp.bfloat16) * 0.05
    return w1, w2, w3


def block_native(x, ws):
    w1, w2, w3 = ws
    y = conv(x, w1[None, None, None], "VALID").astype(x.dtype)
    y = in_leaky(y).astype(x.dtype)
    y = conv(y, w2, [(1, 1)] * 3).astype(x.dtype)
    y = in_leaky(y).astype(x.dtype)
    y = conv(y, w3[None, None, None], "VALID").astype(x.dtype)
    y = in_leaky(y).astype(x.dtype)  # stand-in for IN + add + relu
    return y + x


def block_folded(x, ws):
    w1, w2, w3 = ws
    y = conv(x, fold_w1x1(w1), "VALID").astype(x.dtype)
    y = in_folded_leaky(y).astype(x.dtype)
    y = conv(y, fold_w3(w2), [(1, 1), (1, 1), (1, 1)]).astype(x.dtype)
    y = in_folded_leaky(y).astype(x.dtype)
    y = conv(y, fold_w1x1(w3), "VALID").astype(x.dtype)
    y = in_folded_leaky(y).astype(x.dtype)
    return y + x


def chain(blocks_fn, fold: bool):
    @jax.jit
    def step(c, x, ws):
        y = x + c.astype(x.dtype)
        if fold:
            B, X, Y, Z, C = y.shape
            y = y.reshape(B, X, Y, Z // 2, 2 * C)
        for w in ws:
            y = blocks_fn(y, w)
        if fold:
            B, X, Y, Zf, C2 = y.shape
            y = y.reshape(B, X, Y, Zf * 2, C2 // 2)
        return jnp.sum(y.astype(jnp.float32)) * 0.0

    return step


def timeit(step, x, ws):
    c = jnp.float32(0)
    float(step(c, x, ws))
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(ITERS):
        c = step(c, x, ws)
    float(c)
    return (time.time() - t0) / ITERS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 48, 48, 96, 128), jnp.bfloat16)
    ws = [make_ws(jax.random.fold_in(key, i), 128, 32) for i in range(NBLOCKS)]

    ms_n = timeit(chain(block_native, False), x, ws)
    ms_f = timeit(chain(block_folded, True), x, ws)
    print(f"native {NBLOCKS}-chain:  {ms_n:7.2f} ms", flush=True)
    print(f"folded {NBLOCKS}-chain:  {ms_f:7.2f} ms", flush=True)

    # numerics sanity: folded == native (taps rearranged exactly)
    y_n = block_native(x[:1, :8, :8, :16].astype(jnp.float32),
                       [jnp.asarray(w, jnp.float32) for w in ws[0]])
    xf = x[:1, :8, :8, :16].astype(jnp.float32)
    B, X, Y, Z, C = xf.shape
    y_f = block_folded(xf.reshape(B, X, Y, Z // 2, 2 * C),
                       [jnp.asarray(w, jnp.float32) for w in ws[0]])
    y_f = y_f.reshape(B, X, Y, Z, C)
    import numpy as np
    d = np.abs(np.asarray(y_n) - np.asarray(y_f)).max()
    print(f"max |native - folded| on fp32 mini shape: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
