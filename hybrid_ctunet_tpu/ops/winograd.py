"""Winograd F(2,3)^3 transforms for stride-1 SAME 3x3x3 convolutions.

Reference math (Lavin & Gray, "Fast Algorithms for Convolutional Neural
Networks"): per 4^3 input tile d and 3^3 filter g,

    Y = A^T [ (G g G^T) .* (B^T d B) ] A        (per axis, tensor-product in 3D)

with
    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G   = [[1,0,0],[1/2,1/2,1/2],[1/2,-1/2,1/2],[0,0,1]]
    A^T = [[1,1,1,0],[0,1,-1,-1]]

yielding 2^3 outputs per tile from 4^3 = 64 elementwise products — with
channels, 64 batched (tiles, Cin) x (Cin, Cout) matmuls instead of 27:
a 3.375x multiply reduction. The transform matrices are exact in binary
floating point (entries 0, ±1, ±1/2), so the only numerical difference vs
direct convolution is fp32 summation order.

This module holds the filter transform and a pure-XLA tile-level reference
(the test oracle and CPU fallback); the TPU kernel lives in
``winograd_pallas.py``.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BT = np.array(
    [[1, 0, -1, 0],
     [0, 1, 1, 0],
     [0, -1, 1, 0],
     [0, 1, 0, -1]], np.float32)
G = np.array(
    [[1, 0, 0],
     [0.5, 0.5, 0.5],
     [0.5, -0.5, 0.5],
     [0, 0, 1]], np.float32)
AT = np.array(
    [[1, 1, 1, 0],
     [0, 1, -1, -1]], np.float32)


def transform_filter(w: jax.Array) -> jax.Array:
    """w: (3,3,3,Cin,Cout) -> U: (4,4,4,Cin,Cout), fp32 exact."""
    g = jnp.asarray(G)
    u = jnp.einsum("ai,ijkcf->ajkcf", g, w.astype(jnp.float32))
    u = jnp.einsum("bj,ajkcf->abkcf", g, u)
    return jnp.einsum("zk,abkcf->abzcf", g, u)


def transform_input_tiles(d: jax.Array) -> jax.Array:
    """d: (..., 4, 4, 4, C) input tiles -> V: (..., 4, 4, 4, C)."""
    bt = jnp.asarray(BT, d.dtype)
    v = jnp.einsum("ai,...ijkc->...ajkc", bt, d)
    v = jnp.einsum("bj,...ajkc->...abkc", bt, v)
    return jnp.einsum("zk,...abkc->...abzc", bt, v)


def inverse_transform(m: jax.Array) -> jax.Array:
    """m: (..., 4, 4, 4, F) elementwise-product accumulators ->
    y: (..., 2, 2, 2, F)."""
    at = jnp.asarray(AT, m.dtype)
    y = jnp.einsum("ai,...ijkf->...ajkf", at, m)
    y = jnp.einsum("bj,...ajkf->...abkf", at, y)
    return jnp.einsum("zk,...abkf->...abzf", at, y)


def conv3x3_winograd_reference(x: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-1 SAME 3^3 conv via F(2,3)^3, pure XLA (test oracle / CPU).
    x: (B, X, Y, Z, Cin) with X, Y, Z even; w: (3,3,3,Cin,Cout); fp32 path."""
    B, X, Y, Z, C = x.shape
    F = w.shape[4]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
    tx, ty, tz = X // 2, Y // 2, Z // 2
    # gather overlapping 4^3 tiles (stride 2): free reshape into pairs plus a
    # neighbor concat per axis
    def tiles_axis(a, axis, n):
        # a[..., 2m : 2m+4, ...] for m in range(n) along `axis`
        idx = (np.arange(n) * 2)[:, None] + np.arange(4)[None]
        return jnp.take(a, jnp.asarray(idx.reshape(-1)), axis=axis).reshape(
            a.shape[:axis] + (n, 4) + a.shape[axis + 1:]
        )

    t = tiles_axis(xp, 1, tx)      # (B, tx, 4, Y+2, Z+2, C)
    t = tiles_axis(t, 3, ty)       # (B, tx, 4, ty, 4, Z+2, C)
    t = tiles_axis(t, 5, tz)       # (B, tx, 4, ty, 4, tz, 4, C)
    t = t.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (B, tx, ty, tz, 4, 4, 4, C)

    v = transform_input_tiles(t)                       # (B,tx,ty,tz,4,4,4,C)
    u = transform_filter(w)                            # (4,4,4,C,F)
    m = jnp.einsum("ntuvabzc,abzcf->ntuvabzf", v, u)   # 64 batched matmuls
    y = inverse_transform(m)                           # (B,tx,ty,tz,2,2,2,F)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, X, Y, Z, F)
    return y
