"""Fused InstanceNorm(+LeakyReLU) Pallas kernel.

The reference's conv paths interleave every conv with affine-free
InstanceNorm3d + LeakyReLU(0.01) (resnet.py:97, hybrid_CTUNet.py:57-105).
At 96^3 x 64ch a single IN touches ~220 MB — the op is pure HBM bandwidth.
This kernel does it in the minimum 2 passes (one streaming moments pass, one
normalize+activation pass) with fp32 accumulation over bf16 data, fused with
the activation so XLA never materializes an intermediate.

Backward runs the XLA reference composition via custom VJP (identical math).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .act import leaky_relu
from .norm import instance_norm


def reference(x, *, eps=1e-5, negative_slope=0.01, act=True):
    y = instance_norm(x, eps)
    return leaky_relu(y, negative_slope) if act else y


def _moments_kernel(x_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)  # (1, TS, C)
    out_ref[0, 0, 0, :] = jnp.sum(x, axis=(0, 1))
    out_ref[0, 0, 1, :] = jnp.sum(jnp.square(x), axis=(0, 1))


def _normalize_kernel(x_ref, mean_ref, rstd_ref, o_ref, *, negative_slope, act):
    b = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)  # (1, TS, C)
    y = (x - mean_ref[b, :][None, None, :]) * rstd_ref[b, :][None, None, :]
    if act:
        y = jnp.where(y >= 0, y, y * negative_slope)
    o_ref[:] = y.astype(o_ref.dtype)


def fused_instance_norm_pallas(x, *, eps=1e-5, negative_slope=0.01, act=True,
                               tile_s: int = 4096, interpret: bool = False):
    """x: (B, X, Y, Z, C) channels-last; per-(batch, channel) spatial norm.

    Lane packing: when C < 128, fold ``f = 128 // C`` spatial rows into the
    lane dimension — the array is viewed as (B, S/f, f*C) so every VPU lane
    is busy; per-channel stats are recovered by summing the f lane replicas.
    """
    B, X, Y, Z, C = x.shape
    S = X * Y * Z
    f = max(1, 128 // C) if C < 128 else 1
    while f > 1 and S % f:
        f //= 2
    Cf = C * f
    Sf = S // f
    xf = x.reshape(B, Sf, Cf)
    pad = -Sf % tile_s
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))  # zero rows add 0 to sums
    n_blocks = (Sf + pad) // tile_s

    partial = pl.pallas_call(
        _moments_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_blocks, 2, Cf), jnp.float32),
        grid=(B, n_blocks),
        in_specs=[pl.BlockSpec((1, tile_s, Cf), lambda b, s: (b, s, 0))],
        out_specs=pl.BlockSpec((1, 1, 2, Cf), lambda b, s: (b, s, 0, 0)),
        interpret=interpret,
    )(xf)
    sums = jnp.sum(partial, axis=1)  # (B, 2, Cf)
    sums = sums.reshape(B, 2, f, C).sum(axis=2)  # fold lane replicas -> (B, 2, C)
    mean = sums[:, 0] / S
    var = sums[:, 1] / S - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    # tile stats back out to the folded lane layout
    mean_f = jnp.tile(mean, (1, f))  # (B, Cf)
    rstd_f = jnp.tile(rstd, (1, f))

    y = pl.pallas_call(
        functools.partial(_normalize_kernel, negative_slope=negative_slope, act=act),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, tile_s, Cf), lambda b, s: (b, s, 0)),
            pl.BlockSpec((B, Cf), lambda b, s: (0, 0)),  # whole: TPU block rules
            pl.BlockSpec((B, Cf), lambda b, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_s, Cf), lambda b, s: (b, s, 0)),
        interpret=interpret,
    )(xf, mean_f, rstd_f)
    return y[:, :Sf].reshape(B, X, Y, Z, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _fused(x, eps, negative_slope, act, interpret):
    return fused_instance_norm_pallas(
        x, eps=eps, negative_slope=negative_slope, act=act, interpret=interpret
    )


def _fwd(x, eps, negative_slope, act, interpret):
    return _fused(x, eps, negative_slope, act, interpret), x


def _bwd(eps, negative_slope, act, interpret, x, g):
    _, vjp = jax.vjp(lambda a: reference(a, eps=eps, negative_slope=negative_slope, act=act), x)
    return vjp(g)


_fused.defvjp(_fwd, _bwd)


def instance_norm_act(x, *, eps=1e-5, negative_slope=0.01, act=True,
                      use_pallas: str | bool = "auto"):
    """Dispatch: fused Pallas on TPU, XLA composition elsewhere."""
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return reference(x, eps=eps, negative_slope=negative_slope, act=act)
    interpret = jax.default_backend() != "tpu"
    return _fused(x, eps, negative_slope, act, interpret)
