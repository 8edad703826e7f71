"""Fused windowed multi-head attention (Pallas TPU kernel).

The decoder pyramid's block/grid window attention (reference
MultiAxisAttention, hybrid_CTUNet.py:442-511) attends within 6^3 = 216-token
windows. In XLA the fp32 score tensor (windows x heads x 216 x 216) is
materialised in HBM — at stage 2 (sw8: 1024 windows x 8 heads) that is
~1.5 GB written and re-read around the softmax, ~23 ms per call at ~7 TF/s
effective (v5e, measured). This kernel computes scores + bias + softmax +
value-weighting entirely in VMEM, one window batch per grid step.

Scope: the QKV and output projections stay in XLA (clean full-width matmuls);
the kernel consumes pre-scaled q and k, v in windowed layout. The relative-
position bias is pre-gathered to (heads, T, T) fp32 outside (tiny) and held
resident in VMEM.

Numerics mirror the unfused path: fp32 score accumulation, fp32 bias add and
softmax, attention weights cast to the compute dtype before the fp32-
accumulated value matmul (models/layers.py MultiAxisWindowAttention).
Backward recomputes through the reference implementation (custom VJP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def reference_window_attention(q, k, v, bias, dtype):
    """Unfused oracle: q,k,v (N, T, heads*dh) with q pre-scaled;
    bias (heads, T, T) fp32."""
    n, t, c = q.shape
    heads = bias.shape[0]
    dh = c // heads

    def split(x):
        return x.reshape(n, t, heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    sim = jnp.einsum("bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32)
    sim = sim + bias[None]
    attn = jax.nn.softmax(sim, axis=-1).astype(dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vh, preferred_element_type=jnp.float32)
    return out.astype(dtype).transpose(0, 2, 1, 3).reshape(n, t, c)


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, heads, dh, dtype):
    tb = q_ref.shape[0]
    for i in range(tb):
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = q_ref[i, :, sl]
            kh = k_ref[i, :, sl]
            vh = v_ref[i, :, sl]
            sim = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            sim = sim + bias_ref[h]
            m = jnp.max(sim, axis=-1, keepdims=True)
            e = jnp.exp(sim - m)
            attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            out_ref[i, :, sl] = jnp.dot(
                attn, vh, preferred_element_type=jnp.float32
            ).astype(dtype)


def _impl(q, k, v, bias, dtype, interpret):
    n, t, c = q.shape
    heads = bias.shape[0]
    dh = c // heads
    from .. import flags
    tb = flags.ATTN_TB
    n_pad = -(-n // tb) * tb
    pad = lambda x: jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, dh=dh, dtype=dtype),
        grid=(n_pad // tb,),
        in_specs=[
            pl.BlockSpec((tb, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((heads, t, t), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, t, c), dtype),
        interpret=interpret,
    )(pad(q), pad(k), pad(v), bias)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused(q, k, v, bias, dtype, interpret):
    return _impl(q, k, v, bias, dtype, interpret)


def _fwd(q, k, v, bias, dtype, interpret):
    return _fused(q, k, v, bias, dtype, interpret), (q, k, v, bias)


def _bwd(dtype, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: reference_window_attention(*a, dtype), *res)
    return vjp(g)


_fused.defvjp(_fwd, _bwd)


def supports(n_windows: int, t: int, c: int, heads: int, dtype) -> bool:
    return (
        dtype == jnp.bfloat16
        and c % heads == 0
        and (c // heads) % 8 == 0
        and n_windows >= 64
        and heads * t * t * 4 <= 4 * 1024 * 1024  # resident bias
        and t <= 512
    )


def fused_window_attention(q, k, v, bias, *, dtype, interpret=False):
    """q (pre-scaled), k, v: (n_windows, T, heads*dh); bias: (heads, T, T)
    fp32. Returns (n_windows, T, heads*dh) in ``dtype``."""
    return _fused(q, k, v, bias, dtype, interpret)
