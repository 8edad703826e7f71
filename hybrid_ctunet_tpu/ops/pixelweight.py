"""Binary cross-weight ("pixelweight") fusion — functional op with a fused
Pallas TPU kernel.

Reference semantics (hybrid_CTUNet.py:622-669): two same-shape streams x1,x2;
LayerNorm each; per-stream QKV projections (no bias); per token and head the
scalar cross-dots <q2,k1>, <q1,k2> scaled by dim_head^-0.5; softmax over the
TWO weights; output = w1*v1 + w2*v2 -> linear out projection. O(N*d) — the
arithmetic is four matmuls plus a pure-VPU elementwise chain, so the op is
HBM-bandwidth-bound; the Pallas kernel runs the whole chain in one pass over
VMEM tiles instead of XLA's separate LN/QKV/softmax/out kernels.

Head-sum trick: the per-head reductions (sum over each head's dim_head
channels) and the head->channel broadcast of the weights are expressed as
matmuls with a (C, H) 0/1 segment matrix, so they ride the MXU with fully
aligned (TILE_N, C) tiles instead of misaligned (.., H, dim_head) reshapes.

Backward: custom VJP whose backward is the XLA autodiff of the reference
composition (bit-identical math), so training works unchanged while the
inference path (the sliding-window benchmark) gets the fused kernel.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU backend only; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


class PixelweightParams(NamedTuple):
    ln1_scale: jax.Array  # (C,)
    ln1_bias: jax.Array
    ln2_scale: jax.Array
    ln2_bias: jax.Array
    qkv1_kernel: jax.Array  # (C, 3C)
    qkv2_kernel: jax.Array
    out_kernel: jax.Array  # (C, C)


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32) + b.astype(jnp.float32)


def pixelweight_reference(x1, x2, p: PixelweightParams, *, dim_head: int = 32,
                          dtype=jnp.float32, attn_dropout=None, out_dropout=None):
    """Pure-XLA composition (ground truth; also the VJP source).

    ``attn_dropout``/``out_dropout``: optional callables applied at the
    reference's dropout sites — on the (…, heads, 2) softmaxed cross-weights
    (hybrid_CTUNet.py:635-638, before the per-head repeat) and on the output
    projection (:640-642). Training-only; None (the default) is identity.
    """
    shape = x1.shape
    C = shape[-1]
    heads = C // dim_head
    scale = dim_head ** -0.5

    h1 = _ln(x1, p.ln1_scale, p.ln1_bias).astype(dtype)
    h2 = _ln(x2, p.ln2_scale, p.ln2_bias).astype(dtype)
    qkv1 = jnp.dot(h1, p.qkv1_kernel.astype(dtype), preferred_element_type=jnp.float32)
    qkv2 = jnp.dot(h2, p.qkv2_kernel.astype(dtype), preferred_element_type=jnp.float32)
    q1, k1, v1 = jnp.split(qkv1.astype(dtype), 3, axis=-1)
    q2, k2, v2 = jnp.split(qkv2.astype(dtype), 3, axis=-1)

    def hsplit(t):
        return t.reshape(*shape[:-1], heads, dim_head)

    q1, k1, v1, q2, k2, v2 = map(hsplit, (q1, k1, v1, q2, k2, v2))
    d1 = jnp.sum((q2 * k1).astype(jnp.float32), axis=-1) * scale
    d2 = jnp.sum((q1 * k2).astype(jnp.float32), axis=-1) * scale
    m = jnp.maximum(d1, d2)
    e1 = jnp.exp(d1 - m)
    e2 = jnp.exp(d2 - m)
    w = jnp.stack([e1, e2], axis=-1) / (e1 + e2)[..., None]  # (…, heads, 2)
    if attn_dropout is not None:
        w = attn_dropout(w.astype(dtype))
    w1 = w[..., 0].astype(dtype)[..., None]
    w2 = w[..., 1].astype(dtype)[..., None]
    out = (w1 * v1 + w2 * v2).reshape(*shape[:-1], C)
    out = jnp.dot(out, p.out_kernel.astype(dtype),
                  preferred_element_type=jnp.float32).astype(dtype)
    if out_dropout is not None:
        out = out_dropout(out)
    return out


def _kernel(x1_ref, x2_ref, ln1w_ref, ln1b_ref, ln2w_ref, ln2b_ref,
            wqkv1_ref, wqkv2_ref, wout_ref, seg_ref, o_ref, *, C, heads, dim_head):
    scale = dim_head ** -0.5
    eps = 1e-5

    def ln(x_ref, w_ref, b_ref):
        x = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * w_ref[:] + b_ref[:]

    h1 = ln(x1_ref, ln1w_ref, ln1b_ref)
    h2 = ln(x2_ref, ln2w_ref, ln2b_ref)
    qkv1 = jnp.dot(h1, wqkv1_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    qkv2 = jnp.dot(h2, wqkv2_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    q1, k1, v1 = qkv1[:, :C], qkv1[:, C:2 * C], qkv1[:, 2 * C:]
    q2, k2, v2 = qkv2[:, :C], qkv2[:, C:2 * C], qkv2[:, 2 * C:]

    seg = seg_ref[:].astype(jnp.float32)  # (C, H) one-hot head membership
    d1 = jnp.dot(q2 * k1, seg, preferred_element_type=jnp.float32) * scale  # (T, H)
    d2 = jnp.dot(q1 * k2, seg, preferred_element_type=jnp.float32) * scale
    m = jnp.maximum(d1, d2)
    e1 = jnp.exp(d1 - m)
    e2 = jnp.exp(d2 - m)
    w1h = e1 / (e1 + e2)  # (T, H)
    w1 = jnp.dot(w1h, seg.T, preferred_element_type=jnp.float32)  # (T, C)
    out = w1 * v1 + (1.0 - w1) * v2
    o_ref[:] = jnp.dot(out, wout_ref[:].astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pixelweight_pallas(x1, x2, p: PixelweightParams, *, dim_head: int = 32,
                       tile_n: int | None = None, interpret: bool = False,
                       dtype=jnp.float32):
    """Fused kernel over (N, C)-flattened tokens; pads N to a tile multiple.

    Default tile picked so ~11 fp32 (tile, C) live buffers + the weight
    blocks stay well under the 16 MB VMEM budget."""
    shape = x1.shape
    C = shape[-1]
    if tile_n is None:
        tile_n = 512 if C <= 256 else 256
    heads = C // dim_head
    n = int(np.prod(shape[:-1]))
    x1f = x1.reshape(n, C)
    x2f = x2.reshape(n, C)
    n_pad = -n % tile_n
    if n_pad:
        x1f = jnp.pad(x1f, ((0, n_pad), (0, 0)))
        x2f = jnp.pad(x2f, ((0, n_pad), (0, 0)))
    n_tot = n + n_pad

    seg = np.zeros((C, heads), np.float32)
    for h in range(heads):
        seg[h * dim_head:(h + 1) * dim_head, h] = 1.0

    row_spec = pl.BlockSpec((tile_n, C), lambda i: (i, 0))
    rep = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s))

    out = pl.pallas_call(
        functools.partial(_kernel, C=C, heads=heads, dim_head=dim_head),
        out_shape=jax.ShapeDtypeStruct((n_tot, C), dtype),
        grid=(n_tot // tile_n,),
        in_specs=[
            row_spec, row_spec,
            rep((C,)), rep((C,)), rep((C,)), rep((C,)),
            rep((C, 3 * C)), rep((C, 3 * C)), rep((C, C)), rep((C, heads)),
        ],
        out_specs=row_spec,
        interpret=interpret,
    )(
        x1f, x2f,
        p.ln1_scale.astype(jnp.float32), p.ln1_bias.astype(jnp.float32),
        p.ln2_scale.astype(jnp.float32), p.ln2_bias.astype(jnp.float32),
        p.qkv1_kernel.astype(dtype), p.qkv2_kernel.astype(dtype),
        p.out_kernel.astype(dtype), jnp.asarray(seg),
    )
    return out[:n].reshape(shape).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _pixelweight_fused(x1, x2, p, dim_head, dtype, interpret):
    return pixelweight_pallas(x1, x2, p, dim_head=dim_head, dtype=dtype,
                              interpret=interpret)


def _fwd(x1, x2, p, dim_head, dtype, interpret):
    out = pixelweight_pallas(x1, x2, p, dim_head=dim_head, dtype=dtype, interpret=interpret)
    return out, (x1, x2, p)


def _bwd(dim_head, dtype, interpret, res, g):
    x1, x2, p = res
    _, vjp = jax.vjp(
        lambda a, b, q: pixelweight_reference(a, b, q, dim_head=dim_head, dtype=dtype),
        x1, x2, p,
    )
    return vjp(g)


_pixelweight_fused.defvjp(_fwd, _bwd)


def pixelweight_attention(x1, x2, p: PixelweightParams, *, dim_head: int = 32,
                          dtype=jnp.float32, use_pallas: str | bool = "auto"):
    """Dispatch: fused Pallas on TPU (interpret-mode under tests), XLA
    composition elsewhere."""
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas or pl is None:
        return pixelweight_reference(x1, x2, p, dim_head=dim_head, dtype=dtype)
    interpret = jax.default_backend() != "tpu"
    return _pixelweight_fused(x1, x2, p, dim_head, dtype, interpret)
