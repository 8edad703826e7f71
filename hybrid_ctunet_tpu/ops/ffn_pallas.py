"""Fused transformer FeedForward (LN -> fc1 -> GELU -> fc2) Pallas TPU kernel.

The decoder pyramid's FFNs (reference FeedForward, hybrid_CTUNet.py:513-526)
are bandwidth-bound in XLA: the 4x-wide hidden activation round-trips HBM
between the two matmuls (stage-3 pair at 48x48x96x128 x sw8 moves ~7 GB ->
39 ms/chunk at ~24 TF/s measured on v5e). This kernel tiles the row dimension
and keeps the hidden tile in VMEM — per-call traffic drops to read-x + write-
out, and the matmuls run back-to-back on the MXU.

Numerics mirror the unfused path op-for-op (models/layers.py LayerNorm /
Dense / gelu_exact): fp32 LN (eps 1e-5), bf16 matmul operands with fp32
accumulation cast back to the compute dtype, bias added in compute dtype,
exact (erf) GELU. Differences are confined to fp32 accumulation order inside
the matmul tiles (sub-ulp at bf16).

Backward: custom VJP that recomputes through the reference XLA implementation
— training numerics and memory behavior are exactly the unfused path's.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5


def reference_ffn(x, ln_w, ln_b, w1, b1, w2, b2, dtype):
    """The unfused op sequence (models/layers.py FeedForward), functional."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = (y * ln_w.astype(jnp.float32) + ln_b.astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(y.astype(dtype), w1.astype(dtype), preferred_element_type=jnp.float32)
    h = h.astype(dtype) + b1.astype(dtype)
    h = jax.nn.gelu(h, approximate=False)
    o = jnp.dot(h.astype(dtype), w2.astype(dtype), preferred_element_type=jnp.float32)
    return o.astype(dtype) + b2.astype(dtype)


def _erf32(x):
    """fp32 erf. Mosaic has no erf/erfc primitive; two polynomial routes:

    - "as26" (default-off): Abramowitz-Stegun 7.1.26, max abs err 1.5e-7 —
      needs one exp (multi-instruction on the VPU).
    - "r16": A&S 7.1.28 rational form erf(x) = 1 - (1 + a1 x + .. a6 x^6)^-16,
      max abs err 3e-7 — no exp: 6 fma + 4 squarings + 1 reciprocal.

    Both are an order below bf16 resolution at the op boundary."""
    from .. import flags

    s = jnp.sign(x)
    a = jnp.abs(x)
    if flags.FFN_ERF == "r16":
        p = 1.0 + a * (
            0.0705230784
            + a * (0.0422820123 + a * (0.0092705272 + a * (
                0.0001520143 + a * (0.0002765672 + a * 0.0000430638))))
        )
        q = p * p
        q = q * q
        q = q * q
        q = q * q  # p^16
        return s * (1.0 - 1.0 / q)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _h_chunk() -> int:
    # hidden-dim streaming chunk: bounds fp32 GELU temps to (tn, chunk)
    # regardless of the hidden width, so the row tile can grow
    from .. import flags

    return flags.FFN_HK


def _kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
            dtype, residual):
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = (y * lnw_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)).astype(dtype)
    hidden = w1_ref.shape[1]
    ck = min(_h_chunk(), hidden)
    acc = None
    for j in range(0, hidden, ck):  # static unroll; split-K accumulation
        h = jnp.dot(
            y, w1_ref[:, j : j + ck].astype(dtype), preferred_element_type=jnp.float32
        )
        h = h.astype(dtype) + b1_ref[0, j : j + ck].astype(dtype)
        # exact GELU via erf; fp32 internals, re-rounded to the compute dtype
        # at the op boundary like XLA's
        hf = h.astype(jnp.float32)
        h = (0.5 * hf * (1.0 + _erf32(hf * 0.7071067811865476))).astype(dtype)
        p = jnp.dot(
            h, w2_ref[j : j + ck, :].astype(dtype), preferred_element_type=jnp.float32
        )
        acc = p if acc is None else acc + p
    out = acc.astype(dtype) + b2_ref[0].astype(dtype)
    if residual:
        # the callers' `x + FFN(x)` residual rides the kernel's output write
        # instead of a separate full-tensor elementwise pass around the
        # opaque pallas_call (bf16 add, same as the XLA residual add)
        out = out + x_ref[:]
    out_ref[:] = out


def _ffn_math(x_dt, lnw, lnb, w1, b1, w2, b2, *, dtype):
    """One LN -> fc1 -> GELU -> fc2 pass on an in-register row tile.

    Identical op sequence/precision to ``_kernel`` (fp32 LN, bf16 matmul
    operands with fp32 accumulation, bias in compute dtype, erf GELU with
    fp32 internals), factored out so the pair kernel can run it twice."""
    xf = x_dt.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = (y * lnw[0].astype(jnp.float32) + lnb[0].astype(jnp.float32)).astype(dtype)
    hidden = w1.shape[1]
    ck = min(_h_chunk(), hidden)
    acc = None
    for j in range(0, hidden, ck):
        h = jnp.dot(y, w1[:, j : j + ck].astype(dtype), preferred_element_type=jnp.float32)
        h = h.astype(dtype) + b1[0, j : j + ck].astype(dtype)
        hf = h.astype(jnp.float32)
        h = (0.5 * hf * (1.0 + _erf32(hf * 0.7071067811865476))).astype(dtype)
        p = jnp.dot(h, w2[j : j + ck, :].astype(dtype), preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    return acc.astype(dtype) + b2[0].astype(dtype)


def _pair_kernel(x_ref, lnw1, lnb1, w11, b11, w12, b12,
                 lnw2, lnb2, w21, b21, w22, b22, out_ref, *, dtype):
    """Two back-to-back residual FFNs on one row tile:
    ``z = y + FFN2(y)`` where ``y = x + FFN1(x)``. The intermediate ``y``
    (a full-tensor HBM write + read + two separate residual passes in the
    unfused pipeline) never leaves VMEM. Residual adds are bf16, matching
    the callers' ``x + FFN(x)``."""
    x = x_ref[:]
    y = x + _ffn_math(x, lnw1, lnb1, w11[:], b11, w12[:], b12, dtype=dtype)
    out_ref[:] = y + _ffn_math(y, lnw2, lnb2, w21[:], b21, w22[:], b22, dtype=dtype)


def _fused_ffn_pair_impl(x2d, p1, p2, dtype, interpret):
    n, c = x2d.shape
    h = p1[2].shape[1]
    tn = _row_tile(c, h)
    n_pad = -(-n // tn) * tn
    xp = jnp.pad(x2d, ((0, n_pad - n), (0, 0)))
    vec = lambda v: v.reshape(1, -1)
    prep = lambda p: [p[2] if i == 2 else p[4] if i == 4 else vec(p[i]) for i in range(6)]
    param_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    specs = [
        param_spec((1, c)), param_spec((1, c)), param_spec((c, h)),
        param_spec((1, h)), param_spec((h, c)), param_spec((1, c)),
    ]
    out = pl.pallas_call(
        functools.partial(_pair_kernel, dtype=dtype),
        grid=(n_pad // tn,),
        in_specs=[pl.BlockSpec((tn, c), lambda i: (i, 0)), *specs, *specs],
        out_specs=pl.BlockSpec((tn, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), dtype),
        interpret=interpret,
    )(xp, *prep(p1), *prep(p2))
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def _fused_ffn_pair(x2d, lnw1, lnb1, w11, b11, w12, b12,
                    lnw2, lnb2, w21, b21, w22, b22, dtype, interpret):
    return _fused_ffn_pair_impl(
        x2d, (lnw1, lnb1, w11, b11, w12, b12),
        (lnw2, lnb2, w21, b21, w22, b22), dtype, interpret)


def _pair_fwd(x2d, lnw1, lnb1, w11, b11, w12, b12,
              lnw2, lnb2, w21, b21, w22, b22, dtype, interpret):
    args = (x2d, lnw1, lnb1, w11, b11, w12, b12, lnw2, lnb2, w21, b21, w22, b22)
    return _fused_ffn_pair(*args, dtype, interpret), args


def _pair_bwd(dtype, interpret, res, g):
    # recompute through the reference path: training numerics unchanged
    def ref(x, lnw1, lnb1, w11, b11, w12, b12, lnw2, lnb2, w21, b21, w22, b22):
        y = x + reference_ffn(x, lnw1, lnb1, w11, b11, w12, b12, dtype)
        return y + reference_ffn(y, lnw2, lnb2, w21, b21, w22, b22, dtype)

    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


_fused_ffn_pair.defvjp(_pair_fwd, _pair_bwd)


def fused_ffn_pair(x, params1, params2, *, dtype, interpret=False):
    """``x -> x2`` where ``x1 = x + FFN1(x)`` and ``x2 = x1 + FFN2(x1)``
    in one kernel (the decoder pyramid's stage-3 FFN pair,
    reference hybrid_CTUNet.py:573-576). ``params1``/``params2`` are
    ``(ln_w, ln_b, w1, b1, w2, b2)`` as stored by FeedForward."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out = _fused_ffn_pair(x2d, *params1, *params2, dtype, interpret)
    return out.reshape(shape)


def _row_tile(c: int, h: int) -> int:
    # hidden is streamed in _H_CHUNK slices, so the row tile is bounded by
    # the x/out blocks and the (tn, _H_CHUNK) fp32 GELU temps
    from .. import flags

    if flags.FFN_TN:
        return int(flags.FFN_TN)
    # tn=2048 still crashes the remote compiler at c=128 even with hidden
    # streaming; 1024 measures identical to larger tiles where they compile
    return 1024


def _fused_ffn_impl(x2d, ln_w, ln_b, w1, b1, w2, b2, dtype, interpret, residual):
    n, c = x2d.shape
    h = w1.shape[1]
    tn = _row_tile(c, h)
    n_pad = -(-n // tn) * tn
    xp = jnp.pad(x2d, ((0, n_pad - n), (0, 0)))
    vec = lambda v: v.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_kernel, dtype=dtype, residual=residual),
        grid=(n_pad // tn,),
        in_specs=[
            pl.BlockSpec((tn, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((h, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tn, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), dtype),
        interpret=interpret,
    )(xp, vec(ln_w), vec(ln_b), w1, vec(b1), w2, vec(b2))
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_ffn(x2d, ln_w, ln_b, w1, b1, w2, b2, dtype, interpret, residual):
    return _fused_ffn_impl(x2d, ln_w, ln_b, w1, b1, w2, b2, dtype, interpret, residual)


def _fwd(x2d, ln_w, ln_b, w1, b1, w2, b2, dtype, interpret, residual):
    return _fused_ffn(x2d, ln_w, ln_b, w1, b1, w2, b2, dtype, interpret, residual), (
        x2d, ln_w, ln_b, w1, b1, w2, b2,
    )


def _bwd(dtype, interpret, residual, res, g):
    # recompute through the reference path: training numerics unchanged
    def ref(*a):
        out = reference_ffn(*a, dtype)
        return a[0] + out if residual else out

    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


_fused_ffn.defvjp(_fwd, _bwd)


def supports(n_rows: int, c: int, hidden: int, dtype) -> bool:
    """Fast path applies to the decoder-pyramid scale: bf16, aligned dims,
    weights + one fp32 hidden tile comfortably in VMEM, and enough rows to
    amortize the weight residency."""
    from .. import flags

    if dtype != jnp.bfloat16 or c % 128 or hidden % 128:
        return False
    if flags.PALLAS_FFN_BIG == "1" and hidden > 1024:
        # ViT-scale FFN (c=768, hidden=3072, 3456 token rows at sw=8):
        # round-5 experiment — the XLA dot fusion runs these at ~117 TF/s
        # (tools/profile_vit.py) vs 171 for the neighboring projections.
        # Both bf16 weights must be VMEM-resident: cap at ~12 MB.
        return n_rows >= 2048 and 2 * 2 * c * hidden <= 12_000_000
    # c=512 (stage-1) measures at parity with XLA — the win is the big
    # spatial stages where the hidden tensor dwarfs VMEM-able tiles
    return hidden <= 1024 and n_rows >= 65536


def fused_ffn(x, ln_w, ln_b, w1, b1, w2, b2, *, dtype, interpret=False,
              residual=False):
    """x: (..., C) -> (..., C); parameters as stored by FeedForward
    (fp32 leaves; cast inside, matching models/layers.py). With
    ``residual=True`` returns ``x + FFN(x)`` with the add fused into the
    kernel's output write."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    if w1.shape[1] > 1024:
        # ViT-scale weights: pre-cast to the compute dtype OUTSIDE the kernel
        # so the VMEM-resident blocks are half-width (the kernel reads them
        # via .astype(dtype) either way — identical numerics; fp32 blocks OOM
        # the 16 MB scoped vmem at hidden=3072). LN params stay fp32 (used
        # in fp32 inside).
        w1, b1 = w1.astype(dtype), b1.astype(dtype)
        w2, b2 = w2.astype(dtype), b2.astype(dtype)
    out = _fused_ffn(x2d, ln_w, ln_b, w1, b1, w2, b2, dtype, interpret, residual)
    return out.reshape(shape)
