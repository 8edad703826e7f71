"""Fused anisotropic 3D pixel-shuffle + per-voxel Linear Pallas TPU kernel.

The decoder pyramid's PixelShuffleLinear stages (reference PixelShuffle,
hybrid_CTUNet.py:388-432) are HBM-bound in XLA and pay a layout tax: the
8-D transpose that interleaves the factor offsets into space cannot fuse
with the per-voxel Dense, so the stage-3 shuffle alone costs ~9 ms/chunk
(dot 2.7 + transpose 1.8 + bias-add materialize 4.5, device trace) moving
each tensor through HBM three times.

This kernel reads each input (Y, Z, C) plane once, runs the f0*f1 factor
dots back-to-back on the MXU (weight slices pre-scattered into zero-padded
(C, f2*F) blocks so K stays lane-aligned), and stores each result directly
at its interleaved output position. The (i, j) factor offsets land on
LEADING output dims (out viewed as (B, X, f0, Y, f1, Z*f2, F)), so stores
need no in-kernel relayout; the final regroup to (B, X*f0, Y*f1, Z*f2, F)
is a free leading-dim reshape. For f2 == 2 the z-interleave is a single
linear in-register reshape ((Y*Z, f2*F) -> (Y, Z*f2, F)).

Numerics mirror the unfused path (models/layers.py PixelShuffleLinear
default branch): bf16 dot operands with fp32 MXU accumulation rounded to
the compute dtype, bias added in compute dtype. The zero-padded K rows add
exact zeros. Backward: custom VJP through the reference XLA implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_VMEM_BUDGET = 12 * 1024 * 1024


def reference_shuffle(x, w, b, factor, dtype):
    """The unfused op sequence (models/layers.py PixelShuffleLinear)."""
    B, X, Y, Z, C = x.shape
    f0, f1, f2 = factor
    cp, F = w.shape
    h = x.reshape(B, X, Y, Z, cp, f0, f1, f2)
    h = h.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    h = h.reshape(B, X * f0, Y * f1, Z * f2, cp)
    y = jnp.dot(h.astype(dtype), w.astype(dtype))
    return y + b.astype(dtype)


def supports(shape, factor, features, dtype, zfold: bool = False) -> bool:
    B, X, Y, Z, C = shape
    f0, f1, f2 = factor
    div = f0 * f1 * f2
    if div <= 1 or C % div != 0:
        return False
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if f2 not in (1, 2):
        return False
    if zfold and (Z * f2) % 2 != 0:
        return False
    # lane/sublane alignment for the input block and the factor-dot shapes.
    # (f2*features) % 128: stores narrower than a full lane tile measured
    # SLOWER than the XLA path (stage3's F=64 f2=1: 8.9 vs 7.2 ms) — unless
    # zfold doubles the store lane width (2F=128 for the stage-3 F=64 site
    # under FOLD96_LAST, where the consumer reads the folded layout).
    lanes = f2 * features * (2 if zfold else 1)
    if C % 128 != 0 or Z % 8 != 0 or lanes % 128 != 0:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (
        Y * Z * C  # input block
        + f0 * f1 * C * f2 * features  # scattered weight
        + f0 * f1 * Y * Z * f2 * features  # output block
    ) * itemsize
    return vmem < _VMEM_BUDGET


def _scatter_weight(w, factor, dtype):
    """(cp, F) -> (f0*f1, C, f2*F): per-(i,j) zero-padded K blocks.

    Channel order matches the reference reshape (cp slowest):
    c = ((cp_i*f0 + i)*f1 + j)*f2 + k  maps to out col k*F + f.
    """
    f0, f1, f2 = factor
    cp, F = w.shape
    C = cp * f0 * f1 * f2
    wt = jnp.zeros((f0, f1, C, f2, F), dtype)
    idx = jnp.arange(cp)
    for i in range(f0):
        for j in range(f1):
            for k in range(f2):
                ch = ((idx * f0 + i) * f1 + j) * f2 + k
                wt = wt.at[i, j, ch, k, :].set(w.astype(dtype))
    return wt.reshape(f0 * f1, C, f2 * F)


def _kernel(x_ref, wt_ref, b_ref, out_ref, *, factor, features, dtype, zfold):
    f0, f1, f2 = factor
    F = features
    _, _, Y, Z, C = x_ref.shape
    x2d = x_ref[0, 0].reshape(Y * Z, C)
    for i in range(f0):
        for j in range(f1):
            y = jnp.dot(x2d, wt_ref[i * f1 + j], preferred_element_type=jnp.float32)
            y = y.astype(dtype) + b_ref[0]
            # zfold: emit the z-paired fold view (Z*f2//2, 2F) that the
            # altfold consumers read — a LINEAR (free) in-register reshape,
            # and the store lane width doubles (128 for F=64)
            shp = (Y, Z * f2 // 2, 2 * F) if zfold else (Y, Z * f2, F)
            out_ref[0, 0, i, :, j, :, :] = y.reshape(shp)


def _impl(x, w, b, factor, dtype, interpret, zfold=False, wt=None):
    B, X, Y, Z, C = x.shape
    f0, f1, f2 = factor
    F = w.shape[-1]
    if wt is None:
        wt = _scatter_weight(w, factor, dtype)
    if zfold and f2 == 1:
        # f2==1 z-pair fold: the in-kernel store regroup (Y*Z, F) ->
        # (Y, Z/2, 2F) is a sublane->lane swap Mosaic cannot express
        # ("unsupported shape cast"). Instead fold the INPUT in HBM — a
        # free contiguous reshape (B,X,Y,Z,C) -> (B,X,Y,Z/2,2C) — and run
        # the block-diagonal kron(I2, w_ij) dots: even-z lanes [0:C] map to
        # out cols [0:F], odd-z lanes [C:2C] to [F:2F] (extra weight
        # entries exact zeros). The kernel then runs the plain (zfold-off)
        # path on the widened shapes and its store reshape (Y*Zh, 2F) ->
        # (Y, Zh, 2F) splits leading dims only.
        wt2 = jnp.zeros((f0 * f1, 2 * C, 2 * F), dtype)
        wt = wt2.at[:, :C, :F].set(wt).at[:, C:, F:].set(wt)
        bt = jnp.tile(b.astype(dtype), 2).reshape(1, 2 * F)
        x = x.reshape(B, X, Y, Z // 2, 2 * C)
        Z, C, F = Z // 2, 2 * C, 2 * F
        zfold = False
    else:
        bt = jnp.tile(b.astype(dtype), f2).reshape(1, f2 * F)
    zl, fl = (Z * f2 // 2, 2 * F) if zfold else (Z * f2, F)
    out = pl.pallas_call(
        functools.partial(
            _kernel, factor=factor, features=F, dtype=dtype, zfold=zfold
        ),
        grid=(B, X),
        in_specs=[
            pl.BlockSpec((1, 1, Y, Z, C), lambda b_, x_: (b_, x_, 0, 0, 0)),
            pl.BlockSpec((f0 * f1, C, f2 * F), lambda b_, x_: (0, 0, 0)),
            pl.BlockSpec((1, f2 * F), lambda b_, x_: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, f0, Y, f1, zl, fl),
            lambda b_, x_: (b_, x_, 0, 0, 0, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((B, X, f0, Y, f1, zl, fl), dtype),
        interpret=interpret,
    )(x.astype(dtype), wt, bt)
    return out.reshape(B, X * f0, Y * f1, zl, fl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_pixel_shuffle(x, w, b, factor, dtype, interpret=False, zfold=False):
    """zfold=True emits the z-paired fold view (B, X2, Y2, Z2//2, 2F) —
    element-identical to fold_z(reference) as a linear reshape — for
    consumers that immediately altfold (e.g. decoder0's CatConvBlock)."""
    return _impl(x, w, b, factor, dtype, interpret, zfold)


def _fwd(x, w, b, factor, dtype, interpret, zfold):
    return fused_pixel_shuffle(x, w, b, factor, dtype, interpret, zfold), (x, w, b)


def _bwd(factor, dtype, interpret, zfold, res, g):
    x, w, b = res
    if zfold:
        B, X2, Y2, Zh, F2 = g.shape
        g = g.reshape(B, X2, Y2, Zh * 2, F2 // 2)
    _, vjp = jax.vjp(lambda x_, w_, b_: reference_shuffle(x_, w_, b_, factor, dtype), x, w, b)
    return vjp(g)


fused_pixel_shuffle.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# kernel==stride transposed conv: the SAME kernel with a per-factor DENSE
# weight. out[b, x*f0+i, y*f1+j, z*f2+k, f] = dot(x[b,x,y,z,:], w[i,j,k,:,f])
# — each (i, j) factor dot reads the FULL input channels against its own
# (C, f2*F) weight block instead of the shuffle's zero-padded channel slice.
# Target site: CTUNet res_decoder0's (2,2,1) 128->64 upsample, which XLA
# prices at ~12.9 ms/chunk (conv 4.6 + format 5.1 + fold reshape 3.1,
# device trace) against a ~3 ms traffic floor.
# ---------------------------------------------------------------------------


def reference_transp_kxs(x, w, dtype):
    """The einsum + interleave path of ops/conv.py conv_transpose3d_same
    (k == s case, standard-layout output)."""
    B, X, Y, Z, Cin = x.shape
    k0, k1, k2 = w.shape[:3]
    Cout = w.shape[-1]
    y = jnp.einsum(
        "bxyzc,ijkco->bxyzijko", x.astype(dtype), w.astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(B, X * k0, Y * k1, Z * k2, Cout)


def transp_supports(x_shape, w_shape, dtype, zfold: bool) -> bool:
    B, X, Y, Z, C = x_shape
    f0, f1, f2 = w_shape[:3]
    F = w_shape[-1]
    if w_shape[3] != C or dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if f2 not in (1, 2):
        return False
    if zfold and (Z * f2) % 2 != 0:
        return False
    lanes = f2 * F * (2 if zfold and f2 == 1 else 1)
    if C % 128 != 0 or Z % 8 != 0 or lanes % 128 != 0:
        return False
    # small-M blocks (Y*Z rows) under ~1024 rows leave the MXU idle — the
    # deep fusion-decoder sites (6..24^3) stay on XLA
    if Y * Z < 1024:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (
        Y * Z * C
        + f0 * f1 * (2 * C if zfold and f2 == 1 else C) * f2 * F * (2 if zfold and f2 == 1 else 1)
        + f0 * f1 * Y * Z * f2 * F * (2 if zfold and f2 == 1 else 1)
    ) * itemsize
    return vmem < _VMEM_BUDGET


def _prep_transp_weight(w, dtype):
    """(f0, f1, f2, C, F) -> (f0*f1, C, f2*F): W[i*f1+j, c, k*F+f]."""
    f0, f1, f2, C, F = w.shape
    return (
        w.astype(dtype).transpose(0, 1, 3, 2, 4).reshape(f0 * f1, C, f2 * F)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_transp_conv(x, w, dtype, interpret=False, zfold=False):
    """k==s transposed conv (bias-free) via the fused factor-dot kernel.
    ``zfold=True`` emits the fold_z view of the output (the FOLD96_MID
    consumer layout) — element-identical to fold_z(reference)."""
    f0, f1, f2 = w.shape[:3]
    F = w.shape[-1]
    wt = _prep_transp_weight(w, dtype)
    zero_b = jnp.zeros((F,), dtype)
    return _impl(
        x, w.reshape(-1, F), zero_b, (f0, f1, f2), dtype, interpret, zfold, wt=wt
    )


def _t_fwd(x, w, dtype, interpret, zfold):
    return fused_transp_conv(x, w, dtype, interpret, zfold), (x, w)


def _t_bwd(dtype, interpret, zfold, res, g):
    x, w = res
    if zfold:
        B, X2, Y2, Zh, F2 = g.shape
        g = g.reshape(B, X2, Y2, Zh * 2, F2 // 2)
    _, vjp = jax.vjp(lambda x_, w_: reference_transp_kxs(x_, w_, dtype), x, w)
    return vjp(g)


fused_transp_conv.defvjp(_t_fwd, _t_bwd)
