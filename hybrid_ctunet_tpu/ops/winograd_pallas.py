"""Pallas TPU kernel: stride-1 SAME 3x3x3 conv via Winograd F(2,3)^3.

Accelerates the reference's hot conv workload — every stride-1 3^3 conv in
ResBlock (reference networks/hybrid_CTUNet.py:29-105) and the ResNet
bottleneck tails (networks/resnet.py:97-126) — with the transform math pinned
in ``ops/winograd.py`` (Lavin & Gray F(2,3), exact-binary transform entries).

Why XLA loses here (PERF.md): TPU convs are rate-limited by min(Cin, Cout)
MXU lanes — 64-ch 3^3 convs cap at ~50 TF/s and 32-ch at ~10 (vs 197 peak).
Winograd turns the conv into 64 position-wise (tiles x Cin) @ (Cin x Cout)
matmuls (3.375x fewer MACs). This kernel additionally folds the ENTIRE z-axis
(forward transform, position dots, inverse transform) into two precomputed
(2C, 2F) filter matrices per x/y position pair — see ``_folded_filter`` — so
each (a,b) x/y-position contributes exactly two dots

    yz = am @ A_ab + bm @ B_ab          am/bm: (M, 2C) z-pair slabs

with K = 2C lanes (full MXU width for C >= 64), M = tiles-per-block >= ~768
rows (the round-1 probe: Mosaic matmul throughput needs M >= ~1024 to reach
~47 TF/s; see PERF.md "Design constraint"), and zero in-kernel lane
operations. Net multiply count is 16 x 2 x (2C x 2F) per 2x2x2-output tile =
16*C*F per output voxel vs the direct conv's 27*C*F (1.69x reduction) at full
lane utilization.

Layout trick: the z axis is folded in *pairs* into the lane dimension
(B, X+2, Y+2, (Z+2)/2, 2C) — a free reshape, because tiles advance by 2 along
z, so the four z-offsets of a tile are exactly two adjacent lane-folded pairs.
All staging arrays then carry 2C lanes and the z-axis Winograd transform
becomes lane-half arithmetic. x/y halos (2 elements each) are expressed with
duplicate in_specs of the same array (main block + halo block), keeping the
automatic Pallas pipelining — no manual DMA, no overlapping-block gather.

Numerics: input transform in fp32 (entries 0/±1 — adds only), dot operands in
the compute dtype (bf16 on TPU) with fp32 accumulation, inverse transform
staged per axis in fp32. Differences vs direct conv are confined to the
Winograd summation order (validated against ``conv3d_same`` in
tests/test_pallas_ops.py).

Backward: custom VJP that recomputes through the direct XLA conv — training
numerics are exactly the unfused path's.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .winograd import transform_filter


def _kernel(xaa, xab, xba, xbb, u_ref, out_ref, *st_ref, ty, tz, c, f, dtype):
    zp = tz + 1
    ll = 2 * c
    # assemble the (4, 2ty+2, ZP, 2C) input slab from main + halo blocks
    x_lo = jnp.concatenate([xaa[0], xab[0]], axis=1)  # x planes 2i, 2i+1
    x_hi = jnp.concatenate([xba[0], xbb[0]], axis=1)  # x planes 2i+2, 2i+3
    d = jnp.concatenate([x_lo, x_hi], axis=0)
    d0, d1, d2, d3 = (d[i] for i in range(4))

    # Input transforms stay in the compute dtype (bf16 on TPU): each stage is
    # a sum/difference of two terms (BT entries are 0/±1), so the rounding is
    # on the order of the bf16 input quantization itself; products accumulate
    # in fp32 on the MXU. Keeping the staging arrays narrow is what fits the
    # whole pipeline in VMEM.
    acc = [[None, None], [None, None]]  # [o0][o1] -> (ty, tz, 2F) fp32

    def add(slot, o0, o1, val):
        slot[o0][o1] = val if slot[o0][o1] is None else slot[o0][o1] + val

    # x-axis transform rows (BT): [1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]
    t1_of = (lambda: d0 - d2, lambda: d1 + d2, lambda: d2 - d1, lambda: d1 - d3)
    # y-axis transform rows applied to even/odd y-parity slabs e, o
    t2_of = (
        lambda e, o: e[:-1] - e[1:],
        lambda e, o: o[:-1] + e[1:],
        lambda e, o: e[1:] - o[:-1],
        lambda e, o: o[:-1] - o[1:],
    )
    for a in range(4):
        p = t1_of[a]().reshape(ty + 1, 2, zp, ll)
        e, o = p[:, 0], p[:, 1]  # even/odd y offsets, (ty+1, ZP, 2C)
        yb = [None, None]  # per-a (o1) accumulators
        for b in range(4):
            t2 = t2_of[b](e, o)  # (ty, ZP, 2C)
            # Both the z-axis forward transform (lane-pair mixing) and the
            # z-axis inverse transform are folded into the precomputed filter
            # matrices A = u_ref[ab,0], B = u_ref[ab,1] (see _folded_filter):
            # the two z-pair slabs feed two dots and the sum is the z-complete,
            # z-inverted contribution. No in-kernel lane ops at all.
            am = t2[:, :tz].reshape(ty * tz, ll)  # z-pairs m = w
            bm = t2[:, 1:].reshape(ty * tz, ll)   # z-pairs m = w+1
            yz = lax.dot_general(
                am, u_ref[a * 4 + b, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + lax.dot_general(
                bm, u_ref[a * 4 + b, 1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            yz = yz.reshape(ty, tz, 2 * f)
            # y-axis inverse: AT rows [1,1,1,0] and [0,1,-1,-1]
            if b < 3:
                yb[0] = yz if yb[0] is None else yb[0] + yz
            if b in (1, 2, 3):
                s = yz if b == 1 else -yz
                yb[1] = s if yb[1] is None else yb[1] + s
        # x-axis inverse, same AT rows
        for o1 in range(2):
            if a < 3:
                add(acc, 0, o1, yb[o1])
            if a in (1, 2, 3):
                add(acc, 1, o1, yb[o1] if a == 1 else -yb[o1])

    for o0 in range(2):
        yf = jnp.stack([acc[o0][0], acc[o0][1]], axis=1)  # (ty, 2, tz, 2F)
        out_ref[0, o0] = yf.reshape(2 * ty, tz, 2 * f).astype(dtype)

    if st_ref:
        # Per-block InstanceNorm partial sums over the fp32 accumulators
        # (before the output cast): s1 = sum y, s2 = sum y^2, per lane. The
        # host combines blocks + lane halves — this kills the separate
        # stats read pass of the downstream IN (PERF.md Winograd-v2 plan).
        s1 = jnp.zeros((2 * f,), jnp.float32)
        s2 = jnp.zeros((2 * f,), jnp.float32)
        for o0 in range(2):
            for o1 in range(2):
                a = acc[o0][o1]
                s1 = s1 + jnp.sum(a, axis=(0, 1))
                s2 = s2 + jnp.sum(a * a, axis=(0, 1))
        st_ref[0][0, 0, 0] = jnp.stack([s1, s2])  # (2, 2F)


def _pick_ty(hy: int, tz: int, c: int) -> int:
    from .. import flags

    if flags.WINOGRAD_TY:
        return int(flags.WINOGRAD_TY)
    # Largest tile-row count dividing Y/2 that keeps the block VMEM-safe.
    # The budget scales with the lane width 2C: the empirical overflow point
    # (ty=24, tz=48 crashes; 16 fits) was measured at C=64 (128 lanes), i.e.
    # ty*(tz+1)*2C <= 16*49*128 elements of staging. At C=32 the same budget
    # admits ty=24, which is what lifts M=ty*tz over the >=768 MXU-efficiency
    # bar for the ResNet stage-1 tail shape (48,48,96).
    budget = 16 * 49 * 128
    for ty in (24, 16, 12, 8, 6, 4):
        if hy % ty == 0 and ty * (tz + 1) * 2 * c <= budget:
            return ty
    return hy


_AT = ((1.0, 1.0, 1.0, 0.0), (0.0, 1.0, -1.0, -1.0))  # F(2,3) inverse rows
# lane-half coefficient of am/bm in the z-transformed position v_z
# (am lanes = [k0|k1], bm lanes = [k2|k3]; BT rows give
#  v0 = k0-k2, v1 = k1+k2, v2 = k2-k1, v3 = k1-k3)
_COEF_A = {(0, 0): 1.0, (1, 1): 1.0, (1, 2): -1.0, (1, 3): 1.0}
_COEF_B = {(0, 0): -1.0, (0, 1): 1.0, (0, 2): 1.0, (1, 3): -1.0}


def _folded_filter(w: jax.Array, dtype) -> jax.Array:
    """(3,3,3,C,F) -> (16, 2, 2C, 2F): per-(a,b) matrices A = out[ab,0] and
    B = out[ab,1] with BOTH the z-axis forward transform (lane-pair mixing of
    the two z-pair slabs am, bm) and the z-axis inverse transform folded in:

        yz_{o2-lane-paired} = am @ A + bm @ B
        A[r-half, o2-half] = sum_z AT[o2,z] * coefA(r,z) * U_z

    so the kernel needs zero in-kernel lane operations for the z axis."""
    c, f = w.shape[3], w.shape[4]
    u = transform_filter(w)  # (4,4,4,C,F) fp32, exact
    u = u.reshape(16, 4, c, f)
    ab = jnp.zeros((16, 2, 2 * c, 2 * f), jnp.float32)
    for s_, coefs in enumerate((_COEF_A, _COEF_B)):
        for r in range(2):
            for o2 in range(2):
                blk = 0
                for z in range(4):
                    w_z = _AT[o2][z] * coefs.get((r, z), 0.0)
                    if w_z:
                        blk = blk + w_z * u[:, z]
                if not isinstance(blk, int):
                    ab = ab.at[:, s_, r * c:(r + 1) * c,
                               o2 * f:(o2 + 1) * f].set(blk)
    return ab.astype(dtype)


def supports(x_shape, w_shape, stride) -> bool:
    """Fast path: stride-1 3^3, Cin in the measured-win set
    (``flags.WINOGRAD_CH``, default C=32 — see flags.py for the ResBlock-level
    A/B numbers), even dims, and a big enough tile block for the MXU
    (M >= 768)."""
    from .. import flags

    if tuple(stride) != (1, 1, 1) or tuple(w_shape[:3]) != (3, 3, 3):
        return False
    _, x_, y_, z_, c = x_shape
    f = w_shape[4]
    allowed = {int(v) for v in str(flags.WINOGRAD_CH).split(",") if v}
    if c not in allowed or f not in (32, 64, 128):
        return False
    if x_ % 2 or y_ % 2 or z_ % 2:
        return False
    tz = z_ // 2
    ty = _pick_ty(y_ // 2, tz, c)
    return (y_ // 2) % ty == 0 and ty * tz >= 768


def _conv_impl(x, w, out_dtype, interpret, emit_stats=False):
    b, x_, y_, z_, c = x.shape
    f = w.shape[4]
    tz = z_ // 2
    zp = tz + 1
    ty = _pick_ty(y_ // 2, tz, c)
    nbx, nby = x_ // 2, (y_ // 2) // ty
    ll = 2 * c

    cdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    ub = _folded_filter(w, cdt)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(b, x_ + 2, y_ + 2, zp, ll).astype(cdt)

    out_shape = [jax.ShapeDtypeStruct((b, x_, y_, tz, 2 * f), cdt)]
    out_specs = [
        pl.BlockSpec((1, 2, 2 * ty, tz, 2 * f), lambda n, i, j: (n, i, j, 0, 0))
    ]
    if emit_stats:
        out_shape.append(
            jax.ShapeDtypeStruct((b, nbx, nby, 2, 2 * f), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, 1, 1, 2, 2 * f), lambda n, i, j: (n, i, j, 0, 0))
        )

    res = pl.pallas_call(
        functools.partial(_kernel, ty=ty, tz=tz, c=c, f=f, dtype=cdt),
        grid=(b, nbx, nby),
        in_specs=[
            pl.BlockSpec((1, 2, 2 * ty, zp, ll), lambda n, i, j: (n, i, j, 0, 0)),
            pl.BlockSpec((1, 2, 2, zp, ll),
                         lambda n, i, j: (n, i, ty * (j + 1), 0, 0)),
            pl.BlockSpec((1, 2, 2 * ty, zp, ll),
                         lambda n, i, j: (n, i + 1, j, 0, 0)),
            pl.BlockSpec((1, 2, 2, zp, ll),
                         lambda n, i, j: (n, i + 1, ty * (j + 1), 0, 0)),
            pl.BlockSpec((16, 2, 2 * c, 2 * f), lambda n, i, j: (0, 0, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, xp, xp, xp, ub)
    y = res[0].reshape(b, x_, y_, z_, f).astype(out_dtype)
    if not emit_stats:
        return y
    st = res[1].sum(axis=(1, 2))  # (b, 2, 2F)
    s1 = st[:, 0, :f] + st[:, 0, f:]
    s2 = st[:, 1, :f] + st[:, 1, f:]
    return y, s1, s2


def _direct_conv(x, w, out_dtype):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn,
        preferred_element_type=out_dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _winograd_conv(x, w, out_dtype, interpret):
    return _conv_impl(x, w, out_dtype, interpret)


def _fwd(x, w, out_dtype, interpret):
    return _winograd_conv(x, w, out_dtype, interpret), (x, w)


def _bwd(out_dtype, interpret, res, gy):
    # gradient through the direct conv: training numerics stay the XLA path's
    x, w = res
    _, vjp = jax.vjp(lambda xx, ww: _direct_conv(xx, ww, out_dtype), x, w)
    return vjp(gy)


_winograd_conv.defvjp(_fwd, _bwd)


def conv3x3_winograd(x, w, *, out_dtype, interpret=False):
    """Stride-1 SAME 3^3 conv, Winograd F(2,3)^3 on TPU.

    x: (B, X, Y, Z, C); w: (3,3,3,C,F). Caller must check :func:`supports`.
    """
    return _winograd_conv(x, w, out_dtype, interpret)


# ---------------------------------------------------------------------------
# v2: the fused InstanceNorm chain (PERF.md "Winograd v2 plan").
#
# The bare kernel swap loses end-to-end because it breaks XLA's
# conv+IN+LeakyReLU fusion pattern (round-1 A/B). The fused variant recovers
# the traffic:
#   - the PREVIOUS IN's normalize + LeakyReLU rides this conv's pad+lane-fold
#     pass for free (one fused XLA elementwise over the copy that must happen
#     anyway) — kills the separate normalize read+write;
#   - the kernel emits per-block IN partial sums (s1, s2) for its OWN output
#     — kills the downstream stats read;
#   - the caller applies the resulting scale/bias in its next fused pass
#     (the next conv's input, or the residual-add epilogue).
# ---------------------------------------------------------------------------


def _apply_affine(x, scale, bias, in_act):
    # scale/bias: (B, C) fp32 — per-sample per-channel InstanceNorm affine.
    t = (
        x.astype(jnp.float32) * scale[:, None, None, None, :]
        + bias[:, None, None, None, :]
    )
    if in_act:
        t = jnp.where(t > 0, t, 0.01 * t)
    return t.astype(x.dtype)


def _fused_ref(x, w, scale, bias, out_dtype, in_act, emit_stats):
    """Direct-conv reference of the fused op (backward + oracle path)."""
    xe = _apply_affine(x, scale, bias, in_act) if scale is not None else x
    y = _direct_conv(xe, w, out_dtype)
    if not emit_stats:
        return y
    yf = y.astype(jnp.float32)
    s1 = jnp.sum(yf, axis=(1, 2, 3))
    s2 = jnp.sum(yf * yf, axis=(1, 2, 3))
    return y, s1, s2


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _winograd_fused(x, w, scale, bias, out_dtype, interpret, in_act, emit_stats):
    xe = _apply_affine(x, scale, bias, in_act)
    return _conv_impl(xe, w, out_dtype, interpret, emit_stats=emit_stats)


def _fused_fwd(x, w, scale, bias, out_dtype, interpret, in_act, emit_stats):
    out = _winograd_fused(x, w, scale, bias, out_dtype, interpret, in_act, emit_stats)
    return out, (x, w, scale, bias)


def _fused_bwd(out_dtype, interpret, in_act, emit_stats, res, g):
    # autodiff through the direct-conv reference: training numerics are
    # exactly the unfused path's (incl. the stats outputs' contributions)
    x, w, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ww, sc, bi: _fused_ref(xx, ww, sc, bi, out_dtype, in_act, emit_stats),
        x, w, scale, bias,
    )
    return vjp(g)


_winograd_fused.defvjp(_fused_fwd, _fused_bwd)


def conv3x3_winograd_fused(
    x,
    w,
    in_affine=None,
    *,
    in_act=False,
    emit_stats=False,
    out_dtype,
    interpret=False,
):
    """Fused-chain stride-1 SAME 3^3 Winograd conv.

    ``in_affine``: optional (scale, bias) each (B, C) fp32 — the previous
    InstanceNorm's normalize (+LeakyReLU when ``in_act``), applied inside this
    conv's pad+fold pass. ``emit_stats``: additionally return (s1, s2), each
    (B, F) fp32 sums of y and y^2 over space, for the caller's IN of this
    conv's output. Caller must check :func:`supports`."""
    if in_affine is None:
        b, c = x.shape[0], x.shape[-1]
        scale = jnp.ones((b, c), jnp.float32)
        bias = jnp.zeros((b, c), jnp.float32)
        in_act = False
    else:
        scale, bias = in_affine
    return _winograd_fused(
        x, w, scale, bias, out_dtype, interpret, in_act, emit_stats
    )
