"""3D convolution / transposed-convolution with MONAI "SAME" padding semantics.

The reference derives padding from kernel/stride so that spatial dims divide
exactly by the stride (reference: networks/resnet.py:52-80 — ``padding =
(k - s + 1) // 2`` and transposed ``output_padding = 2p + s - k``). We
reproduce that arithmetic exactly, but in channels-last NDHWC layout, the
native layout for TPU convolutions.

Every transposed conv in the reference uses ``kernel_size == stride`` (the
upsample blocks pass ``upsample_kernel_size`` as both), which degenerates to a
block-expansion: each input voxel maps to an s0*s1*s2 output block via a
single matmul. We exploit that: the k==s case is lowered to one einsum on the
MXU plus a pixel-shuffle reshape instead of a strided conv_transpose — the
same math, far friendlier to the TPU.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .. import flags


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    if len(t) == 1:
        return (t[0], t[0], t[0])
    assert len(t) == 3, f"expected 3 spatial dims, got {v}"
    return t  # type: ignore[return-value]


def same_padding(kernel_size, stride) -> Tuple[int, int, int]:
    """MONAI's conv padding rule: ``(k - s + 1) // 2`` per axis.

    Mirrors reference networks/resnet.py:52-64 (``get_padding``).
    """
    k, s = _triple(kernel_size), _triple(stride)
    pads = []
    for ki, si in zip(k, s):
        p = (ki - si + 1) / 2
        if p < 0:
            raise ValueError(
                f"negative SAME padding for kernel={ki}, stride={si}; "
                "change the kernel size and/or stride"
            )
        pads.append(int(p))
    return tuple(pads)  # type: ignore[return-value]


def transpose_output_padding(kernel_size, stride, padding) -> Tuple[int, int, int]:
    """MONAI's transposed-conv output padding: ``2p + s - k`` per axis.

    Mirrors reference networks/resnet.py:66-80 (``get_output_padding``).
    """
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    out = []
    for ki, si, pi in zip(k, s, p):
        op = 2 * pi + si - ki
        if op < 0:
            raise ValueError(
                f"negative output padding for kernel={ki}, stride={si}, padding={pi}"
            )
        out.append(int(op))
    return tuple(out)  # type: ignore[return-value]


_DN = lax.conv_dimension_numbers  # cached builder


def conv3d_same(
    x: jax.Array,
    w: jax.Array,
    stride: Sequence[int] | int = 1,
    *,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """Channels-last 3D conv with the reference SAME-padding rule.

    Args:
      x: (B, X, Y, Z, Cin)
      w: (kx, ky, kz, Cin, Cout)  — DHWIO
      stride: int or per-axis triple.

    Output spatial size per axis: floor((in + 2p - k)/s) + 1 with
    p = (k - s + 1)//2, identical to the reference's torch Conv3d.
    """
    s = _triple(stride)
    k = w.shape[:3]
    p = same_padding(k, s)
    if flags.CIN1_MUL == "1" and w.shape[3] == 1 and k == (1, 1, 1):
        # Cin=1 pointwise conv: a K=1 "matmul" runs at ~0.1 TF/s on the MXU
        # (measured v5e). It is just a broadcast outer product — elementwise.
        xs = x[:, :: s[0], :: s[1], :: s[2], :]
        return xs.astype(preferred_dtype) * w[0, 0, 0, 0, :].astype(preferred_dtype)
    if flags.CIN1_S2D == "1" or flags.ZPAIR == "1" or flags.WINOGRAD == "1":
        # default-off structural rewrites (measured end-to-end losses on the
        # flagship config — each claims disjoint shapes from the default-on
        # paths below, so hook placement preserves the original gate order)
        from .experimental import maybe_conv3d

        y = maybe_conv3d(x, w, s, k, preferred_dtype)
        if y is not None:
            return y
    if (
        w.shape[3] == 1
        and s[0] == 2 and s[1] == 2 and s[2] == 1
        and k[0] == 7 and k[1] == 7
        and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    ):
        # ResNet 7x7x7 stem (Cin=1, stride (2,2,1)): the native conv path is
        # pathological on TPU (~2 TF/s measured — no lane dimension with one
        # input channel). Rewrite via 2x2 space-to-depth over the strided
        # axes: the conv becomes stride-1 over Cin=4 with a (4,4,kz) kernel
        # whose taps are the parity classes of the original 7-tap kernel.
        # Identical numerics (taps are rearranged, never approximated).
        # With Z % 4 == 0 the z axis folds by 4 as well (aligned output
        # quads, Cin 16 / Cout 4x): 13.6 -> 4.3 ms measured
        # (tools/probe_stem.py).
        if flags.STEM_Z4 == "1" and x.shape[3] % 4 == 0:
            return _stem_s2d_zfold4_conv(x, w, p, preferred_dtype)
        return _stem_s2d_conv(x, w, p, preferred_dtype)
    dn = _DN(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=s,
        padding=[(pi, pi) for pi in p],
        dimension_numbers=dn,
        preferred_element_type=preferred_dtype,
    )


def fold_z(x: jax.Array, factor: int = 2) -> jax.Array:
    """(B, X, Y, Z, C) -> (B, X, Y, Z/factor, factor*C): z space-to-depth.

    In channels-last memory order this is a contiguous reshape: (Z, C) ->
    (Z/f, f, C) -> (Z/f, f*C), so slot s (original z = f*j+s of fold j)
    occupies folded channels [s*C, (s+1)*C).
    """
    B, X, Y, Z, C = x.shape
    return x.reshape(B, X, Y, Z // factor, factor * C)


def unfold_z(x: jax.Array, factor: int = 2) -> jax.Array:
    """Inverse of :func:`fold_z`."""
    B, X, Y, Zf, Cf = x.shape
    return x.reshape(B, X, Y, Zf * factor, Cf // factor)


def conv3d_folded(
    x: jax.Array,
    w: jax.Array,
    *,
    preferred_dtype=jnp.float32,
    factor: int = 2,
) -> jax.Array:
    """Stride-1 SAME conv applied entirely in the z-folded layout.

    ``x``: (B, X, Y, Zf, factor*C) as produced by :func:`fold_z`; ``w`` is
    the ORIGINAL unfolded kernel (k, k, k, C, F) with k in {1, 3}. Returns
    the folded output (B, X, Y, Zf, factor*F) — numerically identical to
    ``fold_z(conv3d_same(unfold_z(x), w, 1))``.

    Why: lane-starved convs (min(C, F) = 32 runs ~10.6 TF/s on v5e vs 37-54
    at 64 lanes and 80-140 at 128 — measured, tools/probe_conv_rates.py)
    multiply their lane width by carrying z-slots in channels. The folded
    3^3 kernel spans 3 folds with 3*factor of 3*factor^2 (slot_in, slot_out)
    blocks live and the 1x1 kernel becomes block-diagonal (factor x MACs in
    both cases), but the lane-rate gain nets out on starved widths — stage-1
    bottleneck chain 76.4 -> 52.6 ms at factor 2
    (tools/probe_folded_stage.py) with zero per-conv relayout: the fold is
    a free contiguous reshape amortized over a whole ResNet stage.
    Reference workload: networks/resnet.py:97-126 (planes=32 stage).
    """
    k = tuple(w.shape[:3])
    C, F = w.shape[3], w.shape[4]
    f = factor
    assert x.shape[-1] == f * C, (x.shape, w.shape, factor)
    if k == (1, 1, 1):
        wf = jnp.zeros((1, 1, 1, f * C, f * F), w.dtype)
        for s in range(f):
            wf = wf.at[0, 0, 0, s * C : (s + 1) * C, s * F : (s + 1) * F].set(w[0, 0, 0])
        pads = [(0, 0)] * 3
    elif k == (3, 3, 3):
        # out slot b (z = f*q + b) reads z+dz = f*(q+kf) + a with
        # kf = (b+dz) // f, a = (b+dz) % f — one live (kf, a) per (b, dz)
        wf = jnp.zeros((3, 3, 3, f * C, f * F), w.dtype)
        for b in range(f):
            for dz in (-1, 0, 1):
                kf, a = divmod(b + dz, f)
                wf = wf.at[
                    :, :, kf + 1, a * C : (a + 1) * C, b * F : (b + 1) * F
                ].set(w[:, :, dz + 1])
        # fold-dim SAME pad of 1 == z pad of f, but the taps that could read
        # the extra z rows (beyond z=-1/z=Z) are zero blocks
        pads = [(1, 1)] * 3
    else:
        raise ValueError(f"conv3d_folded supports 1^3 and 3^3 kernels, got {k}")
    dn = _DN(x.shape, wf.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        x, wf, (1, 1, 1), pads, dimension_numbers=dn,
        preferred_element_type=preferred_dtype,
    )


def altfold_kernel(w: jax.Array, factor: int = 2) -> jax.Array:
    """(3,3,3,C,F) -> (3,3,2,fC,fF) half-fold-SHIFTED folded kernel.

    Used by both :func:`conv3d_altfold_a2o` (aligned-fold input -> shifted
    output) and :func:`conv3d_altfold_o2a` (shifted -> aligned): output slot
    ``b`` of a shifted fold (planes ``f*q - f/2 .. f*q + f/2 - 1``) reads
    exactly two aligned folds, so in either direction input slot ``a`` of
    fold ``q + kzf`` contributes plane offset ``dz = f*kzf + a - b - f/2``,
    live iff |dz| <= 1 — ``3f`` of the ``2f^2`` (kzf, a, b) blocks:

    - factor 2 ("odd pairs"): 6/8 live = 75% useful MACs at 2C lanes
      (vs 50% for the same-parity fold of :func:`conv3d_folded`);
    - factor 4 (shifted quads, round 5): 12/32 live = 37.5% useful at 4C
      lanes (vs 25% for the aligned factor-4 fold — 1.5x fewer MACs for the
      ResNet stage-1 conv2, tools/probe_altfold4.py)."""
    C, F = w.shape[3], w.shape[4]
    f = int(factor)
    assert f % 2 == 0, f
    wf = jnp.zeros((3, 3, 2, f * C, f * F), w.dtype)
    for kzf in (0, 1):
        for a in range(f):
            for b in range(f):
                dz = f * kzf + a - b - f // 2
                if -1 <= dz <= 1:
                    wf = wf.at[:, :, kzf, a * C : (a + 1) * C, b * F : (b + 1) * F].set(
                        w[:, :, dz + 1]
                    )
    return wf


def conv3d_altfold_a2o(xf: jax.Array, w: jax.Array, *, preferred_dtype=jnp.float32,
                       factor: int = 2):
    """Stride-1 SAME 3^3 conv from the ALIGNED z-fold layout to the ODD one.

    ``xf``: (B, X, Y, Zf, 2C) aligned fold (:func:`fold_z` — slot pair
    (2q, 2q+1)); ``w``: the original (3, 3, 3, C, F) kernel. Returns
    (B, X, Y, Zf+1, 2F) where output slot q holds z-planes (2q-1, 2q) —
    slot 0's first half (plane -1) and slot Zf's second half (plane Z) are
    GARBAGE (computed over the virtual z padding) and must be masked with
    :func:`mask_odd_edges` before statistics or a following conv.

    Why the parity alternation: the odd output pair (2q-1, 2q) reads input
    planes (2q-2 .. 2q+1) = exactly the two ALIGNED pairs (q-1, q) — so
    both operands stay free contiguous reshapes of the standard layout and
    the folded kernel keeps 6/8 blocks live (75% useful MACs at 2C lanes,
    vs 50% for the same-parity fold whose 3^3 kernel spans 3 folds).
    Measured v5e: 128-lane convs run ~139 TF/s raw (tools/probe_conv_rates)
    vs ~50 at 64 lanes, so the C=64 full-res decoder convs
    (reference hybrid_CTUNet.py:29-105) net ~2x despite the 33% overhead."""
    wf = altfold_kernel(w, factor)
    dn = _DN(xf.shape, wf.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        xf, wf, (1, 1, 1), [(1, 1), (1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=preferred_dtype,
    )


def conv3d_altfold_o2a(y_odd: jax.Array, w: jax.Array, *, preferred_dtype=jnp.float32,
                       factor: int = 2):
    """Stride-1 SAME 3^3 conv from the ODD z-fold layout back to ALIGNED.

    ``y_odd``: (B, X, Y, Zf+1, 2C), odd layout as produced by
    :func:`conv3d_altfold_a2o` with the edge slots already zeroed
    (:func:`mask_odd_edges` — they stand in for the conv's z zero-padding).
    Returns (B, X, Y, Zf, 2F) in the aligned fold layout
    (``unfold_z``-compatible). Same 75%-live folded kernel."""
    wf = altfold_kernel(w, factor)
    dn = _DN(y_odd.shape, wf.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        y_odd, wf, (1, 1, 1), [(1, 1), (1, 1), (0, 0)], dimension_numbers=dn,
        preferred_element_type=preferred_dtype,
    )


def shift_fold_a2s(x: jax.Array) -> jax.Array:
    """Re-group an ALIGNED z-fold tensor (B,X,Y,Zf,fC) into the half-fold-
    SHIFTED layout (B,X,Y,Zf+1,fC): shifted slot q holds planes
    ``f*q - f/2 .. f*q + f/2 - 1`` — first channel half from aligned slot
    q-1's second half, second half from slot q's first half; virtual edge
    planes are zero (they stand in for conv z-padding). Two slices + a pad +
    a concat: XLA fuses these re-indexed reads into the consuming
    elementwise pass (e.g. the bottleneck residual add), so the re-grouping
    costs no standalone copy."""
    half = x.shape[-1] // 2
    lo = jnp.pad(x[..., half:], ((0, 0),) * 3 + ((1, 0), (0, 0)))
    hi = jnp.pad(x[..., :half], ((0, 0),) * 3 + ((0, 1), (0, 0)))
    return jnp.concatenate([lo, hi], axis=-1)


def shift_fold_s2a(x: jax.Array) -> jax.Array:
    """Inverse re-grouping of :func:`shift_fold_a2s`: shifted (B,X,Y,Zf+1,fC)
    -> aligned (B,X,Y,Zf,fC). Aligned slot q = [shifted slot q's second
    half, shifted slot q+1's first half]."""
    half = x.shape[-1] // 2
    return jnp.concatenate(
        [x[:, :, :, :-1, half:], x[:, :, :, 1:, :half]], axis=-1
    )


def odd_edge_mask(zf1: int, c2: int, dtype=jnp.float32) -> jax.Array:
    """(Zf+1, 2C) multiplier zeroing an odd-layout tensor's two garbage edge
    half-slots: slot 0's first channel half (virtual plane -1) and the last
    slot's second half (virtual plane Z)."""
    c = c2 // 2
    mask = jnp.ones((zf1, c2), dtype)
    mask = mask.at[0, :c].set(0)
    return mask.at[zf1 - 1, c:].set(0)


def mask_odd_edges(y_odd: jax.Array) -> jax.Array:
    """Zero the garbage edge half-slots (see :func:`odd_edge_mask`). One
    broadcast multiply — fuses into the surrounding elementwise epilogue.
    Prefer passing ``mask=odd_edge_mask(...)`` to the folded instance norms,
    which fuses the multiply into their reduce/normalize passes instead."""
    Zf1, C2 = y_odd.shape[3], y_odd.shape[4]
    return y_odd * odd_edge_mask(Zf1, C2, y_odd.dtype)[None, None, None]


def _stem_s2d_zfold4_conv(x, w, p, preferred_dtype):
    """conv(x, w, stride=(2,2,1), SAME) with Cin=1, kx=ky=7, via 2x2 xy
    space-to-depth PLUS a factor-4 z fold with aligned output quads: the
    conv becomes (4, 4, 3) over Cin=16 producing Cout=4*cout (the z-quad as
    channel blocks) — 13.6 -> 4.3 ms on the v5e stem shape
    (tools/probe_stem.py; the xy-only rewrite is Cin=4 lane-starved).
    Output quad q holds planes (4q..4q+3); plane 4q+b reads padded
    z'' = 4(q+kf)+a at tap dz = 4kf + a - b (live iff 0 <= dz < kz).
    Taps rearranged exactly, never approximated. Requires Z % 4 == 0."""
    B, X, Y, Z, _ = x.shape
    kz = w.shape[2]
    cout = w.shape[4]
    pz = p[2]
    zp = Z + 2 * pz
    pad4 = (-zp) % 4
    xp = jnp.pad(
        x, ((0, 0), (3, 3 + (X % 2)), (3, 3 + (Y % 2)), (pz, pz + pad4), (0, 0))
    )
    Xp, Yp, Zp = xp.shape[1], xp.shape[2], xp.shape[3]
    xs = xp.reshape(B, Xp // 2, 2, Yp // 2, 2, Zp, 1)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, Xp // 2, Yp // 2, Zp, 4)
    xs = xs.reshape(B, Xp // 2, Yp // 2, Zp // 4, 16)  # free z fold
    kzf = (3 + kz - 1) // 4 + 1
    wk = jnp.zeros((4, 4, kzf, 16, 4 * cout), w.dtype)
    for rx in (0, 1):
        n_ex = 4 if rx == 0 else 3
        for ry in (0, 1):
            n_ey = 4 if ry == 0 else 3
            cxy = rx * 2 + ry
            for kf in range(kzf):
                for a in range(4):
                    for b in range(4):
                        dz = 4 * kf + a - b
                        if 0 <= dz < kz:
                            wk = wk.at[
                                :n_ex, :n_ey, kf, a * 4 + cxy,
                                b * cout : (b + 1) * cout,
                            ].set(w[rx::2, ry::2, dz, 0, :])
    dn = _DN(xs.shape, wk.shape, ("NDHWC", "DHWIO", "NDHWC"))
    out = lax.conv_general_dilated(
        xs, wk, (1, 1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=preferred_dtype,
    )  # (B, ox', oy', Z/4, 4*cout)
    ox = (X - 1) // 2 + 1
    oy = (Y - 1) // 2 + 1
    out = out[:, :ox, :oy]
    # unfold the quad blocks back to planes (free contiguous reshape)
    return out.reshape(B, ox, oy, Z, cout)


def _stem_s2d_conv(x, w, p, preferred_dtype):
    """conv(x, w, stride=(2,2,1), SAME) with Cin=1, kx=ky=7, via 2x2
    space-to-depth. p = same_padding((7,7,kz),(2,2,1)) = (3,3,pz)."""
    B, X, Y, Z, _ = x.shape
    kz = w.shape[2]
    cout = w.shape[4]
    pz = p[2]
    # pad x/y by 3 each side plus one extra high so the length is even, z by pz
    xp = jnp.pad(x, ((0, 0), (3, 3 + (X % 2)), (3, 3 + (Y % 2)), (pz, pz), (0, 0)))
    Xp, Yp = xp.shape[1], xp.shape[2]
    # space-to-depth 2x2 over (x, y): channel index c = rx*2 + ry
    xs = xp.reshape(B, Xp // 2, 2, Yp // 2, 2, xp.shape[3], 1)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, Xp // 2, Yp // 2, xp.shape[3], 4)
    # kernel (4, 4, kz, 4, cout): parity class (rx, ry) holds taps
    # w[2e+rx, 2f+ry, :] at position (e, f); odd classes have 3 live taps.
    wk = jnp.zeros((4, 4, kz, 4, cout), w.dtype)
    for rx in (0, 1):
        n_ex = 4 if rx == 0 else 3
        for ry in (0, 1):
            n_ey = 4 if ry == 0 else 3
            c = rx * 2 + ry
            wk = wk.at[:n_ex, :n_ey, :, c, :].set(w[rx::2, ry::2, :, 0, :])
    dn = _DN(xs.shape, wk.shape, ("NDHWC", "DHWIO", "NDHWC"))
    out = lax.conv_general_dilated(
        xs, wk, (1, 1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=preferred_dtype,
    )
    # VALID over length Xp//2 with k=4 -> Xp//2-3; SAME stride-2 output is
    # floor((X+2*3-7)/2)+1 = (X-1)//2 + 1
    ox = (X - 1) // 2 + 1
    oy = (Y - 1) // 2 + 1
    return out[:, :ox, :oy, :, :]


def conv_transpose3d_same(
    x: jax.Array,
    w: jax.Array,
    stride: Sequence[int] | int,
    *,
    preferred_dtype=jnp.float32,
    fold_out: bool = False,
) -> jax.Array:
    """Channels-last transposed 3D conv reproducing torch ConvTranspose3d with
    MONAI's (padding, output_padding) rule; output spatial = input * stride.

    Args:
      x: (B, X, Y, Z, Cin)
      w: (kx, ky, kz, Cin, Cout) — torch ConvTranspose weight (Cin, Cout, k..)
         transposed into DHW-IO layout. The kernel is applied with torch
         transposed-conv semantics (gradient-of-conv, i.e. flipped taps).

    Fast path: when ``kernel == stride`` (every decoder upsample in the
    reference: hybrid_CTUNet.py:176-186 etc.), the op is a per-voxel matmul
    Cin -> prod(k)*Cout followed by block interleave — one MXU einsum.
    """
    s = _triple(stride)
    k = w.shape[:3]
    B, X, Y, Z, Cin = x.shape
    Cout = w.shape[-1]

    # Hook order: the Pallas fold-site kernel outranks BOTH einsum and
    # native paths (production default TRANSP_PALLAS=fold + TRANSP_NATIVE=1).
    # A/B protocol note (ADVICE r3): sweeping TRANSP_NATIVE alone does NOT
    # isolate native-vs-einsum at fold_out sites — ALSO set TRANSP_PALLAS=0.
    tp = flags.TRANSP_PALLAS
    if (
        tuple(k) == tuple(s)
        and (tp == "1" or (tp == "fold" and fold_out))
        and jax.default_backend() == "tpu"
    ):
        from . import shuffle_pallas

        if shuffle_pallas.transp_supports(x.shape, w.shape, preferred_dtype, fold_out):
            return shuffle_pallas.fused_transp_conv(
                x, w, preferred_dtype, False, fold_out
            )
    if tuple(k) == tuple(s) and flags.TRANSP_NATIVE != "1":
        # out[b, x*s0+d0, y*s1+d1, z*s2+d2, co] = sum_ci x[b,x,y,z,ci] * w[d0,d1,d2,ci,co]
        w2 = w.reshape(k[0] * k[1] * k[2] * Cin, Cout).reshape(k[0], k[1], k[2], Cin, Cout)
        y = jnp.einsum(
            "bxyzc,ijkco->bxyzijko",
            x,
            w2,
            preferred_element_type=preferred_dtype,
        )
        # interleave blocks into space: (B,X,Y,Z,k0,k1,k2,Cout) -> (B,X*k0,Y*k1,Z*k2,Cout)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        if fold_out:
            # emit the fold_z layout directly: the trailing (Z, k2, Cout)
            # dims flatten z_out-major, so regrouping as (Z*k2/2, 2*Cout) is
            # a pure reshape composed into the same interleave copy — kills
            # the separate downstream fold_z layout copy (device trace:
            # ~3.1 ms/chunk at res_decoder0/conv_block).
            if (Z * k[2]) % 2 != 0:
                raise ValueError(f"fold_out needs an even output Z, got {Z * k[2]}")
            return y.reshape(B, X * k[0], Y * k[1], Z * k[2] // 2, 2 * Cout)
        return y.reshape(B, X * k[0], Y * k[1], Z * k[2], Cout)

    # General case: lax.conv_transpose with torch-equivalent explicit padding.
    # transpose_kernel=True expects the kernel in the layout of the matching
    # *forward* conv (Cout->Cin), so swap the channel axes of our (.., Cin, Cout).
    p = same_padding(k, s)
    op = transpose_output_padding(k, s, p)
    pads = [(ki - 1 - pi, ki - 1 - pi + opi) for ki, pi, opi in zip(k, p, op)]
    w_fwd = jnp.swapaxes(w, -1, -2)
    dn = _DN(x.shape, w_fwd.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y = lax.conv_transpose(
        x,
        w_fwd,
        strides=s,
        padding=pads,
        dimension_numbers=dn,
        transpose_kernel=True,
        preferred_element_type=preferred_dtype,
    )
    return fold_z(y) if fold_out else y
