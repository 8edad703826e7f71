"""Default-OFF experimental ResBlock / PixelShuffle variants, quarantined.

Each path here is behavior-identical to the production path (same math,
same parameter tree — pinned by equivalence tests) but measured an
END-TO-END loss on the flagship v5e config; see the per-path notes and
PERF.md. They are dispatched from :class:`..models.layers.ResBlock` /
:class:`..models.layers.PixelShuffleLinear` only when their gate flag is
set, so the hot classes read as two paths (altfold fast path + standard).

Flax note: the submodules constructed here carry the same explicit
``name=...`` as the production path's and are created while the parent's
``@nn.compact`` ``__call__`` is executing, so they bind into the parent's
scope — checkpoints are interchangeable across every gate setting.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import flags
from ..ops.act import leaky_relu
from ..ops.conv import fold_z, unfold_z
from ..ops.norm import (
    instance_norm,
    instance_norm_folded,
    instance_norm_leaky,
    instance_norm_leaky_folded,
    stats_to_affine,
)


def wino2_engages(block, x, stride, f, k3) -> bool:
    """WINOGRAD=2 (fused-IN Winograd chain) gate for ``ResBlock``. Loses
    3.4x at the flagship C=64 width (ty<=16 VMEM cap puts M=768 under the
    MXU-efficiency bar) but WINS 1.18x at C=32 — kept for pf16-width
    models. See ops/winograd_pallas.py v2 notes."""
    if block.fold_in or stride != (1, 1, 1) or not k3:
        return False
    from ..ops import winograd_pallas

    return winograd_pallas.supports(
        (*x.shape[:4], f), (3, 3, 3, f, f), (1, 1, 1)
    )


def resblock_experimental(block, x, skip, stride, needs_proj, f, wino2):
    """ZFOLD_RES / WINOGRAD=2 ResBlock bodies. ``x``/``skip`` arrive in the
    STANDARD layout (the caller already unfolded any fold_in input).
    Returns the block output, or None when no experimental path claims the
    shape."""
    from .layers import Conv3d, _SplitInputConv3d, _triple

    k3 = _triple(block.kernel_size) == (3, 3, 3)
    cin = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)

    zfold_res = (
        not wino2
        and flags.ZFOLD == "1"
        and flags.ZFOLD_RES == "1"
        and k3
        and stride == (1, 1, 1)
        and f <= flags.ZFOLD_RES_CH
        and f % 2 == 0
        and x.shape[3] % 2 == 0
        and (skip is None or needs_proj)
        and cin >= 16
    )
    if zfold_res:
        # z-folded full-res block: every stride-1 conv runs in the
        # fold_z layout at 2x lane width / 2x structured-sparse MACs.
        # Default OFF (flags.py ZFOLD_RES): standalone convs win
        # 1.25-1.30x and two blocks win in isolation (CatConvBlock
        # 92.7 -> 83.3 ms, UpConvBlock 55.7 -> 49.4,
        # tools/ab_zfold_res.py), but the full model LOSES
        # (tools/ab_zfold_model.py: TUNet chunk 190 -> 202 ms) — the
        # per-block fold/unfold relayouts break XLA's cross-block
        # fusion. Identical math and parameter tree, pinned by
        # tests/test_conv.py::test_zfold_resblock_*. Unlike ZFOLD
        # (whole-stage, one fold per ResNet stage) this folds per block
        # and never amortizes.
        xf = fold_z(x)
        sf = fold_z(skip) if skip is not None else None
        if skip is None:
            y1 = Conv3d(f, 3, 1, dtype=block.dtype, name="conv1")(xf, folded=True)
        else:
            y1 = _SplitInputConv3d(f, 3, 1, dtype=block.dtype,
                                   name="conv1")(xf, sf, folded=True)
        y1 = instance_norm_leaky_folded(y1)
        out = Conv3d(f, 3, 1, dtype=block.dtype, name="conv2")(y1, folded=True)
        out = instance_norm_folded(out)
        if needs_proj:
            if skip is None:
                residual = Conv3d(f, 1, 1, dtype=block.dtype, name="conv3")(xf, folded=True)
            else:
                residual = _SplitInputConv3d(f, 1, 1, dtype=block.dtype,
                                             name="conv3")(xf, sf, folded=True)
            residual = instance_norm_folded(residual)
        else:
            residual = xf
        res = leaky_relu(out + residual)
        return res if block.fold_out else unfold_z(res)

    if not wino2:
        return None

    # Winograd fused-IN chain (flags.WINOGRAD == "2"): conv kernels emit
    # the IN partial sums, the IN normalize+LeakyReLU rides the next
    # conv's pad+fold pass (or the residual-add epilogue) — no separate
    # stats/normalize passes touch HBM. Identical math to the default
    # path (see ops/winograd_pallas.py v2 notes).
    from ..ops import winograd_pallas

    n_vox = x.shape[1] * x.shape[2] * x.shape[3]
    fused1 = skip is None and winograd_pallas.supports(
        x.shape, (3, 3, 3, x.shape[-1], f), (1, 1, 1)
    )
    if fused1:
        y1, a1, b1 = Conv3d(f, 3, 1, dtype=block.dtype, name="conv1")(
            x, emit_stats=True
        )
        sc1, bi1 = stats_to_affine(a1, b1, n_vox)
        y2, a2, b2 = Conv3d(f, 3, 1, dtype=block.dtype, name="conv2")(
            y1, in_affine=(sc1, bi1), in_act=True, emit_stats=True
        )
    else:
        if skip is None:
            y1 = Conv3d(f, block.kernel_size, block.stride,
                        dtype=block.dtype, name="conv1")(x)
        else:
            y1 = _SplitInputConv3d(f, block.kernel_size, block.stride,
                                   dtype=block.dtype, name="conv1")(x, skip)
        y2, a2, b2 = Conv3d(f, 3, 1, dtype=block.dtype, name="conv2")(
            instance_norm_leaky(y1), emit_stats=True
        )
    sc2, bi2 = stats_to_affine(a2, b2, n_vox)
    out = (
        y2.astype(jnp.float32) * sc2[:, None, None, None, :]
        + bi2[:, None, None, None, :]
    ).astype(y2.dtype)

    # shared residual tail (identical to the production path's)
    if needs_proj:
        if skip is None:
            residual = Conv3d(f, 1, block.stride,
                              dtype=block.dtype, name="conv3")(x)
        else:
            residual = _SplitInputConv3d(f, 1, block.stride,
                                         dtype=block.dtype, name="conv3")(x, skip)
        residual = instance_norm(residual)
    else:
        residual = x if skip is None else jnp.concatenate(
            [x, skip.astype(x.dtype)], axis=-1
        )
    res = leaky_relu(out + residual)
    return fold_z(res) if block.fold_out else res


def pixel_shuffle_experimental(shuffle, x):
    """SHUFFLE_CT ("native strided transposed-conv") / SHUFFLE_BD
    ("block-diagonal matmul") PixelShuffleLinear bodies. Returns None when
    neither gate claims the call. Both are measured in-model LOSSES
    (CT: ~5.5 ms/chunk, BD: 9.71 -> 9.31 vol/min — XLA fuses the small
    per-voxel Dense + shuffle permutes into their neighbors better than
    either reformulation); kept with equivalence tests for study."""
    from jax import lax

    from .layers import _DenseBiasParams

    B, X, Y, Z, C = x.shape
    f0, f1, f2 = shuffle.factor
    div = f0 * f1 * f2
    cp = C // div
    if flags.SHUFFLE_CT == "1" and div > 1:
        # native strided transposed-conv formulation: kernel (f0,f1,f2)
        # with one live channel block per tap — XLA's transposed-conv
        # emitter produces the interleaved output directly in the
        # channels-minor layout consumers want, avoiding the 8-D
        # transpose + the layout copies it forces. Identical math and
        # parameter tree.
        w, b = _DenseBiasParams((cp, shuffle.features), name="to_out")()
        wt = jnp.zeros((f0, f1, f2, C, shuffle.features), shuffle.dtype)
        idx = jnp.arange(cp)
        for i in range(f0):
            for j in range(f1):
                for k in range(f2):
                    ch = ((idx * f0 + i) * f1 + j) * f2 + k
                    wt = wt.at[i, j, k, ch, :].set(w.astype(shuffle.dtype))
        pads = [(fi - 1, fi - 1) for fi in (f0, f1, f2)]
        dn = lax.conv_dimension_numbers(
            x.shape, (f0, f1, f2, shuffle.features, C), ("NDHWC", "DHWIO", "NDHWC")
        )
        y = lax.conv_transpose(
            x.astype(shuffle.dtype), jnp.swapaxes(wt, -1, -2), (f0, f1, f2), pads,
            dimension_numbers=dn, transpose_kernel=True,
            preferred_element_type=shuffle.dtype,
        )
        y = y + b.astype(shuffle.dtype)
        return fold_z(y) if shuffle.fold_out else y
    if flags.SHUFFLE_BD == "1" and div > 1:
        w, b = _DenseBiasParams((cp, shuffle.features), name="to_out")()
        F = shuffle.features
        wb = jnp.zeros((C, div * F), w.dtype)
        for o in range(div):  # channel ci = cp_i*div + o -> out col o*F+f
            wb = wb.at[o::div, o * F : (o + 1) * F].set(w)
        y = jnp.dot(
            x.astype(shuffle.dtype), wb.astype(shuffle.dtype),
            preferred_element_type=jnp.float32,
        ).astype(shuffle.dtype)
        y = y + jnp.tile(b.astype(shuffle.dtype), div)
        y = y.reshape(B, X, Y, Z, f0, f1, f2, F)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        y = y.reshape(B, X * f0, Y * f1, Z * f2, F)
        return fold_z(y) if shuffle.fold_out else y
    return None
