"""3D bottleneck ResNet encoder (channels-last, InstanceNorm, LeakyReLU 0.01).

Capability match for the reference encoder (networks/resnet.py:82-245):
- non-standard layer counts: 50=[3,4,6,3], 101=[8,9,13,3], 152=[8,9,30,3],
  200=[8,25,30,3];
- block_inplanes [32,64,128,256] with expansion 4 -> stage widths
  [128,256,512,1024];
- 7x7x7 stem at anisotropic stride DS_stride[0]=(2,2,1), stem width 64,
  no max pool (reference no_max_pool=True default);
- stage strides DS_stride[1:]; 1x1x1 projection ('B') shortcuts;
- returns all four stage feature maps.

At 96^3 input the stage outputs are 128@48x48x96, 256@24x24x48,
512@12x12x24, 1024@6x6x12 (SURVEY.md §2.2, verified).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .. import flags
from ..ops.act import leaky_relu
from ..ops.conv import (
    fold_z,
    odd_edge_mask,
    shift_fold_a2s,
    shift_fold_s2a,
    unfold_z,
)
from ..ops.norm import (
    instance_norm,
    instance_norm_folded,
    instance_norm_leaky,
    instance_norm_leaky_folded,
)
from .layers import Conv3d, apply_norm, maybe_remat

LAYER_COUNTS = {
    50: (3, 4, 6, 3),
    101: (8, 9, 13, 3),
    152: (8, 9, 30, 3),
    200: (8, 25, 30, 3),
}

BLOCK_INPLANES = (32, 64, 128, 256)
EXPANSION = 4


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) bottleneck with IN + LeakyReLU
    (reference resnet.py:82-126).

    ``folded`` (stride-1 only; an int fold factor, 0/False = off): the block
    runs entirely in the z-folded layout (ops/conv.py fold_z — input carries
    factor*cin channels), multiplying the MXU lane width of the lane-starved
    planes=32 stage. Identical math and parameter tree; the caller
    folds/unfolds once per stage."""

    planes: int
    stride: Sequence[int] | int = 1
    folded: int = 0
    dtype: jnp.dtype = jnp.float32
    norm: str = "instance"  # --norm_name dispatch; "batch" disables folding

    @nn.compact
    def __call__(self, x):
        cout = self.planes * EXPANSION
        stride = (self.stride,) * 3 if isinstance(self.stride, int) else tuple(self.stride)

        if self.folded:
            assert stride == (1, 1, 1)
            ff = int(self.folded)
            cin = x.shape[-1] // ff
            out = Conv3d(self.planes, 1, 1, dtype=self.dtype, name="conv1")(x, folded=ff)
            out = instance_norm_leaky_folded(out, factor=ff)
            out = Conv3d(self.planes, 3, 1, dtype=self.dtype, name="conv2")(out, folded=ff)
            out = instance_norm_leaky_folded(out, factor=ff)
            out = Conv3d(cout, 1, 1, dtype=self.dtype, name="conv3")(out, folded=ff)
            out = instance_norm_folded(out, factor=ff)
            residual = x
            if cin != cout:
                residual = Conv3d(cout, 1, 1, dtype=self.dtype,
                                  name="downsample_conv")(x, folded=ff)
                residual = instance_norm_folded(residual, factor=ff)
            return leaky_relu(out + residual)

        cin = x.shape[-1]
        out = Conv3d(self.planes, 1, 1, dtype=self.dtype, name="conv1")(x)
        out = apply_norm(self.norm, out, act=True, name="norm1")
        out = Conv3d(self.planes, 3, stride, dtype=self.dtype, name="conv2")(out)
        out = apply_norm(self.norm, out, act=True, name="norm2")
        out = Conv3d(cout, 1, 1, dtype=self.dtype, name="conv3")(out)
        out = apply_norm(self.norm, out, name="norm3")

        residual = x
        if any(s != 1 for s in stride) or cin != cout:
            residual = Conv3d(cout, 1, stride, dtype=self.dtype, name="downsample_conv")(x)
            residual = apply_norm(self.norm, residual, name="downsample_norm")
        return leaky_relu(out + residual)


class _ShiftBottleneck(nn.Module):
    """Stride-1 bottleneck in the ALTFOLD4 alternating shifted z-fold chain.

    ``direction="a2s"``: aligned fold input (B,X,Y,Zf,f*cin) -> shifted
    output (B,X,Y,Zf+1,f*cout); ``"s2a"``: shifted -> aligned. conv2 runs as
    the (3,3,2) half-fold-shifted kernel (ops/conv.py altfold_kernel,
    factor 4: 12/32 live blocks = 37.5% useful MACs vs 25% for the aligned
    factor-4 fold — measured 2.91 -> 2.40 ms standalone on the stage-1 conv2
    shape, tools/probe_altfold4.py); conv1/conv3 stay block-diagonal in
    either grouping (a 1x1 maps each plane independently). The residual
    re-groups via shift_fold_a2s/s2a — slice+pad+concat reads that fuse into
    the residual-add epilogue. Shifted tensors carry ZERO in their two
    virtual edge half-slots (they stand in for conv z-padding): masked
    folded-IN statistics (count override) keep them out of the moments and
    re-zero them after the affine. Param tree identical to ``Bottleneck``
    (instance norm only — ALTFOLD4 is gated off for --norm_name batch)."""

    planes: int
    direction: str  # "a2s" | "s2a"
    factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        cout = self.planes * EXPANSION
        cin = x.shape[-1] // f
        a2s = self.direction == "a2s"
        shifted_in = not a2s
        zf = x.shape[3] - (1 if shifted_in else 0)
        n_vox = x.shape[1] * x.shape[2] * zf * f  # true voxels per channel

        def norm(t, shifted: bool, act: bool):
            kw = {}
            if shifted:
                kw = dict(
                    count=n_vox,
                    mask=odd_edge_mask(t.shape[3], t.shape[4], jnp.float32)[
                        None, None, None
                    ],
                )
            fn = instance_norm_leaky_folded if act else instance_norm_folded
            return fn(t, factor=f, **kw)

        out = Conv3d(self.planes, 1, 1, dtype=self.dtype, name="conv1")(x, folded=f)
        out = norm(out, shifted_in, act=True)
        out = Conv3d(self.planes, 3, 1, dtype=self.dtype, name="conv2")(
            out, altfold=("a2o" if a2s else "o2a"), altfold_factor=f
        )
        out = norm(out, a2s, act=True)
        out = Conv3d(cout, 1, 1, dtype=self.dtype, name="conv3")(out, folded=f)
        out = norm(out, a2s, act=False)

        residual = x
        if cin != cout:
            residual = Conv3d(cout, 1, 1, dtype=self.dtype, name="downsample_conv")(
                x, folded=f
            )
            residual = norm(residual, shifted_in, act=False)
        # re-group the residual to the output's layout; virtual edge planes
        # arrive as zeros from the pad, matching the masked-out output slots
        residual = shift_fold_a2s(residual) if a2s else shift_fold_s2a(residual)
        return leaky_relu(out + residual)


class _ScanShiftPair(nn.Module):
    """scan body for the ALTFOLD4 tail: (shifted carry) -> s2a block ->
    a2s block -> (shifted carry)."""

    planes: int
    factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, _):
        h = _ShiftBottleneck(self.planes, "s2a", self.factor, self.dtype,
                             name="block_s2a")(h)
        h = _ShiftBottleneck(self.planes, "a2s", self.factor, self.dtype,
                             name="block_a2s")(h)
        return h, None


class _ScanBottleneck(nn.Module):
    """scan-compatible identity-shape bottleneck: (carry, _) -> (carry, None)."""

    planes: int
    folded: int = 0
    dtype: jnp.dtype = jnp.float32
    norm: str = "instance"

    @nn.compact
    def __call__(self, h, _):
        return Bottleneck(
            self.planes, 1, folded=self.folded, dtype=self.dtype, norm=self.norm,
            name="block"
        )(h), None


class ResNet3D(nn.Module):
    """Four-stage bottleneck encoder returning the stage pyramid.

    ``scan_blocks``: each stage's identical tail blocks (stride 1, no
    projection — e.g. 29 of 33 blocks at depth 101) run under one
    ``nn.scan`` with depth-stacked params, shrinking trace/compile time
    several-fold with identical math."""

    model_depth: int = 50
    ds_stride: Tuple[Tuple[int, int, int], ...] = ((2, 2, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    conv1_t_size: int = 7
    in_stem: int = 64
    scan_blocks: bool = True
    dtype: jnp.dtype = jnp.float32
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, upto: int | None = None):
        """Forward. ``upto`` (static; profiling only — tools/profile_encoder.py)
        truncates the network: 0 = stem only, k = through stage k."""
        if self.model_depth not in LAYER_COUNTS:
            raise ValueError(
                f"model_depth must be one of {sorted(LAYER_COUNTS)}, got {self.model_depth}"
            )
        layers = LAYER_COUNTS[self.model_depth]

        h = Conv3d(
            self.in_stem, (7, 7, self.conv1_t_size), self.ds_stride[0], dtype=self.dtype,
            name="conv1",
        )(x)
        h = apply_norm(self.norm, h, act=True, name="norm1")
        if upto == 0:
            return [h]

        features = []
        stage_strides = (1, self.ds_stride[1], self.ds_stride[2], self.ds_stride[3])
        for stage, (planes, blocks, stride) in enumerate(
            zip(BLOCK_INPLANES, layers, stage_strides)
        ):
            s3 = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
            # z-folded stage: lane-starved widths (planes <= ZFOLD_CH) run
            # their stride-1 blocks in the z-folded layout — fold/unfold are
            # free contiguous reshapes amortized over the whole stage;
            # 76.4 -> 52.6 ms measured on the 8-block stage-1 chain at
            # factor 2 (tools/probe_folded_stage.py). The factor folds the
            # 3^3 conv's lane-starved side up to 128 lanes (stage-1
            # planes=32 -> 4, stage-2 planes=64 -> 2), capped by
            # ZFOLD_FACTOR. Identical math and params. When block0 strides
            # (stages 2-4) it runs unfolded and only the stride-1 tail is
            # folded (round-5 per-stage attribution, tools/profile_encoder.py:
            # layer2's 8 tail blocks were the last unfolded C=64 conv pool).
            factor = max(1, min(flags.ZFOLD_FACTOR, 128 // planes))
            fold_ok = (
                flags.ZFOLD == "1" and planes <= flags.ZFOLD_CH and factor > 1
                and self.norm == "instance"  # folded IN is instance semantics
            )
            folded = factor if (
                fold_ok and s3 == (1, 1, 1) and h.shape[3] % factor == 0
            ) else 0
            if folded:
                h = fold_z(h, folded)
            if folded == 4 and flags.ALTFOLD4 == "1" and blocks % 2 == 0:
                # alternating shifted-quad chain (see _ShiftBottleneck):
                # a2s block0, (blocks-2)/2 scanned (s2a, a2s) pairs, final
                # s2a — even block count returns the stage to the aligned
                # fold, so stage I/O is unchanged. NOTE the tail param tree
                # differs from the standard stacked layerN_tail (pairs stack
                # on (blocks-2)/2); checkpoints are layout-specific.
                h = _ShiftBottleneck(
                    planes, "a2s", folded, self.dtype,
                    name=f"layer{stage + 1}_block0",
                )(h)
                n_pairs = (blocks - 2) // 2
                if n_pairs > 0:
                    if self.scan_blocks:
                        Pair = nn.scan(
                            maybe_remat(_ScanShiftPair),
                            variable_axes={"params": 0},
                            split_rngs={"params": True},
                            length=n_pairs,
                            metadata_params={nn.PARTITION_NAME: None},
                        )
                        h, _ = Pair(
                            planes, folded, self.dtype,
                            name=f"layer{stage + 1}_ptail",
                        )(h, None)
                    else:
                        for b in range(n_pairs):
                            h = _ShiftBottleneck(
                                planes, "s2a", folded, self.dtype,
                                name=f"layer{stage + 1}_pair{b}_s2a")(h)
                            h = _ShiftBottleneck(
                                planes, "a2s", folded, self.dtype,
                                name=f"layer{stage + 1}_pair{b}_a2s")(h)
                h = _ShiftBottleneck(
                    planes, "s2a", folded, self.dtype,
                    name=f"layer{stage + 1}_blockF",
                )(h)
                h = unfold_z(h, folded)
                features.append(h)
                if upto is not None and upto == stage + 1:
                    return features
                continue
            h = Bottleneck(
                planes, stride, folded=folded, dtype=self.dtype, norm=self.norm,
                name=f"layer{stage + 1}_block0",
            )(h)
            tail_folded = folded
            if not folded and fold_ok and blocks > 1 and h.shape[3] % factor == 0:
                tail_folded = factor
                h = fold_z(h, factor)
            if self.scan_blocks and blocks > 1:
                # remat-scan: recompute each tail block in the backward pass
                # instead of saving its intermediates (96^3-scale activations
                # OOM 16G HBM otherwise); free for inference.
                Tail = nn.scan(
                    maybe_remat(_ScanBottleneck),
                    variable_axes={"params": 0, "batch_stats": 0},
                    split_rngs={"params": True},
                    length=blocks - 1,
                    metadata_params={nn.PARTITION_NAME: None},
                )
                h, _ = Tail(
                    planes, folded=tail_folded, dtype=self.dtype, norm=self.norm,
                    name=f"layer{stage + 1}_tail",
                )(h, None)
            else:
                for b in range(1, blocks):
                    h = Bottleneck(
                        planes, 1, folded=tail_folded, dtype=self.dtype, norm=self.norm,
                        name=f"layer{stage + 1}_block{b}",
                    )(h)
            if tail_folded:
                h = unfold_z(h, tail_folded)
            features.append(h)
            if upto is not None and upto == stage + 1:
                return features
        return features
