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
from ..ops.conv import fold_z, unfold_z
from ..ops.norm import (
    instance_norm,
    instance_norm_folded,
    instance_norm_leaky,
    instance_norm_leaky_folded,
)
from .layers import Conv3d, maybe_remat

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
        out = instance_norm_leaky(out)
        out = Conv3d(self.planes, 3, stride, dtype=self.dtype, name="conv2")(out)
        out = instance_norm_leaky(out)
        out = Conv3d(cout, 1, 1, dtype=self.dtype, name="conv3")(out)
        out = instance_norm(out)

        residual = x
        if any(s != 1 for s in stride) or cin != cout:
            residual = Conv3d(cout, 1, stride, dtype=self.dtype, name="downsample_conv")(x)
            residual = instance_norm(residual)
        return leaky_relu(out + residual)


class _ScanBottleneck(nn.Module):
    """scan-compatible identity-shape bottleneck: (carry, _) -> (carry, None)."""

    planes: int
    folded: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, _):
        return Bottleneck(
            self.planes, 1, folded=self.folded, dtype=self.dtype, name="block"
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
        h = instance_norm_leaky(h)
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
            fold_ok = flags.ZFOLD == "1" and planes <= flags.ZFOLD_CH and factor > 1
            folded = factor if (
                fold_ok and s3 == (1, 1, 1) and h.shape[3] % factor == 0
            ) else 0
            if folded:
                h = fold_z(h, folded)
            h = Bottleneck(
                planes, stride, folded=folded, dtype=self.dtype,
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
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=blocks - 1,
                    metadata_params={nn.PARTITION_NAME: None},
                )
                h, _ = Tail(
                    planes, folded=tail_folded, dtype=self.dtype,
                    name=f"layer{stage + 1}_tail",
                )(h, None)
            else:
                for b in range(1, blocks):
                    h = Bottleneck(
                        planes, 1, folded=tail_folded, dtype=self.dtype,
                        name=f"layer{stage + 1}_block{b}",
                    )(h)
            if tail_folded:
                h = unfold_z(h, tail_folded)
            features.append(h)
            if upto is not None and upto == stage + 1:
                return features
        return features
