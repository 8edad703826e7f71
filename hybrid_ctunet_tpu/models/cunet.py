"""CUNet — pure-CNN 3D U-Net: ResNet bottleneck encoder + UpCat decoder with
deep supervision (capability match for reference CUNet,
hybrid_CTUNet.py:859-937).

Returns (res_logits@full, res_logits@48x48x96, res_logits@24x24x48) in
channels-last. ~50.78 M params at depth 101 (SURVEY.md §2.2, verified).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import UnetOutHead, UpCatConvBlock, UpConvBlock
from .resnet3d import ResNet3D

DIMS = (128, 256, 512, 1024)
DS_STRIDE = ((2, 2, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))


class CUNet(nn.Module):
    out_channels: int = 14
    model_depth: int = 101
    dtype: jnp.dtype = jnp.float32
    # --norm_name: "instance" (reference default) | "batch" | "batch:AXIS"
    # (SyncBatchNorm over that mesh axis; reference main_C_TUNet.py:193-194)
    norm_name: str = "instance"

    @nn.compact
    def __call__(self, x):
        nrm = self.norm_name
        enc1, enc2, enc3, enc4 = ResNet3D(
            self.model_depth, DS_STRIDE, dtype=self.dtype, norm=nrm, name="convnet"
        )(x)

        dec3 = UpCatConvBlock(DIMS[2], DS_STRIDE[3], dtype=self.dtype, norm=nrm, name="res_decoder3")(enc4, enc3)
        dec2 = UpCatConvBlock(DIMS[1], DS_STRIDE[2], dtype=self.dtype, norm=nrm, name="res_decoder2")(dec3, enc2)
        dec1 = UpCatConvBlock(DIMS[0], DS_STRIDE[1], dtype=self.dtype, norm=nrm, name="res_decoder1")(dec2, enc1)
        out = UpConvBlock(64, DS_STRIDE[0], dtype=self.dtype, norm=nrm, name="res_decoder0")(dec1)

        logits = UnetOutHead(self.out_channels, dtype=self.dtype, name="res_out")(out)
        logits48 = UnetOutHead(self.out_channels, dtype=self.dtype, name="res_out_48x48")(dec1)
        logits24 = UnetOutHead(self.out_channels, dtype=self.dtype, name="res_out_24x24")(dec2)
        return (logits, logits48, logits24)
