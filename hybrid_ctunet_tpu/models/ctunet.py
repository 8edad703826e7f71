"""CTUNet — jointly-trained dual branch: the TUNet ViT pyramid and the CUNet
ResNet encoder, fused per decoder level by binary cross-weight pixelweight
attention (capability match for reference CTUNet, hybrid_CTUNet.py:694-857).

Forward contract (channels-last):
  returns ((res_logits, res_logits_48x48, res_logits_24x24),
           (vit_logits, vit_96x96))
with the 6x6x12-level fusion intentionally absent (the reference comments it
out, hybrid_CTUNet.py:844-845). ~174.80 M params at depth 101 / pf=8
(SURVEY.md §2.2, verified).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .. import flags
from ..ops.conv import unfold_z
from .layers import UnetOutHead, Up2FusionBlock, UpConvBlock
from .resnet3d import ResNet3D
from .tunet import TUNetCore

DIMS = (128, 256, 512, 1024)
DS_STRIDE = ((2, 2, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))


class CTUNet(nn.Module):
    out_channels: int = 14
    model_depth: int = 101
    dim_conv_stem: int = 64
    img_size: Tuple[int, int] = (96, 96)
    frames: int = 96
    patch_frame: int = 8
    hidden_size: int = 768
    num_depths: int = 12
    mlp_dim: int = 3072
    num_heads: int = 12
    dropout_rate: float = 0.0
    window: int = 6
    dtype: jnp.dtype = jnp.float32
    norm_name: str = "instance"  # --norm_name conv-block dispatch

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        vit_logits, vit_96, pyramid = TUNetCore(
            out_channels=self.out_channels,
            dim_conv_stem=self.dim_conv_stem,
            img_size=self.img_size,
            frames=self.frames,
            patch_frame=self.patch_frame,
            hidden_size=self.hidden_size,
            num_depths=self.num_depths,
            mlp_dim=self.mlp_dim,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            window=self.window,
            dtype=self.dtype,
            norm_name=self.norm_name,
            name="core",
        )(x, deterministic=deterministic)
        # pyramid: [768@6x6x12, 512@12x12x24, 256@24x24x48, 128@48x48x96, 64@full]
        vit_12, vit_24, vit_48 = pyramid[1], pyramid[2], pyramid[3]

        nrm = self.norm_name
        enc1, enc2, enc3, enc4 = ResNet3D(
            self.model_depth, DS_STRIDE, dtype=self.dtype, norm=nrm, name="convnet"
        )(x)

        dec3 = Up2FusionBlock(DIMS[2], DS_STRIDE[3], dtype=self.dtype, norm=nrm, name="res_decoder3")(
            enc4, enc3, vit_12
        )
        dec2 = Up2FusionBlock(DIMS[1], DS_STRIDE[2], dtype=self.dtype, norm=nrm, name="res_decoder2")(
            dec3, enc2, vit_24
        )
        dec1 = Up2FusionBlock(DIMS[0], DS_STRIDE[1], dtype=self.dtype, norm=nrm, name="res_decoder1")(
            dec2, enc1, vit_48
        )
        # FOLD96 (see tunet.py): res_decoder0's full-res ResBlock emits the
        # fold_z layout and the head consumes it folded — the boundary
        # unfold moves to the 14-channel logits (4.6x less data).
        fold96 = flags.FOLD96 == "1" and x.shape[3] % 2 == 0
        res_out = UpConvBlock(
            64, DS_STRIDE[0], dtype=self.dtype, fold_out=fold96, norm=nrm,
            name="res_decoder0",
        )(dec1)

        res_logits = UnetOutHead(self.out_channels, dtype=self.dtype, name="res_out")(
            res_out, folded=fold96
        )
        if fold96:
            res_logits = unfold_z(res_logits)
        res_48 = UnetOutHead(self.out_channels, dtype=self.dtype, name="res_out_48x48")(dec1)
        res_24 = UnetOutHead(self.out_channels, dtype=self.dtype, name="res_out_24x24")(dec2)

        return ((res_logits, res_48, res_24), (vit_logits, vit_96))
