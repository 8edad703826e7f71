"""TUNet — transformer U-Net: 3D ViT encoder + attention/pixel-shuffle decoder
+ full-res conv stem (capability match for reference TUNet,
hybrid_CTUNet.py:939-1036).

Returns (vit_logits@full, vit_96 per-voxel-linear logits@full) channels-last.
~109.90 M params at pf=8 (ViT 86.94 M + decoder 22.51 M; SURVEY.md §2.2).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .. import flags
from ..ops.conv import fold_z, unfold_z
from .decoder_attention import UpAttentionBlock
from .layers import CatConvBlock, Dense, ResBlock, UnetOutHead, maybe_remat
from .vit3d import ViT3D

DIMS = (128, 256, 512, 1024)
DS_STRIDE = ((2, 2, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))


class TUNetCore(nn.Module):
    """Shared ViT branch used by TUNet and CTUNet: ViT -> token grid ->
    UpAttentionBlock pyramid; conv stem; fused full-res output + per-voxel
    linear head."""

    out_channels: int = 14
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
        B = x.shape[0]
        gh = self.img_size[0] // 16
        gw = self.img_size[1] // 16
        gf = self.frames // self.patch_frame

        tokens = ViT3D(
            image_size=self.img_size,
            frames=self.frames,
            image_patch_size=16,
            frame_patch_size=self.patch_frame,
            dim=self.hidden_size,
            depth=self.num_depths,
            heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout_rate,
            dtype=self.dtype,
            name="vit",
        )(x, deterministic=deterministic)

        # proj_feat (reference hybrid_CTUNet.py:812-815): tokens (h w f) -> grid
        grid = tokens.reshape(B, gh, gw, gf, self.hidden_size)

        # FOLD96: the whole full-res C=64 region (stage-3 shuffle -> stem
        # ResBlock -> CatConvBlock -> heads) runs in the fold_z layout so
        # each block boundary's unfold/fold pair cancels instead of costing
        # a layout copy (device trace: ~12 ms/chunk of 306-536 GB/s reshapes
        # around decoder0 + 2x ~3.2 ms for the pyramid[-1] fold itself).
        # Exact reordering; parameter tree unchanged.
        fold96 = flags.FOLD96 == "1" and x.shape[3] % 2 == 0
        # FOLD96_LAST: the stage-3 shuffle can emit the folded layout itself
        # (block-diag per-voxel Dense) instead of a separate fold_z copy —
        # measured LOSS (~32 ms/chunk TUNet, see flags.py); default off.
        fold_last = fold96 and flags.FOLD96_LAST == "1"

        pyramid = UpAttentionBlock(
            in_channels=self.hidden_size, dims=DIMS, ds_stride=DS_STRIDE,
            window=self.window, dropout=self.dropout_rate, dtype=self.dtype,
            fold_last=fold_last, name="vit_encoder",
        )(grid, deterministic=deterministic)

        stem = maybe_remat(ResBlock)(
            self.dim_conv_stem, 3, 1, dtype=self.dtype, fold_out=fold96,
            norm=self.norm_name, name="vit_encoder0",
        )(x)
        p_last = pyramid[-1] if fold_last or not fold96 else fold_z(pyramid[-1])
        fused = CatConvBlock(
            self.dim_conv_stem, dtype=self.dtype, fold_in=fold96,
            fold_out=fold96, norm=self.norm_name, name="vit_decoder0",
        )(p_last, stem)
        vit_logits = UnetOutHead(self.out_channels, dtype=self.dtype, name="vit_out")(
            fused, folded=fold96
        )

        # DecoderLinear with patch_size=1 (reference hybrid_CTUNet.py:671-691):
        # a per-voxel linear classifier on the full-res pyramid level.
        vit_96 = Dense(self.out_channels, dtype=self.dtype, name="decoder_linear_96x96")(
            p_last, folded=fold96
        )
        if fold96:
            vit_logits = unfold_z(vit_logits)
            vit_96 = unfold_z(vit_96)

        return vit_logits, vit_96, pyramid


class TUNet(nn.Module):
    out_channels: int = 14
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
    norm_name: str = "instance"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        vit_logits, vit_96, _ = TUNetCore(
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
        return (vit_logits, vit_96)
