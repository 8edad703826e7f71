"""TUNet conv-free attention decoder (reference UpAttentionBlock,
hybrid_CTUNet.py:528-591).

Four stages walk the dim chain (hidden, 512, 256, 128, 64). Stages 0-2 run
residual block-window attention + FFN, then residual grid-window attention +
FFN (window 6, 3D rel-pos bias), then pixel-shuffle upsampling; stage 3
(full-res, window attention would be 96^3-global) runs two residual FFNs +
pixel shuffle. Returns the 5-level feature pyramid
[hidden@6x6x12, 512@12x12x24, 256@24x24x48, 128@48x48x96, 64@96x96x96].
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .. import flags
from ..ops import ffn_pallas
from .layers import (
    FeedForward, FeedForwardParams, MultiAxisWindowAttention,
    PixelShuffleLinear, _pallas_ffn_enabled,
)


class UpAttentionBlock(nn.Module):
    in_channels: int = 768
    dims: Tuple[int, ...] = (128, 256, 512, 1024)  # resnet stage dims; only ordering is used
    ds_stride: Tuple[Tuple[int, int, int], ...] = ((2, 2, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    window: int = 6
    dropout: float = 0.0  # reaches every attention + FFN (hybrid_CTUNet.py:560-576)
    dtype: jnp.dtype = jnp.float32
    # fold_last: the final (full-res) stage's pixel shuffle emits the fold_z
    # layout directly (see PixelShuffleLinear.fold_out) — pyramid[-1] is then
    # (B, X, Y, Z/2, 128) instead of (B, X, Y, Z, 64); earlier levels are
    # unchanged. Exact math, same parameter tree.
    fold_last: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # Reference dim chain: (in_channels, *dims[::-1][1:], 64) with
        # dims=(128,256,512,1024) -> (768, 512, 256, 128, 64)  (hybrid_CTUNet.py:546)
        chain = (self.in_channels, *[d for d in self.dims[::-1][1:]], 64)
        factors = self.ds_stride[::-1]  # ((2,2,2),(2,2,2),(2,2,2),(2,2,1))
        dr = self.dropout

        features = [x]
        for ind, (dim_in, dim_out) in enumerate(zip(chain[:-1], chain[1:])):
            if ind <= 2:
                x = x + MultiAxisWindowAttention(
                    window=self.window, grid=False, dropout=dr, dtype=self.dtype,
                    name=f"stage{ind}_block_attn",
                )(x, deterministic=deterministic)
                x = FeedForward(dropout=dr, residual=True, dtype=self.dtype,
                                name=f"stage{ind}_block_ff")(
                    x, deterministic=deterministic
                )
                x = x + MultiAxisWindowAttention(
                    window=self.window, grid=True, dropout=dr, dtype=self.dtype,
                    name=f"stage{ind}_grid_attn",
                )(x, deterministic=deterministic)
                x = FeedForward(dropout=dr, residual=True, dtype=self.dtype,
                                name=f"stage{ind}_grid_ff")(
                    x, deterministic=deterministic
                )
            else:
                n_rows = 1
                for s in x.shape[:-1]:
                    n_rows *= s
                inner = int(dim_in * 4)
                pair_fused = (
                    flags.PALLAS_FFN_PAIR == "1"
                    and _pallas_ffn_enabled()
                    and (dr == 0.0 or deterministic)
                    and ffn_pallas.supports(n_rows, dim_in, inner, self.dtype)
                )
                if pair_fused:
                    # both residual FFNs in one Pallas kernel; identical
                    # parameter tree to the two FeedForward modules below
                    p1 = FeedForwardParams(dim_in, inner, name=f"stage{ind}_ff1")()
                    p2 = FeedForwardParams(dim_in, inner, name=f"stage{ind}_ff2")()
                    x = ffn_pallas.fused_ffn_pair(x, p1, p2, dtype=self.dtype)
                else:
                    x = FeedForward(dropout=dr, residual=True, dtype=self.dtype,
                                    name=f"stage{ind}_ff1")(
                        x, deterministic=deterministic
                    )
                    x = FeedForward(dropout=dr, residual=True, dtype=self.dtype,
                                    name=f"stage{ind}_ff2")(
                        x, deterministic=deterministic
                    )
            x = PixelShuffleLinear(
                tuple(factors[ind]), dim_out, dtype=self.dtype,
                fold_out=self.fold_last and ind == len(factors) - 1,
                name=f"stage{ind}_shuffle",
            )(x)
            features.append(x)
        return features
