"""3D ViT encoder: volumetric patch tokenization, learned position embedding,
pre-norm transformer blocks (capability match for reference networks/vit.py).

Reference behaviors kept:
- patch grid (X/16, Y/16, Z/pf) with token order (h w f) and patch content
  order (p1 p2 pf c) (vit.py:114-119);
- LN -> Linear -> LN patch embedding; no CLS token; learned pos-embedding
  of shape (1, N, dim) initialized ~N(0,1) (vit.py:121);
- pre-norm blocks: x = attn(x) + x; x = ff(x) + x — the reference's *active*
  forward bypasses DropPath (vit.py:93-96), so none is built here;
- MHSA: heads=12, dim_head=64, qkv bias-free, projecting out with bias
  (vit.py:46-78).

At 96^3 / pf=8: 432 tokens, patch_dim 2048. The full-sequence attention is a
432x432 matmul — MXU-friendly as-is; windowing is unnecessary at this size.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import flags
from .layers import (
    Dense, FeedForward, LayerNorm, _DenseBiasParams, _LNParams, maybe_remat,
)


class ViTAttention(nn.Module):
    """Pre-norm MHSA. Dropout sites match reference vit.py:46-78: on the
    softmaxed attention weights (:73-74) and on the output projection
    (:60-63, to_out = Linear -> Dropout) — training only."""

    heads: int = 12
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, N, C = x.shape
        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5
        drop = self.dropout > 0.0 and not deterministic

        h = LayerNorm(name="norm")(x)
        qkv = Dense(3 * inner, use_bias=False, dtype=self.dtype, name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        sim = jnp.einsum("bhid,bhjd->bhij", q * scale, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        if drop:
            attn = nn.Dropout(self.dropout, name="drop_attn")(attn, deterministic=False)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, N, inner)
        if not (self.heads == 1 and self.dim_head == C):
            out = Dense(C, dtype=self.dtype, name="to_out")(out)
            if drop:
                out = nn.Dropout(self.dropout, name="drop_out")(out, deterministic=False)
        return out


class TransformerBlock(nn.Module):
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = ViTAttention(
            self.heads, self.dim_head, dropout=self.dropout, dtype=self.dtype, name="attn"
        )(x, deterministic=deterministic) + x
        x = FeedForward(
            hidden_dim=self.mlp_dim, dropout=self.dropout, residual=True,
            dtype=self.dtype, name="ff"
        )(x, deterministic=deterministic)
        return x


class _ScanBlock(nn.Module):
    """scan-compatible wrapper: (carry, _) -> (carry, None).
    ``deterministic`` is a module attribute (not a call arg) to keep the
    scan body signature (carry, xs)."""

    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        x = ViTAttention(
            self.heads, self.dim_head, dropout=self.dropout, dtype=self.dtype, name="attn"
        )(x, deterministic=self.deterministic) + x
        x = FeedForward(
            hidden_dim=self.mlp_dim, dropout=self.dropout, residual=True,
            dtype=self.dtype, name="ff"
        )(x, deterministic=self.deterministic)
        return x, None


class ViT3D(nn.Module):
    """Volumetric ViT over channels-last input (B, X, Y, Z, C)."""

    image_size: Tuple[int, int] = (96, 96)
    frames: int = 96
    image_patch_size: int = 16
    frame_patch_size: int = 8
    dim: int = 768
    depth: int = 12
    heads: int = 12
    dim_head: int = 64
    mlp_dim: int = 3072
    dropout: float = 0.0
    scan_layers: bool = True  # lax.scan over the depth: one traced block
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, X, Y, Z, C = x.shape
        p1 = p2 = self.image_patch_size
        pf = self.frame_patch_size
        if X % p1 or Y % p2 or Z % pf:
            raise ValueError(
                f"volume {(X, Y, Z)} not divisible by patch size {(p1, p2, pf)}"
            )
        gh, gw, gf = X // p1, Y // p2, Z // pf
        patch_dim = C * p1 * p2 * pf

        if flags.VIT_PATCH_FOLD == "1":
            # Fold patch_norm1 + patch_proj into a strided conv + patch-moment
            # pools: LN(t) @ W = (t @ (g ⊙ W)) / σ − (μ/σ)(g·W) + β·W, with
            # t @ (g⊙W) computed directly from the volume as a stride=patch
            # VALID conv (no materialized (B, N, patch_dim) tensor, no 8-D
            # transpose, no fp32 re-casts of the token matrix) and μ, σ from
            # sum / sum-of-squares reduce_windows over each patch block.
            # Same parameter tree; reassociated fp32 math (not bit-exact).
            g1, be1 = _LNParams(patch_dim, name="patch_norm1")()
            wP, bP = _DenseBiasParams((patch_dim, self.dim), name="patch_proj")()
            win = (1, p1, p2, pf, C)
            xf = x.astype(jnp.float32)
            s1 = jax.lax.reduce_window(xf, 0.0, jax.lax.add, win, win, "VALID")
            s2 = jax.lax.reduce_window(xf * xf, 0.0, jax.lax.add, win, win, "VALID")
            mu = s1 / float(patch_dim)
            # E[x^2] - mu^2 can go slightly negative via fp32 cancellation
            var = jnp.maximum(s2 / float(patch_dim) - mu * mu, 0.0)
            inv = jax.lax.rsqrt(var + 1e-5)  # (B, gh, gw, gf, 1); LN eps
            # t's feature order is (p1, p2, pf, c) — matches DHWIO with
            # spatial (X, Y, Z)
            wFold = (g1[:, None] * wP).reshape(p1, p2, pf, C, self.dim)
            # conv OUTPUT stays in self.dtype: an fp32 output with bf16
            # operands breaks the conv VJP under bf16 training (mixed-dtype
            # cotangent — see the Conv3d note in layers.py); fp32 MXU
            # accumulation is internal either way, and the downstream
            # (y - mu ...) arithmetic promotes to fp32 via mu/inv.
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wFold.astype(self.dtype), (p1, p2, pf),
                "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            z = (y - mu * jnp.dot(g1, wP)) * inv + jnp.dot(be1, wP)
            t = z.astype(self.dtype).reshape(B, gh * gw * gf, self.dim)
            t = t + bP.astype(self.dtype)
            t = LayerNorm(name="patch_norm2")(t)
        else:
            # (h p1)(w p2)(f pf) c -> tokens (h w f) x features (p1 p2 pf c)
            t = x.reshape(B, gh, p1, gw, p2, gf, pf, C)
            t = t.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, gh * gw * gf, patch_dim)

            t = LayerNorm(name="patch_norm1")(t.astype(self.dtype))
            t = Dense(self.dim, dtype=self.dtype, name="patch_proj")(t)
            t = LayerNorm(name="patch_norm2")(t)

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, gh * gw * gf, self.dim), jnp.float32
        )
        t = t + pos.astype(self.dtype)
        if self.dropout > 0.0:
            t = nn.Dropout(self.dropout)(t, deterministic=deterministic)

        if self.scan_layers:
            # One compiled block body for all `depth` layers (params stacked
            # on a leading axis) — cuts trace/compile time ~depth-fold, which
            # matters for the 174M CTUNet sliding-window program.
            Blocks = nn.scan(
                maybe_remat(_ScanBlock),
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
                metadata_params={nn.PARTITION_NAME: None},
            )
            t, _ = Blocks(
                self.heads, self.dim_head, self.mlp_dim,
                dropout=self.dropout, deterministic=deterministic,
                dtype=self.dtype, name="blocks",
            )(t, None)
        else:
            for i in range(self.depth):
                t = TransformerBlock(
                    self.heads, self.dim_head, self.mlp_dim,
                    dropout=self.dropout, dtype=self.dtype, name=f"block{i}"
                )(t, deterministic=deterministic)
        return t  # (B, N, dim), token order (h w f)
