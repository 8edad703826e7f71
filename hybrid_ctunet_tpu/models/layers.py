"""Parameterized layers (flax.linen), channels-last NDHWC.

These re-design the reference's torch modules TPU-first:

- convs carry MONAI SAME-padding arithmetic (reference networks/resnet.py:17-80)
  and run through XLA's native NDHWC conv path;
- every decoder transposed conv has kernel == stride and lowers to one MXU
  einsum + block interleave (see ops/conv.py);
- windowed multi-axis attention operates directly on the NDHWC tensor with
  static reshapes instead of einops-layer rearranges
  (reference networks/hybrid_CTUNet.py:442-511, 554-583);
- the binary cross-weight "pixelweight" fusion is an O(N·d) per-voxel op
  (reference networks/hybrid_CTUNet.py:622-669).

All params are fp32; ``dtype`` selects the activation/compute dtype
(bf16 for training — the TPU replacement for the reference's AMP).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import flags
from ..ops import attention_pallas, ffn_pallas, shuffle_pallas
from ..ops.act import gelu_exact, leaky_relu
from ..ops.conv import (
    conv3d_altfold_a2o,
    conv3d_altfold_o2a,
    conv3d_folded,
    conv3d_same,
    conv_transpose3d_same,
    fold_z,
    mask_odd_edges,
    odd_edge_mask,
    unfold_z,
)
from ..ops.norm import (
    TorchBatchNorm,
    instance_norm,
    instance_norm_folded,
    instance_norm_leaky,
    instance_norm_leaky_folded,
    layer_norm,
    stats_to_affine,
)


def apply_norm(norm_name: str, h, *, act: bool = False, name: str = "norm"):
    """Conv-path norm dispatch for ``--norm_name`` (reference threads it into
    every conv block: hybrid_CTUNet.py:85-87, resnet.py:97-101).

    ``"instance"``: the stateless affine-free InstanceNorm every README
    command uses — no parameters, so the default param tree is unchanged.
    ``"batch"`` / ``"batch:AXIS"``: TorchBatchNorm (params + batch_stats);
    the ``:AXIS`` suffix syncs batch moments over that mapped mesh axis
    (SyncBatchNorm under data-parallel training, main_C_TUNet.py:193-194).

    Must be called from inside an ``@nn.compact`` method — the batch module
    binds to the calling scope under ``name``."""
    if norm_name == "instance":
        return instance_norm_leaky(h) if act else instance_norm(h)
    base, _, axis = norm_name.partition(":")
    if base != "batch":
        raise ValueError(
            f"unsupported norm {norm_name!r}: expected 'instance', 'batch' "
            "or 'batch:<mesh-axis>'"
        )
    h = TorchBatchNorm(sync_axis=axis or None, name=name)(h)
    if act:
        from ..ops.act import leaky_relu

        return leaky_relu(h)
    return h


_REMAT_BLOCKS = True


def _pallas_enabled(env_suffix: str) -> bool:
    # flags are snapshotted at import (see flags.py) — flipping the env var
    # mid-process requires flags.refresh(), which also clears the jit cache
    # so stale compiled paths can't survive the flip.
    return (
        getattr(flags, f"PALLAS_{env_suffix}") == "1"
        and jax.devices()[0].platform == "tpu"
    )


def _pallas_ffn_enabled() -> bool:
    return _pallas_enabled("FFN")


def set_remat_blocks(enabled: bool) -> None:
    """Global switch for block-level rematerialization (read at trace time).
    Training needs it (96^3 backward OOMs 16G HBM otherwise); pure-inference
    processes can disable it to shave the remat primitive's forward overhead
    (bench.py and the test CLIs do)."""
    global _REMAT_BLOCKS
    _REMAT_BLOCKS = enabled


def maybe_remat(cls):
    return nn.remat(cls) if _REMAT_BLOCKS else cls


def _triple(v) -> Tuple[int, int, int]:
    return (v, v, v) if isinstance(v, int) else tuple(int(x) for x in v)  # type: ignore


class Conv3d(nn.Module):
    """SAME-padded 3D conv (bias optional; the reference's convs are bias-free
    except the 1x1x1 output heads)."""

    features: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, in_affine=None, in_act=False, emit_stats=False,
                 folded=False, altfold="", altfold_factor=2):
        k = _triple(self.kernel_size)
        # folded: x is in the z-folded layout (ops/conv.py fold_z) carrying
        # factor*cin channels (True == factor 2, or an int factor); the
        # parameter keeps its UNFOLDED shape (identical tree/checkpoints)
        # and the folded kernel is built at apply time.
        # altfold ("a2o"/"o2a"): alternating-parity fold conv — x is the
        # aligned/odd z-fold layout respectively; same unfolded parameter.
        ff = (2 if folded is True else int(folded)) if folded else 0
        cin = x.shape[-1] // (ff or altfold_factor) if (ff or altfold) else x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (*k, cin, self.features),
            jnp.float32,
        )
        if altfold:
            assert not self.use_bias and in_affine is None and not emit_stats
            assert _triple(self.stride) == (1, 1, 1) and k == (3, 3, 3)
            fn = conv3d_altfold_a2o if altfold == "a2o" else conv3d_altfold_o2a
            return fn(x.astype(self.dtype), w.astype(self.dtype),
                      preferred_dtype=self.dtype, factor=altfold_factor)
        if ff:
            assert in_affine is None and not emit_stats
            assert _triple(self.stride) == (1, 1, 1)
            y = conv3d_folded(
                x.astype(self.dtype), w.astype(self.dtype),
                preferred_dtype=self.dtype, factor=ff,
            )
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                # folded output channel s*F+f carries slot s of channel f
                y = y + jnp.tile(b.astype(self.dtype), ff)
            return y
        if in_affine is not None or emit_stats:
            # Winograd fused-IN chain (ops/winograd_pallas.py v2): the caller
            # (ResBlock) verified winograd_pallas.supports for this shape.
            from ..ops import winograd_pallas

            assert not self.use_bias
            return winograd_pallas.conv3x3_winograd_fused(
                x.astype(self.dtype), w.astype(self.dtype), in_affine,
                in_act=in_act, emit_stats=emit_stats,
                out_dtype=self.dtype,
                interpret=jax.devices()[0].platform != "tpu",
            )
        # preferred_dtype == compute dtype: the MXU accumulates bf16 convs in
        # fp32 internally regardless; requesting an fp32 OUTPUT breaks the
        # conv VJP under bf16 (mixed-dtype cotangent, jax conv grad rule).
        y = conv3d_same(x.astype(self.dtype), w.astype(self.dtype), self.stride,
                        preferred_dtype=self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class ConvTranspose3d(nn.Module):
    """SAME transposed conv; all reference uses have kernel == stride
    (hybrid_CTUNet.py:176-186 etc.) and hit the einsum fast path."""

    features: int
    kernel_size: Sequence[int] | int
    stride: Sequence[int] | int
    dtype: jnp.dtype = jnp.float32
    fold_out: bool = False  # emit the fold_z layout directly (free on the einsum path)

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (*k, cin, self.features),
            jnp.float32,
        )
        y = conv_transpose3d_same(
            x.astype(self.dtype), w.astype(self.dtype), self.stride,
            preferred_dtype=self.dtype, fold_out=self.fold_out,
        )
        return y


class LayerNorm(nn.Module):
    """Torch-parity LayerNorm (eps 1e-5, affine, fp32 internals)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return layer_norm(x, w, b, self.eps)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, folded=False):
        # folded (FOLD96): x is the fold_z layout (..., 2C); run the same
        # per-voxel linear as one 2C-lane dot with the block-diagonal weight
        # kron(I2, w) — folded channel s*C+c maps to output s*F+f. The
        # parameter keeps its unfolded (C, F) shape.
        cin = x.shape[-1] // (2 if folded else 1)
        w = self.param("kernel", nn.initializers.lecun_normal(), (cin, self.features), jnp.float32)
        wm = w.astype(self.dtype)
        if folded:
            wm = jnp.kron(jnp.eye(2, dtype=wm.dtype), wm)
        y = jnp.dot(x.astype(self.dtype), wm,
                    preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            bb = jnp.tile(b.astype(self.dtype), 2) if folded else b.astype(self.dtype)
            y = y + bb
        return y


class _DenseBiasParams(nn.Module):
    """Param-holder with biased Dense's tree layout ({kernel, bias})."""

    shape: Tuple[int, int]

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.shape[1],), jnp.float32),
        )


class FeedForward(nn.Module):
    """LN -> Linear(mult*dim) -> GELU -> [Dropout] -> Linear(dim) -> [Dropout]
    (reference hybrid_CTUNet.py:513-526 / vit.py:31-44 — dropout after the
    GELU and after the second Linear).

    On TPU at decoder-pyramid scale the op chain runs as one fused Pallas
    kernel (ops/ffn_pallas.py) that keeps the 4x hidden tile in VMEM — the
    unfused path is HBM-bound on that intermediate. Same param tree, same
    op-for-op numerics; backward recomputes through the unfused path. With
    dropout active (rate > 0 and not deterministic — training only) the
    unfused path runs so the masks apply at the reference's exact sites; the
    inference/benchmark path is untouched (dropout is identity there)."""

    mult: float = 4.0
    hidden_dim: int | None = None
    dropout: float = 0.0
    residual: bool = False  # return x + FFN(x), add fused into the kernel
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dim = x.shape[-1]
        inner = self.hidden_dim if self.hidden_dim is not None else int(dim * self.mult)
        ln_w, ln_b = _LNParams(dim, name="norm")()
        w1, b1 = _DenseBiasParams((dim, inner), name="fc1")()
        w2, b2 = _DenseBiasParams((inner, dim), name="fc2")()
        if self.dropout > 0.0 and not deterministic:
            y = layer_norm(x, ln_w, ln_b)
            h = jnp.dot(
                y.astype(self.dtype), w1.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype) + b1.astype(self.dtype)
            h = gelu_exact(h)
            h = nn.Dropout(self.dropout, name="drop_hidden")(h, deterministic=False)
            o = jnp.dot(
                h, w2.astype(self.dtype), preferred_element_type=jnp.float32
            ).astype(self.dtype) + b2.astype(self.dtype)
            o = nn.Dropout(self.dropout, name="drop_out")(o, deterministic=False)
            return x + o if self.residual else o
        n_rows = int(np.prod(x.shape[:-1]))
        if (
            _pallas_ffn_enabled()
            and ffn_pallas.supports(n_rows, dim, inner, self.dtype)
        ):
            in_kernel_res = self.residual and flags.PALLAS_FFN_RES == "1"
            out = ffn_pallas.fused_ffn(
                x, ln_w, ln_b, w1, b1, w2, b2, dtype=self.dtype,
                residual=in_kernel_res,
            )
            return x + out if (self.residual and not in_kernel_res) else out
        out = ffn_pallas.reference_ffn(x, ln_w, ln_b, w1, b1, w2, b2, self.dtype)
        return x + out if self.residual else out


class FeedForwardParams(nn.Module):
    """FeedForward's exact parameter tree ({norm, fc1, fc2}) without the
    computation — lets a caller hand two consecutive FFNs' parameters to the
    fused pair kernel (ops/ffn_pallas.fused_ffn_pair) while keeping the
    checkpoint layout identical to two FeedForward modules."""

    dim: int
    inner: int

    @nn.compact
    def __call__(self):
        ln_w, ln_b = _LNParams(self.dim, name="norm")()
        w1, b1 = _DenseBiasParams((self.dim, self.inner), name="fc1")()
        w2, b2 = _DenseBiasParams((self.inner, self.dim), name="fc2")()
        return (ln_w, ln_b, w1, b1, w2, b2)


def _rel_pos_indices(window: int) -> np.ndarray:
    """3D relative-position index table for a (w,w,w) window, token order
    (h, w, f) flattened — reference hybrid_CTUNet.py:472-479."""
    pos = np.arange(window)
    grid = np.stack(np.meshgrid(pos, pos, pos, indexing="ij"))  # (3, w, w, w)
    grid = grid.reshape(3, -1).T  # (w^3, 3) in (h w f) order
    rel = grid[:, None, :] - grid[None, :, :] + window - 1
    strides = np.array([(2 * window - 1) ** 2, 2 * window - 1, 1])
    return (rel * strides).sum(-1).astype(np.int32)  # (w^3, w^3)


class MultiAxisWindowAttention(nn.Module):
    """MaxViT-style windowed MHSA over w^3 windows with 3D relative-position
    bias (reference MultiAxisAttention, hybrid_CTUNet.py:442-511).

    ``grid=False``: block attention — partition space into contiguous w^3
    windows. ``grid=True``: grid attention — attend across windows at fixed
    intra-window offset (the reference's '(h1 h)' rearrange,
    hybrid_CTUNet.py:564). Operates on NDHWC directly.
    """

    dim_head: int = 32
    window: int = 6
    grid: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, X, Y, Z, C = x.shape
        w = self.window
        assert X % w == 0 and Y % w == 0 and Z % w == 0, (
            f"spatial dims {(X, Y, Z)} must be divisible by window {w}"
        )
        heads = C // self.dim_head
        scale = self.dim_head ** -0.5
        nx, ny, nz = X // w, Y // w, Z // w

        h = LayerNorm(name="norm")(x)
        if not self.grid:
            # (B, nx, w, ny, w, nz, w, C) -> (B*nwin, w^3, C); token order (h w f)
            h = h.reshape(B, nx, w, ny, w, nz, w, C)
            h = h.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        else:
            # '(h1 h)' split: outer factor w indexes the token, inner the window
            h = h.reshape(B, w, nx, w, ny, w, nz, C)
            h = h.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        nwin = nx * ny * nz
        tokens = w * w * w
        h = h.reshape(B * nwin, tokens, C)

        qkv = Dense(3 * C, use_bias=False, dtype=self.dtype, name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.normal(1.0),
            ((2 * w - 1) ** 3, heads),
            jnp.float32,
        )
        idx = jnp.asarray(_rel_pos_indices(w))
        bias = bias_table[idx].transpose(2, 0, 1)  # (heads, T, T)

        drop = self.dropout > 0.0 and not deterministic
        if drop:
            # training-with-dropout path: unfused so the mask applies to the
            # softmaxed scores (reference hybrid_CTUNet.py:460-461 —
            # attend = Softmax -> Dropout)
            nw, T = B * nwin, tokens
            qh = (q * scale).reshape(nw, T, heads, self.dim_head).transpose(0, 2, 1, 3)
            kh = k.reshape(nw, T, heads, self.dim_head).transpose(0, 2, 1, 3)
            vh = v.reshape(nw, T, heads, self.dim_head).transpose(0, 2, 1, 3)
            sim = jnp.einsum("bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(sim + bias[None], axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.dropout, name="drop_attn")(attn, deterministic=False)
            out = jnp.einsum("bhij,bhjd->bhid", attn, vh, preferred_element_type=jnp.float32)
            out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(nw, T, C)
        elif _pallas_enabled("ATTN") and attention_pallas.supports(
            B * nwin, tokens, C, heads, self.dtype
        ):
            # fused kernel: the fp32 score tensor never touches HBM
            out = attention_pallas.fused_window_attention(
                q * scale, k, v, bias, dtype=self.dtype
            )
        else:
            out = attention_pallas.reference_window_attention(
                q * scale, k, v, bias, self.dtype
            )
        out = Dense(C, use_bias=False, dtype=self.dtype, name="to_out")(out)
        if drop:
            # reference to_out = Linear -> Dropout (hybrid_CTUNet.py:464-466)
            out = nn.Dropout(self.dropout, name="drop_out")(out, deterministic=False)

        out = out.reshape(B, nx, ny, nz, w, w, w, C)
        if not self.grid:
            out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        else:
            out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return out.reshape(B, X, Y, Z, C)


class PixelShuffleLinear(nn.Module):
    """Anisotropic 3D pixel shuffle + per-voxel linear
    (reference PixelShuffle, hybrid_CTUNet.py:388-432).

    Channel dim splits as (C', f0, f1, f2) with C' slowest; factor offsets
    interleave into space; then Linear(C' -> features).
    """

    factor: Tuple[int, int, int]
    features: int
    dtype: jnp.dtype = jnp.float32
    # fold_out: emit the fold_z layout (B, Xf0, Yf1, Zf2/2, 2*features)
    # directly by composing the z-pair regroup into the shuffle's own final
    # reshape and running the per-voxel Linear as the block-diagonal
    # kron(I2, w) dot — kills the separate fold_z layout copy downstream
    # (device trace: 2x ~3.2 ms/chunk of 524 GB/s `core/reshape`, one per
    # consumer fusion). Exact: the extra weight entries are zeros.
    fold_out: bool = False

    @nn.compact
    def __call__(self, x):
        B, X, Y, Z, C = x.shape
        f0, f1, f2 = self.factor
        div = f0 * f1 * f2
        if C % div != 0:
            raise ValueError(f"channels {C} not divisible by prod(factor) {div}")
        if self.fold_out and (Z * f2) % 2 != 0:
            raise ValueError(f"fold_out needs an even output Z, got {Z * f2}")
        cp = C // div
        # PALLAS_SHUFFLE: "1" engages the fused kernel at every supported
        # stage; "fold" engages it ONLY at fold_out sites (the stage-3
        # full-res shuffle under FOLD96_LAST, where the zfold store doubles
        # the lane width to 2F=128 and the consumer reads the folded layout
        # natively — the un-gated stage-1/2 sites measured a ~40 ms/chunk
        # in-model LOSS from operand-layout pinning, the fifth standalone
        # reversal at this site).
        ps = flags.PALLAS_SHUFFLE
        if (
            div > 1
            and (ps == "1" or (ps == "fold" and self.fold_out))
            and jax.devices()[0].platform == "tpu"
            and shuffle_pallas.supports(
                x.shape, self.factor, self.features, self.dtype,
                zfold=self.fold_out,
            )
        ):
            # fused kernel: one input read, f0*f1 factor dots back-to-back,
            # each result stored directly at its interleaved position — the
            # 8-D transpose and its HBM layout copies disappear.
            w, b = _DenseBiasParams((cp, self.features), name="to_out")()
            return shuffle_pallas.fused_pixel_shuffle(
                x, w, b, tuple(self.factor), self.dtype, False, self.fold_out
            )
        if flags.SHUFFLE_CT == "1" or flags.SHUFFLE_BD == "1":
            # quarantined default-off reformulations (conv-transpose /
            # block-diagonal matmul) — both measured in-model losses from
            # XLA fusing the small per-voxel Dense + shuffle permutes into
            # their neighbors; see models/experimental.py
            from .experimental import pixel_shuffle_experimental

            y = pixel_shuffle_experimental(self, x)
            if y is not None:
                return y
        x = x.reshape(B, X, Y, Z, cp, f0, f1, f2)
        x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # (B, X, f0, Y, f1, Z, f2, C')
        if self.fold_out:
            # the trailing (Z, f2, C') dims flatten z_out-major, so regrouping
            # as (Z*f2/2, 2C') pairs adjacent output z — a pure reshape folded
            # into the same transpose copy XLA emits anyway.
            x = x.reshape(B, X * f0, Y * f1, (Z * f2) // 2, 2 * cp)
            return Dense(self.features, dtype=self.dtype, name="to_out")(x, folded=True)
        x = x.reshape(B, X * f0, Y * f1, Z * f2, cp)
        return Dense(self.features, dtype=self.dtype, name="to_out")(x)


class _LNParams(nn.Module):
    """Param-holder with LayerNorm's tree layout ({scale, bias})."""

    dim: int

    @nn.compact
    def __call__(self):
        w = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return w, b


class _DenseParams(nn.Module):
    """Param-holder with Dense's tree layout ({kernel})."""

    shape: Tuple[int, int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32)


class PixelweightFusion(nn.Module):
    """Binary cross-weight attention fusing two same-shape streams
    (reference pixelweight_attention, hybrid_CTUNet.py:622-669).

    Per voxel and head: scalar cross-dots <q2,k1> and <q1,k2> -> 2-way
    softmax -> weighted sum of v1/v2 -> output projection. O(N*d) and
    HBM-bound: routed through ops.pixelweight which fuses the whole chain
    into one Pallas kernel on TPU (XLA composition elsewhere).
    """

    dim_head: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: str | bool = "auto"

    @nn.compact
    def __call__(self, x1, x2, *, deterministic: bool = True):
        assert x1.shape == x2.shape, (x1.shape, x2.shape)
        C = x1.shape[-1]
        from ..ops.pixelweight import (
            PixelweightParams,
            pixelweight_attention,
            pixelweight_reference,
        )

        ln1w, ln1b = _LNParams(C, name="norm1")()
        ln2w, ln2b = _LNParams(C, name="norm2")()
        p = PixelweightParams(
            ln1_scale=ln1w, ln1_bias=ln1b, ln2_scale=ln2w, ln2_bias=ln2b,
            qkv1_kernel=_DenseParams((C, 3 * C), name="to_qkv1")(),
            qkv2_kernel=_DenseParams((C, 3 * C), name="to_qkv2")(),
            out_kernel=_DenseParams((C, C), name="to_out")(),
        )
        if self.dropout > 0.0 and not deterministic:
            # reference dropout sites: the 2-way softmax weights and the out
            # projection (hybrid_CTUNet.py:635-642). NOTE the reference's own
            # callers construct pixelweight_attention WITHOUT dropout
            # (hybrid_CTUNet.py:296-297), so CTUNet never wires a nonzero
            # rate here — this is module-capability parity.
            attn_drop = nn.Dropout(self.dropout, name="drop_attn")
            out_drop = nn.Dropout(self.dropout, name="drop_out")
            return pixelweight_reference(
                x1, x2, p, dim_head=self.dim_head, dtype=self.dtype,
                attn_dropout=lambda w: attn_drop(w, deterministic=False),
                out_dropout=lambda o: out_drop(o, deterministic=False),
            )
        return pixelweight_attention(
            x1, x2, p, dim_head=self.dim_head, dtype=self.dtype, use_pallas=self.use_pallas
        )


class _SplitInputConv3d(nn.Module):
    """Conv3d over the *virtual concatenation* of two inputs without ever
    materializing it: conv(concat(a, b)) == conv_a(a) + conv_b(b) with the
    kernel split on the Cin axis. Same single parameter as the concat conv
    (identical tree/checkpoints); saves the full-resolution concat copies
    (~27 ms/chunk measured at 96^3)."""

    features: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b, folded=False, altfold=""):
        k = _triple(self.kernel_size)
        # folded: a and b are each in the z-folded layout (ops/conv.py
        # fold_z, 2x channels); the parameter keeps its unfolded concat
        # shape and each half-kernel is folded at apply time.
        # altfold="a2o": alternating-parity fold — a and b are aligned
        # folds, the two half-kernel convs emit (and sum in) the odd layout.
        ca = a.shape[-1] // 2 if (folded or altfold) else a.shape[-1]
        cb = b.shape[-1] // 2 if (folded or altfold) else b.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (*k, ca + cb, self.features),
            jnp.float32,
        )
        if altfold:
            assert altfold == "a2o" and _triple(self.stride) == (1, 1, 1)
            wa = w[..., :ca, :].astype(self.dtype)
            wb = w[..., ca:, :].astype(self.dtype)
            return conv3d_altfold_a2o(
                a.astype(self.dtype), wa, preferred_dtype=self.dtype
            ) + conv3d_altfold_a2o(b.astype(self.dtype), wb, preferred_dtype=self.dtype)
        if folded:
            assert _triple(self.stride) == (1, 1, 1)
            wa = w[..., :ca, :].astype(self.dtype)
            wb = w[..., ca:, :].astype(self.dtype)
            return conv3d_folded(
                a.astype(self.dtype), wa, preferred_dtype=self.dtype
            ) + conv3d_folded(b.astype(self.dtype), wb, preferred_dtype=self.dtype)
        # Standalone the materialized wide-Cin conv wins (-9 ms on the 96^3
        # decoder0 block) but END TO END virtual is worth +1.2 vol/min — XLA
        # fuses the two half convs with their producers. Default virtual;
        # toggle kept for study.
        if flags.VIRTUAL_CONCAT == "0":
            # materialized strategy: one wide-Cin conv (wide Cin runs at a
            # higher MXU rate; the concat copy can be cheaper than the rate
            # loss of two half-Cin convs — shape-dependent, hence the toggle)
            ab = jnp.concatenate([a.astype(self.dtype), b.astype(self.dtype)], axis=-1)
            return conv3d_same(ab, w.astype(self.dtype), self.stride, preferred_dtype=self.dtype)
        wa = w[..., :ca, :].astype(self.dtype)
        wb = w[..., ca:, :].astype(self.dtype)
        ya = conv3d_same(a.astype(self.dtype), wa, self.stride, preferred_dtype=self.dtype)
        yb = conv3d_same(b.astype(self.dtype), wb, self.stride, preferred_dtype=self.dtype)
        return ya + yb


class ResBlock(nn.Module):
    """2-conv residual block with InstanceNorm/LeakyReLU(0.01) and a 1x1x1
    projection shortcut when shape changes (reference hybrid_CTUNet.py:29-105).

    ``__call__(x, skip=None)``: when ``skip`` is given, the block operates on
    the virtual concat(x, skip) — conv1 and the projection shortcut split
    their kernels over the two inputs instead of materializing the
    concatenation (identical math and parameter tree).

    ``fold_in``/``fold_out`` (FOLD96 cross-block convention): the inputs
    arrive / the output leaves in the ``fold_z`` layout (B,X,Y,Z/2,2C), so
    adjacent folded blocks skip the boundary unfold/fold pair entirely.
    Exact reordering; when the altfold fast path is gated off the block
    unfolds at entry / refolds at exit and stays correct."""

    features: int
    kernel_size: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    dtype: jnp.dtype = jnp.float32
    fold_in: bool = False
    fold_out: bool = False
    # --norm_name dispatch (apply_norm): "instance" keeps the historical
    # zero-param path bit-for-bit; "batch"/"batch:AXIS" adds TorchBatchNorm
    # modules norm1/norm2/norm3 and disables the instance-only fold fast
    # paths (their folded-IN statistics are instance semantics).
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, skip=None):
        div = 2 if self.fold_in else 1
        zdim = x.shape[3] * div  # unfolded spatial z
        cin = x.shape[-1] // div + (skip.shape[-1] // div if skip is not None else 0)
        stride = _triple(self.stride)
        needs_proj = cin != self.features or any(s != 1 for s in stride)

        f = self.features
        k3 = _triple(self.kernel_size) == (3, 3, 3)

        # WINOGRAD=2 fused-IN chain — experimental, default off; gate
        # evaluated pre-unfold since it requires the standard layout
        wino2 = False
        if flags.WINOGRAD == "2" and self.norm == "instance":
            from .experimental import wino2_engages

            wino2 = wino2_engages(self, x, stride, f, k3)

        altfold = (
            not wino2
            and self.norm == "instance"
            and flags.ALTFOLD == "1"
            and k3
            and stride == (1, 1, 1)
            and f <= flags.ALTFOLD_CH
            and f % 2 == 0
            and zdim % 2 == 0
            and (skip is None or needs_proj)
        )
        if altfold:
            # alternating-parity z-fold block: conv1 runs aligned-fold ->
            # ODD-pair output, conv2 odd -> aligned, both as (3,3,2) kernels
            # over 2C lanes with 6/8 weight blocks live (75% useful MACs) —
            # ops/conv.py conv3d_altfold_*. The block's input/output and
            # both operand layouts are free contiguous reshapes, so unlike
            # ZFOLD_RES nothing relayouts between convs. Measured v5e
            # (tools/probe_altfold.py, B8 96^3 conv-IN-lrelu-conv chain):
            # C=64 46.9 -> 35.7 ms, C=32 59.3 -> 20.8; C=128 LOSES (already
            # lane-saturated), hence the ALTFOLD_CH gate. Identical math and
            # parameter tree; pinned by tests/test_conv.py.
            n_vox = x.shape[1] * x.shape[2] * zdim
            xf = x if self.fold_in else fold_z(x)
            if skip is None:
                sf = None
            else:
                sf = skip if self.fold_in else fold_z(skip)
            if skip is None:
                y1 = Conv3d(f, 3, 1, dtype=self.dtype, name="conv1")(xf, altfold="a2o")
            else:
                y1 = _SplitInputConv3d(f, 3, 1, dtype=self.dtype,
                                       name="conv1")(xf, sf, altfold="a2o")
            # the garbage edge half-slots (standing in for conv2's z
            # zero-padding) are zeroed either by standalone mask passes or
            # by a mask fused into the IN's reduce+normalize (A/B gate)
            if flags.ALTFOLD_MASKF == "1":
                emask = odd_edge_mask(y1.shape[3], y1.shape[4], jnp.float32)[None, None, None]
                y1 = instance_norm_leaky_folded(y1, count=n_vox, mask=emask)
            else:
                y1 = mask_odd_edges(y1)
                y1 = mask_odd_edges(instance_norm_leaky_folded(y1, count=n_vox))
            out = Conv3d(f, 3, 1, dtype=self.dtype, name="conv2")(y1, altfold="o2a")
            out = instance_norm_folded(out)
            if needs_proj:
                if flags.ALTFOLD_PROJSTD == "1" and not self.fold_in:
                    # 1x1 projection in STANDARD layout (the folded
                    # block-diagonal runs 2x MACs at 24-42 TF/s in the
                    # device trace); its aligned-fold output is a free view.
                    if skip is None:
                        residual = Conv3d(f, 1, 1, dtype=self.dtype, name="conv3")(x)
                    else:
                        residual = _SplitInputConv3d(f, 1, 1, dtype=self.dtype,
                                                     name="conv3")(x, skip)
                    residual = fold_z(instance_norm(residual))
                else:
                    if skip is None:
                        residual = Conv3d(f, 1, 1, dtype=self.dtype,
                                          name="conv3")(xf, folded=True)
                    else:
                        residual = _SplitInputConv3d(f, 1, 1, dtype=self.dtype,
                                                     name="conv3")(xf, sf, folded=True)
                    residual = instance_norm_folded(residual)
            else:
                residual = xf
            res = leaky_relu(out + residual)
            return res if self.fold_out else unfold_z(res)

        # fallback paths (altfold gated off) run in the standard layout:
        # normalize folded inputs here and refold at exit — correct, at the
        # cost of the boundary copies FOLD96 exists to remove.
        if self.fold_in:
            x = unfold_z(x)
            skip = unfold_z(skip) if skip is not None else None

        if (wino2 or (flags.ZFOLD == "1" and flags.ZFOLD_RES == "1")) and self.norm == "instance":
            # quarantined default-off variants (ZFOLD_RES, WINOGRAD=2) —
            # behavior-identical, measured end-to-end losses on the
            # flagship config; see models/experimental.py
            from .experimental import resblock_experimental

            res = resblock_experimental(self, x, skip, stride, needs_proj, f, wino2)
            if res is not None:
                return res

        if skip is None:
            out = Conv3d(self.features, self.kernel_size, self.stride,
                         dtype=self.dtype, name="conv1")(x)
        else:
            out = _SplitInputConv3d(self.features, self.kernel_size, self.stride,
                                    dtype=self.dtype, name="conv1")(x, skip)
        out = apply_norm(self.norm, out, act=True, name="norm1")
        out = Conv3d(self.features, self.kernel_size, 1, dtype=self.dtype, name="conv2")(out)
        out = apply_norm(self.norm, out, name="norm2")

        if needs_proj:
            if skip is None:
                residual = Conv3d(self.features, 1, self.stride,
                                  dtype=self.dtype, name="conv3")(x)
            else:
                residual = _SplitInputConv3d(self.features, 1, self.stride,
                                             dtype=self.dtype, name="conv3")(x, skip)
            residual = apply_norm(self.norm, residual, name="norm3")
        else:
            residual = x if skip is None else jnp.concatenate(
                [x, skip.astype(x.dtype)], axis=-1
            )
        res = leaky_relu(out + residual)
        return fold_z(res) if self.fold_out else res


class UpCatConvBlock(nn.Module):
    """Transposed-conv upsample -> concat skip -> ResBlock
    (reference UpCatConvBlock, hybrid_CTUNet.py:148-201)."""

    features: int
    upsample_stride: Sequence[int]
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, skip):
        out = ConvTranspose3d(
            self.features, self.upsample_stride, self.upsample_stride, dtype=self.dtype,
            name="transp_conv",
        )(x)
        # virtual concat: ResBlock splits its kernels over (out, skip)
        return maybe_remat(ResBlock)(
            self.features, self.kernel_size, 1, dtype=self.dtype, norm=self.norm,
            name="conv_block"
        )(out, skip)


class UpConvBlock(nn.Module):
    """Transposed-conv upsample -> ResBlock, no skip
    (reference UpConvBlock, hybrid_CTUNet.py:203-255)."""

    features: int
    upsample_stride: Sequence[int]
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32
    fold_out: bool = False
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        # FOLD96_MID: when the caller wants folded output (FOLD96), the
        # internal transp_conv -> ResBlock boundary also stays folded: the
        # einsum interleave emits the fold_z layout for free and the ResBlock
        # consumes it via fold_in (kills a ~3.1 ms/chunk layout copy).
        s = _triple(self.upsample_stride)
        fold_mid = (
            self.fold_out
            and flags.FOLD96_MID == "1"
            and (x.shape[3] * s[2]) % 2 == 0
        )
        out = ConvTranspose3d(
            self.features, self.upsample_stride, self.upsample_stride, dtype=self.dtype,
            fold_out=fold_mid, name="transp_conv",
        )(x)
        return maybe_remat(ResBlock)(
            self.features, self.kernel_size, 1, dtype=self.dtype,
            fold_in=fold_mid, fold_out=self.fold_out, norm=self.norm,
            name="conv_block"
        )(out)


class Up2FusionBlock(nn.Module):
    """CTUNet fusion decoder stage, the reference's active "fusion2" forward
    (hybrid_CTUNet.py:329-341): pixelweight-fuse(skip_conv, skip_vit) ->
    ResBlock; transp-conv(inp); pixelweight-fuse(out, skip) -> ResBlock."""

    features: int
    upsample_stride: Sequence[int]
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, skip_conv, skip_vit):
        skip = PixelweightFusion(dtype=self.dtype, name="pixelweight_attention1")(skip_conv, skip_vit)
        skip = maybe_remat(ResBlock)(self.features, self.kernel_size, 1, dtype=self.dtype,
                                     norm=self.norm, name="up_addconv_block1")(skip)

        out = ConvTranspose3d(
            self.features, self.upsample_stride, self.upsample_stride, dtype=self.dtype,
            name="transp_conv",
        )(x)
        out = PixelweightFusion(dtype=self.dtype, name="pixelweight_attention2")(out, skip)
        return maybe_remat(ResBlock)(self.features, self.kernel_size, 1, dtype=self.dtype,
                                     norm=self.norm, name="up_addconv_block2")(out)


class CatConvBlock(nn.Module):
    """concat(x, skip) -> ResBlock (reference hybrid_CTUNet.py:593-620).

    ``fold_in``/``fold_out``: FOLD96 cross-block fold convention (see
    ResBlock) — both inputs arrive / the output leaves z-folded."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32
    fold_in: bool = False
    fold_out: bool = False
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, skip):
        # virtual concat: ResBlock splits its kernels over (x, skip)
        return maybe_remat(ResBlock)(
            self.features, self.kernel_size, 1, dtype=self.dtype,
            fold_in=self.fold_in, fold_out=self.fold_out, norm=self.norm,
            name="conv_block"
        )(x, skip)


class UnetOutHead(nn.Module):
    """1x1x1 conv head with bias (MONAI UnetOutBlock semantics,
    reference hybrid_CTUNet.py:781-783).

    ``folded``: FOLD96 — x is z-folded; the head runs as the block-diagonal
    folded 1x1 (same parameters) and returns the folded logits."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, folded=False):
        return Conv3d(self.features, 1, 1, use_bias=True, dtype=self.dtype,
                      name="conv")(x, folded=folded)
