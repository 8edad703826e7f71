"""Normalization ops (channels-last).

The reference uses affine-free InstanceNorm3d (MONAI ``Norm.INSTANCE`` default:
affine=False, eps=1e-5, no running stats) in every conv path and torch
LayerNorm (eps=1e-5, elementwise affine) in every attention path
(reference: networks/resnet.py:97, networks/hybrid_CTUNet.py:456,630).

Instance norm over a 96^3 volume at batch 1 is reduction-bound; we compute it
in fp32 regardless of the activation dtype so bf16 training stays stable, and
let XLA fuse the normalize into neighbouring elementwise ops.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


# Opt-in fused Pallas instance-norm(+leaky) for the conv paths; flipped on by
# setting HYBRID_CTUNET_PALLAS_NORM=1 (kept off by default until the fused
# kernel measures faster than XLA's fusion on the target chip).
from .. import flags

_PALLAS_NORM = flags.PALLAS_NORM == "1"


def set_pallas_norms(enabled: bool) -> None:
    global _PALLAS_NORM
    _PALLAS_NORM = enabled


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Affine-free instance norm: normalize each (batch, channel) over space.

    x: (B, X, Y, Z, C) — reduces over the three spatial axes. Stats use the
    single-pass E[x^2]-E[x]^2 form in fp32 so XLA fuses both sums into ONE
    read of x (the two-pass form was ~22% of the whole CTUNet forward on
    v5e); variance is clamped at 0 against cancellation."""
    xf = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2] * x.shape[3]
    s1 = jnp.sum(xf, axis=(1, 2, 3), keepdims=True)
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2, 3), keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def instance_norm_leaky(x: jax.Array, eps: float = 1e-5, negative_slope: float = 0.01):
    """IN + LeakyReLU — the conv-path epilogue; routes to the fused Pallas
    kernel when enabled (ops/norm_pallas.py)."""
    if _PALLAS_NORM:
        from .norm_pallas import instance_norm_act

        return instance_norm_act(x, eps=eps, negative_slope=negative_slope, act=True)
    from .act import leaky_relu

    return leaky_relu(instance_norm(x, eps), negative_slope)


def instance_norm_folded(x: jax.Array, eps: float = 1e-5, *, count: int | None = None,
                         factor: int = 2, mask: jax.Array | None = None) -> jax.Array:
    """Instance norm applied in the z-folded layout (ops/conv.py fold_z).

    ``x``: (B, X, Y, Zf, 2C) where folded channels [0, C) and [C, 2C) are the
    even/odd z-slots of the same original C channels. Per-channel statistics
    therefore combine the two slot copies; the result equals
    ``fold_z(instance_norm(unfold_z(x)))`` exactly (same single-pass fp32
    E[x^2]-E[x]^2 form, variance clamped at 0).

    ``count``: override the valid element count per (batch, channel) — used
    by the ODD alternating-fold layout (ops/conv.py conv3d_altfold_a2o),
    whose edge half-slots are zeroed garbage: they contribute 0 to both sums
    but must not inflate the divisor.

    ``factor``: the z-fold factor (channel dim = factor*C).

    ``mask``: optional broadcastable multiplier applied to x inside BOTH the
    statistics reduction and the output pass (used by the odd altfold layout
    to zero its garbage edge half-slots). Because the multiply is expressed
    inside each consumer, XLA fuses it into the reduce and the normalize
    fusions — no standalone masking pass ever touches HBM, unlike a separate
    ``mask_odd_edges`` call before/after the norm."""
    xf = x.astype(jnp.float32)
    if mask is not None:
        xf = xf * mask
    Cf = x.shape[-1]
    C = Cf // factor
    n = count if count is not None else factor * x.shape[1] * x.shape[2] * x.shape[3]
    s1 = jnp.sum(xf, axis=(1, 2, 3)).reshape(-1, factor, C)  # (B, f, C)
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2, 3)).reshape(-1, factor, C)
    mean = s1.sum(1) / n
    var = jnp.maximum(s2.sum(1) / n - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    mean2 = jnp.tile(mean, factor)[:, None, None, None, :]
    scale2 = jnp.tile(scale, factor)[:, None, None, None, :]
    out = (xf - mean2) * scale2
    if mask is not None:
        # re-zero the masked slots (the affine shifts them off zero); the
        # multiply rides the same output fusion
        out = out * mask
    return out.astype(x.dtype)


def instance_norm_leaky_folded(
    x: jax.Array, eps: float = 1e-5, negative_slope: float = 0.01,
    *, count: int | None = None, factor: int = 2, mask: jax.Array | None = None,
) -> jax.Array:
    """Folded-layout IN + LeakyReLU (conv-path epilogue in folded stages).
    With ``mask``, LeakyReLU(0) == 0 keeps masked slots zero."""
    from .act import leaky_relu

    return leaky_relu(
        instance_norm_folded(x, eps, count=count, factor=factor, mask=mask),
        negative_slope,
    )


def stats_to_affine(s1: jax.Array, s2: jax.Array, n: int, eps: float = 1e-5):
    """InstanceNorm as a per-(sample, channel) affine from raw partial sums.

    ``s1 = sum x``, ``s2 = sum x^2`` over the ``n`` spatial positions, each
    (B, C) fp32 (e.g. emitted by the Winograd kernel). Returns (scale, bias)
    with ``normalize(x) == x*scale + bias`` — identical math to
    :func:`instance_norm` (E[x^2]-E[x]^2 form, variance clamped at 0)."""
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    return scale, -mean * scale


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Torch-style LayerNorm over the last axis with elementwise affine."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class TorchBatchNorm(nn.Module):
    """Channels-last BatchNorm3d with torch semantics (``--norm_name batch``).

    The reference threads ``norm_name`` into every conv block
    (hybrid_CTUNet.py:85-87, resnet.py:97-101); MONAI's ``Norm.BATCH`` is
    ``torch.nn.BatchNorm3d`` with its defaults — eps 1e-5, momentum 0.1,
    affine, running stats. Torch details reproduced exactly:

    - train mode normalizes with the BIASED batch variance but tracks
      ``running_var`` with the UNBIASED one (Bessel's correction);
    - ``running = (1 - momentum) * running + momentum * new``;
    - eval mode normalizes with the running buffers.

    Train/eval follows the mutability of the ``batch_stats`` collection: a
    train step applies with ``mutable=["batch_stats"]`` (the functional
    analogue of ``model.train()``), eval applies immutably (= ``.eval()``).

    ``sync_axis``: average the batch moments over a mapped mesh axis before
    normalizing — exactly ``SyncBatchNorm.convert_sync_batchnorm`` under DDP
    (reference main_C_TUNet.py:193-194). Sums of E[x] and E[x^2] are synced
    (not per-shard variances), so an n-way sharded batch normalizes
    bit-comparably to the unsharded global batch.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    sync_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        train = self.is_mutable_collection("batch_stats") and not self.is_initializing()
        xf = x.astype(jnp.float32)
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            meansq = jnp.mean(jnp.square(xf), axis=axes)
            n = float(x.size // C)
            if self.sync_axis is not None:
                mean = jax.lax.pmean(mean, self.sync_axis)
                meansq = jax.lax.pmean(meansq, self.sync_axis)
                n = n * jax.lax.psum(1, self.sync_axis)
            var = jnp.maximum(meansq - jnp.square(mean), 0.0)
            m = self.momentum
            ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
            ra_var.value = (1.0 - m) * ra_var.value + m * var * (n / (n - 1.0))
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(x.dtype)
