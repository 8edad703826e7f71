"""DiceCE loss reproducing MONAI's ``DiceCELoss(to_onehot_y=True, softmax=True,
squared_pred=True, smooth_nr=0.0, smooth_dr=1e-6)`` as configured by the
reference (main_CTUNet.py:156-158).

Semantics (MONAI 0.7):
  dice  = mean over (batch, class incl. background) of
          1 - (2*sum(y*p) + smooth_nr) / (sum(y^2) + sum(p^2) + smooth_dr)
          with p = softmax(logits) and y = onehot(labels), spatial sums.
  ce    = standard softmax cross-entropy against integer labels, voxel mean.
  total = dice + ce.

Channels-last: logits (B, X, Y, Z, C); labels (B, X, Y, Z) int or
(B, X, Y, Z, 1). Reductions run in fp32 for bf16 training stability.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _prep_labels(labels: jax.Array) -> jax.Array:
    if labels.ndim == 5 and labels.shape[-1] == 1:
        labels = labels[..., 0]
    return labels.astype(jnp.int32)


def dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    smooth_nr: float = 0.0,
    smooth_dr: float = 1e-6,
    squared_pred: bool = True,
) -> jax.Array:
    labels = _prep_labels(labels)
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    spatial = tuple(range(1, logits.ndim - 1))
    intersection = jnp.sum(onehot * probs, axis=spatial)
    if squared_pred:
        ground = jnp.sum(jnp.square(onehot), axis=spatial)
        pred = jnp.sum(jnp.square(probs), axis=spatial)
    else:
        ground = jnp.sum(onehot, axis=spatial)
        pred = jnp.sum(probs, axis=spatial)
    f = 1.0 - (2.0 * intersection + smooth_nr) / (ground + pred + smooth_dr)
    return jnp.mean(f)


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    labels = _prep_labels(labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def dice_ce_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    smooth_nr: float = 0.0,
    smooth_dr: float = 1e-6,
    squared_pred: bool = True,
) -> jax.Array:
    return dice_loss(
        logits, labels, smooth_nr=smooth_nr, smooth_dr=smooth_dr, squared_pred=squared_pred
    ) + softmax_cross_entropy(logits, labels)
