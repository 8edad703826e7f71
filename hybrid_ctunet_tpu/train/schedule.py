"""Learning-rate schedules.

``warmup_cosine_lr`` reproduces the closed form of the reference's
``LinearWarmupCosineAnnealingLR`` (optimizers/lr_scheduler.py:92-177):
linear warmup over ``warmup_epochs`` starting at ``warmup_start_lr`` (note the
reference divides by ``warmup_epochs - 1``, so the base LR is reached exactly
at epoch ``warmup_epochs - 1``), then cosine anneal to ``eta_min`` at
``max_epochs``. The scheduler steps once per *epoch* in the reference, so the
schedule input here is the epoch index, not the step index.
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_lr(
    epoch,
    *,
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
):
    """Closed-form LR at integer ``epoch`` (scalar or array, traceable)."""
    e = jnp.asarray(epoch, dtype=jnp.float32)
    warm = warmup_start_lr + e * (base_lr - warmup_start_lr) / max(warmup_epochs - 1, 1)
    progress = (e - warmup_epochs) / max(max_epochs - warmup_epochs, 1)
    cos = eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * progress))
    return jnp.where(e < warmup_epochs, warm, cos)


def make_epoch_schedule(
    name: str,
    *,
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
):
    """Factory mirroring the reference's ``--lrschedule`` choices
    (main_CTUNet.py:201-210): 'warmup_cosine', 'cosine_anneal', or constant."""
    if name == "warmup_cosine":
        return lambda epoch: warmup_cosine_lr(
            epoch, base_lr=base_lr, warmup_epochs=warmup_epochs, max_epochs=max_epochs
        )
    if name == "cosine_anneal":
        return lambda epoch: 0.5 * base_lr * (
            1.0 + jnp.cos(jnp.pi * jnp.asarray(epoch, jnp.float32) / max_epochs)
        )
    return lambda epoch: jnp.asarray(base_lr, jnp.float32)
