"""Jitted train steps with the reference's exact loss structure.

Loss contracts (channels-last batches: image (B,X,Y,Z,1), label (B,X,Y,Z,1)):

- CUNet   (trainer_CUNet.py:91-100):
    L = DiceCE(out0, y) + 0.5*(DiceCE(out1, y_half) + 0.5*DiceCE(out2, y_quarter))
  with y_half = nearest-zoom (.5,.5,1), y_quarter = (.25,.25,.5) — computed
  ON DEVICE (the reference round-trips through CPU scipy every step,
  trainer_CTUNet.py:93-94).
- TUNet   (trainer_TUNet.py:78-82):  L = DiceCE(v0, y) + DiceCE(v1, y)
- CTUNet  (trainer_CTUNet.py:90-103): L = L_cunet + 0.5 * L_tunet

Each step takes the epoch-indexed LR as input (the reference schedules per
epoch, not per step).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.losses import dice_ce_loss
from ..ops.resize import downscale_labels
from .state import TrainState, set_learning_rate


def deep_supervision_loss(outs, label, *, smooth_nr=0.0, smooth_dr=1e-6):
    """CUNet-style DS loss over (full, 1/2, 1/4) heads."""
    out0, out1, out2 = outs
    y1 = downscale_labels(label, (0.5, 0.5, 1.0))
    y2 = downscale_labels(label, (0.25, 0.25, 0.5))
    l0 = dice_ce_loss(out0, label, smooth_nr=smooth_nr, smooth_dr=smooth_dr)
    l1 = dice_ce_loss(out1, y1, smooth_nr=smooth_nr, smooth_dr=smooth_dr)
    l2 = dice_ce_loss(out2, y2, smooth_nr=smooth_nr, smooth_dr=smooth_dr)
    return l0 + 0.5 * (l1 + 0.5 * l2)


def dual_head_loss(outs, label, *, smooth_nr=0.0, smooth_dr=1e-6):
    """TUNet loss: both full-res heads against the full-res label."""
    v0, v1 = outs
    return dice_ce_loss(v0, label, smooth_nr=smooth_nr, smooth_dr=smooth_dr) + dice_ce_loss(
        v1, label, smooth_nr=smooth_nr, smooth_dr=smooth_dr
    )


def cunet_loss_fn(outs, label, **kw):
    return deep_supervision_loss(outs, label, **kw), {}


def tunet_loss_fn(outs, label, **kw):
    return dual_head_loss(outs, label, **kw), {}


def ctunet_loss_fn(outs, label, **kw):
    res_outs, vit_outs = outs
    loss1 = deep_supervision_loss(res_outs, label, **kw)
    loss2 = dual_head_loss(vit_outs, label, **kw)
    return loss1 + 0.5 * loss2, {"loss1": loss1, "loss2": loss2}


LOSS_FNS = {"cunet": cunet_loss_fn, "tunet": tunet_loss_fn, "ctunet": ctunet_loss_fn}


def make_train_step(model_name: str, *, smooth_nr: float = 0.0, smooth_dr: float = 1e-6,
                    pmean_axis: str | None = None, remat: bool = False) -> Callable:
    """Build a jittable (state, image, label, lr) -> (state, metrics) step.

    ``pmean_axis``: when running under shard_map over a data mesh axis, the
    gradients/metrics are psum-averaged over that axis (the DDP allreduce
    equivalent; reference main_C_TUNet.py:196-198 + utils/utils.py:42-69).
    ``remat``: rematerialize the forward in the backward pass
    (jax.checkpoint) — trades FLOPs for HBM, enabling larger crops/batches.
    """
    loss_impl = LOSS_FNS[model_name]

    def train_step(state: TrainState, image, label, lr):
        def loss_fn(params):
            apply = state.apply_fn
            if remat:
                apply = jax.checkpoint(apply)
            outs = apply({"params": params}, image)
            return loss_impl(outs, label, smooth_nr=smooth_nr, smooth_dr=smooth_dr)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            loss = jax.lax.pmean(loss, pmean_axis)
            aux = jax.lax.pmean(aux, pmean_axis)
        state = set_learning_rate(state, lr)
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, **aux}
        return state, metrics

    return train_step
