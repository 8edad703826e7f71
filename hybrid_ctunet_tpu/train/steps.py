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


def compute_grads(loss_impl, state, image, label, *, smooth_nr, smooth_dr,
                  remat=False, grad_accum=1, dropout_rng=None):
    """(loss, aux, grads, new_batch_stats) with optional remat and exact
    lax.scan gradient accumulation over microbatches (see make_train_step
    docstring).

    ``dropout_rng``: when given, the forward runs with deterministic=False
    and this rng feeds the 'dropout' collection (reference trains with
    --dropout_rate, e.g. the shipped CTUNet_ds8_dr0.2 checkpoints).

    ``new_batch_stats`` is None for the stateless instance-norm models; with
    --norm_name batch the forward applies with mutable batch_stats (torch
    train-mode semantics) and the updated running buffers are returned. With
    grad_accum > 1 the buffers fold sequentially across microbatches (each
    microbatch normalizes over its own samples — torch-with-accumulation
    semantics; the reference itself never accumulates)."""

    def make_loss_fn(rng, bstats):
        def loss_fn(params, im, lb):
            def apply(variables, x):
                kw = {}
                if rng is not None:
                    kw = dict(deterministic=False, rngs={"dropout": rng})
                if bstats is not None:
                    outs, upd = state.apply_fn(
                        {**variables, "batch_stats": bstats}, x,
                        mutable=["batch_stats"], **kw,
                    )
                    return outs, upd["batch_stats"]
                return state.apply_fn(variables, x, **kw), None

            if remat:
                apply = jax.checkpoint(apply)
            outs, new_bs = apply({"params": params}, im)
            loss, aux = loss_impl(outs, lb, smooth_nr=smooth_nr, smooth_dr=smooth_dr)
            return loss, (aux, new_bs)

        return loss_fn

    loss_fn = make_loss_fn(dropout_rng, state.batch_stats)

    if grad_accum <= 1:
        (loss, (aux, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, image, label
        )
        return loss, aux, grads, new_bs

    B = image.shape[0]
    assert B % grad_accum == 0, (B, grad_accum)
    mb = B // grad_accum
    im_mb = image.reshape(grad_accum, mb, *image.shape[1:])
    lb_mb = label.reshape(grad_accum, mb, *label.shape[1:])

    # fresh dropout masks per microbatch (a full-batch forward would draw
    # independent noise for each sample; fold the microbatch index in)
    mb_rngs = (
        jax.vmap(lambda i: jax.random.fold_in(dropout_rng, i))(jnp.arange(grad_accum))
        if dropout_rng is not None
        else jnp.zeros((grad_accum, 2), jnp.uint32)
    )

    def micro(carry, xs):
        g_acc, l_acc, a_acc, bs = carry
        im, lb, rng = xs
        fn = make_loss_fn(rng if dropout_rng is not None else None, bs)
        (l, (a, new_bs)), g = jax.value_and_grad(fn, has_aux=True)(state.params, im, lb)
        g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
        a_acc = jax.tree_util.tree_map(jnp.add, a_acc, a)
        return (g_acc, l_acc + l, a_acc, new_bs if bs is not None else bs), None

    zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    _, (a0, _) = jax.eval_shape(lambda p: loss_fn(p, im_mb[0], lb_mb[0]), state.params)
    zeros_a = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), a0)
    (grads, loss, aux, new_bs), _ = jax.lax.scan(
        micro, (zeros_g, 0.0, zeros_a, state.batch_stats), (im_mb, lb_mb, mb_rngs)
    )
    inv = 1.0 / grad_accum
    grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
    aux = jax.tree_util.tree_map(lambda a: a * inv, aux)
    return loss * inv, aux, grads, new_bs


def make_train_step(model_name: str, *, smooth_nr: float = 0.0, smooth_dr: float = 1e-6,
                    pmean_axis: str | None = None, remat: bool = False,
                    grad_accum: int = 1, dropout: bool = False,
                    dropout_seed: int = 0) -> Callable:
    """Build a jittable (state, image, label, lr) -> (state, metrics) step.

    ``pmean_axis``: when running under shard_map over a data mesh axis, the
    gradients/metrics are psum-averaged over that axis (the DDP allreduce
    equivalent; reference main_C_TUNet.py:196-198 + utils/utils.py:42-69).
    ``remat``: rematerialize the forward in the backward pass
    (jax.checkpoint) — trades FLOPs for HBM, enabling larger crops/batches.
    ``grad_accum``: split the batch into this many microbatches and
    lax.scan-accumulate gradients before ONE optimizer update. Exact math
    here: instance norm and the DiceCE losses have no cross-sample coupling,
    so mean-of-microbatch-grads == full-batch grad. Peak activation memory
    drops to one microbatch — how the reference's batch-1x4-crops step fits
    a 16 GB chip (a full 4-crop bf16 CTUNet backward needs ~32 GB).
    """
    loss_impl = LOSS_FNS[model_name]

    def train_step(state: TrainState, image, label, lr):
        # per-step dropout rng derived from the step counter: deterministic,
        # resume-stable, and requires no signature change for the trainers
        rng = (
            jax.random.fold_in(jax.random.PRNGKey(dropout_seed), state.step)
            if dropout
            else None
        )
        loss, aux, grads, new_bs = compute_grads(
            loss_impl, state, image, label,
            smooth_nr=smooth_nr, smooth_dr=smooth_dr, remat=remat, grad_accum=grad_accum,
            dropout_rng=rng,
        )
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            loss = jax.lax.pmean(loss, pmean_axis)
            aux = jax.lax.pmean(aux, pmean_axis)
        state = set_learning_rate(state, lr)
        state = state.apply_gradients(grads=grads)
        if new_bs is not None:
            state = state.replace(batch_stats=new_bs)
        metrics = {"loss": loss, **aux}
        return state, metrics

    return train_step
