"""Train state and optimizer factory.

Matches the reference's optimization setup (main_CTUNet.py:190-210): AdamW
(torch defaults: betas 0.9/0.999, eps 1e-8) with decoupled weight decay
applied to *all* params (torch AdamW semantics), lr from a per-epoch
warmup-cosine schedule. bf16 compute replaces AMP (no loss scaling needed on
TPU); params and optimizer state stay fp32.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState whose LR is injected per-step (computed from the epoch).

    ``batch_stats``: the model's running-stats collection when it has one
    (``--norm_name batch``); ``None`` for the stateless instance-norm models.
    Train steps apply with ``mutable=["batch_stats"]`` and fold the updated
    collection back in (the functional analogue of torch's buffer updates)."""

    batch_stats: Any = None


def make_optimizer(
    optim_name: str = "adamw",
    *,
    reg_weight: float = 1e-5,
    momentum: float = 0.99,
) -> optax.GradientTransformation:
    """Optimizers offered by the reference CLI (main_CTUNet.py:190-199):
    adam | adamw | sgd(nesterov). LR is injected via inject_hyperparams."""
    if optim_name == "adamw":
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=reg_weight
        )
    elif optim_name == "adam":
        # torch Adam(weight_decay=w) is L2-coupled: add w*p to the gradient.
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(reg_weight),
                optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
            )
        )(learning_rate=0.0)
    elif optim_name == "sgd":
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(reg_weight),
                optax.sgd(learning_rate, momentum=momentum, nesterov=True),
            )
        )(learning_rate=0.0)
    else:
        raise ValueError(f"Unsupported Optimization Procedure: {optim_name}")
    return base


def create_train_state(
    model,
    rng: jax.Array,
    example_input: jax.Array,
    *,
    optim_name: str = "adamw",
    reg_weight: float = 1e-5,
    momentum: float = 0.99,
) -> TrainState:
    variables = model.init(rng, example_input)
    tx = make_optimizer(optim_name, reg_weight=reg_weight, momentum=momentum)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"),
    )


def set_learning_rate(state: TrainState, lr) -> TrainState:
    """Functionally write the injected LR hyperparam (works under jit)."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))
