"""shard_map data-parallel training step + sharding helpers.

Replaces the reference's DDP machinery:
- gradient allreduce (implicit in DDP, main_C_TUNet.py:196-198) ->
  ``jax.lax.pmean`` over the ``data`` mesh axis inside shard_map;
- ``distributed_all_gather`` with ``is_valid`` masking for uneven final
  shards (utils/utils.py:42-69 + Sampler.valid_length, utils/data_utils.py:41)
  -> a per-sample validity mask ``psum``-weighted into the logged loss. Note
  the reference's DDP still averages *gradients* over padded duplicate
  samples; we reproduce exactly that (dup samples contribute to grads, the
  mask only corrects the logged loss), keeping training semantics identical.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..train.state import TrainState, set_learning_rate
from ..train.steps import LOSS_FNS, compute_grads


def make_dp_train_step(
    model_name: str,
    mesh: Mesh,
    *,
    axis: str = "data",
    smooth_nr: float = 0.0,
    smooth_dr: float = 1e-6,
    donate: bool = True,
    remat: bool = False,
    grad_accum: int = 1,
    dropout: bool = False,
    dropout_seed: int = 0,
) -> Callable:
    """Build a jitted data-parallel train step over ``mesh``.

    Signature: ``(state, image, label, valid, lr) -> (state, metrics)`` where
    ``image``/``label`` are global batches sharded over ``axis``, ``valid`` is
    a per-sample {0,1} mask (uneven-shard padding, reference Sampler
    semantics), and ``lr`` the epoch-scheduled learning rate. Params/opt-state
    are replicated; gradients are pmean'd over ICI.
    """
    loss_impl = LOSS_FNS[model_name]

    def step(state: TrainState, image, label, valid, lr):
        # per-step, per-shard dropout rng: each data shard draws independent
        # masks (the torch reference's per-GPU dropout noise is independent)
        rng = None
        if dropout:
            rng = jax.random.fold_in(jax.random.PRNGKey(dropout_seed), state.step)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        loss, aux, grads, new_bs = compute_grads(
            loss_impl, state, image, label,
            smooth_nr=smooth_nr, smooth_dr=smooth_dr, remat=remat, grad_accum=grad_accum,
            dropout_rng=rng,
        )
        # DDP semantics: every replica's gradient (including padded dup
        # samples) is averaged.
        grads = jax.lax.pmean(grads, axis)
        # Logged loss: validity-weighted mean across shards
        # (distributed_all_gather + is_valid, utils/utils.py:42-69).
        shard_valid = jnp.minimum(jnp.sum(valid), 1.0)  # this shard has real data?
        n_valid_shards = jnp.maximum(jax.lax.psum(shard_valid, axis), 1.0)
        logged_loss = jax.lax.psum(loss * shard_valid, axis) / n_valid_shards
        aux = {k: jax.lax.pmean(v, axis) for k, v in aux.items()}
        state = set_learning_rate(state, lr)
        state = state.apply_gradients(grads=grads)
        if new_bs is not None:
            # SyncBatchNorm ("batch:data"): the moments were pmean'd inside
            # the forward, so every shard computed identical buffers — the
            # replicated update needs no further collective.
            state = state.replace(batch_stats=new_bs)
        return state, {"loss": logged_loss, **aux}

    mapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def replicate_state(state, mesh: Mesh):
    """Place the train state replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_batch(batch, mesh: Mesh, *, axis: str = "data"):
    """Place a host batch sharded over the mesh's data axis (leading dim)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def unreplicate(tree):
    """Pull one replica of a replicated pytree to host-addressable form."""
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)


def all_gather_metrics(values, mesh: Mesh, *, axis: str = "data"):
    """Gather per-shard eval metrics to every device (replaces
    utils/utils.py:42-69 for validation dice aggregation)."""

    def gather(x):
        return jax.lax.all_gather(x, axis, tiled=True)

    fn = shard_map(
        lambda v: jax.tree_util.tree_map(gather, v),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(values)
