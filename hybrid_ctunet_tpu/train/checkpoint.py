"""Checkpoint save/load with the reference's semantics.

The reference saves ``{"epoch", "best_acc", "state_dict", "optimizer",
"scheduler"}`` (trainer_CTUNet.py:308-317), gated on new-best validation
metrics, into up to three files: ``model_hybrid.pt`` / ``model_res.pt`` /
``model_vit.pt`` (trainer_CTUNet.py:382-405). We keep the same trio of names
(as orbax directories) and payload fields; the per-epoch LR schedule is a pure
function of the epoch so no scheduler state is needed.

Also supports importing reference torch checkpoints directly
(``--checkpoint`` / ``--resume_ckpt`` paths ending in ``.pt``) via
utils.torch_import.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    directory: str,
    filename: str,
    state: TrainState,
    *,
    epoch: int,
    best_acc: float,
) -> str:
    """Save params+optimizer+metadata under ``directory/filename`` (the orbax
    analogue of the reference's torch.save of the same dict)."""
    path = os.path.abspath(os.path.join(directory, filename))
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "best_acc": float(best_acc),
    }
    if getattr(state, "batch_stats", None) is not None:
        # --norm_name batch: BatchNorm running buffers (torch saves them
        # inside state_dict; orbax keeps them as a sibling collection)
        payload["batch_stats"] = jax.device_get(state.batch_stats)
    ckpt = _checkpointer()
    ckpt.save(path, payload, force=True)
    return path


def load_checkpoint(path: str, state: Optional[TrainState] = None) -> Dict[str, Any]:
    """Load a checkpoint saved by :func:`save_checkpoint`. If ``state`` is
    given, the stored pytrees are restored with matching structure/dtypes."""
    ckpt = _checkpointer()
    if state is not None:
        template = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "step": 0,
            "epoch": 0,
            "best_acc": 0.0,
        }
        if getattr(state, "batch_stats", None) is not None:
            template["batch_stats"] = jax.device_get(state.batch_stats)
        restored = ckpt.restore(os.path.abspath(path), item=template)
    else:
        restored = ckpt.restore(os.path.abspath(path))
    return restored


def restore_train_state(state: TrainState, restored: Dict[str, Any]) -> TrainState:
    if restored.get("batch_stats") is not None:
        state = state.replace(batch_stats=restored["batch_stats"])
    return state.replace(
        params=restored["params"],
        opt_state=jax.tree.map(
            lambda t, r: np.asarray(r, getattr(t, "dtype", None)) if hasattr(t, "dtype") else r,
            state.opt_state,
            restored["opt_state"],
        ),
        step=int(restored.get("step", 0)),
    )


def load_params_from_torch(path: str, model_name: str, **kw):
    """Load weights from a reference ``.pt`` checkpoint (capability of
    --resume_ckpt / --checkpoint in the reference mains)."""
    from ..utils.torch_import import convert_reference_state_dict, load_torch_state_dict

    sd = load_torch_state_dict(path)
    return convert_reference_state_dict(sd, model_name, **kw)
