"""Model/state construction from a parsed args namespace (the model-select +
optimizer blocks of the reference mains: main_C_TUNet.py:132-219,
main_CTUNet.py:128-208)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..models import CTUNet, CUNet, TUNet
from ..train.checkpoint import load_checkpoint, load_params_from_torch, restore_train_state
from ..train.state import create_train_state


def model_dtype(args):
    # reference: AMP on by default, --noamp disables -> bf16 unless --noamp
    return jnp.float32 if getattr(args, "noamp", False) else jnp.bfloat16


def build_model(args):
    name = args.model_name
    norm = getattr(args, "norm_name", "instance")
    if norm not in ("instance", "batch"):
        raise SystemExit(
            f"--norm_name {norm!r} is not supported: 'instance' (the "
            "reference default) and 'batch' (BatchNorm3d; SyncBatchNorm "
            "under --distributed, reference main_C_TUNet.py:193-194) are "
            "implemented."
        )
    if norm == "batch" and getattr(args, "distributed", False):
        # SyncBatchNorm: batch moments pmean over the data mesh axis inside
        # the shard_map'd train step (= convert_sync_batchnorm under DDP).
        norm = "batch:data"
    common = dict(out_channels=args.out_channels, dtype=model_dtype(args),
                  norm_name=norm)
    vit_kw = dict(
        img_size=(args.roi_x, args.roi_y),
        frames=args.roi_z,
        patch_frame=args.patch_frame,
        hidden_size=args.hidden_size,
        num_depths=args.num_depths,
        mlp_dim=args.mlp_dim,
        num_heads=args.num_heads,
        dropout_rate=args.dropout_rate,
        dim_conv_stem=args.feature_size,
        window=getattr(args, "window", 6),
    )
    if name == "cunet":
        return CUNet(model_depth=args.model_depths, **common)
    if name == "tunet":
        return TUNet(**vit_kw, **common)
    if name == "ctunet":
        return CTUNet(model_depth=args.model_depths, **vit_kw, **common)
    raise ValueError(f"Unsupported model_name: {name!r} (cunet | tunet | ctunet)")


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def build_state(args, model, example_shape=None):
    """Init params + optimizer; handle --checkpoint / --resume_ckpt restores
    (main_C_TUNet.py:154-187). Torch ``.pt`` checkpoints are imported through
    utils.torch_import; orbax checkpoints restore optimizer state too."""
    roi = (args.roi_x, args.roi_y, args.roi_z)
    example = jnp.zeros((1, *roi, args.in_channels), jnp.float32)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        example,
        optim_name=args.optim_name,
        reg_weight=args.reg_weight,
        momentum=args.momentum,
    )
    start_epoch, best_acc = 0, 0.0

    if getattr(args, "resume_jit", False):
        # reference main_C_TUNet.py:159-163 loads a TorchScript archive;
        # TorchScript has no JAX/TPU equivalent — fail loudly instead of
        # silently training from scratch
        raise SystemExit(
            "--resume_jit loads a TorchScript module (reference main_C_TUNet.py:159); "
            "TorchScript is not executable on the TPU stack. Export the weights to a "
            "state_dict .pt and use --resume_ckpt instead."
        )
    if getattr(args, "resume_ckpt", False):
        # reference main_C_TUNet.py:154-157: weights-only load from
        # pretrained_dir/pretrained_model_name
        ppath = os.path.join(args.pretrained_dir, args.pretrained_model_name)
        loaded = load_eval_params(args, args.model_name, ppath)
        if isinstance(loaded, dict) and "params" in loaded:
            state = state.replace(params=loaded["params"],
                                  batch_stats=loaded.get("batch_stats"))
        else:
            state = state.replace(params=loaded)
        print("Use pretrained weights")

    path = getattr(args, "checkpoint", None)
    if path:
        # orbax checkpoints are directories (even when named *.pt to match
        # the reference filenames); torch checkpoints are files
        if not os.path.isdir(path) and (path.endswith(".pt") or path.endswith(".pth")):
            params = load_params_from_torch(path, args.model_name,
                                            model_depth=args.model_depths)
            state = state.replace(params=params)
            print(f"=> loaded torch checkpoint {path}")
        else:
            restored = load_checkpoint(path, state)
            state = restore_train_state(state, restored)
            start_epoch = int(restored.get("epoch", 0))
            best_acc = float(restored.get("best_acc", 0.0))
            print(f"=> loaded checkpoint {path} (epoch {start_epoch}) (bestacc {best_acc})")
    return state, start_epoch, best_acc


def load_eval_params(args, model_name: str, path: str):
    """Weights-only load for the test scripts (reference test_* model load).
    Directories are orbax checkpoints; files are reference torch .pt."""
    if not os.path.isdir(path) and (path.endswith(".pt") or path.endswith(".pth")):
        return load_params_from_torch(path, model_name, model_depth=args.model_depths)
    restored = load_checkpoint(path)
    if restored.get("batch_stats") is not None:
        # --norm_name batch checkpoint: eval needs the running buffers too
        return {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    return restored["params"]
