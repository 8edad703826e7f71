"""Training entry (reference main_C_TUNet.py:100-249 / main_CTUNet.py:97-227).

One process drives the whole local mesh: ``--distributed`` switches the train
step to the shard_map DP step over a ``('data',)`` mesh (replacing mp.spawn +
DDP/NCCL, main_C_TUNet.py:104-121,191-198)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import get_loader
from ..parallel import make_dp_train_step, make_mesh, replicate_state, shard_batch
from ..train.steps import make_train_step
from ..train.trainer import TrainConfig, run_training
from .args import build_train_parser
from .factory import build_model, build_state, count_params


def main(entry: str = "ctunet", argv=None):
    parser = build_train_parser(entry)
    args = parser.parse_args(argv)
    args.test_mode = False
    args.amp = not args.noamp
    if entry == "ctunet":
        args.model_name = "ctunet"
    return main_worker(args)


def main_worker(args):
    # Multi-host bootstrap over DCN (reference main_C_TUNet.py:104-121:
    # dist.init_process_group over tcp:// rendezvous). Single-process jobs
    # (world_size <= 1) skip it — jax.process_count() stays 1. Must run
    # BEFORE the first jax.devices()/local_devices() call below.
    from ..parallel.mesh import initialize_distributed

    initialize_distributed(
        getattr(args, "dist_url", None),
        getattr(args, "world_size", 1),
        getattr(args, "rank", 0),
    )

    if getattr(args, "synthetic", False):
        from ..data.synthetic import write_synthetic_dataset

        os.makedirs(args.data_dir, exist_ok=True)
        path = write_synthetic_dataset(args.data_dir)
        args.json_list = os.path.basename(path)

    n_dev = len(jax.devices())
    use_dp = args.distributed and n_dev > 1

    # One process drives all local chips: the loader yields the GLOBAL batch
    # (batch_size cases per device), sharded over the mesh by the DP step.
    # Multi-host jobs shard the case list per process (reference Sampler).
    if use_dp:
        args.batch_size = args.batch_size * len(jax.local_devices())
    train_loader, val_cases = get_loader(
        args, num_replicas=jax.process_count(), rank=jax.process_index()
    )

    model = build_model(args)
    state, start_epoch, _best = build_state(args, model)
    print(f"Total parameters count {count_params(state.params)}")

    cfg = TrainConfig(
        model_name=args.model_name,
        max_epochs=args.max_epochs,
        warmup_epochs=args.warmup_epochs,
        val_every=args.val_every,
        optim_lr=args.optim_lr,
        lrschedule=args.lrschedule,
        grad_accum=args.grad_accum,
        roi_size=(args.roi_x, args.roi_y, args.roi_z),
        # the reference *ignores* --sw_batch_size during validation and
        # hardcodes 4 (trainer_CTUNet.py:189); keep that behavior
        sw_batch_size=4,
        infer_overlap=args.infer_overlap,
        logdir=os.path.join("./runs", args.logdir),
        out_channels=args.out_channels,
        save_checkpoint=args.save_checkpoint,
        dropout_rate=args.dropout_rate,
    )

    step_fn = None
    if use_dp:
        mesh = make_mesh()
        dp_step = make_dp_train_step(
            args.model_name, mesh, smooth_nr=args.smooth_nr, smooth_dr=args.smooth_dr,
            grad_accum=args.grad_accum, dropout=args.dropout_rate > 0,
        )
        state = replicate_state(state, mesh)

        def step_fn(state, image, label, lr):  # bind full-validity mask
            valid = jnp.ones((image.shape[0],), jnp.float32)
            im, lb, vd = shard_batch((image, label, valid), mesh)
            return dp_step(state, im, lb, vd, lr)

    else:
        step_fn = jax.jit(
            make_train_step(args.model_name, smooth_nr=args.smooth_nr,
                            smooth_dr=args.smooth_dr, grad_accum=args.grad_accum,
                            dropout=args.dropout_rate > 0),
            donate_argnums=(0,),
        )

    best = run_training(
        state,
        model,
        train_loader,
        val_cases,
        cfg,
        step_fn=step_fn,
        start_epoch=start_epoch,
    )
    print("best accuracies:", best)
    return best
