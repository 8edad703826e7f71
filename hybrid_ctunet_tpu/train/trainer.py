"""Training loop layer — run_training for CUNet / TUNet / CTUNet.

Behavior contract (reference trainer_CUNet.py:195-265, trainer_TUNet.py,
trainer_CTUNet.py:320-414):

- epoch loop over a TrainLoader with epoch-seeded shuffling
  (sampler.set_epoch);
- per-epoch LR from the linear-warmup + cosine schedule (stepped per epoch,
  not per step);
- every ``val_every`` epochs, whole-volume sliding-window validation
  (96^3 windows, sw_batch 4, gaussian), predictions inverted to the native
  label grid, per-organ Dice over classes 1..13;
- best-metric-gated checkpointing: CUNet -> ``model_res.pt``, TUNet ->
  ``model_vit.pt`` (trainer_CUNet.py:216-219); CTUNet tracks THREE best
  metrics/files: hybrid softmax-mean of both heads -> ``model_hybrid.pt``,
  res head -> ``model_res.pt``, vit head -> ``model_vit.pt``
  (trainer_CTUNet.py:339-341, 382-405);
- scalar logs with the reference tag names; rank-0 gating.

TPU-first differences from the reference (same semantics, better mapping):
deep-supervision targets are downscaled on device inside the jitted step (no
per-step CPU scipy.zoom, trainer_CTUNet.py:93-94), bf16 compute replaces AMP,
and the sliding-window engine is one jitted scan instead of a Python window
loop.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import invert_to_native
from ..eval.metrics import per_organ_dice
from ..infer.sliding_window import SlidingWindowEngine
from ..parallel.mesh import is_main_process
from ..train.checkpoint import save_checkpoint
from ..train.schedule import make_epoch_schedule
from ..train.steps import make_train_step
from ..utils.logging import AverageMeter, ScalarWriter


@dataclass
class TrainConfig:
    model_name: str = "ctunet"
    max_epochs: int = 5000
    warmup_epochs: int = 50
    val_every: int = 100
    optim_lr: float = 1e-4
    lrschedule: str = "warmup_cosine"
    grad_accum: int = 1
    roi_size: Tuple[int, int, int] = (96, 96, 96)
    sw_batch_size: int = 4
    infer_overlap: float = 0.5
    logdir: Optional[str] = None
    out_channels: int = 14
    save_checkpoint: bool = True
    save_latest: bool = True  # fault tolerance: periodic latest.pt for
    # restart-from-latest (SURVEY.md §5 — the reference has none)
    print_every: int = 1
    dropout_rate: float = 0.0  # reference --dropout_rate (e.g. dr0.2 config)
    # device->host metric fetches are ~26 ms each through the axon tunnel and
    # serialize dispatch; drain the loss buffer every N steps instead of per
    # step (the per-step print lines still appear, in batches)
    fetch_every: int = 8


@dataclass
class ValCase:
    """One validation case: preprocessed image volume + native-grid label +
    inversion metadata."""

    image: np.ndarray  # (X, Y, Z) preprocessed
    label: np.ndarray  # native-grid label (labels are NOT resampled in val)
    meta: object  # CaseMeta for invert_to_native
    name: str = ""


def train_epoch(step_fn, state, loader, lr, *, epoch: int, verbose: bool = True,
                fetch_every: int = 8):
    """One epoch of jitted steps; returns (state, mean loss).

    Loss scalars stay on device and are fetched every ``fetch_every`` steps:
    a per-step ``float(...)`` costs a ~26 ms host round-trip through the
    remote tunnel AND serializes dispatch (the device idles while the host
    waits). The reference's per-step print lines are preserved — they appear
    in drained batches with the true per-step values."""
    meter = AverageMeter()
    pending = []  # (device loss, batch n, step idx, host dispatch dt)
    n_batches = len(loader)
    t0 = time.time()

    def drain():
        for loss_dev, n, idx, dt in pending:
            loss = float(loss_dev)
            meter.update(loss, n=n)
            if verbose and is_main_process():
                print(f"Epoch {epoch} {idx}/{n_batches} loss: {loss:.4f} time {dt:.2f}s")
        pending.clear()

    for i, (image, label) in enumerate(loader):
        state, metrics = step_fn(
            state, jnp.asarray(image[..., None] if image.ndim == 4 else image),
            jnp.asarray(label[..., None] if label.ndim == 4 else label), lr
        )
        pending.append((metrics["loss"], image.shape[0], i, time.time() - t0))
        t0 = time.time()
        if len(pending) >= max(fetch_every, 1):
            drain()
    drain()
    return state, float(meter.avg)


def _dice_of_logits(native_logits: np.ndarray, label: np.ndarray, n_classes: int) -> np.ndarray:
    pred = np.argmax(native_logits, axis=-1)
    return per_organ_dice(pred, label, n_classes=n_classes)


def make_val_engine(model, cfg: TrainConfig, *, dual_output: bool) -> SlidingWindowEngine:
    """Engine whose predictor takes params at CALL time (never bakes weights
    into the compiled program)."""

    def predictor(x, params):
        # `params` is the params collection, or a full variables dict
        # ({"params": ..., "batch_stats": ...}) for --norm_name batch models
        # (eval-mode BatchNorm needs its running buffers; immutably applied
        # = torch model.eval()).
        variables = params if "params" in params else {"params": params}
        outs = model.apply(variables, x)
        if dual_output:
            return outs[0][0], outs[1][0]
        return outs[0]

    return SlidingWindowEngine(
        predictor,
        cfg.roi_size,
        sw_batch_size=cfg.sw_batch_size,
        overlap=cfg.infer_overlap,
        mode="gaussian",
        num_outputs=2 if dual_output else 1,
    )


def val_epoch(
    engine: SlidingWindowEngine,
    params,
    val_cases: Sequence[ValCase],
    cfg: TrainConfig,
    *,
    dual_output: bool,
):
    """Whole-volume validation. For dual-output (CTUNet) returns
    (acc_hybrid, acc_res, acc_vit); else (acc,). Accuracies are mean per-organ
    dice over cases (classes 1..n-1), reference val_epoch/val_epoch_hybrid."""
    accs: List[List[float]] = [[] for _ in range(3 if dual_output else 1)]
    for case in val_cases:
        img = np.asarray(case.image)
        vol = jnp.asarray(img if img.ndim == 4 else img[..., None])[None]
        lab = np.asarray(case.label)
        lab = lab[..., 0] if lab.ndim == 4 else lab
        outs = engine(vol, params)
        if dual_output:
            res_map, vit_map = (np.asarray(o[0]) for o in outs)
            res_nat = invert_to_native(res_map, case.meta)
            vit_nat = invert_to_native(vit_map, case.meta)
            prob = (_softmax(res_nat) + _softmax(vit_nat)) / 2.0
            d_h = per_organ_dice(np.argmax(prob, -1), lab, n_classes=cfg.out_channels)
            d_r = _dice_of_logits(res_nat, lab, cfg.out_channels)
            d_v = _dice_of_logits(vit_nat, lab, cfg.out_channels)
            for a, d in zip(accs, (d_h, d_r, d_v)):
                a.append(float(np.mean(d)))
        else:
            out = np.asarray(outs[0][0])
            nat = invert_to_native(out, case.meta)
            d = _dice_of_logits(nat, lab, cfg.out_channels)
            accs[0].append(float(np.mean(d)))
    return tuple(float(np.mean(a)) for a in accs)


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


def run_training(
    state,
    model,
    train_loader,
    val_cases: Sequence[ValCase],
    cfg: TrainConfig,
    *,
    step_fn: Optional[Callable] = None,
    start_epoch: int = 0,
    logdir: Optional[str] = None,
    ckpt_dir: Optional[str] = None,
) -> Dict[str, float]:
    """The reference run_training contract. Returns the best accuracies.

    ``step_fn`` defaults to the single-device jitted step; pass a
    shard_map-ped DP step (parallel.make_dp_train_step) for multi-chip — its
    extra ``valid`` argument is bound by the caller.
    """
    model_name = cfg.model_name
    dual = model_name == "ctunet"
    if step_fn is None:
        step_fn = jax.jit(
            make_train_step(
                model_name, grad_accum=cfg.grad_accum, dropout=cfg.dropout_rate > 0
            ),
            donate_argnums=(0,),
        )

    writer = ScalarWriter(logdir or cfg.logdir, enabled=is_main_process())
    ckpt_dir = ckpt_dir or (logdir or cfg.logdir) or "."

    engine = make_val_engine(model, cfg, dual_output=dual)
    schedule = make_epoch_schedule(
        cfg.lrschedule,
        base_lr=cfg.optim_lr,
        warmup_epochs=cfg.warmup_epochs,
        max_epochs=cfg.max_epochs,
    )
    best = {"hybrid": 0.0, "res": 0.0, "vit": 0.0} if dual else {"acc": 0.0}

    for epoch in range(start_epoch, cfg.max_epochs):
        train_loader.set_epoch(epoch)
        lr = schedule(epoch)
        t0 = time.time()
        state, train_loss = train_epoch(
            step_fn, state, train_loader, lr, epoch=epoch,
            verbose=cfg.print_every > 0, fetch_every=cfg.fetch_every,
        )
        if is_main_process():
            print(
                f"Final training  {epoch}/{cfg.max_epochs - 1} loss: {train_loss:.4f} "
                f"time {time.time() - t0:.2f}s"
            )
        writer.add_scalar("train_loss", train_loss, epoch)

        if cfg.save_latest and cfg.save_checkpoint and (epoch + 1) % cfg.val_every == 0:
            if is_main_process():
                save_checkpoint(ckpt_dir, "latest.pt", state, epoch=epoch + 1,
                                best_acc=max(best.values()))

        if (epoch + 1) % cfg.val_every == 0 and len(val_cases) > 0:
            eval_vars = (
                {"params": state.params, "batch_stats": state.batch_stats}
                if state.batch_stats is not None else state.params
            )
            accs = val_epoch(engine, eval_vars, val_cases, cfg, dual_output=dual)
            if dual:
                acc_h, acc_r, acc_v = accs
                writer.add_scalar("val_acc_hybrid", acc_h, epoch)
                writer.add_scalar("val_acc_res", acc_r, epoch)
                writer.add_scalar("val_acc_vit", acc_v, epoch)
                if is_main_process():
                    for key, acc, fname in (
                        ("hybrid", acc_h, "model_hybrid.pt"),
                        ("res", acc_r, "model_res.pt"),
                        ("vit", acc_v, "model_vit.pt"),
                    ):
                        if acc > best[key]:
                            print(f"new best ({best[key]:.6f} --> {acc:.6f})")
                            best[key] = acc
                            if cfg.save_checkpoint:
                                save_checkpoint(
                                    ckpt_dir, fname, state, epoch=epoch, best_acc=acc
                                )
            else:
                (acc,) = accs
                writer.add_scalar("val_acc", acc, epoch)
                if is_main_process() and acc > best["acc"]:
                    print(f"new best ({best['acc']:.6f} --> {acc:.6f})")
                    best["acc"] = acc
                    if cfg.save_checkpoint:
                        # model_res.pt for cunet, model_vit.pt for tunet
                        # (trainer_CUNet.py:216-219)
                        fname = "model_res.pt" if model_name == "cunet" else "model_vit.pt"
                        save_checkpoint(ckpt_dir, fname, state, epoch=epoch, best_acc=acc)

    writer.close()
    return best
