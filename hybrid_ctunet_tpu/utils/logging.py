"""Scalar logging — the observability equivalent of the reference's
tensorboardX SummaryWriter (trainer_CTUNet.py:331-335, 358-359, 378-381).

Writes JSONL scalars (always) and TensorBoard events when a TB backend is
importable. Scalar tag names match the reference: ``train_loss``,
``val_acc`` (single-branch trainers), ``val_acc_hybrid`` / ``val_acc_res`` /
``val_acc_vit`` (CTUNet trainer).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


def _try_tb_writer(logdir: str):
    try:
        from tensorboardX import SummaryWriter  # noqa

        return SummaryWriter(logdir=logdir)
    except Exception:
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa

        return SummaryWriter(log_dir=logdir)
    except Exception:
        return None


class ScalarWriter:
    """add_scalar-compatible writer: JSONL + optional TensorBoard."""

    def __init__(self, logdir: Optional[str], enabled: bool = True):
        self.enabled = enabled and logdir is not None
        self._tb = None
        self._f = None
        if self.enabled:
            os.makedirs(logdir, exist_ok=True)
            self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")
            self._tb = _try_tb_writer(logdir)

    def add_scalar(self, tag: str, value, step: int):
        if not self.enabled:
            return
        self._f.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "ts": time.time()})
            + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()


class AverageMeter:
    """Running average (reference utils/utils.py:25-38)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        import numpy as np

        self.val = val
        self.sum += np.asarray(val) * n
        self.count += n
        self.avg = np.where(self.count > 0, self.sum / max(self.count, 1), self.sum)
