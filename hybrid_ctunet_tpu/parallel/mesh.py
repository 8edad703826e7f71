"""Device mesh construction + multi-host bootstrap.

The reference launches one Python process per GPU with a TCP rendezvous
(main_C_TUNet.py:104-121) and gates side effects on ``args.rank == 0``.
On TPU one process drives all local chips, the mesh is the unit of
parallelism, and ``jax.process_index() == 0`` is the rank-0 gate.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap over DCN (replaces dist.init_process_group,
    main_C_TUNet.py:119-121). No-op for single-process jobs.

    ``coordinator_address`` accepts the reference's ``--dist-url`` form
    (``tcp://host:port``) as well as the bare ``host:port`` jax expects."""
    if num_processes is None or num_processes <= 1:
        return
    if coordinator_address:
        coordinator_address = coordinator_address.split("://")[-1]
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    """Rank-0 gate for checkpoint writes / logging (reference ``args.rank==0``,
    trainer_CTUNet.py:378-405)."""
    return jax.process_index() == 0


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    *,
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Default: a 1-D ``('data',)`` mesh over every addressable device — the
    TPU-native equivalent of the reference's pure data parallelism
    (SURVEY.md §2.4: DDP is the only parallelism the reference has).
    ``axis_sizes`` reshapes the device list for multi-axis meshes
    (e.g. ``((4, 2), ('data', 'window'))`` on a v5e-8).
    """
    devices = list(jax.devices() if devices is None else devices)
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    axis_sizes = tuple(int(s) for s in axis_sizes)
    if int(np.prod(axis_sizes)) != len(devices):
        raise ValueError(
            f"mesh axis sizes {axis_sizes} do not cover {len(devices)} devices"
        )
    if len(axis_sizes) != len(axis_names):
        raise ValueError(f"{len(axis_sizes)} sizes vs {len(axis_names)} names")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)
