"""Parallelism layer — jax.sharding Mesh + shard_map data parallelism.

TPU-native replacement for the reference's process-per-GPU DDP/NCCL stack
(main_C_TUNet.py:104-121 mp.spawn + dist.init_process_group;
torch.nn.parallel.DistributedDataParallel main_C_TUNet.py:196-198;
utils/utils.py:42-69 distributed_all_gather). One process drives all local
chips; gradients ride ICI via ``jax.lax.pmean`` inside a shard_map-ped train
step; multi-host jobs use ``jax.distributed.initialize`` over DCN.
"""
from .mesh import make_mesh, initialize_distributed, is_main_process
from .dp import (
    make_dp_train_step,
    shard_batch,
    replicate_state,
    unreplicate,
    all_gather_metrics,
)

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "is_main_process",
    "make_dp_train_step",
    "shard_batch",
    "replicate_state",
    "unreplicate",
    "all_gather_metrics",
]
