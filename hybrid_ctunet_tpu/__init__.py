"""hybrid_ctunet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of Hybrid-CTUNet.

A standalone framework for 3D medical-image segmentation (BTCV multi-organ CT)
providing the full capability surface of the reference PyTorch/MONAI pipeline
(shouwangzhe134/Hybrid-CTUNet), re-designed TPU-first:

- ``ops``      — SAME-padding 3D conv/transposed-conv, instance/layer norm,
                 DiceCE loss, windowed multi-axis attention, 3D pixel-shuffle,
                 binary cross-weight ("pixelweight") fusion, gaussian
                 importance maps. Pallas kernels for the hot fused ops.
- ``models``   — CUNet (3D-ResNet U-Net), TUNet (3D-ViT U-Net), CTUNet
                 (dual-branch with per-level pixelweight fusion), all as
                 flax.linen modules in channels-last (NDHWC) layout.
- ``train``    — jitted train steps, AdamW + linear-warmup/cosine schedule,
                 orbax checkpointing with the reference's 3-best-file
                 semantics (model_hybrid / model_res / model_vit).
- ``infer``    — a fully-jitted batched sliding-window inference engine with
                 gaussian blending (single- and dual-output predictors) and
                 the Hybrid-CTUNet softmax-mean mask-complementation ensemble.
- ``data``     — native NIfTI IO, RAS orientation, affine spacing resample,
                 intensity windowing, foreground crop, pos/neg-balanced random
                 crops, flip/rot90/intensity augmentation, invertibility
                 metadata, in-RAM cache dataset.
- ``parallel`` — jax.sharding Mesh + shard_map data-parallel training with
                 psum collectives (replaces DDP/NCCL).
- ``utils``    — Dice/HD95 metrics, nnU-Net-style largest-connected-component
                 postprocessing, scalar logging.
"""

__version__ = "0.1.0"
