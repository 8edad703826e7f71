"""On-device nearest-neighbour volume resampling.

The reference round-trips deep-supervision targets through CPU scipy every
training step (``ndimage.zoom(target.cpu().numpy(), (1,1,.5,.5,1), order=0,
prefilter=False)`` — trainer_CTUNet.py:93-94) and uses the same op to map
predictions to native grids (``resample_3d``, trainer_CTUNet.py:43-48). Here
the resample is a pure gather that stays on device and fuses under jit.

scipy.ndimage.zoom semantics reproduced exactly (default grid_mode=False):
  out_size  = round(in_size * zoom)  (scipy: int(round(...)))
  coordinate map: out index i -> input coord i * (in-1)/(out-1)  (out > 1)
  order=0 -> spline of order 0 == floor(coord + 0.5) lookup.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _zoom_out_size(in_size: int, zoom: float) -> int:
    return int(round(in_size * zoom))


def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    if out_size <= 1:
        return np.zeros((max(out_size, 1),), dtype=np.int32)
    coords = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    idx = np.floor(coords + 0.5).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def zoom_nearest(x: jax.Array, zoom: Sequence[float]) -> jax.Array:
    """Nearest-neighbour zoom over the trailing len(zoom)-matched axes.

    ``zoom`` has one entry per axis of ``x`` (use 1.0 for axes to keep),
    matching scipy.ndimage.zoom(x, zoom, order=0, prefilter=False).
    """
    assert len(zoom) == x.ndim, f"zoom {zoom} must cover all {x.ndim} axes"
    for axis, z in enumerate(zoom):
        in_size = x.shape[axis]
        out_size = _zoom_out_size(in_size, float(z))
        if out_size == in_size and float(z) == 1.0:
            continue
        idx = jnp.asarray(_nearest_indices(in_size, out_size))
        x = jnp.take(x, idx, axis=axis)
    return x


def resample_3d_nearest(x: jax.Array, target_size: Tuple[int, int, int]) -> jax.Array:
    """Resample a 3D volume to ``target_size`` by nearest lookup
    (reference trainer_CTUNet.py:43-48 ``resample_3d``)."""
    assert x.ndim == 3
    for axis, out_size in enumerate(target_size):
        idx = jnp.asarray(_nearest_indices(x.shape[axis], int(out_size)))
        x = jnp.take(x, idx, axis=axis)
    return x


def downscale_labels(labels: jax.Array, spatial_zoom: Tuple[float, float, float]) -> jax.Array:
    """Deep-supervision target downscale for channels-last (B, X, Y, Z[, 1]) labels.

    Equivalent to the reference's per-step CPU zoom with factors
    (1, 1, zx, zy, zz) in NCDHW (trainer_CTUNet.py:93-94), kept on device.
    """
    if labels.ndim == 5:
        zoom = (1.0, *spatial_zoom, 1.0)
    elif labels.ndim == 4:
        zoom = (1.0, *spatial_zoom)
    else:
        raise ValueError(f"labels must be (B,X,Y,Z[,1]); got {labels.shape}")
    return zoom_nearest(labels, zoom)
