"""Activations matching the reference's choices.

LeakyReLU(negative_slope=0.01) everywhere in conv paths
(reference: networks/resnet.py:102, networks/hybrid_CTUNet.py:84);
exact (erf) GELU in all transformer MLPs (torch nn.GELU default,
reference: networks/vit.py:37).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, x * negative_slope)


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)
