"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes a backend (SURVEY.md §4:
distributed tests use ``xla_force_host_platform_device_count``).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The machine image pre-imports jax (sitecustomize on PYTHONPATH) with the TPU
# platform pinned, so the env var alone is not enough — force via config too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Persistent compilation cache: repeated test runs on this 1-core host skip
# recompilation of the heavier model programs.
from hybrid_ctunet_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()
