"""Persistent XLA compilation cache.

First compilation of the full-size models is expensive (the driver host has a
single CPU core; the 174M-param CTUNet sliding-window program takes tens of
minutes to build). Enabling JAX's on-disk compilation cache makes every
subsequent process start hit the cache instead.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None and jax.default_backend() == "cpu":
        # CPU AOT artifacts are host-machine-feature specific (loading them
        # on a different host can SIGILL) — scope the CPU cache per host
        # under /tmp instead of the repo directory.
        import socket

        cache_dir = f"/tmp/hybrid_ctunet_jax_cache_{socket.gethostname()}"
    cache_dir = cache_dir or os.environ.get(
        "HYBRID_CTUNET_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
