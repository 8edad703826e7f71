"""Does the axon remote compile/load service parallelize? (round-4 warmup
hunt.) Warm the CTUNet and TUNet engines on FRESH canvas shapes (novel z
extents -> novel HLO -> guaranteed cold in both caches) serially vs from two
threads, and compare wall time. If parallel ~= max(a, b), bench.py should warm
its two engines concurrently.

Usage: python tools/probe_parallel_warm.py
"""
from __future__ import annotations

import sys
import threading
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()


def main():
    from hybrid_ctunet_tpu.infer.sliding_window import SlidingWindowEngine
    from hybrid_ctunet_tpu.models import CTUNet, TUNet
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks

    set_remat_blocks(False)
    dtype = jnp.bfloat16
    ctunet = CTUNet(out_channels=14, model_depth=101, patch_frame=8, dtype=dtype)
    tunet = TUNet(out_channels=14, patch_frame=8, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    patch = jnp.zeros((1, 96, 96, 96, 1), dtype)
    ct_params = jax.jit(ctunet.init)(rng, patch)["params"]
    tu_params = jax.jit(tunet.init)(rng, patch)["params"]

    def ct_fwd(x, params):
        (res, _, _), _ = ctunet.apply({"params": params}, x.astype(dtype))
        return res

    def tu_fwd(x, params):
        vit, _ = tunet.apply({"params": params}, x.astype(dtype))
        return vit

    def warm(which, z):
        """Run one volume at a NOVEL z extent (bucket 4 -> unique canvas)."""
        eng = SlidingWindowEngine(
            ct_fwd if which == "ct" else tu_fwd, (96, 96, 96), sw_batch_size=8,
            overlap=0.5 if which == "ct" else 0.7, mode="gaussian",
            num_outputs=1, canvas_bucket=4,
        )
        vol = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, z, 1), jnp.float32)
        (m,) = eng(vol, ct_params if which == "ct" else tu_params)
        jax.block_until_ready(m)

    # serial pair on fresh shapes
    t0 = time.time()
    warm("ct", 140)
    t_ct = time.time() - t0
    t0 = time.time()
    warm("tu", 140)
    t_tu = time.time() - t0
    print(f"serial: ct {t_ct:.1f}s + tu {t_tu:.1f}s = {t_ct + t_tu:.1f}s", flush=True)

    # parallel pair on two other fresh shapes
    t0 = time.time()
    th1 = threading.Thread(target=warm, args=("ct", 148))
    th2 = threading.Thread(target=warm, args=("tu", 148))
    th1.start(); th2.start(); th1.join(); th2.join()
    print(f"parallel: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
