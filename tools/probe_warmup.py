"""Instrument bench.py's warmup path step by step to locate the ~200 s that
the compile log cannot see (round-4: persistent cache shows 0 misses yet the
driver-style warmup takes ~200 s).

Usage: python tools/probe_warmup.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    from hybrid_ctunet_tpu.infer.sliding_window import SlidingWindowEngine
    from hybrid_ctunet_tpu.models import CTUNet, TUNet
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks
    from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    set_remat_blocks(False)
    mark("imports done")

    dtype = jnp.bfloat16
    ctunet = CTUNet(out_channels=14, model_depth=101, patch_frame=8, dtype=dtype)
    tunet = TUNet(out_channels=14, patch_frame=8, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    patch = jnp.zeros((1, 96, 96, 96, 1), dtype)
    ct_params = jax.jit(ctunet.init)(rng, patch)["params"]
    tu_params = jax.jit(tunet.init)(rng, patch)["params"]
    mark("init dispatched")
    jax.block_until_ready(jax.tree_util.tree_leaves(ct_params)[0])
    mark("init ready (block_until_ready)")

    def ct_fwd(x, params):
        (res, _, _), _ = ctunet.apply({"params": params}, x.astype(dtype))
        return res

    def tu_fwd(x, params):
        vit, _ = tunet.apply({"params": params}, x.astype(dtype))
        return vit

    eng_ct = SlidingWindowEngine(
        ct_fwd, (96, 96, 96), sw_batch_size=8, overlap=0.5, mode="gaussian", num_outputs=1
    )
    eng_tu = SlidingWindowEngine(
        tu_fwd, (96, 96, 96), sw_batch_size=8, overlap=0.7, mode="gaussian", num_outputs=1
    )
    volume = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 128, 1), jnp.float32)
    mark("volume created")

    # --- replicate engine __call__ with marks (CTUNet engine) ---
    import numpy as np

    from hybrid_ctunet_tpu.infer.sliding_window import (
        _pad_amounts,
        dense_patch_starts,
        get_scan_interval,
    )

    image_size = volume.shape[1:4]
    lo, hi = _pad_amounts(image_size, (96, 96, 96))
    padded_size = tuple(i + l + h for i, l, h in zip(image_size, lo, hi))
    interval = get_scan_interval(padded_size, (96, 96, 96), 0.5)
    starts = dense_patch_starts(padded_size, (96, 96, 96), interval)
    mark(f"grid done ({len(starts)} windows)")
    canvas = tuple(-(-d // 64) * 64 for d in padded_size)
    pad_cfg = [(0, 0)] + [
        (l, h + c - p) for l, h, c, p in zip(lo, hi, canvas, padded_size)
    ] + [(0, 0)]
    padded = jnp.pad(volume, pad_cfg)
    mark("volume padded (dispatched)")
    jax.block_until_ready(padded)
    mark("volume padded (ready)")

    key = (canvas, 1)
    eng_ct._jitted[key] = eng_ct._build(canvas, 0, 1, (ct_params,))
    mark("_build returned (eval_shape traced)")

    run, _ = eng_ct._jitted[key]
    sw = 8
    n = len(starts)
    importance = jnp.asarray(eng_ct._importance((96, 96, 96)))
    mark("importance ready")
    t_run0 = time.time()
    outs = run(padded, np.asarray(starts), np.asarray(np.ones(n, np.float32)),
               importance, ct_params)
    mark(f"run() returned (dispatch {time.time() - t_run0:.1f}s)")
    jax.block_until_ready(outs)
    mark("outputs ready")

    # full second engine warmup for symmetry
    t = time.time()
    (tu_map,) = eng_tu(volume, tu_params)
    jax.block_until_ready(tu_map)
    mark(f"TUNet engine warm ({time.time() - t:.1f}s)")

    # timed volume, as the bench measures it
    t = time.time()
    (res_map,) = eng_ct(volume, ct_params)
    (tu_map,) = eng_tu(volume, tu_params)
    float(jnp.asarray(res_map[0, 0, 0, 0, 0] + tu_map[0, 0, 0, 0, 0]))
    mark(f"steady-state volume {time.time() - t:.2f}s")


if __name__ == "__main__":
    main()
