"""Full-size CTUNet train-step timing on the real chip (PERF.md training
table): d101 pf8, 96^3 crops, bf16 compute / fp32 params, remat-scan blocks,
batch 4 via grad_accum 4 (the reference's 1 case x 4 crops protocol)."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()


def main():
    from hybrid_ctunet_tpu.models import CTUNet
    from hybrid_ctunet_tpu.train.state import create_train_state
    from hybrid_ctunet_tpu.train.steps import make_train_step

    dtype = jnp.bfloat16
    model = CTUNet(out_channels=14, model_depth=101, patch_frame=8, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 96, 96, 96, 1), jnp.float32)
    state = create_train_state(model, rng, x1)
    step = jax.jit(make_train_step("ctunet", remat=True, grad_accum=4))

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 96, 96, 96, 1), jnp.float32)
    y = jax.random.randint(
        jax.random.PRNGKey(2), (4, 96, 96, 96, 1), 0, 14
    ).astype(jnp.int32)

    t0 = time.time()
    state, metrics = step(state, x, y, 1e-4)
    print(f"compile+step0 {time.time() - t0:.1f}s loss={float(metrics['loss']):.4f}",
          flush=True)
    n = 5
    t0 = time.time()
    for i in range(n):
        state, metrics = step(state, x, y, 1e-4)
    loss = float(metrics["loss"])  # sync
    dt = (time.time() - t0) / n
    print(f"{dt:.2f} s/step ({4 / dt:.2f} crops/s), loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
