"""Measure XLA conv TF/s vs channel width on the real chip.

3^3 stride-1 SAME convs, bf16 in / fp32 accum, at constant output-element
count per width so times are comparable. Establishes the lane-rate curve
(min(Cin,Cout) -> TF/s) that the z-fold rewrite banks on.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()

ITERS = 10


def probe(shape, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (*shape, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout), jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))

    @jax.jit
    def step(c, x, w):
        y = lax.conv_general_dilated(
            x + c.astype(x.dtype), w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return jnp.sum(y) * 0.0

    c = jnp.float32(0)
    float(step(c, x, w))
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(ITERS):
        c = step(c, x, w)
    float(c)
    ms = (time.time() - t0) / ITERS * 1e3
    vox = 1
    for d in shape:
        vox *= d
    tf = vox * 27 * cin * cout * 2 / (ms / 1e3) / 1e12
    print(f"conv 3^3 {cin:4d}->{cout:4d} @ {shape}: {ms:7.2f} ms  {tf:6.1f} TF/s",
          flush=True)


def main():
    # constant FLOPs across rows where possible; flagship-relevant shapes
    probe((8, 48, 48, 96), 32, 32)
    probe((8, 48, 48, 96), 64, 64)
    probe((8, 24, 24, 96), 128, 128)
    probe((8, 24, 24, 48), 256, 256)
    probe((8, 96, 96, 96), 64, 64)
    probe((8, 96, 96, 48), 128, 128)   # what a z-folded C=64 96^3 conv sees
    probe((8, 48, 48, 96), 128, 64)
    probe((8, 48, 48, 48), 128, 128)   # folded CatConv conv1 (two halves)




def probe_zfold():
    from hybrid_ctunet_tpu import flags
    from hybrid_ctunet_tpu.ops.conv import conv3d_same

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 48, 48, 96, 32), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 32, 32), jnp.bfloat16)
    for zf in ("0", "1"):
        with flags.override(ZFOLD=zf):
            @jax.jit
            def step(c, x, w):
                y = conv3d_same(x + c.astype(x.dtype), w, 1, preferred_dtype=jnp.float32)
                return jnp.sum(y) * 0.0
            c = jnp.float32(0)
            float(step(c, x, w))
            t0 = time.time()
            c = jnp.float32(0)
            for _ in range(ITERS):
                c = step(c, x, w)
            float(c)
            ms = (time.time() - t0) / ITERS * 1e3
            print(f"zfold={zf} bare conv 32->32 @ (8,48,48,96): {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    probe_zfold()
