"""Per-stage profiling of the UpAttentionBlock pyramid at sw=8, bf16."""
import sys, time
import jax, jax.numpy as jnp
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache
from hybrid_ctunet_tpu.models.layers import (
    set_remat_blocks, FeedForward, MultiAxisWindowAttention, PixelShuffleLinear)
enable_cache(); set_remat_blocks(False)
def log(*a): print(*a, file=sys.stderr, flush=True)
def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jax.device_get(leaf.ravel()[0]))
DT = jnp.bfloat16; SW = 8; K = 8

def bench(name, mod, shape):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, DT)
    params = jax.jit(mod.init)(rng, x)["params"]
    f = jax.jit(lambda p, v: mod.apply({"params": p}, v))
    y = f(params, x); fetch(y)
    t0 = time.time()
    for _ in range(K): y = f(params, x)
    fetch(y)
    log(f"{name:42s} {(time.time()-t0)/K*1e3:8.2f} ms")

# stage2 shapes: (SW,24,24,48,256)
bench("stage2 block attn (24,24,48,256)", MultiAxisWindowAttention(window=6, grid=False, dtype=DT), (SW,24,24,48,256))
bench("stage2 grid attn", MultiAxisWindowAttention(window=6, grid=True, dtype=DT), (SW,24,24,48,256))
bench("stage2 FFN", FeedForward(dtype=DT), (SW,24,24,48,256))
bench("stage2 shuffle -> 128", PixelShuffleLinear((2,2,2), 128, dtype=DT), (SW,24,24,48,256))
# stage3: (SW,48,48,96,128)
bench("stage3 FFN (48,48,96,128)", FeedForward(dtype=DT), (SW,48,48,96,128))
bench("stage3 shuffle -> 64", PixelShuffleLinear((2,2,1), 64, dtype=DT), (SW,48,48,96,128))
# stage1: (SW,12,12,24,512)
bench("stage1 block attn (12,12,24,512)", MultiAxisWindowAttention(window=6, grid=False, dtype=DT), (SW,12,12,24,512))
bench("stage1 FFN", FeedForward(dtype=DT), (SW,12,12,24,512))
