import os, sys, time
import jax, jax.numpy as jnp
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache
from hybrid_ctunet_tpu.models.layers import set_remat_blocks, CatConvBlock, ResBlock
set_remat_blocks(False); enable_cache()
def log(*a): print(*a, file=sys.stderr, flush=True)
def fetch(x): return float(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))
DT = jnp.bfloat16; SW = 8; K = 8
rng = jax.random.PRNGKey(0)

def bench(name, mod, shapes, K2=K):
    xs = [jax.random.normal(rng, s, DT) for s in shapes]
    params = jax.jit(mod.init)(rng, *xs)["params"]
    f = jax.jit(lambda p, *v: mod.apply({"params": p}, *v))
    y = f(params, *xs); fetch(y)
    t0=time.time()
    for _ in range(K2): y = f(params, *xs)
    fetch(y)
    log(f"{name:46s} {(time.time()-t0)/K2*1e3:8.2f} ms")

for flag in ("1", "0"):
    os.environ["HYBRID_CTUNET_VIRTUAL_CONCAT"] = flag
    log(f"--- VIRTUAL_CONCAT={flag}")
    bench("CatConvBlock 64+64->64 @96^3", CatConvBlock(64, dtype=DT),
          [(SW,96,96,96,64),(SW,96,96,96,64)])
    bench("ResBlock skip 128+128->128 @48x48x96", ResBlock(128, 3, 1, dtype=DT),
          [(SW,48,48,96,128),(SW,48,48,96,128)])
