import sys, time
import jax, jax.numpy as jnp
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache
enable_cache()
from hybrid_ctunet_tpu.ops.conv import conv3d_same
def log(*a): print(*a, file=sys.stderr, flush=True)
def fetch(x): return float(jax.device_get(x.ravel()[0]))
DT = jnp.bfloat16; SW = 8; K = 8
rng = jax.random.PRNGKey(0)

def bench(name, cin, cout, k=3, shape=(96,96,96), K2=K):
    x = jax.random.normal(rng, (SW,*shape,cin), DT)
    w = jax.random.normal(rng, (k,k,k,cin,cout), DT) * 0.05
    f = jax.jit(lambda a, b: conv3d_same(a, b, 1, preferred_dtype=jnp.float32).astype(DT))
    y = f(x, w); fetch(y)
    t0=time.time()
    for _ in range(K2): y = f(x, w)
    fetch(y)
    dt=(time.time()-t0)/K2
    fl = 2*SW*shape[0]*shape[1]*shape[2]*k**3*cin*cout
    log(f"{name:34s} {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s")

bench("3^3 conv 1->64 @96^3", 1, 64)
bench("3^3 conv 64->64 @96^3", 64, 64)
bench("3^3 conv 128->64 @96^3", 128, 64)
bench("3^3 conv 96->96 @48x48x96", 96, 96, shape=(48,48,96))
bench("1^3 conv 1->64 @96^3", 1, 64, k=1)

# after fast paths:
from hybrid_ctunet_tpu.models.layers import ResBlock, set_remat_blocks
set_remat_blocks(False)
def bench_mod(name, mod, shape, K2=K):
    x = jax.random.normal(rng, shape, DT)
    params = jax.jit(mod.init)(rng, x)["params"]
    f = jax.jit(lambda p, v: mod.apply({"params": p}, v))
    y = f(params, x); fetch(jax.tree_util.tree_leaves(y)[0])
    t0=time.time()
    for _ in range(K2): y = f(params, x)
    fetch(jax.tree_util.tree_leaves(y)[0])
    log(f"{name:34s} {(time.time()-t0)/K2*1e3:8.2f} ms")
bench_mod("stem ResBlock 1->64 @96^3", ResBlock(64, 3, 1, dtype=DT), (SW,96,96,96,1))
