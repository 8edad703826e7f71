import sys, time
import jax, jax.numpy as jnp
from jax import lax
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache
enable_cache()
def log(*a): print(*a, file=sys.stderr, flush=True)
def fetch(x): return float(jax.device_get(x.ravel()[0]))
DT = jnp.bfloat16; K = 8
rng = jax.random.PRNGKey(0)

def bench_raw(name, xshape, kshape, useful_flops=None):
    x = jax.random.normal(rng, xshape, DT)
    w = jax.random.normal(rng, kshape, DT) * 0.05
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC","DHWIO","NDHWC"))
    f = jax.jit(lambda a,b: lax.conv_general_dilated(a,b,(1,1,1),"VALID",
                dimension_numbers=dn, preferred_element_type=jnp.float32).astype(DT))
    y = f(x,w); fetch(y)
    t0=time.time()
    for _ in range(K): y=f(x,w)
    fetch(y)
    dt=(time.time()-t0)/K
    oshape = y.shape
    fl = 2*oshape[0]*oshape[1]*oshape[2]*oshape[3]*kshape[0]*kshape[1]*kshape[2]*kshape[3]*kshape[4]
    eff = (useful_flops or fl)/dt/1e12
    log(f"{name:44s} {dt*1e3:8.2f} ms raw {fl/dt/1e12:6.1f} TF/s useful {eff:6.1f}")

U = 2*8*96*96*96*27*64  # useful flops of the original conv1
bench_raw("s2dz (3,3,2) cin2 cout128 @98x98x49", (8,98,98,49,2), (3,3,2,2,128), U)
bench_raw("s2d3 (2,2,2) cin8 cout512 @49^3", (8,49,49,49,8), (2,2,2,8,512), U)
bench_raw("s2dxy (3,2,2)? cin4 cout256 @98x49x49", (8,98,49,49,4), (3,2,2,4,256), U)
bench_raw("ref: (3,3,3) cin64 cout64 @96^3", (8,98,98,98,64), (3,3,3,64,64))
bench_raw("ctrl: (3,3,3) cin8 cout64 @48^3", (8,50,50,50,8), (3,3,3,8,64))
