import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache
enable_cache()
def log(*a): print(*a, file=sys.stderr, flush=True)
def fetch(x): return float(jax.device_get(x.ravel()[0]))
DT = jnp.bfloat16; K = 8
rng = jax.random.PRNGKey(0)
B, S, C = 8, 96, 64
x = jax.random.normal(rng, (B,S,S,S,C), DT)
w = jax.random.normal(rng, (3,3,3,C,C), DT) * 0.05

def direct(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC","DHWIO","NDHWC"))
    return lax.conv_general_dilated(x, w, (1,1,1), [(1,1)]*3,
        dimension_numbers=dn, preferred_element_type=DT)

def zpair(x, w):
    # kernel (3,3,4,C,2C): block r uses z-taps r..r+2
    wk = jnp.zeros((3,3,4,C,2*C), w.dtype)
    wk = wk.at[:,:,0:3,:,0:C].set(w)
    wk = wk.at[:,:,1:4,:,C:].set(w)
    xp = jnp.pad(x, ((0,0),(1,1),(1,1),(1,1),(0,0)))
    dn = lax.conv_dimension_numbers(xp.shape, wk.shape, ("NDHWC","DHWIO","NDHWC"))
    out = lax.conv_general_dilated(xp, wk, (1,1,2), "VALID",
        dimension_numbers=dn, preferred_element_type=DT)  # (B,S,S,S/2,2C)
    return out.reshape(B,S,S,S//2,2,C).reshape(B,S,S,S,C)

def zquad(x, w):
    wk = jnp.zeros((3,3,6,C,4*C), w.dtype)
    for r in range(4):
        wk = wk.at[:,:,r:r+3,:,r*C:(r+1)*C].set(w)
    xp = jnp.pad(x, ((0,0),(1,1),(1,1),(1,1),(0,0)))
    dn = lax.conv_dimension_numbers(xp.shape, wk.shape, ("NDHWC","DHWIO","NDHWC"))
    out = lax.conv_general_dilated(xp, wk, (1,1,4), "VALID",
        dimension_numbers=dn, preferred_element_type=DT)
    return out.reshape(B,S,S,S//4,4,C).reshape(B,S,S,S,C)

def bench(name, f):
    g = jax.jit(f)
    y = g(x, w); fetch(y)
    t0=time.time()
    for _ in range(K): y=g(x,w)
    fetch(y)
    dt=(time.time()-t0)/K
    fl = 2*B*S**3*27*C*C
    log(f"{name:28s} {dt*1e3:8.2f} ms  useful {fl/dt/1e12:5.1f} TF/s")
    return y

y0 = bench("direct 3^3 64->64", direct)
y1 = bench("z-pair (3,3,4)->128", zpair)
y2 = bench("z-quad (3,3,6)->256", zquad)
log("pair diff:", float(jnp.max(jnp.abs(y1.astype(jnp.float32)-y0.astype(jnp.float32)))))
log("quad diff:", float(jnp.max(jnp.abs(y2.astype(jnp.float32)-y0.astype(jnp.float32)))))

log("--- 32ch stage-1 shapes @ (48,48,96) ---")
B2, C2 = 8, 32
x2 = jax.random.normal(rng, (B2,48,48,96,C2), DT)
w2 = jax.random.normal(rng, (3,3,3,C2,C2), DT) * 0.05

def direct2(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC","DHWIO","NDHWC"))
    return lax.conv_general_dilated(x, w, (1,1,1), [(1,1)]*3,
        dimension_numbers=dn, preferred_element_type=DT)

def zpairN(x, w, P):
    C = x.shape[-1]
    Z = x.shape[3]
    wk = jnp.zeros((3,3,P+2,C,P*C), w.dtype)
    for r in range(P):
        wk = wk.at[:,:,r:r+3,:,r*C:(r+1)*C].set(w)
    xp = jnp.pad(x, ((0,0),(1,1),(1,1),(1,1),(0,0)))
    dn = lax.conv_dimension_numbers(xp.shape, wk.shape, ("NDHWC","DHWIO","NDHWC"))
    out = lax.conv_general_dilated(xp, wk, (1,1,P), "VALID",
        dimension_numbers=dn, preferred_element_type=DT)
    s = x.shape
    return out.reshape(s[0],s[1],s[2],Z//P,P,C).reshape(s[0],s[1],s[2],Z,C)

def bench2(name, f, x, w):
    g = jax.jit(f)
    y = g(x, w); fetch(y)
    t0=time.time()
    for _ in range(K): y=g(x,w)
    fetch(y)
    dt=(time.time()-t0)/K
    C = x.shape[-1]
    fl = 2*x.shape[0]*x.shape[1]*x.shape[2]*x.shape[3]*27*C*C
    log(f"{name:28s} {dt*1e3:8.2f} ms  useful {fl/dt/1e12:5.1f} TF/s")
    return y

ya = bench2("32ch direct", direct2, x2, w2)
yb = bench2("32ch z-pair2 (N=64)", lambda a,b: zpairN(a,b,2), x2, w2)
yc = bench2("32ch z-pair4 (N=128)", lambda a,b: zpairN(a,b,4), x2, w2)
log("diff2:", float(jnp.max(jnp.abs(yb.astype(jnp.float32)-ya.astype(jnp.float32)))))
log("diff4:", float(jnp.max(jnp.abs(yc.astype(jnp.float32)-ya.astype(jnp.float32)))))
