"""Component-level timing of TUNet / CTUNet forwards on the real chip.

Chained-call methodology (the tunnel adds ~26 ms per dispatch+fetch; chain K
calls between fetches and divide). Standalone submodules instantiated at the
exact shapes of the full models, bf16, sw_batch=8.
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache
from hybrid_ctunet_tpu.models.layers import set_remat_blocks

enable_cache()
set_remat_blocks(False)

def log(*a): print(*a, file=sys.stderr, flush=True)
def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jax.device_get(leaf.ravel()[0]))

DT = jnp.bfloat16
SW = 8
K = 6

def timeit(name, fn, params, x, reps=K):
    f = jax.jit(fn)
    y = f(params, x); fetch(y)
    # chain: feed a scalar derived from y back into x to serialize
    t0 = time.time()
    outs = []
    for i in range(reps):
        y = f(params, x)
        outs.append(y)
    fetch(outs[-1])
    # chained dispatches overlap; only the last fetch syncs
    dt = (time.time() - t0) / reps
    log(f"{name:38s} {dt*1e3:8.2f} ms")
    return dt

def bench_module(name, mod, in_shape, extra=None):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, in_shape, DT)
    args = (x,) if extra is None else (x, jax.random.normal(rng, extra, DT))
    params = jax.jit(mod.init)(rng, *args)["params"]
    if extra is None:
        return timeit(name, lambda p, v: mod.apply({"params": p}, v), params, x)
    else:
        e = args[1]
        return timeit(name, lambda p, v: mod.apply({"params": p}, v, e), params, x)

which = sys.argv[1] if len(sys.argv) > 1 else "tunet"

if which == "tunet":
    from hybrid_ctunet_tpu.models import TUNet
    from hybrid_ctunet_tpu.models.vit3d import ViT3D
    from hybrid_ctunet_tpu.models.decoder_attention import UpAttentionBlock
    from hybrid_ctunet_tpu.models.layers import CatConvBlock, ResBlock, UnetOutHead
    from hybrid_ctunet_tpu.models.tunet import DIMS, DS_STRIDE

    bench_module("TUNet total", TUNet(dtype=DT), (SW,96,96,96,1))
    bench_module("vit (12 blocks, 432 tok)", ViT3D(
        image_size=(96,96), frames=96, image_patch_size=16, frame_patch_size=8,
        dim=768, depth=12, heads=12, mlp_dim=3072, dtype=DT), (SW,96,96,96,1))
    bench_module("vit_encoder (UpAttention pyr)", UpAttentionBlock(
        in_channels=768, dims=DIMS, ds_stride=DS_STRIDE, window=6, dtype=DT),
        (SW,6,6,12,768))
    bench_module("vit_encoder0 (full-res ResBlock)", ResBlock(64, 3, 1, dtype=DT), (SW,96,96,96,1))
    bench_module("vit_decoder0 (CatConvBlock 96^3)", CatConvBlock(64, dtype=DT),
        (SW,96,96,96,64), extra=(SW,96,96,96,64))
    bench_module("vit_out head", UnetOutHead(14, dtype=DT), (SW,96,96,96,64))
elif which == "ctunet":
    from hybrid_ctunet_tpu.models import CTUNet
    from hybrid_ctunet_tpu.models.resnet3d import ResNet3D
    bench_module("CTUNet total", CTUNet(out_channels=14, model_depth=101, patch_frame=8, dtype=DT), (SW,96,96,96,1))
    bench_module("resnet101 encoder", ResNet3D(model_depth=101, dtype=DT), (SW,96,96,96,1))
