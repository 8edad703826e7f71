"""Per-component time attribution for the flagship bench path (sw=8, 96^3).

Times each sub-module of TUNet/CTUNet standalone with its in-model input
shapes, chained ITERS times between scalar fetches (tunnel timing protocol,
PERF.md). Components whose output shape differs from the input are timed by
re-feeding the original input (fresh dispatches, still chained via a token
dependency through jnp.sum donation trick is unnecessary: we chain by
summing outputs into a carry scalar that is added to the input).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()

ITERS = 10
DT = jnp.bfloat16


def bench(name, mod, *xs, method=None):
    rng = jax.random.PRNGKey(0)
    params = jax.jit(mod.init)(rng, *xs)

    @jax.jit
    def step(carry, params, xs):
        out = mod.apply(params, *[x + carry.astype(x.dtype) for x in xs])
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) * 0.0 for l in leaves)

    c = jnp.float32(0)
    c = step(c, params, xs)
    float(c)  # compile+sync
    t0 = time.time()
    c = jnp.float32(0)
    for _ in range(ITERS):
        c = step(c, params, xs)
    float(c)
    ms = (time.time() - t0) / ITERS * 1e3
    print(f"{name:34s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    from hybrid_ctunet_tpu.models.layers import (
        CatConvBlock, ResBlock, UnetOutHead, Up2FusionBlock, UpConvBlock,
        set_remat_blocks,
    )
    from hybrid_ctunet_tpu.models.decoder_attention import UpAttentionBlock
    from hybrid_ctunet_tpu.models.resnet3d import ResNet3D
    from hybrid_ctunet_tpu.models.vit3d import ViT3D

    set_remat_blocks(False)
    B = 8
    key = jax.random.PRNGKey(1)

    def rnd(*shape):
        return jax.random.normal(key, shape, DT)

    x_in = rnd(B, 96, 96, 96, 1)
    total = 0.0

    total += bench("vit (d12 768)", ViT3D(
        image_size=(96, 96), frames=96, image_patch_size=16, frame_patch_size=8,
        dim=768, depth=12, heads=12, mlp_dim=3072, dtype=DT), x_in)

    grid = rnd(B, 6, 6, 12, 768)
    total += bench("pyramid (UpAttentionBlock)", UpAttentionBlock(
        in_channels=768, dtype=DT), grid)

    total += bench("stem ResBlock 1->64 @96^3", ResBlock(64, 3, 1, dtype=DT), x_in)

    p64 = rnd(B, 96, 96, 96, 64)
    s64 = rnd(B, 96, 96, 96, 64)
    total += bench("decoder0 CatConvBlock @96^3", CatConvBlock(64, dtype=DT), p64, s64)
    total += bench("UnetOutHead 64->14 @96^3", UnetOutHead(14, dtype=DT), p64)

    print(f"{'TUNet-ish total':34s} {total:8.2f} ms")
    print()

    # CTUNet-only components
    ct = 0.0
    ct += bench("resnet101 encoder", ResNet3D(
        101, ((2, 2, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2)), dtype=DT), x_in)

    enc4 = rnd(B, 6, 6, 12, 1024)
    enc3 = rnd(B, 12, 12, 24, 512)
    v12 = rnd(B, 12, 12, 24, 512)
    ct += bench("res_decoder3 Up2Fusion", Up2FusionBlock(
        512, (2, 2, 2), dtype=DT), enc4, enc3, v12)

    dec3 = rnd(B, 12, 12, 24, 512)
    enc2 = rnd(B, 24, 24, 48, 256)
    v24 = rnd(B, 24, 24, 48, 256)
    ct += bench("res_decoder2 Up2Fusion", Up2FusionBlock(
        256, (2, 2, 2), dtype=DT), dec3, enc2, v24)

    dec2 = rnd(B, 24, 24, 48, 256)
    enc1 = rnd(B, 48, 48, 96, 128)
    v48 = rnd(B, 48, 48, 96, 128)
    ct += bench("res_decoder1 Up2Fusion", Up2FusionBlock(
        128, (2, 2, 2), dtype=DT), dec2, enc1, v48)

    dec1 = rnd(B, 48, 48, 96, 128)
    ct += bench("res_decoder0 UpConvBlock @96^3", UpConvBlock(64, (2, 2, 1), dtype=DT), dec1)
    ct += bench("res heads (3x UnetOutHead)", UnetOutHead(14, dtype=DT), p64)

    print(f"{'CTUNet-extra total':34s} {ct:8.2f} ms")


if __name__ == "__main__":
    main()
