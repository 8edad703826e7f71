"""Block-level A/B of ZFOLD_RES on the real chip at the flagship sites."""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu import flags  # noqa: E402
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402
from tools.microbench_blocks import bench  # noqa: E402

enable_cache()
DT = jnp.bfloat16


def main():
    from hybrid_ctunet_tpu.models.layers import CatConvBlock, ResBlock, UpConvBlock, set_remat_blocks

    set_remat_blocks(False)
    B = 8
    key = jax.random.PRNGKey(1)

    def rnd(*shape):
        return jax.random.normal(key, shape, DT)

    x_in = rnd(B, 96, 96, 96, 1)
    p64 = rnd(B, 96, 96, 96, 64)
    s64 = rnd(B, 96, 96, 96, 64)
    d1 = rnd(B, 48, 48, 96, 128)
    for zf in ("0", "1"):
        with flags.override(ZFOLD_RES=zf):
            print(f"--- ZFOLD_RES={zf}")
            bench("stem ResBlock 1->64 @96^3", ResBlock(64, 3, 1, dtype=DT), x_in)
            bench("decoder0 CatConvBlock @96^3", CatConvBlock(64, dtype=DT), p64, s64)
            bench("UpConvBlock (2,2,1) 128->64", UpConvBlock(64, (2, 2, 1), dtype=DT), d1)
            bench("plain ResBlock 64->64 @96^3", ResBlock(64, 3, 1, dtype=DT), p64)


if __name__ == "__main__":
    main()
