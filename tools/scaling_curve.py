"""Window-sharded engine scaling check on a virtual CPU mesh (VERDICT r4 #8).

The multi-chip projection (PERF.md) rests on dispatch counts + collective
bytes + linearity. Real multi-chip hardware is unavailable, so this measures
the next-best auditable thing: the window-sharded ``SlidingWindowEngine`` on
1 -> 2 -> 4 -> 8 VIRTUAL CPU devices (one physical core). The n virtual
devices timeshare the core, so TOTAL wall-clock ~ total device work:

  - flat wall across n  => the sharded program does the same total work
    regardless of device count (windows divide n-ways; the one finalize
    collective adds nothing material) — the linearity assumption holds in
    the only dimension this host can measure;
  - growing wall        => sharding overhead (extra collectives, padding
    windows, re-layouts) that the projection failed to count.

Also prints dispatches/volume per n (the projection's other input).
Usage: JAX_PLATFORMS=cpu python tools/scaling_curve.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
fl = [f for f in os.environ.get("XLA_FLAGS", "").split()
      if "xla_force_host_platform_device_count" not in f]
fl.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(fl)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()


def main():
    from hybrid_ctunet_tpu import flags as hcflags
    from hybrid_ctunet_tpu.infer.sliding_window import SlidingWindowEngine
    from hybrid_ctunet_tpu.models import CTUNet
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks
    from hybrid_ctunet_tpu.parallel import make_mesh

    set_remat_blocks(False)
    shape, window = (32, 32, 32), 2
    # plain-path flags: the CPU backend compiles folded graphs pathologically
    # (same pinning as the driver dryrun, __graft_entry__.py) — the sharding
    # machinery under test is identical either way
    with hcflags.override(
        ALTFOLD="0", ZFOLD="0", FOLD96="0", STEM_Z4="0", TRANSP_NATIVE="0",
        VIRTUAL_CONCAT="0", PALLAS_SHUFFLE="0", SW_REMAINDER="0",
    ):
        model = CTUNet(
            out_channels=14, model_depth=50, img_size=shape[:2], frames=shape[2],
            patch_frame=8, hidden_size=64, num_depths=1, mlp_dim=128,
            num_heads=2, dim_conv_stem=16, window=window,
        )
        rng = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, *shape, 1), jnp.float32)
        shapes = jax.eval_shape(model.init, rng, x0)["params"]
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        keys = jax.random.split(rng, len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef,
            [(0.05 * jax.random.normal(k, l.shape, jnp.float32)).astype(l.dtype)
             for k, l in zip(keys, leaves)],
        )

        def predictor(x, params):
            (res, _, _), _ = model.apply({"params": params}, x)
            return res

        vol = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 64, 64, 44, 1)),
            jnp.float32,
        )
        kw = dict(sw_batch_size=1, overlap=0.5, mode="gaussian")

        print("n_dev  windows  chunks/vol  warm wall s/vol   (flat = linear scaling)")
        results = {}
        for n in (1, 2, 4, 8):
            mesh = make_mesh((n,), ("data",), devices=jax.devices()[:n])
            eng = SlidingWindowEngine(
                predictor, shape, mesh=mesh, strategy="loop", **kw
            )
            (out,) = eng(vol, params)  # compile
            float(out[0, 0, 0, 0, 0])
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                (out,) = eng(vol, params)
                float(out[0, 0, 0, 0, 0])
            dt = (time.time() - t0) / reps
            # window grid: 3x3x2 = 18 at these sizes (true count from engine)
            _, _, _, starts, _, _, _ = eng._plan(vol.shape[1:4], 1)
            n_win = len(starts)
            n_chunks = -(-(-(-n_win // 1)) // n)  # sw=1: ceil(windows / n)
            results[n] = dt
            print(f"{n:5d}  {n_win:7d}  {n_chunks:10d}  {dt:13.2f}")
        base = results[1]
        print("\nwall(n)/wall(1):",
              " ".join(f"n={n}: {results[n] / base:.2f}" for n in (2, 4, 8)))
        print("(virtual devices timeshare ONE physical core: a flat ratio "
              "means total sharded work == unsharded work + negligible "
              "collective, i.e. real chips would divide wall-clock ~n-ways)")


if __name__ == "__main__":
    main()
