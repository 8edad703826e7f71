"""Host-side dispatch cost of the sliding-window engine (VERDICT r4 #5).

Two optimizations (r3 ensemble interleave, r4 EVAL_OVERLAP) lost because the
1-core host's Python dispatch loop is saturated — but the loop's own cost was
never itself measured. This probe times, on the real chip with warm programs:

  1. t_dispatch: SlidingWindowEngine.__call__ wall time (all chunk dispatches
     + finalize enqueued; execution is async so this is pure host work),
  2. t_total:   until a scalar fetch completes (device execution included),
  3. micro-costs of the per-chunk host ops (np slicing + device_put of the
     starts/valid arrays, per-chunk python overhead).

If t_dispatch << t_total the host loop has idle headroom and the reverted
overlap optimizations deserve a second look on a multi-core host; if
t_dispatch ~ t_total the 1-core host is dispatch-bound and the negatives
stand. Usage: python tools/probe_dispatch.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()
DT = jnp.bfloat16
ROI = (96, 96, 96)
VOL = (256, 256, 128)


def main():
    from hybrid_ctunet_tpu.infer.sliding_window import SlidingWindowEngine
    from hybrid_ctunet_tpu.models.ctunet import CTUNet
    from hybrid_ctunet_tpu.models.tunet import TUNet
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks

    set_remat_blocks(False)
    ct = CTUNet(out_channels=14, dtype=DT)
    tu = TUNet(out_channels=14, dtype=DT)
    x0 = jnp.zeros((1, *ROI, 1), DT)
    ct_params = jax.jit(ct.init)(jax.random.PRNGKey(0), x0)["params"]
    tu_params = jax.jit(tu.init)(jax.random.PRNGKey(1), x0)["params"]

    def ct_fwd(x, params):
        (res, _, _), _ = ct.apply({"params": params}, x.astype(DT))
        return res

    def tu_fwd(x, params):
        vit, _ = tu.apply({"params": params}, x.astype(DT))
        return vit

    eng_ct = SlidingWindowEngine(ct_fwd, ROI, sw_batch_size=8, overlap=0.5,
                                 mode="gaussian", num_outputs=1)
    eng_tu = SlidingWindowEngine(tu_fwd, ROI, sw_batch_size=8, overlap=0.7,
                                 mode="gaussian", num_outputs=1)
    volume = jax.random.normal(jax.random.PRNGKey(2), (1, *VOL, 1), jnp.float32)

    # warm every program
    for eng, p in ((eng_ct, ct_params), (eng_tu, tu_params)):
        (m,) = eng(volume, p)
        float(m[0, 0, 0, 0, 0])

    for name, eng, p in (("CTUNet ov0.5 (50 win)", eng_ct, ct_params),
                         ("TUNet  ov0.7 (147 win)", eng_tu, tu_params)):
        disp, tot = [], []
        for _ in range(3):
            t0 = time.time()
            (m,) = eng(volume, p)
            t1 = time.time()
            float(m[0, 0, 0, 0, 0])
            t2 = time.time()
            disp.append(t1 - t0)
            tot.append(t2 - t0)
        print(f"{name}: dispatch {min(disp)*1e3:7.1f} ms   total {min(tot)*1e3:7.1f} ms "
              f"({100*min(disp)/min(tot):.0f}% of volume pass is host dispatch)")

    # micro-costs: the per-chunk host ops in the SW_REMAINDER loop
    n, sw = 50, 8
    starts = np.random.randint(0, 160, (n, 3)).astype(np.int32)
    valid = np.ones((n,), np.float32)

    t0 = time.time()
    reps = 200
    for _ in range(reps):
        for ci in range(n // sw):
            sl = slice(ci * sw, (ci + 1) * sw)
            _ = starts[sl], valid[sl]
    t_slice = (time.time() - t0) / reps * 1e3

    dev = jax.devices()[0]
    t0 = time.time()
    reps = 50
    for _ in range(reps):
        outs = []
        for ci in range(n // sw):
            sl = slice(ci * sw, (ci + 1) * sw)
            outs.append(jax.device_put(starts[sl], dev))
            outs.append(jax.device_put(valid[sl], dev))
        jax.block_until_ready(outs)
    t_put = (time.time() - t0) / reps * 1e3
    print(f"per-volume host micro-costs (CT, 7 chunks): np slicing {t_slice:.2f} ms, "
          f"device_put of starts/valid {t_put:.2f} ms")


if __name__ == "__main__":
    main()
