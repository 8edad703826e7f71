"""Op-level device-time attribution for one model chunk via jax.profiler.

Captures a trace of a few chunk forwards, then parses the xplane protobuf
(xprof / tensorboard-plugin-profile are baked in) and prints the top ops by
total device time. Usage: python tools/profile_chunk.py [tunet|ctunet]
"""
from __future__ import annotations

import glob
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()
DT = jnp.bfloat16
TRACE_DIR = "/tmp/jax_trace_chunk"


def summarize(trace_dir: str, top: int = 40):
    """Parse the xplane.pb and aggregate device-op durations."""
    from xprof.convert import _xplane_to_tools_data as conv  # noqa: PLC2701

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found", file=sys.stderr)
        return
    data, _ = conv.xspace_to_tool_data([max(paths, key=os.path.getmtime)],
                                       "framework_op_stats", {})
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
    rows = [r for r in rows if r.get("host_or_device") == "Device"]
    rows.sort(key=lambda r: -float(r.get("total_self_time_us") or 0))
    total = sum(float(r.get("total_self_time_us") or 0) for r in rows)
    print(f"total device self time: {total / 1e3:.2f} ms")
    for r in rows[:top]:
        t = float(r.get("total_self_time_us") or 0)
        print(f"{t / 1e3:9.3f} ms  {100 * t / total:5.1f}%  "
              f"{r.get('occurrences', '?'):>5}x  {r.get('operation', r.get('op_name', '?'))[:90]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "tunet"
    from hybrid_ctunet_tpu.models.ctunet import CTUNet
    from hybrid_ctunet_tpu.models.tunet import TUNet
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks

    set_remat_blocks(False)
    mod = (TUNet if which == "tunet" else CTUNet)(out_channels=14, dtype=DT)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 96, 96, 96, 1), DT)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(carry, params, x):
        out = mod.apply(params, x + carry.astype(x.dtype))
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) * 0.0 for l in leaves)

    c = jnp.float32(0)
    float(step(c, params, x))  # compile
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        c = jnp.float32(0)
        for _ in range(3):
            c = step(c, params, x)
        float(c)
    time.sleep(2)
    summarize(TRACE_DIR)


if __name__ == "__main__":
    main()
