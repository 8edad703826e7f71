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


def summarize(trace_dir: str, top: int = 45):
    """Parse the xplane.pb and aggregate device-op durations (hlo_stats)."""
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found", file=sys.stderr)
        return
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [max(paths, key=os.path.getmtime)], "hlo_stats", {}
    )
    import json

    text = data.decode() if isinstance(data, bytes) else data
    tbl = json.loads(text)
    ids = [c["id"] for c in tbl["cols"]]
    rows = [dict(zip(ids, [cell["v"] if cell else None for cell in r["c"]]))
            for r in tbl["rows"]]
    tkey = "total_self_time"  # microseconds
    iters = 3
    rows.sort(key=lambda r: -float(r.get(tkey) or 0))
    total = sum(float(r.get(tkey) or 0) for r in rows)
    print(f"device self time per iteration: {total / 1e3 / iters:.2f} ms")
    by_cat = {}
    for r in rows:
        by_cat[r.get("category") or "?"] = by_cat.get(r.get("category") or "?", 0) + float(
            r.get(tkey) or 0
        )
    for c, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  category {c:28s} {t / 1e3 / iters:8.2f} ms  {100 * t / total:5.1f}%")
    print()
    for r in rows[:top]:
        t = float(r.get(tkey) or 0) / iters
        op = (r.get("tf_op_name") or "?").replace("jit(step)/", "")
        bw = r.get("bound_by") or "?"
        fr = float(r.get("model_flop_rate") or 0) / 1e3
        mb = float(r.get("measured_memory_bw") or 0)
        print(f"{t / 1e3:8.3f} ms {100 * float(r.get(tkey) or 0) / total:5.1f}% "
              f"{int(float(r.get('occurrences') or 0)) // iters:>3}x "
              f"[{(r.get('category') or '?')[:14]:14s}] {bw[:7]:7s} "
              f"{fr:6.1f}TF {mb:6.0f}GB/s  {op[:80]}")


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
