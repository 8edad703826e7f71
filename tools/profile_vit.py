"""Per-op device attribution of the 3D ViT (VERDICT r4 #3 / weak #5).

The round-4 MFU table prices the ViT at 653 GF in ~12 ms = 54 TF/s and
attributes it to "M=432 rows under the ~1024-row MXU bar". But at sw=8 the
QKV/MLP projections contract the last dim of a (8, 432, 768) tensor — XLA
may already flatten that to M=3456. This tool traces the ViT standalone and
prints the per-op rates so the limiter (projections vs the K=64/N=64
attention einsums) is measured, not assumed.

Usage: python tools/profile_vit.py [--flat]
  --flat: A/B variant — run attention on explicitly head-merged shapes.
Reference: /root/reference/networks/vit.py:46-78.
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()
DT = jnp.bfloat16
TRACE_DIR = "/tmp/jax_trace_vit"


def main():
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks
    from hybrid_ctunet_tpu.models.vit3d import ViT3D

    set_remat_blocks(False)
    mod = ViT3D(dtype=DT, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 96, 96, 96, 1), DT)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(carry, params, x):
        out = mod.apply(params, x + carry.astype(x.dtype))
        return carry + jnp.sum(out.astype(jnp.float32)) * 0.0

    float(step(jnp.float32(0), params, x))
    best = float("inf")
    for _ in range(3):
        c = jnp.float32(0)
        t0 = time.time()
        for _ in range(30):
            c = step(c, params, x)
        float(c)
        best = min(best, (time.time() - t0) / 30)
    print(f"ViT d12 chunk (sw8): {best * 1e3:.2f} ms "
          f"(useful 653 GF -> {653e9 / best / 1e12:.1f} TF/s)")

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        c = jnp.float32(0)
        for _ in range(3):
            c = step(c, params, x)
        float(c)
    time.sleep(2)
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [max(paths, key=os.path.getmtime)], "hlo_stats", {}
    )
    tbl = json.loads(data.decode() if isinstance(data, bytes) else data)
    ids = [c["id"] for c in tbl["cols"]]
    rows = [dict(zip(ids, [cell["v"] if cell else None for cell in r["c"]]))
            for r in tbl["rows"]]
    rows.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    total = sum(float(r.get("total_self_time") or 0) for r in rows)
    print(f"device self time/iter: {total / 3e3:.2f} ms")
    by_cat = defaultdict(float)
    for r in rows:
        by_cat[r.get("category") or "?"] += float(r.get("total_self_time") or 0)
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:26s} {t / 3e3:7.2f} ms")
    print("top ops:")
    for r in rows[:25]:
        t = float(r.get("total_self_time") or 0) / 3e3
        op = (r.get("tf_op_name") or "?").replace("jit(step)/", "")
        fr = float(r.get("model_flop_rate") or 0) / 1e3
        mb = float(r.get("measured_memory_bw") or 0)
        print(f"  {t:7.3f} ms {int(float(r.get('occurrences') or 0)) // 3:>3}x "
              f"[{(r.get('category') or '?')[:14]:14s}] {fr:6.1f}TF {mb:6.0f}GB/s "
              f"{op[:95]}")


if __name__ == "__main__":
    main()
