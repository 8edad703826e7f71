"""Per-stage attribution of the ResNet-101 encoder (VERDICT r4 #1).

The encoder is the worst MFU component of the CTUNet chunk (2232 GF at
~32 TF/s aggregate ~= 70 ms/chunk, tools/mfu_accounting.py round 4). This
tool answers WHERE inside it the time goes, with two independent methods:

1. prefix timing: run the encoder truncated after the stem / stage1 / ... /
   stage4 (chained dispatches, one scalar fetch); successive differences are
   per-stage wall times INCLUDING XLA's cross-stage fusion effects.
2. device trace: jax.profiler capture of the full encoder, hlo_stats ops
   bucketed by stage scope (conv1 stem vs layer1..layer4) — shows the
   category split (conv vs elementwise) within each stage.

Useful FLOPs per stage come from the mfu_accounting jaxpr walker under plain
reference math, so per-stage TF/s and MFU are printed alongside.

Usage: python tools/profile_encoder.py [--no-trace] [--depth 101]
Reference workload: /root/reference/networks/resnet.py:137-230.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()
DT = jnp.bfloat16
SW = 8
TRACE_DIR = "/tmp/jax_trace_encoder"
STAGES = ["stem", "layer1", "layer2", "layer3", "layer4"]


def build(depth: int):
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks
    from hybrid_ctunet_tpu.models.resnet3d import ResNet3D

    set_remat_blocks(False)
    mod = ResNet3D(model_depth=depth, dtype=DT)
    x = jax.random.normal(jax.random.PRNGKey(1), (SW, 96, 96, 96, 1), DT)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    return mod, params, x


def stage_flops(depth: int) -> dict:
    """Useful FLOPs per stage, plain reference math (mfu_accounting walker)."""
    from hybrid_ctunet_tpu import flags as hcflags
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks
    from hybrid_ctunet_tpu.models.resnet3d import ResNet3D
    from mfu_accounting import _walk

    set_remat_blocks(False)
    plain = dict(
        ALTFOLD="0", ZFOLD="0", FOLD96="0", STEM_Z4="0", VIRTUAL_CONCAT="0",
        PALLAS_FFN="0", PALLAS_FFN_PAIR="0", PALLAS_ATTN="0", PALLAS_SHUFFLE="0",
        TRANSP_PALLAS="0", TRANSP_NATIVE="0", CIN1_MUL="0", PALLAS_SCATTER="0",
    )
    with hcflags.override(**plain):
        mod = ResNet3D(model_depth=depth, dtype=DT)
        x = jax.ShapeDtypeStruct((SW, 96, 96, 96, 1), DT)
        params = jax.eval_shape(mod.init, jax.random.PRNGKey(0), x)
        jaxpr = jax.make_jaxpr(lambda p, x: mod.apply(p, x))(params, x)
    acc: dict = defaultdict(int)
    _walk(jaxpr.jaxpr, 1, acc, "")
    out = defaultdict(int)
    for label, f in acc.items():
        out[classify(label)] += f
    return out


def classify(label: str) -> str:
    m = re.search(r"layer(\d)", label)
    if m:
        return f"layer{m.group(1)}"
    if "conv1" in label:
        return "stem"
    return "other"


def prefix_times(mod, params, x, iters: int = 30) -> list:
    """Wall time of the encoder truncated after each stage (3 reps, best)."""
    times = []
    for n_stages in range(0, 5):
        @jax.jit
        def step(carry, params, x, n=n_stages):
            feats = mod.apply(params, x + carry.astype(x.dtype), upto=n)
            leaves = jax.tree_util.tree_leaves(feats)
            return sum(jnp.sum(l.astype(jnp.float32)) * 0.0 for l in leaves)

        float(step(jnp.float32(0), params, x))
        best = float("inf")
        for _ in range(3):
            c = jnp.float32(0)
            t0 = time.time()
            for _ in range(iters):
                c = step(c, params, x)
            float(c)
            best = min(best, (time.time() - t0) / iters)
        times.append(best * 1e3)
        print(f"  prefix upto={n_stages} ({STAGES[n_stages]}): {best * 1e3:8.2f} ms",
              flush=True)
    return times


def trace(mod, params, x):
    @jax.jit
    def step(carry, params, x):
        feats = mod.apply(params, x + carry.astype(x.dtype))
        leaves = jax.tree_util.tree_leaves(feats)
        return sum(jnp.sum(l.astype(jnp.float32)) * 0.0 for l in leaves)

    float(step(jnp.float32(0), params, x))
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
    per_stage = defaultdict(lambda: defaultdict(float))
    for r in rows:
        t = float(r.get("total_self_time") or 0) / 3  # us per iter
        if not t:
            continue
        stage = classify(r.get("tf_op_name") or "?")
        per_stage[stage][r.get("category") or "?"] += t
    print("\ndevice-trace per-stage category split (ms/iter):")
    for stage in STAGES + ["other"]:
        cats = per_stage.get(stage)
        if not cats:
            continue
        total = sum(cats.values()) / 1e3
        detail = "  ".join(
            f"{c}={v / 1e3:.2f}" for c, v in sorted(cats.items(), key=lambda kv: -kv[1])
        )
        print(f"  {stage:8s} {total:7.2f} ms   {detail}")
    # top individual ops per stage
    rows.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    print("\ntop ops:")
    for r in rows[:30]:
        t = float(r.get("total_self_time") or 0) / 3e3
        op = (r.get("tf_op_name") or "?").replace("jit(step)/", "")
        fr = float(r.get("model_flop_rate") or 0) / 1e3
        mb = float(r.get("measured_memory_bw") or 0)
        print(f"  {t:7.3f} ms {int(float(r.get('occurrences') or 0)) // 3:>3}x "
              f"[{(r.get('category') or '?')[:14]:14s}] {fr:6.1f}TF {mb:6.0f}GB/s "
              f"{op[:90]}")


def main():
    depth = 101
    if "--depth" in sys.argv:
        depth = int(sys.argv[sys.argv.index("--depth") + 1])
    mod, params, x = build(depth)
    print(f"ResNet-{depth} encoder, {SW}x96^3 bf16, production flags")
    flops = stage_flops(depth)
    times = prefix_times(mod, params, x)
    print("\nper-stage attribution (prefix differences):")
    prev = 0.0
    for i, stage in enumerate(STAGES):
        dt_ms = times[i] - prev
        prev = times[i]
        gf = flops.get(stage, 0) / 1e9
        rate = gf / dt_ms if dt_ms > 0 else 0.0
        print(f"  {stage:8s} {dt_ms:7.2f} ms  {gf:7.1f} GF  {rate:6.1f} TF/s  "
              f"MFU {100 * rate / 197:5.1f}%")
    total_gf = sum(v for k, v in flops.items() if k != "other") / 1e9
    print(f"  total    {times[-1]:7.2f} ms  {total_gf:7.1f} GF  "
          f"{total_gf / times[-1]:6.1f} TF/s  MFU {100 * (total_gf / times[-1]) / 197:5.1f}%")
    if "--no-trace" not in sys.argv:
        trace(mod, params, x)


if __name__ == "__main__":
    main()
