"""Analytic single-chip MFU accounting for the bench models (VERDICT r3 #1).

Counts the USEFUL FLOPs of one sliding-window chunk — the conv + dot MACs of
the plain reference math (all structural fold rewrites OFF, so structured-zero
MACs introduced by altfold/zfold/fold96 are excluded) — by walking the traced
jaxpr of the model forward, attributing each conv_general_dilated / dot_general
to its flax module scope. Then measures the PRODUCTION-flag chunk time on the
real chip (chained dispatches, one scalar fetch) and reports

    MFU = useful FLOPs / (measured chunk time * v5e bf16 peak).

Usage:  python tools/mfu_accounting.py [tunet|ctunet|both] [--no-measure]

The peak is the v5e spec number: 197 TFLOP/s bf16 per chip.
"""
from __future__ import annotations

import math
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

V5E_BF16_PEAK = 197e12  # FLOP/s per chip (TPU v5e spec)
SW = 8  # production sw_batch (bench.py)


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _eqn_flops(eqn) -> int:
    """2*MAC count for matmul-class primitives; 0 for everything else."""
    name = eqn.primitive.name
    if name == "dot_general":
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
        batch = _prod(lhs.shape[i] for i in lb)
        k = _prod(lhs.shape[i] for i in lc)
        m = _prod(
            lhs.shape[i] for i in range(len(lhs.shape)) if i not in lc and i not in lb
        )
        n = _prod(
            rhs.shape[i] for i in range(len(rhs.shape)) if i not in rc and i not in rb
        )
        return 2 * batch * m * n * k
    if name == "conv_general_dilated":
        out = eqn.outvars[0].aval
        rhs = eqn.invars[1].aval
        dn = eqn.params["dimension_numbers"]
        k_spatial = _prod(rhs.shape[i] for i in dn.rhs_spec[2:])
        cin_per_group = rhs.shape[dn.rhs_spec[1]]
        return 2 * _prod(out.shape) * cin_per_group * k_spatial
    return 0


def _walk(jaxpr, scale: int, acc: dict, scope: str):
    """Accumulate flops per module scope, recursing into sub-jaxprs.

    Sub-jaxpr name stacks are relative to their enclosing eqn (a scan body's
    stacks don't repeat the model prefix), so the parent label is prepended.

    Higher-order control flow: ``scan`` multiplies by its static length;
    ``cond`` counts only its LARGEST branch (exactly one runs — summing all
    branches would overcount); ``while`` has no static trip count, so its
    body is counted ONCE and a warning is emitted (the published MFU would
    be an underestimate if a real while-loop ever appears in the forward —
    none does today; the model scans are lax.scan).
    """
    name = None
    for eqn in jaxpr.eqns:
        stack = str(eqn.source_info.name_stack)
        label = "/".join(p for p in (scope, stack) if p)
        f = _eqn_flops(eqn)
        if f:
            acc[label or "(top)"] += f * scale
        name = eqn.primitive.name
        if name == "cond":
            branch_totals = []
            for j in _jaxprs_of(eqn.params.get("branches", ())):
                branch_acc: dict = defaultdict(int)
                _walk(j, scale, branch_acc, label)
                branch_totals.append(branch_acc)
            if branch_totals:
                best = max(branch_totals, key=lambda a: sum(a.values()))
                for k, v in best.items():
                    acc[k] += v
            continue
        sub_scale = scale
        if name == "scan":
            sub_scale = scale * int(eqn.params["length"])
        elif name == "while":
            print(
                f"WARNING: while-loop at {label or '(top)'} has no static "
                "trip count; its body FLOPs are counted once (MFU may be "
                "underestimated)",
                file=sys.stderr,
            )
        for v in eqn.params.values():
            for j in _jaxprs_of(v):
                _walk(j, sub_scale, acc, label)


def _jaxprs_of(v):
    from jax.extend.core import ClosedJaxpr, Jaxpr

    if isinstance(v, ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, Jaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from _jaxprs_of(x)


def _component(label: str, depth: int = 1) -> str:
    """Coarsen a full module path to its top `depth` component(s), stripping
    the model-name/core prefix and transform frames."""
    parts = [
        p
        for p in label.split("/")
        if p
        and not p.startswith("jit(")
        and p != "(top)"
        and p not in ("checkpoint", "body", "cond", "branch", "core",
                      "TUNet", "CTUNet", "CUNet")
    ]
    return "/".join(parts[:depth]) if parts else "(top)"


def count_model_flops(which: str):
    """Useful FLOPs of one chunk (B=SW windows of 96^3), plain reference math."""
    from hybrid_ctunet_tpu import flags as hcflags
    from hybrid_ctunet_tpu.models.ctunet import CTUNet
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks
    from hybrid_ctunet_tpu.models.tunet import TUNet

    set_remat_blocks(False)
    plain = dict(
        ALTFOLD="0", ZFOLD="0", FOLD96="0", STEM_Z4="0", VIRTUAL_CONCAT="0",
        PALLAS_FFN="0", PALLAS_FFN_PAIR="0", PALLAS_ATTN="0", PALLAS_SHUFFLE="0",
        TRANSP_PALLAS="0", TRANSP_NATIVE="0", CIN1_MUL="0", PALLAS_SCATTER="0",
    )
    with hcflags.override(**plain):
        mod = (TUNet if which == "tunet" else CTUNet)(out_channels=14, dtype=jnp.bfloat16)
        x = jax.ShapeDtypeStruct((SW, 96, 96, 96, 1), jnp.bfloat16)
        params = jax.eval_shape(mod.init, jax.random.PRNGKey(0), x)

        def fwd(params, x):
            return mod.apply(params, x)

        jaxpr = jax.make_jaxpr(fwd)(params, x)
    acc: dict = defaultdict(int)
    _walk(jaxpr.jaxpr, 1, acc, "")
    return acc


def measure_chunk_ms(which: str, iters: int = 30) -> float:
    """Production-flag chunk time: chained dispatches, one scalar fetch."""
    from hybrid_ctunet_tpu.models.ctunet import CTUNet
    from hybrid_ctunet_tpu.models.layers import set_remat_blocks
    from hybrid_ctunet_tpu.models.tunet import TUNet

    set_remat_blocks(False)
    mod = (TUNet if which == "tunet" else CTUNet)(out_channels=14, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (SW, 96, 96, 96, 1), jnp.bfloat16)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(carry, params, x):
        out = mod.apply(params, x + carry.astype(x.dtype))
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) * 0.0 for l in leaves)

    float(step(jnp.float32(0), params, x))  # compile
    best = float("inf")
    for _ in range(3):
        c = jnp.float32(0)
        t0 = time.time()
        for _ in range(iters):
            c = step(c, params, x)
        float(c)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def report(which: str, measure: bool = True, chunk_ms: float | None = None):
    acc = count_model_flops(which)
    total = sum(acc.values())
    print(f"\n=== {which.upper()} — useful FLOPs (plain reference math), "
          f"chunk = {SW} windows of 96^3 ===")
    by_comp: dict = defaultdict(int)
    for name, f in acc.items():
        by_comp[_component(name)] += f
    for name, f in sorted(by_comp.items(), key=lambda kv: -kv[1]):
        print(f"  {f / 1e9:10.1f} GF  {100 * f / total:5.1f}%  {name}")
    print(f"  total {total / 1e12:.3f} TF/chunk = {total / SW / 1e9:.1f} GF/window")
    print("  top sites:")
    for name, f in sorted(acc.items(), key=lambda kv: -kv[1])[:12]:
        print(f"    {f / 1e9:9.1f} GF  {_component(name, depth=6)}")
    if measure and chunk_ms is None:
        chunk_ms = measure_chunk_ms(which)
    if chunk_ms:
        rate = total / (chunk_ms / 1e3)
        print(f"  measured chunk {chunk_ms:.1f} ms (production flags)  ->  "
              f"{rate / 1e12:.1f} TF/s useful  =  MFU {100 * rate / V5E_BF16_PEAK:.1f}% "
              f"of v5e bf16 peak ({V5E_BF16_PEAK / 1e12:.0f} TF/s)")
    return total, chunk_ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    measure = "--no-measure" not in sys.argv
    if measure:
        from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache

        enable_cache()
    targets = ["tunet", "ctunet"] if which == "both" else [which]
    for t in targets:
        report(t, measure=measure)


if __name__ == "__main__":
    main()
