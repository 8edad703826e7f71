"""Process-wide performance toggles, snapshotted from the environment ONCE.

Every ``HYBRID_CTUNET_*`` env knob used to be read inside model/op code at
trace time. Because the jit cache is keyed on shapes (not on env state),
flipping a variable after a function had compiled silently kept the stale
path alive — a long-lived process (bench harness, test session) could report
results for a path it was no longer nominally running.

This module makes the semantics explicit: flags are read once at import into
module attributes, and changing the environment afterwards has NO effect
unless you call :func:`refresh`, which re-reads the environment AND clears
jax's compilation caches so the new values actually reach freshly traced
programs. Tests that flip a toggle must wrap the flip in ``refresh()`` calls
(or use :func:`override`).
"""
from __future__ import annotations

import contextlib
import os
import sys
from typing import Iterator

_PREFIX = "HYBRID_CTUNET_"

# name -> (default, parser)
_DEFAULTS = {
    # Pallas kernel gates (model code, read per-apply but now process-stable)
    "PALLAS_FFN": ("1", str),
    # allow the fused FFN kernel at ViT scale (hidden 3072 > the decoder
    # gate's 1024; 3456 token rows). See ops/ffn_pallas.py supports().
    "PALLAS_FFN_BIG": ("0", str),
    # fuse the callers' `x + FFN(x)` residual add into the FFN kernel's
    # output write. Default OFF: despite saving a full-tensor elementwise
    # pass on paper, it measures a ~17 ms/chunk LOSS on both models
    # (tools/ab_flags_model.py: TUNet 157.2 -> 174.5, CTUNet 376.2 -> 394.1)
    # — XLA evidently overlaps/fuses the external residual add better than
    # the kernel's extended output dependence chain.
    "PALLAS_FFN_RES": ("0", str),
    # fuse the decoder pyramid's stage-3 FFN PAIR (x -> x+FFN1 -> +FFN2,
    # reference hybrid_CTUNet.py:573-576) into ONE kernel: the intermediate
    # and both residual adds stay in VMEM, dropping two full-tensor
    # elementwise passes + one kernel-boundary HBM round-trip of the
    # (8,48,48,96,128) tensor. Device trace priced the pair at 19.1 ms
    # kernels + 4.1 ms external adds per chunk; measured WIN
    # (tools/ab_flags_model.py, v5e sw8): TUNet chunk 135.1 -> 131.1 ms,
    # CTUNet 321.3 -> 317.2. Unlike PALLAS_FFN_RES (a 17 ms LOSS), the
    # pair kernel removes the whole intermediate round-trip, not just the
    # add.
    "PALLAS_FFN_PAIR": ("1", str),
    # ViT patch embedding: fold patch_norm1 + patch_proj into a stride=patch
    # VALID conv plus per-patch moment reduce_windows (models/vit3d.py) —
    # avoids materializing the (B, N, 2048) token matrix through an 8-D
    # transpose and three fp32 casts (device trace: ~3 ms/chunk). Same
    # parameter tree; fp32 math reassociated (not bit-exact).
    "VIT_PATCH_FOLD": ("0", str),
    "PALLAS_ATTN": ("1", str),
    "PALLAS_SCATTER": ("1", str),
    "PALLAS_NORM": ("0", str),
    # fused pixel-shuffle + per-voxel Linear (ops/shuffle_pallas.py):
    # "0" off | "1" every supported stage (measured ~40 ms/chunk in-model
    # LOSS at stages 1-2 from operand-layout pinning) | "fold" only at
    # fold_out sites (the stage-3 full-res shuffle under FOLD96_LAST). At
    # the fold site the consumer reads the folded (B,X,Y,Z/2,2F) layout
    # natively, so the kernel's 2F=128-lane stores neither pin a layout a
    # neighbor wants nor under-fill a lane tile — the first in-model WIN
    # for this kernel (v5e sw8, tools/ab_flags_model.py: TUNet chunk
    # 144.2 -> 135.6 ms, CTUNet 330.8 -> 321.4; 1-ulp bf16 equivalence on
    # the vit branch, res branch bit-exact, tools/equiv_flags_model.py).
    "PALLAS_SHUFFLE": ("fold", str),
    # folded 96^3 region: keep the fold_z layout ACROSS block boundaries in
    # the full-res C=64 region (stem ResBlock -> CatConvBlock -> out head,
    # stage-3 shuffle -> decoder0 -> per-voxel Dense, CTUNet res_decoder0 ->
    # res head) so each block's boundary unfold/fold pair cancels. Exact
    # reordering (identical math + parameter tree); the device trace priced
    # those boundary copies at ~12 ms/chunk on TUNet (decoder0 reshapes at
    # 306-536 GB/s). Measured END-TO-END WIN (tools/ab_flags_model.py, v5e
    # sw8): TUNet chunk 157.6 -> 148.1 ms, CTUNet 356.7 -> 333.5.
    "FOLD96": ("1", str),
    # FOLD96 sub-sites, measured separately in ONE process
    # (tools/ab_flags_model.py base FOLD96_LAST=1 FOLD96_MID=0, v5e sw8):
    # LAST: the stage-3 pixel shuffle emits the fold_z layout itself — the
    # z-pair regroup rides the shuffle's own final reshape and the per-voxel
    # Linear becomes the block-diagonal kron(I2, w) dot (extra entries are
    # zeros; exact). Kills the separate fold_z copy after the shuffle.
    # Measured WIN: TUNet 147.4 -> 144.0 ms, CTUNet 333.7 -> 331.5.
    # (An earlier cross-process reading of a 32 ms LOSS was host-CPU
    # contention from a concurrently running pytest suite — one-process
    # flag A/B is the required protocol on this 1-core host.)
    "FOLD96_LAST": ("1", str),
    # MID: inside UpConvBlock, the transp_conv emits the fold_z layout for
    # free on the einsum interleave and the ResBlock consumes it via
    # fold_in, killing the ~3 ms boundary copy at CTUNet res_decoder0.
    # Measured neutral-to-slightly-positive (CTUNet 333.7 vs 333.7 off,
    # TUNet unaffected); kept on as the fewer-copies form.
    "FOLD96_MID": ("1", str),
    # structural conv/concat rewrites (env-gated experiments, PERF.md
    # "Hard-won rules" — default-off ones lost end-to-end despite standalone
    # wins)
    "VIRTUAL_CONCAT": ("1", str),
    "SHUFFLE_BD": ("0", str),
    # PixelShuffle as a native strided transposed conv (one live channel
    # block per tap). Default OFF: despite killing the 8-D transpose's
    # layout copies on paper, it measures a ~5.5 ms/chunk LOSS
    # (tools/ab_flags_model.py: TUNet 157.3 -> 162.7, CTUNet 369.9 -> 375.8).
    "SHUFFLE_CT": ("0", str),
    "CIN1_MUL": ("1", str),
    "CIN1_S2D": ("0", str),
    "ZPAIR": ("0", str),
    # kernel==stride transposed convs: "1" uses XLA's native conv_transpose
    # instead of the einsum + 8-D interleave transpose (the interleave's
    # layout copies cost ~7 ms around res_decoder0 in the device trace).
    # Measured: CTUNet chunk 370.0 -> 368.0 ms, TUNet neutral.
    "TRANSP_NATIVE": ("1", str),
    # ResNet stem: additionally fold z by 4 (aligned output quads) on top of
    # the 2x2 xy space-to-depth — Cin 4 -> 16, Cout 64 -> 256; 13.6 -> 4.3
    # ms standalone (tools/probe_stem.py)
    "STEM_Z4": ("1", str),
    # fused Pallas k==s transposed conv (ops/shuffle_pallas.py
    # fused_transp_conv — the pixel-shuffle factor-dot kernel with a dense
    # per-factor weight): "0" off | "fold" only at fold_out sites (the
    # FOLD96_MID res_decoder0 upsample, where the folded store is 128 lanes
    # and the consumer reads the fold layout natively) | "1" every
    # supported site. Default "fold": measured WIN (tools/ab_flags_model,
    # v5e sw8) CTUNet chunk 317.4 -> 313.0 ms, TUNet untouched (bit-exact;
    # it has no k==s transposed conv). The XLA native path priced this site
    # at ~12.9 ms (conv 4.6 + format 5.1 + fold reshape 3.1, device trace);
    # model-level equivalence: vit branch bit-exact, res logits within
    # bf16 rounding-order noise (rel ~1.3e-2, tools/equiv_flags_model).
    "TRANSP_PALLAS": ("fold", str),
    "ZPAIR_MAX_COUT": ("64", int),
    # whole-stage z-folded ResNet bottlenecks (ops/conv.py conv3d_folded):
    # stages whose planes <= ZFOLD_CH run every block in the z-folded layout
    # (2x lane width at 2x structured-sparse MACs; fold/unfold amortized per
    # stage). Stage-1 chain 76.4 -> 52.6 ms standalone
    # (tools/probe_folded_stage.py); END-TO-END WIN 9.76 -> 9.98 vol/min —
    # unlike the per-conv rewrites, no per-conv relayout breaks XLA fusion.
    # ZFOLD_CH=64 (round 5): strided stages fold their stride-1 TAIL blocks
    # (models/resnet3d.py) — layer2's 8 C=64 bottlenecks run at 128 lanes
    # (factor auto-capped at 128//planes). Measured: encoder layer2
    # 11.84 -> 11.28 ms (tools/profile_encoder.py), CTUNet chunk
    # 308.9 -> 308.2 (tools/ab_flags_model.py).
    "ZFOLD": ("1", str),
    "ZFOLD_CH": ("64", int),
    # fold width: 4 puts the planes=32 stage at 128 lanes (1x1 block-diag /
    # 3^3 3-fold-span kernels at 4x structured-sparse MACs). Measured
    # (tools/ab_flags_model.py): CTUNet chunk 376.2 -> 370.1 ms vs factor 2.
    "ZFOLD_FACTOR": ("4", int),
    # z-folded full-resolution ResBlocks (models/layers.py ResBlock): blocks
    # with features <= ZFOLD_RES_CH and stride 1 run conv1/conv2/projection
    # in the folded layout. Standalone rates win (tools/probe_conv_rates.py:
    # 64->64 @96^3 29.25 ms vs folded-as-128 @(96,96,48) 22.53, 1.30x) and
    # two in-model blocks win (tools/ab_zfold_res.py: CatConvBlock
    # 92.7 -> 83.3 ms, UpConvBlock 55.7 -> 49.4), but END TO END it LOSES
    # (tools/ab_zfold_model.py: TUNet chunk 190.2 -> 201.8 ms, CTUNet
    # 412.5 -> 430.5) — the per-block fold/unfold relayouts break XLA's
    # producer/consumer fusion around the blocks, the same failure mode as
    # Winograd v1/v2 and ZPAIR. Default OFF; unlike ZFOLD (whole-stage,
    # one fold per ResNet stage) this folds per block and never amortizes.
    "ZFOLD_RES": ("0", str),
    "ZFOLD_RES_CH": ("64", int),
    # alternating-parity z-fold ResBlocks (ops/conv.py conv3d_altfold_*):
    # conv1 maps the free aligned z-fold view to ODD output pairs and conv2
    # maps back, so a (3,3,2) kernel over 2C lanes keeps 6/8 weight blocks
    # live (75% useful MACs, vs 50% for the same-parity ZFOLD_RES fold) and
    # the block's input/output stay free contiguous reshapes of the standard
    # layout — no relayout anywhere in the chain. Targets the lane-starved
    # C<=ALTFOLD_CH stride-1 3^3 convs (~50 TF/s native at C=64 vs ~139
    # raw at 128 lanes, tools/probe_conv_rates.py). Measured END-TO-END WIN
    # (tools/ab_altfold_model.py, v5e sw8): TUNet chunk 190.1 -> 157.4 ms,
    # CTUNet 411.8 -> 376.1 — the first conv rewrite to win in-model
    # (standalone chain A/B: C=64 1.31x, C=32 2.85x; C=128 loses, gated).
    "ALTFOLD": ("1", str),
    "ALTFOLD_CH": ("64", int),
    # ResNet stage-1 alternating SHIFTED-quad fold (models/resnet3d.py
    # _ShiftBottleneck): conv2 runs as the (3,3,2) half-fold-shifted factor-4
    # kernel — 37.5% useful MACs vs 25% for the aligned factor-4 fold.
    # Measured round 5 (tools/probe_altfold4.py, v5e): conv2 ALONE wins
    # standalone 2.91 -> 2.40 ms, but the full bottleneck-PAIR chain LOSES
    # 10.53 -> 14.21 ms (0.74x): the masked folded-IN passes (count
    # overrides for the virtual edge half-slots) and the shifted-residual
    # regroup reads repay the conv2 saving 2.4x over (the odd 25-slot
    # extent itself measures free). Default OFF — kept as a gated,
    # op-tested negative (fp32-exact chain, tests/test_conv.py). NOTE:
    # changes the stage-1 tail param-tree layout (pair scan) — checkpoints
    # are layout-specific.
    "ALTFOLD4": ("0", str),
    # sub-variants of the altfold block (A/B gates; see ResBlock):
    # MASKF: fuse the odd edge mask into the IN reduce+normalize passes —
    # measures NEUTRAL (XLA already fused the standalone mask multiplies);
    # kept on as the fewer-ops form.
    # PROJSTD: run the 1x1 projection in standard layout. Measures a 40
    # ms/chunk LOSS (tools/ab_flags_model.py: TUNet 157 -> 198): consuming x
    # in both the standard and folded layouts forces XLA to materialize an
    # input relayout that dwarfs the block-diagonal projection's 2x MACs.
    # Default OFF.
    "ALTFOLD_MASKF": ("1", str),
    "ALTFOLD_PROJSTD": ("0", str),
    # Winograd F(2,3)^3 Pallas conv. Default OFF: block-level A/B on v5e
    # shows XLA's fused conv+IN+LeakyReLU pattern wins at every site the
    # flagship pf8 models actually have — C=64 96^3 ResBlock 42.2 -> 56.3 ms
    # (LOSS), C=32 stage-1 Bottleneck (8,48,48,96) 9.72 -> 14.89 ms (LOSS).
    # The v2 fused-IN chain ("2", tools/microbench_wino.py) does not rescue
    # C=64 either: 55.2 -> 189.4 ms — at C=64 the z-fold forces ty<=16
    # (VMEM), so M=768 < the ~1024-row MXU-efficiency bar and the position
    # dots run at ~10 TF/s. The kernel DOES win where a conv is lane-starved
    # at full resolution AND M reaches 1152 (ty=24 at C=32):
    # C=32 96^3 ResBlock 48.1 -> 40.9 ms (wino2, 1.18x) — i.e. pf16-width
    # models (the reference's inconsistent ctunet d50/pf16 default).
    # WINOGRAD_CH limits which Cin values the kernel may claim when enabled.
    "WINOGRAD": ("0", str),
    "WINOGRAD_CH": ("32", str),
    "WINOGRAD_TY": ("0", int),
    # kernel tile knobs. ATTN_TB (window-attention kernel batch tile):
    # round-5 re-sweep found 2 a small consistent win over the round-2
    # default 4 (two order-independent A/B pairs: TUNet 128.5-128.8 ->
    # 127.6-128.0 ms, CTUNet 308.2-308.7 -> 307.3-307.7); 8 loses.
    "ATTN_TB": ("2", int),
    "FFN_TN": ("", str),  # "" = auto-pick per shape
    # hidden-dim streaming chunk in the FFN kernel. 128 measured best in the
    # round-4 sweep (tools/ab_flags_model.py, order-independent, two runs):
    # TUNet chunk 131.2-131.6 -> 128.3-128.9 ms, CTUNet 311.5-313.1 ->
    # 308.6-308.8 vs the old 256; 512 neutral-to-loss. Smaller chunks keep
    # the fp32 GELU temps hotter in VMEM; split-K partial-sum order shifts
    # within fp32 rounding noise.
    "FFN_HK": ("128", int),
    # trailing-remainder chunk in the sliding-window loop strategy: dispatch
    # the final partial window chunk as a smaller (power-of-two-bucketed)
    # program instead of padding it to a full sw_batch of dummy windows —
    # recovers the padded slots' whole model forward (6/8 slots of the
    # bench's last CTUNet chunk, 5/8 of TUNet's). Bit-exact: dummy windows
    # contributed exactly 0.0 in window order either way.
    "SW_REMAINDER": ("1", str),
    # Evaluation host/device pipelining (cli/test_main.py): dispatch case
    # i+1's sliding-window chunks while a single worker thread fetches,
    # inverts (scipy resample) and scores case i. Identical outputs by
    # construction (pure reordering of host work; tested); depth-1 bounded,
    # so at most two cases' canvases are in flight. Default ON (round 5):
    # re-measured a 14-18% WIN twice (tools/ab_eval_overlap.py, 4 cases:
    # 186.3 vs 227.9 s, then 199.7 vs 233.0 s; rows bit-identical both
    # runs), consistent with the round-5 dispatch measurement — host
    # dispatch is only 7-8% of a volume pass (tools/probe_dispatch.py), so
    # the worker's invert/metric work fills genuinely idle host time. The
    # round-4 16% loss (237.5/252.8 vs 205.0 s) does not reproduce under
    # round-5 code; treat single-run eval timings on this host with ~10%
    # suspicion either way.
    "EVAL_OVERLAP": ("1", str),
    # in-kernel erf: "as26" (exp-based, err 4.4e-7) | "r16" (no exp, 1.6e-6).
    # Measured NEUTRAL end-to-end (ab_flags_model: 157.4/356.7 vs
    # 157.3/356.3) — Mosaic hides the exp under the MXU dots; default stays
    # on the tighter polynomial.
    "FFN_ERF": ("as26", str),
}


def _read(name: str):
    default, parse = _DEFAULTS[name]
    raw = os.environ.get(_PREFIX + name, default)
    return parse(raw) if raw != "" or parse is str else parse(default)


def refresh(clear_jit_cache: bool = True) -> None:
    """Re-snapshot every flag from the environment. With
    ``clear_jit_cache`` (default), also drop jax's traced/compiled caches so
    already-jitted callables re-trace with the new values instead of serving
    stale paths."""
    mod = sys.modules[__name__]
    for name in _DEFAULTS:
        setattr(mod, name, _read(name))
    if clear_jit_cache:
        try:
            import jax

            jax.clear_caches()
        except Exception:
            pass


@contextlib.contextmanager
def override(**env: str) -> Iterator[None]:
    """Temporarily set ``HYBRID_CTUNET_<key>=value`` env vars and refresh;
    restores the previous environment and flag values on exit."""
    saved = {}
    for key, value in env.items():
        saved[key] = os.environ.get(_PREFIX + key)
        os.environ[_PREFIX + key] = str(value)
    refresh()
    try:
        yield
    finally:
        for key, old in saved.items():
            if old is None:
                os.environ.pop(_PREFIX + key, None)
            else:
                os.environ[_PREFIX + key] = old
        refresh()


refresh(clear_jit_cache=False)  # initial import-time snapshot
