"""Evaluation entry points (reference test_C_TUNet.py / test_CTUNet.py /
test_CTUNet_final.py).

All three share the loop: sliding-window infer each val case -> invert logits
to the native grid -> softmax/argmax (ensembling where applicable) ->
per-organ Dice (classes 1..13) -> save NIfTI mask + dice.txt report.
``test_final`` adds the Hybrid-CTUNet mask-complementation ensemble
(CTUNet overlap 0.5 + TUNet overlap 0.7, softmax-mean, test_CTUNet_final.py:
539-552), HD95, and optional nnU-Net largest-CC postprocessing (:654-656).
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import get_loader
from ..data.nifti import save_nifti
from ..data.transforms import invert_to_native
from ..eval import com_dice, com_hd, determine_postprocessing, per_organ_dice, write_dice_report
from ..infer.sliding_window import SlidingWindowEngine
from ..models.layers import set_remat_blocks
from .args import build_test_parser
from .factory import build_model, load_eval_params

set_remat_blocks(False)  # evaluation entries never differentiate


def _softmax(x, axis=-1):
    x = x - x.max(axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis, keepdims=True)


def _variables(params):
    """params collection, or a full variables dict for --norm_name batch
    checkpoints (running BatchNorm buffers ride a 'batch_stats' sibling)."""
    return params if "params" in params else {"params": params}


def _dispatch(engine, params, case):
    """Device half of a case: dispatch the sliding-window chunks and return
    the UNFETCHED device canvases (execution continues asynchronously)."""
    img = np.asarray(case.image)
    vol = jnp.asarray(img if img.ndim == 4 else img[..., None])[None]
    return engine(vol, params)


def _to_native(outs, case, head: Optional[int] = None):
    """Host half: fetch the device canvases and invert to the native grid."""
    if head is None:
        return [invert_to_native(np.asarray(o[0]), case.meta) for o in outs]
    return invert_to_native(np.asarray(outs[head][0]), case.meta)


def _native_logits(engine, params, case, head: Optional[int] = None):
    return _to_native(_dispatch(engine, params, case), case, head)


def _pipeline_cases(cases, dispatch, finish):
    """Depth-1 host/device pipeline over eval cases (VERDICT r3 #7).

    ``dispatch(case)`` enqueues a case's device work and returns unfetched
    device arrays; ``finish(case, handle)`` does the host work (fetch ->
    invert_to_native scipy resample -> metrics -> NIfTI save). With
    EVAL_OVERLAP (default), case i's host work runs in a single worker
    thread while case i+1's windows execute on device — the same
    double-buffering as data.dataset.TrainLoader(prefetch=). Results keep
    case order; identical outputs to the serial loop by construction (the
    reference's loop, test_CTUNet_final.py:529-606, is fully serial).
    """
    from .. import flags as hcflags

    if hcflags.EVAL_OVERLAP != "1" or len(cases) <= 1:
        return [finish(c, dispatch(c)) for c in cases]
    from concurrent.futures import ThreadPoolExecutor

    results = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        pending = None
        for case in cases:
            handle = dispatch(case)
            if pending is not None:
                results.append(pending.result())
            pending = ex.submit(finish, case, handle)
        results.append(pending.result())
    return results


def _label_of(case):
    lab = np.asarray(case.label)
    return lab[..., 0] if lab.ndim == 4 else lab


def _eval_mesh(args):
    """Window-batch parallelism for evaluation: with ``--distributed`` and
    >1 local device, shard the window-chunk axis over a ('data',) mesh
    (each chip predicts its chunk subset into a local canvas; one
    cross-device sum in finalize). The reference's eval is single-GPU only
    — this is the TPU-native scaling of SURVEY.md §5 "long-volume
    handling"."""
    import jax as _jax

    from ..parallel import make_mesh

    if getattr(args, "distributed", False) and len(_jax.devices()) > 1:
        return make_mesh()
    return None


def _single_engine(model, args, overlap=None):
    def predictor(x, params):
        return model.apply(_variables(params), x)[0]

    return SlidingWindowEngine(
        predictor, (args.roi_x, args.roi_y, args.roi_z), sw_batch_size=4,
        overlap=args.infer_overlap if overlap is None else overlap, mode="gaussian",
        mesh=_eval_mesh(args),
    )


def _dual_engine(model, args, overlap=None):
    def predictor(x, params):
        (res, _, _), (vit, _) = model.apply(_variables(params), x)
        return res, vit

    return SlidingWindowEngine(
        predictor, (args.roi_x, args.roi_y, args.roi_z), sw_batch_size=4,
        overlap=args.infer_overlap if overlap is None else overlap, mode="gaussian",
        num_outputs=2,
        mesh=_eval_mesh(args),
    )


def test_single(argv=None):
    """test_C_TUNet.py: evaluate one CUNet or TUNet checkpoint."""
    args = build_test_parser("c_tunet").parse_args(argv)
    args.test_mode = True
    _, val_cases = get_loader(args)
    out_dir = os.path.join("./outputs", args.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    model = build_model(args)
    params = load_eval_params(
        args, args.model_name, os.path.join(args.pretrained_dir, args.pretrained_model_name)
    )
    engine = _single_engine(model, args)

    def finish(case, handle):
        nat = _to_native(handle, case, head=0)
        pred = np.argmax(nat, -1)
        d = per_organ_dice(pred, _label_of(case), n_classes=args.out_channels)
        print(f"case {case.name} mean dice {np.mean(d):.4f}")
        save_nifti(os.path.join(out_dir, case.name or "pred.nii.gz"),
                   pred.astype(np.uint8), case.meta.affine)
        return case.name, d

    out = _pipeline_cases(val_cases, lambda c: _dispatch(engine, params, c), finish)
    names, rows = [n for n, _ in out], [d for _, d in out]
    write_dice_report(out_dir, names, rows)
    print("Overall Mean Dice: {}".format(float(np.mean(rows))))
    return np.asarray(rows)


def test_ctunet(argv=None):
    """test_CTUNet.py: three-checkpoint evaluation — pass 1 ensembles the res
    head of model_res.pt with the vit head of model_vit.pt; pass 2 ensembles
    both heads of model_hybrid.pt (test_CTUNet.py:228-241, 340-391)."""
    args = build_test_parser("ctunet").parse_args(argv)
    args.test_mode = True
    args.model_name = "ctunet"
    _, val_cases = get_loader(args)
    out_dir = os.path.join("./outputs", args.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    model = build_model(args)
    p_res = load_eval_params(args, "ctunet", os.path.join(args.pretrained_dir, "model_res.pt"))
    p_vit = load_eval_params(args, "ctunet", os.path.join(args.pretrained_dir, "model_vit.pt"))
    p_hyb = load_eval_params(args, "ctunet", os.path.join(args.pretrained_dir, "model_hybrid.pt"))
    engine = _dual_engine(model, args)

    results = {}
    for tag, dispatch, fetch in (
        ("res+vit",
         lambda c: (_dispatch(engine, p_res, c), _dispatch(engine, p_vit, c)),
         lambda h, c: (_to_native(h[0], c, head=0), _to_native(h[1], c, head=1))),
        ("hybrid",
         lambda c: _dispatch(engine, p_hyb, c),
         lambda h, c: tuple(_to_native(h, c, head=None))),
    ):
        def finish(case, handle, tag=tag, fetch=fetch):
            m1, m2 = fetch(handle, case)
            prob = (_softmax(m1) + _softmax(m2)) / 2.0
            pred = np.argmax(prob, -1)
            d = per_organ_dice(pred, _label_of(case), n_classes=args.out_channels)
            save_nifti(os.path.join(out_dir, f"{tag}_{case.name or 'pred.nii.gz'}"),
                       pred.astype(np.uint8), case.meta.affine)
            return case.name, d

        out = _pipeline_cases(val_cases, dispatch, finish)
        names, rows = [n for n, _ in out], [d for _, d in out]
        write_dice_report(out_dir, names, rows, filename=f"dice_{tag}.txt")
        print(f"[{tag}] Overall Mean Dice: {float(np.mean(rows))}")
        results[tag] = np.asarray(rows)
    return results


def test_final(argv=None):
    """test_CTUNet_final.py: the Hybrid-CTUNet ensemble — CTUNet overlap 0.5
    + independent TUNet overlap 0.7, softmax-mean, Dice + HD95, optional
    largest-CC postprocessing."""
    parser = build_test_parser("ctunet")
    parser.add_argument("--ctunet_dir", default="./runs/CTUNet_ds8_dr0.2", type=str,
                        help="CTUNet checkpoint dir (reference hardcoded path)")
    parser.add_argument("--tunet_dir", default="./runs/TUNet_pf8", type=str,
                        help="independent TUNet checkpoint dir")
    args = parser.parse_args(argv)
    args.test_mode = True
    _, val_cases = get_loader(args)
    out_dir = os.path.join("./outputs", args.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    args.model_name = "ctunet"
    ctunet = build_model(args)
    args.model_name = "tunet"
    tunet = build_model(args)
    p_ct = load_eval_params(args, "ctunet", os.path.join(args.ctunet_dir, "model_res.pt"))
    p_tu = load_eval_params(args, "tunet", os.path.join(args.tunet_dir, "model_vit.pt"))

    # the ensemble uses only the res head (reference
    # sliding_window_inference_multi(...)[0], test_CTUNet_final.py:539) — a
    # single-output predictor lets XLA dead-code-eliminate the entire vit
    # branch per window and skips accumulating a full-volume map that would
    # be discarded (identical result, ~25% faster)
    def _ct_res_only(x, params):
        (res, _, _), _ = ctunet.apply(_variables(params), x)
        return res

    eng_ct = SlidingWindowEngine(
        _ct_res_only, (args.roi_x, args.roi_y, args.roi_z), sw_batch_size=4,
        overlap=0.5, mode="gaussian", mesh=_eval_mesh(args),
    )
    eng_tu = _single_engine(tunet, args, overlap=0.7)

    def finish(case, handle):
        res_nat = _to_native(handle[0], case, head=0)
        tu_nat = _to_native(handle[1], case, head=0)
        prob = (_softmax(res_nat) + _softmax(tu_nat)) / 2.0
        pred = np.argmax(prob, -1).astype(np.uint8)
        # physical volume per voxel from the native affine (SimpleITK spacing
        # read, test_CTUNet_final.py:500-503)
        sp = float(np.abs(np.linalg.det(case.meta.affine[:3, :3])))
        save_nifti(os.path.join(out_dir, case.name or "pred.nii.gz"), pred, case.meta.affine)
        return pred, _label_of(case).astype(np.uint8), case.name, sp

    out = _pipeline_cases(
        val_cases,
        lambda c: (_dispatch(eng_ct, p_ct, c), _dispatch(eng_tu, p_tu, c)),
        finish,
    )
    infers = [r[0] for r in out]
    labels = [r[1] for r in out]
    names = [r[2] for r in out]
    vpv = [r[3] for r in out]

    rows = [per_organ_dice(p, l, n_classes=args.out_channels) for p, l in zip(infers, labels)]
    report_path = write_dice_report(out_dir, names, rows)
    dice_raw = com_dice(infers, labels)
    postprocessed = bool(args.postprocess)
    if postprocessed:
        # the reference reports the POST-postprocessing metrics
        # (test_CTUNet_final.py:654-656: determine_postprocessing -> com_dice
        # -> com_hd on infers_final)
        infers = determine_postprocessing(
            infers, labels, vpv, processes=min(8, os.cpu_count() or 1),
            advanced_postprocessing=True,
        )
    dice = com_dice(infers, labels)
    hd = com_hd(infers, labels)
    # append the HD95 block so the metrics the function returns are also on
    # disk next to the dice report
    with open(report_path, "a") as fw:
        fw.write("*" * 20 + "\n")
        fw.write("HD95 (mean per organ{}):\n".format(
            ", after postprocessing" if postprocessed else ""))
        for i, v in enumerate(np.asarray(hd).ravel()):
            fw.write(f"HD95_class_{i + 1}: {v:.4f}\n")
        fw.write(f"mean_hd95: {float(np.mean(hd)):.4f}\n")
        if postprocessed:
            fw.write(f"dsc_postprocessed: {float(np.mean(dice)):.4f}\n")
    return {"dice": dice, "dice_raw": dice_raw, "hd95": hd,
            "postprocessed": postprocessed}
