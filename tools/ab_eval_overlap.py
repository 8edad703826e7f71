"""A/B the eval host/device pipeline (EVAL_OVERLAP) on a synthetic multi-case
eval set, on the real chip: wall-clock with overlap on vs off, and byte-exact
row equivalence (VERDICT r3 #7 'Done' criterion).

Usage: python tools/ab_eval_overlap.py [n_cases]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from hybrid_ctunet_tpu.utils.compilation_cache import enable as enable_cache  # noqa: E402

enable_cache()


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from hybrid_ctunet_tpu import flags
    from hybrid_ctunet_tpu.cli.test_main import test_single
    from hybrid_ctunet_tpu.data.synthetic import write_synthetic_dataset

    tmp = tempfile.mkdtemp(prefix="eval_overlap_")
    data_dir = os.path.join(tmp, "data")
    os.makedirs(data_dir)
    # full-size 96^3 windows over mid-size volumes so device time per case is
    # substantial (the bench protocol's shapes, fewer windows)
    json_path = write_synthetic_dataset(
        data_dir, n_train=1, n_val=n_cases, shape=(192, 192, 96)
    )

    # an untrained flagship TUNet as the checkpoint (weights don't matter for
    # a timing A/B; rows must simply match bit-for-bit between modes)
    import jax
    import jax.numpy as jnp

    from hybrid_ctunet_tpu.cli.args import build_test_parser
    from hybrid_ctunet_tpu.cli.factory import build_model
    from hybrid_ctunet_tpu.train.checkpoint import save_checkpoint
    from hybrid_ctunet_tpu.train.state import create_train_state

    argv = [
        "--model_name=tunet",
        f"--data_dir={data_dir}",
        f"--json_list={os.path.basename(json_path)}",
        f"--pretrained_dir={tmp}/ckpt",
        "--pretrained_model_name=model_vit.pt",
        "--exp_name=overlap_ab",
    ]
    args = build_test_parser("c_tunet").parse_args(argv)
    model = build_model(args)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 96, 1), jnp.float32)
    )
    save_checkpoint(f"{tmp}/ckpt", "model_vit.pt", state, epoch=0, best_acc=0.0)

    cwd = os.getcwd()
    os.chdir(tmp)
    results = {}
    try:
        for mode in ("1", "0", "1"):  # on, off, on-again (warm symmetry)
            with flags.override(EVAL_OVERLAP=mode):
                t0 = time.time()
                rows = test_single(argv)
                dt = time.time() - t0
            key = f"overlap={mode}" + (".2" if f"overlap={mode}" in results else "")
            results[key] = (dt, rows)
            print(f"EVAL_OVERLAP={mode}: {dt:.2f}s for {n_cases} cases")
    finally:
        os.chdir(cwd)

    (t_on, r_on), (t_off, r_off) = results["overlap=1"], results["overlap=0"]
    t_on2, r_on2 = results["overlap=1.2"]
    assert np.array_equal(r_on, r_off) and np.array_equal(r_on2, r_off), "rows differ!"
    best_on = min(t_on, t_on2)
    print(
        f"rows identical; overlap {best_on:.2f}s vs serial {t_off:.2f}s "
        f"-> {100 * (t_off - best_on) / t_off:.1f}% saved"
    )


if __name__ == "__main__":
    main()
