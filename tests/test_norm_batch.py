"""--norm_name batch: TorchBatchNorm parity vs torch, CUNet train/eval, SyncBN.

The reference threads ``norm_name`` into every conv block
(/root/reference/networks/hybrid_CTUNet.py:85-87, networks/resnet.py:97-101)
and converts to SyncBatchNorm under DDP (/root/reference/main_C_TUNet.py:193-194).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hybrid_ctunet_tpu.models.cunet import CUNet
from hybrid_ctunet_tpu.ops.norm import TorchBatchNorm
from hybrid_ctunet_tpu.parallel.dp import (
    make_dp_train_step,
    replicate_state,
    shard_batch,
)
from hybrid_ctunet_tpu.parallel.mesh import make_mesh
from hybrid_ctunet_tpu.train.state import create_train_state
from hybrid_ctunet_tpu.train.steps import make_train_step


def _torch_bn_reference(x_np, steps):
    """torch BatchNorm3d over `steps` forwards of the same batch (train mode),
    returning (train outputs, running_mean, running_var, eval output)."""
    C = x_np.shape[-1]
    bn = torch.nn.BatchNorm3d(C)
    bn.train()
    xt = torch.from_numpy(np.moveaxis(x_np, -1, 1))  # NDHWC -> NCDHW
    outs = [bn(xt).detach().numpy() for _ in range(steps)]
    bn.eval()
    ev = bn(xt).detach().numpy()
    to_cl = lambda a: np.moveaxis(a, 1, -1)
    return ([to_cl(o) for o in outs], bn.running_mean.numpy(),
            bn.running_var.numpy(), to_cl(ev))


def test_torch_batchnorm_parity():
    g = np.random.default_rng(0)
    x = g.standard_normal((2, 4, 5, 3, 6)).astype(np.float32)
    t_outs, t_mean, t_var, t_eval = _torch_bn_reference(x, steps=3)

    mod = TorchBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    bs = variables["batch_stats"]
    # init matches torch: running_mean 0, running_var 1
    np.testing.assert_array_equal(np.asarray(bs["mean"]), np.zeros(6))
    np.testing.assert_array_equal(np.asarray(bs["var"]), np.ones(6))

    for t_out in t_outs:  # 3 train-mode steps on the same batch
        out, upd = mod.apply(
            {"params": variables["params"], "batch_stats": bs},
            jnp.asarray(x), mutable=["batch_stats"],
        )
        np.testing.assert_allclose(np.asarray(out), t_out, atol=1e-5)
        bs = upd["batch_stats"]

    # running buffers: torch tracks UNBIASED variance with momentum 0.1
    np.testing.assert_allclose(np.asarray(bs["mean"]), t_mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bs["var"]), t_var, atol=1e-5)

    # eval mode (immutable apply) uses the running buffers
    ev = mod.apply({"params": variables["params"], "batch_stats": bs}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ev), t_eval, atol=1e-5)


def test_torch_batchnorm_affine_grads_flow():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 3, 3, 3, 4)),
                    jnp.float32)
    mod = TorchBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), x)

    def loss(params):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, mutable=["batch_stats"],
        )
        return jnp.sum((out - 1.0) ** 2)

    grads = jax.grad(loss)(variables["params"])
    assert float(jnp.sum(jnp.abs(grads["scale"]))) > 0
    assert float(jnp.sum(jnp.abs(grads["bias"]))) > 0


def test_cunet_batchnorm_train_and_eval():
    """CUNet --norm_name batch: batch_stats created, updated by the train
    step, and consumed by an immutable eval apply."""
    g = np.random.default_rng(0)
    image = jnp.asarray(g.standard_normal((2, 16, 16, 8, 1)), jnp.float32)
    label = jnp.asarray(g.integers(0, 3, (2, 16, 16, 8, 1)), jnp.float32)
    model = CUNet(out_channels=3, model_depth=50, norm_name="batch")
    state = create_train_state(model, jax.random.PRNGKey(0), image[:1])
    assert state.batch_stats is not None
    stats0 = jax.tree_util.tree_leaves(state.batch_stats)
    assert len(stats0) > 0

    step = jax.jit(make_train_step("cunet"))
    state2, metrics = step(state, image, label, 1e-3)
    assert np.isfinite(float(metrics["loss"]))
    # running buffers moved
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(stats0, jax.tree_util.tree_leaves(state2.batch_stats))
    ]
    assert max(moved) > 0

    # eval-mode forward (immutable): uses the running buffers, no update
    outs = model.apply(
        {"params": state2.params, "batch_stats": state2.batch_stats}, image
    )
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)

    # a second step from the updated stats also runs (stats threading in
    # compute_grads)
    state3, _ = step(state2, image, label, 1e-3)
    assert state3.step == 2


def test_cunet_batchnorm_grad_accum_runs():
    g = np.random.default_rng(0)
    image = jnp.asarray(g.standard_normal((4, 16, 16, 8, 1)), jnp.float32)
    label = jnp.asarray(g.integers(0, 3, (4, 16, 16, 8, 1)), jnp.float32)
    model = CUNet(out_channels=3, model_depth=50, norm_name="batch")
    state = create_train_state(model, jax.random.PRNGKey(0), image[:1])
    step = jax.jit(make_train_step("cunet", grad_accum=2))
    state2, metrics = step(state, image, label, 1e-3)
    assert np.isfinite(float(metrics["loss"]))
    moved = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.batch_stats),
            jax.tree_util.tree_leaves(state2.batch_stats),
        )
    ]
    assert max(moved) > 0


def test_sync_batchnorm_matches_global_batch():
    """SyncBatchNorm (norm 'batch:data') on the 8-device mesh == unsharded
    BatchNorm on the global batch: the forward pmean-syncs E[x], E[x^2], so
    sharding the batch must not change the math
    (reference main_C_TUNet.py:193-194)."""
    g = np.random.default_rng(0)
    image = jnp.asarray(g.standard_normal((8, 16, 16, 8, 1)), jnp.float32)
    label = jnp.asarray(g.integers(0, 3, (8, 16, 16, 8, 1)), jnp.float32)

    ref_model = CUNet(out_channels=3, model_depth=50, norm_name="batch")
    ref_state = create_train_state(ref_model, jax.random.PRNGKey(0), image[:1])
    ref_step = jax.jit(make_train_step("cunet"))
    ref_state, ref_metrics = ref_step(ref_state, image, label, 1e-3)

    mesh = make_mesh()
    dp_model = CUNet(out_channels=3, model_depth=50, norm_name="batch:data")
    dp_state = create_train_state(dp_model, jax.random.PRNGKey(0), image[:1])
    dp_step = make_dp_train_step("cunet", mesh, donate=False)
    valid = jnp.ones((image.shape[0],), jnp.float32)
    dp_state = replicate_state(dp_state, mesh)
    im, lb, vd = shard_batch((image, label, valid), mesh)
    dp_state, dp_metrics = dp_step(dp_state, im, lb, vd, 1e-3)

    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
    )
    # running buffers match the global-batch run (pmean-of-shard-moments vs
    # one global reduction: same math, fp32 association noise only)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.batch_stats),
        jax.tree_util.tree_leaves(dp_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5, rtol=1e-3)
    # params agree to Adam-noise tolerance (same contract as
    # test_dp_step_matches_single_device)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params),
        jax.tree_util.tree_leaves(dp_state.params),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2.5e-3, rtol=1e-4)
