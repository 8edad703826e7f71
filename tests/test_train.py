"""Train-step semantics: exact loss weighting structure, LR injection per
epoch, gradient flow, checkpoint round-trip."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybrid_ctunet_tpu.models import CUNet
from hybrid_ctunet_tpu.ops.losses import dice_ce_loss
from hybrid_ctunet_tpu.ops.resize import downscale_labels
from hybrid_ctunet_tpu.train.checkpoint import load_checkpoint, restore_train_state, save_checkpoint
from hybrid_ctunet_tpu.train.schedule import warmup_cosine_lr
from hybrid_ctunet_tpu.train.state import create_train_state
from hybrid_ctunet_tpu.train.steps import ctunet_loss_fn, cunet_loss_fn, make_train_step


class _TinyDSModel(__import__("flax").linen.Module):
    """Minimal 3-head model with CUNet's output contract (full, 1/2, 1/4)."""

    out_channels: int = 3

    @__import__("flax").linen.compact
    def __call__(self, x):
        import flax.linen as nn

        h = nn.Conv(8, (3, 3, 3), padding="SAME")(x)
        h = nn.relu(h)
        full = nn.Conv(self.out_channels, (1, 1, 1))(h)
        half = full[:, ::2, ::2, :]
        quarter = full[:, ::4, ::4, ::2]
        return (full, half, quarter)


def _tiny_cunet_state(rng_seed=0, shape=(1, 16, 16, 16, 1)):
    model = _TinyDSModel()
    x = jnp.zeros(shape, jnp.float32)
    return model, create_train_state(model, jax.random.PRNGKey(rng_seed), x)


def test_cunet_loss_weighting_structure(rng):
    """L = L0 + 0.5*(L1 + 0.5*L2) — trainer_CUNet.py:91-100."""
    outs = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in [(1, 8, 8, 8, 3), (1, 4, 4, 8, 3), (1, 2, 2, 4, 3)]
    )
    label = jnp.asarray(rng.integers(0, 3, (1, 8, 8, 8, 1)))
    total, _ = cunet_loss_fn(outs, label)
    l0 = dice_ce_loss(outs[0], label)
    l1 = dice_ce_loss(outs[1], downscale_labels(label, (0.5, 0.5, 1.0)))
    l2 = dice_ce_loss(outs[2], downscale_labels(label, (0.25, 0.25, 0.5)))
    np.testing.assert_allclose(float(total), float(l0 + 0.5 * (l1 + 0.5 * l2)), rtol=1e-6)


def test_ctunet_loss_weighting_structure(rng):
    """total = loss1 + 0.5*loss2 — trainer_CTUNet.py:90-103."""
    res = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in [(1, 8, 8, 8, 3), (1, 4, 4, 8, 3), (1, 2, 2, 4, 3)]
    )
    vit = tuple(jnp.asarray(rng.standard_normal((1, 8, 8, 8, 3)).astype(np.float32)) for _ in range(2))
    label = jnp.asarray(rng.integers(0, 3, (1, 8, 8, 8, 1)))
    total, aux = ctunet_loss_fn((res, vit), label)
    np.testing.assert_allclose(float(total), float(aux["loss1"] + 0.5 * aux["loss2"]), rtol=1e-6)


def test_train_step_reduces_loss(rng):
    model, state = _tiny_cunet_state()
    step = jax.jit(make_train_step("cunet"))
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 1)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 3, (2, 16, 16, 16, 1)))
    losses = []
    for i in range(5):
        # epoch >= warmup so the closed-form LR is the cosine branch (nonzero)
        lr = warmup_cosine_lr(i + 2, base_lr=1e-2, warmup_epochs=2, max_epochs=100)
        state, metrics = step(state, img, lab, lr)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert not np.isnan(losses).any()


def test_lr_injection_reaches_optimizer(rng):
    model, state = _tiny_cunet_state()
    step = jax.jit(make_train_step("cunet"))
    img = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    lab = jnp.zeros((1, 16, 16, 16, 1), jnp.int32)
    state, _ = step(state, img, lab, jnp.float32(0.123))
    assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(0.123)
    # lr=0 must freeze params exactly (AdamW update and decay both scale by lr)
    params_before = jax.device_get(state.params)
    state, _ = step(state, img, lab, jnp.float32(0.0))
    params_after = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(params_after)):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_roundtrip(tmp_path, rng):
    model, state = _tiny_cunet_state()
    step = jax.jit(make_train_step("cunet"))
    img = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 3, (1, 16, 16, 16, 1)))
    state, _ = step(state, img, lab, jnp.float32(1e-3))

    save_checkpoint(str(tmp_path), "model_res", state, epoch=7, best_acc=0.5)
    restored = load_checkpoint(os.path.join(str(tmp_path), "model_res"), state)
    assert restored["epoch"] == 7
    assert restored["best_acc"] == pytest.approx(0.5)
    _, fresh = _tiny_cunet_state(rng_seed=1)
    fresh = restore_train_state(fresh, restored)
    for a, b in zip(jax.tree.leaves(fresh.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_step_matches_plain():
    """jax.checkpoint remat trades FLOPs for memory with identical math."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hybrid_ctunet_tpu.models import CUNet
    from hybrid_ctunet_tpu.train.state import create_train_state
    from hybrid_ctunet_tpu.train.steps import make_train_step

    g = np.random.default_rng(0)
    image = jnp.asarray(g.standard_normal((1, 16, 16, 8, 1)), jnp.float32)
    label = jnp.asarray(g.integers(0, 3, (1, 16, 16, 8, 1)), jnp.float32)
    model = CUNet(out_channels=3, model_depth=50)
    s0 = create_train_state(model, jax.random.PRNGKey(0), image)

    plain = jax.jit(make_train_step("cunet"))
    remat = jax.jit(make_train_step("cunet", remat=True))
    s1, m1 = plain(s0, image, label, 1e-3)
    s2, m2 = remat(s0, image, label, 1e-3)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    # recompute rounding differences in near-zero grads get amplified to
    # ~lr by Adam's normalization; bound the update difference by ~lr
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3, rtol=1e-4)


def test_grad_accum_matches_full_batch():
    """lax.scan gradient accumulation == full-batch step (exact: no
    cross-sample coupling in IN or the losses)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hybrid_ctunet_tpu.models import CUNet
    from hybrid_ctunet_tpu.train.state import create_train_state
    from hybrid_ctunet_tpu.train.steps import make_train_step

    g = np.random.default_rng(1)
    image = jnp.asarray(g.standard_normal((4, 16, 16, 8, 1)), jnp.float32)
    label = jnp.asarray(g.integers(0, 3, (4, 16, 16, 8, 1)), jnp.float32)
    model = CUNet(out_channels=3, model_depth=50)
    s0 = create_train_state(model, jax.random.PRNGKey(0), image[:1])

    full = jax.jit(make_train_step("cunet"))
    accum = jax.jit(make_train_step("cunet", grad_accum=4))
    s1, m1 = full(s0, image, label, 1e-3)
    s2, m2 = accum(s0, image, label, 1e-3)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3, rtol=1e-4)
