"""Dropout parity (VERDICT round-1 missing item 1): the reference plumbs
--dropout_rate into ViT Attention + FeedForward (reference vit.py:38-74) and
the decoder pyramid's MultiAxisAttention/FeedForward
(hybrid_CTUNet.py:560-576); pixelweight_attention HAS dropout sites
(:637-642) but the reference's own callers never pass a nonzero rate there
(:296-297). These tests pin: (a) rate 0 / deterministic inference is
bit-identical to the pre-dropout paths (golden tests stay valid), (b) dropout
actually fires at every live site under deterministic=False with an rng, and
(c) the train step wires the rng through."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_ctunet_tpu.models import TUNet
from hybrid_ctunet_tpu.models.layers import (
    FeedForward,
    MultiAxisWindowAttention,
    PixelweightFusion,
)
from hybrid_ctunet_tpu.models.vit3d import ViT3D, ViTAttention

TINY = dict(
    out_channels=3,
    dim_conv_stem=16,
    img_size=(32, 32),
    frames=32,
    patch_frame=8,
    hidden_size=64,
    num_depths=2,
    mlp_dim=128,
    num_heads=2,
    window=2,
)


def _differs(a, b):
    return not np.allclose(np.asarray(a), np.asarray(b))


def test_feedforward_dropout_fires_and_eval_matches_rate0(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    m0 = FeedForward(dropout=0.0)
    m5 = FeedForward(dropout=0.5)
    params = m0.init(jax.random.PRNGKey(0), x)
    # same param tree (nn.Dropout is parameter-free)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, m5.init(jax.random.PRNGKey(0), x))
    y0 = m0.apply(params, x)
    # deterministic inference with rate>0 == rate 0 exactly
    np.testing.assert_array_equal(np.asarray(m5.apply(params, x, deterministic=True)), np.asarray(y0))
    # training mode fires and is rng-dependent
    y_a = m5.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    y_b = m5.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert _differs(y_a, y0) and _differs(y_a, y_b)


def test_window_attention_dropout_fires(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 32)), jnp.float32)
    for grid in (False, True):
        m = MultiAxisWindowAttention(window=2, grid=grid, dropout=0.5)
        params = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(params, x)
        np.testing.assert_array_equal(
            np.asarray(m.apply(params, x, deterministic=True)), np.asarray(y0)
        )
        y_tr = m.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
        assert _differs(y_tr, y0)


def test_vit_attention_dropout_fires(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 64)), jnp.float32)
    m = ViTAttention(heads=2, dim_head=16, dropout=0.5)
    params = m.init(jax.random.PRNGKey(0), x)
    y0 = m.apply(params, x)
    y_tr = m.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert _differs(y_tr, y0)


def test_pixelweight_dropout_capability(rng):
    x1 = jnp.asarray(rng.standard_normal((1, 2, 2, 2, 64)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, 2, 2, 2, 64)), jnp.float32)
    m = PixelweightFusion(dropout=0.5)
    params = m.init(jax.random.PRNGKey(0), x1, x2)
    y0 = m.apply(params, x1, x2)
    np.testing.assert_array_equal(
        np.asarray(m.apply(params, x1, x2, deterministic=True)), np.asarray(y0)
    )
    y_tr = m.apply(params, x1, x2, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert _differs(y_tr, y0)


def test_vit3d_scan_blocks_dropout_distinct_per_layer(rng):
    """nn.scan must split the dropout rng per layer — a broadcast rng would
    reuse identical masks across depth."""
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), jnp.float32)
    m = ViT3D(image_size=(32, 32), frames=32, image_patch_size=16, frame_patch_size=8,
              dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128, dropout=0.5)
    params = m.init(jax.random.PRNGKey(0), x)
    y0 = m.apply(params, x)
    y_tr = m.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert _differs(y_tr, y0)


def test_tunet_dropout_reaches_model_and_train_step(rng):
    """End to end: dropout_rate>0 changes training forwards but not eval;
    make_train_step(dropout=True) runs and descends."""
    from hybrid_ctunet_tpu.train.state import create_train_state
    from hybrid_ctunet_tpu.train.steps import make_train_step

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), jnp.float32)
    m0 = TUNet(dropout_rate=0.0, **TINY)
    m2 = TUNet(dropout_rate=0.2, **TINY)
    params = m0.init(jax.random.PRNGKey(0), x)["params"]
    out0 = m0.apply({"params": params}, x)
    out_eval = m2.apply({"params": params}, x)  # deterministic default
    np.testing.assert_array_equal(np.asarray(out0[0]), np.asarray(out_eval[0]))
    out_tr = m2.apply(
        {"params": params}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert _differs(out_tr[0], out0[0])

    label = jnp.asarray((rng.random((1, 32, 32, 32, 1)) * 3).astype(np.int32), jnp.float32)
    state = create_train_state(m2, jax.random.PRNGKey(0), x)
    step = jax.jit(make_train_step("tunet", dropout=True))
    losses = []
    for _ in range(3):
        state, metrics = step(state, x, label, 1e-3)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_grad_accum_dropout_uses_distinct_microbatch_masks(rng):
    """With grad_accum, each microbatch must draw fresh dropout noise — the
    grads must differ from running both microbatches with the same rng."""
    from hybrid_ctunet_tpu.train.steps import LOSS_FNS, compute_grads
    from hybrid_ctunet_tpu.train.state import create_train_state

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 1)), jnp.float32)
    label = jnp.asarray((rng.random((2, 32, 32, 32, 1)) * 3).astype(np.int32), jnp.float32)
    m = TUNet(dropout_rate=0.5, **TINY)
    state = create_train_state(m, jax.random.PRNGKey(0), x[:1])
    key = jax.random.PRNGKey(7)
    _, _, g_acc, _ = compute_grads(
        LOSS_FNS["tunet"], state, x, label, smooth_nr=0.0, smooth_dr=1e-6,
        grad_accum=2, dropout_rng=key,
    )
    # same data twice with the SAME rng must give identical micro-grads; so if
    # accum drew the same mask per microbatch, grads for microbatch 0 and 1 on
    # identical inputs would coincide. Use duplicated inputs to detect reuse.
    x_dup = jnp.concatenate([x[:1], x[:1]], axis=0)
    lb_dup = jnp.concatenate([label[:1], label[:1]], axis=0)
    _, _, g_dup, _ = compute_grads(
        LOSS_FNS["tunet"], state, x_dup, lb_dup, smooth_nr=0.0, smooth_dr=1e-6,
        grad_accum=2, dropout_rng=key,
    )
    # pin the derivation: microbatch i uses fold_in(key, i), so the
    # duplicated-input accum grads must equal the mean of the two single runs
    singles = []
    for i in range(2):
        _, _, g, _ = compute_grads(
            LOSS_FNS["tunet"], state, x[:1], label[:1], smooth_nr=0.0, smooth_dr=1e-6,
            grad_accum=1, dropout_rng=jax.random.fold_in(key, i),
        )
        singles.append(g)
    expect = jax.tree.map(lambda a, b: (a + b) / 2.0, *singles)
    for a, b in zip(jax.tree.leaves(g_dup), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
    # and the two microbatch masks genuinely differ
    diff = [
        not np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
        for a, b in zip(jax.tree.leaves(singles[0]), jax.tree.leaves(singles[1]))
    ]
    assert any(diff)
    del g_acc
