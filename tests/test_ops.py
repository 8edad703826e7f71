"""Parity tests for norm/act/loss/resize/importance/schedule ops against torch
and scipy references (the behaviors the reference gets from torch/MONAI)."""
import math

import numpy as np
import pytest
import scipy.ndimage as ndimage
import torch

import jax.numpy as jnp

from hybrid_ctunet_tpu.ops.act import gelu_exact, leaky_relu
from hybrid_ctunet_tpu.ops.importance import gaussian_importance_map
from hybrid_ctunet_tpu.ops.losses import dice_ce_loss, dice_loss, softmax_cross_entropy
from hybrid_ctunet_tpu.ops.norm import instance_norm, layer_norm
from hybrid_ctunet_tpu.ops.resize import downscale_labels, resample_3d_nearest, zoom_nearest
from hybrid_ctunet_tpu.train.schedule import warmup_cosine_lr


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 6, 7, 3)).astype(np.float32)
    y = np.asarray(instance_norm(jnp.asarray(x)))
    m = torch.nn.InstanceNorm3d(3)  # affine=False, eps=1e-5 (MONAI default)
    yt = m(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 10, 16)).astype(np.float32)
    w = rng.standard_normal((16,)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    y = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    m = torch.nn.LayerNorm(16)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(w))
        m.bias.copy_(torch.from_numpy(b))
    yt = m(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_activations_match_torch(rng):
    x = rng.standard_normal((100,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(leaky_relu(jnp.asarray(x))),
        torch.nn.functional.leaky_relu(torch.from_numpy(x), 0.01).numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(gelu_exact(jnp.asarray(x))),
        torch.nn.functional.gelu(torch.from_numpy(x)).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


def _monai_style_dice_ce_torch(logits_ncdhw, labels_ncdhw, smooth_nr=0.0, smooth_dr=1e-6):
    """Hand-written torch replica of MONAI DiceCELoss(to_onehot_y, softmax,
    squared_pred, smooth_nr=0, smooth_dr=1e-6) per main_CTUNet.py:156-158."""
    n_classes = logits_ncdhw.shape[1]
    probs = torch.softmax(logits_ncdhw, dim=1)
    labels = labels_ncdhw[:, 0].long()
    onehot = torch.nn.functional.one_hot(labels, n_classes).permute(0, 4, 1, 2, 3).float()
    dims = (2, 3, 4)
    inter = (onehot * probs).sum(dims)
    denom = (onehot**2).sum(dims) + (probs**2).sum(dims)
    dice = (1.0 - (2 * inter + smooth_nr) / (denom + smooth_dr)).mean()
    ce = torch.nn.functional.cross_entropy(logits_ncdhw, labels)
    return (dice + ce).item()


def test_dice_ce_matches_torch_replica(rng):
    logits = rng.standard_normal((2, 6, 6, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 6, 6, 4, 1)).astype(np.int32)
    ours = float(dice_ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = _monai_style_dice_ce_torch(
        torch.from_numpy(logits).permute(0, 4, 1, 2, 3),
        torch.from_numpy(labels).permute(0, 4, 1, 2, 3),
    )
    assert abs(ours - theirs) < 1e-5


def test_ce_matches_torch(rng):
    logits = rng.standard_normal((2, 4, 4, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 4, 4, 4)).astype(np.int32)
    ours = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 4, 1, 2, 3), torch.from_numpy(labels).long()
    ).item()
    assert abs(ours - theirs) < 1e-6


def test_dice_perfect_prediction_is_zero():
    labels = np.zeros((1, 4, 4, 4, 1), np.int32)
    labels[0, :2] = 1
    logits = np.where(
        np.arange(2)[None, None, None, None, :] == labels, 50.0, -50.0
    ).astype(np.float32)
    assert float(dice_loss(jnp.asarray(logits), jnp.asarray(labels))) < 1e-5


@pytest.mark.parametrize(
    "shape,zoom",
    [
        ((96, 96, 96), (0.5, 0.5, 1.0)),
        ((96, 96, 96), (0.25, 0.25, 0.5)),
        ((37, 41, 23), (0.5, 0.5, 1.0)),
    ],
)
def test_zoom_nearest_matches_scipy(rng, shape, zoom):
    x = rng.integers(0, 14, shape).astype(np.float32)
    ours = np.asarray(zoom_nearest(jnp.asarray(x), zoom))
    theirs = ndimage.zoom(x, zoom, order=0, prefilter=False)
    assert ours.shape == theirs.shape
    np.testing.assert_array_equal(ours, theirs)


def test_downscale_labels_matches_reference_step(rng):
    """trainer_CTUNet.py:93-94 applies zoom (1,1,.5,.5,1)/(1,1,.25,.25,.5) in
    NCDHW; our channels-last equivalent must produce the same voxels."""
    lab = rng.integers(0, 14, (2, 96, 96, 96, 1)).astype(np.float32)
    ours = np.asarray(downscale_labels(jnp.asarray(lab), (0.5, 0.5, 1.0)))
    theirs = ndimage.zoom(lab, (1, 0.5, 0.5, 1.0, 1), order=0, prefilter=False)
    np.testing.assert_array_equal(ours, theirs)
    assert ours.shape == (2, 48, 48, 96, 1)
    ours2 = np.asarray(downscale_labels(jnp.asarray(lab), (0.25, 0.25, 0.5)))
    assert ours2.shape == (2, 24, 24, 48, 1)


def test_resample_3d_nearest_matches_reference(rng):
    x = rng.integers(0, 14, (30, 40, 20)).astype(np.float32)
    target = (50, 33, 27)
    ours = np.asarray(resample_3d_nearest(jnp.asarray(x), target))
    zoom = tuple(t / s for t, s in zip(target, x.shape))
    theirs = ndimage.zoom(x, zoom, order=0, prefilter=False)
    assert ours.shape == theirs.shape
    np.testing.assert_array_equal(ours, theirs)


def test_gaussian_importance_map_properties():
    m = gaussian_importance_map((96, 96, 96))
    assert m.shape == (96, 96, 96)
    assert m.max() == pytest.approx(1.0)
    assert m[48, 48, 48] == pytest.approx(1.0)
    assert (m > 0).all()
    # separable symmetric-ish profile: edges far smaller than centre
    assert m[0, 48, 48] < 5e-4
    # matches the erf-gaussian closed form at a couple of offsets
    sigma = 0.125 * 96
    k = lambda d: 0.5 * (
        math.erf((d + 0.5) / (sigma * math.sqrt(2))) - math.erf((d - 0.5) / (sigma * math.sqrt(2)))
    )
    expected = k(-8) / k(0)
    assert m[40, 48, 48] == pytest.approx(expected, rel=1e-6)


def _torch_reference_lr_schedule(base_lr, warmup, maxe, epochs):
    """The reference's LinearWarmupCosineAnnealingLR closed form
    (optimizers/lr_scheduler.py:161-177)."""
    out = []
    for e in range(epochs):
        if e < warmup:
            out.append(0.0 + e * base_lr / (warmup - 1))
        else:
            out.append(0.5 * base_lr * (1 + math.cos(math.pi * (e - warmup) / (maxe - warmup))))
    return out


def test_warmup_cosine_matches_reference_closed_form():
    base, warmup, maxe = 1e-4, 50, 5000
    want = _torch_reference_lr_schedule(base, warmup, maxe, 200)
    got = [
        float(warmup_cosine_lr(e, base_lr=base, warmup_epochs=warmup, max_epochs=maxe))
        for e in range(200)
    ]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-12)
    # boundary conditions
    assert got[0] == 0.0
    assert got[warmup - 1] == pytest.approx(base, rel=1e-6)
    full = float(warmup_cosine_lr(maxe, base_lr=base, warmup_epochs=warmup, max_epochs=maxe))
    assert full == pytest.approx(0.0, abs=1e-12)


def test_winograd_reference_matches_direct_conv(rng):
    """F(2,3)^3 transforms (ops/winograd.py — round-2 kernel building block)
    vs direct convolution."""
    import jax.numpy as jnp
    from jax import lax
    from hybrid_ctunet_tpu.ops.winograd import conv3x3_winograd_reference

    x = jnp.asarray(rng.standard_normal((2, 8, 6, 10, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 7)) * 0.2, jnp.float32)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    want = lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
    got = conv3x3_winograd_reference(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
