"""Model-level structural parity: output shapes and exact parameter counts vs
the reference (SURVEY.md §2.2 verified: CUNet d101 50.78M, TUNet pf8 109.90M,
CTUNet 174.80M, ResNet-101 encoder 16.46M)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_ctunet_tpu.models import CTUNet, CUNet, TUNet
from hybrid_ctunet_tpu.models.resnet3d import ResNet3D
from hybrid_ctunet_tpu.models.vit3d import ViT3D


def _count_params(model, x_shape):
    x = jnp.zeros(x_shape, jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    return sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))


def _out_shapes(model, x_shape):
    x = jnp.zeros(x_shape, jnp.float32)
    var_shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x), var_shapes, jax.ShapeDtypeStruct(x_shape, jnp.float32)
    )
    return jax.tree.map(lambda s: s.shape, out, is_leaf=lambda s: hasattr(s, "shape"))


# Exact reference counts measured by instantiating /root/reference networks
# under tests/monai_stub.py (torch CPU). The reference's ResBlock always
# *creates* its 1x1x1 projection conv3 even when the forward never uses it
# (hybrid_CTUNet.py:75-91 builds conv3 unconditionally; forward gates on
# self.downsample): those dead params are intentionally not replicated here.
#   CUNet d101: reference 50,783,850 = ours + 4,096 (dead conv3 in
#     res_decoder0's 64->64 ResBlock)
#   CTUNet d101/pf8: reference 174,801,766 = ours + 692,224 (dead conv3 in
#     the six Up_2Fusion ResBlocks + res_decoder0: 2*512^2+2*256^2+2*128^2+64^2)
REF_RESNET101 = 16_457_152
REF_VIT_PF8 = 86_937_856
REF_CUNET_D101 = 50_783_850
REF_TUNET_PF8 = 109_904_124
REF_CTUNET = 174_801_766


def test_resnet101_encoder_param_count_and_pyramid():
    model = ResNet3D(model_depth=101)
    n = _count_params(model, (1, 96, 96, 96, 1))
    assert n == REF_RESNET101, f"ResNet-101 encoder params {n} != reference {REF_RESNET101}"
    shapes = _out_shapes(model, (1, 96, 96, 96, 1))
    assert list(shapes) == [
        (1, 48, 48, 96, 128),
        (1, 24, 24, 48, 256),
        (1, 12, 12, 24, 512),
        (1, 6, 6, 12, 1024),
    ]


def test_cunet_param_count_and_shapes():
    model = CUNet(out_channels=14, model_depth=101)
    n = _count_params(model, (1, 96, 96, 96, 1))
    assert n == REF_CUNET_D101 - 4_096, f"CUNet d101 params {n} (see dead-conv3 note)"
    shapes = _out_shapes(model, (1, 96, 96, 96, 1))
    assert shapes == (
        (1, 96, 96, 96, 14),
        (1, 48, 48, 96, 14),
        (1, 24, 24, 48, 14),
    )


def test_tunet_param_count_and_shapes():
    model = TUNet(out_channels=14, patch_frame=8)
    n = _count_params(model, (1, 96, 96, 96, 1))
    assert n == REF_TUNET_PF8, f"TUNet pf8 params {n} != reference {REF_TUNET_PF8}"
    shapes = _out_shapes(model, (1, 96, 96, 96, 1))
    assert shapes == ((1, 96, 96, 96, 14), (1, 96, 96, 96, 14))


def test_vit_param_count():
    model = ViT3D(frame_patch_size=8)
    n = _count_params(model, (1, 96, 96, 96, 1))
    assert n == REF_VIT_PF8, f"ViT pf8 params {n} != reference {REF_VIT_PF8}"


def test_vit_patch_fold_matches_standard():
    """VIT_PATCH_FOLD: the strided-conv + moment-pool patch embedding must
    match the materialized LN -> Dense path (reassociated fp32 math) and
    keep the identical parameter tree."""
    import jax
    import numpy as np
    from hybrid_ctunet_tpu import flags

    model = ViT3D(image_size=(32, 32), frames=16, image_patch_size=16,
                  frame_patch_size=8, dim=64, depth=1, heads=2, dim_head=16,
                  mlp_dim=128)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 16, 1)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)
    with flags.override(VIT_PATCH_FOLD="1"):
        params_f = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
    assert jax.tree_util.tree_structure(params_f) == jax.tree_util.tree_structure(params)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_ctunet_param_count_and_shapes():
    model = CTUNet(out_channels=14, model_depth=101, patch_frame=8)
    n = _count_params(model, (1, 96, 96, 96, 1))
    assert n == REF_CTUNET - 692_224, f"CTUNet params {n} (see dead-conv3 note)"
    (res, res48, res24), (vit, vit96) = _out_shapes(model, (1, 96, 96, 96, 1))
    assert res == (1, 96, 96, 96, 14)
    assert res48 == (1, 48, 48, 96, 14)
    assert res24 == (1, 24, 24, 48, 14)
    assert vit == (1, 96, 96, 96, 14)
    assert vit96 == (1, 96, 96, 96, 14)


def test_patch_frame_16_rejected_cleanly():
    """The reference crashes deep in a rearrange for pf=16 at 96^3
    (SURVEY.md §2.6); we reject with a clear error."""
    model = TUNet(out_channels=14, patch_frame=16)
    with pytest.raises(Exception):
        _out_shapes(model, (1, 96, 96, 96, 1))


def test_cunet_tiny_forward_runs():
    """Actually execute a small CUNet forward on CPU (48^3, depth 50)."""
    model = CUNet(out_channels=3, model_depth=50)
    x = jnp.zeros((1, 48, 48, 48, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out[0].shape == (1, 48, 48, 48, 3)
    assert not np.isnan(np.asarray(out[0])).any()


def test_pixelshuffle_blockdiag_matches_default(rng):
    """Env-gated block-diagonal PixelShuffleLinear path (default off) equals
    the reference small-Dense path."""
    import os
    import jax
    import jax.numpy as jnp
    from hybrid_ctunet_tpu.models.layers import PixelShuffleLinear

    x = jnp.asarray(rng.standard_normal((2, 4, 5, 6, 128)), jnp.float32)
    for factor, feats in [((2, 2, 2), 64), ((2, 2, 1), 32)]:
        mod = PixelShuffleLinear(factor, feats)
        params = mod.init(jax.random.PRNGKey(0), x)
        from hybrid_ctunet_tpu import flags
        with flags.override(SHUFFLE_BD="1"):
            y1 = mod.apply(params, x)
        y0 = mod.apply(params, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=5e-6, rtol=1e-5)


def test_pixelshuffle_conv_transpose_path_matches(rng):
    """SHUFFLE_CT=1 (native strided transposed-conv formulation) must equal
    the reshape/transpose path exactly, same parameter tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hybrid_ctunet_tpu import flags
    from hybrid_ctunet_tpu.models.layers import PixelShuffleLinear

    for factor in [(2, 2, 1), (2, 2, 2)]:
        div = factor[0] * factor[1] * factor[2]
        x = jnp.asarray(rng.standard_normal((2, 4, 5, 6, 8 * div)), jnp.float32)
        mod = PixelShuffleLinear(factor, 7)
        with flags.override(SHUFFLE_CT="0"):
            params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
            want = mod.apply(params, x)
        with flags.override(SHUFFLE_CT="1"):
            params_c = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
            got = mod.apply(params, x)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)


def test_pixelshuffle_fold_out_matches_fold_of_default(rng):
    """fold_out=True (block-diag Dense emitting the fold_z layout directly)
    equals fold_z(default shuffle), exactly, with the same parameter tree."""
    import jax
    import jax.numpy as jnp
    from hybrid_ctunet_tpu.models.layers import PixelShuffleLinear
    from hybrid_ctunet_tpu.ops.conv import fold_z

    for factor in [(2, 2, 1), (2, 2, 2), (1, 1, 1)]:
        div = factor[0] * factor[1] * factor[2]
        x = jnp.asarray(rng.standard_normal((2, 4, 5, 6, 8 * div)), jnp.float32)
        mod = PixelShuffleLinear(factor, 7)
        mod_f = PixelShuffleLinear(factor, 7, fold_out=True)
        params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
        params_f = jax.eval_shape(mod_f.init, jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)
        want = fold_z(mod.apply(params, x))
        got = mod_f.apply(params, x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv_transpose_fold_out_matches_fold_of_default(rng):
    """conv_transpose3d_same(fold_out=True) == fold_z(conv_transpose3d_same)
    on both the kernel==stride einsum fast path and the general lax path."""
    import jax.numpy as jnp
    from hybrid_ctunet_tpu import flags
    from hybrid_ctunet_tpu.ops.conv import conv_transpose3d_same, fold_z

    for stride in [(2, 2, 1), (2, 2, 2)]:
        x = jnp.asarray(rng.standard_normal((2, 4, 5, 6, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((*stride, 8, 5)), jnp.float32)
        for native in ["0", "1"]:
            with flags.override(TRANSP_NATIVE=native):
                want = fold_z(conv_transpose3d_same(x, w, stride))
                got = conv_transpose3d_same(x, w, stride, fold_out=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
            )


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


@pytest.mark.parametrize("altfold", ["0", "1"])
def test_fold96_tunet_matches_default(rng, altfold):
    """FOLD96 (full-res region kept in the fold_z layout across block
    boundaries) is an exact reordering: same parameter tree, same outputs,
    on both the altfold fast path and the standard fallback."""
    from hybrid_ctunet_tpu import flags

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), jnp.float32)
    model = TUNet(**TINY)
    with flags.override(FOLD96="0", ALTFOLD=altfold):
        params = model.init(jax.random.PRNGKey(0), x)
        want = model.apply(params, x)
    with flags.override(FOLD96="1", ALTFOLD=altfold):
        params_f = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)
        got = model.apply(params, x)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("subflags", [
    dict(FOLD96_LAST="1"),           # shuffle emits the folded layout itself
    dict(FOLD96_MID="0"),            # UpConvBlock internal boundary unfolds
    dict(FOLD96_LAST="1", FOLD96_MID="0"),
])
def test_fold96_subflags_match_default(rng, subflags):
    """FOLD96_LAST / FOLD96_MID are exact reorderings of the FOLD96 path:
    same parameter tree, same outputs (TUNet covers LAST; CTUNet covers
    MID via res_decoder0)."""
    from hybrid_ctunet_tpu import flags

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), jnp.float32)
    for model in (TUNet(**TINY), CTUNet(model_depth=50, **TINY)):
        with flags.override(FOLD96="1"):
            params = model.init(jax.random.PRNGKey(0), x)
            want = model.apply(params, x)
        with flags.override(FOLD96="1", **subflags):
            params_f = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
            assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)
            got = model.apply(params, x)
        for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("altfold", ["0", "1"])
def test_fold96_ctunet_matches_default(rng, altfold):
    from hybrid_ctunet_tpu import flags

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), jnp.float32)
    model = CTUNet(model_depth=50, **TINY)
    with flags.override(FOLD96="0", ALTFOLD=altfold):
        params = model.init(jax.random.PRNGKey(0), x)
        want = model.apply(params, x)
    with flags.override(FOLD96="1", ALTFOLD=altfold):
        params_f = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)
        got = model.apply(params, x)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5, rtol=1e-5)
