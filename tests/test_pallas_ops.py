"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_ctunet_tpu.ops.pixelweight import (
    PixelweightParams,
    pixelweight_attention,
    pixelweight_pallas,
    pixelweight_reference,
)


def _params(rng, C):
    g = rng
    return PixelweightParams(
        ln1_scale=jnp.asarray(g.standard_normal(C), jnp.float32),
        ln1_bias=jnp.asarray(g.standard_normal(C), jnp.float32),
        ln2_scale=jnp.asarray(g.standard_normal(C), jnp.float32),
        ln2_bias=jnp.asarray(g.standard_normal(C), jnp.float32),
        qkv1_kernel=jnp.asarray(g.standard_normal((C, 3 * C)) * 0.05, jnp.float32),
        qkv2_kernel=jnp.asarray(g.standard_normal((C, 3 * C)) * 0.05, jnp.float32),
        out_kernel=jnp.asarray(g.standard_normal((C, C)) * 0.05, jnp.float32),
    )


@pytest.mark.parametrize("C,tile", [(64, 32), (128, 64)])
def test_pixelweight_pallas_matches_reference(rng, C, tile):
    shape = (1, 5, 4, 3, C)  # 60 tokens: forces ragged-tile padding
    x1 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    p = _params(rng, C)
    ref = pixelweight_reference(x1, x2, p)
    fused = pixelweight_pallas(x1, x2, p, tile_n=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_pixelweight_custom_vjp_grad_matches_reference(rng):
    C = 64
    shape = (1, 4, 4, 2, C)
    x1 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    p = _params(rng, C)

    def loss_fused(a, b, q):
        return jnp.sum(pixelweight_attention(a, b, q, use_pallas=True) ** 2)

    def loss_ref(a, b, q):
        return jnp.sum(pixelweight_reference(a, b, q) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x1, x2, p)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x1, x2, p)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4)


def test_fused_instance_norm_matches_reference(rng):
    import jax
    import jax.numpy as jnp
    from hybrid_ctunet_tpu.ops.norm_pallas import fused_instance_norm_pallas, reference

    x = jnp.asarray(rng.standard_normal((2, 7, 6, 5, 16)) * 3 + 1, jnp.float32)
    ref = reference(x)
    out = fused_instance_norm_pallas(x, tile_s=64, interpret=True)  # ragged pad
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
    # no-activation variant
    ref2 = reference(x, act=False)
    out2 = fused_instance_norm_pallas(x, act=False, tile_s=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-5, rtol=1e-5)


def test_fused_instance_norm_grad(rng):
    import jax
    import jax.numpy as jnp
    from hybrid_ctunet_tpu.ops.norm_pallas import instance_norm_act, reference

    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 8)), jnp.float32)
    g1 = jax.grad(lambda a: jnp.sum(instance_norm_act(a, use_pallas=True) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(reference(a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5, rtol=1e-5)


def test_scatter_add_windows_interpret_matches_xla(rng):
    """The in-place windowed scatter kernel (ops/scatter_pallas.py) vs the XLA
    oracle, under the Pallas interpreter on CPU — unaligned window starts,
    clamped slabs, count-lane layout, overlapping windows."""
    import jax.numpy as jnp
    from hybrid_ctunet_tpu.ops import scatter_pallas as sp

    sw, rx, ry, rz, k = 4, 4, 8, 32, 4  # rz*k = 128
    X, Y, Z = 12, 24, 64  # canvas: Y%8==0, Z*k=256 (128-multiple)
    ZC = Z * k
    starts = np.asarray(  # unaligned y (sublane) and z (lane) offsets
        [[0, 0, 0], [3, 5, 20], [8, 16, 32], [7, 9, 7]], np.int32
    )
    starts_scaled = starts * np.asarray([1, 1, k], np.int32)
    contrib = jnp.asarray(rng.standard_normal((sw, rx, ry, rz * k)), jnp.float32)
    acc0 = jnp.asarray(rng.standard_normal((X, Y, ZC)), jnp.float32)

    ref = sp.scatter_add_windows(acc0, contrib, jnp.asarray(starts_scaled), use_pallas=False)
    sp._INTERPRET = True
    try:
        out = sp.scatter_add_windows(acc0, contrib, jnp.asarray(starts_scaled), use_pallas=True)
    finally:
        sp._INTERPRET = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_fused_ffn_interpret_matches_reference(rng):
    """ops/ffn_pallas.py fused kernel vs the unfused op chain, interpreter
    mode, bf16, ragged row count."""
    import jax.numpy as jnp
    from hybrid_ctunet_tpu.ops import ffn_pallas

    c, h = 128, 512
    x = jnp.asarray(rng.standard_normal((3, 7, 11, c)), jnp.bfloat16)
    ln_w = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, h)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((h,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)

    ref = ffn_pallas.reference_ffn(x, ln_w, ln_b, w1, b1, w2, b2, jnp.bfloat16)
    out = ffn_pallas.fused_ffn(x, ln_w, ln_b, w1, b1, w2, b2, dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )

    # grad flows through the custom VJP (reference recompute)
    import jax
    g = jax.grad(
        lambda xx: jnp.sum(
            ffn_pallas.fused_ffn(xx, ln_w, ln_b, w1, b1, w2, b2, dtype=jnp.bfloat16, interpret=True).astype(jnp.float32) ** 2
        )
    )(x)
    gr = jax.grad(
        lambda xx: jnp.sum(
            ffn_pallas.reference_ffn(xx, ln_w, ln_b, w1, b1, w2, b2, jnp.bfloat16).astype(jnp.float32) ** 2
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g, np.float32), np.asarray(gr, np.float32), atol=2e-2, rtol=2e-2)


def test_fused_ffn_pair_interpret_matches_reference(rng):
    """ops/ffn_pallas.py pair kernel (x + FFN1, then + FFN2, one kernel) vs
    two sequential unfused residual FFNs; interpreter mode, bf16, ragged
    row count; grads through the pair's custom VJP."""
    import jax
    from hybrid_ctunet_tpu.ops import ffn_pallas

    c, h = 128, 512
    x = jnp.asarray(rng.standard_normal((3, 7, 11, c)), jnp.bfloat16)

    def ffn_params():
        return (
            jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32),
            jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((c, h)) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal((h,)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((h, c)) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
        )

    p1, p2 = ffn_params(), ffn_params()

    def ref(xx):
        y = xx + ffn_pallas.reference_ffn(xx, *p1, jnp.bfloat16)
        return y + ffn_pallas.reference_ffn(y, *p2, jnp.bfloat16)

    out = ffn_pallas.fused_ffn_pair(x, p1, p2, dtype=jnp.bfloat16, interpret=True)
    # two stacked bf16 FFNs: allow 2-ulp-at-magnitude compounding
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref(x), np.float32), atol=8e-2, rtol=2e-2
    )

    g = jax.grad(lambda xx: jnp.sum(
        ffn_pallas.fused_ffn_pair(xx, p1, p2, dtype=jnp.bfloat16, interpret=True).astype(jnp.float32) ** 2
    ))(x)
    gr = jax.grad(lambda xx: jnp.sum(ref(xx).astype(jnp.float32) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g, np.float32), np.asarray(gr, np.float32), atol=8e-2, rtol=2e-2
    )


def test_ffn_pair_model_param_tree_identical(rng, monkeypatch):
    """UpAttentionBlock with PALLAS_FFN_PAIR=1 must build the exact same
    parameter tree as the two-FeedForward branch (checkpoints
    interchangeable). The TPU-only gate is monkeypatched so the
    FeedForwardParams branch actually engages on the CPU test host; bf16 so
    ffn_pallas.supports() passes; eval_shape keeps it abstract (no kernel
    run)."""
    import jax
    from hybrid_ctunet_tpu import flags
    from hybrid_ctunet_tpu.models import decoder_attention
    from hybrid_ctunet_tpu.models.decoder_attention import UpAttentionBlock

    x = jnp.zeros((1, 6, 6, 12, 768), jnp.bfloat16)
    mod = UpAttentionBlock(in_channels=768, dtype=jnp.bfloat16)
    with flags.override(PALLAS_FFN_PAIR="0"):
        v0 = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), x))
    # force the platform gate open so the fused branch is the one traced
    monkeypatch.setattr(decoder_attention, "_pallas_ffn_enabled", lambda: True)
    with flags.override(PALLAS_FFN_PAIR="1"):
        v1 = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), x))
    # sanity: the two branches must not be the same code path — the fused one
    # names its params via FeedForwardParams, same tree by design
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, v0, v1)
    )


def test_fused_window_attention_interpret_matches_reference(rng):
    """ops/attention_pallas.py fused kernel vs the unfused einsum path,
    interpreter mode, bf16, ragged window count."""
    import jax
    import jax.numpy as jnp
    from hybrid_ctunet_tpu.ops import attention_pallas as ap

    n, t, heads, dh = 5, 27, 4, 16  # ragged: n%tb != 0
    c = heads * dh
    q = jnp.asarray(rng.standard_normal((n, t, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((n, t, c)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((n, t, c)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((heads, t, t)), jnp.float32)

    ref = ap.reference_window_attention(q, k, v, bias, jnp.bfloat16)
    out = ap.fused_window_attention(q, k, v, bias, dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )

    g = jax.grad(lambda qq: jnp.sum(
        ap.fused_window_attention(qq, k, v, bias, dtype=jnp.bfloat16, interpret=True).astype(jnp.float32) ** 2))(q)
    gr = jax.grad(lambda qq: jnp.sum(
        ap.reference_window_attention(qq, k, v, bias, jnp.bfloat16).astype(jnp.float32) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g, np.float32), np.asarray(gr, np.float32), atol=3e-2, rtol=3e-2)


def test_winograd_pallas_interpret_matches_direct_conv(rng):
    """ops/winograd_pallas.py F(2,3)^3 kernel vs lax direct conv, interpret
    mode, fp32 (transform entries are exact binary fractions). Smallest
    supported block: (1, 2, 32, 96, 32) -> ty=16, tz=48, M=768."""
    import jax
    from jax import lax
    from hybrid_ctunet_tpu.ops import winograd_pallas as wp

    x = jnp.asarray(rng.standard_normal((1, 2, 32, 96, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.1, jnp.float32)
    assert wp.supports(x.shape, w.shape, (1, 1, 1))

    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    ref = lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    got = wp.conv3x3_winograd(x, w, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)

    # grad: custom VJP recomputes through the direct conv -> near-exact match
    g = jax.grad(lambda ww: jnp.sum(
        wp.conv3x3_winograd(x, ww, out_dtype=jnp.float32, interpret=True) ** 2))(w)
    gr = jax.grad(lambda ww: jnp.sum(
        lax.conv_general_dilated(x, ww, (1, 1, 1), [(1, 1)] * 3,
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.float32) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-3, rtol=1e-3)


def test_winograd_supports_gating():
    """supports() rejects stride-2, non-3^3, odd dims, and blocks too small
    for the MXU M>=768 constraint (PERF.md round-1 probe)."""
    from hybrid_ctunet_tpu.ops import winograd_pallas as wp

    ok = ((1, 2, 32, 96, 32), (3, 3, 3, 32, 32))
    assert wp.supports(*ok, (1, 1, 1))
    assert not wp.supports(*ok, (2, 2, 2))
    assert not wp.supports((1, 2, 32, 96, 32), (1, 1, 1, 32, 32), (1, 1, 1))
    assert not wp.supports((1, 2, 32, 95, 32), (3, 3, 3, 32, 32), (1, 1, 1))
    assert not wp.supports((1, 2, 32, 96, 48), (3, 3, 3, 48, 48), (1, 1, 1))
    # 48^3 @ 128ch: M = 288 < 768 -> XLA already saturates full 128 lanes
    assert not wp.supports((1, 48, 48, 48, 128), (3, 3, 3, 128, 128), (1, 1, 1))


def test_winograd_fused_stats_and_affine(rng):
    """v2 fused chain: in-affine(+leaky) input epilogue and emitted IN
    partial sums match the direct-conv reference (interpret mode)."""
    import jax
    from hybrid_ctunet_tpu.ops import winograd_pallas as wp

    x = jnp.asarray(rng.standard_normal((2, 2, 32, 96, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.1, jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal((2, 32)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((2, 32)), jnp.float32)

    want_y, want_s1, want_s2 = wp._fused_ref(
        x, w, scale, bias, jnp.float32, True, True
    )
    got_y, got_s1, got_s2 = wp.conv3x3_winograd_fused(
        x, w, (scale, bias), in_act=True, emit_stats=True,
        out_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y), atol=2e-4, rtol=2e-4)
    n = x.shape[1] * x.shape[2] * x.shape[3]
    np.testing.assert_allclose(np.asarray(got_s1) / n, np.asarray(want_s1) / n, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_s2) / n, np.asarray(want_s2) / n, atol=2e-3)

    # grads flow through y AND the stats outputs via the direct-path VJP
    def loss(fn):
        def inner(xx, sc):
            y, s1, s2 = fn(xx, sc)
            return jnp.sum(y**2) + jnp.sum(s1 * s2) / n
        return inner

    g = jax.grad(loss(lambda xx, sc: wp.conv3x3_winograd_fused(
        xx, w, (sc, bias), in_act=True, emit_stats=True,
        out_dtype=jnp.float32, interpret=True)), argnums=(0, 1))(x, scale)
    gr = jax.grad(loss(lambda xx, sc: wp._fused_ref(
        xx, w, sc, bias, jnp.float32, True, True)), argnums=(0, 1))(x, scale)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_resblock_winograd_fused_chain_matches_default(rng):
    """ResBlock under WINOGRAD=2 (fused-IN chain) == default XLA path, both
    the full chain (conv1 supported) and the conv2-only variant."""
    import jax
    from hybrid_ctunet_tpu import flags
    from hybrid_ctunet_tpu.models.layers import ResBlock

    # full chain: 32->32 at a supported shape
    x = jnp.asarray(rng.standard_normal((1, 2, 32, 96, 32)), jnp.float32)
    block = ResBlock(features=32)
    params = block.init(jax.random.PRNGKey(0), x)
    base = block.apply(params, x)
    with flags.override(WINOGRAD="2", WINOGRAD_CH="32"):
        got = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=2e-4, rtol=2e-4)

    # conv2-only: conv1 is 16->32 (unsupported Cin) -> falls back, conv2 fused
    x2 = jnp.asarray(rng.standard_normal((1, 2, 32, 96, 16)), jnp.float32)
    block2 = ResBlock(features=32)
    params2 = block2.init(jax.random.PRNGKey(1), x2)
    base2 = block2.apply(params2, x2)
    with flags.override(WINOGRAD="2", WINOGRAD_CH="32"):
        got2 = block2.apply(params2, x2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(base2), atol=2e-4, rtol=2e-4)


def test_conv3d_same_winograd_gate(rng):
    """conv3d_same routes through the Winograd kernel under the flag and
    matches the default XLA path."""
    from hybrid_ctunet_tpu import flags
    from hybrid_ctunet_tpu.ops.conv import conv3d_same

    x = jnp.asarray(rng.standard_normal((1, 2, 32, 96, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.1, jnp.float32)
    base = conv3d_same(x, w, stride=(1, 1, 1), preferred_dtype=jnp.float32)
    with flags.override(WINOGRAD="1"):
        got = conv3d_same(x, w, stride=(1, 1, 1), preferred_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=2e-4, rtol=2e-4)


def test_fused_pixel_shuffle_interpret_matches_reference(rng):
    """ops/shuffle_pallas.py fused shuffle+Linear vs the unfused op chain
    (transpose-interleave then per-voxel Dense), interpreter mode, bf16 —
    both factor shapes the decoder pyramid uses, plus the zfold output view
    and the custom-VJP gradients."""
    from hybrid_ctunet_tpu.ops import shuffle_pallas as sp

    for factor, C, F in [((2, 2, 2), 128, 64), ((2, 2, 1), 512, 128)]:
        B, X, Y, Z = 1, 2, 4, 8
        cp = C // (factor[0] * factor[1] * factor[2])
        x = jnp.asarray(rng.standard_normal((B, X, Y, Z, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((cp, F)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((F,)) * 0.1, jnp.float32)
        assert sp.supports(x.shape, factor, F, jnp.bfloat16), (factor, C, F)

        ref = sp.reference_shuffle(x, w, b, factor, jnp.bfloat16)
        out = sp.fused_pixel_shuffle(x, w, b, factor, jnp.bfloat16, True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )

        # zfold view: element-identical to fold_z(reference) as a reshape
        outz = sp.fused_pixel_shuffle(x, w, b, factor, jnp.bfloat16, True, True)
        Bz, Xz, Yz, Zh, F2 = outz.shape
        np.testing.assert_array_equal(
            np.asarray(outz.reshape(Bz, Xz, Yz, Zh * 2, F2 // 2), np.float32),
            np.asarray(out, np.float32),
        )

        # grads flow through the custom VJP (reference recompute)
        import jax

        gx, gw, gb = jax.grad(
            lambda xx, ww, bb: jnp.sum(
                sp.fused_pixel_shuffle(xx, ww, bb, factor, jnp.bfloat16, True)
                .astype(jnp.float32) ** 2
            ),
            argnums=(0, 1, 2),
        )(x, w, b)
        rx_, rw_, rb_ = jax.grad(
            lambda xx, ww, bb: jnp.sum(
                sp.reference_shuffle(xx, ww, bb, factor, jnp.bfloat16)
                .astype(jnp.float32) ** 2
            ),
            argnums=(0, 1, 2),
        )(x, w, b)
        np.testing.assert_allclose(
            np.asarray(gx, np.float32), np.asarray(rx_, np.float32), atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw_), atol=1e-1, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb_), atol=1e-1, rtol=2e-2)


def test_pixel_shuffle_linear_pallas_gate(rng):
    """PixelShuffleLinear routes through the fused kernel under
    HYBRID_CTUNET_PALLAS_SHUFFLE=1 (interpret on CPU) and matches the
    default path with the same parameter tree."""
    from hybrid_ctunet_tpu import flags
    from hybrid_ctunet_tpu.models.layers import PixelShuffleLinear
    from hybrid_ctunet_tpu.ops import shuffle_pallas as sp

    x = jnp.asarray(rng.standard_normal((1, 2, 4, 8, 128)), jnp.bfloat16)
    mod = PixelShuffleLinear((2, 2, 2), 64, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)
    base = mod.apply(params, x)
    sp_impl = sp._impl

    def _interp(xx, ww, bb, factor, dtype, interpret, zfold=False):
        return sp_impl(xx, ww, bb, factor, dtype, True, zfold)

    sp._impl = _interp
    try:
        with flags.override(PALLAS_SHUFFLE="1"):
            got = mod.apply(params, x)
    finally:
        sp._impl = sp_impl
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(base, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("zfold", [False, True])
def test_fused_transp_conv_interpret_matches_reference(rng, zfold):
    """ops/shuffle_pallas.py fused_transp_conv (k==s transposed conv via the
    factor-dot kernel) vs the einsum+interleave reference, interpreter mode,
    both the standard and the fold_z output layouts."""
    import jax
    import jax.numpy as jnp
    from hybrid_ctunet_tpu.ops import shuffle_pallas as sp
    from hybrid_ctunet_tpu.ops.conv import fold_z

    B, X, Y, Z, C = 1, 2, 8, 8, 128
    F = 64
    w = jnp.asarray(rng.standard_normal((2, 2, 1, C, F)) * 0.05, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, X, Y, Z, C)), jnp.float32)

    want = sp.reference_transp_kxs(x, w, jnp.float32)
    if zfold:
        want = fold_z(want)
    got = sp.fused_transp_conv(x, w, jnp.float32, True, zfold)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )

    # VJP routes through the reference path
    def loss(xx, ww):
        out = sp.fused_transp_conv(xx, ww, jnp.float32, True, zfold)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)

    def loss_ref(xx, ww):
        out = sp.reference_transp_kxs(xx, ww, jnp.float32)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-3, rtol=1e-3)


def test_fused_transp_conv_f2_2_interpret(rng):
    """(2,2,2) stride site (CUNet/CTUNet fusion upsamples), f2=2 path."""
    import jax.numpy as jnp
    from hybrid_ctunet_tpu.ops import shuffle_pallas as sp

    B, X, Y, Z, C = 1, 2, 16, 64, 128
    F = 64
    w = jnp.asarray(rng.standard_normal((2, 2, 2, C, F)) * 0.05, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, X, Y, Z, C)), jnp.float32)
    want = sp.reference_transp_kxs(x, w, jnp.float32)
    got = sp.fused_transp_conv(x, w, jnp.float32, True, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_conv_transpose_same_transp_pallas_gate_matches(rng):
    """conv_transpose3d_same under TRANSP_PALLAS must stay numerically
    identical (on CPU the gate is TPU-only, so this pins the fallback; the
    real-chip A/B covers the kernel path)."""
    import jax.numpy as jnp
    from hybrid_ctunet_tpu import flags
    from hybrid_ctunet_tpu.ops.conv import conv_transpose3d_same

    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 2, 1, 128, 64)) * 0.05, jnp.float32)
    base = conv_transpose3d_same(x, w, (2, 2, 1), fold_out=True)
    with flags.override(TRANSP_PALLAS="fold"):
        got = conv_transpose3d_same(x, w, (2, 2, 1), fold_out=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5, rtol=1e-5)
