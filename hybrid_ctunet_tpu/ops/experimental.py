"""Default-OFF structural conv rewrites, quarantined out of the hot path.

Every function here is a measured END-TO-END LOSS on the v5e flagship
configs (PERF.md "Hard-won rules": standalone wins reversed in-model by
XLA's conv+IN+LeakyReLU epilogue fusion) but is kept — env-gated, with
equivalence tests in tests/test_conv.py / tests/test_pallas_ops.py — as
honest negative results and for configs where the trade-offs differ
(e.g. Winograd v2 WINS 1.18x at C=32 / pf16-width models).

``maybe_conv3d`` is the single dispatch hook ``ops/conv.py::conv3d_same``
calls when any of the gating flags is set; it returns ``None`` when no
rewrite claims the shape, keeping the production conv path two-branched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .. import flags


def maybe_conv3d(x, w, s, k, preferred_dtype):
    """Experimental-rewrite dispatch for ``conv3d_same`` (original gate
    order preserved: CIN1_S2D -> ZPAIR -> WINOGRAD=1). Returns None when no
    rewrite engages."""
    if (
        flags.CIN1_S2D == "1"
        and w.shape[3] == 1
        and k == (3, 3, 3)
        and s == (1, 1, 1)
        and x.shape[3] % 2 == 0
    ):
        # Cin=1 3x3x3 stride-1 (the conv-stem first conv): no lane dimension
        # -> ~1.3 TF/s measured. Tap-exact 2x space-to-depth along z: the conv
        # becomes (3,3,2) over Cin=2 (z-parities) producing both output
        # parities as channel blocks — 1.33x the FLOPs at full MXU lanes.
        # Standalone 18.8 -> 15.1 ms, but -0.2 vol/min in-model (fusion break).
        return _cin1_s2dz_conv(x, w, preferred_dtype)
    if (
        flags.ZPAIR == "1"
        and k == (3, 3, 3)
        and s == (1, 1, 1)
        and 32 <= w.shape[3]
        and w.shape[4] <= flags.ZPAIR_MAX_COUT
        and x.shape[3] % 2 == 0
    ):
        # paired-output conv: compute two z-adjacent outputs per position via
        # a (3,3,4) kernel with doubled Cout blocks — N 64 -> 128 on the MXU
        # at 1.33x the taps (tap-exact). 50 -> 56 TF/s at 64ch, 9.5 -> 12.2
        # at 32ch, measured standalone; in-model LOSS (superseded by ALTFOLD).
        return _zpair_conv(x, w, preferred_dtype)
    if flags.WINOGRAD == "1" and w.shape[3] >= 2:
        from . import winograd_pallas

        if winograd_pallas.supports(x.shape, w.shape, s):
            return winograd_pallas.conv3x3_winograd(
                x, w, out_dtype=preferred_dtype,
                interpret=jax.default_backend() != "tpu",
            )
    return None


def _dn(x_shape, w_shape):
    return lax.conv_dimension_numbers(x_shape, w_shape, ("NDHWC", "DHWIO", "NDHWC"))


def _zpair_conv(x, w, preferred_dtype):
    """Stride-1 SAME 3^3 conv computing z-output pairs: kernel (3,3,4) with
    Cout blocks [taps 0..2 | taps 1..3], z-stride 2, un-paired by reshape.
    Taps duplicated, never approximated."""
    B, X, Y, Z, C = x.shape
    cout = w.shape[4]
    wk = jnp.zeros((3, 3, 4, C, 2 * cout), w.dtype)
    wk = wk.at[:, :, 0:3, :, 0:cout].set(w)
    wk = wk.at[:, :, 1:4, :, cout:].set(w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = lax.conv_general_dilated(
        xp, wk, (1, 1, 2), "VALID", dimension_numbers=_dn(xp.shape, wk.shape),
        preferred_element_type=preferred_dtype,
    )  # (B, X, Y, Z/2, 2*cout)
    return out.reshape(B, X, Y, Z // 2, 2, cout).reshape(B, X, Y, Z, cout)


def _cin1_s2dz_conv(x, w, preferred_dtype):
    """conv(x, w, stride=1, SAME) with Cin=1, k=3^3, via 2x space-to-depth on
    the z axis. For out z = 2q+r (xp = x padded by 1):
      r=0: w_z0*xe[q] + w_z1*xo[q] + w_z2*xe[q+1]
      r=1: w_z0*xo[q] + w_z1*xe[q+1] + w_z2*xo[q+1]
    with xe/xo the even/odd z-planes of xp — a (3,3,2)-kernel Cin=2 conv
    producing both parity classes as Cout blocks. Taps rearranged exactly."""
    B, X, Y, Z, _ = x.shape
    cout = w.shape[4]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))  # z length Z+2
    # z-parity split is a free reshape: z = 2m + p with the pair adjacent
    xs = xp.reshape(B, X + 2, Y + 2, (Z + 2) // 2, 2)  # Cin=2 (xe, xo)
    wk = jnp.zeros((3, 3, 2, 2, 2 * cout), w.dtype)
    w_z = [w[:, :, t, 0, :] for t in range(3)]  # (3,3,cout) each
    # (zin parity p, tap offset u) -> which original z-tap feeds class r
    wk = wk.at[:, :, 0, 0, 0:cout].set(w_z[0])       # r=0: xe[q]   <- w_z0
    wk = wk.at[:, :, 0, 1, 0:cout].set(w_z[1])       # r=0: xo[q]   <- w_z1
    wk = wk.at[:, :, 1, 0, 0:cout].set(w_z[2])       # r=0: xe[q+1] <- w_z2
    wk = wk.at[:, :, 0, 1, cout:].set(w_z[0])        # r=1: xo[q]   <- w_z0
    wk = wk.at[:, :, 1, 0, cout:].set(w_z[1])        # r=1: xe[q+1] <- w_z1
    wk = wk.at[:, :, 1, 1, cout:].set(w_z[2])        # r=1: xo[q+1] <- w_z2
    out = lax.conv_general_dilated(
        xs, wk, (1, 1, 1), "VALID", dimension_numbers=_dn(xs.shape, wk.shape),
        preferred_element_type=preferred_dtype,
    )  # (B, X, Y, Z/2, 2*cout)
    out = out.reshape(B, X, Y, Z // 2, 2, cout)
    return out.reshape(B, X, Y, Z, cout)
