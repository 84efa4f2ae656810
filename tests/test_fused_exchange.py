"""The fused-exchange (split-weight) path must match the reference
formulation (materialized resample-concat) numerically.

Scope: equivalence holds with dropout off (or in eval mode). With
train-mode dropout the two paths consume the PRNG differently (one
mask per part vs one mask over the concat) — distributionally
identical, trajectories stochastically different; see
ConvBN.apply_parts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mgtpu.ops.mg import MgConv, MgResidual


def _pyr(b, hws, cs, key=0):
    rng = np.random.RandomState(key)
    return tuple(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        for (h, w), c in zip(hws, cs)
    )


def _compare(block_f, block_u, pyr, train):
    p, s = jax.jit(block_f.init)(jax.random.PRNGKey(0))
    f = jax.jit(lambda p, s, x: block_f.apply(p, s, x, train=train))
    u = jax.jit(lambda p, s, x: block_u.apply(p, s, x, train=train))
    of, sf = f(p, s, pyr)
    ou, su = u(p, s, pyr)
    for a, b in zip(of, ou):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(sf), jax.tree.leaves(su)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_mg_conv_fused_matches_unfused():
    pyr = _pyr(2, [(16, 16), (8, 8), (4, 4)], [12, 10, 6])
    kw = dict(in_widths=[12, 10, 6], out_widths_=[16, 8, 8], kernels=[3, 3, 1])
    _compare(MgConv(**kw, fuse_exchange=True), MgConv(**kw, fuse_exchange=False), pyr, False)
    _compare(MgConv(**kw, fuse_exchange=True), MgConv(**kw, fuse_exchange=False), pyr, True)


def test_conv_up3_folding_exact():
    """conv3x3(nearest_up2(x)) == stride-2 dilated conv with the 4x4
    summed kernel (mgtpu.nn._conv_up3), including odd-size crops."""
    from mgtpu.nn import _conv_up3
    from mgtpu.ops.resample import upsample_nearest2

    rng = np.random.RandomState(7)
    for h, w in [(8, 8), (7, 5), (4, 6)]:
        oh, ow = 2 * h, 2 * w
        x = jnp.asarray(rng.randn(2, h, w, 5).astype(np.float32))
        ws = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            upsample_nearest2(x, oh, ow), ws, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = _conv_up3(x, ws, oh, ow)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_mg_conv_fused_odd_sizes():
    """Odd ceil-pooled pyramids exercise the materialized-upsample
    fallback (the dilated-conv folding requires exact 2x)."""
    pyr = _pyr(2, [(15, 15), (8, 8), (4, 4)], [6, 5, 4])
    kw = dict(in_widths=[6, 5, 4], out_widths_=[8, 8, 8], kernels=[3, 3, 1])
    _compare(MgConv(**kw, fuse_exchange=True), MgConv(**kw, fuse_exchange=False), pyr, False)


def test_conv_up3_gradients_match():
    from mgtpu.nn import _conv_up3
    from mgtpu.ops.resample import upsample_nearest2

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 5, 3).astype(np.float32))
    ws = jnp.asarray(rng.randn(3, 3, 3, 2).astype(np.float32))

    def loss_ref(x, ws):
        y = jax.lax.conv_general_dilated(
            upsample_nearest2(x, 10, 10), ws, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y * y)

    def loss_new(x, ws):
        y = _conv_up3(x, ws, 10, 10)
        return jnp.sum(y * y)

    gx1, gw1 = jax.grad(loss_ref, (0, 1))(x, ws)
    gx2, gw2 = jax.grad(loss_new, (0, 1))(x, ws)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-3, atol=1e-4)


def test_mg_residual_fused_matches_unfused():
    pyr = _pyr(2, [(16, 16), (8, 8)], [8, 6])
    kw = dict(in_widths=[8, 6], out_widths_=[16, 12])
    _compare(
        MgResidual(**kw, fuse_exchange=True),
        MgResidual(**kw, fuse_exchange=False),
        pyr,
        True,
    )
