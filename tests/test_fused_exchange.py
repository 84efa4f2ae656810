"""The fused-exchange (split-weight) path must match the reference
formulation (materialized resample-concat) numerically."""

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


def test_mg_residual_fused_matches_unfused():
    pyr = _pyr(2, [(16, 16), (8, 8)], [8, 6])
    kw = dict(in_widths=[8, 6], out_widths_=[16, 12])
    _compare(
        MgResidual(**kw, fuse_exchange=True),
        MgResidual(**kw, fuse_exchange=False),
        pyr,
        True,
    )
