"""Interpret-mode correctness for the fused Pallas conv experiments
(mgtpu/ops/pallas_conv.py) against the XLA formulation — same pattern
as tests/test_pallas_pool.py: numerics pinned on CPU, performance
measured on real TPU by the module's bench_shapes()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgtpu.ops.pallas_conv import (
    conv3x3,
    conv3x3_bn_relu_in,
    xla_conv3x3,
    xla_conv3x3_bn_relu_in,
)


def _data(n=2, h=8, w=16, ci=8, co=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.float32)
    wt = jnp.asarray(0.1 * rng.standard_normal((3, 3, ci, co)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    return x, wt, b


@pytest.mark.parametrize("variant", ["rows", "slab"])
@pytest.mark.parametrize("relu_out", [False, True])
def test_conv3x3_matches_xla(variant, relu_out):
    x, wt, b = _data()
    y_ref, st_ref = jax.jit(
        lambda a: xla_conv3x3(a, wt, b, relu_out=relu_out)
    )(x)
    y, st = conv3x3(x, wt, b, variant=variant, relu_out=relu_out,
                    th=8, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_ref),
                               rtol=1e-4, atol=1e-3)


def test_conv3x3_without_stats():
    x, wt, b = _data()
    y, st = conv3x3(x, wt, b, variant="rows", with_stats=False,
                    interpret=True)
    y_ref, _ = xla_conv3x3(x, wt, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    assert not np.asarray(st).any()


def test_conv3x3_bn_relu_prologue_matches_xla():
    x, wt, b = _data(ci=8, co=16)
    rng = np.random.default_rng(3)
    sc = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    y_ref, st_ref = jax.jit(
        lambda a: xla_conv3x3_bn_relu_in(a, wt, b, sc, sh)
    )(x)
    y, st = conv3x3_bn_relu_in(x, wt, b, sc, sh, th=8, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_ref),
                               rtol=1e-4, atol=1e-3)
