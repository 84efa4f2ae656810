"""Correctness tests for the experimental Pallas pool kernels
(mgtpu/ops/pallas_pool.py) in interpret mode — these pin the kernels
against the production XLA path (mgtpu/ops/resample.maxpool2_ceil) so
the measured-and-rejected record stays runnable. On-TPU timings that
motivated keeping XLA as the default are in the module docstring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mgtpu.ops.pallas_pool import maxpool2_pallas
from mgtpu.ops.resample import maxpool2_ceil


@pytest.mark.parametrize("shape", [(2, 8, 16, 5), (1, 4, 4, 3), (3, 16, 8, 7)])
def test_pallas_pool_forward_matches_xla(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = maxpool2_pallas(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(maxpool2_ceil(x)))


def test_pallas_pool_backward_matches_xla():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16, 5).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 4, 8, 5).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        dx = jax.vjp(maxpool2_pallas, x)[1](g)[0]
    dref = jax.vjp(maxpool2_ceil, x)[1](g)[0]
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dref), atol=1e-6)


def test_pallas_pool_backward_tie_semantics():
    """Documented divergence: on tied window maxima the Pallas backward
    duplicates the cotangent across ties (sum(dx) = k*g), while the XLA
    SelectAndScatter path routes it to a single winner. This pins the
    divergence so it stays a known property, not a surprise."""
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)  # all four elements tie
    g = jnp.ones((1, 1, 1, 1), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        dx = jax.vjp(maxpool2_pallas, x)[1](g)[0]
    assert float(jnp.sum(dx)) == 4.0  # every tie receives g
    dref = jax.vjp(maxpool2_ceil, x)[1](g)[0]
    assert float(jnp.sum(dref)) == 1.0  # XLA picks one winner
