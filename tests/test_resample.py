import jax
import numpy as np
import jax.numpy as jnp

from mgtpu.ops.resample import (
    avgpool,
    maxpool,
    maxpool2_ceil,
    upsample_nearest2,
    global_avgpool,
)


def test_maxpool2_ceil_even():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = maxpool2_ceil(x)
    assert y.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], [[5, 7], [13, 15]])


def test_maxpool2_ceil_odd():
    # Torch Max(2,2,2,2):ceil() on size 5 -> ceil((5-2)/2)+1 = 3
    x = jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5, 1)
    y = maxpool2_ceil(x)
    assert y.shape == (1, 3, 3, 1)
    np.testing.assert_allclose(
        np.asarray(y)[0, :, :, 0], [[6, 8, 9], [16, 18, 19], [21, 23, 24]]
    )


def test_maxpool_3x3_s2_p1():
    # ImageNet stem pool: 112 -> 56 (models/ilsvrc/rnmg.lua:183)
    x = jnp.zeros((1, 112, 112, 4))
    assert maxpool(x, 3, 2, 1).shape == (1, 56, 56, 4)


def test_avgpool_exact():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = avgpool(x, 2)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]])


def test_avgpool_pyramid_chain():
    x = jnp.zeros((2, 32, 32, 3))
    assert avgpool(x, 2).shape == (2, 16, 16, 3)
    assert avgpool(x, 4).shape == (2, 8, 8, 3)


def test_upsample_nearest2():
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y = upsample_nearest2(x)
    np.testing.assert_allclose(
        np.asarray(y)[0, :, :, 0],
        [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]],
    )


def test_upsample_crop_to_odd_partner():
    x = jnp.ones((1, 3, 3, 2))
    y = upsample_nearest2(x, 5, 5)
    assert y.shape == (1, 5, 5, 2)


def test_global_avgpool():
    x = jnp.ones((2, 7, 7, 5))
    assert global_avgpool(x).shape == (2, 5)


def test_maxpool2_vjp_routes_gradient_to_argmax():
    """reduce_window maxpool backward (SelectAndScatter) sends the
    cotangent to the window argmax and zero elsewhere."""
    rng = np.random.RandomState(11)
    for shape in [(2, 8, 8, 3), (2, 7, 9, 3)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        y, vjp = jax.vjp(maxpool2_ceil, x)
        g = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
        dx = np.asarray(vjp(g)[0])
        # total gradient mass is conserved
        np.testing.assert_allclose(dx.sum(), np.asarray(g).sum(), rtol=1e-5)
        # nonzero entries only where x attains the pooled max
        yu = np.repeat(np.repeat(np.asarray(y), 2, 1), 2, 2)[:, :shape[1], :shape[2]]
        assert np.all((dx != 0) <= (np.asarray(x) == yu))
