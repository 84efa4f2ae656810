"""Property-based tests: the resample primitives must match naive
loop-reference implementations on arbitrary (small) shapes, including
the odd ceil-mode sizes the CIFAR/MNIST/ImageNet pyramids never hit but
user configs can."""

import numpy as np
from hypothesis import given, settings, strategies as st

from mgtpu.ops.resample import (
    _ceil_pad,
    avgpool,
    maxpool,
    maxpool2_ceil,
    upsample_nearest2,
)

dims = st.integers(min_value=1, max_value=13)
chans = st.integers(min_value=1, max_value=5)


def _naive_maxpool(x, k, s, pad):
    n, h, w, c = x.shape
    xp = np.full((n, h + 2 * pad, w + 2 * pad, c), -np.inf, np.float32)
    xp[:, pad : pad + h, pad : pad + w] = x
    oh = (h + 2 * pad - k) // s + 1
    ow = (w + 2 * pad - k) // s + 1
    out = np.empty((n, oh, ow, c), np.float32)
    for i in range(oh):
        for j in range(ow):
            out[:, i, j] = xp[:, i * s : i * s + k, j * s : j * s + k].max(axis=(1, 2))
    return out


@settings(max_examples=40, deadline=None)
@given(h=dims, w=dims, c=chans, seed=st.integers(0, 10_000))
def test_maxpool2_ceil_matches_naive(h, w, c, seed):
    """ceil semantics: output ceil(h/2) x ceil(w/2); -inf right/bottom
    pad (Torch `SpatialMaxPooling(2,2,2,2):ceil()`)."""
    x = np.random.RandomState(seed).randn(2, h, w, c).astype(np.float32)
    got = np.asarray(maxpool2_ceil(x))
    ph, pw = _ceil_pad(h, 2, 2), _ceil_pad(w, 2, 2)
    xp = np.full((2, h + ph, w + pw, c), -np.inf, np.float32)
    xp[:, :h, :w] = x
    ref = _naive_maxpool(xp, 2, 2, 0)
    assert got.shape == (2, -(-h // 2), -(-w // 2), c)
    np.testing.assert_array_equal(got, ref)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(3, 12), w=st.integers(3, 12), c=chans,
       seed=st.integers(0, 10_000))
def test_maxpool_3x3_stride2_matches_naive(h, w, c, seed):
    x = np.random.RandomState(seed).randn(1, h, w, c).astype(np.float32)
    got = np.asarray(maxpool(x, 3, 2, 1))
    ref = _naive_maxpool(x, 3, 2, 1)
    np.testing.assert_array_equal(got, ref)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(2, 12).filter(lambda v: v % 2 == 0),
       w=st.integers(2, 12).filter(lambda v: v % 2 == 0),
       c=chans, seed=st.integers(0, 10_000))
def test_avgpool2_matches_naive(h, w, c, seed):
    x = np.random.RandomState(seed).randn(2, h, w, c).astype(np.float32)
    got = np.asarray(avgpool(x, 2))
    ref = x.reshape(2, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, c=chans,
       crop_h=st.integers(0, 1), crop_w=st.integers(0, 1),
       seed=st.integers(0, 10_000))
def test_upsample_nearest2_matches_naive(h, w, c, crop_h, crop_w, seed):
    """up2 then optional bottom/right crop (odd ceil-pool partners)."""
    x = np.random.RandomState(seed).randn(1, h, w, c).astype(np.float32)
    oh, ow = 2 * h - crop_h, 2 * w - crop_w
    got = np.asarray(upsample_nearest2(x, oh, ow))
    ref = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)[:, :oh, :ow]
    np.testing.assert_array_equal(got, ref)


@settings(max_examples=50, deadline=None)
@given(size=st.integers(1, 64))
def test_ceil_pad_reproduces_torch_output_size(size):
    """output = ceil((size - k)/s) + 1 for k=s=2 with the pad applied."""
    pad = _ceil_pad(size, 2, 2)
    out = (size + pad - 2) // 2 + 1
    assert out == -(-size // 2)
    assert 0 <= pad < 2
