"""Native data-plane (mgtpu/native/mgdata.cpp) parity tests: the C++
resampler/warp/assembler must match the PIL/numpy fallback paths in
mgtpu/data/transforms.py bit-for-bit (within float32 accumulation
noise). This pins the L0 native layer the same way the reference's
behaviour was pinned to the Torch `image` C package (SURVEY §2.9)."""

import numpy as np
import pytest
from PIL import Image

from mgtpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


@pytest.mark.parametrize("filt,pil", [
    ("bilinear", Image.BILINEAR),
    ("bicubic", Image.BICUBIC),
    ("nearest", Image.NEAREST),
])
@pytest.mark.parametrize("shape", [
    (32, 32, 3, 36, 36),   # cifar pad-up
    (64, 48, 3, 32, 24),   # downscale
    (256, 341, 3, 224, 224),  # ilsvrc-ish
    (17, 23, 1, 40, 31),   # odd sizes
])
def test_resize_matches_pil(rng, filt, pil, shape):
    h, w, c, oh, ow = shape
    img = rng.normal(size=(h, w, c)).astype(np.float32)
    mine = native.resize(img, oh, ow, filt)
    ref = np.stack(
        [
            np.asarray(
                Image.fromarray(img[:, :, ch], mode="F").resize((ow, oh), pil)
            )
            for ch in range(c)
        ],
        axis=-1,
    )
    np.testing.assert_allclose(mine, ref, atol=5e-6)


def test_warp_affine_matches_pil(rng):
    worst = 0.0
    for _ in range(25):
        h, w = (int(v) for v in rng.integers(16, 96, 2))
        img = rng.normal(size=(h, w, 2)).astype(np.float32)
        coeffs = tuple(np.array([1, 0, 0, 0, 1, 0], np.float64)
                       + rng.normal(0, 0.25, 6))
        mine = native.warp_affine(img, coeffs)
        ref = np.stack(
            [
                np.asarray(
                    Image.fromarray(img[:, :, ch], mode="F").transform(
                        (w, h), Image.AFFINE, coeffs, resample=Image.BILINEAR
                    )
                )
                for ch in range(2)
            ],
            axis=-1,
        )
        worst = max(worst, float(np.abs(mine - ref).max()))
    assert worst < 5e-6


def test_crop_flip_normalize(rng):
    img = rng.normal(size=(40, 44, 3)).astype(np.float32)
    mean = np.array([0.1, -0.2, 0.3], np.float32)
    std = np.array([0.9, 1.1, 1.3], np.float32)
    out = native.crop_flip_normalize(img, 5, 7, 32, False, mean, std)
    ref = (img[5:37, 7:39] - mean) / std
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    out_f = native.crop_flip_normalize(img, 5, 7, 32, True, mean, std)
    np.testing.assert_allclose(out_f, ref[:, ::-1], rtol=1e-6)


def test_crop_flip_normalize_into_batch_slot(rng):
    img = rng.normal(size=(36, 36, 3)).astype(np.float32)
    batch = np.zeros((2, 32, 32, 3), np.float32)
    native.crop_flip_normalize(
        img, 2, 2, 32, False, np.zeros(3, np.float32), np.ones(3, np.float32),
        out=batch[1],
    )
    np.testing.assert_allclose(batch[1], img[2:34, 2:34])
    assert batch[0].max() == 0


def test_whiten(rng):
    x = rng.normal(size=(37, 48)).astype(np.float32)
    mean = rng.normal(size=48).astype(np.float32)
    p = rng.normal(size=(48, 48)).astype(np.float32)
    out = native.whiten(x, mean, p)
    np.testing.assert_allclose(out, (x - mean) @ p, rtol=1e-4, atol=1e-4)


def test_transforms_use_native(rng):
    """The transforms module must route through the native lib when it
    is available (this test env builds it)."""
    from mgtpu.data import transforms as T

    assert T._HAVE_NATIVE
    img = rng.normal(size=(32, 32, 3)).astype(np.float32)
    out = T.scale(36)(img, rng)
    assert out.shape == (36, 36, 3)
    rot = T.rotation_exact(0.5)(img, rng)
    assert rot.shape == img.shape


def test_crop_flip_normalize_bounds_checked(rng):
    img = rng.normal(size=(30, 30, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        native.crop_flip_normalize(img, 0, 0, 32, False,
                                   np.zeros(3, np.float32), np.ones(3, np.float32))
    with pytest.raises(ValueError):
        native.crop_flip_normalize(img, 5, 5, 28, False,
                                   np.zeros(3, np.float32), np.ones(3, np.float32))
