"""Host-side compute-dtype casting of input batches (`-hostCast`).

Under `-dtype bfloat16` the batch's input leaves are cast to bf16 on
the host before device transfer (`standard.host_cast_inputs`), halving
H2D bytes. The first conv casts its input to the compute dtype anyway
(`mgtpu/nn.py:Conv.apply`), so for conv-first models the device values
are bit-identical; models whose stem pools the raw image (MgConvInput)
now pool in bf16 — allclose, not bit-equal. Labels always stay f32."""

import jax
import jax.numpy as jnp
import numpy as np

from mgtpu.pipelines.standard import host_cast_inputs


def test_cast_x_only_and_values():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    y = rng.normal(size=(4, 8, 8, 1)).astype(np.float32)
    out = host_cast_inputs({"x": x, "y": y}, jnp.bfloat16)
    assert out["x"].dtype == np.dtype(jnp.bfloat16)
    assert out["y"].dtype == np.float32  # labels untouched
    np.testing.assert_array_equal(
        np.asarray(out["x"], np.float32), x.astype(jnp.bfloat16).astype(np.float32)
    )


def test_non_float32_and_none_dtype_passthrough():
    x = np.arange(6, dtype=np.int32)
    batch = {"x": x, "y": x}
    assert host_cast_inputs(batch, None) is batch
    out = host_cast_inputs(batch, jnp.bfloat16)
    assert out["x"].dtype == np.int32  # integer inputs untouched


def test_conv_first_model_bit_identical():
    from mgtpu.nn import Conv

    conv = Conv(3, 8, 3, dtype=jnp.bfloat16)
    p, _ = conv.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(1).normal(size=(2, 16, 16, 3)).astype(np.float32)
    xh = host_cast_inputs({"x": x, "y": x}, jnp.bfloat16)["x"]

    @jax.jit
    def fwd(xx):
        y, _ = conv.apply(p, {}, xx)
        return y

    np.testing.assert_array_equal(np.asarray(fwd(x)), np.asarray(fwd(xh)))


def test_pooled_stem_allclose():
    from mgtpu.ops.mg import MgConvInput

    stem = MgConvInput([8, 8], c_in=3, dtype=jnp.bfloat16)
    p, s = stem.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(2).normal(size=(2, 16, 16, 3)).astype(np.float32)
    xh = host_cast_inputs({"x": x, "y": x}, jnp.bfloat16)["x"]

    @jax.jit
    def fwd(xx):
        ys, _ = stem.apply(p, s, xx)
        return ys

    for a, b in zip(fwd(x), fwd(xh)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.05, atol=0.05,
        )
