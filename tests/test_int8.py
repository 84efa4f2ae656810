"""int8 PTQ serving path (`mgtpu/ops/quant.py`, `-int8`).

The reference has no quantized path (Torch7/CUDA fp32 throughout) —
this is a TPU-native serving addition, so the tests pin our own
contract: quantization error bounds, the split-kernel identity the
fused-exchange path relies on, pytree hygiene (sharding/checkpointing
see only ordinary leaves), and the end-to-end CLI accuracy of a
quantized model vs its float parent.
"""

import glob
import os
import re
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from mgtpu import nn
from mgtpu.ops.quant import (
    conv_i8,
    is_quantized,
    quantize_act,
    quantize_kernel,
    quantize_params,
)


def test_quantize_kernel_bounds():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 16, 24)) * 0.1
    q = quantize_kernel(w)
    assert q["w8"].dtype == jnp.int8 and q["scale"].shape == (24,)
    deq = q["w8"].astype(jnp.float32) * q["scale"]
    # symmetric round-to-nearest: per-element error <= scale/2
    err = jnp.abs(deq - w)
    assert jnp.all(err <= q["scale"] / 2 + 1e-7)
    # zero kernel must not divide by zero
    q0 = quantize_kernel(jnp.zeros((3, 3, 4, 4)))
    assert jnp.all(q0["w8"] == 0) and jnp.all(jnp.isfinite(q0["scale"]))


def test_quantized_conv_matches_float():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 8, 8, 16))
    w = jax.random.normal(kw, (3, 3, 16, 24)) * 0.1
    conv = nn.Conv(16, 24, 3, 1)
    ref, _ = conv.apply({"w": w, "b": jnp.zeros(24)}, {}, x)
    q = quantize_kernel(w)
    got, _ = conv.apply({"w": q, "b": jnp.zeros(24)}, {}, x)
    assert is_quantized(q)
    # w8*x8 with 8-bit operands: relative error ~1% is the scheme's
    # design point (127 levels each side)
    rel = jnp.abs(got - ref) / (jnp.max(jnp.abs(ref)) + 1e-6)
    assert float(jnp.max(rel)) < 0.03, float(jnp.max(rel))


def test_split_kernel_identity_int8():
    """conv(concat(xs), W) == sum_i conv(x_i, W_i) must hold EXACTLY
    for the int32 accumulators — apply_parts slices the quantized
    kernel on input channels (nn.py ConvBN.apply_parts)."""
    kx, ky, kw = jax.random.split(jax.random.PRNGKey(2), 3)
    xa = (jax.random.normal(kx, (2, 8, 8, 8)) * 10).astype(jnp.int8)
    xb = (jax.random.normal(ky, (2, 8, 8, 8)) * 10).astype(jnp.int8)
    w8 = (jax.random.normal(kw, (3, 3, 16, 8)) * 10).astype(jnp.int8)
    full = conv_i8(jnp.concatenate([xa, xb], -1), w8, 1, 1)
    split = conv_i8(xa, w8[:, :, :8], 1, 1) + conv_i8(xb, w8[:, :, 8:], 1, 1)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))


def test_quantize_act_dynamic():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 4, 4)) * 7.0
    x8, sx = quantize_act(x)
    assert x8.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(x8, np.float32) * float(sx), np.asarray(x),
        atol=float(sx) / 2 + 1e-6,
    )


def test_quantize_params_selectivity():
    params = {
        "0": {"conv": {"w": jnp.ones((3, 3, 4, 8)), "b": jnp.zeros(8)}},
        "1": {"w": jnp.ones((2, 2, 8, 4))},   # ConvTranspose upsampler
        "2": {"w": jnp.ones((16, 10)), "b": jnp.zeros(10)},  # Linear
    }
    q = quantize_params(params)
    assert is_quantized(q["0"]["conv"]["w"])
    assert not is_quantized(q["1"]["w"]) and q["1"]["w"].shape == (2, 2, 8, 4)
    assert not is_quantized(q["2"]["w"])
    # still an ordinary pytree: same treedef class, jax.tree works
    leaves = jax.tree.leaves(q)
    assert all(hasattr(l, "dtype") for l in leaves)


def test_convbn_apply_parts_quantized():
    """The fused-exchange path under int8: up-part materialized first,
    result close to the float path."""
    m = nn.ConvBN(24, 16, 3, 1)
    p, s = m.init(jax.random.PRNGKey(4))
    kx, ky = jax.random.split(jax.random.PRNGKey(5))
    same = jax.random.normal(kx, (2, 8, 8, 16))
    up = jax.random.normal(ky, (2, 4, 4, 8))
    parts = [("same", same), ("up", up)]
    ref, _ = m.apply_parts(p, s, parts)
    pq = quantize_params(p)
    got, _ = m.apply_parts(pq, s, parts)
    rel = jnp.abs(got - ref) / (jnp.max(jnp.abs(ref)) + 1e-6)
    assert float(jnp.max(rel)) < 0.08, float(jnp.max(rel))


def test_calibrate_freezes_static_scales():
    """calibrate(): every quantized kernel dict gains an "sx" whose
    value is the MAX dynamic absmax scale over the calibration batches,
    and the jitted static forward matches the dynamic one on data
    within the calibrated range."""
    from mgtpu.ops.quant import calibrate

    seq = nn.Sequential([nn.Conv(4, 8, 3, 1), nn.ConvBN(8, 8, 3, 1)])
    p, s = seq.init(jax.random.PRNGKey(6))
    q = quantize_params(p)
    rng = np.random.default_rng(0)
    b_small = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    b_big = (3.0 * rng.normal(size=(2, 8, 8, 4))).astype(np.float32)
    q = calibrate(seq, q, s, [b_small, b_big])

    w0 = q["0"]["w"]
    assert "sx" in w0 and w0["sx"].shape == (1,)
    # the frozen scale is the larger batch's absmax / 127
    assert abs(float(w0["sx"][0]) - float(np.abs(b_big).max()) / 127.0) < 1e-6
    assert "sx" in q["1"]["conv"]["w"]

    # static path under jit: with inputs inside the calibrated range the
    # first conv quantizes IDENTICALLY to the dynamic path iff the
    # dynamic absmax equals the frozen one — so feed b_big itself
    fwd = jax.jit(lambda pp, xx: seq.apply(pp, s, xx, train=False)[0])
    got = fwd(q, jnp.asarray(b_big))
    assert np.all(np.isfinite(np.asarray(got)))
    # and a dynamic-quantized run of the same input agrees closely
    q_dyn = quantize_params(p)
    ref = fwd(q_dyn, jnp.asarray(b_big))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0.05, atol=0.05
    )


def test_calibrate_apply_parts_slots():
    """apply_parts records one scale PER EXCHANGE PART (slot order =
    part order); the static path then reproduces the dynamic result
    bit-exactly when the frozen scales equal the dynamic absmaxes."""
    from mgtpu.ops.quant import calibrate

    class PartsModel:
        def __init__(self, m):
            self.m = m

        def apply(self, p, s, x, *, train=False, rng=None):
            parts = [("same", x), ("up", x[:, ::2, ::2, : x.shape[-1] // 2])]
            return self.m.apply_parts(p, s, parts, train=train, rng=rng)

    m = nn.ConvBN(24, 16, 3, 1)
    p, s = m.init(jax.random.PRNGKey(7))
    x = np.random.default_rng(1).normal(size=(2, 8, 8, 16)).astype(np.float32)
    q = quantize_params(p)
    ref, _ = PartsModel(m).apply(q, s, jnp.asarray(x))  # dynamic
    q = calibrate(PartsModel(m), q, s, [x])
    assert q["conv"]["w"]["sx"].shape == (2,)  # same + up slots
    got, _ = PartsModel(m).apply(q, s, jnp.asarray(x))  # static
    # same input as calibration -> identical scales -> identical ints
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_up_part_quantize_coarse_then_upsample_exact():
    """Nearest-upsample only duplicates values, so quantizing at coarse
    resolution then upsampling the int8 equals upsampling then
    quantizing with the same scale — the identity the int8 up-part
    relies on (nn.py apply_parts), including the odd-size ceil crop."""
    from mgtpu.ops.resample import upsample_nearest2

    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 5, 7, 3)) * 4,
                    jnp.float32)
    _, sx = quantize_act(x)
    q_coarse, _ = quantize_act(x, sx)
    a = upsample_nearest2(q_coarse, 9, 13)  # odd targets crop the dup
    q_fine, _ = quantize_act(upsample_nearest2(x, 9, 13), sx)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(q_fine))


def _main(*args, expect_ok=True, timeout=560):
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    r = subprocess.run(
        [sys.executable, "-m", "mgtpu.main", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    if expect_ok:
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    return r


def test_int8_rejects_train(tmp_path):
    r = _main(
        "-netType", "cifar/nmg", "-dataset", "cifar100-whitened",
        "-data", "synthetic", "-synthSize", "32", "-batchSize", "8",
        "-imageSize", "36", "-imageCrop", "32",
        "-nGPU", "1", "-nDonkeys", "0", "-cache", str(tmp_path),
        "-nEpochs", "1", "-epochSize", "1", "-train", "-int8",
        expect_ok=False,
    )
    assert r.returncode != 0
    assert "inference-only" in (r.stdout + r.stderr)


@pytest.mark.slow
def test_int8_cli_accuracy(tmp_path):
    """Train a small float model, then re-test its checkpoint under
    -int8: top-1 must stay within a few points of the float number."""
    common = [
        "-netType", "cifar/nmg", "-dataset", "cifar100-whitened",
        "-data", "synthetic", "-synthSize", "64", "-batchSize", "16",
        "-imageSize", "36", "-imageCrop", "32",
        "-nGPU", "1", "-nDonkeys", "0", "-cache", str(tmp_path),
    ]
    out = _main(*common, "-nEpochs", "2", "-epochSize", "4",
                "-train", "-test").stdout
    ckpts = glob.glob(str(tmp_path / "**" / "model_2.ckpt"), recursive=True)
    assert len(ckpts) == 1
    m = re.findall(r"avg\.loss:([0-9.]+)", out)
    assert m, out[-800:]
    fp_loss = float(m[-1])

    out8 = _main(*common, "-nEpochs", "1", "-retrain", ckpts[0],
                 "-test", "-int8").stdout
    assert "int8: conv kernels quantized" in out8
    m8 = re.search(r"avg\.loss:([0-9.]+)", out8)
    assert m8, out8[-800:]
    # PTQ on a barely-trained model: loss within 5% of float
    np.testing.assert_allclose(float(m8.group(1)), fp_loss, rtol=0.05)

    # calibrated static scales (-int8Calib): same accuracy contract
    outc = _main(*common, "-nEpochs", "1", "-retrain", ckpts[0],
                 "-test", "-int8", "-int8Calib", "2").stdout
    assert "calibrated over 2 batches" in outc
    mc = re.search(r"avg\.loss:([0-9.]+)", outc)
    assert mc, outc[-800:]
    np.testing.assert_allclose(float(mc.group(1)), fp_loss, rtol=0.05)


@pytest.mark.slow  # two jax.export compiles
def test_int8_export_artifact(tmp_path):
    """-int8 export: artifact shrinks (int8 conv constants) and the
    deserialized forward stays close to the float model."""
    import types

    from jax import export as jexport

    from mgtpu.models import get_net

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    arts = {}
    for tag, extra in [("fp", []), ("i8", ["-int8"])]:
        art = tmp_path / f"mg6_{tag}.shlo"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
             "-netType", "cifar/nmg", "-nLayer", "1", "-batch", "2",
             "-imageCrop", "32", "-dtype", "float32",
             "-platforms", "cpu", "-out", str(art), *extra],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        arts[tag] = art
    # conv kernels dominate the constants: int8 must shrink the blob
    assert arts["i8"].stat().st_size < 0.45 * arts["fp"].stat().st_size

    with open(arts["i8"], "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(exp.call(jnp.asarray(x)))
    net = get_net("cifar/nmg")
    model = net.create_model(types.SimpleNamespace(nLayer=1, nEpochs=200,
                                                   shortcutType="A"))
    params, stats = jax.jit(model.init)(jax.random.PRNGKey(0))
    ref = np.asarray(model.apply(params, stats, jnp.asarray(x), train=False)[0])
    rel = np.abs(got - ref) / (np.max(np.abs(ref)) + 1e-6)
    assert float(rel.max()) < 0.08, float(rel.max())


def test_convtranspose_quantized_kernel_dequantizes():
    """A plugin ConvTranspose with k != 2 slips past quantize_params'
    2x2 shape skip; its apply must dequantize (exact float compute),
    not crash at trace time on the kernel dict."""
    m = nn.ConvTranspose(4, 3, k=3, stride=2)
    p, s = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 8, 4)), jnp.float32
    )
    y_f, _ = m.apply(p, s, x)
    pq = dict(p, w=quantize_kernel(p["w"]))
    assert is_quantized(pq["w"]) and pq["w"]["w8"].shape == (3, 3, 4, 3)
    y_q, _ = jax.jit(lambda p, x: m.apply(p, s, x))(pq, x)
    y_f, y_q = np.asarray(y_f), np.asarray(y_q)
    assert np.isfinite(y_q).all()
    # per-channel int8 weight error only: outputs stay close
    np.testing.assert_allclose(
        y_q, y_f, atol=0.02 * np.abs(y_f).max() + 1e-6
    )


def test_calib_window_distinct_and_wrapping():
    """The no-.sample calibration fallback must draw DISTINCT 1-based
    windows (fetching [1, bs] every iteration would calibrate one batch
    n times while claiming n batches)."""
    from mgtpu.pipelines.standard import calib_window

    assert calib_window(0, 4, 10) == [(1, 4)]
    assert calib_window(1, 4, 10) == [(5, 8)]
    # tail wraps as TWO segments so the batch is still 4 samples
    assert calib_window(2, 4, 10) == [(9, 10), (1, 2)]
    assert calib_window(3, 4, 10) == [(3, 6)]
    # batch >= split: the whole split every time
    assert calib_window(0, 32, 10) == [(1, 10)]
    assert calib_window(1, 32, 10) == [(1, 10)]
    for i in range(20):
        segs = calib_window(i, 7, 23)
        assert sum(hi - lo + 1 for lo, hi in segs) == 7
        for lo, hi in segs:
            assert 1 <= lo <= hi <= 23
