"""Torch7 serialization round-trips + blob conversion + weight import.

The reference's canonical artifacts are torch.save blobs (SURVEY §2.9:
`cifar100_whitened.t7`, `mnist_<task>.t7`, `model_<E>.t7`); no real
blob survives on this zero-egress box (`/root/reference/
.MISSING_LARGE_BLOBS`), so fidelity is pinned by writer->reader
round-trips over every type torch.save emits, in both binary and ascii
framings of the published format."""

import os
import subprocess
import sys
import types

import numpy as np
import pytest

from mgtpu.utils import t7

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)


@pytest.mark.parametrize("ascii_mode", [False, True])
def test_roundtrip_all_types(tmp_path, ascii_mode):
    rng = np.random.default_rng(0)
    obj = {
        "double_t": rng.standard_normal((2, 3, 4)),
        "float_t": rng.standard_normal((5,)).astype(np.float32),
        "long_t": np.arange(6, dtype=np.int64).reshape(2, 3),
        "int_t": np.arange(4, dtype=np.int32),
        "short_t": np.arange(4, dtype=np.int16),
        "char_t": np.arange(4, dtype=np.int8),
        "byte_t": np.arange(4, dtype=np.uint8),
        "empty_t": np.empty((0,), np.float32),
        "num": 3.5,
        "neg": -1.0,
        "string": "hello world",
        "flag_t": True,
        "flag_f": False,
        "nothing": None,
        "nested": {"a": [1.0, 2.0, 3.0], "b": {"c": "deep"}},
    }
    p = str(tmp_path / "all.t7")
    t7.save(p, obj, ascii_mode=ascii_mode)
    assert t7.sniff_ascii(p) == ascii_mode
    back = t7.load(p)
    for k in ("double_t", "float_t", "long_t", "int_t", "short_t",
              "char_t", "byte_t", "empty_t"):
        np.testing.assert_array_equal(back[k], obj[k])
        assert back[k].dtype == obj[k].dtype
    assert back["num"] == 3.5 and back["neg"] == -1.0
    assert back["string"] == "hello world"
    assert back["flag_t"] is True and back["flag_f"] is False
    assert back["nothing"] is None
    assert back["nested"]["a"] == [1.0, 2.0, 3.0]
    assert back["nested"]["b"]["c"] == "deep"


@pytest.mark.parametrize("ascii_mode", [False, True])
def test_roundtrip_shared_refs_and_cycles(tmp_path, ascii_mode):
    shared = {"x": 1.0}
    obj = {"a": shared, "b": shared}
    obj["self"] = obj
    p = str(tmp_path / "refs.t7")
    t7.save(p, obj, ascii_mode=ascii_mode)
    back = t7.load(p)
    assert back["a"] is back["b"]  # ref-indices preserve sharing
    assert back["self"] is back  # and cycles


def test_roundtrip_torch_object_nn_graph(tmp_path):
    conv = t7.TorchObject("nn.SpatialConvolution", {
        "weight": np.random.default_rng(1).standard_normal((8, 3, 3, 3)).astype(np.float32),
        "bias": np.zeros(8, np.float32),
        "nInputPlane": 3.0, "nOutputPlane": 8.0,
    })
    seq = t7.TorchObject("nn.Sequential", {"modules": [conv]})
    p = str(tmp_path / "m.t7")
    t7.save(p, seq)
    back = t7.load(p)
    assert back.torch_type == "nn.Sequential" and back.version == 1
    m0 = back["modules"][0]
    assert m0.torch_type == "nn.SpatialConvolution"
    np.testing.assert_array_equal(m0["weight"], conv["weight"])


def test_reader_nonstandard_strides(tmp_path):
    """Torch tensors can be non-contiguous views (e.g. :t()); the reader
    must honor size/stride/offset, not assume natural layout."""
    import io
    import struct

    base = np.arange(12, dtype=np.float32)
    buf = io.BytesIO()
    w = t7._Writer(buf, False)
    # hand-write a transposed 3x4 view: sizes (4,3), strides (1,4), off 1
    w.write_int(t7.TYPE_TORCH)
    w.write_int(1)
    w.write_string(b"V 1")
    w.write_string(b"torch.FloatTensor")
    w.write_int(2)
    for v in (4, 3):
        w.write_long(v)
    for v in (1, 4):
        w.write_long(v)
    w.write_long(1)
    w.write_int(t7.TYPE_TORCH)
    w.write_int(2)
    w.write_string(b"V 1")
    w.write_string(b"torch.FloatStorage")
    w.write_long(12)
    w.write_elements(base)
    arr = t7.loads(buf.getvalue())
    np.testing.assert_array_equal(arr, base.reshape(3, 4).T)


def test_legacy_class_name_without_version(tmp_path):
    """Pre-V1 files put the class name where the version string goes."""
    import io

    buf = io.BytesIO()
    w = t7._Writer(buf, False)
    w.write_int(t7.TYPE_TORCH)
    w.write_int(1)
    w.write_string(b"torch.FloatTensor")  # no "V n" prefix
    w.write_int(1)
    w.write_long(3)
    w.write_long(1)
    w.write_long(1)
    w.write_int(t7.TYPE_TORCH)
    w.write_int(2)
    w.write_string(b"torch.FloatStorage")
    w.write_long(3)
    w.write_elements(np.array([1, 2, 3], np.float32))
    arr = t7.loads(buf.getvalue())
    np.testing.assert_array_equal(arr, [1.0, 2.0, 3.0])


def test_cuda_tensor_maps_to_f32(tmp_path):
    import io

    buf = io.BytesIO()
    w = t7._Writer(buf, False)
    w.write_int(t7.TYPE_TORCH)
    w.write_int(1)
    w.write_string(b"V 1")
    w.write_string(b"torch.CudaTensor")
    w.write_int(1)
    w.write_long(2)
    w.write_long(1)
    w.write_long(1)
    w.write_int(t7.TYPE_TORCH)
    w.write_int(2)
    w.write_string(b"V 1")
    w.write_string(b"torch.CudaStorage")
    w.write_long(2)
    w.write_elements(np.array([1.5, 2.5], np.float32))
    arr = t7.loads(buf.getvalue())
    assert arr.dtype == np.float32
    np.testing.assert_array_equal(arr, [1.5, 2.5])


def _fake_cifar_blob(path):
    rng = np.random.default_rng(3)
    def split(n):  # every class populated (the loader requires it)
        return {
            "data": rng.standard_normal((n, 3072)).astype(np.float32),
            "labels": (np.arange(n) % 100 + 1).astype(np.float64),  # 1-based
        }
    t7.save(path, {"trainData": split(200), "testData": split(100)})


def test_read_t7_cli_cifar_conversion(tmp_path):
    blob = str(tmp_path / "cifar100_whitened.t7")
    out = str(tmp_path / "cifar100_whitened.npz")
    _fake_cifar_blob(blob)
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "read_t7.py"), blob,
         "--format", "cifar", "--to-npz", out],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    z = np.load(out)
    assert z["train_data"].shape == (200, 32, 32, 3)
    assert z["train_data"].dtype == np.float32
    assert z["test_labels"].min() >= 1  # loader shifts 1-based labels
    # and the runtime loader actually accepts the blob
    from mgtpu.data.cifar import build_cifar100_whitened

    opt = types.SimpleNamespace(data=str(tmp_path), imageSize=36,
                                imageCrop=32, colorspace="bgr",
                                dataAug="default")
    loaders = build_cifar100_whitened(opt)
    assert loaders["train"].size() == 200
    x, y = loaders["test"].get_inputs(1, 4, 1)
    assert x.shape == (4, 32, 32, 3) and y.min() >= 0


def test_read_t7_cli_mnist_task_conversion(tmp_path):
    rng = np.random.default_rng(4)
    def split(n):
        return {"data": rng.random((n, 1, 64, 64)).astype(np.float32),
                "labels": rng.random((n, 10, 64, 64)).astype(np.float32)}
    blob = str(tmp_path / "mnist_segmentation.t7")
    t7.save(blob, {"train": split(6), "val": split(3), "test": split(3)})
    out = str(tmp_path / "mnist_segmentation.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "read_t7.py"), blob,
         "--format", "mnist-task", "--to-npz", out],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    z = np.load(out)
    assert z["train_inputs"].shape == (6, 64, 64, 1)
    assert z["valid_targets"].shape == (3, 64, 64, 10)  # val -> valid (-eval)
    # runtime loader accepts it and exposes all three splits
    from mgtpu.data.mnist import build_mnist_task

    loaders = build_mnist_task(types.SimpleNamespace(data=str(tmp_path)), "mnist-seg")
    assert set(loaders) == {"train", "test", "eval"}
    assert loaders["eval"].size() == 3


def test_ingest_cifar_t7_flag(tmp_path):
    blob = str(tmp_path / "cifar100_whitened.t7")
    out = str(tmp_path / "out.npz")
    _fake_cifar_blob(blob)
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "ingest_cifar.py"),
         "--t7", blob, "--out", out],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    z = np.load(out)
    assert z["train_data"].shape == (200, 32, 32, 3)


def _torch_blob_for_nmg(path, opt):
    """Build a model_<E>.t7-shaped blob whose module sequence matches
    cifar/nmg's flattened slot order, with reference layouts: conv
    (O,I,kH,kW), BN weight/bias/running stats, Linear (O,I)."""
    import jax

    from mgtpu.models import get_net
    from import_t7_model import flatten_mg

    net = get_net("cifar/nmg")
    model = net.create_model(opt)
    params, stats = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    slots = flatten_mg(jax.tree.map(lambda x: x, params),
                       jax.tree.map(lambda x: x, stats), [])
    rng = np.random.default_rng(7)
    modules = []
    for kind, p, s in slots:
        if kind == "conv":
            kh, kw, ci, co = p["w"].shape
            modules.append(t7.TorchObject("cudnn.SpatialConvolution", {
                "weight": rng.standard_normal((co, ci, kh, kw)).astype(np.float32),
                "bias": rng.standard_normal((co,)).astype(np.float32),
                "nInputPlane": float(ci), "nOutputPlane": float(co),
                "kH": float(kh), "kW": float(kw),
            }))
        elif kind == "linear":
            ci, co = p["w"].shape
            modules.append(t7.TorchObject("nn.Linear", {
                "weight": rng.standard_normal((co, ci)).astype(np.float32),
                "bias": rng.standard_normal((co,)).astype(np.float32),
            }))
        else:
            c = p["scale"].shape[0]
            modules.append(t7.TorchObject("nn.SpatialBatchNormalization", {
                "weight": rng.standard_normal((c,)).astype(np.float32),
                "bias": rng.standard_normal((c,)).astype(np.float32),
                "running_mean": rng.standard_normal((c,)).astype(np.float32),
                "running_var": rng.random((c,)).astype(np.float32) + 0.5,
            }))
    seq = t7.TorchObject("nn.Sequential", {"modules": modules})
    # wrap like saveDataParallel output sometimes is: a DPT whose
    # replicas must collapse to one (`multigpu.lua:33-51`)
    dpt = t7.TorchObject("nn.DataParallelTable", {"modules": [seq, seq]})
    t7.save(path, dpt)
    return modules


def test_import_t7_model_nmg(tmp_path):
    """Order-based import maps every conv/BN/Linear onto the cifar/nmg
    pytree with layout translation, and the result forwards."""
    import jax

    opt = types.SimpleNamespace(netType="cifar/nmg", dataset="cifar100-whitened",
                                nLayer=1, compute_dtype=None)
    blob = str(tmp_path / "model_200.t7")
    modules = _torch_blob_for_nmg(blob, opt)

    from import_t7_model import import_model

    params, stats = import_model(blob, opt)
    # spot-check the first conv and the classifier translate correctly
    first = modules[0]
    np.testing.assert_array_equal(
        params["0"]["0"]["conv"]["w"],
        np.asarray(first["weight"]).transpose(2, 3, 1, 0))
    lin = modules[-1]
    np.testing.assert_array_equal(params[max(params, key=int)]["w"],
                                  np.asarray(lin["weight"]).T)
    bn = modules[1]
    np.testing.assert_array_equal(stats["0"]["0"]["bn"]["mean"],
                                  bn["running_mean"])
    # the imported tree drives a real eval forward
    from mgtpu.models import get_net

    model = get_net("cifar/nmg").create_model(opt)
    x = np.zeros((2, 32, 32, 3), np.float32)
    y, _ = jax.jit(lambda p, s, x: model.apply(p, s, x, train=False))(params, stats, x)
    assert y.shape == (2, 100)
    assert np.isfinite(np.asarray(y)).all()


def test_import_t7_model_mm_weights_and_running_std(tmp_path):
    """SpatialConvolutionMM's flattened weights unfold; legacy
    running_std converts to variance."""
    import jax

    opt = types.SimpleNamespace(netType="cifar/nmg", dataset="cifar100-whitened",
                                nLayer=1, compute_dtype=None)
    blob = str(tmp_path / "model_mm.t7")
    modules = _torch_blob_for_nmg(blob, opt)
    # mutate: conv0 -> MM layout, bn0 -> running_std
    conv0 = modules[0]
    w4 = np.asarray(conv0["weight"])
    conv0.torch_type = "nn.SpatialConvolutionMM"
    conv0.fields["weight"] = w4.reshape(w4.shape[0], -1)
    bn0 = modules[1]
    var = np.asarray(bn0["running_var"], np.float64)
    del bn0.fields["running_var"]
    bn0.fields["running_std"] = (1.0 / np.sqrt(var)).astype(np.float32)
    seq = t7.TorchObject("nn.Sequential", {"modules": modules})
    t7.save(blob, seq)

    from import_t7_model import import_model

    params, stats = import_model(blob, opt)
    np.testing.assert_array_equal(params["0"]["0"]["conv"]["w"],
                                  w4.transpose(2, 3, 1, 0))
    np.testing.assert_allclose(stats["0"]["0"]["bn"]["var"],
                               var.astype(np.float32), rtol=1e-5)
    del jax  # imported for parity with the sibling test


def test_import_t7_model_rejects_mismatch(tmp_path):
    opt = types.SimpleNamespace(netType="cifar/nmg", dataset="cifar100-whitened",
                                nLayer=1, compute_dtype=None)
    blob = str(tmp_path / "model_bad.t7")
    modules = _torch_blob_for_nmg(blob, opt)
    t7.save(blob, t7.TorchObject("nn.Sequential", {"modules": modules[:-1]}))

    from import_t7_model import import_model

    with pytest.raises(SystemExit, match="sequences disagree"):
        import_model(blob, opt)


def test_empty_tensor_reads_as_zero_elements(tmp_path):
    """torch.Tensor() (ndim 0, nil storage) — ubiquitous in
    clearState'd checkpoints — must decode to an EMPTY array, not a 0-d
    array holding one uninitialized garbage value."""
    from mgtpu.utils.t7 import _Writer

    path = str(tmp_path / "empty.t7")
    with open(path, "wb") as f:
        w = _Writer(f, False)
        w.write_int(t7.TYPE_TORCH)
        w.write_int(1)  # ref index
        w.write_string(b"V 1")
        w.write_string(b"torch.FloatTensor")
        w.write_int(0)  # ndim
        w.write_long(1)  # storageOffset
        w.write_object(None)  # nil storage (what torch writes here)
    out = t7.load(path)
    assert isinstance(out, np.ndarray) and out.shape == (0,)
    assert out.dtype == np.float32


def test_writer_rejects_0d_array(tmp_path):
    """A 0-d numpy array has no torch.Tensor equivalent (torch's
    ndim-0 tensor is the EMPTY tensor) — writing one would lose its
    value on the round trip, so it must be rejected."""
    with pytest.raises(TypeError, match="0-d"):
        t7.save(str(tmp_path / "x.t7"), np.array(5.0, np.float32))


@pytest.mark.parametrize("ascii_mode", [False, True])
def test_int64_exact_roundtrip(tmp_path, ascii_mode):
    """int64 values above 2^53 survive exactly (the ascii decode used
    to round-trip through float64, silently rounding them)."""
    big = np.array([2**60 + 1, -(2**60 + 3), 7], np.int64)
    path = str(tmp_path / "big.t7")
    t7.save(path, big, ascii_mode=ascii_mode)
    out = t7.load(path, ascii_mode=ascii_mode)
    np.testing.assert_array_equal(out, big)


def test_import_t7_model_rejects_dropped_bias():
    """A trained non-zero torch conv bias with no 'b' slot on the
    mgtpu side must abort loudly (silently dropping it would offset
    every activation); an all-zero bias is harmless and allowed."""
    from import_t7_model import fill_slot

    mod = t7.TorchObject("nn.SpatialConvolution", {
        "weight": np.zeros((8, 4, 3, 3), np.float32),  # (O, I, kH, kW)
        "bias": np.ones(8, np.float32),
    })
    p = {"w": np.zeros((3, 3, 4, 8), np.float32)}  # built with bias=False
    with pytest.raises(SystemExit, match="non-zero bias"):
        fill_slot("conv", "conv", mod, p, {})
    mod.fields["bias"] = np.zeros(8, np.float32)
    fill_slot("conv", "conv", mod, p, {})  # no raise


# ---------------------------------------------------------------------
# Golden-bytes fixtures: the reader against byte streams assembled BY
# HAND from the published Torch7 on-disk format (File.lua writeObject +
# THDiskFile.c) — the repo's writer never touches them, so a shared
# reader/writer misunderstanding of the layout cannot round-trip
# invisibly (VERDICT r4 missing #4). Layout being pinned: int32 type
# tags (0=nil 1=number 2=string 3=table 4=torch 5=boolean), int32
# ref-indices on tables/classes, "V <n>" version string + class-name
# string on class records, tensor payload = int32 ndim + int64
# size/stride arrays + int64 1-based storageOffset + storage object,
# storage payload = int64 count + raw little-endian elements.
# Artifacts this protects: dataset/cifar100-whitened/dataset.lua:44,
# multigpu.lua:105, utils/mnist-cluttered/segmentation.lua:70.
# ---------------------------------------------------------------------


def _b_int(v):
    import struct
    return struct.pack("<i", v)


def _b_long(v):
    import struct
    return struct.pack("<q", v)


def _b_double(v):
    import struct
    return struct.pack("<d", v)


def _b_rawstr(s):  # size-prefixed string (NO type tag: class records)
    return _b_int(len(s)) + s


def _b_str(s):  # tagged string object
    return _b_int(2) + _b_rawstr(s)


def golden_binary_bytes():
    """{ loss=1.5, name="mg", w=FloatTensor 2x3 {1..6}, ok=true,
         w2=<same tensor, by ref>, legacy=IntTensor {7,8} written in
         the pre-V0 framing (class name in the version slot) }
    Table pairs in a fixed order; ref-indices 1 (table), 2 (tensor),
    3 (its storage), 4 (legacy tensor), 5 (its storage)."""
    out = b""
    out += _b_int(3) + _b_int(1)  # TYPE_TABLE, ref 1
    out += _b_int(6)              # npairs
    out += _b_str(b"loss") + _b_int(1) + _b_double(1.5)
    out += _b_str(b"name") + _b_str(b"mg")
    # w: torch.FloatTensor 2x3, contiguous strides (3,1), offset 1
    out += _b_str(b"w")
    out += _b_int(4) + _b_int(2)          # TYPE_TORCH, ref 2
    out += _b_rawstr(b"V 1") + _b_rawstr(b"torch.FloatTensor")
    out += _b_int(2)                      # ndim
    out += _b_long(2) + _b_long(3)        # size
    out += _b_long(3) + _b_long(1)        # stride
    out += _b_long(1)                     # storageOffset (1-based)
    out += _b_int(4) + _b_int(3)          # storage: TYPE_TORCH, ref 3
    out += _b_rawstr(b"V 1") + _b_rawstr(b"torch.FloatStorage")
    out += _b_long(6)
    out += np.arange(1, 7, dtype="<f4").tobytes()
    out += _b_str(b"ok") + _b_int(5) + _b_int(1)  # boolean true
    # w2: the SAME tensor again -> tag + ref only
    out += _b_str(b"w2") + _b_int(4) + _b_int(2)
    # legacy: class name directly in the version slot (old torch files)
    out += _b_str(b"legacy")
    out += _b_int(4) + _b_int(4)
    out += _b_rawstr(b"torch.IntTensor")
    out += _b_int(1) + _b_long(2) + _b_long(1) + _b_long(1)
    out += _b_int(4) + _b_int(5)
    out += _b_rawstr(b"torch.IntStorage")
    out += _b_long(2) + np.array([7, 8], "<i4").tobytes()
    return out


def test_golden_binary_fixture(tmp_path):
    path = str(tmp_path / "golden.t7")
    with open(path, "wb") as f:
        f.write(golden_binary_bytes())
    assert not t7.sniff_ascii(path)
    obj = t7.load(path)
    assert obj["loss"] == 1.5
    assert obj["name"] == "mg"
    np.testing.assert_array_equal(
        obj["w"], np.arange(1, 7, dtype=np.float32).reshape(2, 3))
    assert obj["w"].dtype == np.float32
    assert obj["ok"] is True
    assert obj["w2"] is obj["w"]  # ref-index sharing preserved
    np.testing.assert_array_equal(obj["legacy"], np.array([7, 8], np.int32))


def test_golden_binary_noncontiguous_offset(tmp_path):
    """Column view of a 2x3 storage: size (2,), stride (3,), offset 2 —
    selects elements {20, 50} of storage {10..60}. Pins that the reader
    honors stride/offset rather than assuming contiguous-from-0."""
    out = b""
    out += _b_int(4) + _b_int(1)
    out += _b_rawstr(b"V 1") + _b_rawstr(b"torch.DoubleTensor")
    out += _b_int(1) + _b_long(2) + _b_long(3) + _b_long(2)
    out += _b_int(4) + _b_int(2)
    out += _b_rawstr(b"V 1") + _b_rawstr(b"torch.DoubleStorage")
    out += _b_long(6)
    out += np.array([10., 20., 30., 40., 50., 60.], "<f8").tobytes()
    path = str(tmp_path / "strided.t7")
    with open(path, "wb") as f:
        f.write(out)
    np.testing.assert_array_equal(t7.load(path), np.array([20.0, 50.0]))


def test_golden_ascii_fixture(tmp_path):
    """The same layout in torch.save(..., 'ascii') framing: every
    scalar is a whitespace-terminated decimal token; strings are a size
    token + newline + raw bytes."""
    lines = [
        b"3", b"1",          # TYPE_TABLE ref 1
        b"2",                # npairs
        b"2", b"4\nloss",    # key "loss"
        b"1", b"1.5",        # number 1.5
        b"2", b"1\nw",       # key "w"
        b"4", b"2",          # TYPE_TORCH ref 2
        b"3\nV 1", b"17\ntorch.FloatTensor",
        b"1", b"3", b"1", b"1",   # ndim 1, size 3, stride 1, offset 1
        b"4", b"3",          # storage TYPE_TORCH ref 3
        b"3\nV 1", b"18\ntorch.FloatStorage",
        b"3", b"2.5 -1 4096",
    ]
    path = str(tmp_path / "golden_ascii.t7")
    with open(path, "wb") as f:
        f.write(b"\n".join(lines) + b"\n")
    assert t7.sniff_ascii(path)
    obj = t7.load(path)
    assert obj["loss"] == 1.5
    np.testing.assert_array_equal(
        obj["w"], np.array([2.5, -1.0, 4096.0], np.float32))


def test_golden_nn_class_record(tmp_path):
    """A hand-assembled nn.SpatialConvolution class record (the shape
    multigpu.lua:105 checkpoints are made of): class fields arrive as a
    plain table object after the class-name string."""
    out = b""
    out += _b_int(4) + _b_int(1)
    out += _b_rawstr(b"V 1") + _b_rawstr(b"nn.SpatialConvolution")
    out += _b_int(3) + _b_int(2)  # fields table, ref 2
    out += _b_int(2)
    out += _b_str(b"nInputPlane") + _b_int(1) + _b_double(3.0)
    out += _b_str(b"weight")
    out += _b_int(4) + _b_int(3)
    out += _b_rawstr(b"V 1") + _b_rawstr(b"torch.FloatTensor")
    out += _b_int(1) + _b_long(2) + _b_long(1) + _b_long(1)
    out += _b_int(4) + _b_int(4)
    out += _b_rawstr(b"V 1") + _b_rawstr(b"torch.FloatStorage")
    out += _b_long(2) + np.array([0.5, -0.5], "<f4").tobytes()
    path = str(tmp_path / "conv.t7")
    with open(path, "wb") as f:
        f.write(out)
    obj = t7.load(path)
    assert isinstance(obj, t7.TorchObject)
    assert obj.torch_type == "nn.SpatialConvolution"
    assert obj["nInputPlane"] == 3.0
    np.testing.assert_array_equal(obj["weight"],
                                  np.array([0.5, -0.5], np.float32))


def test_writer_reproduces_golden_bytes(tmp_path):
    """The inverse direction: the repo's writer, fed the golden
    object's non-legacy core, must emit byte-identical output to the
    hand-assembled stream — pinning the writer to the published format
    too (torch.load of our blobs depends on it)."""
    out = b""
    out += _b_int(3) + _b_int(1) + _b_int(1)
    out += _b_str(b"w")
    out += _b_int(4) + _b_int(2)
    out += _b_rawstr(b"V 1") + _b_rawstr(b"torch.FloatTensor")
    out += _b_int(2) + _b_long(2) + _b_long(3)
    out += _b_long(3) + _b_long(1) + _b_long(1)
    out += _b_int(4) + _b_int(3)
    out += _b_rawstr(b"V 1") + _b_rawstr(b"torch.FloatStorage")
    out += _b_long(6) + np.arange(1, 7, dtype="<f4").tobytes()
    path = str(tmp_path / "w.t7")
    t7.save(path, {"w": np.arange(1, 7, dtype=np.float32).reshape(2, 3)})
    with open(path, "rb") as f:
        assert f.read() == out
