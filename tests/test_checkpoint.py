"""Checkpoint/resume tests — the rebuild's replacement for
`saveDataParallel`/`loadDataParallel` (`multigpu.lua:105-160`), with
the documented upgrade that optimizer momentum persists (the reference
rebuilt optimState each epoch, SURVEY §5)."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from mgtpu.models import get_net
from mgtpu.train.optim import sgd_init
from mgtpu.train.step import make_train_step
from mgtpu.utils.checkpoint import load_checkpoint, model_meta, save_checkpoint


def _trained_state(steps=2):
    opt = types.SimpleNamespace(dataset="cifar100-whitened", nEpochs=200, nLayer=1)
    net = get_net("cifar/nmg")
    model = net.create_model(opt)
    params, stats = jax.jit(model.init)(jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, net.create_loss(opt), net, iter_size=1))
    opt_state = sgd_init(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    y = jnp.arange(4, dtype=jnp.int32)
    for i in range(steps):
        params, stats, opt_state, _ = step(
            params, stats, opt_state, {"x": x, "y": y}, 0.1, 5e-4,
            jax.random.PRNGKey(i),
        )
    return opt, net, model, params, stats, opt_state, step, (x, y)


def test_checkpoint_roundtrip_bitexact(tmp_path):
    opt, net, model, params, stats, opt_state, step, _ = _trained_state()
    path = str(tmp_path / "model_3.ckpt")
    save_checkpoint(path, params, stats, opt_state, epoch=3, meta=model_meta(
        types.SimpleNamespace(netType="cifar/nmg", nLayer=1, dataset="cifar100-whitened")))
    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 3
    assert ckpt["meta"]["netType"] == "cifar/nmg"
    assert ckpt["meta"]["nLayer"] == 1
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ckpt["params"])):
        np.testing.assert_array_equal(np.asarray(a), b)
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(ckpt["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_resume_continues_identically(tmp_path):
    """Training K steps straight == training K-2 steps, checkpointing,
    reloading, and training 2 more — INCLUDING momentum (the upgrade
    over the reference's per-epoch optimState reset)."""
    opt, net, model, params, stats, opt_state, step, (x, y) = _trained_state(steps=2)
    path = str(tmp_path / "model.ckpt")
    save_checkpoint(path, params, stats, opt_state, epoch=1, meta={})

    def advance(p, s, o, n0):
        for i in range(2):
            p, s, o, _ = step(p, s, o, {"x": x, "y": y}, 0.1, 5e-4,
                              jax.random.PRNGKey(n0 + i))
        return p

    straight = advance(params, stats, opt_state, 10)
    ckpt = load_checkpoint(path)
    resumed = advance(
        jax.tree.map(jnp.asarray, ckpt["params"]),
        jax.tree.map(jnp.asarray, ckpt["stats"]),
        jax.tree.map(jnp.asarray, ckpt["opt_state"]),
        10,
    )
    for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_checkpoint_atomic_write(tmp_path):
    """save_checkpoint writes via tmp+rename; no .tmp file remains."""
    opt, net, model, params, stats, opt_state, _, _ = _trained_state(steps=0)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, params, stats, opt_state)
    import os

    assert os.path.exists(path) and not os.path.exists(path + ".tmp")


def test_checkpoint_is_not_pickle(tmp_path):
    """The format is a zip of raw npy arrays + JSON structure; loading
    never unpickles. Legacy pickles load only behind allow_pickle."""
    import pickle
    import zipfile

    import ml_dtypes
    import pytest

    from mgtpu.utils.checkpoint import CKPT_FORMAT, CKPT_VERSION

    tree = {
        "w": np.arange(6, dtype=np.float32).reshape(2, 3),
        "b16": np.ones((3,), ml_dtypes.bfloat16),
        "nest": {"t": (np.zeros(2), [np.ones(1)])},
    }
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, tree, {"s": np.float32(2.0)}, None, epoch=7,
                    meta={"netType": "cifar/nmg"})
    assert zipfile.is_zipfile(path)
    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 7 and ckpt["opt_state"] is None
    assert ckpt["params"]["b16"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(ckpt["params"]["w"], tree["w"])
    assert isinstance(ckpt["params"]["nest"]["t"], tuple)
    assert isinstance(ckpt["params"]["nest"]["t"][1], list)

    legacy = str(tmp_path / "legacy.ckpt")
    with open(legacy, "wb") as f:
        pickle.dump({"params": {}, "stats": {}, "opt_state": None,
                     "epoch": 1, "meta": {}}, f)
    with pytest.raises(ValueError, match="allowPickleCkpt"):
        load_checkpoint(legacy)
    assert load_checkpoint(legacy, allow_pickle=True)["epoch"] == 1

    # future versions refuse loudly rather than misparse
    import json

    with np.load(path) as z:
        struct = json.loads(str(z["__struct__"]))
    assert struct["format"] == CKPT_FORMAT and struct["version"] == CKPT_VERSION


def test_checkpoint_rejects_non_str_keys(tmp_path):
    """Non-str dict keys would round-trip as strings — a DIFFERENT tree
    on load. Must raise TypeError (not assert: -O strips asserts)."""
    import numpy as np
    import pytest

    from mgtpu.utils.checkpoint import save_checkpoint

    with pytest.raises(TypeError, match="keys must be str"):
        save_checkpoint(str(tmp_path / "bad.ckpt"),
                        {0: np.zeros(2)}, {}, None, 1, {})


def test_async_save_matches_sync(tmp_path):
    """async_write moves only the npz write off-thread: the file a
    joined async save leaves behind is byte-identical in content to a
    sync save, and an immediate load (which joins internally) sees it."""
    opt, net, model, params, stats, opt_state, step, _ = _trained_state()
    meta = model_meta(types.SimpleNamespace(
        netType="cifar/nmg", nLayer=1, dataset="cifar100-whitened"))
    p_sync = str(tmp_path / "sync.ckpt")
    p_async = str(tmp_path / "async.ckpt")
    save_checkpoint(p_sync, params, stats, opt_state, epoch=3, meta=meta)
    save_checkpoint(p_async, params, stats, opt_state, epoch=3, meta=meta,
                    async_write=True)
    # no manual join: load_checkpoint must join the in-flight write
    a = load_checkpoint(p_async)
    s = load_checkpoint(p_sync)
    assert a["epoch"] == s["epoch"] == 3 and a["meta"] == s["meta"]
    for ka, ks in zip(jax.tree.leaves(a["params"]), jax.tree.leaves(s["params"])):
        np.testing.assert_array_equal(ka, ks)
    for ka, ks in zip(jax.tree.leaves(a["opt_state"]), jax.tree.leaves(s["opt_state"])):
        np.testing.assert_array_equal(ka, ks)
    # back-to-back async saves serialize (at most one in flight)
    save_checkpoint(p_async, params, stats, opt_state, epoch=4, meta=meta,
                    async_write=True)
    save_checkpoint(p_async, params, stats, opt_state, epoch=5, meta=meta,
                    async_write=True)
    assert load_checkpoint(p_async)["epoch"] == 5


def test_async_save_failure_surfaces(tmp_path, monkeypatch):
    """A background write failure (ENOSPC, permissions) must re-raise at
    the next join_pending_saves() — NOT vanish into the daemon thread
    while the run claims the checkpoint exists and exits 0."""
    import pytest

    from mgtpu.utils import checkpoint as ck

    def boom(path, sjson, arrays):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(ck, "_write_npz", boom)
    params = {"w": np.ones((2, 2), np.float32)}
    ck.save_checkpoint(str(tmp_path / "x.ckpt"), params, {}, None,
                       epoch=1, meta={}, async_write=True)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ck.join_pending_saves()
    # the error is consumed: a subsequent join is clean
    ck.join_pending_saves()
