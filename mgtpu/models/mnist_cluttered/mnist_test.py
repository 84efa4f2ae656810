"""Offline test harness "model" — rebuild of
`models/mnist-cluttered/mnist-test.lua`: used with `-retrain <ckpt>
-test`, it rebuilds the trained architecture from the checkpoint's
metadata (the torch version relied on whole-model deserialization,
`model.lua:28-31`) and exposes loss + meanIU + a stored `prediction`
tensor that the test pipeline dumps to testOutput_<EPOCH>.h5
(`mnist-test.lua:19-36`)."""

from __future__ import annotations

import types

from mgtpu.models.base import NetSpec, bce_loss
from mgtpu.utils.metrics import mnist_iu


def _rebuild_from_ckpt(path, opt):
    from mgtpu.models import get_net
    from mgtpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(path, allow_pickle=getattr(opt, "allowPickleCkpt", False))
    meta = ckpt["meta"]
    inner_opt = types.SimpleNamespace(**{**vars(opt), **meta})
    inner_opt.compute_dtype = getattr(opt, "compute_dtype", None)
    net = get_net(meta["netType"])
    return net.create_model(inner_opt), ckpt


class MnistTestNet(NetSpec):
    name = "mnist-cluttered/mnist-test"

    def create_model(self, opt):
        path = getattr(opt, "retrain", "none")
        if path == "none":
            raise ValueError("mnist-test requires -retrain <checkpoint>")
        model, _ = _rebuild_from_ckpt(path, opt)
        return model

    def create_loss(self, opt):
        return bce_loss

    def train_rule(self, epoch, opt):
        raise NotImplementedError("mnist-test is a test-only harness")

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss}

    def test_metrics(self, outputs, labels, loss):
        return {"loss": loss, "meanIU": mnist_iu(outputs, labels, 0.5)}

    def stored_outputs(self, outputs):
        return {"prediction": outputs}


NET = MnistTestNet()
