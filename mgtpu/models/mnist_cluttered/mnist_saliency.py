"""Saliency harness "model" — rebuild of
`models/mnist-cluttered/mnist-saliency.lua`: `createModel` loads the
trained net from `-trainedNet` (torch.load there; checkpoint-metadata
rebuild + weight load here, `mnist-saliency.lua:7-15,23-25`)."""

from __future__ import annotations


from mgtpu.models.base import NetSpec, bce_loss


class MnistSaliencyNet(NetSpec):
    name = "mnist-cluttered/mnist-saliency"

    def arguments(self, parser):
        parser.add_argument("-trainedNet", type=str, default="",
                            help="path to the trained model checkpoint")

    def create_model(self, opt):
        from mgtpu.models.mnist_cluttered.mnist_test import _rebuild_from_ckpt

        if not getattr(opt, "trainedNet", ""):
            raise ValueError("mnist-saliency requires -trainedNet <checkpoint>")
        model, ckpt = _rebuild_from_ckpt(opt.trainedNet, opt)
        self._ckpt = ckpt
        return model

    def initial_state(self, opt, model):
        from mgtpu.train.optim import sgd_init

        ckpt = self._ckpt
        return ckpt["params"], ckpt["stats"], ckpt["opt_state"] or sgd_init(ckpt["params"])

    def create_loss(self, opt):
        return bce_loss  # registered but unused (parity with reference)

    def train_rule(self, epoch, opt):
        raise NotImplementedError("mnist-saliency is a test-only harness")

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss}


NET = MnistSaliencyNet()
