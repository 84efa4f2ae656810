"""VGG-6/11 — single-grid VGG baseline for CIFAR.

Rebuild of `/root/reference/models/cifar/vgg.lua`: widths
{102,204,408,816,816} (`vgg.lua:29`), Conv-BN(eps 1e-3)-ReLU per layer,
ceil-mode maxpool after each block, Linear(816, nClasses),
log-linear LR rule."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, log_linear_rule, nll_loss
from mgtpu.models.common import FlatClassifier, MgNet, Pool2
from mgtpu.nn import ConvBN
from mgtpu.utils.metrics import topk_accuracy

BLOCKS = [102, 204, 408, 816, 816]


def build(n_layer, n_classes, dtype=None):
    layers = []
    c_in = 3
    for c in BLOCKS:
        for _ in range(n_layer):
            layers.append(ConvBN(c_in, c, 3, relu=True, eps=1e-3, dtype=dtype))
            c_in = c
        layers.append(Pool2(ceil=True))
    layers.append(FlatClassifier(BLOCKS[-1], n_classes, dtype=dtype))
    return MgNet(layers)


class VggNet(NetSpec):
    name = "cifar/vgg"

    def arguments(self, parser):
        parser.add_argument("-nLayer", type=int, default=1, help="number of layers per block")

    def create_model(self, opt):
        n_classes = 10 if getattr(opt, "dataset", "") == "cifar10" else 100
        return build(
            getattr(opt, "nLayer", 1), n_classes, dtype=getattr(opt, "compute_dtype", None)
        )

    def create_loss(self, opt):
        return nll_loss

    def train_rule(self, epoch, opt):
        return log_linear_rule(epoch, opt.nEpochs)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss, "top1": topk_accuracy(outputs, labels, 1)}


NET = VggNet()
