"""RES-12/22 — single-grid ResNet baseline for CIFAR.

Rebuild of `/root/reference/models/cifar/resnet.lua`: widths
{64,128,256,512,512} (`resnet.lua:75`), zero-pad shortcuts, input block
= Conv(3,64)-BN-ReLU + residual block (`resnet.lua:49-72`), ceil-mode
pool after each block, dropouts {-,.1,.2,.3,.4} *before each conv*
behind `-isDropout`, step LR rule."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, nll_loss, step_rule
from mgtpu.models.common import FlatClassifier, MgNet, Pool2, ResBlock
from mgtpu.nn import ConvBN
from mgtpu.utils.metrics import topk_accuracy

BLOCKS = [64, 128, 256, 512, 512]
DROPOUTS = [None, 0.1, 0.2, 0.3, 0.4]


def build(n_layer, n_classes, dropouts=None, dtype=None):
    layers = []
    c_in = 3
    for bi, c in enumerate(BLOCKS):
        dr = (dropouts[bi] if dropouts else None) or 0.0
        for li in range(n_layer):
            if bi == 0 and li == 0:
                layers.append(ConvBN(3, c, 3, relu=True, dtype=dtype))
                layers.append(ResBlock(c, c, dropout=dr, dtype=dtype))
            else:
                layers.append(ResBlock(c_in, c, dropout=dr, dtype=dtype))
            c_in = c
        layers.append(Pool2(ceil=True))
    layers.append(FlatClassifier(BLOCKS[-1], n_classes, dtype=dtype))
    return MgNet(layers)


class ResnetNet(NetSpec):
    name = "cifar/resnet"

    def arguments(self, parser):
        parser.add_argument("-nLayer", type=int, default=1, help="number of layers per block")
        parser.add_argument("-isDropout", action="store_true", help="if using dropout")

    def create_model(self, opt):
        n_classes = 10 if getattr(opt, "dataset", "") == "cifar10" else 100
        return build(
            getattr(opt, "nLayer", 1),
            n_classes,
            DROPOUTS if getattr(opt, "isDropout", False) else None,
            dtype=getattr(opt, "compute_dtype", None),
        )

    def create_loss(self, opt):
        return nll_loss

    def train_rule(self, epoch, opt):
        return step_rule(epoch)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss, "top1": topk_accuracy(outputs, labels, 1)}


NET = ResnetNet()
