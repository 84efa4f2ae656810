"""MG-6/11/16/21 — plain multigrid CNN for CIFAR.

Rebuild of `/root/reference/models/cifar/nmg.lua`: 5 blocks of mg-conv
layers (channel plan below, `nmg.lua:148-154`), mgPool after each block
(concat-mode when the block's last kernel is 1), classifier on scale 1.
BN eps 1e-3 (`nmg.lua:23`), NLL loss, loss+top1 metrics, log-linear LR
1e-1 -> 1e-4 with WD 5e-4 (`nmg.lua:257-263`). `-nLayer` selects depth
(1/2/3/4 -> MG-6/11/16/21)."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, log_linear_rule, nll_loss
from mgtpu.models.common import build_plain_mg
from mgtpu.utils.metrics import topk_accuracy

BLOCKS = [
    ([40, 40, 40], [3, 3, 3]),
    ([80, 40, 40], [3, 3, 3]),
    ([160, 80, 40], [3, 3, 3]),
    ([320, 160, 80], [3, 3, 1]),
    ([320, 240], [3, 1]),
]


class NmgNet(NetSpec):
    name = "cifar/nmg"

    def arguments(self, parser):
        parser.add_argument("-nLayer", type=int, default=1, help="number of layers per block")

    def create_model(self, opt):
        n_classes = 10 if getattr(opt, "dataset", "") == "cifar10" else 100
        return build_plain_mg(
            BLOCKS,
            n_layer=getattr(opt, "nLayer", 1),
            n_classes=n_classes,
            eps=1e-3,
            dtype=getattr(opt, "compute_dtype", None),
        )

    def create_loss(self, opt):
        return nll_loss

    def train_rule(self, epoch, opt):
        return log_linear_rule(epoch, opt.nEpochs)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss, "top1": topk_accuracy(outputs, labels, 1)}


NET = NmgNet()
