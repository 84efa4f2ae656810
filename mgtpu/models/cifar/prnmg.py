"""PR-NMG — pyramid-prefix residual multigrid CNN for CIFAR.

Rebuild of `/root/reference/models/cifar/prnmg.lua`: pnmg channel plan
(`prnmg.lua:330-336`) with residual mg-conv layers and a resConv
single-grid residual in the pyramid prefix (`prnmg.lua:102-120,
296-305`); dropout on concatenated features behind `-isDropout`;
step LR 0.1 x 0.2^#{e>=60,120,160}, WD 5e-4."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, nll_loss, step_rule
from mgtpu.models.cifar.pnmg import DROPOUTS, build
from mgtpu.utils.metrics import topk_accuracy


class PrnmgNet(NetSpec):
    name = "cifar/prnmg"

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
            residual=True,
        )

    def create_loss(self, opt):
        return nll_loss

    def train_rule(self, epoch, opt):
        return step_rule(epoch)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss, "top1": topk_accuracy(outputs, labels, 1)}


NET = PrnmgNet()
