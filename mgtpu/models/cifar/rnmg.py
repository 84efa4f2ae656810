"""R-MG-12/22/32/42 — residual multigrid CNN for CIFAR.

Rebuild of `/root/reference/models/cifar/rnmg.lua`: channel plan
`rnmg.lua:303-309`, residual mg layers (two resample-concat+conv stages
+ per-scale shortcut), input block = pyramid stem + one constant-width
residual layer (`rnmg.lua:175-254`), per-block dropouts {-,.1,.2,.3,.4}
behind `-isDropout`, BN default eps, step LR 0.1 x 0.2^#{e>=60,120,160}
WD 5e-4 (`rnmg.lua:431-451`)."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, nll_loss, step_rule
from mgtpu.models.common import build_residual_mg
from mgtpu.utils.metrics import topk_accuracy

BLOCKS = [
    ([40, 20, 10], [3, 3, 3]),
    ([80, 40, 20], [3, 3, 3]),
    ([160, 80, 40], [3, 3, 3]),
    ([320, 160, 80], [3, 3, 1]),
    ([320, 240], [3, 1]),
]
DROPOUTS = [None, 0.1, 0.2, 0.3, 0.4]


class RnmgNet(NetSpec):
    name = "cifar/rnmg"

    def arguments(self, parser):
        parser.add_argument("-nLayer", type=int, default=1, help="number of layers per block")
        parser.add_argument("-isDropout", action="store_true", help="if using dropout")

    def create_model(self, opt):
        n_classes = 10 if getattr(opt, "dataset", "") == "cifar10" else 100
        return build_residual_mg(
            BLOCKS,
            n_layer=getattr(opt, "nLayer", 1),
            n_classes=n_classes,
            dropouts=DROPOUTS if getattr(opt, "isDropout", False) else None,
            dtype=getattr(opt, "compute_dtype", None),
        )

    def create_loss(self, opt):
        return nll_loss

    def train_rule(self, epoch, opt):
        return step_rule(epoch)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss, "top1": topk_accuracy(outputs, labels, 1)}


NET = RnmgNet()
