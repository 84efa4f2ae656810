"""R-MG-18/34 — residual multigrid network for ImageNet (the flagship).

Rebuild of `/root/reference/models/ilsvrc/rnmg.lua`: 7x7/2+maxpool stem
per scale -> {64,32,16} at (56,28,14) (`rnmg.lua:241-242`), depth cfg
18={2,2,2,2} / 34={3,4,6,3} (`rnmg.lua:244-247`), blocks
{64,32,16} -> {128,64,32}concat -> {256,128}concat -> {512}
(`rnmg.lua:249-255`) with mgPool *between* blocks only, classifier
Avg7x7 -> Linear(512,1000) -> LogSoftMax (`rnmg.lua:280-286`). NLL loss,
loss+top1+top5 metrics, LR 0.1 x 0.1^floor((e-1)/30) WD 1e-4."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, imagenet_rule, nll_loss
from mgtpu.models.common import LogSoftmaxClassifier, MgNet
from mgtpu.ops.mg import MgPool, MgResidual, MgStem7x7
from mgtpu.utils.metrics import topk_accuracy

STEM = [64, 32, 16]
CFG = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3]}
BLOCKS = [
    ([64, 32, 16], [3, 3, 3], False),
    ([128, 64, 32], [3, 3, 3], True),
    ([256, 128], [3, 3], True),
    ([512], [3], False),
]


def build_ilsvrc_rnmg(depth: int = 34, n_classes: int = 1000, dtype=None):
    layers = [MgStem7x7(STEM, dtype=dtype)]
    widths = list(STEM)
    for bi, (ws, ks, is_concat) in enumerate(BLOCKS):
        for _ in range(CFG[depth][bi]):
            layers.append(MgResidual(widths, ws, ks, dtype=dtype))
            widths = list(ws)
        if bi < len(BLOCKS) - 1:
            pool = MgPool(widths, "concat" if is_concat else "plain")
            layers.append(pool)
            widths = pool.out_widths
    layers.append(LogSoftmaxClassifier(widths[0], n_classes, pool=7, dtype=dtype))
    return MgNet(layers)


class IlsvrcRnmgNet(NetSpec):
    name = "ilsvrc/rnmg"

    def arguments(self, parser):
        parser.add_argument("-depth", type=int, default=34, help="network depth (18|34)")

    def create_model(self, opt):
        return build_ilsvrc_rnmg(
            depth=getattr(opt, "depth", 34),
            dtype=getattr(opt, "compute_dtype", None),
        )

    def create_loss(self, opt):
        return nll_loss

    def train_rule(self, epoch, opt):
        return imagenet_rule(epoch)

    def train_metrics(self, outputs, labels, loss):
        return {
            "loss": loss,
            "top1": topk_accuracy(outputs, labels, 1),
            "top5": topk_accuracy(outputs, labels, 5),
        }


NET = IlsvrcRnmgNet()
