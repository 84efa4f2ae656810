"""P-NMG — pyramid-prefix plain multigrid CNN for CIFAR.

Rebuild of `/root/reference/models/cifar/pnmg.lua`: channel plan
`pnmg.lua:243-249`, progressive grid introduction in block 1
(MultiGridsInput, `pnmg.lua:177-228`), mg-conv blocks with dropout
*before* each conv ({-,.1,.2,.3,.4} per block behind `-isDropout`,
`pnmg.lua:21-32,250-258`), mgPool after every block, BN eps 1e-3,
log-linear LR rule."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, log_linear_rule, nll_loss
from mgtpu.models.common import LogSoftmaxClassifier, MgNet, build_pyramid_prefix
from mgtpu.ops.mg import MgConv, MgPool
from mgtpu.utils.metrics import topk_accuracy

BLOCKS = [
    ([64, 32, 16], [3, 3, 3]),
    ([128, 64, 32], [3, 3, 3]),
    ([256, 128, 64], [3, 3, 3]),
    ([512, 256, 128], [3, 3, 1]),
    ([512, 384], [3, 1]),
]
DROPOUTS = [None, 0.1, 0.2, 0.3, 0.4]


def build(n_layer, n_classes, dropouts=None, dtype=None, residual=False):
    from mgtpu.ops.mg import MgResidual

    eps = 1e-5 if residual else 1e-3
    layers = []
    widths = None
    for bi, (ws, ks) in enumerate(BLOCKS):
        dr = (dropouts[bi] if dropouts else None) or 0.0
        if bi == 0:
            layers += build_pyramid_prefix(ws, n_layer, residual=residual, eps=eps, dtype=dtype)
        else:
            for _ in range(n_layer):
                if residual:
                    layers.append(MgResidual(widths, ws, ks, eps=eps, dropout=dr, dtype=dtype))
                else:
                    layers.append(
                        MgConv(widths, ws, ks, eps=eps, dropout=dr, dropout_pos="before", dtype=dtype)
                    )
                widths = list(ws)
        widths = list(ws)  # prefix branch: widths chain to this block's plan
        pool = MgPool(widths, "concat" if ks[-1] == 1 else "plain")
        layers.append(pool)
        widths = pool.out_widths
    layers.append(LogSoftmaxClassifier(widths[0], n_classes, dtype=dtype))
    return MgNet(layers)


class PnmgNet(NetSpec):
    name = "cifar/pnmg"

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
        return log_linear_rule(epoch, opt.nEpochs)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss, "top1": topk_accuracy(outputs, labels, 1)}


NET = PnmgNet()
