"""PR-NMG for cluttered-MNIST segmentation / spatial transform.

Rebuild of `/root/reference/models/mnist-cluttered/prnmg.mnist.lua`:
the residual version of pnmg.mnist — same 7-block constant-resolution
plan with grid drops, residual mg-convs (two-stage + per-scale
shortcut; narrowing shortcut is 1x1 Conv-BN, `prnmg.mnist.lua:13-25`),
pyramid prefix with resConv on the coarsest grid; the output block's
last layer uses kernel 1 and no final ReLU (isOut,
`prnmg.mnist.lua:263-272`) -> scale 1 -> Sigmoid. BN default eps.
BCE loss, step LR 0.1 x 0.2^#{e>=60,120,160}."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, bce_loss, step_rule
from mgtpu.models.common import MgNet, SigmoidHead, build_pyramid_prefix
from mgtpu.ops.mg import DropCoarsest, MgResidual

BLOCKS4 = [64, 32, 16, 8]


def build(n_layer, n_class, dtype=None):
    plan = [
        (BLOCKS4, False),
        (BLOCKS4, False),
        (BLOCKS4, False),
        (BLOCKS4, False),
        ([64, 32, 16], True),
        ([64, 32], True),
        ([n_class], True),
    ]
    layers = build_pyramid_prefix(BLOCKS4, n_layer, residual=True, eps=1e-5, c_in=1, dtype=dtype)
    widths = list(BLOCKS4)
    for bi in range(1, len(plan)):
        ws, is_drop = plan[bi]
        last_block = bi == len(plan) - 1
        for li in range(n_layer):
            if li == 0 and is_drop:
                drop = DropCoarsest(widths)
                layers.append(drop)
                widths = drop.out_widths
            is_out = last_block and li == n_layer - 1
            k = 1 if is_out else 3
            layers.append(
                MgResidual(
                    widths,
                    list(ws),
                    [k] * len(ws),
                    final_relu=not is_out,
                    dtype=dtype,
                )
            )
            widths = list(ws)
    layers.append(SigmoidHead(0))
    return MgNet(layers)


class PrnmgMnistNet(NetSpec):
    name = "mnist-cluttered/prnmg.mnist"

    def arguments(self, parser):
        parser.add_argument("-nLayer", type=int, default=1, help="number of layers per block")

    def create_model(self, opt):
        n_class = 10 if getattr(opt, "dataset", "") == "mnist-seg" else 1
        return build(
            getattr(opt, "nLayer", 1), n_class, dtype=getattr(opt, "compute_dtype", None)
        )

    def create_loss(self, opt):
        return bce_loss

    def train_rule(self, epoch, opt):
        return step_rule(epoch)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss}


NET = PrnmgMnistNet()
