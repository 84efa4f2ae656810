"""P-NMG for cluttered-MNIST segmentation / spatial transform.

Rebuild of `/root/reference/models/mnist-cluttered/pnmg.mnist.lua`:
7 blocks of mg-convs at constant 64px resolution (no pooling), 4 grids
{64,32,16,8} narrowing to 3/2/1 grids by *dropping* the coarsest inside
the first layer of blocks 5-7 (ResampleConcat isDrop,
`pnmg.mnist.lua:33-39,227-235`); block 1 is the pyramid prefix
(MultiGridsInput); the final layer is Conv-BN without ReLU
(mgConvOutput) -> scale 1 -> Sigmoid (`pnmg.mnist.lua:211-219,254-255`).
All convs 3x3, BN eps 1e-3. BCE loss, log-linear LR rule."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, bce_loss, log_linear_rule
from mgtpu.models.common import MgNet, SigmoidHead, build_pyramid_prefix
from mgtpu.ops.mg import DropCoarsest, MgConv

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
    layers = build_pyramid_prefix(BLOCKS4, n_layer, residual=False, eps=1e-3, c_in=1, dtype=dtype)
    widths = list(BLOCKS4)
    for bi in range(1, len(plan)):
        ws, is_drop = plan[bi]
        last_block = bi == len(plan) - 1
        for li in range(n_layer):
            if li == 0 and is_drop:
                drop = DropCoarsest(widths)
                layers.append(drop)
                widths = drop.out_widths
            relu = not (last_block and li == n_layer - 1)  # mgConvOutput
            layers.append(MgConv(widths, list(ws), relu=relu, eps=1e-3, dtype=dtype))
            widths = list(ws)
    layers.append(SigmoidHead(0))
    return MgNet(layers)


class PnmgMnistNet(NetSpec):
    name = "mnist-cluttered/pnmg.mnist"

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
        return log_linear_rule(epoch, opt.nEpochs)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss}


NET = PnmgMnistNet()
