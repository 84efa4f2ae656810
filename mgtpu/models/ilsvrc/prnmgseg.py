"""PR-MG-30/52 — 4-grid segmentation-ready residual multigrid for ImageNet.

Rebuild of `/root/reference/models/ilsvrc/prnmgseg.lua`: 7x7/2+pool stem
over 4 grids {64,32,16,8} at (56,28,14,7) (`prnmgseg.lua:185-205,356`),
pyramid prefix whose stages overwrite the tail widths to the stage's
leading width — {64,32,16,8} -> {...,16,16} -> {..,32,32,32} ->
{64,64,64,64} (`prnmgseg.lua:294-300`) — then residual mg-conv blocks
{64,64,64,128} -> {64,64,128,256} -> {64,128,256,512} with NO
inter-block pooling (`prnmgseg.lua:354-360`); `-shortcutType A|B|C`
(`prnmgseg.lua:34-49`); classifier on scale 4: Avg7x7 -> Linear(512,1000)
(`prnmgseg.lua:380-385`). Depth cfg 30={2,2,2,2}, 52={3,4,6,3}.

Note: the reference file as committed cannot load (trailing comma at
`prnmgseg.lua:303`); this rebuild implements the evident intent of
passing shortcutType through."""

from __future__ import annotations

from mgtpu.models.base import NetSpec, imagenet_rule, nll_loss
from mgtpu.models.common import LogSoftmaxClassifier, MgNet, ResBlock
from mgtpu.ops.mg import MgResidual, MgStem7x7, PerScale, TailOp
from mgtpu.utils.metrics import topk_accuracy

STEM = [64, 32, 16, 8]
CFG = {30: [2, 2, 2, 2], 52: [3, 4, 6, 3]}
BLOCKS = [
    ([64, 32, 16, 8], [3, 3, 3, 3]),  # prefix block (widths overwritten)
    ([64, 64, 64, 128], [3, 3, 3, 3]),
    ([64, 64, 128, 256], [3, 3, 3, 3]),
    ([64, 128, 256, 512], [3, 3, 3, 3]),
]


def build(depth: int = 30, shortcut_type: str = "A", n_classes: int = 1000, dtype=None):
    n = len(STEM)
    layers = [MgStem7x7(STEM, dtype=dtype)]
    widths = list(STEM)
    # pyramid prefix with tail-width overwrite (`prnmgseg.lua:280-323`)
    n_layer = CFG[depth][0]
    for n_grid in range(1, n + 1):
        for _ in range(n_layer):
            if n_grid == 1:
                layers.append(
                    PerScale(
                        [None] * (n - 1)
                        + [ResBlock(
                            widths[-1], widths[-1], dtype=dtype,
                            # the reference forwards shortcutType into
                            # the prefix resConv (`prnmgseg.lua:318`):
                            # type C gives 1x1 ConvBN even same-width
                            shortcut_type="C" if shortcut_type == "C" else "",
                        )]
                    )
                )
            else:
                lead = widths[n - n_grid]
                tail_in = widths[n - n_grid :]
                tail_out = [lead] * n_grid
                layers.append(
                    TailOp(
                        n - n_grid,
                        MgResidual(tail_in, tail_out, [3] * n_grid,
                                   shortcut_type=shortcut_type, dtype=dtype),
                        list(widths),
                    )
                )
                widths = widths[: n - n_grid] + tail_out
    for bi in range(1, len(BLOCKS)):
        ws, ks = BLOCKS[bi]
        for _ in range(CFG[depth][bi]):
            layers.append(
                MgResidual(widths, ws, ks, shortcut_type=shortcut_type, dtype=dtype)
            )
            widths = list(ws)
    # classifier reads the COARSEST scale (SelectTable(4),
    # `prnmgseg.lua:380-385`)
    layers.append(LogSoftmaxClassifier(widths[-1], n_classes, pool=7,
                                       dtype=dtype, scale=-1))
    return MgNet(layers)


class PrnmgsegNet(NetSpec):
    name = "ilsvrc/prnmgseg"

    def arguments(self, parser):
        parser.add_argument("-depth", type=int, default=30, help="network depth (30|52)")
        parser.add_argument(
            "-shortcutType", type=str, default="B", help="residual shortcut type (A|B|C)"
        )

    def create_model(self, opt):
        return build(
            depth=getattr(opt, "depth", 30),
            shortcut_type=getattr(opt, "shortcutType", "B"),
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


NET = PrnmgsegNet()
