"""MG U-Net — multigrid encoder/decoder for cluttered-MNIST.

Rebuild of `/root/reference/models/mnist-cluttered/unmg.lua`: recursive
multigrid U-Net with blocks {{64,32,16},{128,64,32}drop,{256,128}drop,
{512}} (`unmg.lua:181-186`); per-level mgPool pools every kept scale and
drops the coarsest when flagged (`unmg.lua:131-148`); skip connections
zip the pre-pool pyramid with the (shorter) subnet output pyramid and
concat per scale — the reference's nn.ConcatUnet + MapTable(JoinTable)
(`layers/ConcatUnet.lua`, `unmg.lua:219-220`) collapses to a ragged
tuple zip here; mgUpConv is a per-scale 2x2/2 full-conv
(`unmg.lua:42-52`); head is a 1x1 no-ReLU mg-conv to nClass channels on
every scale, then scale 1 + Sigmoid (`unmg.lua:228-237`). All convs in
the ReLU path are 3x3 with BN eps 1e-3; the no-ReLU mg-conv uses 1x1
convs (`unmg.lua:22-33`). BCE loss; test adds meanIU@0.5."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from mgtpu.models.base import NetSpec, bce_loss, log_linear_rule
from mgtpu.nn import _as_rngs
from mgtpu.ops.mg import MgConv, MgConvInput, MgPool, MgUpConv
from mgtpu.utils.metrics import mnist_iu

BLOCKS = [
    ([64, 32, 16], False),
    ([128, 64, 32], True),
    ([256, 128], True),
    ([512], None),
]


def _cadd(a, b):
    n = max(len(a), len(b))
    return [
        (a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0) for i in range(n)
    ]


@dataclass
class _Level:
    depth: int  # 0-based
    in_widths: list
    n_class: int
    dtype: Optional[object] = None

    def __post_init__(self):
        ws, is_drop = BLOCKS[self.depth][0], BLOCKS[self.depth][1]
        ws = list(ws)
        self.out_widths = list(self.in_widths)
        if self.depth == len(BLOCKS) - 1:
            self.conv1 = MgConv(self.in_widths, ws, eps=1e-3, dtype=self.dtype)
            self.sub = None
            self.up = MgUpConv(ws, self.in_widths, dtype=self.dtype)
            return
        if self.depth == 0:
            self.conv1 = MgConvInput(ws, c_in=1, eps=1e-3, dtype=self.dtype)
        else:
            self.conv1 = MgConv(self.in_widths, ws, eps=1e-3, dtype=self.dtype)
        self.pool = MgPool(ws, "drop" if is_drop else "plain")
        self.sub = _Level(self.depth + 1, self.pool.out_widths, self.n_class, self.dtype)
        sum_w = _cadd(ws, self.sub.out_widths)
        self.conv2 = MgConv(sum_w, ws, eps=1e-3, dtype=self.dtype)
        if self.depth > 0:
            self.up = MgUpConv(ws, self.in_widths, dtype=self.dtype)
        else:
            n = len(ws)
            self.head = MgConv(
                ws, [self.n_class] * n, [1] * n, relu=False, eps=1e-3, dtype=self.dtype
            )

    def init(self, key):
        ks = jax.random.split(key, 4)
        p, s = {}, {}
        p["conv1"], s["conv1"] = self.conv1.init(ks[0])
        if self.sub is None:
            p["up"], s["up"] = self.up.init(ks[1])
            return p, s
        p["sub"], s["sub"] = self.sub.init(ks[1])
        p["conv2"], s["conv2"] = self.conv2.init(ks[2])
        if self.depth > 0:
            p["up"], s["up"] = self.up.init(ks[3])
        else:
            p["head"], s["head"] = self.head.init(ks[3])
        return p, s

    def apply(self, p, s, x, *, train=False, rng=None):
        rng = _as_rngs(rng)
        new_s = {}
        h, new_s["conv1"] = self.conv1.apply(p["conv1"], s["conv1"], x, train=train, rng=rng)
        if self.sub is None:
            y, new_s["up"] = self.up.apply(p["up"], s["up"], h, train=train)
            return y, new_s
        pooled, _ = self.pool.apply({}, {}, h, train=train)
        sub_out, new_s["sub"] = self.sub.apply(p["sub"], s["sub"], pooled, train=train, rng=rng)
        # ragged zip-concat (ConcatUnet + MapTable(JoinTable))
        joined = tuple(
            jnp.concatenate([hi, sub_out[i]], axis=-1) if i < len(sub_out) else hi
            for i, hi in enumerate(h)
        )
        h2, new_s["conv2"] = self.conv2.apply(p["conv2"], s["conv2"], joined, train=train, rng=rng)
        if self.depth > 0:
            y, new_s["up"] = self.up.apply(p["up"], s["up"], h2, train=train)
        else:
            y, new_s["head"] = self.head.apply(p["head"], s["head"], h2, train=train)
            y = jax.nn.sigmoid(y[0].astype(jnp.float32))
        return y, new_s


class UnmgModel:
    def __init__(self, n_class, dtype=None):
        self.root = _Level(0, [1, 1, 1], n_class, dtype)

    def init(self, key):
        return self.root.init(key)

    def apply(self, params, stats, x, *, train=False, rng=None):
        return self.root.apply(params, stats, x, train=train, rng=rng)


class UnmgNet(NetSpec):
    name = "mnist-cluttered/unmg"

    def create_model(self, opt):
        n_class = 10 if getattr(opt, "dataset", "") == "mnist-seg" else 1
        return UnmgModel(n_class, dtype=getattr(opt, "compute_dtype", None))

    def create_loss(self, opt):
        return bce_loss

    def train_rule(self, epoch, opt):
        return log_linear_rule(epoch, opt.nEpochs)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss}

    def test_metrics(self, outputs, labels, loss):
        return {"loss": loss, "meanIU": mnist_iu(outputs, labels, 0.5)}


NET = UnmgNet()
