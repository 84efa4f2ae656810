"""U-Net baseline for cluttered-MNIST segmentation / spatial transform.

Rebuild of `/root/reference/models/mnist-cluttered/unet.lua`: recursive
U-Net, widths {64,128,256,512} (`unet.lua:30`), 2x2/2 full-conv up-convs
(`unet.lua:24-28`), floor-mode 2x2 maxpool between levels, head 1x1
conv -> BN -> Sigmoid with 10 channels (mnist-seg) or 1 (`unet.lua:64-66,73`).
BCE loss, log-linear LR rule."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from mgtpu.models.base import NetSpec, bce_loss, log_linear_rule
from mgtpu.nn import ConvBN, UpConvBN, _as_rngs
from mgtpu.ops.resample import maxpool

BLOCKS = [64, 128, 256, 512]


@dataclass
class _Level:
    depth: int  # 0-based
    c_in: int
    n_class: int
    dtype: Optional[object] = None

    def __post_init__(self):
        c = BLOCKS[self.depth]
        self.c = c
        self.conv1 = ConvBN(self.c_in, c, 3, relu=True, eps=1e-3, dtype=self.dtype)
        if self.depth == len(BLOCKS) - 1:
            self.sub = None
            self.up = UpConvBN(c, self.c_in, dtype=self.dtype)
        else:
            self.sub = _Level(self.depth + 1, c, self.n_class, self.dtype)
            self.conv2 = ConvBN(c + self.sub.c_in, c, 3, relu=True, eps=1e-3, dtype=self.dtype)
            if self.depth > 0:
                self.up = UpConvBN(c, self.c_in, dtype=self.dtype)
            else:
                self.head = ConvBN(c, self.n_class, 1, relu=False, eps=1e-3, dtype=self.dtype)

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
        sub_in = maxpool(h, 2, 2, 0)  # floor mode (`unet.lua:51`)
        sub_out, new_s["sub"] = self.sub.apply(p["sub"], s["sub"], sub_in, train=train, rng=rng)
        j = jnp.concatenate([h, sub_out], axis=-1)
        h2, new_s["conv2"] = self.conv2.apply(p["conv2"], s["conv2"], j, train=train, rng=rng)
        if self.depth > 0:
            y, new_s["up"] = self.up.apply(p["up"], s["up"], h2, train=train)
        else:
            y, new_s["head"] = self.head.apply(p["head"], s["head"], h2, train=train)
            y = jax.nn.sigmoid(y.astype(jnp.float32))
        return y, new_s


class UnetModel:
    def __init__(self, n_class, dtype=None):
        self.root = _Level(0, 1, n_class, dtype)

    def init(self, key):
        return self.root.init(key)

    def apply(self, params, stats, x, *, train=False, rng=None):
        return self.root.apply(params, stats, x, train=train, rng=rng)


class UnetNet(NetSpec):
    name = "mnist-cluttered/unet"

    def create_model(self, opt):
        n_class = 10 if getattr(opt, "dataset", "") == "mnist-seg" else 1
        return UnetModel(n_class, dtype=getattr(opt, "compute_dtype", None))

    def create_loss(self, opt):
        return bce_loss

    def train_rule(self, epoch, opt):
        return log_linear_rule(epoch, opt.nEpochs)

    def train_metrics(self, outputs, labels, loss):
        return {"loss": loss}


NET = UnetNet()
