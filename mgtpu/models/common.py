"""Shared model assembly helpers for the multigrid zoo.

The reference re-implements mgConv/mgPool/etc. per model file with small
variations (SURVEY §2.4); here the zoo collapses to declarative block
plans over the ops in `mgtpu.ops.mg` plus the heads below.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mgtpu.nn import ConvBN, Dense, Dropout, Sequential, _as_rngs
from mgtpu.ops.mg import (
    MgConv,
    MgConvInput,
    MgPool,
    MgResidual,
)
from mgtpu.ops.resample import avgpool, maxpool, maxpool2_ceil


@dataclass
class LogSoftmaxClassifier:
    """SelectTable(1) -> [AvgPool a x a] -> View -> Linear -> LogSoftMax
    (`models/cifar/nmg.lua:189-194`; ImageNet adds Avg(7,7),
    `models/ilsvrc/rnmg.lua:280-286`)."""

    c_in: int
    n_classes: int
    pool: int = 0  # 0 = none (spatial already 1x1)
    dtype: Optional[object] = None
    scale: int = 0  # which pyramid scale feeds the head (-1 = coarsest)

    def __post_init__(self):
        self.dense = Dense(self.c_in, self.n_classes, dtype=self.dtype)

    def init(self, key):
        return self.dense.init(key)

    def apply(self, p, s, pyr, *, train=False, rng=None):
        x = pyr[self.scale]
        if self.pool:
            x = avgpool(x, self.pool, 1)
        x = x.reshape(x.shape[0], -1)
        y, s = self.dense.apply(p, s, x, train=train)
        # log-probs in f32: bf16 mantissa loses confident log-probs and
        # the NLL batch mean (same rationale as SigmoidHead/ten-crop)
        return jax.nn.log_softmax(y.astype(jnp.float32), axis=-1), s


@dataclass
class SigmoidHead:
    """SelectTable(i) -> Sigmoid for the segmentation/spatial-transform
    models (`models/mnist-cluttered/unmg.lua:228-237`)."""

    scale: int = 0

    def init(self, key):
        return {}, {}

    def apply(self, p, s, pyr, *, train=False, rng=None):
        x = pyr[self.scale] if isinstance(pyr, tuple) else pyr
        return jax.nn.sigmoid(x.astype(jnp.float32)), s


@dataclass
class Pool2:
    """Single-array 2x2/2 max pool (ceil or floor mode) for the VGG /
    ResNet / U-Net baselines (`models/cifar/vgg.lua:38`,
    `models/mnist-cluttered/unet.lua:51`)."""

    ceil: bool = True

    def init(self, key):
        return {}, {}

    def apply(self, p, s, x, *, train=False, rng=None):
        return (maxpool2_ceil(x) if self.ceil else maxpool(x, 2, 2, 0)), s


@dataclass
class ResBlock:
    """Single-grid residual block (`models/cifar/resnet.lua:27-47`,
    `prnmg.lua:102-120` resConv): [drop] ConvBNReLU [drop] ConvBN +
    {zero-pad | identity | 1x1-ConvBN(narrowing)} shortcut, ReLU."""

    c_in: int
    c_out: int
    k: int = 3
    dropout: float = 0.0
    eps: float = 1e-5
    dtype: Optional[object] = None
    # "" = legacy (1x1 ConvBN only when narrowing, zero-pad widen,
    # identity otherwise — resnet.lua:17-24 / prnmg.lua:102-120);
    # "C" = 1x1 ConvBN shortcut ALWAYS (the reference passes
    # shortcutType into the prefix resConv, `prnmgseg.lua:318`)
    shortcut_type: str = ""

    def __post_init__(self):
        self.conv1 = ConvBN(
            self.c_in, self.c_out, self.k, relu=True, eps=self.eps,
            dropout=self.dropout, dropout_pos="before", dtype=self.dtype,
        )
        self.conv2 = ConvBN(
            self.c_out, self.c_out, self.k, relu=False, eps=self.eps,
            dropout=self.dropout, dropout_pos="before", dtype=self.dtype,
        )
        self.shortcut = (
            ConvBN(self.c_in, self.c_out, 1, relu=False, eps=self.eps, dtype=self.dtype)
            if (self.c_in > self.c_out or self.shortcut_type == "C")
            else None
        )

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p1, s1 = self.conv1.init(k1)
        p2, s2 = self.conv2.init(k2)
        p, s = {"c1": p1, "c2": p2}, {"c1": s1, "c2": s2}
        if self.shortcut is not None:
            p["sc"], s["sc"] = self.shortcut.init(k3)
        return p, s

    def apply(self, p, s, x, *, train=False, rng=None):
        rng = _as_rngs(rng)
        h, n1 = self.conv1.apply(p["c1"], s["c1"], x, train=train, rng=rng)
        h, n2 = self.conv2.apply(p["c2"], s["c2"], h, train=train, rng=rng)
        new_s = {"c1": n1, "c2": n2}
        if self.shortcut is not None:
            short, new_s["sc"] = self.shortcut.apply(p["sc"], s["sc"], x, train=train)
        elif self.c_in == self.c_out:
            short = x
        else:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, self.c_out - self.c_in)]
            short = jnp.pad(x, pad)
        return jax.nn.relu(h + short.astype(h.dtype)), new_s


@dataclass
class FlatClassifier:
    """View -> Linear -> LogSoftMax on a single array whose spatial is
    1x1 (`models/cifar/vgg.lua:54-57`)."""

    c_in: int
    n_classes: int
    dtype: Optional[object] = None

    def __post_init__(self):
        self.dense = Dense(self.c_in, self.n_classes, dtype=self.dtype)

    def init(self, key):
        return self.dense.init(key)

    def apply(self, p, s, x, *, train=False, rng=None):
        x = x.reshape(x.shape[0], -1)
        y, s = self.dense.apply(p, s, x, train=train)
        # log-probs in f32: bf16 mantissa loses confident log-probs and
        # the NLL batch mean (same rationale as SigmoidHead/ten-crop)
        return jax.nn.log_softmax(y.astype(jnp.float32), axis=-1), s


class MgNet:
    """A pyramid-in / anything-out network: stem takes the image,
    body blocks map pyramid->pyramid, head maps pyramid->output."""

    def __init__(self, blocks):
        self.seq = Sequential(blocks)

    @property
    def blocks(self):
        return self.seq.layers

    def init(self, key):
        return self.seq.init(key)

    def apply(self, params, stats, x, *, train=False, rng=None):
        return self.seq.apply(params, stats, x, train=train, rng=rng)


def build_plain_mg(
    blocks: Sequence[tuple],
    n_layer: int,
    n_classes: int,
    dropouts: Optional[Sequence[Optional[float]]] = None,
    eps: float = 1e-3,
    dropout_pos: str = "after",
    dtype=None,
):
    """The nmg assembly loop (`models/cifar/nmg.lua:158-180`): per block,
    n_layer (mg-conv) layers — block 1 layer 1 is the input pyramid —
    then an mgPool (concat-mode when the block's last kernel is 1)."""
    layers = []
    widths = None
    for bi, (ws, ks) in enumerate(blocks):
        dr = (dropouts[bi] if dropouts else None) or 0.0
        for li in range(n_layer):
            if bi == 0 and li == 0:
                layers.append(
                    MgConvInput(ws, eps=eps, dropout=dr, dropout_pos=dropout_pos, dtype=dtype)
                )
            else:
                layers.append(
                    MgConv(
                        widths, ws, ks, eps=eps, dropout=dr, dropout_pos=dropout_pos, dtype=dtype
                    )
                )
            widths = list(ws)
        pool = MgPool(widths, "concat" if ks[-1] == 1 else "plain")
        layers.append(pool)
        widths = pool.out_widths
    layers.append(LogSoftmaxClassifier(widths[0], n_classes, dtype=dtype))
    return MgNet(layers)


def build_residual_mg(
    blocks: Sequence[tuple],
    n_layer: int,
    n_classes: int,
    dropouts: Optional[Sequence[Optional[float]]] = None,
    eps: float = 1e-5,
    dtype=None,
):
    """The rnmg assembly loop (`models/cifar/rnmg.lua:298-335`): block 1
    layer 1 is the residual input block (pyramid stem + one residual
    layer at constant width); later layers are mg-residual; pool after
    each block (concat when last kernel is 1)."""
    layers = []
    widths = None
    for bi, (ws, ks) in enumerate(blocks):
        dr = (dropouts[bi] if dropouts else None) or 0.0
        for li in range(n_layer):
            if bi == 0 and li == 0:
                layers.append(MgConvInput(ws, eps=eps, dtype=dtype))
                layers.append(MgResidual(ws, ws, [3] * len(ws), eps=eps, dropout=dr, dtype=dtype))
            else:
                layers.append(MgResidual(widths, ws, ks, eps=eps, dropout=dr, dtype=dtype))
            widths = list(ws)
        pool = MgPool(widths, "concat" if ks[-1] == 1 else "plain")
        layers.append(pool)
        widths = pool.out_widths
    layers.append(LogSoftmaxClassifier(widths[0], n_classes, dtype=dtype))
    return MgNet(layers)


def build_pyramid_prefix(
    widths: Sequence[int],
    n_layer: int,
    residual: bool = False,
    eps: float = 1e-3,
    c_in: int = 3,
    dtype=None,
):
    """The P-* models' progressive grid introduction (MultiGridsInput,
    `models/cifar/pnmg.lua:177-228`, `prnmg.lua:258-307`): after the
    input pyramid, first process only the coarsest grid (plain conv or
    resConv), then mg-conv over the 2 coarsest, ... then all grids, each
    stage n_layer deep, finer grids passing through untouched."""
    from mgtpu.ops.mg import PerScale, TailOp

    n = len(widths)
    layers = [MgConvInput(widths, c_in=c_in, eps=eps, dtype=dtype)]
    for n_grid in range(1, n + 1):
        for _ in range(n_layer):
            if n_grid == 1:
                unit = (
                    ResBlock(widths[-1], widths[-1], eps=eps, dtype=dtype)
                    if residual
                    else ConvBN(widths[-1], widths[-1], 3, relu=True, eps=eps, dtype=dtype)
                )
                layers.append(PerScale([None] * (n - 1) + [unit]))
            else:
                tail = list(widths[n - n_grid :])
                op = (
                    MgResidual(tail, tail, [3] * n_grid, eps=eps, dtype=dtype)
                    if residual
                    else MgConv(tail, tail, [3] * n_grid, eps=eps, dtype=dtype)
                )
                layers.append(TailOp(n - n_grid, op, list(widths)))
    return layers


# (MAC/param counting lives in tools/model_info.py, which walks the
# jaxpr with dimension-number awareness and sub-jaxpr recursion.)
