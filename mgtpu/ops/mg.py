"""Multigrid ops on feature pyramids.

A pyramid is a tuple of NHWC arrays, finest scale first; scale i+1 has
half the spatial extent of scale i. These ops are the JAX-native
re-design of the reference's nn-container graphs
(`/root/reference/models/cifar/nmg.lua`, `rnmg.lua`, `pnmg.lua`,
`models/ilsvrc/rnmg.lua`, `models/mnist-cluttered/unmg.lua`): what Torch
expressed as 40+ ConcatTable/SelectTable/JoinTable nodes per layer is
here one pure function per op, which XLA fuses aggressively.

Channel arithmetic is explicit: every block exposes ``out_widths`` so a
model is just a declarative plan of blocks whose widths chain.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mgtpu.nn import ConvBN, UpConvBN, Dropout, _as_rngs
from mgtpu.ops.resample import avgpool, maxpool, maxpool2_ceil, upsample_nearest2
from mgtpu.parallel.mesh import constrain_pyramid

# MGTPU_NO_FUSED_EXCHANGE=1 forces the materialized resample-concat
# formulation everywhere — used by tools/model_info.py to count the
# reference-formulation MACs, and handy for numerics bisection.
# Read at IMPORT time by design: ops capture fuse_exchange when they
# are constructed, so the var must be set before importing/building a
# model (e.g. via a subprocess env, as model_info.py does).
_NO_FUSE = bool(os.environ.get("MGTPU_NO_FUSED_EXCHANGE"))

Pyramid = tuple


def pyramid_widths_after_exchange(widths: Sequence[int]) -> list[int]:
    """Channel counts after resample_concat: c[i-1] + c[i] + c[i+1]
    (reference ResampleConcat, `models/cifar/pnmg.lua:34-82`)."""
    n = len(widths)
    out = []
    for i in range(n):
        c = widths[i]
        if i > 0:
            c += widths[i - 1]
        if i + 1 < n:
            c += widths[i + 1]
        out.append(c)
    return out


def resample_concat(pyr: Pyramid) -> Pyramid:
    """THE multigrid primitive: for each scale gather
    {maxpool2(finer), identity(self), nearest-up2(coarser)} and concat on
    channels, in that order (matches the reference's JoinTable order,
    `models/cifar/nmg.lua:47-85`)."""
    n = len(pyr)
    out = []
    for i in range(n):
        parts = []
        if i > 0:
            parts.append(maxpool2_ceil(pyr[i - 1]))
        parts.append(pyr[i])
        if i + 1 < n:
            h, w = pyr[i].shape[1], pyr[i].shape[2]
            parts.append(upsample_nearest2(pyr[i + 1], h, w))
        out.append(jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0])
    return tuple(out)


def exchange_parts(pyr: Pyramid, i: int):
    """The i-th scale's resample-concat inputs as a LIST of
    ``(kind, tensor)`` without concatenating — consumed by
    ConvBN.apply_parts for the fused-exchange path (split-weight
    convolution). The coarser neighbour is passed RAW (kind="up") so the
    consumer can fold the nearest-upsample into its convolution
    (stride-2 dilated conv; see ConvBN.apply_parts) instead of
    materializing the 2x tensor."""
    n = len(pyr)
    parts = []
    if i > 0:
        parts.append(("down", maxpool2_ceil(pyr[i - 1])))
    parts.append(("same", pyr[i]))
    if i + 1 < n:
        parts.append(("up", pyr[i + 1]))
    return parts


def materialize_part(kind: str, xp, oh: int, ow: int):
    """Resolve an exchange part to its fine-resolution tensor."""
    if kind == "up":
        return upsample_nearest2(xp, oh, ow)
    return xp


def _split_keys(key, n):
    return jax.random.split(key, n) if n > 0 else []


def _init_layers(layers, key):
    """Init a list of per-scale layers (None = identity) into
    params/stats dicts keyed '0','1',... — the shared pattern of every
    multi-scale op below."""
    params, stats = {}, {}
    for i, (layer, k) in enumerate(zip(layers, _split_keys(key, len(layers)))):
        if layer is None:
            params[str(i)], stats[str(i)] = {}, {}
        else:
            params[str(i)], stats[str(i)] = layer.init(k)
    return params, stats


@dataclass
class MgConvInput:
    """Input pyramid stem: scale i = avgpool(2^i) of the image followed
    by ConvBNReLU (`models/cifar/nmg.lua:88-106`)."""

    widths: Sequence[int]
    c_in: int = 3
    k: int = 3
    eps: float = 1e-5
    dropout: float = 0.0
    dropout_pos: str = "after"
    dtype: Optional[object] = None

    def __post_init__(self):
        self.convs = [
            ConvBN(
                self.c_in,
                w,
                self.k,
                relu=True,
                eps=self.eps,
                dropout=self.dropout,
                dropout_pos=self.dropout_pos,
                dtype=self.dtype,
            )
            for w in self.widths
        ]
        self.out_widths = list(self.widths)

    def init(self, key):
        return _init_layers(self.convs, key)

    def apply(self, p, s, x, *, train=False, rng=None):
        rng = _as_rngs(rng)
        out, new_s = [], {}
        xi = x
        for i, conv in enumerate(self.convs):
            if i > 0:  # progressive: avgpool2 of the previous scale ==
                xi = avgpool(xi, 2)  # avgpool(2^i) of x, at 1/4 the bytes
            y, new_s[str(i)] = conv.apply(p[str(i)], s[str(i)], xi, train=train, rng=rng)
            out.append(y)
        return constrain_pyramid(out), new_s


@dataclass
class MgStem7x7:
    """ImageNet input stem: per scale, avgpool(2^i) -> Conv7x7/2 pad3 ->
    BN -> ReLU -> MaxPool3x3/2 pad1 (`models/ilsvrc/rnmg.lua:161-189`).
    224 -> 56/28/14."""

    widths: Sequence[int]
    c_in: int = 3
    eps: float = 1e-5
    dtype: Optional[object] = None

    def __post_init__(self):
        self.convs = [
            ConvBN(self.c_in, w, k=7, stride=2, relu=True, eps=self.eps, dtype=self.dtype)
            for w in self.widths
        ]
        for c in self.convs:
            c.conv.pad = 3
        self.out_widths = list(self.widths)

    def init(self, key):
        return _init_layers(self.convs, key)

    def apply(self, p, s, x, *, train=False, rng=None):
        out, new_s = [], {}
        xi = x
        for i, conv in enumerate(self.convs):
            if i > 0:  # progressive dyadic pyramid (== avgpool(2^i) of x)
                xi = avgpool(xi, 2)
            y, new_s[str(i)] = conv.apply(p[str(i)], s[str(i)], xi, train=train)
            out.append(maxpool(y, 3, 2, 1))
        return constrain_pyramid(out), new_s


@dataclass
class MgConv:
    """Plain multigrid conv layer: resample_concat -> per-scale
    ConvBN[ReLU] (`models/cifar/nmg.lua:31-86`)."""

    in_widths: Sequence[int]
    out_widths_: Sequence[int]
    kernels: Optional[Sequence[int]] = None
    relu: bool = True
    eps: float = 1e-5
    dropout: float = 0.0
    dropout_pos: str = "after"
    fuse_exchange: bool = True
    dtype: Optional[object] = None

    def __post_init__(self):
        if _NO_FUSE:
            self.fuse_exchange = False
        n = len(self.in_widths)
        assert len(self.out_widths_) == n
        ks = self.kernels if self.kernels is not None else [3] * n
        mixed = pyramid_widths_after_exchange(self.in_widths)
        self.convs = [
            ConvBN(
                mixed[i],
                self.out_widths_[i],
                ks[i],
                relu=self.relu,
                eps=self.eps,
                dropout=self.dropout,
                dropout_pos=self.dropout_pos,
                dtype=self.dtype,
            )
            for i in range(n)
        ]
        self.out_widths = list(self.out_widths_)

    def init(self, key):
        return _init_layers(self.convs, key)

    def apply(self, p, s, pyr, *, train=False, rng=None):
        rng = _as_rngs(rng)
        out, new_s = [], {}
        if self.fuse_exchange:
            for i, conv in enumerate(self.convs):
                y, new_s[str(i)] = conv.apply_parts(
                    p[str(i)], s[str(i)], exchange_parts(pyr, i), train=train, rng=rng
                )
                out.append(y)
        else:
            mixed = resample_concat(pyr)
            for i, conv in enumerate(self.convs):
                y, new_s[str(i)] = conv.apply(
                    p[str(i)], s[str(i)], mixed[i], train=train, rng=rng
                )
                out.append(y)
        return constrain_pyramid(out), new_s


@dataclass
class DropCoarsest:
    """Discard the coarsest grid without pooling — the in-layer drop of
    `ResampleConcat(nIPs, isDrop)` in the mnist P-models
    (`models/mnist-cluttered/pnmg.mnist.lua:33-39`): the dropped grid's
    features do not contribute to any kept scale."""

    widths: Sequence[int]

    def __post_init__(self):
        self.out_widths = list(self.widths)[:-1]

    def init(self, key):
        return {}, {}

    def apply(self, p, s, pyr, *, train=False, rng=None):
        return pyr[:-1], s


@dataclass
class TailOp:
    """Pass the first ``n_pass`` scales through untouched and apply
    ``op`` to the remaining (coarser) scales — the SelectTable +
    FlattenTable plumbing of the pyramid prefix in P-* models
    (`models/cifar/pnmg.lua:177-228`)."""

    n_pass: int
    op: object
    widths: Sequence[int]

    def __post_init__(self):
        self.out_widths = list(self.widths[: self.n_pass]) + list(self.op.out_widths)

    def init(self, key):
        return self.op.init(key)

    def apply(self, p, s, pyr, *, train=False, rng=None):
        head = pyr[: self.n_pass]
        tail, new_s = self.op.apply(p, s, pyr[self.n_pass :], train=train, rng=rng)
        return tuple(head) + tuple(tail), new_s


@dataclass
class MgResidual:
    """Residual multigrid layer (`models/cifar/rnmg.lua:102-173`,
    `models/ilsvrc/rnmg.lua:91-159`):

        y = relu( shortcut(x) + ConvBN(rc( ConvBNReLU(rc(x)) )) )

    with rc = resample_concat, all per-scale. Dropout (when enabled) is
    applied to the concatenated features after each rc, before the conv
    (`rnmg.lua:91-100,125,136`).

    Shortcut types (`-shortcutType`, `models/ilsvrc/prnmgseg.lua:34-49`):
      A: zero-pad channels when widening / identity (default)
      B: 1x1 ConvBN when widths differ, identity otherwise
      C: 1x1 ConvBN always
    Narrowing with type A uses a 1x1 ConvBN (the zero-pad trick cannot
    narrow; matches `prnmg.mnist.lua:13-25`).
    """

    in_widths: Sequence[int]
    out_widths_: Sequence[int]
    kernels: Optional[Sequence[int]] = None
    eps: float = 1e-5
    dropout: float = 0.0
    shortcut_type: str = "A"
    final_relu: bool = True  # isOut variant skips it (`prnmg.mnist.lua:168`)
    fuse_exchange: bool = True
    dtype: Optional[object] = None

    def __post_init__(self):
        if _NO_FUSE:
            self.fuse_exchange = False
        n = len(self.in_widths)
        assert len(self.out_widths_) == n
        ks = self.kernels if self.kernels is not None else [3] * n
        mixed1 = pyramid_widths_after_exchange(self.in_widths)
        mixed2 = pyramid_widths_after_exchange(self.out_widths_)
        self.stage1 = [
            ConvBN(mixed1[i], self.out_widths_[i], ks[i], relu=True, eps=self.eps, dtype=self.dtype)
            for i in range(n)
        ]
        self.stage2 = [
            ConvBN(mixed2[i], self.out_widths_[i], ks[i], relu=False, eps=self.eps, dtype=self.dtype)
            for i in range(n)
        ]
        self.shortcuts = []
        for cin, cout in zip(self.in_widths, self.out_widths_):
            if self.shortcut_type == "C" or (
                cin != cout and (self.shortcut_type == "B" or cin > cout)
            ):
                self.shortcuts.append(
                    ConvBN(cin, cout, k=1, relu=False, eps=self.eps, dtype=self.dtype)
                )
            else:
                self.shortcuts.append(None)  # identity or zero-pad
        self.drop = Dropout(self.dropout) if self.dropout > 0 else None
        self.out_widths = list(self.out_widths_)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        params, stats = {}, {}
        for name, layers, kk in (
            ("s1", self.stage1, k1),
            ("s2", self.stage2, k2),
            ("sc", self.shortcuts, k3),
        ):
            params[name], stats[name] = _init_layers(layers, kk)
        return params, stats

    def _stage(self, name, layers, p, s, pyr, train, rng):
        out, new_s = [], {}
        if self.fuse_exchange:
            for i, layer in enumerate(layers):
                parts = exchange_parts(pyr, i)
                if self.drop is not None and train:
                    # dropout masks live at fine resolution
                    # (`rnmg.lua:91-100`): materialize the up part first
                    oh, ow = pyr[i].shape[1], pyr[i].shape[2]
                    parts = [
                        ("same", self.drop.apply(
                            {}, {}, materialize_part(k, xp, oh, ow),
                            train=train, rng=rng)[0])
                        for k, xp in parts
                    ]
                y, new_s[str(i)] = layer.apply_parts(
                    p[name][str(i)], s[name][str(i)], parts, train=train
                )
                out.append(y)
            return constrain_pyramid(out), new_s
        mixed = resample_concat(pyr)
        for i, layer in enumerate(layers):
            xi = mixed[i]
            if self.drop is not None:
                xi, _ = self.drop.apply({}, {}, xi, train=train, rng=rng)
            y, new_s[str(i)] = layer.apply(p[name][str(i)], s[name][str(i)], xi, train=train)
            out.append(y)
        return constrain_pyramid(out), new_s

    def apply(self, p, s, pyr, *, train=False, rng=None):
        rng = _as_rngs(rng)
        h, s1 = self._stage("s1", self.stage1, p, s, pyr, train, rng)
        h, s2 = self._stage("s2", self.stage2, p, s, h, train, rng)
        out, sc_s = [], {}
        for i, (x, y) in enumerate(zip(pyr, h)):
            sc = self.shortcuts[i]
            cin, cout = self.in_widths[i], self.out_widths_[i]
            if sc is not None:
                short, sc_s[str(i)] = sc.apply(p["sc"][str(i)], s["sc"][str(i)], x, train=train)
            else:
                sc_s[str(i)] = {}
                if cin == cout:
                    short = x
                else:  # zero-pad widen (nn.Padding, `rnmg.lua:13-20`)
                    pad = [(0, 0)] * (x.ndim - 1) + [(0, cout - cin)]
                    short = jnp.pad(x, pad)
            z = y + short.astype(y.dtype)
            out.append(jax.nn.relu(z) if self.final_relu else z)
        return constrain_pyramid(out), {"s1": s1, "s2": s2, "sc": sc_s}


@dataclass
class MgPool:
    """Block transition (`models/cifar/nmg.lua:108-141`,
    `models/mnist-cluttered/unmg.lua:131-148`):
      mode="plain":  maxpool2-ceil every scale
      mode="concat": pool scales 0..n-2; scale n-2 is channel-concatenated
                     with the untouched coarsest scale -> n-1 scales
      mode="drop":   pool scales 0..n-2, drop the coarsest -> n-1 scales
    """

    widths: Sequence[int]
    mode: str = "plain"

    def __post_init__(self):
        w = list(self.widths)
        if self.mode == "concat":
            assert len(w) >= 2
            self.out_widths = w[:-2] + [w[-2] + w[-1]]
        elif self.mode == "drop":
            self.out_widths = w[:-1]
        else:
            self.out_widths = w

    def init(self, key):
        return {}, {}

    def apply(self, p, s, pyr, *, train=False, rng=None):
        n = len(pyr)
        if self.mode == "concat":
            out = [maxpool2_ceil(pyr[i]) for i in range(n - 1)]
            out[-1] = jnp.concatenate([out[-1], pyr[-1]], axis=-1)
        elif self.mode == "drop":
            out = [maxpool2_ceil(pyr[i]) for i in range(n - 1)]
        else:
            out = [maxpool2_ceil(x) for x in pyr]
        return constrain_pyramid(out), s


@dataclass
class MgUpConv:
    """Per-scale transposed-conv 2x2/2 + BN + ReLU
    (`models/mnist-cluttered/unmg.lua:42-52`)."""

    in_widths: Sequence[int]
    out_widths_: Sequence[int]
    eps: float = 1e-3
    dtype: Optional[object] = None

    def __post_init__(self):
        assert len(self.in_widths) == len(self.out_widths_)
        self.ups = [
            UpConvBN(cin, cout, eps=self.eps, dtype=self.dtype)
            for cin, cout in zip(self.in_widths, self.out_widths_)
        ]
        self.out_widths = list(self.out_widths_)

    def init(self, key):
        return _init_layers(self.ups, key)

    def apply(self, p, s, pyr, *, train=False, rng=None):
        out, new_s = [], {}
        for i, u in enumerate(self.ups):
            y, new_s[str(i)] = u.apply(p[str(i)], s[str(i)], pyr[i], train=train)
            out.append(y)
        return constrain_pyramid(out), new_s


@dataclass
class PerScale:
    """Apply the i-th layer to the i-th scale (None = identity). Used for
    the pyramid-prefix plumbing in P-* models (`pnmg.lua:177-228`).

    Unlike the block ops, PerScale is pure plumbing and does not expose
    ``out_widths`` — its per-scale widths are whatever its layers
    produce; callers (models/common.py) track them in their plans."""

    layers: list

    def init(self, key):
        return _init_layers(self.layers, key)

    def apply(self, p, s, pyr, *, train=False, rng=None):
        rng = _as_rngs(rng)
        out, new_s = [], {}
        for i, layer in enumerate(self.layers):
            if layer is None:
                out.append(pyr[i])
                new_s[str(i)] = {}
            else:
                y, new_s[str(i)] = layer.apply(p[str(i)], s[str(i)], pyr[i], train=train, rng=rng)
                out.append(y)
        return constrain_pyramid(out), new_s
