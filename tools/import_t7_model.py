#!/usr/bin/env python
"""Import a reference-trained Torch7 model checkpoint (`model_<E>.t7`,
written by `saveDataParallel`, `multigpu.lua:105`) into an mgtpu
checkpoint, mapping nn.Sequential conv/BN/Linear parameters onto the
corresponding mgtpu pytree.

    python tools/import_t7_model.py model_200.t7 \
        --netType cifar/nmg --dataset cifar100-whitened --nLayer 1 \
        --out model_imported.ckpt

Matching is ORDER-based: the torch graph is flattened depth-first
(containers expand `modules`; DataParallelTable keeps replica 1 only,
`multigpu.lua:33-51`), the mgtpu tree is flattened in apply order, and
the two sequences are zipped with strict shape checking — any
mismatch aborts loudly with both flattened sequences printed. Layout
translation: conv weights (O,I,kH,kW) -> HWIO, SpatialConvolutionMM's
flattened (O, I*kH*kW) weights are unfolded first, Linear (O,I) -> (I,O),
BN weight/bias -> scale/bias with running_{mean,var} (legacy
running_std is converted). Verified for the sequential-style zoo
(cifar/nmg, cifar/vgg); residual models interleave per-scale in the
reference graph and import only if the flattening orders agree —
the shape checks make a silent mis-zip impossible.
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mgtpu.utils import t7  # noqa: E402


def flatten_torch(obj, out):
    """Depth-first parameterized modules of an nn graph."""
    if isinstance(obj, t7.TorchObject):
        f = obj.fields
        cls = obj.torch_type.rsplit(".", 1)[-1]
        w = f.get("weight")
        if isinstance(w, np.ndarray):
            if "running_mean" in f or "running_std" in f:
                out.append(("bn", obj))
            elif "FullConvolution" in cls:
                out.append(("fullconv", obj))
            elif cls == "Linear":
                out.append(("linear", obj))
            else:
                out.append(("conv", obj))
        mods = f.get("modules")
        if isinstance(mods, list) and mods:
            if cls == "DataParallelTable":
                mods = mods[:1]  # replicas are copies (`multigpu.lua:33-51`)
            for m in mods:
                flatten_torch(m, out)
    elif isinstance(obj, list):
        for m in obj:
            flatten_torch(m, out)
    return out


def _key_order(keys):
    # numeric keys in numeric order; ConvBN's conv strictly before bn
    # (the torch Sequential is [Conv, BN, ReLU]); stage keys s1<s2<sc
    # and c1<c2<sc are already alphabetical
    pri = {"conv": 0, "bn": 1}
    return sorted(keys, key=lambda k: ((0, int(k), "") if k.isdigit()
                                       else (1, pri.get(k, 99), k)))


def flatten_mg(params, stats, out):
    """Depth-first parameter slots of an mgtpu model tree, in apply
    order. Slots are the live sub-dicts, so filling them in place
    fills the whole tree."""
    if not isinstance(params, dict):
        raise ValueError(f"unexpected non-dict param node: {params!r}")
    if "w" in params:
        out.append(("conv" if params["w"].ndim == 4 else "linear",
                    params, stats))
        return out
    if "scale" in params and "bias" in params:
        out.append(("bn", params, stats))
        return out
    for k in _key_order(params):
        s = stats.get(k, {}) if isinstance(stats, dict) else {}
        flatten_mg(params[k], s, out)
    return out


def _conv_weight(kind: str, mod: t7.TorchObject) -> np.ndarray:
    w = np.asarray(mod["weight"], np.float32)
    if w.ndim == 2:  # SpatialConvolutionMM stores (O, I*kH*kW)
        ci = int(mod["nInputPlane"])
        kh, kw = int(mod["kH"]), int(mod["kW"])
        w = w.reshape(w.shape[0], ci, kh, kw)
    if kind == "fullconv":  # (I, O, kH, kW) -> HWIO
        return np.ascontiguousarray(w.transpose(2, 3, 0, 1))
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # (O,I,kH,kW)


def fill_slot(kind, tkind, mod, p, s):
    if kind == "conv":
        w = _conv_weight(tkind, mod)
        if w.shape != tuple(p["w"].shape):
            raise SystemExit(
                f"conv weight shape mismatch: torch {w.shape} vs mgtpu "
                f"{tuple(p['w'].shape)} — flattening orders disagree"
            )
        p["w"] = w
        b = mod.get("bias")
        if "b" in p:
            p["b"] = (np.asarray(b, np.float32) if isinstance(b, np.ndarray)
                      else np.zeros(w.shape[-1], np.float32))
        elif isinstance(b, np.ndarray) and np.any(b):
            # the docstring promises "any mismatch aborts loudly":
            # dropping a trained non-zero bias would silently offset
            # every activation of this conv
            raise SystemExit(
                "torch conv carries a non-zero bias but the target "
                "mgtpu conv was built without one (bias=False)"
            )
    elif kind == "linear":
        w = np.asarray(mod["weight"], np.float32).T  # (O,I) -> (I,O)
        if w.shape != tuple(p["w"].shape):
            raise SystemExit(
                f"linear weight shape mismatch: torch {w.shape} vs "
                f"mgtpu {tuple(p['w'].shape)}"
            )
        p["w"] = w
        b = mod.get("bias")
        p["b"] = (np.asarray(b, np.float32) if isinstance(b, np.ndarray)
                  else np.zeros(w.shape[-1], np.float32))
    else:  # bn
        c = int(np.asarray(mod["running_mean"]).shape[0]) if "running_mean" in mod \
            else int(np.asarray(mod["running_std"]).shape[0])
        if c != int(p["scale"].shape[0]):
            raise SystemExit(
                f"BN width mismatch: torch {c} vs mgtpu {int(p['scale'].shape[0])}"
            )
        w, b = mod.get("weight"), mod.get("bias")
        p["scale"] = (np.asarray(w, np.float32) if isinstance(w, np.ndarray)
                      else np.ones(c, np.float32))
        p["bias"] = (np.asarray(b, np.float32) if isinstance(b, np.ndarray)
                     else np.zeros(c, np.float32))
        if "running_mean" in mod:
            s["mean"] = np.asarray(mod["running_mean"], np.float32)
        if "running_var" in mod:
            s["var"] = np.asarray(mod["running_var"], np.float32)
        elif "running_std" in mod:  # legacy nn stored 1/sqrt(var+eps)
            std = np.asarray(mod["running_std"], np.float64)
            s["var"] = (1.0 / std**2).astype(np.float32)


def import_model(blob_path: str, opt) -> tuple:
    import jax

    from mgtpu.models import get_net

    net = get_net(opt.netType)
    model = net.create_model(opt)
    params, stats = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x, params)  # mutable copies
    stats = jax.tree.map(lambda x: x, stats)

    torch_mods = flatten_torch(t7.load(blob_path), [])
    mg_slots = flatten_mg(params, stats, [])
    t_kinds = [k for k, _ in torch_mods]
    m_kinds = [k for k, _, _ in mg_slots]
    norm = ["conv" if k == "fullconv" else k for k in t_kinds]
    if norm != m_kinds:
        raise SystemExit(
            "module sequences disagree:\n"
            f"  torch ({len(t_kinds)}): {t_kinds}\n"
            f"  mgtpu ({len(m_kinds)}): {m_kinds}\n"
            "order-based import is not possible for this pair"
        )
    for (tkind, mod), (kind, p, s) in zip(torch_mods, mg_slots):
        fill_slot(kind, tkind, mod, p, s)

    # every remaining abstract leaf is a parameter the torch blob did
    # not provide — that would train/fwd as garbage, so fail closed
    bad = [x for x in jax.tree.leaves((params, stats))
           if not isinstance(x, np.ndarray)]
    if bad:
        raise SystemExit(f"{len(bad)} parameters were not filled by the import")
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("blob")
    ap.add_argument("--netType", required=True)
    ap.add_argument("--dataset", default="cifar100-whitened")
    ap.add_argument("--nLayer", type=int, default=1)
    ap.add_argument("--depth", type=int, default=34)
    ap.add_argument("--shortcutType", default="A")
    ap.add_argument("--isDropout", action="store_true")
    ap.add_argument("--epoch", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    opt = types.SimpleNamespace(
        netType=args.netType, dataset=args.dataset, nLayer=args.nLayer,
        depth=args.depth, shortcutType=args.shortcutType,
        isDropout=args.isDropout, compute_dtype=None,
    )
    params, stats = import_model(args.blob, opt)

    from mgtpu.utils.checkpoint import model_meta, save_checkpoint

    save_checkpoint(args.out, params, stats, None, args.epoch, model_meta(opt))
    n = sum(int(np.prod(x.shape)) for x in
            __import__("jax").tree.leaves(params))
    print(f"imported {args.blob} -> {args.out} ({n:,} params)")


if __name__ == "__main__":
    main()
