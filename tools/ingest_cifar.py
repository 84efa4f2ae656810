#!/usr/bin/env python
"""CIFAR ingest: convert the public python pickles to the framework's
.npz format, optionally producing the ZCA-whitened CIFAR-100 blob the
reference downloads pre-computed (`README.md:49`,
`dataset/cifar100-whitened/dataset.lua:44`).

Whitening recipe (standard ZCA as in Goodfellow et al. maxout /
pylearn2, the lineage of the published blob): global contrast
normalize each image (subtract its mean, divide by its norm), then
X_zca = X U (S + eps)^-1/2 U^T with (U, S) from the covariance of the
TRAIN set; the same transform is applied to test.

Usage:
  python tools/ingest_cifar.py --root <dir with cifar-100-python/> \
      --dataset cifar100 --whiten --out cifar100_whitened.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mgtpu.data.cifar import load_cifar_python as load_cifar  # noqa: E402


def gcn(x: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    x = x.astype(np.float64)
    x = x - x.mean(axis=1, keepdims=True)
    norm = np.sqrt((x**2).sum(axis=1, keepdims=True)) + eps
    return x / norm * 55.0  # pylearn2 scale convention


def zca_fit(x: np.ndarray, eps: float = 0.1):
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / len(xc)
    u, s, _ = np.linalg.svd(cov)
    w = u @ np.diag(1.0 / np.sqrt(s + eps)) @ u.T
    return mean, w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=False, default=None)
    ap.add_argument("--dataset", default="cifar100", choices=["cifar10", "cifar100"])
    ap.add_argument("--whiten", action="store_true")
    ap.add_argument("--t7", default=None, metavar="BLOB",
                    help="ingest the reference's own torch.save artifact "
                         "(e.g. the pre-whitened cifar100_whitened.t7 from "
                         "README.md:49) instead of python pickles")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.t7:
        # the canonical reference drop: already whitened, so no GCN/ZCA
        # pass — just translate layout (CHW->HWC; labels stay 1-based,
        # the runtime loader's >=1 shift handles torch indexing)
        from mgtpu.utils import t7 as t7mod
        from read_t7 import convert_cifar

        arrays = convert_cifar(t7mod.load(args.t7))
        out = args.out or "cifar100_whitened.npz"
        np.savez_compressed(out, **arrays)
        print(f"wrote {out}: train {arrays['train_data'].shape}, "
              f"test {arrays['test_data'].shape}")
        return
    if not args.root:
        ap.error("--root is required unless --t7 is given")

    if args.whiten and args.dataset != "cifar100":
        raise SystemExit(
            "--whiten is only consumed by -dataset cifar100-whitened, "
            "which loads cifar100_whitened.npz; a whitened "
            f"{args.dataset} blob would never be read by any runtime "
            "path (mgtpu/data/cifar.py)"
        )
    (trd, trl), (ted, tel) = load_cifar(args.root, args.dataset)
    out = args.out or (
        f"{args.dataset}_whitened.npz" if args.whiten else f"{args.dataset}.npz"
    )
    if args.whiten:
        tr = gcn(trd)
        te = gcn(ted)
        mean, w = zca_fit(tr)
        from mgtpu import native

        # both branches run (x - mean) @ w in float32: the native path
        # is f32-only, so the numpy fallback must not accumulate in f64
        # or the produced blob would depend on whether g++ exists on
        # the ingest host
        tr32 = np.ascontiguousarray(tr, np.float32)
        te32 = np.ascontiguousarray(te, np.float32)
        mean32, w32 = mean.astype(np.float32), np.ascontiguousarray(w, np.float32)
        if native.available():  # C++ blocked matmul; parity-pinned
            trd = native.whiten(tr32, mean32, w32)
            ted = native.whiten(te32, mean32, w32)
        else:
            trd = (tr32 - mean32) @ w32
            ted = (te32 - mean32) @ w32
    np.savez_compressed(
        out,
        train_data=trd.astype(np.float32),
        train_labels=trl.astype(np.int32),
        test_data=ted.astype(np.float32),
        test_labels=tel.astype(np.int32),
    )
    print(f"wrote {out}: train {trd.shape}, test {ted.shape}")


if __name__ == "__main__":
    main()
