"""Checkpoint save/load.

Rebuild of the reference's `saveDataParallel`/`loadDataParallel`
(`multigpu.lua:105-160`) with two intentional upgrades (SURVEY §5):
  - optimizer (momentum) state IS checkpointed (the reference rebuilt
    optimState each epoch);
  - checkpoints are host/device-layout agnostic pytrees — no DPT
    stripping/re-expansion needed.

Like torch's whole-model blobs, a checkpoint carries enough metadata
(netType + model flags) to rebuild the architecture, which the
mnist-test/mnist-saliency harness models rely on
(`models/mnist-cluttered/mnist-saliency.lua:7-15`)."""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, stats, opt_state=None, epoch: int = 0,
                    meta: Optional[Dict[str, Any]] = None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = {
        "params": _to_host(params),
        "stats": _to_host(stats),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "epoch": epoch,
        "meta": meta or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def model_meta(opt) -> Dict[str, Any]:
    """Flags a checkpoint needs to rebuild its architecture."""
    keys = ("netType", "dataset", "nLayer", "isDropout", "depth",
            "shortcutType", "dtype")
    return {k: getattr(opt, k) for k in keys if hasattr(opt, k)}
