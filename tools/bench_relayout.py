"""Attribute the train step's XLA-inserted layout copies (the 3.1 ms
"layout copies / slices" line of PARITY's profiler accounting) — the
round-5 experiment VERDICT r4 asked for.

Hypothesis under test: the mg pyramid's sub-lane channel widths
(16/32/64 vs the TPU's 128-lane registers) force relayouts between
conv tilings. Probe: an A/B against a LANE-PADDED variant of R-MG-34
whose every channel width is rounded up to a multiple of 128 — if the
copy category collapses there, the copies are the price of the
pyramid's narrow coarse scales (and padding is net-negative: it
multiplies coarse-scale FLOPs by up to 8x to save ~3 ms).

For each variant this times the donated train step AND captures a
jax.profiler trace of 8 steps, then aggregates hlo_category ms/step
in-process (same parsing as tools/profile_summary.py) and lists the
top copy/slice ops for attribution.

Usage: python tools/bench_relayout.py [batch] [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import os
import sys
import tempfile
import time
import types

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (mgtpu package)
sys.path.insert(0, _HERE)  # tools dir (profile_summary helpers)

import jax
import jax.numpy as jnp

COPY_CATS = ("copy", "slice", "all others")  # categories to detail


def pad128(ws):
    return [((w + 127) // 128) * 128 for w in ws]


def build_variant(padded: bool, dtype):
    from mgtpu.models.common import LogSoftmaxClassifier, MgNet
    from mgtpu.ops.mg import MgPool, MgResidual, MgStem7x7

    stem = [64, 32, 16]
    blocks = [
        ([64, 32, 16], [3, 3, 3], False),
        ([128, 64, 32], [3, 3, 3], True),
        ([256, 128], [3, 3], True),
        ([512], [3], False),
    ]
    if padded:
        stem = pad128(stem)
        blocks = [(pad128(ws), ks, c) for ws, ks, c in blocks]
    cfg = [3, 4, 6, 3]  # depth 34
    layers = [MgStem7x7(stem, dtype=dtype)]
    widths = list(stem)
    for bi, (ws, ks, is_concat) in enumerate(blocks):
        for _ in range(cfg[bi]):
            layers.append(MgResidual(widths, ws, ks, dtype=dtype))
            widths = list(ws)
        if bi < len(blocks) - 1:
            pool = MgPool(widths, "concat" if is_concat else "plain")
            layers.append(pool)
            widths = pool.out_widths
    layers.append(LogSoftmaxClassifier(widths[0], 1000, pool=7, dtype=dtype))
    return MgNet(layers)


def trace_categories(profile_dir: str):
    """(per-category total us, per-op us for detailed cats, total us)."""
    from profile_summary import device_events, find_trace

    with gzip.open(find_trace(profile_dir), "rt") as f:
        trace = json.load(f)
    by_cat = collections.Counter()
    copy_ops = collections.Counter()
    copy_meta = {}
    total = 0.0
    for ev in device_events(trace):
        a = ev.get("args") or {}
        cat = a.get("hlo_category")
        if cat is None:
            continue
        dur = float(ev.get("dur", 0.0))
        by_cat[cat] += dur
        total += dur
        if any(k in cat for k in COPY_CATS):
            name = ev.get("name", "?")
            copy_ops[name] += dur
            if name not in copy_meta:
                copy_meta[name] = {
                    k: v for k, v in a.items()
                    if k in ("long_name", "shape", "tf_op", "source")
                }
    return by_cat, copy_ops, copy_meta, total


def run_variant(tag: str, padded: bool, batch: int, trace_root: str, steps=8):
    from mgtpu.models import get_net
    from mgtpu.train.optim import sgd_init
    from mgtpu.train.step import make_train_step

    opt = types.SimpleNamespace(depth=34, compute_dtype=jnp.bfloat16)
    net = get_net("ilsvrc/rnmg")
    model = build_variant(padded, jnp.bfloat16)
    step = jax.jit(
        make_train_step(model, net.create_loss(opt), net, iter_size=1),
        donate_argnums=(0, 1, 2),
    )
    params, stats = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt_state = sgd_init(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 224, 224, 3), jnp.bfloat16)
    y = (jax.random.uniform(jax.random.PRNGKey(2), (batch,)) * 1000).astype(jnp.int32)
    b = {"x": x, "y": y}
    for i in range(3):
        params, stats, opt_state, m = step(params, stats, opt_state, b,
                                           0.1, 1e-4, jax.random.PRNGKey(i))
    float(m["loss"])
    # timed window (median of 3 x 20 steps)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(20):
            params, stats, opt_state, m = step(params, stats, opt_state, b,
                                               0.1, 1e-4, jax.random.PRNGKey(i))
        float(m["loss"])
        samples.append(batch * 20 / (time.perf_counter() - t0))
    ips = sorted(samples)[1]
    # traced window
    tdir = os.path.join(trace_root, tag)
    jax.profiler.start_trace(tdir)
    for i in range(steps):
        params, stats, opt_state, m = step(params, stats, opt_state, b,
                                           0.1, 1e-4, jax.random.PRNGKey(i))
    float(m["loss"])
    jax.profiler.stop_trace()
    by_cat, copy_ops, copy_meta, total = trace_categories(tdir)
    return {
        "tag": tag,
        "img_s": round(ips, 1),
        "device_ms_step": round(total / 1000 / steps, 2),
        "categories_ms_step": {
            k: round(v / 1000 / steps, 3) for k, v in by_cat.most_common()
        },
        "top_copy_ops_ms_step": [
            (name, round(us / 1000 / steps, 3), copy_meta.get(name, {}))
            for name, us in copy_ops.most_common(12)
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=128)
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()
    root = args.trace_dir or tempfile.mkdtemp(prefix="relayout_")
    results = [
        run_variant("baseline", False, args.batch, root),
        run_variant("lane-padded-128", True, args.batch, root),
    ]
    for r in results:
        print(json.dumps({k: v for k, v in r.items()
                          if k != "top_copy_ops_ms_step"}))
        print(f"-- {r['tag']} top copy/slice ops (ms/step):", file=sys.stderr)
        for name, ms, meta in r["top_copy_ops_ms_step"]:
            print(f"   {ms:8.3f}  {name[:70]}  {meta}", file=sys.stderr)
    b, p = results
    base_copy = sum(v for k, v in b["categories_ms_step"].items()
                    if any(s in k for s in COPY_CATS))
    pad_copy = sum(v for k, v in p["categories_ms_step"].items()
                   if any(s in k for s in COPY_CATS))
    print(json.dumps({
        "metric": "train-step copy/slice ms per step",
        "baseline": round(base_copy, 2),
        "lane_padded": round(pad_copy, 2),
        "note": "padded variant inflates coarse-scale FLOPs; compare the "
                "copy category, not throughput",
    }))


if __name__ == "__main__":
    main()
