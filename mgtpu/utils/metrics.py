"""Jittable metric functions (rebuild of `utils/mathfuncs.lua`)."""

from __future__ import annotations

import jax.numpy as jnp


def topk_accuracy(log_probs, labels, k: int = 1):
    """Fraction of samples whose label is in the top-k predictions
    (`utils/mathfuncs.lua:3-16`)."""
    labels = labels.astype(jnp.int32)
    if k == 1:
        pred = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        return jnp.mean((pred == labels).astype(jnp.float32))
    topk = jnp.argsort(log_probs, axis=-1)[:, ::-1][:, :k].astype(jnp.int32)
    hit = jnp.any(topk == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))


def mnist_iu(probs, targets, threshold: float = 0.5):
    """Per-sample mean IU over present classes at a threshold
    (`utils/mathfuncs.lua:28-44`): for sample i,
    IU_i = TP_i / (TP_i + mismatches_i) computed jointly over the whole
    (C,H,W) volume, divided by the number of classes present in the
    target, averaged over the batch. targets/probs: (N, H, W, C)."""
    pred = (probs >= threshold).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    axes = tuple(range(1, t.ndim))
    tp = jnp.sum((pred == 1) & (t == 1), axis=axes).astype(jnp.float32)
    fp_fn = jnp.sum(pred != t, axis=axes).astype(jnp.float32)
    iu = tp / jnp.maximum(tp + fp_fn, 1e-12)
    # classes present per sample: any over spatial dims, sum over channel
    spatial = tuple(range(1, t.ndim - 1))
    n_class = jnp.sum(jnp.any(t == 1, axis=spatial), axis=-1).astype(jnp.float32)
    # samples with an all-empty target carry no IU signal: excluding
    # them (instead of scoring 0) keeps the mean over scorable samples
    # (unreachable with the shipped generator — >=1 digit per sample)
    has = (n_class > 0).astype(jnp.float32)
    per_sample = jnp.where(n_class > 0, iu / jnp.maximum(n_class, 1.0), 0.0)
    return jnp.sum(per_sample) / jnp.maximum(jnp.sum(has), 1.0)


def seg_mean_iu_mean_acc(probs, targets, threshold: float = 0.5):
    """Per-class counts for the reference notebook's offline metrics
    (`notebooks/mnist-segmentation.ipynb` cells 1-2, =
    tools/seg_metrics.py): IU_c = TP_c/(TP_c+FP_c+FN_c) and
    Acc_c = TP_c/(TP_c+FP_c) (the notebook's tp/#predicted, i.e.
    precision), each averaged over ALL C classes. probs/targets:
    (N, H, W, C). Returns per-class sums so the caller can aggregate
    across batches: (tp, fp, fn) each (C,)."""
    pred = (probs >= threshold).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    axes = tuple(range(0, t.ndim - 1))
    tp = jnp.sum(pred * t, axis=axes)
    fp = jnp.sum(pred * (1 - t), axis=axes)
    fn = jnp.sum((1 - pred) * t, axis=axes)
    return tp, fp, fn
