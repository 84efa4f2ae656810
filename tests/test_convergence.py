"""End-to-end convergence smoke — the rebuild's stand-in for the
reference's held-out-evaluation regression signal (SURVEY §4). Real
CIFAR/MNIST blobs cannot be fetched on a zero-egress box, so this
trains MG-6 on the class-structured synthetic set (class prototypes +
unit noise, mgtpu/data/cifar.py) and requires test accuracy far above
the 1% chance level. Catches sign errors, LR-rule breakage, BN
train/eval mixups, and optimizer regressions that shape tests miss."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgtpu.data import get_loaders
from mgtpu.models import get_net
from mgtpu.train.optim import sgd_init
from mgtpu.train.step import make_eval_step, make_train_step


@pytest.mark.slow  # ~90s each: 60 compiled train steps
@pytest.mark.parametrize("disjoint,bar", [
    (False, 0.10),  # shared prototypes: mechanics smoke (flatters by design)
    # -synthDisjoint: test prototypes are independently perturbed, so this
    # bar demands real generalization to the shared base structure
    # (memorizing the train split's exact patterns would land near 1% chance)
    (True, 0.05),
])
def test_mg6_learns_synthetic_cifar(disjoint, bar):
    opt = types.SimpleNamespace(
        dataset="cifar100-whitened", data="synthetic", synthSize=800,
        nLayer=1, nEpochs=10, batchSize=32, imageSize=36, imageCrop=32,
        colorspace="bgr", dataAug="default", manualSeed=5, tenCrop=False,
        synthDisjoint=disjoint,
    )
    net = get_net("cifar/nmg")
    model = net.create_model(opt)
    params, stats = jax.jit(model.init)(jax.random.PRNGKey(0))
    loss_fn = net.create_loss(opt)
    step = jax.jit(make_train_step(model, loss_fn, net, iter_size=1))
    estep = jax.jit(make_eval_step(model, loss_fn, net))
    loaders = get_loaders(opt)
    opt_state = sgd_init(params)

    losses = []
    for it in range(60):
        x, y = loaders["train"].gen_inputs(opt.batchSize, 1, seed=1000 + it)
        params, stats, opt_state, m = step(
            params, stats, opt_state,
            {"x": jnp.asarray(x), "y": jnp.asarray(y)},
            0.05, 5e-4, jax.random.PRNGKey(it),
        )
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7

    hits = n = 0
    i = 1
    while i <= 200:
        j = min(i + 49, 200)
        x, y = loaders["test"].get_inputs(i, j, 1)
        m, _ = estep(params, stats, {"x": jnp.asarray(x), "y": jnp.asarray(y)})
        hits += float(m["top1"]) * (j - i + 1)
        n += j - i + 1
        i = j + 1
    top1 = hits / n
    # 60 steps reach ~20% shared / less disjoint on held-out synthetic
    # (chance = 1%); the bars leave seed-drift margin below the measured
    # values while staying 5-10x above chance
    assert top1 > bar, (
        f"synthetic test top1 {top1:.3f} <= {bar} (disjoint={disjoint})"
    )
