"""SGD with momentum and *coupled* weight decay — exact semantics of
torch `optim.sgd` as driven by the reference
(`models/basic_model.lua:64-66`, `pipelines/standard/train.lua:49-55`):

    g  <- g + wd * p          (L2 added into the gradient)
    m  <- mu * m + g          (dampening 0, no nesterov)
    p  <- p - lr * m

momentum 0.9 (`opts.lua:43`). lr/wd are traced scalars so epoch changes
don't recompile. Unlike the reference — which rebuilds optimState every
epoch, dropping momentum (`train.lua:48-55`) — the momentum buffer here
persists across epochs and is checkpointed; pass ``reset_momentum``
per-epoch to reproduce the reference exactly."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sgd_init(params):
    return {"m": jax.tree.map(jnp.zeros_like, params)}


def sgd_update(params, grads, state, lr, wd, momentum: float = 0.9):
    def upd(p, g, m):
        g = g + wd * p
        m = momentum * m + g
        return p - lr * m, m

    flat = jax.tree.map(upd, params, grads, state["m"])
    new_p = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
    new_m = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
    return new_p, {"m": new_m}


def reset_momentum(state):
    """Reproduce the reference's per-epoch optimState rebuild —
    reachable from the CLI via -resetMomentum (standard.py:train)."""
    return {"m": jax.tree.map(jnp.zeros_like, state["m"])}
