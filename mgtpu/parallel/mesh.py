"""Device-mesh data parallelism.

The TPU-native replacement for the reference's multi-GPU layer
(`/root/reference/multigpu.lua`): where Torch needed
nn.DataParallelTable + NCCL + explicit syncParameters
(`multigpu.lua:81-103`, `pipelines/standard/train.lua:165-169`), here a
`jax.sharding.Mesh` with the batch dim sharded over the 'data' axis and
params replicated makes XLA insert the gradient all-reduce over ICI
automatically — scatter, reduce, and broadcast all disappear into the
compiler. The mesh carries a 'model' axis (size 1 today) so tensor /
spatial sharding can be added without re-plumbing."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, batch_axis: int = 0):
    """Place host arrays on the mesh with the batch dim split over
    'data'. Batch size must divide the data-axis size."""
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
