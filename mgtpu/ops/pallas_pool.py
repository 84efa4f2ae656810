"""Pallas TPU kernels for the multigrid exchange's 2x2/2 max pool —
EXPERIMENTAL, not wired into the model zoo.

Measured on TPU v5e (128x56x56x64 bf16, 2026-08-16): the XLA path
(`lax.reduce_window` fwd + SelectAndScatter bwd, see
mgtpu/ops/resample.py) runs 213us fwd / 292us fwd+bwd. Pallas
formulations tried:
  v1  grid (N, H/2) row-pair blocks:        1077us fwd (grid overhead)
  v3  grid (N,) whole-image static loop:     783us fwd
  bwd: does not compile on current Mosaic — merging the split sublane
       dim back ((W/2,2,C)->(W,C)) is an unsupported shape cast.
Conclusion: XLA's windowed reduce is the right tool for this op on
this hardware; these kernels stay as the measured record (with
interpret-mode correctness tests in tests/test_pallas_pool.py) and as
the template for future Mosaic work. NOT used by the model zoo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, y_ref):
    # x_ref: (1, H, W, C) -> y_ref: (1, H/2, W/2, C). Static row loop;
    # Mosaic supports splitting the sublane dim ((W,C)->(W/2,2,C)) but
    # not strided slicing of loaded 3D vectors.
    h = x_ref.shape[1]
    w, c = x_ref.shape[2], x_ref.shape[3]
    for i in range(h // 2):
        a = jnp.maximum(x_ref[0, 2 * i], x_ref[0, 2 * i + 1])  # (W, C)
        y_ref[0, i] = jnp.max(a.reshape(w // 2, 2, c), axis=1)


def _bwd_kernel(x_ref, y_ref, g_ref, dx_ref):
    # KNOWN divergence from SelectAndScatter: a window whose max is
    # attained by k>1 elements receives the cotangent at EVERY tied
    # element (sum(dx) = k*g) instead of one winner. Pinned in
    # tests/test_pallas_pool.py::test_pallas_pool_backward_tie_semantics.
    h = x_ref.shape[1]
    w, c = x_ref.shape[2], x_ref.shape[3]
    zero = jnp.zeros((), dx_ref.dtype)
    for i in range(h // 2):
        y = y_ref[0, i]                            # (W/2, C)
        g = g_ref[0, i]
        for r in (0, 1):
            xr = x_ref[0, 2 * i + r].reshape(w // 2, 2, c)
            m = jnp.where(xr == y[:, None, :], g[:, None, :], zero)
            dx_ref[0, 2 * i + r] = m.reshape(w, c)


@jax.custom_vjp
def maxpool2_pallas(x: jax.Array) -> jax.Array:
    """2x2/2 max pool, even H/W only, NHWC."""
    return _pool_fwd_call(x)


def _pool_fwd_call(x):
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "pallas pool requires even H/W"
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h // 2, w // 2, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
    )(x)


def _pool_fwd(x):
    y = _pool_fwd_call(x)
    return y, (x, y)


def _pool_bwd(res, g):
    x, y = res
    n, h, w, c = x.shape
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h // 2, w // 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h // 2, w // 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, y, g.astype(x.dtype))
    return (dx,)


maxpool2_pallas.defvjp(_pool_fwd, _pool_bwd)
