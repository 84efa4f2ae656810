"""Feasibility probe: does XLA map int8 convolutions/matmuls onto the
v5e MXU at its doubled int8 rate (394 TOPS vs 197 TFLOP/s bf16)?

If yes, a post-training-quantized (PTQ) inference path for the mg zoo
is worth building (BN folds into conv at inference, so weight-int8 ×
activation-int8 per layer is a pure serving win). If no, this file is
the measured record of why the serving path stays bf16.

Times (min-of-N, two-size slope fit where noted):
  1. big square matmul bf16 vs int8 (peak sanity — is the 2x path
     reachable at all from lax.dot_general?)
  2. R-MG-34 hot conv shapes bf16 vs int8 via lax.conv_general_dilated
     with preferred_element_type=int32

Usage: python tools/bench_int8.py   (run WITHOUT other load)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from functools import partial


def _sync(out):
    # fetch a VALUE: on the axon-relay platform block_until_ready
    # under-waits (bench.py:_sync); a value fetch of the LAST output
    # proves the FIFO device stream drained
    return float(out.reshape(-1)[0])


def timeit(f, *args, iters=30, warmup=5):
    g = jax.jit(f)
    for _ in range(warmup):
        out = g(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def matmul_probe():
    n = 8192
    kb = jax.random.PRNGKey(0)
    a16 = jax.random.normal(kb, (n, n), jnp.bfloat16)
    b16 = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    a8 = (jax.random.normal(kb, (n, n)) * 10).astype(jnp.int8)
    b8 = (jax.random.normal(jax.random.PRNGKey(1), (n, n)) * 10).astype(jnp.int8)

    t_bf = timeit(lambda x, y: x @ y, a16, b16, iters=10)
    t_i8 = timeit(
        lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ),
        a8, b8, iters=10,
    )
    flops = 2 * n ** 3
    print(f"matmul {n}^3:")
    print(f"  bf16 : {t_bf*1e3:8.3f} ms  {flops/t_bf/1e12:7.1f} TFLOP/s")
    print(f"  int8 : {t_i8*1e3:8.3f} ms  {flops/t_i8/1e12:7.1f} TOP/s  "
          f"(speedup {t_bf/t_i8:.2f}x)")


CONV_SHAPES = [  # R-MG-34 batch-128 hot shapes (PARITY Pallas table)
    (128, 56, 56, 96, 64),
    (128, 28, 28, 192, 128),
    (128, 14, 14, 384, 256),
    (128, 7, 7, 768, 512),
]


def conv_probe(pairs=16):
    """Chain 2*pairs convs (ci->co, co->ci) inside ONE jit so the
    relay's ~ms per-call dispatch constant amortizes away. The int8
    chain includes the full PTQ requantize (int32 -> scale -> clip ->
    int8) a real quantized serving path would pay between layers."""
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, ptype):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=ptype,
        )

    print(f"\n3x3/s1/SAME convs, {2*pairs}-conv chain per call (N,H,W,Ci->Co):")
    for (n, h, w_, ci, co) in CONV_SHAPES:
        x16 = jax.random.normal(jax.random.PRNGKey(0), (n, h, w_, ci), jnp.bfloat16)
        k16a = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co), jnp.bfloat16) * 0.05
        k16b = jax.random.normal(jax.random.PRNGKey(2), (3, 3, co, ci), jnp.bfloat16) * 0.05
        x8 = (jax.random.normal(jax.random.PRNGKey(0), (n, h, w_, ci)) * 10).astype(jnp.int8)
        k8a = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co)) * 10).astype(jnp.int8)
        k8b = (jax.random.normal(jax.random.PRNGKey(2), (3, 3, co, ci)) * 10).astype(jnp.int8)

        def chain_bf(x, wa, wb):
            def body(_, y):
                y = conv(y, wa, jnp.float32).astype(jnp.bfloat16)
                return conv(y, wb, jnp.float32).astype(jnp.bfloat16)

            y = jax.lax.fori_loop(0, pairs, body, x)
            return jnp.sum(y.astype(jnp.float32))

        def chain_i8(x, wa, wb):
            def requant(acc):  # int32 accumulator -> scaled int8
                return jnp.clip(
                    jnp.round(acc.astype(jnp.float32) * 3e-4), -127, 127
                ).astype(jnp.int8)

            def body(_, y):
                y = requant(conv(y, wa, jnp.int32))
                return requant(conv(y, wb, jnp.int32))

            y = jax.lax.fori_loop(0, pairs, body, x)
            return jnp.sum(y.astype(jnp.float32))

        try:
            t_bf = timeit(chain_bf, x16, k16a, k16b, iters=10) / (2 * pairs)
            t_i8 = timeit(chain_i8, x8, k8a, k8b, iters=10) / (2 * pairs)
            flops = 2 * n * h * w_ * ci * co * 9
            print(f"  {n}x{h}x{w_}x{ci}->{co}: bf16 {t_bf*1e6:7.0f} us "
                  f"({flops/t_bf/1e12:5.1f} TF/s)  int8+requant {t_i8*1e6:7.0f} us "
                  f"({flops/t_i8/1e12:5.1f} TOP/s)  speedup {t_bf/t_i8:.2f}x")
        except Exception as e:  # int8 conv may be unsupported on some backends
            print(f"  {n}x{h}x{w_}x{ci}->{co}: FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    matmul_probe()
    conv_probe()
