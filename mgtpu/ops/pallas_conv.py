"""Pallas TPU kernels for the fused multigrid conv — the BASELINE.json
north star ("mg-conv ... single fused Pallas kernels") attempted at the
conv level. MEASURED OUTCOME (v5e, two-batch slope fit, full table in
PARITY "Pallas conv experiments"): XLA wins every R-MG-34 train shape —
13.8% vs 73.1% MXU on the hottest (Co=64) conv, within 16-24% but still
behind at Co=256/512 — and the fused bn-relu-conv chain loses at every
shape too, so these kernels stay an experiment record and the zoo keeps
the XLA path. The structural reason is quantified below.

Motivation (PARITY "Training-throughput ceiling", batch-128 R-MG-34
train step = 41.4 ms device time): convs are at the all-MXU roofline
(22.9 vs 22.4 ms) but the step pays ~18.5 ms of HBM-bound passes
around them — 7.0 ms BN-backward reductions, 4.0 ms pool backward,
3.1 ms relayouts, 2.2 ms SGD, 2.2 ms misc. XLA fuses elementwise ops
into conv OUTPUTS (multi-output fusion covers the BN fwd moments) but
never into conv INPUTS, and never fuses the BN-backward reduction into
the conv that produces dy. A Pallas conv whose MXU utilization matched
XLA's would make those passes free:

  fwd:  y = conv3x3(relu(bn_apply(x)))       [prologue fusion]
        (sum_y, sum_y2) epilogue             [BN fwd stats]
  bwd:  dy-producing dgrad conv + (sum_dy, sum_dy*xhat) epilogue

Kernel formulation: NHWC, 3x3 stride-1 pad-1 conv as 9 shifted
matmuls (implicit im2col), one image per grid step, full image slab in
VMEM, f32 accumulation in a VMEM scratch, per-channel stats
accumulated across the grid in a revisited f32 output block.

Two variants measured (see the module docstring bottom / PARITY for
the numbers on real v5e):
  conv3x3_rows     row-loop: 9 (W, Ci)@(Ci, Co) matmuls per output row
                   — M=W keeps every load layout-legal for bf16, at
                   the cost of small-M MXU pipeline efficiency.
  conv3x3_slab     row-block loop: flattens TH=16 rows into one
                   (TH*W, Ci) operand per tap. Requires W % 16 == 0
                   for a layout-legal bf16 sublane collapse, so the
                   caller pads W (R-MG-34's 56/28/14 -> 64/32/16).

The structural reason a naive Mosaic conv cannot match XLA on the
multigrid's fine scales: output channels = MXU columns, and the hot
convs have Co = 64 or 32 < 128, so at most Co/128 of the systolic
array can ever be active in this formulation, while XLA's conv
emitter packs multiple spatial positions into the lane dimension.
The measurements quantify exactly that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_rows_kernel(x_ref, w_ref, b_ref, y_ref, stats_ref, acc_ref,
                      *, relu_out, with_stats):
    """x_ref: (1, H+2, W+2, Ci) pre-padded; w_ref: (9, Ci, Co);
    b_ref: (1, Co); y_ref: (1, H, W, Co); stats_ref: (2, Co) f32
    accumulated across the whole grid; acc_ref: (W, Co) f32 scratch."""
    n = pl.program_id(0)
    h = y_ref.shape[1]
    w = y_ref.shape[2]

    @pl.when(n == 0)
    def _():
        # always zero: a never-written output block would be garbage
        stats_ref[:] = jnp.zeros_like(stats_ref)

    for hi in range(h):
        acc_ref[:] = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                                      acc_ref.shape)
        for a in range(3):
            row = x_ref[0, hi + a]  # (W+2, Ci)
            for b in range(3):
                acc_ref[:] += jax.lax.dot_general(
                    row[b : b + w], w_ref[3 * a + b],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        out = acc_ref[:]
        if relu_out:
            out = jnp.maximum(out, 0.0)
        y_ref[0, hi] = out.astype(y_ref.dtype)
        if with_stats:
            stats_ref[0, :] += jnp.sum(out, axis=0)
            stats_ref[1, :] += jnp.sum(out * out, axis=0)


def _conv_slab_kernel(x_ref, w_ref, b_ref, y_ref, stats_ref, acc_ref,
                      *, relu_out, with_stats, th):
    """Like _conv_rows_kernel but flattens TH rows into one matmul
    operand per tap: (TH*W, Ci) @ (Ci, Co). Needs W % 16 == 0 (bf16
    sublane collapse) and H % TH == 0."""
    n = pl.program_id(0)
    h = y_ref.shape[1]
    w = y_ref.shape[2]
    ci = x_ref.shape[3]

    @pl.when(n == 0)
    def _():
        # always zero: a never-written output block would be garbage
        stats_ref[:] = jnp.zeros_like(stats_ref)

    for t in range(h // th):
        acc_ref[:] = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                                      acc_ref.shape)
        for a in range(3):
            # (TH, W+2, Ci) slab at row offset t*th + a
            slab = x_ref[0, t * th + a : t * th + a + th]
            for b in range(3):
                lhs = slab[:, b : b + w, :].reshape(th * w, ci)
                acc_ref[:] += jax.lax.dot_general(
                    lhs, w_ref[3 * a + b],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        out = acc_ref[:]
        if relu_out:
            out = jnp.maximum(out, 0.0)
        y_ref[0, t * th : (t + 1) * th] = out.reshape(
            th, w, y_ref.shape[3]
        ).astype(y_ref.dtype)
        if with_stats:
            stats_ref[0, :] += jnp.sum(out, axis=0)
            stats_ref[1, :] += jnp.sum(out * out, axis=0)


def _conv_slab_pro_kernel(x_ref, w_ref, b_ref, scale_ref, shift_ref,
                          y_ref, stats_ref, acc_ref, xn_ref,
                          *, relu_out, with_stats, th):
    """conv3x3(relu(x * scale + shift)) — the BN-apply + ReLU input
    chain folded into the conv's VMEM staging, so the normalized
    activation never round-trips HBM. scale/shift: (1, Ci) f32
    (scale = gamma * rsqrt(var+eps), shift = beta - mean * scale)."""
    n = pl.program_id(0)
    h = y_ref.shape[1]
    w = y_ref.shape[2]
    ci = x_ref.shape[3]
    hp = x_ref.shape[1]

    @pl.when(n == 0)
    def _():
        # always zero: a never-written output block would be garbage
        stats_ref[:] = jnp.zeros_like(stats_ref)

    # normalize the whole padded slab once into scratch. The conv's
    # zero padding must survive normalization: pad positions are NOT
    # activations, so force the halo ring back to 0 (relu(shift) != 0).
    sc = scale_ref[0].astype(jnp.float32)
    sh = shift_ref[0].astype(jnp.float32)
    wp2 = x_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (wp2, 1), 0)
    interior = (col > 0) & (col < wp2 - 1)
    for hi in range(hp):
        if hi == 0 or hi == hp - 1:
            xn_ref[hi] = jnp.zeros_like(xn_ref[hi])
        else:
            z = x_ref[0, hi].astype(jnp.float32) * sc + sh
            z = jnp.where(interior, jnp.maximum(z, 0.0), 0.0)
            xn_ref[hi] = z.astype(xn_ref.dtype)

    for t in range(h // th):
        acc_ref[:] = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                                      acc_ref.shape)
        for a in range(3):
            slab = xn_ref[t * th + a : t * th + a + th]
            for b in range(3):
                lhs = slab[:, b : b + w, :].reshape(th * w, ci)
                acc_ref[:] += jax.lax.dot_general(
                    lhs, w_ref[3 * a + b],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        out = acc_ref[:]
        if relu_out:
            out = jnp.maximum(out, 0.0)
        y_ref[0, t * th : (t + 1) * th] = out.reshape(
            th, w, y_ref.shape[3]
        ).astype(y_ref.dtype)
        if with_stats:
            stats_ref[0, :] += jnp.sum(out, axis=0)
            stats_ref[1, :] += jnp.sum(out * out, axis=0)


def _pad_input(x):
    """(N, H, W, C) -> (N, H+2, W+2, C) zero pad (the conv's pad=1)."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _prep_w(w):
    """(3, 3, Ci, Co) -> (9, Ci, Co)."""
    return w.reshape((9,) + w.shape[2:])


def conv3x3(x, w, b, *, variant="slab", relu_out=False, with_stats=True,
            th=16, interpret=False):
    """Fused 3x3/s1/p1 conv [+ ReLU] [+ per-channel (sum, sumsq)].

    x: (N, H, W, Ci); w: (3, 3, Ci, Co); b: (Co,).
    Returns (y, stats) with stats (2, Co) f32 (zeros when
    with_stats=False). variant="slab" needs W % th == 0 after the
    caller's choice of th (use th=8 for f32, 16 for bf16)."""
    n, h, wd, ci = x.shape
    co = w.shape[3]
    xp = _pad_input(x)
    wf = _prep_w(w)
    bf = b.reshape(1, co)
    kern = {
        "rows": functools.partial(_conv_rows_kernel, relu_out=relu_out,
                                  with_stats=with_stats),
        "slab": functools.partial(_conv_slab_kernel, relu_out=relu_out,
                                  with_stats=with_stats, th=th),
    }[variant]
    acc_shape = (wd, co) if variant == "rows" else (th * wd, co)
    if variant == "slab":
        assert h % th == 0, (h, th)
    y, stats = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ci, co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, wd, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # every grid step revisits the same stats block (sequential
            # grid on TPU -> safe accumulation)
            pl.BlockSpec((2, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, wd, co), x.dtype),
            jax.ShapeDtypeStruct((2, co), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM(acc_shape, jnp.float32)],
        interpret=interpret,
    )(xp, wf, bf)
    return y, stats


def conv3x3_bn_relu_in(x, w, b, scale, shift, *, relu_out=False,
                       with_stats=True, th=16, interpret=False):
    """conv3x3(relu(x*scale + shift)) + stats epilogue — the full
    BN-apply -> ReLU -> conv -> BN-stats chain in ONE kernel.

    scale/shift: (Ci,) f32, precomputed from BN params/stats."""
    n, h, wd, ci = x.shape
    co = w.shape[3]
    assert h % th == 0, (h, th)
    xp = _pad_input(x)
    y, stats = pl.pallas_call(
        functools.partial(_conv_slab_pro_kernel, relu_out=relu_out,
                          with_stats=with_stats, th=th),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ci, co), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, wd, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, wd, co), x.dtype),
            jax.ShapeDtypeStruct((2, co), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((th * wd, co), jnp.float32),
            pltpu.VMEM((h + 2, wd + 2, ci), x.dtype),
        ],
        interpret=interpret,
    )(xp, _prep_w(w), b.reshape(1, co), scale.reshape(1, ci),
      shift.reshape(1, ci))
    return y, stats


# ---------------------------------------------------------------------
# reference formulations (XLA) for correctness + benchmarking
# ---------------------------------------------------------------------


def xla_conv3x3(x, w, b, *, relu_out=False, with_stats=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)
    if relu_out:
        y = jnp.maximum(y, 0)
    yf = y.astype(jnp.float32)
    stats = (
        jnp.stack([jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))])
        if with_stats
        else jnp.zeros((2, w.shape[3]), jnp.float32)
    )
    return y, stats


def xla_conv3x3_bn_relu_in(x, w, b, scale, shift, *, relu_out=False,
                           with_stats=True):
    xn = jnp.maximum(
        x.astype(jnp.float32) * scale + shift, 0.0
    ).astype(x.dtype)
    return xla_conv3x3(xn, w, b, relu_out=relu_out, with_stats=with_stats)


# ---------------------------------------------------------------------
# benchmark harness: R-MG-34 train-step shapes (batch 128, bf16).
# W padded to a multiple of 16 for the slab variant — the multigrid's
# 56/28/14 grids become 64/32/16 (the XLA baseline is measured on the
# SAME padded shape so the comparison is formulation-vs-formulation,
# plus the true-shape XLA number for the end-to-end delta).
# ---------------------------------------------------------------------

RMG34_SHAPES = [
    # (label, N, H, W, Ci, Co) — materialized-exchange formulation
    ("block1 s0 exch->conv", 128, 56, 56, 96, 64),
    ("block1 s1 exch->conv", 128, 28, 28, 112, 32),
    ("block2 s0 exch->conv", 128, 28, 28, 192, 128),
    ("block3 s0 exch->conv", 128, 14, 14, 384, 256),
    ("block4 s0 conv",       128, 7, 7, 512, 512),
]


def _time(fn, *args, iters=30, warmup=3):
    import time

    for _ in range(warmup):
        r = fn(*args)
    jax.tree.leaves(r)[0].block_until_ready()
    float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):  # best-of-3 bursts: the relay host adds jitter
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _device_time(make_fn, make_x, n1=128, n2=384):
    """Per-call DEVICE time via a two-batch slope fit: wall(N) =
    dispatch_const + dev_per_image * N on this relay host (per-call
    dispatch is ms-scale and batch-independent, so a single-batch wall
    measurement is dispatch noise for sub-10ms kernels). Returns the
    extrapolated device time at n1 images."""
    t1 = _time(make_fn(n1), make_x(n1))
    t2 = _time(make_fn(n2), make_x(n2))
    slope = max(t2 - t1, 1e-9) / (n2 - n1)
    return slope * n1


def bench_shapes(shapes=RMG34_SHAPES, dtype=jnp.bfloat16, n2_factor=3):
    """Prints a per-shape table of DEVICE times (two-batch slope fit,
    see _device_time): XLA true shape, XLA padded shape, pallas slab,
    and the bn-relu-conv chain both ways. Run on real TPU."""
    rng = np.random.default_rng(0)
    rows = []
    for label, n, h, wd, ci, co in shapes:
        wp = ((wd + 15) // 16) * 16
        hp = ((h + 15) // 16) * 16
        w = jnp.asarray(0.05 * rng.standard_normal((3, 3, ci, co)), dtype)
        b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        sc = jnp.asarray(rng.standard_normal((ci,)), jnp.float32)
        sh = jnp.asarray(rng.standard_normal((ci,)), jnp.float32)

        def xs(shape_hw):
            hh, ww = shape_hw
            return lambda nn: jnp.asarray(
                rng.standard_normal((nn, hh, ww, ci)), dtype)

        n2 = n * n2_factor
        t_xla_true = _device_time(
            lambda nn: jax.jit(lambda a: xla_conv3x3(a, w, b)),
            xs((h, wd)), n, n2)
        t_xla_pad = _device_time(
            lambda nn: jax.jit(lambda a: xla_conv3x3(a, w, b)),
            xs((hp, wp)), n, n2)
        t_slab = _device_time(
            lambda nn: jax.jit(lambda a: conv3x3(a, w, b, variant="slab")),
            xs((hp, wp)), n, n2)
        t_xla_pro = _device_time(
            lambda nn: jax.jit(lambda a: xla_conv3x3_bn_relu_in(a, w, b, sc, sh)),
            xs((hp, wp)), n, n2)
        t_pro = _device_time(
            lambda nn: jax.jit(lambda a: conv3x3_bn_relu_in(a, w, b, sc, sh)),
            xs((hp, wp)), n, n2)
        macs = n * hp * wp * 9 * ci * co
        row = dict(label=label, shape=f"{n}x{h}x{wd}x{ci}->{co}",
                   xla_true_us=t_xla_true * 1e6, xla_pad_us=t_xla_pad * 1e6,
                   slab_us=t_slab * 1e6,
                   xla_pro_us=t_xla_pro * 1e6, pro_us=t_pro * 1e6,
                   slab_mxu=2 * macs / 197e12 / t_slab,
                   xla_mxu=2 * macs / 197e12 / t_xla_pad)
        rows.append(row)
        print(
            f"{label:24s} xla {t_xla_true*1e6:6.0f}us pad {t_xla_pad*1e6:6.0f} "
            f"(mxu {row['xla_mxu']*100:4.1f}%) | pallas slab {t_slab*1e6:6.0f} "
            f"(mxu {row['slab_mxu']*100:4.1f}%) | "
            f"bn-relu-conv: xla {t_xla_pro*1e6:6.0f} pallas {t_pro*1e6:6.0f}",
            flush=True,
        )
    return rows


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    bench_shapes()
