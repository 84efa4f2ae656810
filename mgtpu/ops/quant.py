"""Post-training int8 quantization for the serving path.

TPU v5e executes int8xint8->int32 on the MXU at twice the bf16 rate
(394 TOPS vs 197 TFLOP/s). Measured at the R-MG-34 batch-128 hot
shapes (`tools/bench_int8.py`, 32-conv chains incl. the requantize):
1.1-1.8x per conv over bf16, up to 224 TOP/s. The reference has no
quantized path at all (Torch7/CUDA fp32) — this is a TPU-native
serving addition, reachable via `-int8` (inference-only).

Scheme (weights static, activations dynamic OR calibrated-static):
  - weights: per-output-channel symmetric int8,
    scale[co] = max|w[:, :, :, co]| / 127 — folded into the dequant
  - activations, dynamic mode: per-tensor symmetric int8 — absmax
    computed on the fly. No calibration pass, but the data-dependent
    reduction must COMPLETE before the quantize can run, so every conv
    pays a serialized extra read of its input: measured end-to-end
    this loses to bf16 (0.88x, PARITY §int8) even though each conv's
    MACs run 2x.
  - activations, static mode (`calibrate`, CLI `-int8Calib N`):
    per-tensor scales recorded as the max dynamic absmax over N
    calibration batches and FROZEN into the kernel dict ("sx"). The
    quantize becomes a constant-scale elementwise op XLA fuses into
    the producing BN/ReLU (or resample) pass — no extra reduction, no
    serialization — and the conv reads int8 (half the bf16 bytes).
    This is the serving configuration.
  - accumulation in int32 on the MXU; dequant to the compute dtype,
    then bias/BN/ReLU run unchanged in bf16

A quantized kernel replaces the conv's ``w`` leaf with a dict
``{"w8": int8(k,k,ci,co), "scale": f32(co,)[, "sx": f32(n_slots,)]}``
— still an ordinary pytree, so replication/sharding/checkpointing work
untouched. `nn.Conv.apply` and `nn.ConvBN.apply_parts` branch on that
structure; "sx" slot 0 is the plain conv input, slots of apply_parts
follow its part order (down/same/up).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def quantize_kernel(w) -> dict:
    """Per-output-channel symmetric int8 quantization of an HWIO conv
    kernel."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"w8": w8, "scale": scale}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "w8" in w


def quantize_act(x, sx=None):
    """Per-tensor symmetric int8: returns (x8, scale). With ``sx``
    (a calibrated static scale) the absmax reduction is skipped and the
    quantize is a pure elementwise op; without it the scale is computed
    dynamically from this tensor."""
    if sx is None:
        sx = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
        sx = jnp.maximum(sx, 1e-12)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return x8, sx


# --- calibration (static activation scales) -------------------------------
# Collector keyed by (id(kernel dict), slot): while active (eager
# forwards only — `calibrate` never jits), the nn call sites report each
# dynamic scale they computed; `calibrate` then freezes the per-slot max
# into the kernel dict as "sx". Slot 0 = a plain Conv's input; an
# apply_parts conv numbers its exchange parts in order.
_CALIB: Optional[dict] = None


def record_scale(wdict: dict, slot: int, sx) -> None:
    """nn call-site hook: report one observed dynamic activation scale.
    No-op unless a calibration pass is active."""
    if _CALIB is None:
        return
    key = (id(wdict), slot)
    prev = _CALIB.get(key)
    val = float(sx)
    if prev is None or val > prev[1]:
        _CALIB[key] = (wdict, val)


def calibrate(model, params_q, stats, batches):
    """Run ``batches`` (host arrays, NHWC) through the quantized model
    eagerly, recording every conv input's dynamic absmax scale; freeze
    the per-site max over all batches into each kernel dict as "sx".
    Returns ``params_q`` (mutated in place — the dicts are ordinary
    pytree nodes, so downstream replication/jit see the new leaves)."""
    global _CALIB
    if _CALIB is not None:
        raise RuntimeError("nested calibration passes")

    # Drop any stale frozen scales first: an existing "sx" suppresses
    # record_scale at the call site, so re-calibrating an already
    # calibrated tree would otherwise be a silent no-op.
    def _drop_sx(node):
        if isinstance(node, dict):
            node.pop("sx", None)
            for v in node.values():
                _drop_sx(v)
    _drop_sx(params_q)

    _CALIB = {}
    try:
        for x in batches:
            model.apply(params_q, stats, jnp.asarray(x), train=False)
    finally:
        col, _CALIB = _CALIB, None
    groups: dict = {}
    for (oid, slot), (wd, val) in col.items():
        groups.setdefault(oid, (wd, {}))[1][slot] = val
    for _oid, (wd, slots) in groups.items():
        # A kernel's slots must have been recorded contiguously from 0
        # on every calibration forward — a conv whose part count varies
        # across forwards would silently mis-map slot -> scale here.
        n = max(slots) + 1
        assert sorted(slots) == list(range(n)), (
            f"non-contiguous calibration slots {sorted(slots)}"
        )
        # device-committed, NOT host numpy: a numpy leaf inside a jitted
        # fn's params is re-transferred on every call (measured 2x
        # end-to-end through the axon relay: 40 tiny H2D puts per step)
        wd["sx"] = jnp.asarray(
            [max(slots[i], 1e-12) for i in range(n)], jnp.float32
        )
    return params_q


def conv_i8(x8, w8, stride, pad):
    """int8 x int8 -> int32 conv on the MXU."""
    return jax.lax.conv_general_dilated(
        x8, w8,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def quantize_params(params):
    """Replace every 4-D conv kernel leaf ``{"w": ...}`` in a params
    tree with its int8 form. 2x2 kernels are skipped — those are the
    U-Nets' ConvTranspose upsamplers (`nn.ConvTranspose`), whose
    transposed lowering is not int8-profitable. The shape heuristic has
    two known edges, both bounded: a plugin ConvTranspose with k != 2
    DOES get quantized but `ConvTranspose.apply` dequantizes it (exact
    float compute, no crash), and a genuine 2x2 regular Conv silently
    stays float (correct, just unaccelerated)."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k == "w"
                    and hasattr(v, "ndim")
                    and getattr(v, "ndim", 0) == 4
                    and v.shape[:2] != (2, 2)
                ):
                    out[k] = quantize_kernel(v)
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)
