"""Post-training int8 quantization for the serving path.

TPU v5e executes int8xint8->int32 on the MXU at twice the bf16 rate
(394 TOPS vs 197 TFLOP/s). Measured at the R-MG-34 batch-128 hot
shapes (`tools/bench_int8.py`, 32-conv chains incl. the requantize):
1.1-1.8x per conv over bf16, up to 224 TOP/s. The reference has no
quantized path at all (Torch7/CUDA fp32) — this is a TPU-native
serving addition, reachable via `-int8` (inference-only).

Scheme (weights static, activations dynamic):
  - weights: per-output-channel symmetric int8,
    scale[co] = max|w[:, :, :, co]| / 127 — folded into the dequant
  - activations: per-tensor dynamic symmetric int8 — absmax computed
    on the fly (one fused reduction over an activation XLA was going
    to read anyway), so no calibration pass or scale store is needed
  - accumulation in int32 on the MXU; dequant to the compute dtype,
    then bias/BN/ReLU run unchanged in bf16

A quantized kernel replaces the conv's ``w`` leaf with a dict
``{"w8": int8(k,k,ci,co), "scale": f32(co,)}`` — still an ordinary
pytree, so replication/sharding/checkpointing work untouched.
`nn.Conv.apply` and `nn.ConvBN.apply_parts` branch on that structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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


def quantize_act(x):
    """Dynamic per-tensor symmetric int8: returns (x8, scale)."""
    sx = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return x8, sx


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
    transposed lowering is not int8-profitable and whose apply has no
    quantized branch."""

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
