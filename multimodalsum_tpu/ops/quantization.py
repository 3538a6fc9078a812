"""Int8 quantization for decode-time cross-attention K/V.

The cross-attention K/V of the three modalities are the largest per-step HBM
read of the beam decode (every step touches all layers' projected encoder
states — text 8×160 + img 10×196 + table rows, ×12 layers). They are
computed once per sequence and read ~max_length times, so symmetric int8
with per-(entity, head, channel) scales halves that traffic at negligible
quality cost; dequantisation is an elementwise multiply XLA fuses into the
attention einsum's operand.

No reference equivalent (the reference serves in fp16 at best); this is a
TPU-serving feature, disabled by default and off for all parity tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class QuantizedKV(NamedTuple):
    """Symmetric int8 tensor + per-channel scale (broadcastable)."""

    values: jnp.ndarray   # int8, same shape as the original
    scale: jnp.ndarray    # f32, amax/127 with the reduced axis kept at 1


def quantize_int8(x: jnp.ndarray, axis: int) -> QuantizedKV:
    """Symmetric per-channel quantisation along ``axis`` (the reduced axis)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return QuantizedKV(values=q, scale=scale)


def dequantize(q: QuantizedKV, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.values.astype(jnp.float32) * q.scale).astype(dtype)


def quantize_cross_kv(cross_kv, *, seq_axis: int = 2):
    """Quantize a layers×modalities nested tuple of (k, v) pairs
    (each ``[b, e, s, n, h]``), reducing over the sequence axis."""
    return tuple(
        tuple(
            (quantize_int8(k, axis=seq_axis), quantize_int8(v, axis=seq_axis))
            for (k, v) in per_layer
        )
        for per_layer in cross_kv
    )
