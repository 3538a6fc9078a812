"""Int8 / int4 quantization for decode-time cross-attention K/V.

The cross-attention K/V of the three modalities are the largest per-step HBM
read of the beam decode (every step touches all layers' projected encoder
states — text 8×160 + img 10×196 + table rows, ×12 layers). They are
computed once per sequence and read ~max_length times, so symmetric int8
with per-(entity, head, channel) scales halves that traffic at negligible
quality cost; int4 (two nibbles packed per byte) quarters it at a larger
but still small roundtrip error. Dequantisation is elementwise work XLA
fuses into the attention einsum's operand load.

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


def _symmetric_quantize(x: jnp.ndarray, axis: int, qmax: int):
    """Shared symmetric amax/round/clip core for int8 (qmax=127) and int4
    (qmax=7): one place for the epsilon/rounding policy."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.clip(jnp.round(xf / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale


def quantize_int8(x: jnp.ndarray, axis: int) -> QuantizedKV:
    """Symmetric per-channel quantisation along ``axis`` (the reduced axis)."""
    q, scale = _symmetric_quantize(x, axis, 127)
    return QuantizedKV(values=q, scale=scale)


class QuantizedKV4(NamedTuple):
    """Symmetric int4 tensor: two signed nibbles packed per int8 along the
    last axis (head dim), plus a per-channel f32 scale (amax/7)."""

    values: jnp.ndarray   # int8, last axis = original // 2
    scale: jnp.ndarray    # f32, the reduced axis kept at 1


def quantize_int4(x: jnp.ndarray, axis: int) -> QuantizedKV4:
    """Symmetric per-channel int4 quantisation along ``axis``. The FIRST half
    of the last axis packs into the low nibbles and the second half into the
    high nibbles, so dequantisation is two shifts + a concat — no elementwise
    interleave (an interleave forces an expensive lane relayout on TPU)."""
    if x.shape[-1] % 2:
        raise ValueError(f"int4 packing needs an even last axis, got {x.shape}")
    q, scale = _symmetric_quantize(x, axis, 7)
    half = x.shape[-1] // 2
    lo, hi = q[..., :half], q[..., half:]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F), jnp.left_shift(hi, 4))
    return QuantizedKV4(values=packed.astype(jnp.int8), scale=scale)


def quantize_int4_native(x: jnp.ndarray, axis: int) -> QuantizedKV:
    """Symmetric per-channel int4 quantisation using the NATIVE ``jnp.int4``
    dtype (XLA packs two values per byte on TPU and fuses the int4->bf16
    widening into the dot operand load — the measured attention read runs at
    the packed byte rate, unlike :func:`quantize_int4`'s manual shift+concat
    unpack, which materialises and loses to int8; SCALING.md A/B table).

    Same integer grid and scales as :func:`quantize_int4`, so attention
    outputs (and generated tokens) are identical to the packed path.

    Only for values that stay INSIDE one jit (offline ``generate``): int4
    arrays crossing a jit boundary crash the experimental axon dev backend,
    so the serving engine keeps the packed byte slabs.
    """
    q, scale = _symmetric_quantize(x, axis, 7)
    return QuantizedKV(values=q.astype(jnp.int4), scale=scale)


class QuantizedKVR1(NamedTuple):
    """Symmetric int tensor with a RANK-1 scale decomposition: per-channel
    scale × per-position scale (both kept broadcastable).

    Plain per-channel scales (amax over the attended positions) waste the
    int4 grid whenever one outlier position inflates a channel's range —
    every other position's values collapse onto a few ints. Factoring the
    scale as ``s_ch[..., 1, n, h] * s_pos[..., s, n, 1]`` re-equalises the
    grid per position at zero extra HBM traffic: in attention, s_ch folds
    into the query exactly like the per-channel path, and s_pos folds into
    the (already-f32) pre-softmax logits / probabilities along the attended
    axis — both fused elementwise ops, the einsums still read raw ints.
    """

    values: jnp.ndarray    # int8 or jnp.int4, same shape as the original
    scale: jnp.ndarray     # f32 per-channel factor, position axis kept at 1
    pos_scale: jnp.ndarray  # f32 per-position factor, channel axis kept at 1


def quantize_rank1(x: jnp.ndarray, axis: int, *, bits: int = 4,
                   native_int4: bool = True) -> QuantizedKVR1:
    """Symmetric rank-1 (channel × position) quantisation along ``axis``.

    Two-step decomposition: per-channel amax over positions equalises
    channel ranges (same statistic the per-channel path uses), then the
    per-position amax of the channel-normalised tensor sets each position's
    grid. ``q = round(x / (s_ch * s_pos))`` clipped to the ``bits`` grid.

    ``axis`` is the attended-position axis (reduced by the per-channel
    scale); the per-position scale reduces over the LAST axis (head dim),
    matching the ``[..., s, n, h]``-layout K/V this module handles.
    """
    qmax = {8: 127, 4: 7}[bits]
    xf = x.astype(jnp.float32)
    amax_ch = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    s_ch = jnp.maximum(amax_ch, 1e-8)          # normalise channels to ~[-1,1]
    y = xf / s_ch
    amax_pos = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s_pos = jnp.maximum(amax_pos, 1e-12) / qmax
    q = jnp.clip(jnp.round(y / s_pos), -qmax, qmax)
    dt = jnp.int4 if (bits == 4 and native_int4) else jnp.int8
    return QuantizedKVR1(values=q.astype(dt), scale=s_ch,
                         pos_scale=s_pos)


def unpack_int4_values(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed int4 bytes -> int8 values (inverse of the packing in
    :func:`quantize_int4`, without applying the scale)."""
    # arithmetic right shift on int8 sign-extends the nibbles
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return jnp.concatenate([lo, hi], axis=-1)


class QuantizedKVKernel(NamedTuple):
    """Int8 K/V pre-arranged for the fused Pallas decode kernel:
    values ``[b, n, e, s, h]``, scale ``[b, n, e, h]`` (f32). Built once per
    generated sequence so the decode loop never transposes the slabs."""

    values: jnp.ndarray
    scale: jnp.ndarray


def dequantize(q, dtype=jnp.bfloat16) -> jnp.ndarray:
    if isinstance(q, QuantizedKVKernel):
        # [b, n, e, s, h] values x [b, n, e, h] scale: the generic branch
        # below would right-align-broadcast the scale along the wrong axes
        return (q.values.astype(jnp.float32)
                * q.scale[:, :, :, None, :]).astype(dtype)
    if isinstance(q, QuantizedKV4):
        vals = unpack_int4_values(q.values)
        return (vals.astype(jnp.float32) * q.scale).astype(dtype)
    if isinstance(q, QuantizedKVR1):
        return (q.values.astype(jnp.float32) * q.scale
                * q.pos_scale).astype(dtype)
    return (q.values.astype(jnp.float32) * q.scale).astype(dtype)




def to_kernel_layout(q: QuantizedKV) -> QuantizedKVKernel:
    """``[b, e, s, n, h]``-quantized K/V -> Pallas kernel layout."""
    vals = jnp.transpose(q.values, (0, 3, 1, 2, 4))      # [b, n, e, s, h]
    scale = jnp.transpose(q.scale[:, :, 0], (0, 2, 1, 3))  # [b, n, e, h]
    return QuantizedKVKernel(values=vals, scale=scale.astype(jnp.float32))


def quantize_cross_kv(cross_kv, *, seq_axis: int = 2, bits=8,
                      kernel_layout: bool = False, native_int4: bool = False,
                      rank1: bool = False):
    """Quantize a layers×modalities nested tuple of (k, v) pairs
    (each ``[b, e, s, n, h]``), reducing over the sequence axis.

    ``bits``: 8, 4, or a ``(k_bits, v_bits)`` pair for mixed precision —
    K and V contribute differently to output quality (K errors perturb the
    pre-softmax logits, V errors average out under the probabilities), so
    e.g. ``(8, 4)`` trades between the int8 and int4 speed/quality points.
    ``kernel_layout`` additionally re-arranges for the fused Pallas decode
    kernel (int8 only). ``native_int4`` uses the ``jnp.int4`` dtype instead
    of manual nibble packing (token-identical, faster on TPU; only safe when
    the result never crosses a jit boundary — see quantize_int4_native).
    ``rank1`` uses the channel×position scale decomposition
    (:func:`quantize_rank1`) instead of plain per-channel scales."""
    k_bits, v_bits = bits if isinstance(bits, tuple) else (bits, bits)
    for b_ in (k_bits, v_bits):
        if b_ not in (8, 4):
            raise ValueError(f"unsupported bits={bits} (supported: 8, 4, or a pair)")
    int4 = quantize_int4_native if native_int4 else quantize_int4

    def quant_for(b_):
        if rank1:
            return lambda x, axis: quantize_rank1(
                x, axis, bits=b_,
                native_int4=native_int4 and b_ == 4)
        return quantize_int8 if b_ == 8 else int4

    if kernel_layout and (k_bits != 8 or v_bits != 8):
        raise ValueError("kernel_layout requires bits=8")
    if kernel_layout and rank1:
        raise ValueError("kernel_layout does not support rank-1 scales")
    if kernel_layout and seq_axis != 2:
        # to_kernel_layout hardcodes the [b, e, s, n, h] layout (scale
        # reduced over axis 2); any other seq_axis would silently build a
        # wrong-layout scale for the Pallas kernel
        raise ValueError("kernel_layout requires seq_axis=2")

    def _q(x, b_):
        qx = quant_for(b_)(x, axis=seq_axis)
        return to_kernel_layout(qx) if kernel_layout else qx

    return tuple(
        tuple((_q(k, k_bits), _q(v, v_bits)) for (k, v) in per_layer)
        for per_layer in cross_kv
    )
