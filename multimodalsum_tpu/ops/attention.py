"""Fused attention math as pure jit-friendly functions.

These are the XLA compute paths for the three attention flavours of the
model (reference ``SelfAttention.get_head_output``,
``modeling_multimodalsum.py:752-875``):

* token self-attention (encoder, and decoder with a causal mask),
* incremental decoder self-attention against a static-shape KV cache,
* multi-entity cross-attention with "parallel mean" combination over valid
  entities (the core MultimodalSum mechanism).

Everything is batch-major. The entity axis of the reference ``[src, e, b, d]``
time-major layout becomes a plain leading batch-like axis ``[b, e, s, ...]``,
so a single 5-D einsum drives the MXU instead of a loop of bmm's. Softmax is
always computed in float32.

A Pallas kernel can replace :func:`entity_cross_attention` behind the same
signature (see ``multimodalsum_tpu/ops/pallas_attention.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodalsum_tpu.core.precision import matmul_precision
from multimodalsum_tpu.ops.masks import ENTITY_MASK_VALUE, TOKEN_MASK_VALUE


def _softmax_f32(logits: jnp.ndarray, dtype) -> jnp.ndarray:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)


def _attn_dropout(probs: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout on attention probabilities (reference
    ``F.dropout(attn_weights, p=attention_dropout)``, ``:852``)."""
    if rate <= 0.0 or rng is None:
        return probs
    keep = jax.random.bernoulli(rng, 1.0 - rate, probs.shape)
    return jnp.where(keep, probs / (1.0 - rate), 0.0).astype(probs.dtype)


def token_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray | None = None,
    causal_bias: jnp.ndarray | None = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Plain multi-head attention over tokens.

    Args:
      q: ``[b, t, n, h]`` pre-scaled queries.
      k: ``[b, s, n, h]`` keys.
      v: ``[b, s, n, h]`` values.
      key_valid: optional bool ``[b, s]``, True for attendable keys.
      causal_bias: optional additive ``[t, s]`` float mask (0 / TOKEN_MASK_VALUE).

    Returns:
      ``[b, t, n, h]`` context.
    """
    logits = jnp.einsum("btnh,bsnh->bnts", q, k, precision=matmul_precision())
    if causal_bias is not None:
        logits = logits + causal_bias[None, None, :, :].astype(logits.dtype)
    if key_valid is not None:
        logits = jnp.where(key_valid[:, None, None, :], logits, TOKEN_MASK_VALUE)
    probs = _attn_dropout(_softmax_f32(logits, v.dtype), dropout_rate, dropout_rng)
    return jnp.einsum("bnts,bsnh->btnh", probs, v, precision=matmul_precision())


def _cache_valid_mask(length: int, index, window: int = 1) -> jnp.ndarray:
    """[1|b, 1, T, L] bool: for query ``j`` of a ``window`` of consecutive
    positions starting at ``index``, cache positions ``<= index + j`` are
    attendable. ``index`` may be a scalar (all rows at the same step) or a
    per-row vector (serving). ``window == 1`` is the classic one-token step;
    ``window > 1`` is the multi-token (speculative-verify) step, where the
    per-query offset doubles as the causal mask inside the window."""
    pos = jnp.arange(length)
    if jnp.ndim(index) == 1:
        q_pos = index[:, None] + jnp.arange(window)[None, :]        # [b, T]
        return (pos[None, None, :] <= q_pos[:, :, None])[:, None, :, :]
    q_pos = index + jnp.arange(window)                              # [T]
    return (pos[None, :] <= q_pos[:, None])[None, None, :, :]


def cached_self_attention_step(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    index: jnp.ndarray,
) -> jnp.ndarray:
    """Decoder self-attention against a static-shape KV cache.

    The caller has already written the current step's K/V into the cache at
    ``index`` (one token) or ``index .. index+T-1`` (a T-token verify
    window). Positions ``> index + j`` are masked out for query ``j``, which
    subsumes the causal mask (within and before the window) and cache-tail
    padding — decode-time sequences are left-aligned and contain no pad
    tokens (reference decode passes ``decoder_padding_mask=None``,
    ``modeling_multimodalsum.py:583-585``).

    Args:
      q: ``[b, T, n, h]`` pre-scaled queries for ``T`` consecutive steps
        (T == 1 for classic decode).
      k_cache / v_cache: ``[b, L, n, h]``.
      index: scalar int32 — position of the window's first query — or
        vector ``[b]`` of per-row positions (continuous-batching serving).

    Returns:
      ``[b, T, n, h]`` context.
    """
    length = k_cache.shape[1]
    logits = jnp.einsum("btnh,bsnh->bnts", q, k_cache, precision=matmul_precision())
    valid = _cache_valid_mask(length, index, window=q.shape[1])
    logits = jnp.where(valid, logits, TOKEN_MASK_VALUE)
    probs = _softmax_f32(logits, v_cache.dtype)
    return jnp.einsum("bnts,bsnh->btnh", probs, v_cache, precision=matmul_precision())


def cached_self_attention_step_quantized(q, kq, vq, index) -> jnp.ndarray:
    """:func:`cached_self_attention_step` over an int8-quantized KV cache.

    The cache carries per-(row, position, head) scales (reduced over the
    head dim). The K scale cannot fold into the query (it varies along the
    attended position axis), but it folds into the *logits* and the V scale
    into the *probabilities* — both tiny ``[b, n, t, s]`` elementwise
    multiplies — so the int8 values feed the einsums directly and the
    dequantised cache never materialises.

    Args:
      q: ``[b, 1, n, h]`` pre-scaled query.
      kq / vq: :class:`~multimodalsum_tpu.ops.quantization.QuantizedKV` with
        values ``[b, L, n, h]`` int8 and scale ``[b, L, n, 1]`` f32.
      index: scalar int32 current position.
    """
    dtype = q.dtype
    length = kq.values.shape[1]
    logits = jnp.einsum("btnh,bsnh->bnts", q, kq.values.astype(dtype),
                        precision=matmul_precision())
    k_scale = jnp.transpose(kq.scale[..., 0], (0, 2, 1))[:, :, None, :]  # [b,n,1,s]
    logits = logits.astype(jnp.float32) * k_scale
    valid = _cache_valid_mask(length, index, window=q.shape[1])
    logits = jnp.where(valid, logits, TOKEN_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    v_scale = jnp.transpose(vq.scale[..., 0], (0, 2, 1))[:, :, None, :]
    probs = (probs * v_scale).astype(dtype)
    return jnp.einsum("bnts,bsnh->btnh", probs, vq.values.astype(dtype),
                      precision=matmul_precision())


# Implementation switch for the entity-attention hot op: "xla" (default,
# differentiable, used in training) or "pallas" (fused VMEM kernel for the
# decode path — no autodiff). Set via set_entity_attention_impl.
_ENTITY_ATTN_IMPL = "xla"


def set_entity_attention_impl(impl: str) -> None:
    global _ENTITY_ATTN_IMPL
    assert impl in ("xla", "pallas"), impl
    _ENTITY_ATTN_IMPL = impl


def entity_attention_impl() -> str:
    return _ENTITY_ATTN_IMPL


def entity_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Multi-entity cross-attention with masked parallel-mean combination.

    Semantics of reference ``SelfAttention.get_head_output`` for the
    encoder-decoder case (``modeling_multimodalsum.py:811-875``):

    * attention runs independently per entity (the query is shared);
    * padded key positions are *replaced* with ``-2**16`` (not -inf) so a
      fully-null entity yields a finite uniform softmax instead of NaN;
    * per-entity outputs are combined by a mean over *valid* entities
      (entity = valid iff any key position is valid), with outputs of null
      entities zeroed;
    * if every entity of a batch element is null, the denominator is forced
      to 1 so the output is exactly zero (the all-null-batch guard,
      reference ``:864-865``).

    Args:
      q: ``[b, t, n, h]`` pre-scaled queries.
      k: ``[b, e, s, n, h]`` per-entity keys.
      v: ``[b, e, s, n, h]`` per-entity values.
      mask: bool ``[b, e, s]`` True-for-valid, or None (all valid).

    Returns:
      ``[b, t, n, h]`` context (mean over valid entities).
    """
    if _ENTITY_ATTN_IMPL == "pallas" and (dropout_rate <= 0.0 or dropout_rng is None):
        # differentiable fused kernel (custom VJP recomputes the attention
        # in the backward — the [b, e, n, t, s] probabilities never reach
        # HBM in either direction); attention dropout has no kernel path,
        # so it falls through to the XLA math below
        from multimodalsum_tpu.ops.pallas_attention import entity_cross_attention_fused

        return entity_cross_attention_fused(q, k, v, mask)

    logits = jnp.einsum("btnh,besnh->bents", q, k, precision=matmul_precision())
    if mask is not None:
        logits = jnp.where(
            mask[:, :, None, None, :], logits, jnp.asarray(ENTITY_MASK_VALUE, logits.dtype)
        )
    probs = _attn_dropout(_softmax_f32(logits, v.dtype), dropout_rate, dropout_rng)
    ctx = jnp.einsum("bents,besnh->betnh", probs, v, precision=matmul_precision())

    if mask is None:
        return jnp.mean(ctx, axis=1)

    return _entity_parallel_mean(ctx, mask)


def _entity_parallel_mean(ctx: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of per-entity contexts ``[b, e, t, n, h]`` over valid entities
    (entity valid iff any key position is valid), with the all-null-batch
    guard (reference ``:854-869``)."""
    valid_entity = jnp.any(mask, axis=-1)  # [b, e]
    ctx = jnp.where(valid_entity[:, :, None, None, None], ctx, 0.0)
    count = jnp.sum(valid_entity, axis=1).astype(ctx.dtype)  # [b]
    count = jnp.maximum(count, 1.0)  # all-null-batch guard
    return jnp.sum(ctx, axis=1) / count[:, None, None, None]


def entity_cross_attention_quantized(
    q: jnp.ndarray,
    kq,
    vq,
    mask: jnp.ndarray | None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """:func:`entity_cross_attention` over int8/int4-quantized K/V without
    ever materialising the dequantised tensors in HBM.

    The per-channel scales are folded out of the big value tensors
    algebraically: the K scale multiplies the *query* (the scale lives on
    the contracted head-dim axis, so ``q·(k_int*s) == (q*s)·k_int``) and the
    V scale multiplies the per-entity *context* (``(p@v_int)*s``). Both are
    tiny ``[b, e, t, n, h]``-broadcast elementwise ops, and the einsums read
    the int8 values directly — XLA fuses the int8→bf16 convert into the dot
    operand load, so per-step cross-KV HBM traffic actually halves (the
    ``dequantize()+entity_cross_attention`` composition materialises bf16
    copies instead). Numerics match the dequantised path to bf16 rounding.

    Args:
      q: ``[b, t, n, h]`` pre-scaled queries (any float dtype).
      kq / vq: :class:`~multimodalsum_tpu.ops.quantization.QuantizedKV` or
        ``QuantizedKV4`` with values ``[b, e, s, n, h]`` (packed on the last
        axis for int4) and scale ``[b, e, 1, n, h]``.
      mask: bool ``[b, e, s]`` or None.
    """
    from multimodalsum_tpu.ops.quantization import (
        QuantizedKV4, QuantizedKVR1, unpack_int4_values)

    k_int = (unpack_int4_values(kq.values) if isinstance(kq, QuantizedKV4)
             else kq.values)
    v_int = (unpack_int4_values(vq.values) if isinstance(vq, QuantizedKV4)
             else vq.values)
    dtype = q.dtype

    def _pos_bents(pos_scale):
        # [b, e, s, n, 1] f32 -> [b, e, n, 1, s] for a fused elementwise
        # multiply on the "bents" logits/probs along the attended axis
        return jnp.transpose(pos_scale[..., 0], (0, 1, 3, 2))[:, :, :, None, :]

    # fold the K scale into the query, per entity: [b, e, t, n, h]
    q_e = (q[:, None].astype(jnp.float32) * kq.scale).astype(dtype)
    logits = jnp.einsum("betnh,besnh->bents", q_e, k_int.astype(dtype),
                        precision=matmul_precision())
    if isinstance(kq, QuantizedKVR1):
        # rank-1 K: the per-position factor is constant along the contracted
        # head dim, so it scales whole logit columns post-dot
        logits = logits.astype(jnp.float32) * _pos_bents(kq.pos_scale)
    if mask is not None:
        logits = jnp.where(
            mask[:, :, None, None, :], logits, jnp.asarray(ENTITY_MASK_VALUE, logits.dtype)
        )
    probs = _attn_dropout(_softmax_f32(logits, dtype), dropout_rate, dropout_rng)
    if isinstance(vq, QuantizedKVR1):
        # rank-1 V: per-position factor folds into the probabilities
        # (elementwise, fused); the context einsum still reads raw ints
        probs = (probs.astype(jnp.float32)
                 * _pos_bents(vq.pos_scale)).astype(dtype)
    ctx = jnp.einsum("bents,besnh->betnh", probs, v_int.astype(dtype),
                     precision=matmul_precision())
    # fold the V scale into the per-entity context ([b,e,1,n,h] broadcasts
    # over the t axis)
    ctx = (ctx.astype(jnp.float32) * vq.scale).astype(dtype)

    if mask is None:
        return jnp.mean(ctx, axis=1)
    return _entity_parallel_mean(ctx, mask)
