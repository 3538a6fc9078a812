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


def cached_self_attention_step(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    index: jnp.ndarray,
) -> jnp.ndarray:
    """One-token decoder self-attention against a static-shape KV cache.

    The caller has already written the current step's K/V into the cache at
    ``index``. Positions ``> index`` are masked out, which subsumes both the
    causal mask and cache-tail padding — decode-time sequences are
    left-aligned and contain no pad tokens (reference decode passes
    ``decoder_padding_mask=None``, ``modeling_multimodalsum.py:583-585``).

    Args:
      q: ``[b, 1, n, h]`` pre-scaled query for the current step.
      k_cache / v_cache: ``[b, L, n, h]``.
      index: scalar int32 — position of the current step.

    Returns:
      ``[b, 1, n, h]`` context.
    """
    length = k_cache.shape[1]
    logits = jnp.einsum("btnh,bsnh->bnts", q, k_cache, precision=matmul_precision())
    valid = (jnp.arange(length) <= index)[None, None, None, :]
    logits = jnp.where(valid, logits, TOKEN_MASK_VALUE)
    probs = _softmax_f32(logits, v_cache.dtype)
    return jnp.einsum("bnts,bsnh->btnh", probs, v_cache, precision=matmul_precision())


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
    if _ENTITY_ATTN_IMPL == "pallas":
        from multimodalsum_tpu.ops.pallas_attention import entity_cross_attention_pallas

        return entity_cross_attention_pallas(q, k, v, mask)

    logits = jnp.einsum("btnh,besnh->bents", q, k, precision=matmul_precision())
    if mask is not None:
        logits = jnp.where(
            mask[:, :, None, None, :], logits, jnp.asarray(ENTITY_MASK_VALUE, logits.dtype)
        )
    probs = _attn_dropout(_softmax_f32(logits, v.dtype), dropout_rate, dropout_rng)
    ctx = jnp.einsum("bents,besnh->betnh", probs, v, precision=matmul_precision())

    if mask is None:
        return jnp.mean(ctx, axis=1)

    valid_entity = jnp.any(mask, axis=-1)  # [b, e]
    ctx = jnp.where(valid_entity[:, :, None, None, None], ctx, 0.0)
    count = jnp.sum(valid_entity, axis=1).astype(ctx.dtype)  # [b]
    count = jnp.maximum(count, 1.0)  # all-null-batch guard
    return jnp.sum(ctx, axis=1) / count[:, None, None, None]
