"""Reorder-free beam-decode self-attention via ancestry indices.

The standard beam loop physically reorders the whole self-attention KV cache
every step (``jnp.take`` over ``batch*beams`` rows — a full read+write of the
cache per step). This module removes that copy: the cache stays unreordered
(each row always writes its own slot), and a per-position **ancestry matrix**
``anc[r, p]`` records which row's slot ``p`` holds the K/V of row ``r``'s
hypothesis. Selection updates ancestry (a tiny ``[rows, L]`` int32 gather)
instead of the cache.

Attention then needs ``k_eff[r, p] = k_cache[anc[r, p], p]``. Formulated as a
one-hot matmul so it runs on the MXU (TPU vector gathers are limited):

    onehot[p, r, x] = (anc[r, p] == x)
    k_eff[p, r, :]  = onehot[p] @ k_cache[:, p, :]      (batched over p)

Two implementations with identical semantics:
* :func:`ancestry_attention_xla` — pure XLA (differentiability not needed:
  decode only), used as the CPU/testing fallback;
* :func:`ancestry_attention_pallas` — one kernel per head keeps the gathered
  K/V entirely in VMEM, so the reordered cache never materialises in HBM
  (~3x less self-attention cache traffic at beam 5).

Enabled via ``generate(..., cache_mode="ancestry")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalsum_tpu.core.precision import matmul_precision
from multimodalsum_tpu.ops.masks import TOKEN_MASK_VALUE


_ANCESTRY_IMPL = "xla"


def set_ancestry_impl(impl: str) -> None:
    """'xla' (default; works everywhere) or 'pallas' (TPU kernel, keeps the
    gathered K/V in VMEM)."""
    global _ANCESTRY_IMPL
    assert impl in ("xla", "pallas"), impl
    _ANCESTRY_IMPL = impl


def ancestry_attention(q, k_cache, v_cache, anc, index, num_beams: int | None = None):
    """Dispatch to the active implementation (quantized caches always take
    the XLA path — the Pallas kernel reads raw arrays).

    ``num_beams``: static beam width. Beam selection never crosses batch
    items, so when given, the block-local *logits* form runs: attend to all
    K in-block ancestor candidates and select per position
    (:func:`_local_logits_attention`) — a factor-of-batch FLOP cut over the
    global one-hot gather (O(rows^2)). Measured on v5e at b72/beam5: wins
    for the int8-quantized self cache (0.48 vs 0.66 ms/layer — the global
    form's f32 scale gathers dominate) but LOSES for the bf16 cache (0.81
    vs 0.30 — the [B,K,n,K,L] f32 logits intermediate outweighs the gather),
    so the engine default stays ``num_beams=None`` (SCALING.md). Results
    match the global form to f32 accumulation order, not bit-exactly.
    """
    from multimodalsum_tpu.ops.quantization import QuantizedKV

    if isinstance(k_cache, QuantizedKV):
        return ancestry_attention_xla_quantized(q, k_cache, v_cache, anc, index,
                                                num_beams=num_beams)
    if _ANCESTRY_IMPL == "pallas" and jnp.ndim(index) == 0:
        # the kernel takes a scalar position; per-row positions (beam
        # serving) always go through the XLA path
        return ancestry_attention_pallas(q, k_cache, v_cache, anc, index)
    return ancestry_attention_xla(q, k_cache, v_cache, anc, index,
                                  num_beams=num_beams)


def init_ancestry(rows: int, length: int) -> jnp.ndarray:
    """Identity ancestry: every row owns all of its positions."""
    return jnp.broadcast_to(jnp.arange(rows, dtype=jnp.int32)[:, None],
                            (rows, length))


def update_ancestry(anc: jnp.ndarray, flat_idx: jnp.ndarray, cur_len) -> jnp.ndarray:
    """Selection step: row r' continues row ``flat_idx[r']``'s hypothesis.

    Gather the parents' ancestry, then reset the next write position
    (``cur_len``) to identity — each row writes its own slot next step.
    ``cur_len`` may be a per-row vector (continuous-batching beam serving,
    every slot at its own position); rows whose position is past their
    valid region take a harmless masked-out write.
    """
    rows = anc.shape[0]
    anc = jnp.take(anc, flat_idx, axis=0)
    col = jnp.arange(rows, dtype=anc.dtype)[:, None]
    if jnp.ndim(cur_len) == 1:
        write = jnp.arange(anc.shape[1])[None, :] == cur_len[:, None]
        return jnp.where(write, col, anc)
    return jax.lax.dynamic_update_slice(anc, col, (0, cur_len))


def _valid_positions(L: int, index) -> jnp.ndarray:
    """Attended-position mask broadcastable over ``logits [n, rows, L]``.
    ``index`` is the current write position — scalar (offline beam decode)
    or per-row vector (continuous-batching beam serving)."""
    if jnp.ndim(index) == 1:
        return (jnp.arange(L)[None, :] <= index[:, None])[None]  # [1, rows, L]
    return (jnp.arange(L) <= index)[None, None, :]


def _local_onehot(anc: jnp.ndarray, rows: int, num_beams: int | None, dtype):
    """One-hot over ancestor candidates. Global: ``[rows, L, rows]``.
    Block-local (num_beams given): ``[B, K, L, K]`` — beam selection stays
    within a batch item, so only the K same-block rows can be ancestors."""
    if num_beams is None or num_beams >= rows:
        return (anc[:, :, None] == jnp.arange(rows)[None, None, :]).astype(dtype)
    K = num_beams
    B = rows // K
    anc_local = anc.reshape(B, K, -1) - (jnp.arange(B) * K)[:, None, None]
    return (anc_local[..., None] == jnp.arange(K)).astype(dtype)


def _local_logits_attention(q5, k5, v5, onehot, index, L,
                            ks5=None, vs5=None):
    """Block-local ancestry attention WITHOUT materialising a gathered cache.

    Instead of gathering ``k_eff[r, p] = k[anc[r, p], p]`` and attending
    (O(rows^2·L·d) one-hot-matmul FLOPs), compute logits of every row against
    ALL K in-block ancestor candidates directly —

        logits_all[b, k, n, j, p] = q[b, k, n, :] . k5[b, j, p, n, :]

    (O(B·K^2·L·d), a factor-of-B FLOP cut) — then *select* per position with
    the ancestry one-hot, a cheap elementwise reduce over the K candidates.
    The value side folds the selection into the probabilities
    (``probs_e = probs * onehot``), so the context dot contracts the combined
    ``(j, p)`` axis, an MXU-shaped [K, K·L] x [K·L, h] matmul per (b, n).
    Selection commutes with the head-dim contraction exactly (the one-hot
    picks whole h-vectors), so results match the gather form up to f32
    accumulation order.

    Args:
      q5: ``[B, K, n, h]`` pre-scaled queries.
      k5 / v5: ``[B, K, L, n, h]`` block-shaped caches (any float/int dtype;
        int values are fed to the dots directly).
      onehot: ``[B, K, L, K]`` float — row k's ancestor at position p.
      ks5 / vs5: optional ``[B, K, L, n]`` f32 per-(row, position, head)
        quantisation scales (int8 cache); folded into logits/probs exactly
        like the global quantized form.
    """
    dtype = q5.dtype
    B, K, _, n, h = k5.shape
    logits_all = jnp.einsum("bknh,bjpnh->bknjp", q5, k5.astype(dtype),
                            precision=matmul_precision())
    sel = onehot.transpose(0, 1, 3, 2)                     # [B, K(row), K(j), L]
    logits = jnp.einsum("bknjp,bkjp->bknp",
                        logits_all.astype(jnp.float32), sel)
    if ks5 is not None:
        # ks5 [B, j, L, n] -> selected per-(row, head, pos) scale
        logits = logits * jnp.einsum("bjpn,bkjp->bknp", ks5, sel)
    # valid-position mask broadcast over (B, K, n)
    if jnp.ndim(index) == 1:
        valid = (jnp.arange(L)[None, :] <= index[:, None]).reshape(B, K, 1, L)
    else:
        valid = (jnp.arange(L) <= index)[None, None, None, :]
    logits = jnp.where(valid, logits, TOKEN_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)                # [B, K, n, L] f32
    if vs5 is not None:
        probs = probs * jnp.einsum("bjpn,bkjp->bknp", vs5, sel)
    probs_e = (probs[:, :, :, None, :] * sel[:, :, None, :, :]).astype(dtype)
    ctx = jnp.einsum("bknjp,bjpnh->bknh", probs_e, v5.astype(dtype),
                     precision=matmul_precision())
    rows = B * K
    return ctx.reshape(rows, n, h)[:, None]                # [rows, 1, n, h]


def ancestry_attention_xla(
    q: jnp.ndarray,          # [rows, 1, n, h] pre-scaled
    k_cache: jnp.ndarray,    # [rows, L, n, h] (unreordered)
    v_cache: jnp.ndarray,
    anc: jnp.ndarray,        # [rows, L] int32
    index,                   # scalar: current position
    num_beams: int | None = None,
) -> jnp.ndarray:
    """One-hot-matmul gather + attention, all in XLA. With ``num_beams`` the
    block-local *logits* formulation runs instead — attend to all K in-block
    ancestor candidates and select per position (O(B*K^2*L*d) instead of the
    global gather's O(rows^2*L*d); see :func:`_local_logits_attention`)."""
    rows, L, n, h = k_cache.shape
    local = num_beams is not None and num_beams < rows
    if local:  # block-local [B, K, L, K]
        onehot = _local_onehot(anc, rows, num_beams, jnp.float32)
        B, K = onehot.shape[0], onehot.shape[1]
        return _local_logits_attention(
            q[:, 0].reshape(B, K, n, h),
            k_cache.reshape(B, K, L, n, h),
            v_cache.reshape(B, K, L, n, h),
            onehot, index, L)
    else:
        onehot = _local_onehot(anc, rows, None, k_cache.dtype)
        # k_eff[r, p, n, h] = sum_x onehot[r, p, x] * k_cache[x, p, n, h]
        k_eff = jnp.einsum("rpx,xpnh->rpnh", onehot, k_cache, precision=matmul_precision())
        v_eff = jnp.einsum("rpx,xpnh->rpnh", onehot, v_cache, precision=matmul_precision())
    logits = jnp.einsum("rnh,rpnh->nrp", q[:, 0], k_eff, precision=matmul_precision())
    logits = jnp.where(_valid_positions(L, index), logits, TOKEN_MASK_VALUE)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v_eff.dtype)
    ctx = jnp.einsum("nrp,rpnh->rnh", probs, v_eff, precision=matmul_precision())
    return ctx[:, None]  # [rows, 1, n, h]


def ancestry_attention_xla_quantized(q, kq, vq, anc, index,
                                     num_beams: int | None = None) -> jnp.ndarray:
    """:func:`ancestry_attention_xla` over an int8-quantized cache
    (values ``[rows, L, n, h]`` int8, scale ``[rows, L, n, 1]`` f32,
    per-(row, position, head)). The one-hot gather reads the int8 values
    directly (halving the dominant cache read); the gathered scales fold
    into the logits / probabilities like in
    :func:`~multimodalsum_tpu.ops.attention.cached_self_attention_step_quantized`.
    """
    dtype = q.dtype
    rows, L, n, h = kq.values.shape
    local = num_beams is not None and num_beams < rows
    if local:  # block-local [B, K, L, K]
        onehot = _local_onehot(anc, rows, num_beams, jnp.float32)
        B, K = onehot.shape[0], onehot.shape[1]
        return _local_logits_attention(
            q[:, 0].reshape(B, K, n, h),
            kq.values.reshape(B, K, L, n, h),
            vq.values.reshape(B, K, L, n, h),
            onehot, index, L,
            ks5=kq.scale[..., 0].reshape(B, K, L, n).astype(jnp.float32),
            vs5=vq.scale[..., 0].reshape(B, K, L, n).astype(jnp.float32))
    else:
        onehot = _local_onehot(anc, rows, None, dtype)
        k_eff = jnp.einsum("rpx,xpnh->rpnh", onehot, kq.values.astype(dtype),
                           precision=matmul_precision())
        v_eff = jnp.einsum("rpx,xpnh->rpnh", onehot, vq.values.astype(dtype),
                           precision=matmul_precision())
        ks_eff = jnp.einsum("rpx,xpn->nrp", onehot, kq.scale[..., 0].astype(jnp.float32))
        vs_eff = jnp.einsum("rpx,xpn->nrp", onehot, vq.scale[..., 0].astype(jnp.float32))
    logits = jnp.einsum("rnh,rpnh->nrp", q[:, 0], k_eff,
                        precision=matmul_precision())
    logits = logits.astype(jnp.float32) * ks_eff
    logits = jnp.where(_valid_positions(L, index), logits, TOKEN_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = (probs * vs_eff).astype(dtype)
    ctx = jnp.einsum("nrp,rpnh->rnh", probs, v_eff, precision=matmul_precision())
    return ctx[:, None]  # [rows, 1, n, h]


def _kernel(q_ref, k_ref, v_ref, anc_ref, idx_ref, out_ref):
    """Ancestry attention for one (head, row-block). Blocks:
    q [1, 1, rb, h], k/v [1, rows, L, h] (the head's full slabs — any row can
    be an ancestor, so the gather needs them all), anc [1, rb, L], idx scalar
    in SMEM; out [1, 1, rb, h]. The gather runs in the cache dtype on the MXU
    (accumulating f32) so full-precision slab copies never materialise, and
    row-block tiling keeps the one-hot within VMEM at serving shapes."""
    _, rows, L, h = k_ref.shape
    rb = q_ref.shape[2]
    anc = anc_ref[0, :, :]                                # [rb, L] int32
    onehot = (anc[:, :, None]
              == jax.lax.broadcasted_iota(jnp.int32, (rb, L, rows), 2))
    k = k_ref[0, :, :, :]                                 # [rows(x), L, h]
    v = v_ref[0, :, :, :]
    onehot = onehot.astype(k.dtype)

    # gather on the MXU: k_eff[p, r, h] = onehot[p, r, x] @ k[x, p, h]
    onehot_p = jnp.transpose(onehot, (1, 0, 2))           # [L, rb, rows]
    k_p = jnp.transpose(k, (1, 0, 2))                     # [L, rows, h]
    v_p = jnp.transpose(v, (1, 0, 2))
    k_eff = jax.lax.dot_general(
        onehot_p, k_p, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [L, rb, h]
    v_eff = jax.lax.dot_general(
        onehot_p, v_p, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    q = q_ref[0, 0, :, :].astype(jnp.float32)             # [rb, h]
    logits = jnp.einsum("lrh,rh->rl", k_eff, q)           # [rb, L]
    pos = jax.lax.broadcasted_iota(jnp.int32, (rb, L), 1)
    logits = jnp.where(pos <= idx_ref[0], logits, TOKEN_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)               # [rb, L]
    ctx = jnp.einsum("rl,lrh->rh", probs, v_eff)
    out_ref[0, 0, :, :] = ctx.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "row_block"))
def ancestry_attention_pallas(
    q: jnp.ndarray,          # [rows, 1, n, h]
    k_cache: jnp.ndarray,    # [rows, L, n, h]
    v_cache: jnp.ndarray,
    anc: jnp.ndarray,        # [rows, L]
    index,
    interpret: bool = False,
    row_block: int = 32,
) -> jnp.ndarray:
    rows, L, n, h = k_cache.shape
    # largest divisor of rows not exceeding row_block (VMEM budget for the
    # [rb, L, rows] one-hot and the [L, rb, h] gathered slabs)
    rb = min(row_block, rows)
    while rows % rb:
        rb -= 1
    n_blocks = rows // rb

    qh = jnp.transpose(q[:, 0], (1, 0, 2)).reshape(n, n_blocks, rb, h)
    kh = jnp.transpose(k_cache, (2, 0, 1, 3))             # [n, rows, L, h]
    vh = jnp.transpose(v_cache, (2, 0, 1, 3))
    anc_b = anc.reshape(n_blocks, rb, L)
    idx = jnp.asarray(index, jnp.int32).reshape(1)

    out = pl.pallas_call(
        _kernel,
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, rb, h), lambda ni, bi: (ni, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, L, h), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, L, h), lambda ni, bi: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, L), lambda ni, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rb, h), lambda ni, bi: (ni, bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_blocks, rb, h), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, anc_b, idx)
    out = out.reshape(n, rows, h)
    return jnp.transpose(out, (1, 0, 2))[:, None]         # [rows, 1, n, h]
