"""Pallas TPU kernel: fused multi-entity cross-attention with parallel mean.

Fuses the whole entity-attention chain of
:func:`multimodalsum_tpu.ops.attention.entity_cross_attention` —
per-entity QK^T, -2^16 masking, softmax, PV, entity-validity weighting and
the mean over valid entities — into one VMEM-resident kernel. The XLA path
materialises the per-entity probabilities ``[b, e, n, t, s]`` in HBM between
fusions; here everything for one (batch, head) stays on-chip while the grid
walks the entity axis innermost, accumulating into a VMEM scratch block.

Layout: Mosaic requires the matrix dims to be the trailing two, so the
wrapper transposes to q ``[b, n, t, h]``, k/v ``[b, e, n, s, h]`` and
transposes the output back. Grid ``(batch, heads, entities)``; the output
block for (batch, head) is revisited across the entity axis and written on
the last entity.

Numerics match the XLA path to reduction order (tests/test_pallas.py:
interpreter mode on CPU + compiled on the real chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalsum_tpu.ops.masks import ENTITY_MASK_VALUE


def _kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, acc_ref, count_ref):
    e_idx = pl.program_id(2)
    num_e = pl.num_programs(2)

    @pl.when(e_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        count_ref[0, 0] = 0.0

    # operands stay in their storage dtype (bf16 in production) — the MXU
    # runs the fast low-precision path with f32 accumulation via
    # preferred_element_type; an astype(f32) BEFORE the dot would force the
    # ~8x-slower f32 systolic mode
    q = q_ref[0, 0, :, :]                              # [t, h]
    k = k_ref[0, 0, 0, :, :]                           # [s, h]
    v = v_ref[0, 0, 0, :, :]                           # [s, h]
    mask = mask_ref[0, 0, 0, :].astype(jnp.float32)    # [s]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [t, s] f32
    logits = jnp.where(mask[None, :] > 0, logits, ENTITY_MASK_VALUE)
    # f32 softmax, probs cast back to the value dtype — the XLA path does
    # exactly this (_softmax_f32), so numerics match bit-for-bit closer
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ctx = jnp.dot(probs, v, preferred_element_type=jnp.float32)  # [t, h] f32

    valid = (jnp.max(mask) > 0).astype(jnp.float32)
    acc_ref[:] = acc_ref[:] + ctx * valid
    count_ref[0, 0] = count_ref[0, 0] + valid

    @pl.when(e_idx == num_e - 1)
    def _finalize():
        denom = jnp.maximum(count_ref[0, 0], 1.0)  # all-null-batch guard
        out_ref[0, 0, :, :] = (acc_ref[:] / denom).astype(out_ref.dtype)


def _decode_q8_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, out_ref):
    """Int8 decode cross-attention for one (batch, head) cell.

    Blocks: q ``[1, 1, T, h]`` bf16 (beam-folded queries), k/v
    ``[1, 1, e, s, h]`` int8, scales ``[1, 1, e, h]`` f32, mask ``[1, e, s]``
    f32, out ``[1, 1, T, h]``. The entity loop is unrolled inside the cell
    (one output write); the K scale folds into the query and the V scale
    into the per-entity context, so the int8 slabs never leave VMEM
    dequantised. Accumulates the validity-weighted entity mean in f32.
    """
    e = k_ref.shape[2]
    T, h = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0, :, :].astype(jnp.float32)              # [T, h]

    ctx_acc = jnp.zeros((T, h), jnp.float32)
    count = jnp.float32(0.0)
    for ei in range(e):  # static unroll — e is 1..10
        k = k_ref[0, 0, ei, :, :].astype(jnp.float32)      # [s, h]
        v = v_ref[0, 0, ei, :, :].astype(jnp.float32)
        ks = ks_ref[0, 0, ei, :].astype(jnp.float32)       # [h]
        vs = vs_ref[0, 0, ei, :].astype(jnp.float32)
        mask = mask_ref[0, ei, :].astype(jnp.float32)      # [s]

        q_s = q * ks[None, :]
        logits = jax.lax.dot_general(
            q_s, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, s]
        logits = jnp.where(mask[None, :] > 0, logits, ENTITY_MASK_VALUE)
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.dot(probs, v, preferred_element_type=jnp.float32) * vs[None, :]

        valid = (jnp.max(mask) > 0).astype(jnp.float32)
        ctx_acc = ctx_acc + ctx * valid
        count = count + valid

    out_ref[0, 0, :, :] = (ctx_acc / jnp.maximum(count, 1.0)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_cross_attention_pallas_q8(
    q: jnp.ndarray,          # [b, T, n, h] pre-scaled, beam-folded
    k_vals: jnp.ndarray,     # [b, n, e, s, h] int8 (kernel layout)
    v_vals: jnp.ndarray,
    k_scale: jnp.ndarray,    # [b, n, e, h] f32
    v_scale: jnp.ndarray,
    mask: jnp.ndarray | None,  # [b, e, s] bool
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int8 decode-time entity cross-attention (parallel-mean over
    valid entities). Semantics match
    :func:`multimodalsum_tpu.ops.attention.entity_cross_attention_quantized`
    over the same quantized K/V; the kernel-layout tensors are arranged once
    per generated sequence (``ops.quantization.to_kernel_layout``), so the
    per-step work is one VMEM-resident pass over the int8 slabs."""
    b, T, n, h = q.shape
    _, _, e, s, _ = k_vals.shape
    mask_f = (jnp.ones((b, e, s), jnp.float32) if mask is None
              else mask.astype(jnp.float32))
    qT = jnp.transpose(q, (0, 2, 1, 3))  # [b, n, T, h] — tiny per-step transpose

    out = pl.pallas_call(
        _decode_q8_kernel,
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, 1, T, h), lambda bi, ni: (bi, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e, s, h), lambda bi, ni: (bi, ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e, s, h), lambda bi, ni: (bi, ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e, h), lambda bi, ni: (bi, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e, h), lambda bi, ni: (bi, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, s), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, T, h), lambda bi, ni: (bi, ni, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, T, h), q.dtype),
        interpret=interpret,
    )(qT, k_vals, v_vals, k_scale, v_scale, mask_f)
    return jnp.transpose(out, (0, 2, 1, 3))  # [b, T, n, h]


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, scale_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dq_acc_ref):
    """Backward for one (batch, head, entity) cell, flash-style: the
    attention probabilities are recomputed from q/k (never stored in HBM by
    the forward), then the standard softmax-attention VJP runs entirely in
    VMEM. ``scale_ref`` carries valid_e/count (the parallel-mean weight per
    entity, 0 for null entities) so the entity-mean backward folds into the
    incoming cotangent. dq accumulates across the entity axis (innermost
    grid dim) in a VMEM scratch; dk/dv blocks are written per entity."""
    e_idx = pl.program_id(2)
    num_e = pl.num_programs(2)

    @pl.when(e_idx == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    # bf16 operands + f32 accumulation (see the forward kernel note)
    q = q_ref[0, 0, :, :]                              # [t, h]
    k = k_ref[0, 0, 0, :, :]                           # [s, h]
    v = v_ref[0, 0, 0, :, :]                           # [s, h]
    mask = mask_ref[0, 0, 0, :].astype(jnp.float32)    # [s]
    # the whole [b, e] scale table sits in SMEM (a (1,1) block would violate
    # Mosaic's tile rules); pick this cell's entry by grid position
    w = scale_ref[pl.program_id(0), e_idx]             # valid_e / count
    g = (g_ref[0, 0, :, :].astype(jnp.float32) * w).astype(q.dtype)  # [t, h]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = jnp.where(mask[None, :] > 0, logits, ENTITY_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)  # [t, s]

    dv = jax.lax.dot_general(                          # probs^T @ g -> [s, h]
        probs, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(                          # g @ v^T -> [t, s]
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    probs_f = probs.astype(jnp.float32)
    dl = probs_f * (dp - jnp.sum(dp * probs_f, axis=-1, keepdims=True))
    # masked positions had their logits REPLACED by a constant -> zero grad
    dl = jnp.where(mask[None, :] > 0, dl, 0.0).astype(q.dtype)
    dq_acc_ref[:] = dq_acc_ref[:] + jnp.dot(
        dl, k, preferred_element_type=jnp.float32)             # [t, h]
    dk = jax.lax.dot_general(                          # dl^T @ q -> [s, h]
        dl, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0, 0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, 0, :, :] = dv.astype(dv_ref.dtype)

    @pl.when(e_idx == num_e - 1)
    def _finalize():
        dq_ref[0, 0, :, :] = dq_acc_ref[:].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _entity_attention_bwd_pallas(q, k, v, mask, g, interpret: bool = False):
    """dq/dk/dv for :func:`entity_cross_attention_pallas`. ``mask`` may be
    None (all-valid). Shapes as the forward; ``g`` is the ``[b, t, n, h]``
    output cotangent."""
    b, t, n, h = q.shape
    _, e, s, _, _ = k.shape
    if mask is None:
        mask_f = jnp.ones((b, e, 1, s), jnp.float32)
        scale = jnp.full((b, e), 1.0 / e, jnp.float32)
    else:
        mask_f = mask.astype(jnp.float32)[:, :, None, :]
        valid = jnp.any(mask, axis=-1).astype(jnp.float32)       # [b, e]
        count = jnp.maximum(jnp.sum(valid, axis=1), 1.0)         # [b]
        scale = valid / count[:, None]

    qT = jnp.transpose(q, (0, 2, 1, 3))        # [b, n, t, h]
    kT = jnp.transpose(k, (0, 1, 3, 2, 4))     # [b, e, n, s, h]
    vT = jnp.transpose(v, (0, 1, 3, 2, 4))
    gT = jnp.transpose(g, (0, 2, 1, 3))

    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=(b, n, e),
        in_specs=[
            pl.BlockSpec((1, 1, t, h), lambda bi, ni, ei: (bi, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, h), lambda bi, ni, ei: (bi, ei, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, h), lambda bi, ni, ei: (bi, ei, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s), lambda bi, ni, ei: (bi, ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [b, e] scale table
            pl.BlockSpec((1, 1, t, h), lambda bi, ni, ei: (bi, ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, t, h), lambda bi, ni, ei: (bi, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, h), lambda bi, ni, ei: (bi, ei, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, h), lambda bi, ni, ei: (bi, ei, ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, t, h), q.dtype),
            jax.ShapeDtypeStruct((b, e, n, s, h), k.dtype),
            jax.ShapeDtypeStruct((b, e, n, s, h), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((t, h), jnp.float32)],
        interpret=interpret,
    )(qT, kT, vT, mask_f, scale, gT)

    return (jnp.transpose(dq, (0, 2, 1, 3)),
            jnp.transpose(dk, (0, 1, 3, 2, 4)),
            jnp.transpose(dv, (0, 1, 3, 2, 4)))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def entity_cross_attention_fused(q, k, v, mask):
    """Differentiable fused entity attention: Pallas forward + flash-style
    recompute backward (no ``[b, e, n, t, s]`` probability tensor ever
    reaches HBM in either direction). Same semantics as
    ``ops.attention.entity_cross_attention`` with dropout off."""
    return entity_cross_attention_pallas(q, k, v, mask)


def _fused_fwd(q, k, v, mask):
    return entity_cross_attention_pallas(q, k, v, mask), (q, k, v, mask)


def _fused_bwd(residuals, g):
    q, k, v, mask = residuals
    dq, dk, dv = _entity_attention_bwd_pallas(q, k, v, mask, g)
    dmask = (None if mask is None
             else np.zeros(mask.shape, dtype=jax.dtypes.float0))
    return dq, dk, dv, dmask


entity_cross_attention_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def entity_cross_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``ops.attention.entity_cross_attention`` (same shapes):
    q ``[b, t, n, h]`` pre-scaled, k/v ``[b, e, s, n, h]``, mask ``[b, e, s]``.
    """
    b, t, n, h = q.shape
    _, e, s, _, _ = k.shape
    if mask is None:
        mask_f = jnp.ones((b, e, 1, s), jnp.float32)
    else:
        mask_f = mask.astype(jnp.float32)[:, :, None, :]

    qT = jnp.transpose(q, (0, 2, 1, 3))        # [b, n, t, h]
    kT = jnp.transpose(k, (0, 1, 3, 2, 4))     # [b, e, n, s, h]
    vT = jnp.transpose(v, (0, 1, 3, 2, 4))

    grid = (b, n, e)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, t, h), lambda bi, ni, ei: (bi, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, h), lambda bi, ni, ei: (bi, ei, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, h), lambda bi, ni, ei: (bi, ei, ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s), lambda bi, ni, ei: (bi, ei, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, h), lambda bi, ni, ei: (bi, ni, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, t, h), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((t, h), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qT, kT, vT, mask_f)
    return jnp.transpose(out, (0, 2, 1, 3))  # back to [b, t, n, h]
