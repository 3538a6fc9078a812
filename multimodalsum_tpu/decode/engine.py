"""Model-facing generation API.

Binds :class:`~multimodalsum_tpu.models.bart.BartModel` to the device-side
beam/greedy engines. Equivalent of the per-class ``generate()`` methods of
the reference (``modeling_multimodalsum.py:1399-2127`` and ``:2295-3067``),
with the whole loop jitted.

Key TPU-side differences:

* cross-attention K/V are projected once up front and kept **unexpanded**
  (batch, not batch*beams) — beam reordering never touches them;
* only the self-attention KV cache lives at ``batch*beams`` and is
  reordered with a ``take`` inside the loop;
* the loop runs in ``lax.while_loop`` with early exit when all batches are
  done, so short generations cost proportionally less.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from multimodalsum_tpu.core.config import BartConfig, GenerationConfig
from multimodalsum_tpu.decode.beam_search import BeamResult, beam_search
from multimodalsum_tpu.decode.greedy import GreedyResult, greedy_search
from multimodalsum_tpu.models.bart import BartModel, init_self_attn_cache


def generate(
    model: BartModel,
    params,
    modality_hiddens: Sequence[jnp.ndarray],
    modality_masks: Sequence[Optional[jnp.ndarray]],
    rating_diff: Optional[jnp.ndarray],
    gen: GenerationConfig,
    *,
    bad_words: jnp.ndarray | None = None,
    bad_lengths: jnp.ndarray | None = None,
    rng: jnp.ndarray | None = None,
    kv_quant: str | None = None,
    self_kv_quant: str | None = None,
    cache_mode: str = "reorder",
):
    """Beam-search (num_beams > 1) or greedy/sampling generation.

    Args:
      modality_hiddens: per-modality encoder states ``[b, e, s, d]`` (one
        element for the unimodal decoder, three for multimodal).
      modality_masks: matching bool masks ``[b, e, s]`` (or None).
      rating_diff: ``[b, 1]`` or None (evaluation uses zeros —
        reference ``src/test.py:155``).
      kv_quant: "int8"/"int4" quantizes the (write-once, read-every-step)
        cross-attention K/V; scale-folded attention reads the int values
        directly (ops/attention.entity_cross_attention_quantized).
        "int8+int4" / "int4+int8" set K and V precision independently
        (K errors perturb the pre-softmax logits, V errors average out
        under the probabilities — mixed precision trades between the int8
        and int4 speed/quality points).
      self_kv_quant: "int8" quantizes the decoder self-attention cache
        (per-position scales, folded into logits/probs). ``kv_quant`` also
        accepts "int8_kernel" (the fused Pallas decode kernel — opt-in
        research surface, slower than XLA on v5e, SCALING.md).
      rng: PRNG key for sampling paths; ``None`` means a FIXED
        ``PRNGKey(0)`` — repeated ``do_sample`` calls then draw identical
        noise (per-step variation comes only from ``fold_in(step)``), so
        thread a fresh key per call for independent samples.

    Returns:
      :class:`BeamResult` or :class:`GreedyResult` (sequences include the
      leading decoder-start token, like the reference output).
    """
    cfg: BartConfig = model.config
    K = gen.num_beams

    if K < 1:
        raise ValueError(f"num_beams must be >= 1, got {K} (the reference "
                         f"generate() asserts strictly positive beams)")
    if gen.max_length > cfg.max_position_embeddings:
        raise ValueError(
            f"max_length ({gen.max_length}) exceeds max_position_embeddings "
            f"({cfg.max_position_embeddings})")
    if gen.min_length >= gen.max_length:
        # forced EOS at max_length-1 plus the min-length EOS ban would leave
        # the whole scores row -inf: garbage tokens, silently
        raise ValueError(
            f"min_length ({gen.min_length}) must be < max_length "
            f"({gen.max_length})")

    if not gen.do_sample and gen.num_return_sequences > 1:
        if K == 1:
            raise ValueError(
                "greedy decoding always produces the same output; set "
                "do_sample=True or num_beams > 1 for multiple sequences "
                "(reference generate() asserts the same)")
        if gen.num_return_sequences > K:
            raise ValueError(
                f"num_return_sequences ({gen.num_return_sequences}) cannot "
                f"exceed num_beams ({K}) for greedy beam search")

    sample_mult = 1
    if gen.do_sample and gen.num_return_sequences > 1:
        # sampling draws num_return_sequences INDEPENDENT samples per input
        # (the reference expands the effective batch, :1684-1689); result
        # rows are [input0 x R, input1 x R, ...]. The encoder states stay
        # UNEXPANDED: the cross-attention fold maps an input's R (x K) query
        # rows onto its single K/V copy (EntityCrossAttention), so the
        # dominant per-step HBM read is NOT multiplied by R — only
        # rating_diff expands (it rides the token embedding).
        sample_mult = gen.num_return_sequences
        gen = gen.replace(num_return_sequences=1)

    batch = modality_hiddens[0].shape[0]
    eff_batch = batch * sample_mult

    if model.dtype != jnp.float32:
        # cast float params to the compute dtype once, outside the decode
        # loop — otherwise every while_loop step re-reads the f32 weights and
        # casts them (flax promotes lazily), doubling HBM weight traffic
        params = jax.tree.map(
            lambda x: x.astype(model.dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )

    cross_kv = model.apply({"params": params}, list(modality_hiddens), method=BartModel.init_decode)
    if kv_quant in ("int8", "int4", "int8_kernel", "int8+int4", "int4+int8",
                    "int8_r1", "int4_r1"):
        # shrink the dominant per-step HBM read of the decode loop (the
        # cross-attention K/V are read every step, written once): int8
        # halves it, int4 quarters it. "int8_kernel" additionally routes
        # attention through the fused Pallas decode kernel (slabs arranged
        # in kernel layout once, here).
        from multimodalsum_tpu.ops.quantization import quantize_cross_kv

        rank1 = kv_quant.endswith("_r1")
        base = kv_quant[:-3] if rank1 else kv_quant  # "int4_r1" -> "int4"
        if kv_quant == "int8_kernel":
            bits = 8
        elif "+" in kv_quant:  # mixed K/V precision, e.g. "int8+int4"
            kb, vb = kv_quant.split("+")
            bits = (int(kb[3:]), int(vb[3:]))
        else:
            bits = int(base[3:])
        cross_kv = quantize_cross_kv(
            cross_kv,
            bits=bits,
            kernel_layout=kv_quant == "int8_kernel",
            # "_r1" = rank-1 channel×position scales: same int grid reads,
            # finer effective precision (the per-position factor folds into
            # the logits/probs, not the operand load)
            rank1=rank1,
            # offline decode keeps the quantized slabs inside one jit, so
            # int4 can use the native dtype (XLA fuses the widening into the
            # dot operand load; measured ~1.6x faster cross-attention than
            # the manual nibble unpack, token-identical)
            native_int4=True)
    elif kv_quant is not None:
        raise ValueError(
            f"unknown kv_quant {kv_quant!r} "
            "(supported: 'int8', 'int4', 'int8+int4', 'int4+int8', "
            "'int8_r1', 'int4_r1', 'int8_kernel')")
    masks = [None if m is None else m.astype(bool) for m in modality_masks]

    rows = eff_batch * K if K > 1 else eff_batch
    cache = init_self_attn_cache(cfg, rows, gen.max_length, dtype=model.dtype,
                                 quant=self_kv_quant)
    rating_rows = None
    if rating_diff is not None:
        rating_rows = jnp.repeat(rating_diff, rows // batch, axis=0)

    reorder_cache_fn = None
    if cache_mode == "ancestry" and K > 1:
        # reorder-free beam cache: keep the KV cache unreordered and carry a
        # [rows, L] ancestry matrix updated per selection
        # (ops/ancestry_attention.py)
        from multimodalsum_tpu.ops.ancestry_attention import init_ancestry, update_ancestry

        cache = dict(kv=cache, anc=init_ancestry(rows, gen.max_length))

        def step_fn(tokens, index, cache):
            # NOTE: anc_beams deliberately NOT passed — the block-local
            # gather (O(K) ancestors) measured 4x SLOWER than the global
            # one-hot matmul on v5e: it lowers to b*L tiny [K,K]@[K,n*h]
            # batched matmuls, while the global form is one MXU-shaped
            # [rows,rows]@[rows,n*h] per position whose extra FLOPs ride
            # otherwise-idle MXU cycles (SCALING.md).
            logits, new_kv = model.apply(
                {"params": params}, tokens, index, cache["kv"], cross_kv, masks,
                rating_rows, cache["anc"], method=BartModel.decode_step,
            )
            return logits[:, 0, :], dict(kv=new_kv, anc=cache["anc"])

        def reorder_cache_fn(cache, flat_idx, cur_len):
            return dict(kv=cache["kv"],
                        anc=update_ancestry(cache["anc"], flat_idx, cur_len))

    elif cache_mode in ("reorder", "ancestry"):  # ancestry is moot at K == 1
        def step_fn(tokens, index, cache):
            logits, new_cache = model.apply(
                {"params": params}, tokens, index, cache, cross_kv, masks, rating_rows,
                method=BartModel.decode_step,
            )
            return logits[:, 0, :], new_cache
    else:
        raise ValueError(f"unknown cache_mode {cache_mode!r}")

    common = dict(
        vocab_size=cfg.vocab_size,
        gen=gen,
        decoder_start_token_id=cfg.decoder_start_token_id,
        bos_token_id=cfg.bos_token_id,
        pad_token_id=cfg.pad_token_id,
        eos_token_id=cfg.eos_token_id,
        bad_words=bad_words,
        bad_lengths=bad_lengths,
    )
    if K > 1:
        return beam_search(step_fn, cache, eff_batch, rng=rng,
                           reorder_cache_fn=reorder_cache_fn, **common)
    return greedy_search(step_fn, cache, eff_batch, rng=rng, **common)


def generate_from_input_ids(
    model: BartModel,
    params,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    gen: GenerationConfig,
    **kwargs,
):
    """Stock seq2seq generation (the reference
    ``BartForConditionalGeneration.generate`` path, stage-0 model): encode
    ``input_ids`` then beam/greedy decode — the encoder output becomes a
    single-entity modality bundle."""
    if model.multimodal:
        raise ValueError(
            "generate_from_input_ids decodes a UNIMODAL (stage-0) BartModel; "
            "a multimodal decoder needs three modality bundles — use "
            "generate() with encoder outputs instead")
    hiddens = model.apply({"params": params}, input_ids, attention_mask,
                          method=BartModel.encode)
    b, s = input_ids.shape
    mask = (attention_mask.astype(bool) if attention_mask is not None
            else jnp.ones((b, s), bool))
    return generate(model, params, [hiddens[:, None]], [mask[:, None]],
                    None, gen, **kwargs)
