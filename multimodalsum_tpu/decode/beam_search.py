"""Static-shape beam search inside ``lax.while_loop``.

Reimplements the reference beam search (``modeling_multimodalsum.py:1871-2127``
with Python-object ``BeamHypotheses`` bookkeeping, ``generation_utils.py:948-996``)
as pure array ops so the entire decode runs on-device with zero host syncs —
the reference synchronises GPU→host every token.

Semantics preserved exactly:

* beam scores init ``[0, -1e9, ...]`` (reference ``:1907-1910``);
* forced BOS at step 1 / forced EOS at ``max_length-1`` before log-softmax;
* ``topk(2*num_beams)`` over the flattened ``beams x vocab`` axis with the
  same index encoding (``beam * vocab + token``) and tie order;
* per-step candidate walk: EOS candidates with rank < num_beams finalize the
  hypothesis ``tokens[:cur_len]`` with score ``sum_logprobs / cur_len**penalty``;
  non-EOS candidates fill the next beam in rank order (``:2000-2046``);
* hypothesis buffer keeps the best ``num_beams`` finalized hyps with
  worst-eviction (ties favour incumbents — reference ``add`` requires
  strictly better scores, ``generation_utils.py:972-983``);
* ``is_done``: with ``early_stopping`` a batch is done once the buffer is
  full; otherwise when ``worst >= best_possible = max_score / cur_len**penalty``
  (``:985-996``);
* done batches append pads and freeze (``:2004-2012``);
* post-loop finalisation adds the live beams of still-open batches
  (``:2072-2092``);
* outputs: the top ``num_return_sequences`` hyps, padded, EOS appended at
  ``length`` when it fits (``:2103-2124``).

The KV cache is any pytree whose leaves have leading dim ``batch*beams``;
beam reordering is a ``take`` along axis 0. Per-sequence state (cross-KV,
masks, rating) stays *unexpanded* inside ``step_fn``'s closure — within-batch
beam permutations never change it, so the reference's per-step
``index_select`` of encoder state (``:2062-2070``) is dropped entirely.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from multimodalsum_tpu.core.config import GenerationConfig
from multimodalsum_tpu.decode.logits import NEG_INF, adjust_logits, postprocess_scores

# step_fn(tokens [B*K, 1], index, cache) -> (logits [B*K, vocab], new_cache)
StepFn = Callable[[jnp.ndarray, jnp.ndarray, object], Tuple[jnp.ndarray, object]]


class BeamState(NamedTuple):
    cur_len: jnp.ndarray          # scalar int32
    tokens: jnp.ndarray           # [B, K, L]
    beam_scores: jnp.ndarray      # [B, K] sum log-probs
    done: jnp.ndarray             # [B] bool
    hyp_scores: jnp.ndarray       # [B, K] normalised scores, -inf = empty
    hyp_tokens: jnp.ndarray       # [B, K, L]
    hyp_lens: jnp.ndarray         # [B, K]
    num_hyps: jnp.ndarray         # [B]
    rng: jnp.ndarray              # PRNG key (beam sampling)
    cache: object


class BeamResult(NamedTuple):
    sequences: jnp.ndarray        # [B, R, L] padded, EOS-terminated
    lengths: jnp.ndarray          # [B, R] (including the trailing EOS)
    scores: jnp.ndarray           # [B, R] normalised hyp scores


def _merge_hyps(state: BeamState, cand_scores, cand_tokens, cand_lens, cand_valid):
    """Insert candidate hypotheses, keeping the best K (ties favour incumbents)."""
    K = state.hyp_scores.shape[1]
    cand_scores = jnp.where(cand_valid, cand_scores, NEG_INF)
    merged_scores = jnp.concatenate([state.hyp_scores, cand_scores], axis=1)
    merged_tokens = jnp.concatenate([state.hyp_tokens, cand_tokens], axis=1)
    merged_lens = jnp.concatenate([state.hyp_lens, cand_lens], axis=1)
    top_scores, top_idx = jax.lax.top_k(merged_scores, K)  # stable: incumbents win ties
    hyp_tokens = jnp.take_along_axis(merged_tokens, top_idx[:, :, None], axis=1)
    hyp_lens = jnp.take_along_axis(merged_lens, top_idx, axis=1)
    num_hyps = jnp.minimum(state.num_hyps + jnp.sum(cand_valid, axis=1), K)
    return top_scores, hyp_tokens, hyp_lens, num_hyps


def beam_search(
    step_fn: StepFn,
    init_cache,
    batch_size: int,
    *,
    vocab_size: int,
    gen: GenerationConfig,
    decoder_start_token_id: int,
    bos_token_id: int,
    pad_token_id: int,
    eos_token_id: int,
    bad_words: jnp.ndarray | None = None,
    bad_lengths: jnp.ndarray | None = None,
    force_bos_eos: bool = True,
    rng: jnp.ndarray | None = None,
    reorder_cache_fn=None,
) -> BeamResult:
    """``force_bos_eos``: BART's forced BOS at step 1 / EOS at max_length-1
    (reference ``adjust_logits_during_generation``); disable for generic
    models decoded through the Beamer facade."""
    B, K, L = batch_size, gen.num_beams, gen.max_length
    R = gen.num_return_sequences
    lp = gen.length_penalty

    tokens0 = jnp.full((B, K, L), pad_token_id, jnp.int32).at[:, :, 0].set(decoder_start_token_id)
    beam_scores0 = jnp.zeros((B, K), jnp.float32)
    if not gen.do_sample:
        # greedy beam search considers only beam 0's tokens at step 1 to
        # avoid K identical expansions (reference :1907-1910); sampling keeps
        # all beams live so the first draw spans the full beams x vocab axis
        beam_scores0 = beam_scores0.at[:, 1:].set(-1e9)

    state = BeamState(
        cur_len=jnp.int32(1),
        tokens=tokens0,
        beam_scores=beam_scores0,
        done=jnp.zeros((B,), bool),
        hyp_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        hyp_tokens=jnp.full((B, K, L), pad_token_id, jnp.int32),
        hyp_lens=jnp.zeros((B, K), jnp.int32),
        num_hyps=jnp.zeros((B,), jnp.int32),
        rng=rng if rng is not None else jax.random.PRNGKey(0),
        cache=init_cache,
    )

    def cond(state: BeamState):
        return (state.cur_len < L) & ~jnp.all(state.done)

    def body(state: BeamState) -> BeamState:
        cur_len = state.cur_len
        flat_tokens = state.tokens.reshape(B * K, L)
        last = jax.lax.dynamic_slice(flat_tokens, (0, cur_len - 1), (B * K, 1))

        logits, cache = step_fn(last, cur_len - 1, state.cache)
        if force_bos_eos and not gen.do_sample:
            logits = adjust_logits(logits, cur_len, L, bos_token_id, eos_token_id)

        # Lazy log-softmax: with repetition_penalty == 1 and greedy beams the
        # normaliser is a per-row scalar that folds into the carried beam
        # score (score = logit + (beam - lse), identical to the eager
        # (logit - lse) + beam up to float association — exact ties in top_k
        # could in principle resolve differently), and every remaining
        # post-processing op is a -inf ban, which commutes with the shift.
        # Skips one full [rows, vocab] pass per step
        # (measured 0.6 ms at batch 64). The reference order is preserved:
        # forced BOS/EOS affect the normaliser (lse computed after
        # adjust_logits), bans do not (applied after).
        lazy_lse = (not gen.do_sample) and gen.repetition_penalty == 1.0

        if lazy_lse:
            scores_step = logits.astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(scores_step, axis=-1)  # [B*K]
            carried_beam = state.beam_scores - lse.reshape(B, K)
        else:
            scores_step = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            carried_beam = state.beam_scores
        scores_step = postprocess_scores(
            scores_step, flat_tokens, cur_len,
            repetition_penalty=gen.repetition_penalty,
            min_length=gen.min_length,
            eos_token_id=eos_token_id,
            no_repeat_ngram_size=gen.no_repeat_ngram_size,
            bad_words=bad_words, bad_lengths=bad_lengths,
        )

        next_scores = scores_step.reshape(B, K, vocab_size) + carried_beam[:, :, None]
        if gen.do_sample:
            # beam sampling (reference :1958-1982): temperature + top-k/p over
            # the grouped beams x vocab axis, draw 2K candidates without
            # replacement, then sort them by score descending
            from multimodalsum_tpu.decode.logits import top_k_top_p_filtering

            _scores = next_scores
            if gen.temperature != 1.0:
                _scores = _scores / gen.temperature
            _scores = top_k_top_p_filtering(
                _scores, top_k=gen.top_k, top_p=gen.top_p, min_tokens_to_keep=2
            ).reshape(B, K * vocab_size)
            step_rng = jax.random.fold_in(state.rng, cur_len)
            gumbel = jax.random.gumbel(step_rng, _scores.shape)
            _, top_idx = jax.lax.top_k(_scores + gumbel, 2 * K)  # w/o replacement
            # carried scores come from the scaled/filtered table, like the
            # reference's gather from _scores (:1976-1980)
            top_scores = jnp.take_along_axis(_scores, top_idx, axis=1)
            order_s = jnp.argsort(-top_scores, axis=1, stable=True)
            top_scores = jnp.take_along_axis(top_scores, order_s, axis=1)
            top_idx = jnp.take_along_axis(top_idx, order_s, axis=1)
        else:
            # NOT decode/logits.exact_top_k: the chunked form wins standalone
            # (7.3 vs 24 ms) but LOSES inside this while_loop (-6.5 ms/step
            # at b72 — XLA's in-loop top_k lowering is already cheap, and
            # the extra reshape/pad/gather don't fuse; SCALING.md)
            top_scores, top_idx = jax.lax.top_k(
                next_scores.reshape(B, K * vocab_size), 2 * K)
        tok_id = top_idx % vocab_size
        beam_id = top_idx // vocab_size
        is_eos = tok_id == eos_token_id

        # ---- continuation beams: first K non-EOS candidates in rank order
        order = jnp.argsort(is_eos, axis=1, stable=True)  # non-eos first, rank order kept
        cont = order[:, :K]
        sel_scores = jnp.take_along_axis(top_scores, cont, axis=1)
        sel_tok = jnp.take_along_axis(tok_id, cont, axis=1)
        sel_beam = jnp.take_along_axis(beam_id, cont, axis=1)

        # ---- finalized hypotheses: EOS candidates with rank < K
        rank_ok = jnp.arange(2 * K)[None, :] < K
        cand_valid = is_eos & rank_ok & ~state.done[:, None]
        cand_norm = top_scores / (cur_len.astype(jnp.float32) ** lp)
        cand_tokens = jnp.take_along_axis(state.tokens, beam_id[:, :, None], axis=1)
        cand_lens = jnp.full((B, 2 * K), cur_len, jnp.int32)
        hyp_scores, hyp_tokens, hyp_lens, num_hyps = _merge_hyps(
            state, cand_norm, cand_tokens, cand_lens, cand_valid
        )

        # ---- done update (reference order: after this step's additions)
        worst = jnp.min(hyp_scores, axis=1)
        best_possible = top_scores[:, 0] / (cur_len.astype(jnp.float32) ** lp)
        newly_done = (num_hyps >= K) & (
            jnp.bool_(gen.early_stopping) | (worst >= best_possible)
        )
        done = state.done | newly_done

        # ---- freeze already-done batches (pad token, identity reorder, score 0)
        was_done = state.done[:, None]
        sel_tok = jnp.where(was_done, pad_token_id, sel_tok)
        sel_scores = jnp.where(was_done, 0.0, sel_scores)
        sel_beam = jnp.where(was_done, jnp.arange(K)[None, :], sel_beam)

        # ---- reorder + append
        new_tokens = jnp.take_along_axis(state.tokens, sel_beam[:, :, None], axis=1)
        new_tokens = jax.lax.dynamic_update_slice(
            new_tokens, sel_tok[:, :, None].astype(jnp.int32), (0, 0, cur_len)
        )
        flat_idx = (jnp.arange(B)[:, None] * K + sel_beam).reshape(-1)
        if reorder_cache_fn is not None:
            # e.g. ancestry mode: update a [rows, L] index matrix instead of
            # physically permuting the KV cache (see ops/ancestry_attention.py)
            cache = reorder_cache_fn(cache, flat_idx, cur_len)
        else:
            cache = jax.tree.map(lambda x: jnp.take(x, flat_idx, axis=0), cache)

        return BeamState(
            cur_len=cur_len + 1,
            tokens=new_tokens,
            beam_scores=sel_scores,
            done=done,
            hyp_scores=hyp_scores,
            hyp_tokens=hyp_tokens,
            hyp_lens=hyp_lens,
            num_hyps=num_hyps,
            rng=state.rng,
            cache=cache,
        )

    state = jax.lax.while_loop(cond, body, state)

    # ---- finalize still-open batches with their live beams (reference :2072-2092)
    open_b = ~state.done
    cand_norm = state.beam_scores / (state.cur_len.astype(jnp.float32) ** lp)
    cand_lens = jnp.full((B, K), state.cur_len, jnp.int32)
    hyp_scores, hyp_tokens, hyp_lens, _ = _merge_hyps(
        state, cand_norm, state.tokens, cand_lens, jnp.broadcast_to(open_b[:, None], (B, K))
    )

    # ---- select top-R and append EOS (reference :2095-2124)
    top_scores, top_idx = jax.lax.top_k(hyp_scores, R)
    best_tokens = jnp.take_along_axis(hyp_tokens, top_idx[:, :, None], axis=1)  # [B, R, L]
    best_lens = jnp.take_along_axis(hyp_lens, top_idx, axis=1)                  # [B, R]

    pos = jnp.arange(L)[None, None, :]
    sequences = jnp.where(pos < best_lens[:, :, None], best_tokens, pad_token_id)
    append_eos = best_lens < L
    sequences = jnp.where(
        (pos == best_lens[:, :, None]) & append_eos[:, :, None], eos_token_id, sequences
    )
    lengths = jnp.where(append_eos, best_lens + 1, best_lens)
    return BeamResult(sequences=sequences, lengths=lengths, scores=top_scores)
