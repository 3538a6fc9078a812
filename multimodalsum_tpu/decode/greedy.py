"""Greedy / sampling generation (num_beams == 1) inside ``lax.while_loop``.

Port of reference ``_generate_no_beam_search``
(``modeling_multimodalsum.py:1767-1869``):

* logits are adjusted (forced BOS/EOS) only when not sampling;
* the ban stack runs on the *raw* logits (the reference mutates
  ``next_token_logits`` in place through ``postprocess_next_token_scores``);
* greedy picks argmax of the post-processed logits; sampling applies
  temperature then top-k/top-p then a categorical draw;
* the per-step probability of the chosen token under
  ``softmax(postprocessed logits)`` is recorded (reference
  ``next_prob_list``, ``:1846``, returned when ``store_next_prob``);
* finished rows append pads; generation stops early when every row has
  produced EOS.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from multimodalsum_tpu.core.config import GenerationConfig
from multimodalsum_tpu.decode.logits import adjust_logits, postprocess_scores, top_k_top_p_filtering

StepFn = Callable[[jnp.ndarray, jnp.ndarray, object], Tuple[jnp.ndarray, object]]


class GreedyState(NamedTuple):
    cur_len: jnp.ndarray
    tokens: jnp.ndarray        # [B, L]
    unfinished: jnp.ndarray    # [B] bool
    lengths: jnp.ndarray       # [B]
    next_probs: jnp.ndarray    # [B, L] chosen-token probability per step
    cache: object
    rng: jnp.ndarray


class GreedyResult(NamedTuple):
    sequences: jnp.ndarray     # [B, L]
    lengths: jnp.ndarray       # [B]
    next_probs: jnp.ndarray    # [B, L-1] per generated position


def greedy_search(
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
    rng: jnp.ndarray | None = None,
) -> GreedyResult:
    B, L = batch_size, gen.max_length
    if rng is None:
        rng = jax.random.PRNGKey(0)

    state = GreedyState(
        cur_len=jnp.int32(1),
        tokens=jnp.full((B, L), pad_token_id, jnp.int32).at[:, 0].set(decoder_start_token_id),
        unfinished=jnp.ones((B,), bool),
        lengths=jnp.full((B,), L, jnp.int32),
        next_probs=jnp.zeros((B, L), jnp.float32),
        cache=init_cache,
        rng=rng,
    )

    def cond(s: GreedyState):
        return (s.cur_len < L) & jnp.any(s.unfinished)

    def body(s: GreedyState) -> GreedyState:
        cur_len = s.cur_len
        last = jax.lax.dynamic_slice(s.tokens, (0, cur_len - 1), (B, 1))
        logits, cache = step_fn(last, cur_len - 1, s.cache)
        logits = logits.astype(jnp.float32)
        if not gen.do_sample:
            logits = adjust_logits(logits, cur_len, L, bos_token_id, eos_token_id)
        scores = postprocess_scores(
            logits, s.tokens, cur_len,
            repetition_penalty=gen.repetition_penalty,
            min_length=gen.min_length,
            eos_token_id=eos_token_id,
            no_repeat_ngram_size=gen.no_repeat_ngram_size,
            bad_words=bad_words, bad_lengths=bad_lengths,
        )

        if gen.do_sample:
            sampled = scores / gen.temperature if gen.temperature != 1.0 else scores
            sampled = top_k_top_p_filtering(sampled, top_k=gen.top_k, top_p=gen.top_p)
            step_rng = jax.random.fold_in(s.rng, cur_len)
            next_token = jax.random.categorical(step_rng, sampled, axis=-1)
        else:
            next_token = jnp.argmax(scores, axis=-1)

        prob = jnp.take_along_axis(
            jax.nn.softmax(scores, axis=-1), next_token[:, None], axis=-1
        )[:, 0]

        to_add = jnp.where(s.unfinished, next_token, pad_token_id).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(s.tokens, to_add[:, None], (0, cur_len))
        next_probs = jax.lax.dynamic_update_slice(s.next_probs, prob[:, None], (0, cur_len))

        hit_eos = s.unfinished & (to_add == eos_token_id)
        lengths = jnp.where(hit_eos, cur_len + 1, s.lengths)
        unfinished = s.unfinished & (to_add != eos_token_id)

        return GreedyState(cur_len + 1, tokens, unfinished, lengths, next_probs, cache, s.rng)

    state = jax.lax.while_loop(cond, body, state)
    return GreedyResult(
        sequences=state.tokens, lengths=state.lengths, next_probs=state.next_probs[:, 1:]
    )
