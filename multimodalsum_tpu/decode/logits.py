"""Jit-friendly logits post-processing for generation.

Vectorised ports of the host-side token bans of the reference
(``generation_utils.py:57-99`` ``postprocess_next_token_scores`` and helpers
``:848-945``), reformulated as fixed-shape array ops so the whole decode loop
stays on-device inside ``lax.while_loop`` — the reference round-trips
logits to Python lists every token (``src/test.py`` hot loop, the primary
perf target of this framework).

Convention: ``tokens`` is the static-size generation buffer ``[rows, L]``
whose first ``cur_len`` positions are valid; ``scores`` is ``[rows, vocab]``.
True ``-inf`` is used for bans, exactly like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def force_token(logits: jnp.ndarray, token_id: int) -> jnp.ndarray:
    """Set every token except ``token_id`` to -inf (reference
    ``_force_token_ids_generation``, ``modeling_multimodalsum.py:2148-2159``)."""
    vocab = logits.shape[-1]
    keep = jnp.arange(vocab) == token_id
    return jnp.where(keep, logits, NEG_INF)


def adjust_logits(logits: jnp.ndarray, cur_len, max_length: int, bos: int, eos: int) -> jnp.ndarray:
    """BART forces BOS at step 1 and EOS at max_length-1 (reference
    ``adjust_logits_during_generation``, ``:2140-2146``)."""
    logits = jnp.where(jnp.equal(cur_len, 1), force_token(logits, bos), logits)
    logits = jnp.where(jnp.equal(cur_len, max_length - 1), force_token(logits, eos), logits)
    return logits


def apply_repetition_penalty(
    scores: jnp.ndarray, tokens: jnp.ndarray, cur_len, penalty: float
) -> jnp.ndarray:
    """CTRL-style repetition penalty (reference ``enforce_repetition_penalty_``,
    ``generation_utils.py:47-55``): every already-generated token's score is
    multiplied by ``penalty`` if negative, divided otherwise."""
    rows, vocab = scores.shape
    pos_valid = (jnp.arange(tokens.shape[1]) < cur_len).astype(scores.dtype)
    seen = jnp.zeros((rows, vocab), scores.dtype)
    seen = seen.at[jnp.arange(rows)[:, None], tokens].max(pos_valid[None, :])
    penalised = jnp.where(scores < 0, scores * penalty, scores / penalty)
    return jnp.where(seen > 0, penalised, scores)


def ban_short_eos(scores: jnp.ndarray, cur_len, min_length: int, eos: int) -> jnp.ndarray:
    """EOS gets -inf until min_length (reference ``generation_utils.py:79-81``)."""
    vocab = scores.shape[-1]
    is_eos = jnp.arange(vocab) == eos
    return jnp.where(is_eos[None, :] & (cur_len < min_length), NEG_INF, scores)


def ban_repeated_ngrams(
    scores: jnp.ndarray, tokens: jnp.ndarray, cur_len, ngram_size: int
) -> jnp.ndarray:
    """No-repeat-ngram ban (reference ``calc_banned_ngram_tokens``,
    ``generation_utils.py:848-869``, from fairseq).

    A token ``t`` is banned iff appending it would recreate an ``n``-gram
    already present in the first ``cur_len`` tokens: there exists a window
    start ``j <= cur_len - n`` with ``tokens[j:j+n-1] == tokens[cur_len-n+1:cur_len]``
    and ``tokens[j+n-1] == t``. Vectorised with a sliding-window comparison
    and a scatter-max; no host transfer.
    """
    n = ngram_size
    if n <= 0:
        return scores
    rows, length = tokens.shape
    if length < n:
        return scores
    # windows[:, j, i] = tokens[:, j + i] for j in 0..length-n, i in 0..n-1
    windows = jnp.stack([tokens[:, i : length - n + 1 + i] for i in range(n)], axis=-1)
    # suffix = tokens[cur_len-(n-1) : cur_len]  (the last n-1 generated tokens)
    start = jnp.maximum(cur_len - (n - 1), 0)
    suffix = jax.vmap(
        lambda row: jax.lax.dynamic_slice(row, (start,), (n - 1,))
    )(tokens)
    j_valid = jnp.arange(length - n + 1) <= (cur_len - n)
    match = jnp.all(windows[:, :, : n - 1] == suffix[:, None, :], axis=-1) & j_valid[None, :]
    banned_token = windows[:, :, n - 1]
    # scatter -inf straight into the scores (min with +inf is a no-op for
    # non-matching windows) instead of building a [rows, vocab] bool ban
    # and a full-vocab where — two fewer full-vocab passes per step
    neg = jnp.where(match, NEG_INF, jnp.inf).astype(scores.dtype)
    return jnp.asarray(scores).at[jnp.arange(rows)[:, None], banned_token].min(neg)


def ban_bad_words(
    scores: jnp.ndarray,
    tokens: jnp.ndarray,
    cur_len,
    bad_words: jnp.ndarray,
    bad_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Static bad-words ban (reference ``calc_banned_bad_words_ids``,
    ``generation_utils.py:871-905``).

    ``bad_words``: int ``[num_seqs, W]`` left-aligned, ``bad_lengths`` the true
    length of each sequence. The last token of a bad sequence is banned when
    the preceding ``len-1`` tokens match the tail of the generated prefix.
    """
    tokens = jnp.asarray(tokens)
    bad_words = jnp.asarray(bad_words)
    bad_lengths = jnp.asarray(bad_lengths)
    rows, length = tokens.shape
    num_seqs, W = bad_words.shape

    # tail[:, i] = tokens[:, cur_len - 1 - i]  (reversed tail of the prefix)
    idx = cur_len - 1 - jnp.arange(W)
    tail = jnp.where(idx >= 0, tokens[:, jnp.clip(idx, 0, length - 1)], -1)

    # For bad sequence s of length Ls: prefix-to-match (reversed) is
    # bad_words[s, Ls-2], bad_words[s, Ls-3], ... ; banned token bad_words[s, Ls-1].
    pos = jnp.arange(W)
    rev_idx = bad_lengths[:, None] - 2 - pos[None, :]  # [S, W]
    prefix_rev = jnp.where(rev_idx >= 0, bad_words[jnp.arange(num_seqs)[:, None], jnp.clip(rev_idx, 0, W - 1)], -1)
    need = rev_idx >= 0  # positions that must match
    fits = (bad_lengths - 1)[None, :] <= cur_len  # prefix fits in generated tokens

    # match[r, s] = all needed positions equal
    eq = tail[:, None, :] == prefix_rev[None, :, :]
    match = jnp.all(eq | ~need[None, :, :], axis=-1) & fits

    last_tok = bad_words[jnp.arange(num_seqs), bad_lengths - 1]  # [S]
    ban = jnp.zeros(scores.shape, bool)
    ban = ban.at[jnp.arange(rows)[:, None], jnp.broadcast_to(last_tok[None, :], (rows, num_seqs))].max(match)
    return jnp.where(ban, NEG_INF, scores)


def postprocess_scores(
    scores: jnp.ndarray,
    tokens: jnp.ndarray,
    cur_len,
    *,
    repetition_penalty: float = 1.0,
    min_length: int = 0,
    eos_token_id: int,
    no_repeat_ngram_size: int = 0,
    bad_words: jnp.ndarray | None = None,
    bad_lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Compose the bans in reference order (``generation_utils.py:57-99``)."""
    if repetition_penalty != 1.0:
        scores = apply_repetition_penalty(scores, tokens, cur_len, repetition_penalty)
    if eos_token_id is not None and min_length > 0:
        scores = ban_short_eos(scores, cur_len, min_length, eos_token_id)
    if no_repeat_ngram_size > 0:
        scores = ban_repeated_ngrams(scores, tokens, cur_len, no_repeat_ngram_size)
    if bad_words is not None:
        scores = ban_bad_words(scores, tokens, cur_len, bad_words, bad_lengths)
    return scores


def top_k_top_p_filtering(
    logits: jnp.ndarray,
    top_k: int = 0,
    top_p: float = 1.0,
    min_tokens_to_keep: int = 1,
) -> jnp.ndarray:
    """Top-k / nucleus filtering (reference ``generation_utils.py:907-945``)."""
    vocab = logits.shape[-1]
    if top_k > 0:
        k = min(max(top_k, min_tokens_to_keep), vocab)
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove_sorted = cum_probs > top_p
        if min_tokens_to_keep > 1:
            remove_sorted = remove_sorted.at[..., :min_tokens_to_keep].set(False)
        # shift right so the first token above the threshold is kept
        remove_sorted = jnp.concatenate(
            [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]], axis=-1
        )
        # threshold value: the smallest kept logit
        kept = jnp.where(remove_sorted, jnp.inf, sorted_logits)
        threshold = jnp.min(kept, axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, NEG_INF, logits)
    return logits


def exact_top_k(x: jnp.ndarray, k: int, chunks: int = 128):
    """Exact, tie-stable top-k over the last axis via two chunked stages.

    Splits the axis into ``chunks`` blocks, takes top-k per block (small
    parallel sorts), then top-k over the ``chunks*k`` block winners — the
    same set by a simple exchange argument.

    Measured on v5e at the beam step's ``[72, 5*50265]`` shape: 3x faster
    than ``lax.top_k`` standalone (7.3 vs 24 ms) but ~6.5 ms/step SLOWER
    inside the decode ``while_loop`` (XLA's in-loop top_k lowering is
    already cheap there and the reshape/pad/gather stages don't fuse), so
    the beam engine deliberately does NOT use it — it is kept for host-side
    / standalone top-k work (SCALING.md "A/B" notes).

    Tie order matches ``lax.top_k`` exactly: within a block, ties resolve to
    the lowest index (lax.top_k is index-stable); blocks are concatenated in
    index order, so the second stage's lowest-position tie-break again picks
    the lowest original index. Verified bit-identical (values and indices)
    against ``lax.top_k`` on tie-dense inputs (tests/test_logits_ops.py).

    Padding uses -inf, which cannot displace real candidates; rows with
    fewer than ``k`` finite entries return -inf-filled tails in both forms.
    """
    n = x.shape[-1]
    if chunks <= 1 or n < 2 * chunks * k:
        return jax.lax.top_k(x, k)
    pad = (-n) % chunks
    if pad:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),),
                    constant_values=NEG_INF)
    vc = x.shape[-1] // chunks
    xc = x.reshape(*x.shape[:-1], chunks, vc)
    v1, i1 = jax.lax.top_k(xc, k)                      # [..., chunks, k]
    base = (jnp.arange(chunks) * vc)[..., :, None]
    gi = (i1 + base).reshape(*x.shape[:-1], chunks * k)
    v1 = v1.reshape(*x.shape[:-1], chunks * k)
    v2, i2 = jax.lax.top_k(v1, k)
    return v2, jnp.take_along_axis(gi, i2, axis=-1)
