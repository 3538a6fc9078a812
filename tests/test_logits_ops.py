"""Unit parity of the vectorised logits bans vs the reference host-side helpers."""

import numpy as np
import pytest

from reference_oracle import require_reference


@pytest.fixture(scope="module")
def torch_mod():
    require_reference()
    import torch

    return torch


def test_banned_ngram_tokens(torch_mod):
    torch = torch_mod
    from transformer.generation_utils import calc_banned_ngram_tokens

    from multimodalsum_tpu.decode.logits import ban_repeated_ngrams

    rng = np.random.default_rng(0)
    rows, V = 6, 30
    for n in (2, 3, 4):
        for cur_len in (1, 2, 3, 5, 9, 12):
            L = 12
            # small alphabet so repeats are frequent
            tokens = rng.integers(0, 6, (rows, L)).astype(np.int64)
            ref_banned = calc_banned_ngram_tokens(
                torch.from_numpy(tokens[:, :cur_len]), rows, n, cur_len
            )
            scores = np.zeros((rows, V), np.float32)
            got = np.asarray(ban_repeated_ngrams(scores, tokens, cur_len, n))
            for r in range(rows):
                banned = np.where(np.isneginf(got[r]))[0].tolist()
                assert sorted(set(ref_banned[r])) == banned, (n, cur_len, r)


def test_top_k_top_p(torch_mod):
    torch = torch_mod
    from transformer.generation_utils import top_k_top_p_filtering as ref_filter

    from multimodalsum_tpu.decode.logits import top_k_top_p_filtering

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(4, 50)).astype(np.float32) * 3
    for top_k, top_p in [(0, 1.0), (10, 1.0), (0, 0.9), (5, 0.7), (3, 0.95)]:
        ref = ref_filter(torch.from_numpy(logits.copy()), top_k=top_k, top_p=top_p,
                         min_tokens_to_keep=2).numpy()
        got = np.asarray(top_k_top_p_filtering(logits, top_k=top_k, top_p=top_p,
                                               min_tokens_to_keep=2))
        ref_kept = ~np.isinf(ref)
        got_kept = ~np.isneginf(got)
        np.testing.assert_array_equal(ref_kept, got_kept, err_msg=f"k={top_k} p={top_p}")
        np.testing.assert_allclose(got[got_kept], ref[ref_kept], rtol=1e-6)


def test_repetition_penalty(torch_mod):
    torch = torch_mod

    from multimodalsum_tpu.decode.logits import apply_repetition_penalty

    rng = np.random.default_rng(2)
    rows, V, L = 4, 40, 8
    scores = rng.normal(size=(rows, V)).astype(np.float32)
    tokens = rng.integers(0, V, (rows, L)).astype(np.int64)
    cur_len = 5
    penalty = 1.3

    ref = scores.copy()
    for i in range(rows):
        for tok in set(tokens[i, :cur_len].tolist()):
            if ref[i, tok] < 0:
                ref[i, tok] *= penalty
            else:
                ref[i, tok] /= penalty
    got = np.asarray(apply_repetition_penalty(scores, tokens, cur_len, penalty))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_bad_words(torch_mod):
    torch = torch_mod
    from transformer.generation_utils import calc_banned_bad_words_ids

    from multimodalsum_tpu.decode.logits import ban_bad_words

    rng = np.random.default_rng(3)
    rows, V, L = 5, 30, 10
    tokens = rng.integers(0, 8, (rows, L)).astype(np.int64)
    bad_word_lists = [[3], [1, 2], [4, 5, 6], [tokens[0, 3], tokens[0, 4]]]
    bad_word_lists = [[int(x) for x in seq] for seq in bad_word_lists]
    for cur_len in (2, 5, 10):
        ref_banned = calc_banned_bad_words_ids(
            torch.from_numpy(tokens[:, :cur_len]), bad_word_lists
        )
        W = max(len(s) for s in bad_word_lists)
        bw = np.full((len(bad_word_lists), W), 0, np.int32)
        bl = np.zeros(len(bad_word_lists), np.int32)
        for i, s in enumerate(bad_word_lists):
            bw[i, : len(s)] = s
            bl[i] = len(s)
        scores = np.zeros((rows, V), np.float32)
        got = np.asarray(ban_bad_words(scores, tokens, cur_len, bw, bl))
        for r in range(rows):
            banned = set(np.where(np.isneginf(got[r]))[0].tolist())
            assert set(ref_banned[r]) == banned, (cur_len, r, ref_banned[r], banned)


def test_exact_top_k_matches_lax_top_k():
    """exact_top_k must be bit-identical to lax.top_k — values AND indices —
    including tie-dense inputs (stable lowest-index tie resolution) and
    -inf-banned entries, across chunked and fallback shapes."""
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.decode.logits import exact_top_k

    rng = np.random.default_rng(9)
    # tie-dense: quantized values force many exact ties
    x = np.round(rng.normal(size=(7, 50265 * 3)) * 2.0).astype(np.float32)
    x[0, :17] = -np.inf                     # banned entries
    x[3] = 1.0                              # a fully-tied row
    xj = jnp.asarray(x)
    for k in (1, 10):
        for chunks in (16, 128):
            va, ia = jax.jit(lambda v: jax.lax.top_k(v, k))(xj)
            vb, ib = jax.jit(lambda v: exact_top_k(v, k, chunks=chunks))(xj)
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
            np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    # 1-D input (serving beam slots) and small-input fallback
    v1, i1 = exact_top_k(xj[0], 10)
    v2, i2 = jax.lax.top_k(xj[0], 10)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    small = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    vs, is_ = exact_top_k(small, 5)
    vr, ir = jax.lax.top_k(small, 5)
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(ir))
