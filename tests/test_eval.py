"""ROUGE implementation tests (hand-computed ROUGE-1.5.5 values) and the
reference-output parity floor."""

import os

import numpy as np
import pytest

from multimodalsum_tpu.eval.rouge_impl import (
    _lcs_len,
    plansum_tokens,
    rouge_l_pair,
    rouge_n_pair,
)


def test_rouge1_clipped_multiset():
    # hyp: the the cat  |  ref: the cat the mat
    # unigram hits: min(2,2)=2 for 'the' + min(1,1)=1 for 'cat' = 3
    # p = 3/3, r = 3/4, f = 2pr/(p+r) = 2*(1)*(0.75)/1.75 = 6/7
    h, r = "the the cat".split(), "the cat the mat".split()
    np.testing.assert_allclose(rouge_n_pair(h, r, 1), 6 / 7, rtol=1e-9)


def test_rouge2():
    # hyp bigrams: (a b), (b c)   ref bigrams: (a b), (b d)
    # hits = 1; p = 1/2, r = 1/2, f = 1/2
    h, r = "a b c".split(), "a b d".split()
    np.testing.assert_allclose(rouge_n_pair(h, r, 2), 0.5, rtol=1e-9)


def test_lcs():
    assert _lcs_len("a b c d e".split(), "b x c y e".split()) == 3  # b c e
    assert _lcs_len([], "a".split()) == 0


def test_rouge_l():
    # lcs(a b c d, a c d) = 3; p = 3/4, r = 3/3 = 1, f = 2*0.75/1.75 = 6/7
    h, r = "a b c d".split(), "a c d".split()
    np.testing.assert_allclose(rouge_l_pair(h, r), 6 / 7, rtol=1e-9)


def test_plansum_preprocess():
    toks = plansum_tokens("The waiters were AMAZING!! I cannot complain... (really)")
    # lowercase, punctuation stripped, stems for len>3, 'cannot' kept
    assert "cannot" in toks
    assert "amaz" in toks  # amazing -> amaz
    assert "i" in toks
    assert all("!" not in t and "(" not in t for t in toks)


def test_reference_output_parity_floor():
    """Score the paper's published outputs vs gold — the quality floor our
    trained models must reach under the same scorer."""
    ref = "/root/reference"
    if not os.path.isdir(ref):
        pytest.skip("reference unavailable")
    import pandas as pd

    from multimodalsum_tpu.eval.metrics import aggregate_multi_reference, rouge_scores

    preds = [l.strip() for l in open(f"{ref}/output/Yelp.txt") if l.strip()]
    gold_csv = pd.read_csv(f"{ref}/data/yelp/test/summaries_0-200_cleaned.csv").iloc[100:]
    gold = [" ".join(x.split()) for x in gold_csv["Answer.summary"]]
    scores = rouge_scores(preds, gold)
    np.testing.assert_allclose(scores["rouge1"], 33.157, atol=0.01)
    np.testing.assert_allclose(scores["rouge2"], 6.628, atol=0.01)
    np.testing.assert_allclose(scores["rougeL"], 19.966, atol=0.01)
    assert scores["incomplete"] == 0

    apreds = [l.strip() for l in open(f"{ref}/output/Amazon.txt") if l.strip()]
    am = pd.read_csv(f"{ref}/data/amazon/test/test.csv", sep="\t")
    refsets = [
        [" ".join(am.iloc[i][f"summ{j}"].split()) for j in (1, 2, 3)]
        for i in range(len(am))
    ]
    a = aggregate_multi_reference(apreds, refsets)
    np.testing.assert_allclose(a["rouge1"], 34.141, atol=0.01)
    np.testing.assert_allclose(a["rougeL"], 20.834, atol=0.01)
