"""ROUGE oracle battery (VERDICT r1 #5): validate ``eval/rouge_impl.py``
against Google's ``rouge_score`` — an independent ROUGE-1.5.5
reimplementation — on randomized clipped-multiset stress cases, corpus and
multi-reference averaging, alpha extremes, the py-rouge preprocessing
semantics, and the full Yelp/Amazon floor corpora.

``rouge_score`` is a valid scoring-core oracle here because after PlanSum
preprocessing every summary is a single punctuation-free token string: its
tokenizer is the identity on such strings, its rouge1/2 use the same clipped
multiset counts, its rougeL the same sequence-level LCS, and its fmeasure
equals the alpha=0.5 F both we and py-rouge compute.
"""

import os
import random

import numpy as np
import pytest

rs = pytest.importorskip("rouge_score")
from rouge_score import rouge_scorer  # noqa: E402

from multimodalsum_tpu.eval.rouge_impl import (  # noqa: E402
    plansum_tokens,
    rouge_l_pair,
    rouge_n_pair,
    rouge_scores_tokens,
)

SCORER = rouge_scorer.RougeScorer(["rouge1", "rouge2", "rougeL"],
                                  use_stemmer=False)


def _random_tokens(rng, lo=0, hi=30, vocab=("a", "b", "c", "dd", "ee", "f1")):
    # tiny vocab => heavy n-gram repetition => clipped-multiset counts matter
    return [rng.choice(vocab) for _ in range(rng.randint(lo, hi))]


def _oracle(hyp_tokens, ref_tokens):
    return SCORER.score(" ".join(ref_tokens), " ".join(hyp_tokens))


def test_randomized_pairs_vs_rouge_score():
    """60 randomized pairs incl. empty/short edges: per-pair R1/R2/RL must
    match the independent implementation to float precision."""
    rng = random.Random(0)
    checked = 0
    for case in range(60):
        hyp = _random_tokens(rng, lo=0 if case < 6 else 1)
        ref = _random_tokens(rng, lo=0 if case % 7 == 0 else 1)
        want = _oracle(hyp, ref)
        np.testing.assert_allclose(
            rouge_n_pair(hyp, ref, 1), want["rouge1"].fmeasure, atol=1e-12,
            err_msg=f"rouge1 case {case}: {hyp} vs {ref}")
        np.testing.assert_allclose(
            rouge_n_pair(hyp, ref, 2), want["rouge2"].fmeasure, atol=1e-12,
            err_msg=f"rouge2 case {case}: {hyp} vs {ref}")
        np.testing.assert_allclose(
            rouge_l_pair(hyp, ref), want["rougeL"].fmeasure, atol=1e-12,
            err_msg=f"rougeL case {case}: {hyp} vs {ref}")
        checked += 1
    assert checked == 60


def test_corpus_average_matches_mean_of_pairs():
    rng = random.Random(1)
    hyps = [_random_tokens(rng, lo=1) for _ in range(20)]
    refs = [_random_tokens(rng, lo=1) for _ in range(20)]
    got = rouge_scores_tokens(hyps, refs)
    for key, orc in (("rouge1", "rouge1"), ("rouge2", "rouge2"),
                     ("rougeL", "rougeL")):
        want = np.mean([_oracle(h, r)[orc].fmeasure for h, r in zip(hyps, refs)])
        np.testing.assert_allclose(got[key], want * 100, atol=1e-9)


def test_multi_reference_averaging_vs_oracle():
    """Amazon protocol (reference src/test.py:222-236): score against each
    gold column separately, then average the corpus scores."""
    from multimodalsum_tpu.eval.metrics import aggregate_multi_reference

    preds = ["The food was great, I cannot complain!",
             "Terrible service. Never going back",
             "Decent value; the staff was friendly."]
    refsets = [["Great food overall.", "I liked the food.", "Food was great!"],
               ["Bad service experience.", "Service was terrible.", "Never again."],
               ["Friendly staff, decent prices.", "Good value.", "Staff is nice."]]
    got = aggregate_multi_reference(preds, refsets)

    per_ref = []
    for j in range(3):
        fs = []
        for p, rset in zip(preds, refsets):
            h, r = plansum_tokens(p), plansum_tokens(rset[j])
            fs.append([_oracle(h, r)[k].fmeasure for k in
                       ("rouge1", "rouge2", "rougeL")])
        per_ref.append(np.mean(fs, axis=0))
    want = np.mean(per_ref, axis=0) * 100
    np.testing.assert_allclose(
        [got["rouge1"], got["rouge2"], got["rougeL"]], want, atol=1e-9)
    # only the summary not ending in '.'/'!' counts (reference src/test.py:40)
    assert got["incomplete"] == 1


def test_alpha_follows_py_rouge_formula():
    """alpha=1 -> precision, alpha=0 -> recall, and arbitrary alpha equals
    py-rouge's literal  p*r / ((1-alpha)*p + alpha*r)."""
    rng = random.Random(2)
    for _ in range(10):
        hyp = _random_tokens(rng, lo=3)
        ref = _random_tokens(rng, lo=3)
        want = _oracle(hyp, ref)["rouge1"]
        p, r = want.precision, want.recall
        np.testing.assert_allclose(rouge_n_pair(hyp, ref, 1, alpha=1.0), p,
                                   atol=1e-12)
        np.testing.assert_allclose(rouge_n_pair(hyp, ref, 1, alpha=0.0), r,
                                   atol=1e-12)
        for alpha in (0.25, 0.3, 0.75, 0.9):
            want_f = 0.0 if (p == 0 or r == 0) else (
                p * r / ((1 - alpha) * p + alpha * r))
            np.testing.assert_allclose(rouge_n_pair(hyp, ref, 1, alpha=alpha),
                                       want_f, atol=1e-12)


def test_preprocessing_matches_py_rouge_semantics():
    # Treebank lexicalised contraction splits (py-rouge tokenizes with
    # nltk.word_tokenize): gonna/wanna/gotta/lemme/gimme split in two
    assert plansum_tokens("I'm gonna go") == ["i", "m", "gon", "na", "go"]
    assert plansum_tokens("wanna gotta lemme gimme") == \
        ["wan", "na", "got", "ta", "lem", "me", "gim", "me"]
    # 'cannot' survives as ONE token (KEEP_CANNOT_IN_ONE_WORD guard) even
    # though Treebank would split it can|not; substring occurrences too
    assert plansum_tokens("I cannot do it") == ["i", "cannot", "do", "it"]
    assert "cannot" in plansum_tokens("cannots")
    # Porter ORIGINAL_ALGORITHM (py-rouge's ensure_compatibility stemmer):
    # NLTK's default extension mode would give 'die'/'lie' here
    assert plansum_tokens("dying lying") == ["dy", "ly"]
    # len<=3 tokens are never stemmed
    assert plansum_tokens("was is bus") == ["was", "is", "bus"]
    # multi-sentence punctuated input collapses to one punctuation-free
    # token sequence (so summary-level ROUGE-L == plain LCS)
    toks = plansum_tokens("Great food! Really?  (5 stars); we'll return.")
    assert toks == ["great", "food", "realli", "5", "star", "we", "ll", "return"]
    # numbers kept verbatim
    assert plansum_tokens("open 24 hours") == ["open", "24", "hour"]


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference unavailable")
def test_floor_corpora_vs_rouge_score_oracle():
    """All 100 Yelp + 32 Amazon floor pairs: our corpus scores must equal the
    mean of the independent implementation's per-pair F-scores."""
    import pandas as pd

    ref = "/root/reference"
    preds = [l.strip() for l in open(f"{ref}/output/Yelp.txt") if l.strip()]
    gold_csv = pd.read_csv(
        f"{ref}/data/yelp/test/summaries_0-200_cleaned.csv").iloc[100:]
    gold = [" ".join(x.split()) for x in gold_csv["Answer.summary"]]
    hyps = [plansum_tokens(p) for p in preds]
    refs = [plansum_tokens(g) for g in gold]
    got = rouge_scores_tokens(hyps, refs)
    for key in ("rouge1", "rouge2", "rougeL"):
        want = np.mean([_oracle(h, r)[key].fmeasure
                        for h, r in zip(hyps, refs)]) * 100
        np.testing.assert_allclose(got[key], want, atol=1e-9, err_msg=key)

    apreds = [l.strip() for l in open(f"{ref}/output/Amazon.txt") if l.strip()]
    am = pd.read_csv(f"{ref}/data/amazon/test/test.csv", sep="\t")
    ahyps = [plansum_tokens(p) for p in apreds]
    for j in (1, 2, 3):
        arefs = [plansum_tokens(" ".join(am.iloc[i][f"summ{j}"].split()))
                 for i in range(len(am))]
        got = rouge_scores_tokens(ahyps, arefs)
        for key in ("rouge1", "rouge2", "rougeL"):
            want = np.mean([_oracle(h, r)[key].fmeasure
                            for h, r in zip(ahyps, arefs)]) * 100
            np.testing.assert_allclose(got[key], want, atol=1e-9,
                                       err_msg=f"summ{j} {key}")


def test_wordnet_irregular_forms_replace_stemming():
    """py-rouge maps irregular forms through its WordNet exception table
    INSTEAD of Porter-stemming (stem_tokens); reference src/test.py:19-26.
    Curated equivalent: eval/wordnet_exc.py."""
    # irregular plural / past forms hit the table
    assert plansum_tokens("the children were happy") == \
        ["the", "child", "be", "happi"]
    assert plansum_tokens("brought bought thought") == \
        ["bring", "buy", "think"]
    assert plansum_tokens("frozen yogurt was eaten") == \
        ["freeze", "yogurt", "was", "eat"]
    assert plansum_tokens("mice teeth feet women") == \
        ["mouse", "tooth", "foot", "woman"]
    # table hit REPLACES stemming: 'taken' -> 'take' (porter would keep
    # 'taken'); misses still stem ('taking' -> 'take' via porter)
    assert plansum_tokens("taken taking") == ["take", "take"]
    # len<=3 tokens never reach the lookup ('men', 'ate' stay verbatim)
    assert plansum_tokens("men ate") == ["men", "ate"]
    # cross-form pairs now score as matches, like py-rouge
    hyp = plansum_tokens("the staff brought our food")
    ref = plansum_tokens("staff brings the food")
    # hyp: the staff bring our food; ref: staff bring the food
    assert rouge_n_pair(hyp, ref, 1) == pytest.approx(
        2 * (4 / 5) * (4 / 4) / ((4 / 5) + (4 / 4)))


def test_wordnet_table_wellformed():
    from multimodalsum_tpu.eval.wordnet_exc import WORDNET_EXCEPTIONS

    assert len(WORDNET_EXCEPTIONS) > 250
    for k, v in WORDNET_EXCEPTIONS.items():
        assert k == k.lower() and len(k) > 3, k
        assert v and v == v.lower(), (k, v)
        # a base form must not itself remap (idempotence of the mapping)
        assert v not in WORDNET_EXCEPTIONS, (k, v)
