"""Self-contained ROUGE-1/2/L implementation (ROUGE-1.5.5 / py-rouge semantics).

The reference scores with the ``py-rouge`` package (reference
``src/test.py:28-41``), which is not installed in this environment (the
installed ``rouge`` 1.0.1 is a different library). This module implements the
protocol the reference actually exercises:

* PlanSum preprocessing first (``eval/metrics.py``): lowercase, strip
  non-alphanumerics, Porter-stem tokens longer than 3 chars (ROUGE-1.5.5
  behaviour), with 'cannot' protected;
* after that preprocessing each summary is a single "sentence" (all
  punctuation is gone), so py-rouge's summary-level ROUGE-L reduces to plain
  LCS per (hypothesis, reference) pair;
* ROUGE-N: clipped n-gram multiset overlap;
* F-score with alpha=0.5: ``1 / (alpha/p + (1-alpha)/r)`` = harmonic mean;
* ``apply_avg``: mean F over pairs.

Note: the installed ``rouge`` 1.0.1 library is NOT a valid oracle — it counts
unique n-grams (set semantics) instead of ROUGE-1.5.5's clipped multiset
counts; this module follows ROUGE-1.5.5 (like py-rouge). Unit-tested against
hand-computed examples in ``tests/test_eval.py``.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List

from nltk.stem import PorterStemmer

_REMOVE_CHARS = re.compile(r"[^A-Za-z0-9]")
_STEMMER = PorterStemmer()


def plansum_tokens(text: str) -> List[str]:
    """PlanSum preprocessing to a token list (reference ``rouge_preprocess``,
    ``src/test.py:19-26``): lowercase → strip punctuation → tokenize →
    Porter-stem tokens with len > 3 → 'cannot' kept intact."""
    text = _REMOVE_CHARS.sub(" ", text.lower()).strip()
    out = []
    for tok in text.split():
        if tok != "cannot" and len(tok) > 3:
            tok = _STEMMER.stem(tok)
        out.append(tok)
    return out


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def _fscore(hits: float, p_total: float, r_total: float, alpha: float = 0.5) -> float:
    if hits == 0 or p_total == 0 or r_total == 0:
        return 0.0
    p = hits / p_total
    r = hits / r_total
    return 1.0 / (alpha / p + (1 - alpha) / r)


def rouge_n_pair(hyp: List[str], ref: List[str], n: int, alpha: float = 0.5) -> float:
    h, r = _ngrams(hyp, n), _ngrams(ref, n)
    hits = sum(min(c, r[g]) for g, c in h.items())
    return _fscore(hits, sum(h.values()), sum(r.values()), alpha)


def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def rouge_l_pair(hyp: List[str], ref: List[str], alpha: float = 0.5) -> float:
    return _fscore(_lcs_len(hyp, ref), len(hyp), len(ref), alpha)


def rouge_scores_tokens(
    hyps: List[List[str]], refs: List[List[str]], alpha: float = 0.5
) -> Dict[str, float]:
    """Corpus scores: mean pairwise F (py-rouge ``apply_avg=True``), ×100."""
    assert len(hyps) == len(refs)
    n = len(hyps)
    r1 = sum(rouge_n_pair(h, r, 1, alpha) for h, r in zip(hyps, refs)) / n
    r2 = sum(rouge_n_pair(h, r, 2, alpha) for h, r in zip(hyps, refs)) / n
    rl = sum(rouge_l_pair(h, r, alpha) for h, r in zip(hyps, refs)) / n
    return {"rouge1": r1 * 100, "rouge2": r2 * 100, "rougeL": rl * 100}
