"""Self-contained ROUGE-1/2/L implementation (ROUGE-1.5.5 / py-rouge semantics).

The reference scores with the ``py-rouge`` package (reference
``src/test.py:28-41``), which is not installed in this environment (the
installed ``rouge`` 1.0.1 is a different library). This module implements the
protocol the reference actually exercises:

* PlanSum preprocessing first (``eval/metrics.py``), reproducing py-rouge's
  ``_preprocess_summary_as_a_whole`` with ``ensure_compatibility=True``:
  lowercase → non-alphanumerics to spaces (``REMOVE_CHAR_PATTERN``) →
  substring 'cannot' protected as ``_cannot_`` → nltk Treebank word
  tokenization (which splits the lexicalised contractions *gonna*/*wanna*/
  *gotta*/*lemme*/*gimme* → ``gon na`` etc., exactly as py-rouge's
  ``nltk.word_tokenize`` does) → Porter-stem tokens longer than 3 chars with
  the stemmer's **ORIGINAL_ALGORITHM** mode (what py-rouge instantiates for
  ROUGE-1.5.5 compatibility — NLTK's default extension mode stems e.g.
  'dying'→'die' where the original algorithm gives 'dy') → ``_cannot_``
  restored to 'cannot' on the joined string;
* after that preprocessing each summary is a single "sentence" (all
  punctuation is gone), so py-rouge's summary-level ROUGE-L reduces to plain
  LCS per (hypothesis, reference) pair;
* ROUGE-N: clipped n-gram multiset overlap;
* F-score: ``p*r / (alpha*r + (1-alpha)*p)`` — algebraically identical to
  py-rouge's ``precision*recall / ((1-alpha)*precision + alpha*recall)`` for
  every alpha (harmonic mean at 0.5; alpha→1 weights precision);
* ``apply_avg``: mean F over pairs.

Like py-rouge, irregular word forms are mapped through a WordNet
exception table *instead of* Porter stemming ('children' -> 'child',
'brought' -> 'bring'): py-rouge's ``stem_tokens`` consults
``wordnet_key_value.txt`` for every token longer than 3 chars and only stems
on a miss. That data file is not available offline, so ``eval/wordnet_exc.py``
ships a curated equivalent covering the common English irregular inflections
(see its docstring and PARITY.md for the tiny residual gap on rare forms).

Note: the installed ``rouge`` 1.0.1 library is NOT a valid oracle — it counts
unique n-grams (set semantics) instead of ROUGE-1.5.5's clipped multiset
counts. The scoring core here is validated against Google's ``rouge_score``
(an independent ROUGE-1.5.5 reimplementation) on a randomized battery plus
hand-computed cases in ``tests/test_rouge_oracle.py`` / ``tests/test_eval.py``.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List

from nltk.stem import PorterStemmer
from nltk.tokenize.treebank import TreebankWordTokenizer

from multimodalsum_tpu.eval.wordnet_exc import WORDNET_EXCEPTIONS

_REMOVE_CHARS = re.compile(r"[^A-Za-z0-9]")  # py-rouge REMOVE_CHAR_PATTERN
# py-rouge: Rouge.STEMMER = PorterStemmer('ORIGINAL_ALGORITHM') when
# ensure_compatibility (the default, and what reference src/test.py:28 uses)
_STEMMER = PorterStemmer(mode="ORIGINAL_ALGORITHM")
# py-rouge tokenize_text = nltk.word_tokenize = sent_tokenize + Treebank; on
# punctuation-free text sentence splitting is a no-op, leaving pure Treebank
_TREEBANK = TreebankWordTokenizer()


def plansum_tokens(text: str) -> List[str]:
    """PlanSum preprocessing to a token list (reference ``rouge_preprocess``,
    ``src/test.py:19-26``; py-rouge ``_preprocess_summary_as_a_whole``):
    lowercase → strip punctuation → protect substring 'cannot' → Treebank
    tokenize → for tokens with len > 3: WordNet irregular-form lookup, else
    Porter-stem (ORIGINAL_ALGORITHM) → restore 'cannot'."""
    text = _REMOVE_CHARS.sub(" ", text.lower()).strip()
    # KEEP_CANNOT_IN_ONE_WORD is a plain substring sub in py-rouge
    text = text.replace("cannot", "_cannot_")
    out = []
    for tok in _TREEBANK.tokenize(text):
        if len(tok) > 3:
            # py-rouge stem_tokens: WordNet exception hit REPLACES stemming
            tok = WORDNET_EXCEPTIONS.get(tok) or _STEMMER.stem(tok)
        out.append(tok)
    # KEEP_CANNOT_IN_ONE_WORD_REVERSED applies to the joined string
    return " ".join(out).replace("_cannot_", "cannot").split()


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
