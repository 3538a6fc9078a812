"""Evaluation metrics: ROUGE (PlanSum protocol) + BERTScore + incomplete count.

Implements the exact scoring protocol of reference ``src/test.py:19-47``:
PlanSum preprocessing (lowercase, strip punctuation, Porter stemming with the
'cannot' guard) applied to predictions and references, then ROUGE-1/2/L F1
(alpha=0.5, averaged over pairs) ×100, the "incomplete" count (summaries not
ending in '.' or '!'), and BERTScore-F ×100 when the optional ``bert-score``
package is present.

The ROUGE computation itself lives in ``eval/rouge_impl.py`` (py-rouge is not
installed in this environment; ROUGE-1.5.5 clipped-multiset/LCS semantics are
implemented natively and unit-tested on hand-computed examples).

Quality-parity floor measured with this scorer on the reference model's own
published outputs (``output/Yelp.txt`` / ``output/Amazon.txt`` vs the gold
test summaries): Yelp R1/R2/RL = 32.50/6.60/19.73, Amazon (3-ref avg) =
33.75/6.88/20.68. Our trained models must match these under the same scorer.
"""

from __future__ import annotations

from typing import Dict, List

from multimodalsum_tpu.eval.rouge_impl import plansum_tokens, rouge_scores_tokens


def rouge_scores(predictions: List[str], references: List[str]) -> Dict[str, float]:
    """ROUGE-1/2/L F1 ×100 + incomplete count (reference ``calc_rouge``)."""
    hyps = [plansum_tokens(p) for p in predictions]
    refs = [plansum_tokens(r) for r in references]
    out = rouge_scores_tokens(hyps, refs)
    out["incomplete"] = sum(
        1 for p in predictions if not (p.endswith(".") or p.endswith("!"))
    )
    return out


def bert_scores(predictions: List[str], references: List[str]) -> Dict[str, float]:
    """BERTScore-F ×100 (reference ``calc_bert``). Requires the optional
    ``bert-score`` package and downloadable weights (absent offline)."""
    try:
        from bert_score import score as _bs
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "bert-score is not installed in this environment; BERTScore is "
            "an optional metric (reference src/test.py:43-47)"
        ) from e
    _, _, f = _bs(predictions, references, lang="en", verbose=False)
    return {"bertF": float(f.mean()) * 100}


def aggregate_multi_reference(
    predictions: List[str], reference_sets: List[List[str]], with_bert: bool = False
) -> Dict[str, float]:
    """Score against each gold column then average (reference
    ``src/test.py:222-236`` — Amazon has 3 summaries per product)."""
    num_refs = len(reference_sets[0])
    per_ref = []
    for j in range(num_refs):
        refs = [rs[j] for rs in reference_sets]
        s = rouge_scores(predictions, refs)
        if with_bert:
            s.update(bert_scores(predictions, refs))
        per_ref.append(s)
    keys = per_ref[0].keys()
    return {k: sum(s[k] for s in per_ref) / num_refs for k in keys}
