"""BART denoising noise for stage-0 pretraining.

Host-side numpy reimplementation of the reference collator
(``DataCollatorForBartModeling``, ``src/bart-review.py:53-229``):

* **sentence permutation** (ratio 1.0 by default): decode the example, split
  into sentences, permute ``ceil(n * ratio)`` of them among themselves,
  re-encode to the fixed block with EOS spliced at the first pad;
* **span infilling** (ratio 0.3): mask ``ceil(len * ratio)`` tokens using
  span lengths drawn from a truncated Poisson(λ=3) (``make_poisson_distribution``
  ``:231-246``); each span is replaced by a single ``<mask>``; zero-length
  spans become single-``<mask>`` insertions at random positions;
* **decoder inputs**: labels shifted right with BOS prepended
  (``create_decoder_input_ids`` ``:45-50`` — note: different from the
  leave-one-out ``shift_tokens_right``);
* **labels**: EOS spliced at the first pad position (``:71-77``).

Sentence splitting uses nltk's punkt when its data is available, else a
regex splitter (this environment has no punkt download).
"""

from __future__ import annotations

import math
import re
from typing import List

import numpy as np

_SENT_RE = re.compile(r"[^.!?]*[.!?]+(?:\s|$)|[^.!?]+$")


def split_sentences(text: str) -> List[str]:
    try:
        from nltk import sent_tokenize

        return sent_tokenize(text)
    except LookupError:
        return [m.group(0).strip() for m in _SENT_RE.finditer(text) if m.group(0).strip()]


def truncated_poisson_probs(lam: float = 3.0, cutoff: float = 1e-7, max_k: int = 128):
    """Span-length distribution (reference ``make_poisson_distribution``)."""
    ps = []
    p = math.exp(-lam)
    k_fact = 1.0
    lam_k = 1.0
    for k in range(max_k):
        ps.append(math.exp(-lam) * lam_k / k_fact)
        lam_k *= lam
        k_fact *= k + 1
        if ps[-1] < cutoff:
            break
    ps = np.asarray(ps)
    return ps / ps.sum()


class BartNoiser:
    """Produces {input_ids, labels, decoder_input_ids} batches from clean,
    pad-padded, special-token-free token rows (``ReviewDataset`` layout,
    ``src/bart-review.py:23-43``)."""

    def __init__(self, tokenizer, block_size: int = 128,
                 permute_sentence_ratio: float = 1.0, mask_ratio: float = 0.3,
                 poisson_lambda: float = 3.0, seed: int = 0):
        self.tok = tokenizer
        self.block = block_size
        self.permute_ratio = permute_sentence_ratio
        self.mask_ratio = mask_ratio
        self.span_probs = truncated_poisson_probs(poisson_lambda)
        self.rng = np.random.default_rng(seed)

    # ---- noise ops --------------------------------------------------------

    def _permute_sentences(self, row: np.ndarray) -> np.ndarray:
        pad = self.tok.pad_token_id
        toks = row[row != pad]
        sentences = np.asarray(split_sentences(self.tok.decode(toks)), dtype=object)
        n = len(sentences)
        if n == 0:
            return row.copy()
        num = math.ceil((n * 2 * self.permute_ratio) / 2.0)
        subs = self.rng.permutation(n)[:num]
        order = np.arange(n)
        order[subs] = subs[self.rng.permutation(num)]
        text = " ".join(sentences[order])
        ids = self.tok.encode(text, add_special_tokens=False, truncation=True,
                              max_length=self.block, padding="max_length")
        ids = np.asarray(ids, row.dtype)
        if ids[-1] == pad:  # splice EOS after content (reference :111-115)
            ids[np.argmax(ids == pad)] = self.tok.eos_token_id
        return ids

    def _sample_span_lengths(self, num_to_mask: int) -> np.ndarray:
        lengths = self.rng.choice(len(self.span_probs), size=num_to_mask, p=self.span_probs)
        cum = np.cumsum(lengths)
        while cum[-1] < num_to_mask:
            more = self.rng.choice(len(self.span_probs), size=num_to_mask, p=self.span_probs)
            lengths = np.concatenate([lengths, more])
            cum = np.cumsum(lengths)
        i = int(np.argmax(cum >= num_to_mask))
        lengths = lengths[: i + 1].copy()
        lengths[i] = num_to_mask - (0 if i == 0 else cum[i - 1])
        return lengths

    def _add_insertion_noise(self, toks: np.ndarray, p: float) -> np.ndarray:
        if p == 0.0 or len(toks) >= self.block:
            return toks
        n = min(int(math.ceil(len(toks) * p)), self.block - len(toks))
        if n <= 0:
            return toks
        noise_idx = self.rng.permutation(len(toks) + n - 2)[:n] + 1
        mask = np.zeros(len(toks) + n, bool)
        mask[noise_idx] = True
        out = np.empty(len(toks) + n, toks.dtype)
        out[mask] = self.tok.mask_token_id
        out[~mask] = toks
        return out

    def _infill(self, row: np.ndarray) -> np.ndarray:
        pad, mask_id = self.tok.pad_token_id, self.tok.mask_token_id
        toks = row[row != pad].copy()
        if len(toks) == 0:
            return row.copy()

        def padded(t):
            out = np.full(self.block, pad, row.dtype)
            out[: len(t)] = t[: self.block]
            return out

        # every position except the last counts as a maskable word start
        num_to_mask = int(math.ceil((len(toks) - 1) * self.mask_ratio + 1e-9)) \
            if len(toks) > 1 else 0
        if num_to_mask == 0:
            return padded(toks)

        lengths = self._sample_span_lengths(num_to_mask)
        lengths = lengths[lengths > 0]
        num_inserts = num_to_mask - len(lengths)
        num_to_mask = len(lengths)
        if num_to_mask == 0:
            return padded(self._add_insertion_noise(toks, num_inserts / len(toks)))

        starts = self.rng.permutation(len(toks) - 1)[:num_to_mask]
        keep = np.ones(len(toks), bool)
        toks[starts] = mask_id
        # delete the remaining span positions (single-token "words": each
        # following position completes one unit of the span length)
        for s, L in zip(starts, lengths):
            for j in range(s + 1, min(s + int(L), len(toks) - 1)):
                keep[j] = False
        toks = toks[keep]
        if num_inserts > 0:
            toks = self._add_insertion_noise(toks, num_inserts / len(toks))
        return padded(toks)

    # ---- batch entry ------------------------------------------------------

    def __call__(self, examples: np.ndarray) -> dict:
        """examples: ``[b, block]`` clean token rows (pad-padded, no specials)."""
        labels = np.array(examples, np.int32)
        inputs = labels
        if self.permute_ratio > 0.0:
            inputs = np.stack([self._permute_sentences(r) for r in labels])
        if self.mask_ratio > 0.0:
            inputs = np.stack([self._infill(r) for r in inputs])

        # NOTE: built from labels BEFORE the EOS splice below — the
        # reference does the same (bart-review.py:70 computes
        # create_decoder_input_ids(labels) and only then splices EOS into
        # labels at :72-75), so the decoder input never contains that EOS
        decoder_input_ids = np.roll(labels, 1, axis=1)
        decoder_input_ids[:, 0] = self.tok.bos_token_id

        labels = labels.copy()
        pad = self.tok.pad_token_id
        has_pad = labels[:, -1] == pad
        for i in np.where(has_pad)[0]:
            labels[i, np.argmax(labels[i] == pad)] = self.tok.eos_token_id
        return dict(input_ids=inputs.astype(np.int32), labels=labels,
                    decoder_input_ids=decoder_input_ids.astype(np.int32))
