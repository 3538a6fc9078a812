"""Byte-level BPE tokenizer (BART / GPT-2 scheme), self-contained.

The reference relies on the installed HuggingFace ``BartTokenizer``
(``src/train_utils.py:34``) with ``add_prefix_space=True`` everywhere
(``src/data_utils.py:26-28``). This environment has no network and no cached
vocab files, so the framework owns a complete implementation: GPT-2
pre-tokenization regex, byte→unicode table, merge-rank BPE with caching, and
the BART special-token layout (<s>=0, <pad>=1, </s>=2, <unk>=3, <mask>=last).

Loads standard ``vocab.json`` + ``merges.txt`` (drop-in for the
facebook/bart-large files); :func:`train_bpe` builds a compatible pair from a
corpus with the HF ``tokenizers`` library when available.

Verified against ``tokenizers.ByteLevelBPETokenizer`` in
``tests/test_tokenizer.py``.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Iterable, List, Optional, Sequence

try:  # the GPT-2 split pattern needs \p classes
    import regex as _re
except ImportError:  # pragma: no cover
    _re = None

_GPT2_SPLIT = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)


@lru_cache()
def bytes_to_unicode():
    """GPT-2's reversible byte→printable-unicode map."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: tuple) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class ByteLevelBPETokenizer:
    """BART-compatible tokenizer over ``vocab.json`` / ``merges.txt``."""

    def __init__(self, vocab: dict, merges: Sequence[tuple],
                 bos="<s>", pad="<pad>", eos="</s>", unk="<unk>", mask="<mask>"):
        if _re is None:
            raise ImportError("the 'regex' package is required for tokenization")
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.pattern = _re.compile(_GPT2_SPLIT)
        self._cache: dict = {}

        # optional native (C++) merge engine; falls back to Python silently
        self._native = None
        try:
            from multimodalsum_tpu.native.binding import NativeBPE

            self._native = NativeBPE(self.encoder, merges,
                                     unk_id=self.encoder.get(unk, 3))
        except Exception:
            self._native = None

        self.bos_token, self.pad_token, self.eos_token = bos, pad, eos
        self.unk_token, self.mask_token = unk, mask
        self.bos_token_id = self.encoder.get(bos, 0)
        self.pad_token_id = self.encoder.get(pad, 1)
        self.eos_token_id = self.encoder.get(eos, 2)
        self.unk_token_id = self.encoder.get(unk, 3)
        self.mask_token_id = self.encoder.get(mask, len(self.encoder) - 1)
        self.special_ids = {
            self.bos_token_id, self.pad_token_id, self.eos_token_id,
            self.unk_token_id, self.mask_token_id,
        }

    # ---- construction ----------------------------------------------------

    @classmethod
    def from_files(cls, vocab_file: str, merges_file: str, **kw) -> "ByteLevelBPETokenizer":
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(merges_file, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                merges.append(tuple(line.split()))
        return cls(vocab, merges, **kw)

    @classmethod
    def from_dir(cls, path: str, **kw) -> "ByteLevelBPETokenizer":
        return cls.from_files(os.path.join(path, "vocab.json"),
                              os.path.join(path, "merges.txt"), **kw)

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    # ---- BPE core ----------------------------------------------------------

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token)
        pairs = _get_pairs(word)
        while pairs:
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = list(word)
        self._cache[token] = out
        return out

    def tokenize_to_ids(self, text: str) -> List[int]:
        pretokens = [
            "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for tok in self.pattern.findall(text)
        ]
        if self._native is not None:
            return self._native.encode_pretokens(pretokens)
        ids: List[int] = []
        for mapped in pretokens:
            for piece in self._bpe(mapped):
                ids.append(self.encoder.get(piece, self.unk_token_id))
        return ids

    # ---- HF-style call API (the subset the data layer uses) ---------------

    def encode(
        self,
        text: str,
        add_special_tokens: bool = True,
        add_prefix_space: bool = False,
        max_length: Optional[int] = None,
        truncation: bool = False,
        padding: Optional[str] = None,
    ) -> List[int]:
        if add_prefix_space and not text.startswith(" "):
            text = " " + text
        ids = self.tokenize_to_ids(text)
        if add_special_tokens:
            room = max_length - 2 if (max_length and truncation) else None
            if room is not None:
                ids = ids[:room]
            ids = [self.bos_token_id] + ids + [self.eos_token_id]
        elif max_length and truncation:
            ids = ids[:max_length]
        if padding == "max_length" and max_length:
            ids = ids + [self.pad_token_id] * (max_length - len(ids))
        return ids

    def __call__(self, text, **kw):
        """Batched helper returning {'input_ids', 'attention_mask'} like HF."""
        texts = [text] if isinstance(text, str) else list(text)
        all_ids = [self.encode(t, **kw) for t in texts]
        masks = [[1 if i != self.pad_token_id else 0 for i in ids] for ids in all_ids]
        if isinstance(text, str):
            return {"input_ids": all_ids[0], "attention_mask": masks[0]}
        return {"input_ids": all_ids, "attention_mask": masks}

    def decode(self, ids: Iterable[int], skip_special_tokens: bool = True) -> str:
        pieces = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in self.special_ids:
                continue
            pieces.append(self.decoder.get(i, self.unk_token))
        text = "".join(pieces)
        raw = bytearray(self.byte_decoder.get(c, ord("?")) for c in text)
        return raw.decode("utf-8", errors="replace")


def train_bpe(corpus: Iterable[str], vocab_size: int, out_dir: str) -> ByteLevelBPETokenizer:
    """Train a compatible byte-level BPE (requires the HF ``tokenizers`` lib)
    and save ``vocab.json``/``merges.txt`` to ``out_dir``."""
    from tokenizers import ByteLevelBPETokenizer as _HFTrainer

    t = _HFTrainer()
    t.train_from_iterator(
        corpus, vocab_size=vocab_size, min_frequency=1,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
    )
    os.makedirs(out_dir, exist_ok=True)
    t.save_model(out_dir)
    return ByteLevelBPETokenizer.from_dir(out_dir)
