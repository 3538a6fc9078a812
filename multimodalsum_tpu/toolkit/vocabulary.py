"""Vocabulary: token↔id mapping with counts and special symbols.

Equivalent of the reference's ``mltoolkit/mldp`` ``Vocabulary``
(``mldp/utils/tools/vocabulary.py:29``): build from iterables or files, add
special symbols, map tokens to ids (OOV → unk when present), persist to disk.
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Iterable, List, Optional, Sequence


class VocabEntry:
    __slots__ = ("token", "id", "count")

    def __init__(self, token: str, id: int, count: int = 0):
        self.token, self.id, self.count = token, id, count

    def __repr__(self):
        return f"VocabEntry({self.token!r}, id={self.id}, count={self.count})"


class Vocabulary:
    def __init__(self, unk: Optional[str] = "<unk>"):
        self._by_token: dict = {}
        self._by_id: List[VocabEntry] = []
        self.unk = unk
        if unk is not None:
            self.add_special(unk)

    # -- construction ---------------------------------------------------------

    def add_special(self, token: str) -> VocabEntry:
        return self._add(token, count=0)

    def _add(self, token: str, count: int) -> VocabEntry:
        if token in self._by_token:
            e = self._by_token[token]
            e.count += count
            return e
        e = VocabEntry(token, len(self._by_id), count)
        self._by_token[token] = e
        self._by_id.append(e)
        return e

    def build(self, token_iter: Iterable[Sequence[str]], min_count: int = 1,
              max_size: Optional[int] = None) -> "Vocabulary":
        counts = Counter()
        for tokens in token_iter:
            counts.update(tokens)
        items = [(t, c) for t, c in counts.most_common() if c >= min_count]
        if max_size is not None:
            items = items[: max(max_size - len(self._by_id), 0)]
        for t, c in items:
            self._add(t, c)
        return self

    # -- mapping ----------------------------------------------------------------

    def __len__(self) -> int:
        return len(self._by_id)

    def __contains__(self, token: str) -> bool:
        return token in self._by_token

    def __getitem__(self, key):
        if isinstance(key, str):
            if key in self._by_token:
                return self._by_token[key]
            if self.unk is not None:
                return self._by_token[self.unk]
            raise KeyError(key)
        return self._by_id[key]

    def ids(self, tokens: Sequence[str]) -> List[int]:
        return [self[t].id for t in tokens]

    def tokens(self, ids: Sequence[int]) -> List[str]:
        return [self._by_id[i].token for i in ids]

    # -- persistence --------------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            for e in self._by_id:
                f.write(f"{e.token}\t{e.count}\n")

    @classmethod
    def load(cls, path: str, unk: Optional[str] = "<unk>") -> "Vocabulary":
        v = cls(unk=None)
        with open(path, encoding="utf-8") as f:
            for line in f:
                token, count = line.rstrip("\n").split("\t")
                v._add(token, int(count))
        v.unk = unk if unk is not None and unk in v else None
        return v
