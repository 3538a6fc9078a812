"""DataChunk: the unit of flow through the toolkit pipeline.

Equivalent of the reference's ``mltoolkit/mldp`` ``DataChunk``
(``mldp/utils/tools/data_chunk.py:10``): a mapping of field name → equal-length
numpy arrays, with structural validation. Chunks are what readers emit,
transformers rewrite, and formatters consume.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, Mapping

import numpy as np


class InvalidChunkError(ValueError):
    """Raised when a chunk's structure is inconsistent."""


class DataChunk:
    """Dict-of-arrays with enforced equal first-axis length."""

    def __init__(self, **fields):
        self._data: Dict[str, np.ndarray] = {}
        for name, values in fields.items():
            self[name] = values

    # -- mapping interface --------------------------------------------------

    def __setitem__(self, name: str, values) -> None:
        arr = values if isinstance(values, np.ndarray) else np.asarray(values, dtype=object) \
            if _is_ragged(values) else np.asarray(values)
        self._data[name] = arr

    def __getitem__(self, name: str) -> np.ndarray:
        return self._data[name]

    def __delitem__(self, name: str) -> None:
        del self._data[name]

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def fields(self) -> Dict[str, np.ndarray]:
        return dict(self._data)

    def __len__(self) -> int:
        """Number of data units (first-axis length); 0 for an empty chunk."""
        if not self._data:
            return 0
        self.validate()
        return len(next(iter(self._data.values())))

    def __eq__(self, other) -> bool:
        if not isinstance(other, DataChunk):
            return NotImplemented
        if set(self.keys()) != set(other.keys()):
            return False
        return all(
            len(self._data[k]) == len(other[k])
            and all(np.array_equal(a, b) for a, b in zip(self._data[k], other[k]))
            for k in self._data
        )

    def __repr__(self) -> str:
        return f"DataChunk({', '.join(f'{k}[{len(v)}]' for k, v in self._data.items())})"

    # -- validation & helpers -------------------------------------------------

    def validate(self) -> None:
        lengths = {k: len(v) for k, v in self._data.items()}
        if len(set(lengths.values())) > 1:
            raise InvalidChunkError(f"field length mismatch: {lengths}")

    @property
    def valid(self) -> bool:
        try:
            self.validate()
            return True
        except InvalidChunkError:
            return False

    def select(self, indices) -> "DataChunk":
        return DataChunk(**{k: v[indices] for k, v in self._data.items()})

    def iter_units(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield {k: v[i] for k, v in self._data.items()}

    @staticmethod
    def concat(chunks: Iterable["DataChunk"]) -> "DataChunk":
        chunks = [c for c in chunks if len(c)]
        if not chunks:
            return DataChunk()
        keys = chunks[0].keys()
        out = DataChunk()
        for k in keys:
            vals = [c[k] for c in chunks]
            if any(v.dtype == object for v in vals):
                merged = np.empty(sum(len(v) for v in vals), object)
                i = 0
                for v in vals:
                    merged[i:i + len(v)] = v
                    i += len(v)
                out[k] = merged
            else:
                out[k] = np.concatenate(vals)
        return out


def _is_ragged(values) -> bool:
    if isinstance(values, np.ndarray):
        return False
    try:
        lens = {len(v) for v in values if hasattr(v, "__len__") and not isinstance(v, str)}
        return len(lens) > 1
    except TypeError:
        return False
