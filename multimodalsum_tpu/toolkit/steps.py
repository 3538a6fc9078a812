"""Pipeline steps: readers, transformers, collectors, formatters.

Equivalents of the reference ``mltoolkit/mldp`` step zoo (readers
``CsvReader``/``JsonReader``; transformers ``TokenProcessor``/``VocabMapper``/
``Padder``/``SeqLenComputer``/``FieldSelector``/``FieldRenamer``/
``ChunkSorter``/``FunctionApplier``/``Postfixer``; collectors
``ChunkAccumulator``/``ChunkCollector``/``UnitCollector``/``ChunkShuffler``;
formatters Pandas/numpy) re-designed around
:class:`~multimodalsum_tpu.toolkit.chunk.DataChunk`.
"""

from __future__ import annotations

import csv
import glob
import json
from typing import Callable, Iterable, Iterator, List, Mapping, Optional, Sequence

import numpy as np

from multimodalsum_tpu.toolkit.chunk import DataChunk, InvalidChunkError


class Step:
    """Common base; subclasses implement one of the roles below."""

    def signature(self) -> dict:
        """Introspectable config (the reference auto-documents pipelines via
        signature scraping, ``mlutils/tools/signature_scraper.py``)."""
        return {k: v for k, v in vars(self).items() if not k.startswith("_")}


# ---------------------------------------------------------------------------
# readers


class Reader(Step):
    def iter_chunks(self, source) -> Iterator[DataChunk]:
        raise NotImplementedError


class CsvReader(Reader):
    """Stream a CSV (or glob of CSVs) in chunks of ``chunk_size`` rows."""

    def __init__(self, chunk_size: int = 100, sep: str = ",", encoding: str = "utf-8"):
        self.chunk_size = chunk_size
        self.sep = sep
        self.encoding = encoding

    def iter_chunks(self, source) -> Iterator[DataChunk]:
        paths = sorted(glob.glob(source)) if isinstance(source, str) else list(source)
        if not paths:
            raise FileNotFoundError(f"no files match {source!r}")
        for path in paths:
            with open(path, encoding=self.encoding, newline="") as f:
                reader = csv.DictReader(f, delimiter=self.sep)
                rows: List[dict] = []
                for row in reader:
                    if None in row or any(v is None for v in row.values()):
                        raise InvalidChunkError(f"malformed CSV row in {path}: {row}")
                    rows.append(row)
                    if len(rows) == self.chunk_size:
                        yield _rows_to_chunk(rows)
                        rows = []
                if rows:
                    yield _rows_to_chunk(rows)


class JsonReader(Reader):
    """Stream JSON-lines files in chunks."""

    def __init__(self, chunk_size: int = 100, encoding: str = "utf-8"):
        self.chunk_size = chunk_size
        self.encoding = encoding

    def iter_chunks(self, source) -> Iterator[DataChunk]:
        paths = sorted(glob.glob(source)) if isinstance(source, str) else list(source)
        if not paths:
            raise FileNotFoundError(f"no files match {source!r}")
        for path in paths:
            rows: List[dict] = []
            with open(path, encoding=self.encoding) as f:
                for line in f:
                    if line.strip():
                        rows.append(json.loads(line))
                    if len(rows) == self.chunk_size:
                        yield _rows_to_chunk(rows)
                        rows = []
            if rows:
                yield _rows_to_chunk(rows)


def shuffle_files(paths: Sequence[str], seed: int = 0) -> List[str]:
    """Shuffle input file order (reference mldp ``FileShuffler``) — feed the
    result to ``Pipeline.iter`` for epoch-level file-order randomisation."""
    import numpy as _np

    paths = list(paths)
    _np.random.default_rng(seed).shuffle(paths)
    return paths


def _rows_to_chunk(rows: List[dict]) -> DataChunk:
    keys = rows[0].keys()
    chunk = DataChunk()
    for k in keys:
        vals = [r[k] for r in rows]
        chunk[k] = np.asarray(vals, dtype=object) if any(
            isinstance(v, (list, dict)) for v in vals) else np.asarray(vals)
    return chunk


# ---------------------------------------------------------------------------
# transformers


class Transformer(Step):
    def __call__(self, chunk: DataChunk) -> DataChunk:
        raise NotImplementedError


class FieldSelector(Transformer):
    def __init__(self, field_names: Sequence[str]):
        self.field_names = list(field_names)

    def __call__(self, chunk: DataChunk) -> DataChunk:
        return DataChunk(**{k: chunk[k] for k in self.field_names})


class FieldRenamer(Transformer):
    def __init__(self, mapping: Mapping[str, str]):
        self.mapping = dict(mapping)

    def __call__(self, chunk: DataChunk) -> DataChunk:
        return DataChunk(**{self.mapping.get(k, k): v for k, v in chunk.items()})


class FunctionApplier(Transformer):
    """Apply per-field unit functions: {field: fn}."""

    def __init__(self, funcs: Mapping[str, Callable]):
        self.funcs = dict(funcs)

    def __call__(self, chunk: DataChunk) -> DataChunk:
        out = DataChunk(**chunk.fields())
        for field, fn in self.funcs.items():
            out[field] = np.asarray([fn(v) for v in chunk[field]], dtype=object)
        return out


class TokenProcessor(Transformer):
    """Split string fields into token lists (reference TokenProcessor)."""

    def __init__(self, fields: Sequence[str], tokenizer: Callable[[str], List[str]] = str.split):
        self.fields = list(fields)
        self.tokenizer = tokenizer

    def __call__(self, chunk: DataChunk) -> DataChunk:
        out = DataChunk(**chunk.fields())
        for f in self.fields:
            out[f] = np.asarray([self.tokenizer(str(v)) for v in chunk[f]], dtype=object)
        return out


class VocabMapper(Transformer):
    """Map token-list fields to id lists through a Vocabulary."""

    def __init__(self, vocabs: Mapping[str, "object"]):
        self.vocabs = dict(vocabs)

    def __call__(self, chunk: DataChunk) -> DataChunk:
        out = DataChunk(**chunk.fields())
        for f, vocab in self.vocabs.items():
            out[f] = np.asarray([vocab.ids(list(v)) for v in chunk[f]], dtype=object)
        return out


class SeqLenComputer(Transformer):
    def __init__(self, field: str, out_field: Optional[str] = None):
        self.field = field
        self.out_field = out_field or f"{field}_len"

    def __call__(self, chunk: DataChunk) -> DataChunk:
        out = DataChunk(**chunk.fields())
        out[self.out_field] = np.asarray([len(v) for v in chunk[self.field]], np.int32)
        return out


class Padder(Transformer):
    """Pad ragged id-list fields to rectangular arrays + produce masks."""

    def __init__(self, fields: Sequence[str], pad_value: int = 0,
                 max_length: Optional[int] = None, mask_suffix: str = "_mask"):
        self.fields = list(fields)
        self.pad_value = pad_value
        self.max_length = max_length
        self.mask_suffix = mask_suffix

    def __call__(self, chunk: DataChunk) -> DataChunk:
        out = DataChunk(**chunk.fields())
        for f in self.fields:
            seqs = [list(v) for v in chunk[f]]
            width = self.max_length or max((len(s) for s in seqs), default=0)
            ids = np.full((len(seqs), width), self.pad_value, np.int32)
            mask = np.zeros((len(seqs), width), np.int32)
            for i, s in enumerate(seqs):
                s = s[:width]
                ids[i, : len(s)] = s
                mask[i, : len(s)] = 1
            out[f] = ids
            out[f + self.mask_suffix] = mask
        return out


class SeqWrapper(Transformer):
    """Wrap token-list fields with start/end symbols (reference SeqWrapper)."""

    def __init__(self, fields: Sequence[str], start=None, end=None):
        self.fields = list(fields)
        self.start = start
        self.end = end

    def __call__(self, chunk: DataChunk) -> DataChunk:
        out = DataChunk(**chunk.fields())
        for f in self.fields:
            wrapped = []
            for seq in chunk[f]:
                seq = list(seq)
                if self.start is not None:
                    seq = [self.start] + seq
                if self.end is not None:
                    seq = seq + [self.end]
                wrapped.append(seq)
            out[f] = np.asarray(wrapped, dtype=object)
        return out


class UnitSampler(Transformer):
    """Keep at most ``k`` randomly-sampled units per chunk (reference
    UnitSampler)."""

    def __init__(self, k: int, seed: int = 0):
        self.k = k
        self._rng = np.random.default_rng(seed)

    def __call__(self, chunk: DataChunk) -> DataChunk:
        n = len(chunk)
        if n <= self.k:
            return chunk
        idx = np.sort(self._rng.choice(n, self.k, replace=False))
        return chunk.select(idx)


class ChunkSorter(Transformer):
    def __init__(self, field: str, descending: bool = False):
        self.field = field
        self.descending = descending

    def __call__(self, chunk: DataChunk) -> DataChunk:
        keys = chunk[self.field]
        if keys.dtype == object:
            order = np.asarray(sorted(range(len(keys)), key=lambda i: keys[i]))
        else:
            order = np.argsort(keys, kind="stable")
        if self.descending:
            order = order[::-1]
        return chunk.select(order)


class Postfixer(Transformer):
    """Append an occurrence-count postfix to a chunk-uniform id field
    (reference ``mldp/steps/transformers/general/postfixer.py:5``): the k-th
    chunk seen for id ``X`` becomes ``"X_k"``. Stateful across the stream —
    disambiguates multiple chunks of the same group (e.g. a business with
    more reviews than fit one chunk)."""

    def __init__(self, id_field: str):
        self.id_field = id_field
        self._counts: dict = {}

    def __call__(self, chunk: DataChunk) -> DataChunk:
        vals = chunk[self.id_field]
        uniq = {str(v) for v in vals}
        if len(uniq) != 1:
            raise InvalidChunkError(
                f"Postfixer requires a chunk-uniform {self.id_field!r}, "
                f"got {sorted(uniq)[:3]}...")
        key = str(vals[0])
        self._counts[key] = self._counts.get(key, 0) + 1
        new_id = f"{key}_{self._counts[key]}"
        chunk[self.id_field] = np.array([new_id] * len(chunk), dtype=object)
        return chunk


# ---------------------------------------------------------------------------
# collectors (change chunk boundaries)


class Collector(Step):
    def __call__(self, chunks: Iterator[DataChunk]) -> Iterator[DataChunk]:
        raise NotImplementedError


class ChunkAccumulator(Collector):
    """Re-batch the stream to a new chunk size."""

    def __init__(self, new_size: int):
        self.new_size = new_size

    def __call__(self, chunks: Iterator[DataChunk]) -> Iterator[DataChunk]:
        buf: List[DataChunk] = []
        count = 0
        for ch in chunks:
            buf.append(ch)
            count += len(ch)
            while count >= self.new_size:
                merged = DataChunk.concat(buf)
                yield merged.select(np.arange(self.new_size))
                rest = merged.select(np.arange(self.new_size, len(merged)))
                buf = [rest] if len(rest) else []
                count = len(rest)
        if count:
            yield DataChunk.concat(buf)


class ChunkCollector(Collector):
    """Merge every ``buffer_size`` consecutive chunks into one (reference
    ``mldp/steps/collectors/chunk_collector.py:6``). With ``strict=True``
    (the reference default) a trailing incomplete buffer is dropped;
    ``strict=False`` flushes it as a final smaller chunk."""

    def __init__(self, buffer_size: int, strict: bool = True):
        self.buffer_size = buffer_size
        self.strict = strict

    def __call__(self, chunks: Iterator[DataChunk]) -> Iterator[DataChunk]:
        buf: List[DataChunk] = []
        for ch in chunks:
            buf.append(ch)
            if len(buf) == self.buffer_size:
                yield DataChunk.concat(buf)
                buf = []
        if buf and not self.strict:
            yield DataChunk.concat(buf)


class UnitCollector(Collector):
    """Unit-level re-chunking (reference
    ``mldp/steps/collectors/unit_collector.py:8``): emit chunks of exactly
    ``max_size`` units regardless of incoming chunk boundaries, plus the
    remainder at stream end; ``max_size=None`` merges the whole stream into
    one chunk. The bounded case is what :class:`ChunkAccumulator` wraps on
    the main path."""

    def __init__(self, max_size: Optional[int] = None):
        self.max_size = max_size

    def __call__(self, chunks: Iterator[DataChunk]) -> Iterator[DataChunk]:
        if self.max_size is None:
            buf = list(chunks)
            if buf:
                yield DataChunk.concat(buf)
            return
        yield from ChunkAccumulator(self.max_size)(chunks)


class ChunkShuffler(Collector):
    """Buffer up to ``buffer_size`` chunks and yield them in random order."""

    def __init__(self, buffer_size: int = 16, seed: int = 0):
        self.buffer_size = buffer_size
        self.seed = seed

    def __call__(self, chunks: Iterator[DataChunk]) -> Iterator[DataChunk]:
        rng = np.random.default_rng(self.seed)
        buf: List[DataChunk] = []
        for ch in chunks:
            buf.append(ch)
            if len(buf) == self.buffer_size:
                rng.shuffle(buf)
                yield from buf
                buf = []
        rng.shuffle(buf)
        yield from buf


# ---------------------------------------------------------------------------
# formatters


class Formatter(Step):
    def __call__(self, chunk: DataChunk):
        raise NotImplementedError


class NumpyFormatter(Formatter):
    """DataChunk → plain dict of numpy arrays (the shape jit consumes)."""

    def __call__(self, chunk: DataChunk):
        return chunk.fields()


class PandasFormatter(Formatter):
    def __call__(self, chunk: DataChunk):
        import pandas as pd

        return pd.DataFrame({k: list(v) for k, v in chunk.items()})
