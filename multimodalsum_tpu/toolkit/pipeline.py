"""Composable data pipeline with 0/1/N worker processes.

Equivalent of the reference's ``mltoolkit/mldp`` ``Pipeline``
(``mldp/pipeline.py:27-140``): a reader feeding transformer/collector steps
and an optional formatter, executed either serially (``workers=0``), in one
background process (``workers=1``), or across N processes each owning a
shard of the input files (``workers>=2``). Termination uses a sentinel token
and queue timeouts, like the reference (``pipeline.py:8,123-124``).

Validation happens at construction: step order must be readers → transformers
/collectors → formatter, mirroring the reference's ``test_validation``
contract. Empty chunks are suppressed (never yielded downstream).
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
from typing import Iterator, List, Optional, Sequence

from multimodalsum_tpu.toolkit.chunk import DataChunk, InvalidChunkError
from multimodalsum_tpu.toolkit.steps import Collector, Formatter, Reader, Transformer

_TERMINATION = "__pipeline_termination__"
_ERROR = "__pipeline_error__"


class PipelineError(RuntimeError):
    pass


class Pipeline:
    def __init__(self, reader: Reader, steps: Sequence = (),
                 formatter: Optional[Formatter] = None,
                 worker_processes_num: int = 0, queue_size: int = 8,
                 timeout: float = 60.0):
        if not isinstance(reader, Reader):
            raise ValueError(f"first component must be a Reader, got {type(reader).__name__}")
        for s in steps:
            if not isinstance(s, (Transformer, Collector)):
                raise ValueError(
                    f"middle steps must be Transformers/Collectors, got {type(s).__name__}")
        if formatter is not None and not isinstance(formatter, Formatter):
            raise ValueError(f"formatter must be a Formatter, got {type(formatter).__name__}")
        self.reader = reader
        self.steps = list(steps)
        self.formatter = formatter
        self.workers = worker_processes_num
        self.queue_size = queue_size
        self.timeout = timeout

    # -- serial core ---------------------------------------------------------

    def _apply_steps(self, chunks: Iterator[DataChunk]) -> Iterator[DataChunk]:
        stream = chunks
        for step in self.steps:
            if isinstance(step, Collector):
                stream = step(stream)
            else:
                stream = map(step, stream)
        for chunk in stream:
            chunk.validate()
            if len(chunk) == 0:  # empty chunks are suppressed
                continue
            yield chunk

    def _serial(self, source) -> Iterator:
        for chunk in self._apply_steps(self.reader.iter_chunks(source)):
            yield self.formatter(chunk) if self.formatter else chunk

    # -- worker architecture ----------------------------------------------------

    def _worker(self, source, out_q) -> None:
        try:
            for item in self._serial(source):
                out_q.put(item)
            out_q.put(_TERMINATION)
        except Exception as e:  # surface worker errors to the consumer
            out_q.put((_ERROR, f"{type(e).__name__}: {e}"))

    def iter(self, source) -> Iterator:
        """Iterate formatted chunks from ``source`` (a path/glob or list)."""
        if self.workers <= 0:
            yield from self._serial(source)
            return

        # shard the source files across workers
        import glob as glob_mod

        paths = sorted(glob_mod.glob(source)) if isinstance(source, str) else list(source)
        if not paths:
            raise FileNotFoundError(f"no files match {source!r}")
        n = min(self.workers, len(paths))
        shards = [paths[i::n] for i in range(n)]

        ctx = mp.get_context("fork")
        out_q = ctx.Queue(maxsize=self.queue_size)
        procs = [ctx.Process(target=self._worker, args=(shard, out_q), daemon=True)
                 for shard in shards]
        for p in procs:
            p.start()
        finished = 0
        try:
            while finished < len(procs):
                try:
                    item = out_q.get(timeout=self.timeout)
                except queue_mod.Empty as e:
                    raise PipelineError("pipeline worker timed out") from e
                if isinstance(item, str) and item == _TERMINATION:
                    finished += 1
                    continue
                if isinstance(item, tuple) and len(item) == 2 and item[0] == _ERROR:
                    raise PipelineError(item[1])
                yield item
        finally:
            for p in procs:
                p.terminate()
                p.join()

    __call__ = iter


class JaxPipeline(Pipeline):
    """Pipeline whose chunks land on device in the MAIN process.

    Equivalent of the reference's ``PyTorchPipeline``
    (``mldp/pytorch_pipeline.py:6``), which formats batches on the main
    process because torch tensors must not cross worker-queue boundaries.
    The same constraint holds here — device buffers can't be pickled through
    a multiprocessing queue and worker processes must never touch JAX — so
    workers ship plain numpy chunks and the main process stages each numeric
    field with ``jax.device_put`` (object/string fields pass through as
    numpy)."""

    def iter(self, source) -> Iterator:
        import jax
        import numpy as np

        for item in super().iter(source):
            if isinstance(item, DataChunk):
                fields = item.fields()
            elif isinstance(item, dict):
                fields = item
            else:  # e.g. PandasFormatter output — not device-stageable
                yield item
                continue
            yield {
                k: jax.device_put(v)
                if isinstance(v, np.ndarray) and v.dtype.kind in "biufc" else v
                for k, v in fields.items()
            }

    __call__ = iter
