"""Async host→device prefetching.

TPU-native replacement for the reference's CUDA-stream ``data_prefetcher``
classes (``src/text_pretrain.py:116-148``, ``src/multimodal_train.py:196-343``):
``jax.device_put`` is asynchronous, so keeping a small queue of already-
transferred batches overlaps H2D copies with device compute — the same
double-buffering effect without streams.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    batches: Iterable, size: int = 2, sharding: Optional[object] = None
) -> Iterator:
    """Yield batches with up to ``size`` transfers in flight."""
    queue: deque = deque()

    def put(batch):
        if sharding is not None:
            def _put(x):
                try:
                    return jax.device_put(x, sharding)
                except ValueError:
                    # uneven tail batch (axis 0 not divisible by the mesh
                    # data axis, e.g. drop_last=False validation): transfer
                    # unsharded so the caller's unsharded-eval fallback can
                    # run instead of crashing here
                    return jax.device_put(x)
            return jax.tree.map(_put, batch)
        return jax.tree.map(jax.device_put, batch)

    it = iter(batches)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
