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


def _axis0_divisor(sharding) -> Optional[int]:
    """Number of shards the sharding splits axis 0 into, or None if that
    cannot be determined statically (not a NamedSharding)."""
    mesh = getattr(sharding, "mesh", None)
    spec = getattr(sharding, "spec", None)
    if mesh is None or spec is None:
        return None
    if not len(spec) or spec[0] is None:
        return 1
    names = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
    d = 1
    for name in names:
        d *= dict(mesh.shape)[name]
    return d


def prefetch_to_device(
    batches: Iterable, size: int = 2, sharding: Optional[object] = None
) -> Iterator:
    """Yield batches with up to ``size`` transfers in flight."""
    queue: deque = deque()
    divisor = _axis0_divisor(sharding) if sharding is not None else None

    multiproc = jax.process_count() > 1

    def put(batch):
        if sharding is not None:
            def _put(x):
                if multiproc:
                    # multi-controller world: each host holds only ITS rows;
                    # assemble the global array from the per-process shards
                    # (the sharding spans every process's devices —
                    # cli.common.mesh_for_batch builds it that way). The
                    # single-host unsharded-tail fallback cannot work here
                    # (no host can address the global array), so uneven
                    # tails are a caller error: multihost val loaders drop
                    # the tail (reference DistributedSampler pads instead)
                    per_host_axis = (divisor or 1) // jax.process_count()
                    if (getattr(x, "ndim", 0) >= 1 and per_host_axis
                            and x.shape[0] % per_host_axis != 0):
                        raise ValueError(
                            f"multihost batch leading dim {x.shape[0]} does "
                            f"not divide the per-host data axis "
                            f"{per_host_axis}; use drop_last=True (see "
                            f"cli.common.host_data_shard)")
                    return jax.make_array_from_process_local_data(sharding, x)
                # Uneven tail batch (axis 0 not divisible by the mesh data
                # axis, e.g. drop_last=False validation): leave it on HOST —
                # the caller's unsharded-eval fallback re-reads it host-side
                # anyway, so an eager device_put here would just buy a wasted
                # D2H+H2D round trip. Checked explicitly — any other
                # ValueError from device_put (dtype / sharding-spec bugs)
                # must surface, not silently replicate.
                if (divisor is not None and getattr(x, "ndim", 0) >= 1
                        and x.shape[0] % divisor != 0):
                    return x
                return jax.device_put(x, sharding)
            return jax.tree.map(_put, batch)
        return jax.tree.map(jax.device_put, batch)

    it = iter(batches)
    try:
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
    finally:
        # propagate early abandonment (generator .close()/GC) to the source
        # so a host_prefetch producer thread underneath gets released
        close = getattr(it, "close", None)
        if close is not None:
            close()


def host_prefetch(batches: Iterable, depth: int = 2) -> Iterator:
    """Build host batches in a background thread, ``depth`` ahead of the
    consumer.

    The reference overlaps per-example host work (image decode/resize,
    tokenization, table featurisation) with GPU compute via
    ``DataLoader(num_workers=4)`` worker processes
    (``src/train_utils.py:45``). Here a single producer thread suffices:
    the heavy parts are numpy/PIL calls that release the GIL, and one
    batch of lead time is all the overlap a ~1 s train step needs. Compose
    with :func:`prefetch_to_device` (host build → H2D transfer → compute,
    each one stage ahead):

        prefetch_to_device(host_prefetch(batches), sharding=...)

    Exceptions in the producer re-raise at the consumer. The producer is a
    daemon thread holding at most ``depth`` finished batches; abandoning
    the iterator early (generator ``.close()`` or GC — e.g.
    ``train_model``'s ``max_steps_per_epoch`` break) sets a stop flag that
    releases the thread instead of leaving it parked on a full queue.
    """
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(1, depth))
    sentinel = object()
    failure: list = []
    stop = threading.Event()

    def produce():
        try:
            for b in batches:
                # bounded put so an abandoned consumer (generator .close()
                # or GC — e.g. train_model's max_steps_per_epoch break)
                # releases this thread instead of parking it on a full
                # queue until process exit
                while not stop.is_set():
                    try:
                        q.put(b, timeout=0.2)
                        break
                    except queue_mod.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            failure.append(e)
        finally:
            # same bounded loop: dropping the sentinel on a transiently full
            # queue would leave a live consumer blocked on q.get() forever
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.2)
                    break
                except queue_mod.Full:
                    continue

    thread = threading.Thread(target=produce, daemon=True,
                              name="host_prefetch")
    thread.start()
    try:
        while True:
            b = q.get()
            if b is sentinel:
                if failure:
                    raise failure[0]
                return
            yield b
    finally:
        stop.set()
