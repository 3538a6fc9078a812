"""Device mesh construction and sharding rules.

The reference's only parallelism is data-parallel NCCL DDP
(``src/train_utils.py:28``, apex ``delay_allreduce=True``). Here DP is
expressed as a named-mesh sharding: the batch is sharded over the ``data``
axis, parameters are replicated, and XLA lowers the gradient reduction to a
single fused all-reduce over ICI — the natural equivalent of apex's one
bucketed all-reduce per step. A ``model`` axis is provisioned for optional
tensor-parallel sharding of the FFN/attention weights (BART-large does not
need it for capacity, but it scales decode batch throughput).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Build a ``(data, model)`` mesh. ``data=-1`` uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis for every batch leaf."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with its leading axis split over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def dp_shardings(mesh: Mesh, n_args: int, n_replicated: int):
    """``in_shardings`` tuple for a data-parallel jit: the first
    ``n_replicated`` args (params/stats) replicated, the remaining batch
    args sharded on their leading axis.

    Generation/eval is embarrassingly data-parallel (no cross-batch
    collectives — the reference reaches the same effect with one process
    per GPU, ``src/train_utils.py:28``); each sharding applies as a pytree
    prefix, so a whole feature tree can sit behind one entry.
    """
    repl, bs = replicated(mesh), batch_sharding(mesh)
    assert 0 <= n_replicated <= n_args
    return tuple([repl] * n_replicated + [bs] * (n_args - n_replicated))
