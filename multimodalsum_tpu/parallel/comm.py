"""Collective-communication wrappers.

TPU-native replacement for the reference's NCCL surface
(``torch.distributed`` ``all_reduce`` loss averaging ``src/utils.py:8-12``,
``distributed_concat`` all-gather ``trainer.py:997-1007``, env-var rendezvous
``src/train_utils.py:28``): thin helpers over ``jax.lax`` collectives on a
named mesh — ICI within a slice, DCN across slices — plus
``jax.distributed.initialize`` for multi-host rendezvous.

Most code never needs these: with ``jit`` + shardings, XLA inserts gradient
all-reduces automatically (see ``train/loop.py``). They exist for explicit
``shard_map`` regions and for metric aggregation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multimodalsum_tpu.parallel.mesh import DATA_AXIS


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces torch.distributed.launch env vars)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def host_shard() -> tuple:
    """``(shard_index, shard_count)`` for per-host data sharding — the
    DistributedSampler replacement (reference ``src/train_utils.py:38-43``).
    Each host of a multi-host run feeds only its slice of the group list
    (see ``data/text.py:shard_order`` for the equal-size wrap-around pad);
    identity ``(0, 1)`` on a single host."""
    return jax.process_index(), jax.process_count()


def pmean(x, axis: str = DATA_AXIS):
    """Mean over a mesh axis (inside shard_map) — reference ``reduce_tensor``."""
    return jax.lax.pmean(x, axis)


def psum(x, axis: str = DATA_AXIS):
    return jax.lax.psum(x, axis)


def all_gather(x, axis: str = DATA_AXIS, *, tiled: bool = True):
    """Concatenate per-shard values along the leading dim — reference
    ``distributed_concat``."""
    return jax.lax.all_gather(x, axis, tiled=tiled)


# NOTE: there is deliberately NO standalone "mean_grads(grads)" helper. A
# global JAX array has one logical value, so a post-hoc shard_map pmean over
# replicated inputs is an identity — per-shard gradients only exist INSIDE
# the jitted train step, where the batch is sharded and XLA's SPMD lowering
# of the loss mean already inserts the single fused all-reduce per step
# (the apex ``delay_allreduce`` analog; see train/loop.py jit shardings).
# Use jax.lax.pmean within shard_map/pjit bodies for custom reductions.
