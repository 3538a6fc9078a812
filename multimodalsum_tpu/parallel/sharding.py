"""Parameter sharding rules for tensor parallelism.

The reference needs no TP (BART-large fits per device) — SURVEY §2.5 — but
this framework provisions a ``model`` mesh axis for scaling batch/decode
throughput beyond one chip. Shardings follow the Megatron pattern expressed
declaratively: XLA's SPMD partitioner inserts the collectives.

* attention q/k/v and fc1 kernels: output (head/ffn) dim over ``model``;
* out_proj and fc2 kernels: input dim over ``model`` (the contraction's
  partial sums become one psum per block);
* embeddings, layer norms, biases of row-parallel layers: replicated;
* everything else (table/img encoders, rating embedding): replicated.

Applied with ``jax.device_put`` / jit ``in_shardings`` over the param tree.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalsum_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path-substring, spec) rules; first match wins. Paths are '/'-joined.
_RULES = [
    # column-parallel: shard the output features
    ("self_attn/q_proj/kernel", P(None, MODEL_AXIS)),
    ("self_attn/k_proj/kernel", P(None, MODEL_AXIS)),
    ("self_attn/v_proj/kernel", P(None, MODEL_AXIS)),
    ("encoder_attn/q_proj/kernel", P(None, MODEL_AXIS)),
    ("encoder_attn/k_proj/kernel", P(None, MODEL_AXIS)),
    ("encoder_attn/v_proj/kernel", P(None, MODEL_AXIS)),
    ("self_attn/q_proj/bias", P(MODEL_AXIS)),
    ("self_attn/k_proj/bias", P(MODEL_AXIS)),
    ("self_attn/v_proj/bias", P(MODEL_AXIS)),
    ("encoder_attn/q_proj/bias", P(MODEL_AXIS)),
    ("encoder_attn/k_proj/bias", P(MODEL_AXIS)),
    ("encoder_attn/v_proj/bias", P(MODEL_AXIS)),
    ("fc1/kernel", P(None, MODEL_AXIS)),
    ("fc1/bias", P(MODEL_AXIS)),
    # row-parallel: shard the input features
    ("out_proj/kernel", P(MODEL_AXIS, None)),
    ("fc2/kernel", P(MODEL_AXIS, None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def param_spec(path, leaf) -> P:
    s = _path_str(path)
    for frag, spec in _RULES:
        if frag in s:
            return spec
    return P()  # replicated


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params
    )


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh with the TP rules."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, NamedSharding(mesh, param_spec(path, leaf))),
        params,
    )


# ---------------------------------------------------------------------------
# FSDP / ZeRO-style state sharding over the data axis
# ---------------------------------------------------------------------------

def fsdp_spec(shape, data_size: int, min_size: int = 2 ** 15) -> P:
    """PartitionSpec sharding a leaf's LARGEST divisible axis over ``data``.

    The reference has no sharded-optimizer analog (SURVEY §2.5 lists
    ZeRO/FSDP as "optional later"); this is the TPU-native version: annotate
    the parameter/optimizer pytrees with these specs and XLA's SPMD
    partitioner inserts the per-step all-gather (params, forward/backward)
    and reduce-scatter (gradient -> sharded update) — per-device
    params+optimizer memory drops ~``data_size``x, at the cost of one
    all-gather of the parameters per step over ICI.

    Leaves smaller than ``min_size`` elements (biases, norms, scalars — and
    anything with no axis divisible by ``data_size``) stay replicated: the
    collective latency would exceed the memory saved.
    """
    size = 1
    for d in shape:
        size *= d
    if size < min_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % data_size == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)


def fsdp_shardings(tree, mesh: Mesh, min_size: int = 2 ** 15):
    """NamedSharding pytree for ANY state pytree (params, AdamW mu/nu, step
    counters): per-leaf by shape, so it applies uniformly to a full
    TrainState — scalars and small leaves come out replicated."""
    data_size = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, fsdp_spec(getattr(leaf, "shape", ()), data_size, min_size)),
        tree,
    )
