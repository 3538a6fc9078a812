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

from multimodalsum_tpu.parallel.mesh import MODEL_AXIS

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
