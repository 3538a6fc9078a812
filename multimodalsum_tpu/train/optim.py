"""Optimizers and schedules for the four training stages.

Reproduces the reference training configuration with optax:

* AdamW with two weight-decay groups selected by parameter name — the
  reference builds param groups with substring matching against per-stage
  ``no_decay`` lists (``src/train_utils.py:49-57``); defaults lr per stage,
  betas (0.9, 0.999), eps 1e-6 (the installed ``transformers.AdamW``), decay
  0.01 on the decayed group;
* linear warmup then linear decay to zero
  (``get_linear_schedule_with_warmup``, ``src/train_utils.py:59-63``);
* optional global-norm gradient clipping over the *trainable* parameters
  (``src/text_pretrain.py:163-165``; the img stage clips only the image
  encoder, ``src/img_pretrain.py:189-194`` — which is exactly its trainable
  set);
* per-stage freezing: img/table stages optimize only their encoder
  (``src/img_pretrain.py:284``, ``src/table_pretrain.py:359``), via
  ``optax.multi_transform`` with zero-updates for frozen leaves.

``final_logits_bias`` is a torch *buffer* in the reference (never trained) —
it is always frozen here.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax

# Per-stage no-decay name fragments (reference entry scripts). A parameter
# path (tuple of pytree keys, e.g. ("decoder", "layers_0",
# "self_attn_layer_norm", "scale")) is no-decay when it matches.
NO_DECAY_TEXT = ("bias", "layer_norm/scale", "layernorm_embedding/scale")
NO_DECAY_MULTIMODAL = NO_DECAY_TEXT + ("bn1/scale", "bn2/scale", "bn3/scale")
NO_DECAY_IMG = ("bias", "bn1/scale", "bn2/scale", "bn3/scale")
NO_DECAY_TABLE = ("bias",)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def decay_mask(params, no_decay: tuple[str, ...]):
    """True = apply weight decay. Mirrors the reference's substring test
    (``any(nd in name for nd in no_decay)``) on '/'-joined paths; flax
    LayerNorm weights are called ``scale``, mapping torch's
    ``layer_norm.weight`` to ``layer_norm/scale``."""

    def is_decay(path, _):
        s = _path_str(path)
        return not any(nd in s for nd in no_decay)

    return jax.tree_util.tree_map_with_path(is_decay, params)


def trainable_mask(params, predicate: Optional[Callable[[str], bool]]):
    """True = parameter is trained. ``predicate`` takes the '/'-joined path.
    ``final_logits_bias`` is always frozen (a buffer in the reference)."""

    def is_trainable(path, _):
        s = _path_str(path)
        if "final_logits_bias" in s:
            return False
        return predicate(s) if predicate is not None else True

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def linear_warmup_linear_decay(lr: float, warmup_steps: int, total_steps: int):
    """Reference ``get_linear_schedule_with_warmup`` semantics: factor
    ``step/warmup`` during warmup (0 at step 0, like HF), then linear decay
    ``(total-step)/(total-warmup)`` to zero; full lr at step 0 when warmup=0."""
    if warmup_steps <= 0:
        return optax.linear_schedule(lr, 0.0, max(total_steps, 1))
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


def kl_cyclical_annealing(total_steps: int, cycles: int = 4, ratio: float = 0.5):
    """Cyclical KL-weight annealing factory (reference mlmo
    ``KlCycAnnealing``). Thin 0-based-step adapter over the single
    reference-exact implementation in ``toolkit.seq.kl_cyc_annealing``."""

    def schedule(step):
        from multimodalsum_tpu.toolkit.seq import kl_cyc_annealing

        return kl_cyc_annealing(step + 1, total_steps, cycles, ratio)

    return schedule


def kl_monotonic_annealing(warmup_steps: int):
    """Monotonic KL annealing factory (reference mlmo ``KlMonAnnealing``):
    linear 0→1 over ``warmup_steps`` then constant. Delegates to
    ``toolkit.seq.kl_mon_annealing``."""

    def schedule(step):
        from multimodalsum_tpu.toolkit.seq import kl_mon_annealing

        return kl_mon_annealing(step, warmup_steps)

    return schedule


def scale_by_adam_dtyped(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-6, moment_dtype=None):
    """``optax.scale_by_adam`` with BOTH moments stored in ``moment_dtype``
    (e.g. bf16) while every EMA/bias-correction/update computes in f32.

    Memory lever (VERDICT r4 #5): f32 AdamW m+v for 406M params is ~3.2 GB —
    on a 16 GB chip that is the difference between the cheap remat policies
    compiling and RESOURCE_EXHAUSTED. bf16 halves it. Numerics: the mu EMA
    adds (1-b1)=0.1 of the gradient per step, ~25x above bf16's ~0.4%
    relative resolution — representable. The nu EMA adds only (1-b2)=0.001
    of g² per step, BELOW bf16 resolution once nu is in steady state, so
    bf16 nu is sticky-stale by construction; its role is a slow per-param
    magnitude estimate under a sqrt (halving the relative error again), and
    the measured loss trajectory stays within noise of f32 moments
    (``tests/test_optim_moments.py``). ``moment_dtype=None`` returns stock
    ``optax.scale_by_adam`` (exact behavioral no-op)."""
    if moment_dtype is None:
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps)
    import jax.numpy as jnp

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=moment_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params), nu=jax.tree.map(zeros, params))

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        c = count.astype(jnp.float32)
        bc1, bc2 = 1.0 - b1 ** c, 1.0 - b2 ** c
        mu32 = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32)
            + (1 - b1) * g.astype(jnp.float32), updates, state.mu)
        nu32 = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1 - b2) * jnp.square(g.astype(jnp.float32)), updates, state.nu)
        out = jax.tree.map(
            lambda m, v, g: ((m / bc1) / (jnp.sqrt(v / bc2) + eps)).astype(g.dtype),
            mu32, nu32, updates)
        cast = lambda t: jax.tree.map(lambda x: x.astype(moment_dtype), t)
        return out, optax.ScaleByAdamState(count=count, mu=cast(mu32),
                                           nu=cast(nu32))

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    params,
    *,
    learning_rate: float,
    total_steps: int,
    warmup_ratio: float = 0.1,
    weight_decay: float = 0.01,
    no_decay: tuple[str, ...] = NO_DECAY_TEXT,
    max_grad_norm: float | None = None,
    trainable: Optional[Callable[[str], bool]] = None,
    adam_eps: float = 1e-6,
    moment_dtype=None,
) -> optax.GradientTransformation:
    """Build the stage optimizer. Returns an ``optax.GradientTransformation``
    to be used with gradients of the *full* param tree; frozen leaves get
    zero updates and carry no Adam state. ``moment_dtype`` stores the Adam
    moments in a narrower dtype (``scale_by_adam_dtyped``); None keeps the
    stock f32 ``optax.adamw`` path."""
    warmup_steps = int(total_steps * warmup_ratio)
    schedule = linear_warmup_linear_decay(learning_rate, warmup_steps, total_steps)

    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if moment_dtype is None:
        chain.append(
            optax.adamw(
                schedule,
                b1=0.9,
                b2=0.999,
                eps=adam_eps,
                weight_decay=weight_decay,
                mask=lambda p: decay_mask(p, no_decay),
            )
        )
    else:
        # the exact optax.adamw composition with the dtyped Adam core
        chain += [
            scale_by_adam_dtyped(b1=0.9, b2=0.999, eps=adam_eps,
                                 moment_dtype=moment_dtype),
            optax.add_decayed_weights(weight_decay,
                                      mask=lambda p: decay_mask(p, no_decay)),
            optax.scale_by_learning_rate(schedule),
        ]
    inner = optax.chain(*chain)

    t_mask = trainable_mask(params, trainable)
    labels = jax.tree.map(lambda t: "train" if t else "freeze", t_mask)
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, param_labels=labels
    )
