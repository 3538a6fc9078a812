"""Training losses.

Reproduces the reference's loss semantics exactly:

* plain cross-entropy over **all** positions including padding — the
  reference calls ``nn.CrossEntropyLoss()(logits.view(-1, V), labels.view(-1))``
  with pad tokens left in the labels (``src/text_pretrain.py:111``), so pad
  positions contribute to the mean;
* label smoothing as in ``LabelSmoothingLoss`` (``src/utils.py:24-38``):
  smoothing mass ``eps/(V-1)`` on every non-target class, ``1-eps`` on the
  target, averaged over all positions.

Both are pure functions of ``(logits, labels)`` so they can live inside a
jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean token-level cross-entropy (pad positions included).

    Args:
      logits: ``[..., vocab]`` float array.
      labels: ``[...]`` int array.
    """
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def label_smoothing_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float
) -> jnp.ndarray:
    """Label-smoothed NLL matching reference ``LabelSmoothingLoss``.

    true_dist = eps/(V-1) everywhere, (1-eps) at the target; loss is
    ``mean over positions of sum_v(-true_dist * logprob)``.
    """
    vocab = logits.shape[-1]
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    smooth_mass = smoothing / (vocab - 1)
    # sum_v(-true_dist * logp) = -smooth_mass * sum_v(logp)
    #                            - (confidence - smooth_mass) * logp[target]
    confidence = 1.0 - smoothing
    total_logp = jnp.sum(logprobs, axis=-1)
    target_logp = jnp.take_along_axis(logprobs, labels[..., None], axis=-1)[..., 0]
    per_pos = -smooth_mass * total_logp - (confidence - smooth_mass) * target_logp
    return jnp.mean(per_pos)


def seq2seq_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_smoothing: float | None = None,
) -> jnp.ndarray:
    """Dispatch between CE and label smoothing, as the per-stage scripts do
    (``src/text_pretrain.py:94-97``)."""
    if label_smoothing is not None:
        return label_smoothing_loss(logits, labels, label_smoothing)
    return cross_entropy(logits, labels)
