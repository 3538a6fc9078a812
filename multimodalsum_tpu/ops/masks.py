"""Pure mask/shift primitives shared by the model, losses, and decoder.

These reproduce the exact semantics of the reference helpers
(``src/transformer/modeling_multimodalsum.py:160-257``) as jit-friendly pure
functions on fixed-shape arrays. All masks here use the convention
``True / 1 = valid (attend)`` — inversion to "True = pad" happens only inside
the attention ops, unlike the reference which flips conventions at layer
boundaries (``invert_mask``, reference ``modeling_multimodalsum.py:153``).
"""

from __future__ import annotations

import jax.numpy as jnp

#: Fill value for *entity* (cross) attention padding. The reference uses
#: -2**16 instead of -inf so that fully-null entities produce a finite
#: (uniform) softmax instead of NaN; the garbage output is then zeroed by the
#: entity parallel-mean. Reference ``modeling_multimodalsum.py:844``.
ENTITY_MASK_VALUE = -2.0**16

#: Fill value for token-level (self) attention padding — NOT a logits ban.
#: Reference ``modeling_multimodalsum.py:837`` uses float("-inf"); we use a
#: large finite negative instead so XLA never materialises NaNs for rows that
#: are fully masked (softmax of all-equal finite values is uniform, and those
#: rows are pad positions whose outputs are discarded). The decode logits
#: bans (``decode/logits.py``) use true -inf — a different constant on
#: purpose; do not interchange them.
TOKEN_MASK_VALUE = -1.0e9


def shift_tokens_right(
    input_ids: jnp.ndarray,
    pad_token_id: int,
    bos_token_id: int,
    eos_token_id: int,
) -> jnp.ndarray:
    """Build decoder inputs from labels, covering all four BOS/EOS layouts.

    Port of the modified ``shift_tokens_right`` (reference
    ``modeling_multimodalsum.py:225-246``)::

        1) a b c d e      -> <s> a b c d
        2) a b c d </s>   -> <s> a b c d
        3) <s> a b c d    -> </s> <s> a b c
        4) <s> a b c </s> -> </s> <s> a b c

    Mechanics (matching the reference exactly): the token at the *last
    non-pad index* is replaced by ``pad``, the sequence is shifted right by
    one, and position 0 is set to ``bos`` — unless the batch already starts
    with ``bos`` (checked on element [0, 0], as in the reference), in which
    case position 0 becomes ``eos``.

    Args:
      input_ids: int array ``[batch, seq]``.

    Returns:
      int array ``[batch, seq]`` of decoder input ids.
    """
    input_ids = jnp.asarray(input_ids)
    seq_len = input_ids.shape[-1]
    # Index of the last non-pad token per row.
    index_of_eos = jnp.sum(input_ids != pad_token_id, axis=-1) - 1  # [batch]
    positions = jnp.arange(seq_len)[None, :]
    # Replace the token at the last-non-pad index with pad, then shift right.
    cleared = jnp.where(positions == index_of_eos[:, None], pad_token_id, input_ids)
    shifted = jnp.roll(cleared, 1, axis=-1)
    # The reference checks only input_ids[0, 0] for the whole batch.
    first = jnp.where(input_ids[0, 0] == bos_token_id, eos_token_id, bos_token_id)
    return shifted.at[:, 0].set(first)


def make_causal_mask(tgt_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask ``[tgt, tgt]``: 0 on/below diagonal, TOKEN_MASK_VALUE above.

    Mirrors the ``triu(fill_with_neg_inf(...), 1)`` construction of the
    reference ``_prepare_bart_decoder_inputs`` (``modeling_multimodalsum.py:178``).
    """
    i = jnp.arange(tgt_len)[:, None]
    j = jnp.arange(tgt_len)[None, :]
    return jnp.where(j > i, jnp.asarray(TOKEN_MASK_VALUE, dtype), jnp.asarray(0.0, dtype))


def padding_mask(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """Boolean validity mask: True where the token is NOT padding.

    (The reference's ``make_padding_mask`` returns True-for-pad and ``None``
    when padless — here the convention is uniformly True-for-valid and the
    mask is always materialised; masking a padless batch is a no-op.)
    """
    return input_ids != pad_token_id


def entity_validity(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-entity validity from a token mask ``[..., entities, seq]``.

    An entity is *null* iff all its token positions are masked out —
    the reference computes this as ``key_padding_mask.min(dim=-1)`` on the
    inverted mask (``modeling_multimodalsum.py:858``). With the True=valid
    convention the equivalent is ``any`` over the sequence axis.

    Returns a boolean array ``[..., entities]``, True for valid entities.
    """
    return jnp.any(mask, axis=-1)
