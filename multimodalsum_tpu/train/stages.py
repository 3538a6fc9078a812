"""Loss / step functions for the four training stages.

Pure functions of ``(params, batch, rng)`` suitable for ``jax.value_and_grad``
+ ``jax.jit`` with sharding annotations. Semantics mirror the reference
training scripts:

* **Stage 0** (BART denoising, ``src/bart-review.py``): seq2seq CE with
  explicit ``decoder_input_ids`` and EOS-spliced padded labels.
* **Stage 1** (text, ``src/text_pretrain.py:66-113``): encode all 9 reviews
  once, then a leave-one-out loop — decode review ``i`` from the other 8 with
  ``rating_diff = rating_i - mean(others)`` — averaged over the 9 rotations.
  The reference's Python loop (9 sequential decoder graphs) becomes a
  ``lax.scan`` with a static gather matrix: one decoder graph, 9 iterations,
  encoder states reused.
* **Stage 2a/2b** (img/table, ``src/img_pretrain.py:85-141``,
  ``src/table_pretrain.py:84-129``): non-text encoder output decoded by the
  (frozen) text decoder, ``rating_diff = 0``.
* **Stage 3** (multimodal, ``src/multimodal_train.py:124-163``): leave-one-out
  over text entities with fixed table/img hiddens.

Losses include pad positions, exactly like the reference (see
``ops/losses.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from multimodalsum_tpu.core.config import BartConfig
from multimodalsum_tpu.models.bart import BartModel
from multimodalsum_tpu.ops.losses import seq2seq_loss
from multimodalsum_tpu.ops.masks import padding_mask, shift_tokens_right


def _decoder_loss(
    model: BartModel,
    params,
    modalities,
    labels: jnp.ndarray,
    rating_diff: Optional[jnp.ndarray],
    label_smoothing: Optional[float],
    rng,
) -> jnp.ndarray:
    cfg: BartConfig = model.config
    dec_in = shift_tokens_right(labels, cfg.pad_token_id, cfg.bos_token_id, cfg.eos_token_id)
    logits = model.apply(
        {"params": params},
        dec_in,
        modalities,
        rating_diff,
        padding_mask(dec_in, cfg.pad_token_id),
        deterministic=rng is None,
        method=BartModel.decode_train,
        rngs=None if rng is None else {"dropout": rng},
    )
    return seq2seq_loss(logits, labels, label_smoothing)


def encode_reviews(model: BartModel, params, reviews, reviews_mask, rng=None):
    """Encode ``[b, e, s]`` review tokens to ``[b, e, s, d]`` hiddens
    (flattened through the encoder once — reference ``:86-91``)."""
    b, e, s = reviews.shape
    hiddens = model.apply(
        {"params": params},
        reviews.reshape(b * e, s),
        reviews_mask.reshape(b * e, s),
        deterministic=rng is None,
        method=BartModel.encode,
        rngs=None if rng is None else {"dropout": rng},
    )
    return hiddens.reshape(b, e, s, -1)


def leave_one_out_loss(
    model: BartModel,
    params,
    reviews: jnp.ndarray,        # [b, e, s] int
    reviews_mask: jnp.ndarray,   # [b, e, s] bool/int
    reviews_rating: jnp.ndarray, # [b, e] float
    *,
    extra_modalities: Sequence = (),
    label_smoothing: Optional[float] = None,
    rng=None,
    remat=True,
) -> jnp.ndarray:
    """Stages 1 and 3: mean loss over the e leave-one-out rotations.

    ``remat`` selects the rematerialisation mode for each rotation:
    ``True`` = full remat (recompute the whole rotation forward in the
    backward pass — lowest memory, ~1 extra forward of FLOPs), ``False`` =
    no remat (all e rotation activations live at once), or the name of a
    :mod:`jax.checkpoint_policies` policy (e.g. ``"dots_saveable"`` /
    ``"dots_with_no_batch_dims_saveable"``) to keep matmul outputs and
    recompute only the cheap elementwise work — a FLOPs/memory middle
    ground worth A/B-ing per chip generation (value-neutral either way,
    ``tests/test_train.py``)."""
    reviews = jnp.asarray(reviews)
    reviews_rating = jnp.asarray(reviews_rating)
    b, e, s = reviews.shape
    text_hiddens = encode_reviews(model, params, reviews, reviews_mask, rng)
    reviews_mask = jnp.asarray(reviews_mask).astype(bool)

    # gather matrix: row i = all entity indices except i (reference :99-102)
    base = jnp.arange(e - 1)[None, :]
    idx = base + (base >= jnp.arange(e)[:, None])  # [e, e-1]

    def one_rotation(i, step_rng):
        enc_idx = idx[i]
        h = jnp.take(text_hiddens, enc_idx, axis=1)
        m = jnp.take(reviews_mask, enc_idx, axis=1)
        src_rating = jnp.mean(jnp.take(reviews_rating, enc_idx, axis=1), axis=1)
        rating_diff = (reviews_rating[:, i] - src_rating)[:, None]
        labels = reviews[:, i]
        modalities = [(h, m), *extra_modalities]
        return _decoder_loss(model, params, modalities, labels, rating_diff,
                             label_smoothing, step_rng)

    if isinstance(remat, str):
        policy = getattr(jax.checkpoint_policies, remat, None)
        if policy is None:
            raise ValueError(
                f"unknown remat policy {remat!r}; expected a "
                f"jax.checkpoint_policies name such as 'dots_saveable' or "
                f"'dots_with_no_batch_dims_saveable'")
        one_rotation = jax.checkpoint(one_rotation, policy=policy)
    elif remat:
        one_rotation = jax.checkpoint(one_rotation, static_argnums=())

    def body(total, i):
        step_rng = None if rng is None else jax.random.fold_in(rng, 1000 + i)
        return total + one_rotation(i, step_rng), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(e))
    return total / e


def text_pretrain_loss(model, params, batch, *, label_smoothing=None, rng=None):
    """Stage 1 (``src/text_pretrain.py``). batch: reviews, reviews_mask,
    reviews_rating."""
    return leave_one_out_loss(
        model, params,
        batch["reviews"], batch["reviews_mask"], batch["reviews_rating"],
        label_smoothing=label_smoothing, rng=rng,
    )


def enc_conditional_loss(
    model, params, hiddens, mask, labels, *, label_smoothing=None, rng=None
):
    """Stages 2a/2b core: decode ``labels`` from precomputed entity hiddens
    with rating_diff = 0 (``src/img_pretrain.py:117``)."""
    rating_diff = jnp.zeros((labels.shape[0], 1), jnp.float32)
    return _decoder_loss(
        model, params, [(hiddens, mask.astype(bool))], labels, rating_diff,
        label_smoothing, rng,
    )


def multimodal_loss(
    model, params, batch, *, label_smoothing=None, rng=None,
    table_hiddens=None, table_mask=None, img_hiddens=None, img_mask=None,
):
    """Stage 3 (``src/multimodal_train.py:124-163``): leave-one-out over text
    with fixed table/img modalities (encoded once per step, outside the
    rotation loop — reference ``:165-193``)."""
    extra = [
        (table_hiddens, table_mask.astype(bool)),
        (img_hiddens, img_mask.astype(bool)),
    ]
    return leave_one_out_loss(
        model, params,
        batch["reviews"], batch["reviews_mask"], batch["reviews_rating"],
        extra_modalities=extra, label_smoothing=label_smoothing, rng=rng,
    )


def multimodal_train_loss(mm_model, params, batch_stats, batch, *,
                          label_smoothing=None, rng=None, remat=True):
    """Stage 3 full loss through the composed MultimodalSum model.

    Encodes table + images (BatchNorm in training mode, updating
    ``batch_stats``) and text once, then the leave-one-out rotation
    (reference ``src/multimodal_train.py:124-163``).

    Returns ``(loss, new_batch_stats)``.
    """
    from multimodalsum_tpu.models.multimodal import MultimodalSum

    variables = {"params": params, "batch_stats": batch_stats}
    table_h, table_m = mm_model.apply(
        variables, batch["field"], batch["field_values"],
        method=MultimodalSum.encode_table,
    )
    (img_h, img_m), mutated = mm_model.apply(
        variables, batch["img"], batch["img_mask"], train=rng is not None,
        method=MultimodalSum.encode_img, mutable=["batch_stats"],
    )

    from multimodalsum_tpu.models.bart import BartModel

    bart = BartModel(mm_model.config, multimodal=True, dtype=mm_model.dtype)
    loss = leave_one_out_loss(
        bart, params["bart"],
        batch["reviews"], batch["reviews_mask"], batch["reviews_rating"],
        extra_modalities=[(table_h, table_m), (img_h, img_m)],
        label_smoothing=label_smoothing, rng=rng, remat=remat,
    )
    return loss, mutated["batch_stats"]


def img_pretrain_loss(mm_model, params, batch_stats, batch, *,
                      label_smoothing=None, rng=None):
    """Stage 2a (``src/img_pretrain.py:85-141``): images -> frozen decoder.

    Returns ``(loss, new_batch_stats)``.
    """
    from multimodalsum_tpu.models.multimodal import MultimodalSum

    variables = {"params": params, "batch_stats": batch_stats}
    (img_h, img_m), mutated = mm_model.apply(
        variables, batch["img"], batch["img_mask"], train=rng is not None,
        method=MultimodalSum.encode_img, mutable=["batch_stats"],
    )
    from multimodalsum_tpu.models.bart import BartModel

    # stage 2 decodes through the single-modality decoder (the reference uses
    # BartForEncConditionalGeneration here, not the multimodal class); the
    # multimodal gate params in params["bart"] are simply unused
    bart = BartModel(mm_model.config, multimodal=False, dtype=mm_model.dtype)
    loss = enc_conditional_loss(
        bart, params["bart"], img_h, img_m, batch["labels"],
        label_smoothing=label_smoothing, rng=rng,
    )
    return loss, mutated["batch_stats"]


def table_pretrain_loss(mm_model, params, batch, *, label_smoothing=None, rng=None):
    """Stage 2b (``src/table_pretrain.py:84-129``): table -> frozen decoder."""
    from multimodalsum_tpu.models.multimodal import MultimodalSum

    table_h, table_m = mm_model.apply(
        {"params": params}, batch["field"], batch["field_values"],
        method=MultimodalSum.encode_table,
    )
    from multimodalsum_tpu.models.bart import BartModel

    bart = BartModel(mm_model.config, multimodal=False, dtype=mm_model.dtype)
    return enc_conditional_loss(
        bart, params["bart"], table_h, table_m, batch["labels"],
        label_smoothing=label_smoothing, rng=rng,
    )


def denoising_loss(model, params, batch, *, rng=None):
    """Stage 0 (``src/bart-review.py``): inputs are noised reviews, labels the
    clean reviews with EOS spliced at the first pad; decoder inputs provided
    by the collator (``create_decoder_input_ids``)."""
    cfg: BartConfig = model.config
    input_ids = batch["input_ids"]
    hiddens = model.apply(
        {"params": params}, input_ids, padding_mask(input_ids, cfg.pad_token_id),
        deterministic=rng is None, method=BartModel.encode,
        rngs=None if rng is None else {"dropout": jax.random.fold_in(rng, 1)},
    )
    # stage 0 runs the stock model with attention_mask=None at the decoder
    # cross-attention (the Trainer feeds no mask — reference bart-review.py),
    # so all encoder positions are attendable.
    b, s, _ = hiddens.shape
    modalities = [(hiddens[:, None], jnp.ones((b, 1, s), bool))]
    dec_in = batch["decoder_input_ids"]
    logits = model.apply(
        {"params": params}, dec_in, modalities, None,
        padding_mask(dec_in, cfg.pad_token_id),
        deterministic=rng is None, method=BartModel.decode_train,
        rngs=None if rng is None else {"dropout": jax.random.fold_in(rng, 2)},
    )
    return seq2seq_loss(logits, batch["labels"], None)
