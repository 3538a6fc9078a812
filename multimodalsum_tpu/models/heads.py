"""Auxiliary BART heads: sequence classification and question answering.

Equivalents of the reference's (unused on its main path, but shipped)
``BartForSequenceClassification`` (``modeling_multimodalsum.py:3128``) and
``BartForQuestionAnswering`` (``:3211``), plus the classification head MLP
(``BartClassificationHead``, ``:927-944``): pooled EOS-token state →
dense → tanh → dense.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from multimodalsum_tpu.core.config import BartConfig
from multimodalsum_tpu.models.bart import BartModel


class ClassificationHead(nn.Module):
    """dense → tanh → dense (reference ``BartClassificationHead``)."""

    inner_dim: int
    num_classes: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = jnp.tanh(nn.Dense(self.inner_dim, name="dense")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="out_proj")(x)


class BartForSequenceClassification(nn.Module):
    """Classifies from the decoder state at the final EOS position."""

    config: BartConfig
    num_classes: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        self.model = BartModel(self.config, dtype=self.dtype, name="model")
        self.classification_head = ClassificationHead(
            self.config.d_model, self.num_classes, self.config.classif_dropout,
            name="classification_head",
        )

    def __call__(self, input_ids, decoder_input_ids, attention_mask=None,
                 deterministic: bool = True):
        hiddens = self.model.encode(input_ids, attention_mask, deterministic)
        b, s, _ = hiddens.shape
        mods = [(hiddens[:, None],
                 (attention_mask.astype(bool) if attention_mask is not None
                  else jnp.ones((b, s), bool))[:, None])]
        dec = self.model.decoder(decoder_input_ids, mods,
                                 deterministic=deterministic)
        # pool the LAST EOS position of the decoder inputs (reference
        # :3176-3184). The reference raises on rows without EOS; data-dependent
        # errors are impossible under jit, so a missing EOS falls back to the
        # first position — callers must ensure EOS-terminated inputs.
        is_eos = decoder_input_ids == self.config.eos_token_id
        pos = jnp.arange(decoder_input_ids.shape[1])
        last_eos = jnp.max(jnp.where(is_eos, pos[None, :], -1), axis=1)
        pooled = jnp.take_along_axis(dec, last_eos[:, None, None].clip(0), axis=1)[:, 0]
        return self.classification_head(pooled, deterministic=deterministic)


class BartForQuestionAnswering(nn.Module):
    """Extractive QA: per-position start/end logits (reference ``:3211``)."""

    config: BartConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.model = BartModel(self.config, dtype=self.dtype, name="model")
        self.qa_outputs = nn.Dense(2, name="qa_outputs")

    def __call__(self, input_ids, decoder_input_ids, attention_mask=None,
                 deterministic: bool = True):
        hiddens = self.model.encode(input_ids, attention_mask, deterministic)
        b, s, _ = hiddens.shape
        mods = [(hiddens[:, None],
                 (attention_mask.astype(bool) if attention_mask is not None
                  else jnp.ones((b, s), bool))[:, None])]
        dec = self.model.decoder(decoder_input_ids, mods,
                                 deterministic=deterministic)
        logits = self.qa_outputs(dec)
        return logits[..., 0], logits[..., 1]  # start, end
