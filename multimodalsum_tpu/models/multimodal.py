"""Flagship composition model: MultimodalSum.

Equivalent of reference ``MultimodalSum`` (``src/multimodal_train.py:111-193``)
and the stage-2 wrappers ``ImgSupervised`` / ``TableSupervised``: a
multimodal BART (text entities + table + images) whose non-text values are
embedded through the frozen shared embedding and whose image trunk is a
truncated ResNet.

All three encoders run once per step, outside the leave-one-out rotation
(reference ``:165-193``); generation consumes their outputs through
``decode/engine.py``.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from multimodalsum_tpu.core.config import BartConfig
from multimodalsum_tpu.models.bart import BartModel
from multimodalsum_tpu.models.resnet import ResnetEncoder
from multimodalsum_tpu.models.table import AmazonTableEncoder, YelpTableEncoder


class MultimodalSum(nn.Module):
    """BART(multimodal) + table encoder + ResNet image encoder."""

    config: BartConfig
    dataset: str = "yelp"  # selects the table schema (yelp | amazon)
    img_model: str = "resnet101"
    img_stage: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        self.bart = BartModel(self.config, multimodal=True, dtype=self.dtype, name="bart")
        table_cls = YelpTableEncoder if self.dataset == "yelp" else AmazonTableEncoder
        self.table_encoder = table_cls(
            d_model=self.config.d_model, dtype=self.dtype, name="table_encoder"
        )
        self.img_encoder = ResnetEncoder(
            embed_dim=self.config.d_model, model=self.img_model, stage=self.img_stage,
            dtype=self.dtype, name="img_encoder",
        )

    # ---- encoders -------------------------------------------------------

    def encode_text(self, reviews, reviews_mask, deterministic: bool = True):
        """[b, e, s] -> hiddens [b, e, s, d] (one encoder pass, flattened)."""
        b, e, s = reviews.shape
        h = self.bart.encode(
            reviews.reshape(b * e, s), reviews_mask.reshape(b * e, s),
            deterministic=deterministic,
        )
        return h.reshape(b, e, s, -1)

    def encode_table(self, field, field_values: Mapping[str, jnp.ndarray]):
        """-> (hiddens [b, 1, rows, d], mask [b, 1, rows]); entity axis of 1
        (reference ``:183-185`` unsqueeze)."""
        embed_table = self.bart.shared.embedding
        h, m = self.table_encoder(field, field_values, embed_table)
        return h[:, None], m[:, None]

    def encode_img(self, img, img_mask, train: bool = False):
        """img [b, max_imgs, H, W, 3] NHWC -> (hiddens [b, max_imgs, pix, d],
        mask [b, max_imgs, pix]) (reference ``:188-192``). uint8 input is
        normalised on device (4x less H2D traffic — and the remote-device
        tunnel leaks host RAM per byte transferred, see ops/images.py)."""
        if img.dtype == jnp.uint8:
            from multimodalsum_tpu.ops.images import normalize_uint8_images

            img = normalize_uint8_images(img, img_mask)
        b, n = img.shape[:2]
        h = self.img_encoder(img.reshape((b * n,) + img.shape[2:]), train=train)
        h = h.reshape(b, n, h.shape[1], h.shape[2])
        pix = h.shape[2]
        m = jnp.broadcast_to(img_mask.astype(bool)[:, :, None], (b, n, pix))
        return h, m

    def get_multimodal_outputs(
        self, reviews, reviews_mask, field, field_values, img, img_mask,
        deterministic: bool = True, train_img: bool = False,
    ):
        """Reference ``get_multimodal_outputs`` (``src/multimodal_train.py:165-193``)."""
        text_h = self.encode_text(reviews, reviews_mask, deterministic)
        table_h, table_m = self.encode_table(field, field_values)
        img_h, img_m = self.encode_img(img, img_mask, train=train_img)
        return text_h, reviews_mask.astype(bool), table_h, table_m, img_h, img_m

    # ---- decoding -------------------------------------------------------

    def decode_train(self, decoder_input_ids, modalities, rating_diff,
                     dec_key_valid=None, deterministic: bool = True):
        return self.bart.decode_train(
            decoder_input_ids, modalities, rating_diff, dec_key_valid, deterministic
        )

    def init_decode(self, modality_hiddens):
        return self.bart.init_decode(modality_hiddens)

    def decode_step(self, token_ids, index, cache, cross_kv, modality_masks, rating_diff=None):
        return self.bart.decode_step(
            token_ids, index, cache, cross_kv, modality_masks, rating_diff
        )

    def init_all(self, field, field_values):
        """Touch every parameter (init helper). ``field``/``field_values``
        carry the dataset-specific table shapes."""
        ids = jnp.zeros((1, 1, 2), jnp.int32)
        mask = jnp.ones((1, 1, 2), jnp.int32)
        img = jnp.zeros((1, 1, 64, 64, 3), self.dtype)
        img_mask = jnp.ones((1, 1), bool)
        t_h, t_m, tb_h, tb_m, im_h, im_m = self.get_multimodal_outputs(
            ids, mask, field, field_values, img, img_mask
        )
        mods = [(t_h, t_m), (tb_h, tb_m), (im_h, im_m)]
        return self.decode_train(ids[:, 0], mods, jnp.zeros((1, 1), jnp.float32))


def yelp_dummy_table(bsz: int = 1) -> Tuple[jnp.ndarray, dict]:
    """Minimal valid Yelp table inputs (shapes from src/data_utils.py:67-88)."""
    field = jnp.ones((47, 6), jnp.int32)
    values = dict(
        name=jnp.ones((bsz, 24), jnp.int32),
        category=jnp.ones((bsz, 6, 12), jnp.int32),
        str_categorical=jnp.ones((bsz, 5, 3), jnp.int32),
        str_boolean=jnp.ones((bsz, 32, 1), jnp.int32),
        rating=jnp.zeros((bsz, 4), jnp.int32),
        hours=jnp.zeros((bsz, 7, 4), jnp.int32),
    )
    return field, values


def amazon_dummy_table(bsz: int = 1) -> Tuple[jnp.ndarray, dict]:
    """Minimal valid Amazon table inputs (shapes from src/data_utils.py:90-117)."""
    field = jnp.ones((6, 1), jnp.int32)
    values = dict(
        price=jnp.zeros((bsz, 11), jnp.int32),
        rating=jnp.zeros((bsz, 4), jnp.int32),
        brand=jnp.ones((bsz, 12), jnp.int32),
        name=jnp.ones((bsz, 32), jnp.int32),
        category=jnp.ones((bsz, 3, 8, 12), jnp.int32),
        description=jnp.ones((bsz, 128), jnp.int32),
    )
    return field, values
