"""Flax table encoders (reference ``src/table_encoder.py``).

Field-name + field-value embeddings → concat(2·d) → FC → ReLU → Linear(d).
Text-like field values are embedded through the **frozen shared BART
embedding**: the embedding table is passed in as a call argument and wrapped
in ``stop_gradient`` — the functional equivalent of the reference's
``with torch.no_grad():`` blocks (``table_encoder.py:28-59``). Pad id 1 masks
token positions; sums/means follow the reference exactly, including the
``+1e-6`` mean denominators and the per-field validity masks.
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

PAD = 1


def _dense(features, name, bias=True, dtype=jnp.float32):
    from multimodalsum_tpu.core.precision import matmul_precision

    return nn.Dense(features, use_bias=bias, dtype=dtype, name=name,
                    precision=matmul_precision(),
                    kernel_init=nn.initializers.normal(0.02))


def _embed(table, ids):
    """Frozen lookup through the shared BART embedding."""
    return jax.lax.stop_gradient(jnp.take(table, ids, axis=0))


def _masked_sum(emb, ids, axis):
    mask = (ids != PAD)[..., None].astype(emb.dtype)
    return jnp.sum(emb * mask, axis=axis)


class YelpTableEncoder(nn.Module):
    """47-field Yelp schema (reference ``YelpTableEncoder``, ``table_encoder.py:5-83``).

    field: ``[47, 6]`` tokenized field names.
    values: mapping with ``name [b,24]``, ``category [b,6,12]``,
    ``str_categorical [b,5,3]``, ``str_boolean [b,32,1]``, ``rating [b,4]``
    (binary bits), ``hours [b,7,4]`` (one-hot).

    Returns (embeddings ``[b, 47, d]``, validity mask ``[b, 47]``).
    """

    d_model: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, field: jnp.ndarray, values: Mapping[str, jnp.ndarray],
                 embed_table: jnp.ndarray):
        name, category = values["name"], values["category"]
        str_cat, str_bool = values["str_categorical"], values["str_boolean"]
        rating, hours = values["rating"], values["hours"]
        bsz = name.shape[0]
        d = self.d_model

        field_name = _masked_sum(_embed(embed_table, field), field, axis=1)  # [47, d]

        name_e = _masked_sum(_embed(embed_table, name), name, axis=1)[:, None]  # [b,1,d]

        cat_e = _masked_sum(_embed(embed_table, category), category, axis=2)  # [b,6,d]
        cat_valid = jnp.max(category != PAD, axis=-1)[..., None].astype(cat_e.dtype)  # [b,6,1]
        cat_e = jnp.sum(cat_e * cat_valid, axis=1, keepdims=True) / (
            jnp.sum(cat_valid, axis=1, keepdims=True) + 1e-6
        )  # [b,1,d]

        sc_e = _masked_sum(_embed(embed_table, str_cat), str_cat, axis=2)  # [b,5,d]

        sb_ids = str_bool[..., 0]  # [b,32]
        sb_e = _embed(embed_table, sb_ids) * (sb_ids != PAD)[..., None].astype(self.dtype)

        rating_e = _dense(d, "rating_embedding", bias=False, dtype=self.dtype)(
            rating.astype(self.dtype))[:, None]  # [b,1,d]
        hours_e = _dense(d, "hours_embedding", bias=False, dtype=self.dtype)(
            hours.astype(self.dtype))  # [b,7,d]

        all_names = jnp.broadcast_to(field_name[None], (bsz, 47, d)).astype(self.dtype)
        all_values = jnp.concatenate([name_e, cat_e, sc_e, sb_e, rating_e, hours_e], axis=1)
        x = jnp.concatenate([all_names, all_values.astype(self.dtype)], axis=-1)
        x = nn.relu(_dense(d, "fc", dtype=self.dtype)(x))
        x = _dense(d, "linear", bias=False, dtype=self.dtype)(x)

        masks = jnp.concatenate(
            [
                jnp.ones((bsz, 1), bool),                      # name (not null by schema)
                category[:, :1, 0] != PAD,                     # category
                str_cat[:, :, 0] != PAD,                       # 5 str_categorical
                str_bool[:, :, 0] != PAD,                      # 32 str_boolean
                jnp.ones((bsz, 1), bool),                      # rating
                jnp.sum(hours, axis=-1) != 0,                  # 7 hours
            ],
            axis=1,
        )
        return x, masks


class AmazonTableEncoder(nn.Module):
    """5+128-field Amazon schema (reference ``AmazonTableEncoder``,
    ``table_encoder.py:86-167``): price/rating/brand/name/category plus the
    description treated as 128 per-token fields sharing one field name."""

    d_model: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, field: jnp.ndarray, values: Mapping[str, jnp.ndarray],
                 embed_table: jnp.ndarray):
        price, rating = values["price"], values["rating"]
        brand, name = values["brand"], values["name"]
        category, description = values["category"], values["description"]
        bsz = price.shape[0]
        d = self.d_model

        fn = _embed(embed_table, field)[:, 0]  # [6, d] (field shape [6, 1])
        field_name = jnp.concatenate(
            [fn[:-1], jnp.broadcast_to(fn[-1:], (128, d))], axis=0
        )  # [5+128, d]

        price_e = _dense(d, "price_embedding", bias=False, dtype=self.dtype)(
            price.astype(self.dtype))[:, None]
        rating_e = _dense(d, "rating_embedding", bias=False, dtype=self.dtype)(
            rating.astype(self.dtype))[:, None]

        brand_e = _masked_sum(_embed(embed_table, brand), brand, axis=1)[:, None]
        name_e = _masked_sum(_embed(embed_table, name), name, axis=1)[:, None]

        # category: [b, 3, 8, 12] -> token sum -> masked mean over the 8
        # entries -> masked mean over the 3 trees (reference :131-145)
        cat_e = _masked_sum(_embed(embed_table, category), category, axis=3)  # [b,3,8,d]
        lvl1 = jnp.max(category != PAD, axis=-1)  # [b,3,8]
        v1 = lvl1[..., None].astype(cat_e.dtype)
        cat_e = jnp.sum(cat_e * v1, axis=2) / (jnp.sum(v1, axis=2) + 1e-6)  # [b,3,d]
        lvl2 = jnp.max(lvl1, axis=-1)  # [b,3]
        v2 = lvl2[..., None].astype(cat_e.dtype)
        cat_e = jnp.sum(cat_e * v2, axis=1, keepdims=True) / (
            jnp.sum(v2, axis=1, keepdims=True) + 1e-6
        )  # [b,1,d]

        desc_e = _embed(embed_table, description)  # [b,128,d]

        all_names = jnp.broadcast_to(field_name[None], (bsz, 5 + 128, d)).astype(self.dtype)
        all_values = jnp.concatenate(
            [price_e, rating_e, brand_e, name_e, cat_e, desc_e.astype(self.dtype)], axis=1
        )
        x = jnp.concatenate([all_names, all_values.astype(self.dtype)], axis=-1)
        x = nn.relu(_dense(d, "fc", dtype=self.dtype)(x))
        x = _dense(d, "linear", bias=False, dtype=self.dtype)(x)

        masks = jnp.concatenate(
            [
                jnp.sum(price, axis=1, keepdims=True) != 0,    # price
                jnp.ones((bsz, 1), bool),                      # rating
                brand[:, :1] != PAD,                           # brand
                name[:, :1] != PAD,                            # name
                jnp.ones((bsz, 1), bool),                      # category
                description != PAD,                            # 128 description tokens
            ],
            axis=1,
        )
        return x, masks
