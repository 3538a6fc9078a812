"""Table featurisation from ``meta.csv`` rows (reference
``src/data_utils.py:67-117``): tokenised text fields + binary/one-hot numeric
fields, emitted as the fixed-shape dicts the table encoders consume.

Yelp schema (47 fields): name, category (≤6 entries × 12 tokens),
5 string-categoricals (3 tokens), 32 string-booleans (1 token), star rating
as 4 binary bits, 7 opening-hours one-hot(4) slots. A business missing from
meta.csv gets the all-null row (``:81-88``).

Amazon schema (5+128 fields): 11-bit price, 4-bit rating, brand (12 tokens),
name (32), category trees (3 × 8 × 12), description (128 per-token fields).
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np

PAD = 1


def _tok(tokenizer, text: str, max_length: int) -> list:
    return tokenizer.encode(text, add_special_tokens=False, add_prefix_space=True,
                            truncation=True, max_length=max_length,
                            padding="max_length")


def yelp_field_tokens(tokenizer, columns: Sequence[str]) -> np.ndarray:
    """Tokenised field names [47, 6] (reference ``src/test.py:103-104``)."""
    return np.asarray([_tok(tokenizer, c, 6) for c in columns], np.int32)


def amazon_field_tokens(tokenizer, columns: Sequence[str]) -> np.ndarray:
    """[6, 1] — each Amazon field name is a single token (``src/test.py:106``)."""
    return np.asarray([_tok(tokenizer, c, 1) for c in columns], np.int32)


def yelp_table_features(tokenizer, row: Mapping[str, str] | None) -> Dict[str, np.ndarray]:
    """One business's meta row → tensor dict (reference
    ``yelp_table_processing``, ``src/data_utils.py:67-88``).

    ``row``: ordered mapping of the meta.csv columns after group_id
    (name, category, 5 str-categoricals, 32 str-booleans, rating, 7 hours),
    or None for a business without metadata.
    """
    if row is None:
        return dict(
            name=np.ones(24, np.int32),
            category=np.ones((6, 12), np.int32),
            str_categorical=np.ones((5, 3), np.int32),
            str_boolean=np.ones((32, 1), np.int32),
            rating=np.zeros(4, np.int32),
            hours=np.zeros((7, 4), np.int32),
        )
    vals = list(row.values())
    name = np.asarray(_tok(tokenizer, vals[0], 24), np.int32)
    cats = [c for c in vals[1].split(", ") if c][:6]
    category = np.ones((6, 12), np.int32)
    for i, c in enumerate(cats):
        category[i] = _tok(tokenizer, c, 12)
    str_categorical = np.asarray([_tok(tokenizer, v, 3) for v in vals[2:7]], np.int32)
    str_boolean = np.asarray([_tok(tokenizer, v, 1) for v in vals[7:39]], np.int32)
    rating = np.asarray([int(x) for x in vals[39]], np.int32)
    hours = np.zeros((7, 4), np.int32)
    for i, v in enumerate(vals[40:47]):
        if v != "":
            hours[i, int(v)] = 1
    return dict(name=name, category=category, str_categorical=str_categorical,
                str_boolean=str_boolean, rating=rating, hours=hours)


def amazon_table_features(tokenizer, row: Mapping[str, str] | None) -> Dict[str, np.ndarray]:
    """One product's meta row → tensor dict (reference
    ``amazon_table_processing``, ``src/data_utils.py:90-117``).

    ``row=None`` (product missing from meta.csv — the prep skips products
    absent from the raw dumps) yields the all-null table: pad-id text
    fields and zero binarisations, so every per-field validity mask is
    False and the table modality is null for that example, mirroring the
    yelp branch."""
    if row is None:
        return dict(
            price=np.zeros(11, np.int32),
            rating=np.zeros(4, np.int32),
            brand=np.ones(12, np.int32),
            name=np.ones(32, np.int32),
            category=np.ones((3, 8, 12), np.int32),
            description=np.ones(128, np.int32),
        )
    # empty-string features are valid meta states this repo's own prep
    # produces (e.g. a gold-only eval product with no training reviews has
    # ratings="") — a bare int() loop would yield a shape-(0,) array and
    # crash np.stack against normal (4,)/(11,) rows
    price = (np.zeros(11, np.int32) if row["price"] == ""
             else np.asarray([int(x) for x in row["price"]], np.int32))
    rating = (np.zeros(4, np.int32) if row["ratings"] == ""
              else np.asarray([int(x) for x in row["ratings"]], np.int32))
    brand = (np.ones(12, np.int32) if row["brand"] == ""
             else np.asarray(_tok(tokenizer, row["brand"], 12), np.int32))
    name = (np.ones(32, np.int32) if row["name"] == ""
            else np.asarray(_tok(tokenizer, row["name"], 32), np.int32))

    category = np.ones((3, 8, 12), np.int32)
    for ti, tree in enumerate(row["category"].split("||")[:3]):
        for ni, node in enumerate(tree.split("|")[:8]):
            category[ti, ni] = _tok(tokenizer, node, 12)

    description = (np.ones(128, np.int32) if row["description"] == ""
                   else np.asarray(_tok(tokenizer, row["description"], 128), np.int32))
    return dict(price=price, rating=rating, brand=brand, name=name,
                category=category, description=description)


def stack_features(rows: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Batch per-example dicts into [b, ...] arrays."""
    keys = rows[0].keys()
    return {k: np.stack([r[k] for r in rows]) for k in keys}
