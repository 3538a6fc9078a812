"""Multimodal datasets: text + images + table per group.

Equivalents of reference ``MultimodalDataset`` (``src/multimodal_train.py:23-110``),
``ImgDataset`` (``src/img_pretrain.py:22-83``), ``TableDataset``
(``src/table_pretrain.py:21-82``) and ``MultimodalTestDataset``
(``src/test.py:50-134``), over the same on-disk contract:

* ``data/<ds>/5.text/<mode>/*.csv`` — grouped raw reviews;
* ``data/<ds>/meta.csv`` — tab-separated metadata table (``na_filter=False``);
* ``data/<ds>/photo_dict.pickle`` / ``photo_business_dict.pickle`` — photo id
  maps (yelp); amazon uses ``<group_id>.jpg`` files directly;
* ``data/<ds>/raw_others/photos/*.jpg``.

Max images: 10 (yelp) / 1 (amazon) (``src/test.py:121-124``).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd

from multimodalsum_tpu.data.images import (
    photo_paths, stack_images, stack_images_uint8,
)
from multimodalsum_tpu.data.tables import (
    amazon_field_tokens,
    amazon_table_features,
    stack_features,
    yelp_field_tokens,
    yelp_table_features,
)
from multimodalsum_tpu.data.text import ReviewGroupStore, read_review_csvs, tokenize_reviews

MAX_IMGS = {"yelp": 10, "amazon": 1}


def load_meta(data_root: str, dataset: str) -> pd.DataFrame:
    return pd.read_csv(os.path.join(data_root, dataset, "meta.csv"),
                       sep="\t", na_filter=False, dtype=str)


def load_photo_map(data_root: str, dataset: str, mode: str) -> Dict[str, List[str]]:
    """group_id -> photo id list for the split (reference
    ``append_photo``, ``src/data_utils.py:35-45``)."""
    base = os.path.join(data_root, dataset)
    pbd_path = os.path.join(base, "photo_business_dict.pickle")
    members = None
    if os.path.exists(pbd_path):
        # the dict carries train/val only; eval ("test"/"dev") uses all photos
        # (reference src/test.py:91-96 bypasses photo_business_dict)
        members = pd.read_pickle(pbd_path).get(mode)
        members = set(members) if members is not None else None
    if dataset == "yelp":
        pd_path = os.path.join(base, "photo_dict.pickle")
        if not os.path.exists(pd_path):
            # fail LOUDLY like the reference's unconditional read_pickle
            # (src/data_utils.py:37): a wrong --data_root or skipped image
            # prep would otherwise train/evaluate silently image-free
            raise FileNotFoundError(
                f"{pd_path} not found — run the image modality prep, or "
                f"construct the store with with_photos=False for stages "
                f"that never read images")
        photo_dict = pd.read_pickle(pd_path)
        out = {}
        for gid, photos in photo_dict.items():
            if members is None or gid in members:
                out[gid] = list(photos)
        return out
    # amazon: one photo named <group_id>.jpg when present
    have = {os.path.basename(p)[:-4]
            for p in glob.glob(os.path.join(base, "raw_others", "photos", "*.jpg"))}
    ids = have if members is None else (have & members)
    return {gid: [gid] for gid in ids}


def table_features_for(tokenizer, dataset: str, meta_row, columns) -> dict:
    """Shared per-example table featurisation (handles a missing meta row
    for both datasets) — used by the train store and the eval dataset."""
    if dataset == "yelp":
        vals = ({c: meta_row[c] for c in columns} if meta_row is not None else None)
        return yelp_table_features(tokenizer, vals)
    return amazon_table_features(tokenizer, meta_row)


#: cached zero image tensors for skip_images examples, keyed by (MAX_IMGS, dtype)
_ZERO_IMGS: Dict[tuple, tuple] = {}


class MultimodalStore:
    """Per-group store joining reviews, photos and the metadata table."""

    def __init__(self, data_root: str, dataset: str, mode: str,
                 reviews_per_group: int = 9, with_photos: bool = True,
                 require_photos: bool = False):
        """``with_photos=False`` skips the photo map entirely (the table
        stage never reads images — the reference TableDataset does not
        touch photos either). ``require_photos=True`` keeps only groups
        that HAVE photos — the reference ImgDataset filters its filelist
        by photo_business_dict (src/img_pretrain.py:44): without the
        filter, stage 2a would mostly train the image encoder to decode
        reviews from a constant null embedding."""
        self.data_root, self.dataset, self.mode = data_root, dataset, mode
        frame = read_review_csvs(
            os.path.join(data_root, dataset, "5.text", mode, "*.csv"))
        self.text = ReviewGroupStore(frame, mode=mode, reviews_per_group=reviews_per_group)
        self.meta = load_meta(data_root, dataset)
        self.meta_by_id = {r["group_id"]: r for _, r in self.meta.iterrows()}
        self.photos = (load_photo_map(data_root, dataset, mode)
                       if with_photos else {})
        self.require_photos = require_photos
        self._filter_groups()

    def _filter_groups(self):
        # train/val keeps only groups present in meta (reference
        # multimodal_train.py:54-56 intersects group ids); the img stage
        # additionally requires photos (reference img_pretrain.py:44)
        keep = self.text.df.group_id.isin(self.meta_by_id)
        if self.require_photos:
            keep &= self.text.df.group_id.isin(
                {g for g, p in self.photos.items() if p})
        self.text.df = self.text.df[keep].reset_index(drop=True)

    def set_epoch(self):
        self.text.set_epoch()
        self._filter_groups()

    def __len__(self):
        return len(self.text)

    def meta_columns(self) -> List[str]:
        return list(self.meta.columns)[1:]

    def field_tokens(self, tokenizer) -> np.ndarray:
        cols = self.meta_columns()
        return (yelp_field_tokens(tokenizer, cols) if self.dataset == "yelp"
                else amazon_field_tokens(tokenizer, cols))

    def example(self, idx: int, tokenizer, *, max_length: int = 130,
                train: bool = False, rng: Optional[np.random.Generator] = None,
                skip_images: bool = False, raw_uint8: bool = True):
        """``skip_images`` avoids photo IO/decode entirely (zero images +
        empty mask) for consumers that never read the image modality, e.g.
        the table-pretrain stage. ``raw_uint8`` (the default) ships images
        as pre-normalisation uint8 — ``MultimodalSum.encode_img``
        normalises on device; 4x less H2D traffic, and the remote-device
        tunnel leaks host RAM per byte transferred (ops/images.py)."""
        gid, texts, rates = self.text.group(idx)
        ids, mask = tokenize_reviews(tokenizer, texts, max_length)

        meta_row = self.meta_by_id.get(gid)
        table = table_features_for(tokenizer, self.dataset, meta_row,
                                   self.meta_columns())

        if skip_images:
            # shared read-only zeros (consumers np.stack-copy them): a fresh
            # (10, 224, 224, 3) float32 per example is ~6 MB of throwaway
            # allocation in the table-pretrain hot loop
            n = MAX_IMGS[self.dataset]
            key = (n, "u8" if raw_uint8 else "f32")
            if key not in _ZERO_IMGS:
                z = np.zeros((n, 224, 224, 3),
                             np.uint8 if raw_uint8 else np.float32)
                z.setflags(write=False)
                zm = np.zeros((n,), bool)
                zm.setflags(write=False)
                _ZERO_IMGS[key] = (z, zm)
            img, img_mask = _ZERO_IMGS[key]
        else:
            paths = photo_paths(self.data_root, self.dataset, self.photos.get(gid, []))
            paths = [p for p in paths if os.path.exists(p)]
            stack = stack_images_uint8 if raw_uint8 else stack_images
            img, img_mask = stack(paths, MAX_IMGS[self.dataset],
                                  train=train, rng=rng)
        return dict(group_id=gid, reviews=ids, reviews_mask=mask,
                    reviews_rating=np.asarray(rates, np.float32),
                    field_values=table, img=img, img_mask=img_mask)


def example_batches(store: MultimodalStore, tokenizer, batch_size: int, *,
                    project, epoch: int = 0, max_length: int = 130,
                    shuffle: bool = True, drop_last: bool = True, seed: int = 0,
                    shard_index: int = 0, shard_count: int = 1,
                    labels_per_group: int = 1,
                    example_kwargs: dict | None = None) -> Iterator[dict]:
    """Shared per-epoch iterator for every training stage: resampling
    (``set_epoch``), seeded permutation, equal-size per-host sharding,
    drop_last, then ``project(rows)`` shapes the batch for the stage (the
    reference re-implements this loop in each of ``ImgDataset`` /
    ``TableDataset`` / ``MultimodalDataset``).

    ``labels_per_group > 1``: each group contributes that many dataset
    items per epoch — item ``(g, r)`` is group ``g`` with ``label_idx=r``
    set on the example, and the permutation runs over ALL items, exactly
    the reference's ImgDataset/TableDataset layout (one row per sampled
    review, src/img_pretrain.py:60-66 / table_pretrain.py:55-61)."""
    if epoch > 0:
        store.set_epoch()
    rng = np.random.default_rng(seed + epoch)
    lpg = labels_per_group
    n = len(store) * lpg
    order = rng.permutation(n) if shuffle else np.arange(n)
    from multimodalsum_tpu.data.text import shard_order

    order = shard_order(order, shard_index, shard_count)
    limit = (len(order) // batch_size) * batch_size if drop_last else len(order)
    kw = example_kwargs or {}
    for start in range(0, limit, batch_size):
        rows = []
        for i in order[start:start + batch_size]:
            g, r = divmod(int(i), lpg)
            row = store.example(g, tokenizer, max_length=max_length,
                                rng=rng, **kw)
            row["label_idx"] = r
            rows.append(row)
        yield project(rows)


def multimodal_batches(store: MultimodalStore, tokenizer, batch_size: int, *,
                       epoch: int = 0, max_length: int = 130, train: bool = True,
                       shuffle: bool = True, drop_last: bool = True, seed: int = 0,
                       shard_index: int = 0, shard_count: int = 1) -> Iterator[dict]:
    """Fixed-shape multimodal batches for the stage-3 loop."""
    def project(rows):
        return dict(
            reviews=np.stack([r["reviews"] for r in rows]),
            reviews_mask=np.stack([r["reviews_mask"] for r in rows]),
            reviews_rating=np.stack([r["reviews_rating"] for r in rows]),
            field_values=stack_features([r["field_values"] for r in rows]),
            img=np.stack([r["img"] for r in rows]),
            img_mask=np.stack([r["img_mask"] for r in rows]),
        )

    yield from example_batches(
        store, tokenizer, batch_size, project=project, epoch=epoch,
        max_length=max_length, shuffle=shuffle, drop_last=drop_last, seed=seed,
        shard_index=shard_index, shard_count=shard_count,
        example_kwargs=dict(train=train),
    )


class EvalDataset:
    """Gold evaluation data (reference ``MultimodalTestDataset``,
    ``src/test.py:50-134``): Yelp dev rows 0-99 / test rows 100-199 of
    ``summaries_0-200_cleaned.csv``; Amazon ``dev.csv``/``test.csv`` with 3
    summaries per product. Review max length: 160 (yelp) / 120 (amazon)."""

    MAX_LEN = {"yelp": 160, "amazon": 120}

    def __init__(self, data_root: str, dataset: str, mode: str = "test"):
        self.dataset = dataset
        self.data_root = data_root
        if dataset == "yelp":
            csv = pd.read_csv(
                os.path.join(data_root, "yelp", "test", "summaries_0-200_cleaned.csv"))
            csv = csv.iloc[:100] if mode == "dev" else csv.iloc[100:]
            gid = csv["Input.business_id"]
            reviews = csv[[f"Input.original_review_{i}" for i in range(8)]]
            summaries = csv[["Answer.summary"]]
        else:
            csv = pd.read_csv(
                os.path.join(data_root, "amazon", "test", f"{mode}.csv"), sep="\t")
            gid = csv["prod_id"]
            reviews = csv[[f"rev{i}" for i in range(1, 9)]]
            summaries = csv[[f"summ{i}" for i in range(1, 4)]]

        clean_review = lambda x: " ".join(x.encode("ascii", "ignore").decode().split())
        clean_summary = lambda x: " ".join(x.split())
        self.group_ids = list(gid)
        self.reviews = [[clean_review(x) for x in row] for row in reviews.itertuples(index=False)]
        self.summaries = [[clean_summary(x) for x in row] for row in summaries.itertuples(index=False)]

        self.meta = load_meta(data_root, dataset)
        self.meta_by_id = {r["group_id"]: r for _, r in self.meta.iterrows()}
        self.photos = load_photo_map(data_root, dataset, mode="test")

    def __len__(self):
        return len(self.group_ids)

    def meta_columns(self):
        return list(self.meta.columns)[1:]

    def field_tokens(self, tokenizer) -> np.ndarray:
        cols = self.meta_columns()
        return (yelp_field_tokens(tokenizer, cols) if self.dataset == "yelp"
                else amazon_field_tokens(tokenizer, cols))

    def example(self, idx: int, tokenizer, *, raw_uint8: bool = True):
        """``raw_uint8`` (the default, matching ``MultimodalStore.example``)
        returns images as pre-normalisation uint8 (4x
        less host->device traffic); the consumer normalises on device —
        ``eval/harness.py normalize_images``."""
        gid = self.group_ids[idx]
        ids, mask = tokenize_reviews(tokenizer, self.reviews[idx],
                                     self.MAX_LEN[self.dataset])
        meta_row = self.meta_by_id.get(gid)
        table = table_features_for(tokenizer, self.dataset, meta_row,
                                   self.meta_columns())
        paths = [p for p in photo_paths(self.data_root, self.dataset,
                                        self.photos.get(gid, []))
                 if os.path.exists(p)]
        if raw_uint8:
            from multimodalsum_tpu.data.images import stack_images_uint8

            img, img_mask = stack_images_uint8(paths, MAX_IMGS[self.dataset])
        else:
            img, img_mask = stack_images(paths, MAX_IMGS[self.dataset],
                                         train=False)
        return dict(group_id=gid, reviews=ids, reviews_mask=mask,
                    field_values=table, img=img, img_mask=img_mask)
