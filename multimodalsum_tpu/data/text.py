"""Runtime text data layer (reference L1).

Equivalent of the per-script Dataset classes (``TextDataset``
``src/text_pretrain.py:20-63``, and the text part of ``MultimodalDataset``
``src/multimodal_train.py:23-110``): a per-group review store over the
``data/<ds>/5.text/<mode>/*.csv`` directory contract, per-epoch sampling of
9 reviews per group (seeded ``random_state=7`` for val, reproducing the
reference's pandas sampling exactly), and fixed-shape tensorisation
``[b, 9, 128]`` so jit never recompiles.

TPU-native difference: instead of torch DataLoader workers + CUDA-stream
prefetchers, batches are plain numpy arrays fed through
``data/prefetch.py``'s async device_put double-buffering.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd


def read_review_csvs(path_glob: str) -> pd.DataFrame:
    """Read 5.text CSVs: tab-separated, header row, group_id first column,
    review_text / review_rating third- and second-from-last
    (reference ``read_csv``, ``src/text_pretrain.py:36-40``)."""
    import csv

    rows: List[dict] = []
    for file in sorted(glob.glob(path_glob)):
        with open(file, encoding="utf-8", newline="") as f:
            reader = csv.reader(f, delimiter="\t")
            next(reader, None)  # header
            for parts in reader:
                if len(parts) < 3:
                    continue
                rows.append(dict(group_id=parts[0], review_text=parts[-3],
                                 review_rating=parts[-2]))
    return pd.DataFrame(rows)


def shard_order(order, shard_index: int, shard_count: int):
    """DistributedSampler-style equal-size sharding: pad ``order`` with
    wrapped-around entries so every shard receives exactly
    ``ceil(n / shard_count)`` indices (the reference pads the same way,
    ``DistributedSampler.__iter__``). Unequal shards would make hosts run
    different numbers of jitted steps per epoch and hang inside the
    collectives of a multi-host run."""
    if shard_count <= 1 or len(order) == 0:
        return order
    per_shard = -(-len(order) // shard_count)  # ceil
    total = per_shard * shard_count
    if total > len(order):
        # cyclic repeat (np.resize), NOT a single concatenate: with fewer
        # groups than hosts the pad exceeds len(order) and a one-shot
        # concat under-fills — some shards would run fewer steps and hang
        # the collectives (DistributedSampler repeats the same way)
        order = np.resize(order, total)
    return order[shard_index::shard_count]


class ReviewGroupStore:
    """Groups of reviews with per-epoch resampling (9 per group)."""

    def __init__(self, frame: pd.DataFrame, mode: str = "train",
                 reviews_per_group: int = 9):
        self.all_csv = frame
        self.mode = mode
        self.k = reviews_per_group
        self.df: Optional[pd.DataFrame] = None
        self.set_epoch()

    @classmethod
    def from_dir(cls, data_root: str, dataset: str, mode: str, **kw) -> "ReviewGroupStore":
        pattern = os.path.join(data_root, dataset, "5.text", mode, "*.csv")
        return cls(read_review_csvs(pattern), mode=mode, **kw)

    @classmethod
    def from_dirs(cls, data_root: str, datasets, mode: str, **kw) -> "ReviewGroupStore":
        """Joint corpus over several prepped dataset trees (stage-1
        ``--extra_datasets``): group ids are prefixed with the dataset name
        so a yelp business and an amazon product can never collide into one
        group. Leave-one-out text pretraining is dataset-agnostic (reviews
        in, held-out review out), so cross-domain text only adds signal on
        a small corpus — same rationale as stage 0's joint denoising corpus
        (reference pretrains on its full million-review dump,
        ``README.md:130-133``)."""
        frames = []
        for ds in datasets:
            f = read_review_csvs(os.path.join(data_root, ds, "5.text", mode, "*.csv"))
            if len(f):
                f = f.assign(group_id=ds + ":" + f.group_id.astype(str))
            frames.append(f)
        return cls(pd.concat(frames, ignore_index=True), mode=mode, **kw)

    def set_epoch(self) -> None:
        """Resample k reviews per group. Train: fresh randomness each epoch;
        val: per-group ``random_state=7`` — the reference reseeds *per group*
        (``x.sample(9, random_state=7)`` inside groupby-apply,
        ``src/text_pretrain.py:42-50``), reproduced exactly for val-loss
        comparability."""
        kwargs = {} if self.mode == "train" else {"random_state": 7}
        rows = []
        for gid, grp in self.all_csv.groupby("group_id", sort=False):
            if len(grp) < self.k:
                # groups can fall under k reviews after the 5.text word-count
                # filter; the reference would crash in pandas sample() here —
                # we drop the group instead
                continue
            s = grp.sample(self.k, **kwargs)
            rows.append(
                dict(group_id=gid, review_text=tuple(s.review_text),
                     review_rating=tuple(s.review_rating))
            )
        self.df = pd.DataFrame(rows)

    def __len__(self) -> int:
        return len(self.df)

    def group(self, idx: int):
        item = self.df.iloc[idx]
        return item.group_id, list(item.review_text), [float(r) for r in item.review_rating]


def tokenize_reviews(tokenizer, texts: List[str], max_length: int = 130) -> tuple:
    """Encode with BOS/EOS then strip both ends → ``[k, max_length-2]`` ids +
    mask (reference ``text_processing``, ``src/data_utils.py:48-52``)."""
    ids, mask = [], []
    for t in texts:
        enc = tokenizer.encode(t, add_special_tokens=True, add_prefix_space=True,
                               truncation=True, max_length=max_length,
                               padding="max_length")
        core = enc[1:-1]
        ids.append(core)
        mask.append([1 if i != tokenizer.pad_token_id else 0 for i in core])
    return np.asarray(ids, np.int32), np.asarray(mask, np.int32)


class TextBatches:
    """Epoch iterator of fixed-shape text batches.

    Yields dicts: reviews [b, k, L], reviews_mask [b, k, L],
    reviews_rating [b, k]. Drops the last partial batch in train mode
    (reference DataLoader ``drop_last=True``, ``src/train_utils.py:45``).
    """

    def __init__(self, store: ReviewGroupStore, tokenizer, batch_size: int,
                 max_length: int = 130, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 shard_index: int = 0, shard_count: int = 1,
                 workers: int = 0):
        self.store = store
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        # tokenisation workers (the reference's DataLoader num_workers=4,
        # src/train_utils.py:45); 0 = inline
        self.workers = workers
        self._pool = None
        if workers > 0:
            self._get_pool()

    def _tokenize_group(self, i: int):
        _, texts, rates = self.store.group(int(i))
        ids, m = tokenize_reviews(self.tokenizer, texts, self.max_length)
        return ids, m, rates

    def _get_pool(self):
        if self._pool is None:
            # THREAD pool, deliberately not processes: a fork() Pool inside
            # a JAX process deadlocks — the forked child inherits a lock
            # held by one of the runtime's background threads and a later
            # pool.map never returns (observed wedging a real bart-large
            # run at epoch 12; CPython itself warns on fork-after-threads).
            # Threads parallelise fine here: the native BPE core is a
            # ctypes foreign call, which releases the GIL for the duration.
            from multiprocessing.dummy import Pool

            global _ACTIVE_BATCHES
            _ACTIVE_BATCHES = self
            self._pool = Pool(self.workers)
        return self._pool

    def epoch(self, epoch: int) -> Iterator[dict]:
        if epoch > 0:
            self.store.set_epoch()
        n = len(self.store)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + epoch).permutation(n)
        # per-host sharding replaces DistributedSampler (train_utils.py:38-43)
        order = shard_order(order, self.shard_index, self.shard_count)

        b = self.batch_size
        limit = (len(order) // b) * b if self.drop_last else len(order)
        for start in range(0, limit, b):
            idxs = [int(i) for i in order[start:start + b]]
            if self.workers > 0:
                # the consumer thread reads the (freshly resampled) store;
                # workers only tokenize
                groups = [self.store.group(int(i)) for i in idxs]
                toks = self._get_pool().map(_pool_tokenize,
                                            [g[1] for g in groups])
                rows = [(ids, m, g[2]) for (ids, m), g in zip(toks, groups)]
            else:
                rows = [self._tokenize_group(i) for i in idxs]
            yield dict(
                reviews=np.stack([r[0] for r in rows]),
                reviews_mask=np.stack([r[1] for r in rows]),
                reviews_rating=np.asarray([r[2] for r in rows], np.float32),
            )

    def close(self):
        global _ACTIVE_BATCHES
        if self._pool is not None:
            self._pool.close()  # graceful: lets in-flight maps finish
            self._pool.join()
            self._pool = None
        if _ACTIVE_BATCHES is self:
            # drop the module-global pin or the store's dataframes can never
            # be garbage-collected after this iterator is discarded
            _ACTIVE_BATCHES = None


#: the TextBatches instance the forked tokenisation workers operate on
#: (workers inherit its tokenizer/max_length at fork; texts come per call)
_ACTIVE_BATCHES: Optional["TextBatches"] = None


def _pool_tokenize(texts):
    self = _ACTIVE_BATCHES
    return tokenize_reviews(self.tokenizer, texts, self.max_length)
