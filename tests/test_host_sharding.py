"""Per-host data sharding: the DistributedSampler replacement
(reference ``src/train_utils.py:38-43``). Two simulated hosts must
partition the group list exactly (no group read twice when the count
divides), stay epoch-stable/deterministic, and produce the same DP loss as
the single-host run."""

import numpy as np
import pandas as pd
import pytest


class _StubTokenizer:
    """Deterministic stand-in: hashes words to ids; enough for TextBatches."""

    pad_token_id = 1
    bos_token_id = 0
    eos_token_id = 2

    def encode(self, text, add_special_tokens=True, add_prefix_space=True,
               truncation=True, max_length=16, padding="max_length"):
        ids = [3 + (hash(w) % 60) for w in text.split()][: max_length - 2]
        out = [self.bos_token_id] + ids + [self.eos_token_id]
        out += [self.pad_token_id] * (max_length - len(out))
        return out[:max_length]


def _store(n_groups, reviews_per_group=9, extra=3):
    rows = []
    for g in range(n_groups):
        for r in range(reviews_per_group + extra):
            rows.append(dict(group_id=f"g{g:03d}",
                             review_text=f"group {g} review {r} words here",
                             review_rating=str(1 + (r % 5))))
    from multimodalsum_tpu.data.text import ReviewGroupStore

    return ReviewGroupStore(pd.DataFrame(rows), mode="train")


def test_shard_order_partitions_exactly_when_divisible():
    from multimodalsum_tpu.data.text import shard_order

    order = np.random.default_rng(0).permutation(12)
    shards = [shard_order(order, i, 3) for i in range(3)]
    assert all(len(s) == 4 for s in shards)
    union = np.concatenate(shards)
    assert sorted(union.tolist()) == list(range(12))  # disjoint exact cover


def test_shard_order_uneven_pads_equal_sizes_covering_all():
    from multimodalsum_tpu.data.text import shard_order

    order = np.random.default_rng(1).permutation(10)
    shards = [shard_order(order, i, 4) for i in range(4)]
    # DistributedSampler semantics: equal ceil-size shards, wrap-around pad
    assert all(len(s) == 3 for s in shards)
    union = np.concatenate(shards)
    assert set(union.tolist()) == set(range(10))  # every index covered
    assert len(union) - len(set(union.tolist())) == 2  # only the pad repeats


def test_two_hosts_partition_text_batches_and_stay_deterministic():
    from multimodalsum_tpu.data.text import TextBatches

    tok = _StubTokenizer()
    store = _store(8)

    def host_groups(shard_index, shard_count, epoch=0):
        tb = TextBatches(store, tok, batch_size=2, max_length=12, seed=5,
                         shard_index=shard_index, shard_count=shard_count)
        seen = []
        for batch in tb.epoch(epoch):
            assert batch["reviews"].shape == (2, 9, 10)
            seen.append(batch["reviews"][:, 0, :].copy())
        return np.concatenate(seen)

    h0a, h1a = host_groups(0, 2), host_groups(1, 2)
    # equal step counts (hosts must not deadlock in collectives)
    assert h0a.shape == h1a.shape == (4, 10)
    # determinism: re-iterating the same epoch gives identical shards
    h0b = host_groups(0, 2)
    np.testing.assert_array_equal(h0a, h0b)
    # exact partition: the two hosts' rows together equal the single-host rows
    single = host_groups(0, 1)
    key = lambda a: sorted(map(tuple, a.tolist()))
    assert key(np.concatenate([h0a, h1a])) == key(single)
    # disjoint: no row appears on both hosts
    assert not (set(map(tuple, h0a.tolist())) & set(map(tuple, h1a.tolist())))


def test_two_host_dp_loss_matches_single_host():
    """mean(host losses) == single-host loss on the same global batch: the
    pad-inclusive CE weights every example identically, so per-host means
    average exactly (the all-reduce of a multi-host DP step)."""
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.data.text import TextBatches
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.train.stages import text_pretrain_loss

    tok = _StubTokenizer()
    tok.pad_token_id = 1
    store = _store(4, reviews_per_group=9, extra=0)
    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]

    def losses(shard_index, shard_count):
        tb = TextBatches(store, tok, batch_size=4 // shard_count, max_length=10,
                         seed=3, shard_index=shard_index, shard_count=shard_count)
        return [float(text_pretrain_loss(model, params, b, rng=None))
                for b in tb.epoch(0)]

    (single,) = losses(0, 1)
    (h0,) = losses(0, 2)
    (h1,) = losses(1, 2)
    np.testing.assert_allclose((h0 + h1) / 2.0, single, rtol=2e-6)


def test_host_data_shard_steps_per_epoch():
    from multimodalsum_tpu.cli.common import host_data_shard

    si, sc, steps = host_data_shard(100, 4)
    assert (si, sc) == (0, 1) and steps == 25  # single-host identity

    # simulated 4-process world: monkeypatch the comm-layer source of truth
    import multimodalsum_tpu.parallel.comm as comm

    orig = comm.host_shard
    comm.host_shard = lambda: (2, 4)
    try:
        si, sc, steps = host_data_shard(100, 4)
    finally:
        comm.host_shard = orig
    assert (si, sc) == (2, 4) and steps == 6  # ceil(100/4)=25 -> 25//4


def test_shard_order_wraps_when_fewer_items_than_shards():
    """Fewer groups than hosts: every shard must still receive exactly
    ceil(n / shard_count) indices (cyclic repeat, DistributedSampler
    semantics) — an under-filled shard runs fewer jitted steps and hangs
    the collectives."""
    from multimodalsum_tpu.data.text import shard_order

    order = np.arange(3)
    shards = [shard_order(order, i, 8) for i in range(8)]
    assert all(len(s) == 1 for s in shards)
    got = sorted(int(s[0]) for s in shards)
    assert got == [0, 0, 0, 1, 1, 1, 2, 2]  # cyclic pad of [0,1,2] to 8


def test_worker_tokenization_matches_inline_across_epochs():
    """workers > 0 must produce byte-identical batches to inline
    tokenisation INCLUDING epochs after a resample — the workers receive
    texts over the pipe, so the parent's set_epoch() is always visible (a
    fork snapshot of the store would pin epoch-0's samples forever)."""
    from multimodalsum_tpu.data.text import TextBatches

    tok = _StubTokenizer()

    def run(workers):
        np.random.seed(11)  # set_epoch's pandas sample uses global np.random
        store = _store(6)
        tb = TextBatches(store, tok, batch_size=2, max_length=12, seed=5,
                         workers=workers)
        out = []
        for ep in range(2):
            np.random.seed(100 + ep)
            out.append([{k: v.copy() for k, v in b.items()}
                        for b in tb.epoch(ep)])
        tb.close()
        return out

    inline, pooled = run(0), run(2)
    assert len(inline) == len(pooled) == 2
    for ep in range(2):
        assert len(inline[ep]) == len(pooled[ep]) > 0
        for bi, bp in zip(inline[ep], pooled[ep]):
            for k in bi:
                np.testing.assert_array_equal(bi[k], bp[k], err_msg=f"ep{ep} {k}")
    # and the two epochs genuinely differ (resample happened)
    assert any(not np.array_equal(a["reviews"], b["reviews"])
               for a, b in zip(inline[0], inline[1]))
