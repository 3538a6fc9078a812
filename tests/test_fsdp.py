"""FSDP/ZeRO-style state sharding: identical losses to plain DP, and the
parameter + optimizer memory actually shards over the data axis."""

import numpy as np


def _setup():
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG
    from multimodalsum_tpu.models.multimodal import MultimodalSum, yelp_dummy_table
    from multimodalsum_tpu.train.loop import TrainStateWithStats, make_train_step_with_stats
    from multimodalsum_tpu.train.optim import NO_DECAY_MULTIMODAL, make_optimizer
    from multimodalsum_tpu.train.stages import multimodal_train_loss

    cfg = TINY_CONFIG
    model = MultimodalSum(cfg, dataset="yelp", img_model="tiny")
    field, values1 = yelp_dummy_table(1)
    variables = model.init(
        jax.random.PRNGKey(0), field, values1, method=MultimodalSum.init_all)
    params, batch_stats = variables["params"], variables["batch_stats"]

    b, e, s = 8, 3, 8
    rng = np.random.default_rng(3)
    _, values = yelp_dummy_table(b)
    batch = dict(
        reviews=rng.integers(3, cfg.vocab_size, (b, e, s)).astype(np.int32),
        reviews_mask=np.ones((b, e, s), np.int32),
        reviews_rating=rng.integers(1, 6, (b, e)).astype(np.float32),
        field_values=values,
        img=rng.normal(size=(b, 1, 32, 32, 3)).astype(np.float32),
        img_mask=np.ones((b, 1), bool),
    )
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=10,
                        no_decay=NO_DECAY_MULTIMODAL, max_grad_norm=1.0)

    def loss_fn(p, stats, bt, r):
        return multimodal_train_loss(model, p, stats, dict(bt, field=field),
                                     label_smoothing=0.1, rng=r)

    step = make_train_step_with_stats(loss_fn, tx)
    state = TrainStateWithStats.create(params, batch_stats, tx)
    return step, state, batch, tx


def test_fsdp_step_matches_dp():
    import jax

    from multimodalsum_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                 replicated, shard_batch)
    from multimodalsum_tpu.parallel.sharding import fsdp_shardings

    n = min(8, len(jax.devices()))
    mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
    step, state, batch, _ = _setup()

    r, bs = replicated(mesh), batch_sharding(mesh)
    jit_dp = jax.jit(step, in_shardings=(r, bs, r), out_shardings=(r, r))
    dp_state, dp_loss = jit_dp(state, shard_batch(batch, mesh),
                               jax.random.PRNGKey(1))
    dp_loss = float(dp_loss)

    # min_size=0: at TINY geometry every shardable leaf shards, so the test
    # exercises the placement logic everywhere it can apply
    s_shard = fsdp_shardings(state, mesh, min_size=0)
    f_state = jax.device_put(state, s_shard)
    jit_f = jax.jit(step, in_shardings=(s_shard, bs, r),
                    out_shardings=(s_shard, r))
    f_state, f_loss = jit_f(f_state, shard_batch(batch, mesh),
                            jax.random.PRNGKey(1))
    f_loss = float(f_loss)

    assert np.isfinite(f_loss)
    assert abs(f_loss - dp_loss) < 5e-4, (f_loss, dp_loss)

    # the updated params must agree too (same math, different placement)
    da = jax.tree.leaves(dp_state.params)[0]
    fa = jax.tree.leaves(f_state.params)[0]
    np.testing.assert_allclose(np.asarray(fa), np.asarray(da),
                               atol=2e-5, rtol=1e-4)

    # placement: at least one large param leaf is genuinely sharded (its
    # addressable shard holds 1/n of the elements)
    sharded = 0
    for leaf in jax.tree.leaves(f_state.params):
        if leaf.size >= n and leaf.size % n == 0:
            shard = leaf.addressable_shards[0].data
            if shard.size == leaf.size // n:
                sharded += 1
    assert sharded > 0, "no parameter actually sharded over the data axis"


def test_fsdp_spec_rules():
    from jax.sharding import PartitionSpec as P

    from multimodalsum_tpu.parallel.sharding import fsdp_spec

    # largest divisible axis wins
    assert fsdp_spec((1024, 4096), 8) == P(None, "data")
    assert fsdp_spec((4096, 1024), 8) == P("data", None)
    # ties at equal dims: first match of the larger dim
    assert fsdp_spec((512, 512), 8) == P("data", None)
    # nothing divisible -> replicated
    assert fsdp_spec((7, 13), 8) == P()
    # small leaves replicated by the threshold
    assert fsdp_spec((64,), 8) == P()
    # scalars replicated
    assert fsdp_spec((), 8) == P()
