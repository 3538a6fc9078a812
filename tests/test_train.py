"""Training-stage tests: loss parity vs the reference leave-one-out forward,
optimizer masking, and a data-parallel multi-device step on the CPU mesh."""

import numpy as np
import pytest

from reference_oracle import make_enc_model, require_reference, tiny_jax_config


@pytest.fixture(scope="module")
def torch_mod():
    require_reference()
    import torch

    return torch


def _batch(rng, cfg, bsz=2, ents=4, seq=12):
    reviews = rng.integers(3, cfg.vocab_size, (bsz, ents, seq))
    # shape like the data layer: tokens ... eos pad pad (bos/eos-stripped 130-cap)
    for b in range(bsz):
        for e in range(ents):
            L = int(rng.integers(seq - 3, seq + 1))
            reviews[b, e, L - 1] = cfg.eos_token_id
            reviews[b, e, L:] = cfg.pad_token_id
    mask = (reviews != cfg.pad_token_id).astype(np.int64)
    rating = rng.integers(1, 6, (bsz, ents)).astype(np.float32)
    return reviews, mask, rating


def _reference_loo_loss(torch, ref, reviews, mask, rating, label_smoothing):
    """Reference TextSupervised.forward semantics (src/text_pretrain.py:66-113)."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    from utils import LabelSmoothingLoss

    bsz, n, s = reviews.shape
    r = torch.from_numpy(reviews.reshape(bsz * n, s))
    m = torch.from_numpy(mask.reshape(bsz * n, s))
    with torch.no_grad():
        eh = ref.model.encoder(input_ids=r, attention_mask=m)[0].view(bsz, n, s, -1)
        ratings = torch.from_numpy(rating)
        if label_smoothing is not None:
            loss_fct = LabelSmoothingLoss(ref.config.vocab_size, smoothing=label_smoothing)
        else:
            loss_fct = torch.nn.CrossEntropyLoss()
        losses = []
        for i in range(n):
            encode_idx = [j for j in range(n) if j != i]
            src = ratings[:, encode_idx].mean(dim=1)
            rd = (ratings[:, i] - src).unsqueeze(1)
            out = ref(
                eh[:, encode_idx], rd, torch.from_numpy(mask)[:, encode_idx],
                labels=torch.from_numpy(reviews[:, i]),
            )
            losses.append(loss_fct(out[0].view(-1, ref.config.vocab_size),
                                   torch.from_numpy(reviews[:, i]).reshape(-1)))
        return float(torch.stack(losses).mean())


@pytest.mark.parametrize("smoothing", [None, 0.1])
def test_leave_one_out_loss_parity(torch_mod, smoothing):
    torch = torch_mod
    cfg = tiny_jax_config()
    ref = make_enc_model(seed=21)
    rng = np.random.default_rng(22)
    reviews, mask, rating = _batch(rng, cfg)

    ref_loss = _reference_loo_loss(torch, ref, reviews, mask, rating, smoothing)

    from multimodalsum_tpu.ckpt.convert import bart_params_from_torch
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.train.stages import text_pretrain_loss

    model = BartModel(cfg)
    params = bart_params_from_torch(ref.state_dict(), cfg)
    loss = text_pretrain_loss(
        model, params,
        dict(reviews=reviews, reviews_mask=mask, reviews_rating=rating),
        label_smoothing=smoothing, rng=None,
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=2e-4, atol=2e-4)


def test_leave_one_out_remat_flag_is_value_neutral():
    """remat only trades FLOPs for memory — loss and grads must be identical
    with it on or off (guards the remat kwarg plumbing)."""
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.train.stages import leave_one_out_loss

    rng = np.random.default_rng(5)
    reviews, mask, rating = _batch(rng, cfg, bsz=2, ents=3, seq=10)
    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]

    def loss(params, remat):
        return leave_one_out_loss(model, params, reviews, mask, rating,
                                  label_smoothing=0.1, rng=None, remat=remat)

    l_on, g_on = jax.value_and_grad(lambda p: loss(p, True))(params)
    l_off, g_off = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_pol, g_pol = jax.value_and_grad(
        lambda p: loss(p, "dots_with_no_batch_dims_saveable"))(params)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-6)
    np.testing.assert_allclose(float(l_on), float(l_pol), rtol=1e-6)
    import chex

    chex.assert_trees_all_close(jax.device_get(g_on), jax.device_get(g_off),
                                rtol=1e-5, atol=1e-7)
    chex.assert_trees_all_close(jax.device_get(g_on), jax.device_get(g_pol),
                                rtol=1e-5, atol=1e-7)


def test_optimizer_masks():
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.train.optim import NO_DECAY_TEXT, decay_mask, trainable_mask

    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]

    dm = decay_mask(params, NO_DECAY_TEXT)
    assert dm["shared"]["embedding"] is True
    assert dm["decoder"]["rating_embeddings"] is True
    assert dm["decoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"] is True
    assert dm["decoder"]["layers_0"]["self_attn"]["q_proj"]["bias"] is False
    assert dm["decoder"]["layers_0"]["self_attn_layer_norm"]["scale"] is False
    assert dm["encoder"]["layernorm_embedding"]["scale"] is False
    assert dm["encoder"]["layernorm_embedding"]["bias"] is False

    tm = trainable_mask(params, None)
    assert tm["final_logits_bias"] is False
    assert tm["decoder"]["layers_0"]["fc1"]["kernel"] is True


def test_frozen_params_do_not_move():
    """img/table stages train only their encoder — the BART weights and the
    final_logits_bias must be bit-identical after a step."""
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.train.loop import TrainState, make_train_step
    from multimodalsum_tpu.train.optim import NO_DECAY_TABLE, make_optimizer
    from multimodalsum_tpu.train.stages import enc_conditional_loss

    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    # freeze everything except the decoder (enc_conditional_loss consumes
    # precomputed hiddens, so only the decoder + embeddings get gradients)
    tx = make_optimizer(
        params, learning_rate=1e-3, total_steps=10, warmup_ratio=0.0,
        no_decay=NO_DECAY_TABLE, trainable=lambda n: n.startswith("decoder/layers"),
    )
    rng = np.random.default_rng(0)
    hiddens = rng.normal(size=(2, 1, 6, cfg.d_model)).astype(np.float32)
    mask = np.ones((2, 1, 6), bool)
    labels = rng.integers(3, cfg.vocab_size, (2, 8))

    def loss_fn(p, batch, r):
        return enc_conditional_loss(model, p, batch["h"], batch["m"], batch["labels"], rng=r)

    step = make_train_step(loss_fn, tx)
    state = TrainState.create(params, tx)
    state2, loss = jax.jit(step)(state, dict(h=hiddens, m=mask, labels=labels),
                                 jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # frozen leaves identical (shared embedding IS in the graph via lm head),
    # trainable decoder leaves changed
    assert np.array_equal(np.asarray(state2.params["shared"]["embedding"]),
                          np.asarray(params["shared"]["embedding"]))
    assert np.array_equal(np.asarray(state2.params["final_logits_bias"]),
                          np.asarray(params["final_logits_bias"]))
    assert not np.array_equal(
        np.asarray(state2.params["decoder"]["layers_0"]["fc1"]["kernel"]),
        np.asarray(params["decoder"]["layers_0"]["fc1"]["kernel"]),
    )


def test_data_parallel_step_8_devices():
    """One text-pretrain step over the virtual 8-device mesh: batch sharded on
    'data', params replicated, loss identical to the single-device run."""
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
    from multimodalsum_tpu.train.loop import TrainState, make_train_step
    from multimodalsum_tpu.train.optim import NO_DECAY_TEXT, make_optimizer
    from multimodalsum_tpu.train.stages import text_pretrain_loss

    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh()

    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    tx = make_optimizer(params, learning_rate=1e-4, total_steps=10,
                        no_decay=NO_DECAY_TEXT, max_grad_norm=1.0)

    rng = np.random.default_rng(3)
    reviews, mask, rating = _batch(rng, cfg, bsz=8, ents=3, seq=10)
    batch = dict(reviews=reviews, reviews_mask=mask, reviews_rating=rating)

    def loss_fn(p, b, r):
        return text_pretrain_loss(model, p, b, label_smoothing=0.1, rng=r)

    step = make_train_step(loss_fn, tx)
    state = TrainState.create(params, tx)

    r = replicated(mesh)
    b = batch_sharding(mesh)
    jit_step = jax.jit(step, in_shardings=(r, b, r), out_shardings=(r, r))
    state_sharded = jax.device_put(state, r)
    state2, loss8 = jit_step(state_sharded, shard_batch(batch, mesh), jax.random.PRNGKey(5))
    assert np.isfinite(float(loss8))

    # single-device ground truth
    state1, loss1 = jax.jit(step)(state, batch, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(
        jax.device_get(state2.params), jax.device_get(state1.params), rtol=2e-5, atol=2e-6
    )
