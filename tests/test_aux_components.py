"""Auxiliary heads, sinusoidal positions, embedding resize, new toolkit steps,
KL annealing."""

import numpy as np
import pytest


def test_classification_and_qa_heads():
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.heads import (
        BartForQuestionAnswering,
        BartForSequenceClassification,
    )

    rng = np.random.default_rng(0)
    b, s, t = 2, 10, 6
    input_ids = rng.integers(3, cfg.vocab_size, (b, s))
    dec_ids = rng.integers(3, cfg.vocab_size, (b, t))
    dec_ids[:, -1] = cfg.eos_token_id

    clf = BartForSequenceClassification(cfg, num_classes=3)
    params = clf.init(jax.random.PRNGKey(0), input_ids, dec_ids)["params"]
    logits = clf.apply({"params": params}, input_ids, dec_ids)
    assert np.asarray(logits).shape == (b, 3)
    assert np.isfinite(np.asarray(logits)).all()

    qa = BartForQuestionAnswering(cfg)
    qparams = qa.init(jax.random.PRNGKey(1), input_ids, dec_ids)["params"]
    start, end = qa.apply({"params": qparams}, input_ids, dec_ids)
    assert np.asarray(start).shape == (b, t) and np.asarray(end).shape == (b, t)


def test_sinusoidal_positions():
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG
    from multimodalsum_tpu.models.bart import BartModel, sinusoidal_table

    tbl = np.asarray(sinusoidal_table(16, 8))
    assert tbl.shape == (16, 8)
    np.testing.assert_allclose(tbl[0, :4], 0.0, atol=1e-7)   # sin(0)
    np.testing.assert_allclose(tbl[0, 4:], 1.0, atol=1e-7)   # cos(0)

    cfg = TINY_CONFIG.replace(static_position_embeddings=True)
    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    assert "embed_positions" not in params["encoder"]
    rng = np.random.default_rng(1)
    ids = rng.integers(3, cfg.vocab_size, (2, 8))
    h = model.apply({"params": params}, ids, method=BartModel.encode)
    assert np.isfinite(np.asarray(h)).all()


def test_resize_token_embeddings():
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.models.surgery import resize_token_embeddings

    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    V, d = np.asarray(params["shared"]["embedding"]).shape

    grown = resize_token_embeddings(params, V + 10)
    assert np.asarray(grown["shared"]["embedding"]).shape == (V + 10, d)
    assert np.asarray(grown["final_logits_bias"]).shape == (V + 10,)
    np.testing.assert_array_equal(
        np.asarray(grown["shared"]["embedding"])[:V],
        np.asarray(params["shared"]["embedding"]))
    assert (np.asarray(grown["final_logits_bias"])[V:] == 0).all()

    shrunk = resize_token_embeddings(params, V - 5)
    assert np.asarray(shrunk["shared"]["embedding"]).shape == (V - 5, d)


def test_seq_wrapper_and_unit_sampler():
    from multimodalsum_tpu.toolkit.chunk import DataChunk
    from multimodalsum_tpu.toolkit.steps import SeqWrapper, UnitSampler

    c = DataChunk(toks=np.asarray([[1, 2], [3]], dtype=object))
    out = SeqWrapper(["toks"], start="<s>", end="</s>")(c)
    assert out["toks"][0] == ["<s>", 1, 2, "</s>"]
    assert out["toks"][1] == ["<s>", 3, "</s>"]

    big = DataChunk(x=np.arange(100))
    sampled = UnitSampler(10, seed=0)(big)
    assert len(sampled) == 10
    assert len(set(sampled["x"].tolist())) == 10


def test_kl_annealing_schedules():
    from multimodalsum_tpu.train.optim import kl_cyclical_annealing, kl_monotonic_annealing

    mono = kl_monotonic_annealing(10)
    np.testing.assert_allclose(float(mono(0)), 0.0)
    np.testing.assert_allclose(float(mono(5)), 0.5)
    np.testing.assert_allclose(float(mono(50)), 1.0)

    # period 25, ramp over the first half of each cycle (reference tau/r)
    cyc = kl_cyclical_annealing(100, cycles=4, ratio=0.5)
    np.testing.assert_allclose(float(cyc(0)), 0.0)
    np.testing.assert_allclose(float(cyc(6)), 0.48, rtol=1e-6)   # 6/25/0.5
    np.testing.assert_allclose(float(cyc(12)), 0.96, rtol=1e-6)  # ramp tail
    np.testing.assert_allclose(float(cyc(20)), 1.0)  # plateau
    np.testing.assert_allclose(float(cyc(25)), 0.0)  # new cycle
