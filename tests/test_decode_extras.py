"""Decode-path extras: bf16 compute dtype, prefetcher, pallas impl switch in
the full engine."""

import numpy as np
import pytest


def _setup(dtype=None):
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.bart import BartModel

    model = BartModel(cfg, dtype=dtype or jnp.float32)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    rng = np.random.default_rng(1)
    eh = rng.normal(size=(2, 3, 8, cfg.d_model)).astype(np.float32)
    mask = np.ones((2, 3, 8), bool)
    rating = np.zeros((2, 1), np.float32)
    return cfg, model, params, eh, mask, rating


def test_bf16_decode_produces_valid_sequences():
    import jax.numpy as jnp

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate

    cfg, model, params, eh, mask, rating = _setup(jnp.bfloat16)
    gen = GenerationConfig(num_beams=3, max_length=12, min_length=2,
                           length_penalty=1.0, early_stopping=True,
                           no_repeat_ngram_size=2)
    res = generate(model, params, [eh.astype(jnp.bfloat16)], [mask], rating, gen)
    seqs = np.asarray(res.sequences)
    assert seqs.shape == (2, 1, 12)
    assert (seqs[:, 0, 0] == cfg.decoder_start_token_id).all()
    assert np.isfinite(np.asarray(res.scores)).all()


def test_pallas_impl_through_engine():
    """The impl switch must produce the same beam output as XLA (interpret
    mode on CPU exercises the kernel logic end-to-end inside the engine)."""
    import jax.numpy as jnp

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.ops import attention as A
    from multimodalsum_tpu.ops import pallas_attention as PA

    cfg, model, params, eh, mask, rating = _setup()
    gen = GenerationConfig(num_beams=2, max_length=10, min_length=2,
                           length_penalty=1.0, early_stopping=True,
                           no_repeat_ngram_size=0)
    want = np.asarray(generate(model, params, [eh], [mask], rating, gen).sequences)

    # route the pallas path through the interpreter on CPU
    orig = PA.entity_cross_attention_pallas
    PA.entity_cross_attention_pallas = lambda q, k, v, m: orig(q, k, v, m, interpret=True)
    A.set_entity_attention_impl("pallas")
    try:
        got = np.asarray(generate(model, params, [eh], [mask], rating, gen).sequences)
    finally:
        A.set_entity_attention_impl("xla")
        PA.entity_cross_attention_pallas = orig
    np.testing.assert_array_equal(got, want)


def test_prefetch_to_device_order_and_content():
    from multimodalsum_tpu.data.prefetch import prefetch_to_device

    batches = [dict(x=np.full((2, 2), i)) for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 2), i))
