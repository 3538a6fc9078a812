"""Int8/int4 cross-KV quantization: roundtrip accuracy and decode integration."""

import numpy as np
import pytest


def test_quantize_roundtrip():
    import jax.numpy as jnp

    from multimodalsum_tpu.ops.quantization import dequantize, quantize_int8

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 4, 8)).astype(np.float32) * 3.0
    q = quantize_int8(jnp.asarray(x), axis=2)
    assert q.values.dtype == jnp.int8
    back = np.asarray(dequantize(q, jnp.float32))
    err = np.abs(back - x).max() / np.abs(x).max()
    assert err < 0.02, err  # <2% of the dynamic range


def test_quantize_int4_roundtrip():
    import jax.numpy as jnp

    from multimodalsum_tpu.ops.quantization import dequantize, quantize_int4

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 4, 8)).astype(np.float32) * 3.0
    q = quantize_int4(jnp.asarray(x), axis=2)
    assert q.values.dtype == jnp.int8
    assert q.values.shape == (2, 3, 16, 4, 4)  # two nibbles per byte
    back = np.asarray(dequantize(q, jnp.float32))
    err = np.abs(back - x).max() / np.abs(x).max()
    assert err < 0.12, err  # <12% of the dynamic range (4-bit grid)
    # exact nibble reconstruction: requantizing the dequantized tensor is a fixpoint
    q2 = quantize_int4(jnp.asarray(back), axis=2)
    np.testing.assert_array_equal(np.asarray(q.values), np.asarray(q2.values))

    with pytest.raises(ValueError):
        quantize_int4(jnp.zeros((2, 4, 7)), axis=1)  # odd last axis


def test_decode_with_int8_kv():
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg, GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.models.bart import BartModel

    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    rng = np.random.default_rng(1)
    # sharpen the encoder states so logits are well-separated and the int8
    # perturbation cannot flip token decisions
    eh = (rng.normal(size=(2, 3, 8, cfg.d_model)) * 2.0).astype(np.float32)
    mask = np.ones((2, 3, 8), bool)
    rating = np.zeros((2, 1), np.float32)
    gen = GenerationConfig(num_beams=2, max_length=10, min_length=2,
                           length_penalty=1.0, early_stopping=True,
                           no_repeat_ngram_size=0)

    full = generate(model, params, [eh], [mask], rating, gen)
    quant = generate(model, params, [eh], [mask], rating, gen, kv_quant="int8")
    assert np.isfinite(np.asarray(quant.scores)).all()
    # scores land close to the full-precision run
    np.testing.assert_allclose(np.asarray(quant.scores), np.asarray(full.scores),
                               atol=0.15)

    quant4 = generate(model, params, [eh], [mask], rating, gen, kv_quant="int4")
    assert np.isfinite(np.asarray(quant4.scores)).all()
    np.testing.assert_allclose(np.asarray(quant4.scores), np.asarray(full.scores),
                               atol=0.5)

    with pytest.raises(ValueError):
        generate(model, params, [eh], [mask], rating, gen, kv_quant="int2")
