"""Reorder-free ancestry decode attention: op-level and engine-level parity."""

import numpy as np
import pytest


def _random_valid_ancestry(rng, batch, beams, L, upto):
    """Ancestry produced by a plausible selection history: for positions
    <= upto, each row points at some row within its batch group; beyond upto,
    identity (never read)."""
    rows = batch * beams
    anc = np.broadcast_to(np.arange(rows, dtype=np.int32)[:, None], (rows, L)).copy()
    for p in range(upto):
        for b in range(batch):
            for k in range(beams):
                anc[b * beams + k, p] = b * beams + rng.integers(0, beams)
    return anc


def test_ancestry_xla_matches_explicit_gather():
    import jax.numpy as jnp

    from multimodalsum_tpu.ops.ancestry_attention import ancestry_attention_xla
    from multimodalsum_tpu.ops.attention import cached_self_attention_step

    rng = np.random.default_rng(0)
    rows, L, n, h = 6, 10, 4, 8
    index = 7
    q = rng.normal(size=(rows, 1, n, h)).astype(np.float32)
    k_cache = rng.normal(size=(rows, L, n, h)).astype(np.float32)
    v_cache = rng.normal(size=(rows, L, n, h)).astype(np.float32)
    anc = _random_valid_ancestry(rng, 2, 3, L, index + 1)

    got = np.asarray(ancestry_attention_xla(q, k_cache, v_cache, anc, index))

    # ground truth: explicitly gather the cache, then plain cached attention
    k_g = k_cache[anc, np.arange(L)[None, :]]  # [rows, L, n, h]
    v_g = v_cache[anc, np.arange(L)[None, :]]
    want = np.asarray(cached_self_attention_step(q, k_g, v_g, index))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # block-local gather (num_beams static) must agree with the global form
    local = np.asarray(ancestry_attention_xla(q, k_cache, v_cache, anc, index,
                                              num_beams=3))
    np.testing.assert_allclose(local, want, atol=1e-5, rtol=1e-5)

    # quantized block-local vs quantized global
    import jax.numpy as jnp

    from multimodalsum_tpu.ops.ancestry_attention import ancestry_attention_xla_quantized
    from multimodalsum_tpu.ops.quantization import quantize_int8

    kq = quantize_int8(jnp.asarray(k_cache), axis=-1)
    vq = quantize_int8(jnp.asarray(v_cache), axis=-1)
    qg = np.asarray(ancestry_attention_xla_quantized(q, kq, vq, anc, index))
    ql = np.asarray(ancestry_attention_xla_quantized(q, kq, vq, anc, index,
                                                     num_beams=3))
    np.testing.assert_allclose(ql, qg, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(qg, want, atol=8e-2, rtol=5e-2)  # int8 grid


def test_ancestry_pallas_matches_xla_interpret():
    from multimodalsum_tpu.ops.ancestry_attention import (
        ancestry_attention_pallas,
        ancestry_attention_xla,
    )

    rng = np.random.default_rng(1)
    rows, L, n, h = 6, 12, 4, 16
    index = 9
    q = rng.normal(size=(rows, 1, n, h)).astype(np.float32)
    k_cache = rng.normal(size=(rows, L, n, h)).astype(np.float32)
    v_cache = rng.normal(size=(rows, L, n, h)).astype(np.float32)
    anc = _random_valid_ancestry(rng, 2, 3, L, index + 1)

    want = np.asarray(ancestry_attention_xla(q, k_cache, v_cache, anc, index))
    got = np.asarray(ancestry_attention_pallas(q, k_cache, v_cache, anc, index,
                                               interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_ancestry_pallas_row_block_tiling():
    """Multi-row-block grid must equal the single-block result."""
    from multimodalsum_tpu.ops.ancestry_attention import (
        ancestry_attention_pallas,
        ancestry_attention_xla,
    )

    rng = np.random.default_rng(3)
    rows, L, n, h = 8, 10, 2, 16
    index = 7
    q = rng.normal(size=(rows, 1, n, h)).astype(np.float32)
    k_cache = rng.normal(size=(rows, L, n, h)).astype(np.float32)
    v_cache = rng.normal(size=(rows, L, n, h)).astype(np.float32)
    anc = _random_valid_ancestry(rng, 2, 4, L, index + 1)

    want = np.asarray(ancestry_attention_xla(q, k_cache, v_cache, anc, index))
    got = np.asarray(ancestry_attention_pallas(q, k_cache, v_cache, anc, index,
                                               interpret=True, row_block=4))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_update_ancestry_semantics():
    import jax.numpy as jnp

    from multimodalsum_tpu.ops.ancestry_attention import init_ancestry, update_ancestry

    anc = init_ancestry(4, 6)
    np.testing.assert_array_equal(np.asarray(anc)[:, 0], [0, 1, 2, 3])
    # rows 0,1 continue row 1; rows 2,3 continue row 2
    flat_idx = jnp.asarray([1, 1, 2, 2])
    anc2 = np.asarray(update_ancestry(anc, flat_idx, 3))
    np.testing.assert_array_equal(anc2[:, 0], [1, 1, 2, 2])  # inherited
    np.testing.assert_array_equal(anc2[:, 3], [0, 1, 2, 3])  # next write slot = own


def test_engine_ancestry_mode_matches_reorder():
    """Full beam search: cache_mode='ancestry' must produce token-identical
    output to the default reorder mode."""
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg, GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.models.bart import BartModel

    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    rng = np.random.default_rng(2)
    eh = rng.normal(size=(2, 3, 8, cfg.d_model)).astype(np.float32)
    mask = np.ones((2, 3, 8), bool)
    mask[0, 2, 5:] = False
    rating = np.zeros((2, 1), np.float32)
    gen = GenerationConfig(num_beams=3, max_length=14, min_length=3,
                           length_penalty=2.0, early_stopping=True,
                           no_repeat_ngram_size=3)

    base = generate(model, params, [eh], [mask], rating, gen)
    anc = generate(model, params, [eh], [mask], rating, gen, cache_mode="ancestry")
    np.testing.assert_array_equal(np.asarray(anc.sequences), np.asarray(base.sequences))
    np.testing.assert_allclose(np.asarray(anc.scores), np.asarray(base.scores),
                               atol=1e-5, rtol=1e-5)
