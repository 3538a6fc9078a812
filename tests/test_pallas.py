"""Pallas entity-attention kernel vs the XLA path (interpreter mode on CPU)."""

import numpy as np
import pytest


def test_pallas_entity_attention_matches_xla():
    from multimodalsum_tpu.ops.attention import entity_cross_attention
    from multimodalsum_tpu.ops.pallas_attention import entity_cross_attention_pallas

    rng = np.random.default_rng(0)
    b, t, n, h = 2, 8, 4, 16
    e, s = 3, 24
    q = rng.normal(size=(b, t, n, h)).astype(np.float32)
    k = rng.normal(size=(b, e, s, n, h)).astype(np.float32)
    v = rng.normal(size=(b, e, s, n, h)).astype(np.float32)
    mask = np.ones((b, e, s), bool)
    mask[0, 2] = False          # null entity
    mask[1, 1, 10:] = False     # partial padding

    want = np.asarray(entity_cross_attention(q, k, v, mask))
    got = np.asarray(entity_cross_attention_pallas(q, k, v, mask, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_pallas_all_null_batch_guard():
    from multimodalsum_tpu.ops.pallas_attention import entity_cross_attention_pallas

    rng = np.random.default_rng(1)
    b, t, n, h, e, s = 1, 4, 2, 8, 2, 8
    q = rng.normal(size=(b, t, n, h)).astype(np.float32)
    k = rng.normal(size=(b, e, s, n, h)).astype(np.float32)
    v = rng.normal(size=(b, e, s, n, h)).astype(np.float32)
    mask = np.zeros((b, e, s), bool)
    out = np.asarray(entity_cross_attention_pallas(q, k, v, mask, interpret=True))
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_dispatch_switch():
    from multimodalsum_tpu.ops import attention as A

    assert A.entity_attention_impl() == "xla"
    A.set_entity_attention_impl("pallas")
    try:
        assert A.entity_attention_impl() == "pallas"
    finally:
        A.set_entity_attention_impl("xla")
