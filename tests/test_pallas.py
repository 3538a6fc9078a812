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


def test_pallas_fused_vjp_matches_xla_grads():
    """The custom-VJP (flash-style recompute) backward kernel must produce
    the same dq/dk/dv as autodiff through the XLA path — incl. null-entity,
    partial-padding, and all-null-batch mean semantics."""
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.ops import pallas_attention as pa
    from multimodalsum_tpu.ops.attention import entity_cross_attention

    rng = np.random.default_rng(3)
    b, t, n, h = 2, 8, 2, 16
    e, s = 3, 16
    q = jnp.asarray(rng.normal(size=(b, t, n, h)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, e, s, n, h)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, e, s, n, h)), jnp.float32)
    mask = np.ones((b, e, s), bool)
    mask[0, 1] = False          # null entity
    mask[1, 2, 5:] = False      # partial padding
    mask = jnp.asarray(mask)

    # interpret-mode clone of entity_cross_attention_fused (the production
    # custom_vjp compiles the kernels; CPU tests run them interpreted)
    fused = jax.custom_vjp(
        lambda q, k, v, m: pa.entity_cross_attention_pallas(q, k, v, m,
                                                            interpret=True))
    fused.defvjp(
        lambda q, k, v, m: (pa.entity_cross_attention_pallas(
            q, k, v, m, interpret=True), (q, k, v, m)),
        lambda res, g: (*pa._entity_attention_bwd_pallas(*res, g,
                                                         interpret=True),
                        np.zeros(res[3].shape, dtype=jax.dtypes.float0)))

    def loss_x(q, k, v):
        return jnp.sum(entity_cross_attention(q, k, v, mask) ** 2)

    def loss_p(q, k, v):
        return jnp.sum(fused(q, k, v, mask) ** 2)

    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("qkv", gx, gp):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   atol=2e-5, rtol=2e-5, err_msg=f"d{name}")

    # all-null batch element: zero output and zero dq for that element
    m0 = np.ones((b, e, s), bool)
    m0[0] = False
    m0 = jnp.asarray(m0)
    out0 = pa.entity_cross_attention_pallas(q, k, v, m0, interpret=True)
    np.testing.assert_allclose(np.asarray(out0[0]), 0.0, atol=1e-7)
    dq0 = jax.grad(lambda q: jnp.sum(fused(q, k, v, m0) ** 2))(q)
    np.testing.assert_allclose(np.asarray(dq0[0]), 0.0, atol=1e-7)


def test_pallas_decode_q8_matches_quantized_xla():
    """Fused int8 decode kernel vs entity_cross_attention_quantized
    (interpret mode), incl. null entity / partial padding / all-null batch."""
    import jax.numpy as jnp

    from multimodalsum_tpu.ops.attention import entity_cross_attention_quantized
    from multimodalsum_tpu.ops.pallas_attention import decode_cross_attention_pallas_q8
    from multimodalsum_tpu.ops.quantization import quantize_int8, to_kernel_layout

    rng = np.random.default_rng(2)
    b, T, n, h = 3, 5, 4, 16
    e, s = 3, 24
    q = jnp.asarray(rng.normal(size=(b, T, n, h)).astype(np.float32))
    k = rng.normal(size=(b, e, s, n, h)).astype(np.float32)
    v = rng.normal(size=(b, e, s, n, h)).astype(np.float32)
    mask = np.ones((b, e, s), bool)
    mask[0, 2] = False          # null entity
    mask[1, 1, 10:] = False     # partial padding
    mask[2] = False             # all-null batch element
    mask = jnp.asarray(mask)

    kq = quantize_int8(jnp.asarray(k), axis=2)
    vq = quantize_int8(jnp.asarray(v), axis=2)
    want = np.asarray(entity_cross_attention_quantized(q, kq, vq, mask))
    kk, vk = to_kernel_layout(kq), to_kernel_layout(vq)
    got = np.asarray(decode_cross_attention_pallas_q8(
        q, kk.values, vk.values, kk.scale, vk.scale, mask, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    assert np.abs(got[2]).max() == 0.0


def test_pallas_decode_q8_via_generate():
    """generate(kv_quant=\"int8_kernel\") decodes like kv_quant=\"int8\"
    (interpret-mode kernels on CPU are exercised through the engine)."""
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg, GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.ops import pallas_attention as P

    # route the kernel through interpret mode on CPU
    orig = P.decode_cross_attention_pallas_q8
    P.decode_cross_attention_pallas_q8 = lambda *a, **kw: orig(*a, interpret=True, **kw)
    try:
        model = BartModel(cfg)
        params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
        rng = np.random.default_rng(4)
        eh = (rng.normal(size=(2, 3, 8, cfg.d_model)) * 2.0).astype(np.float32)
        mask = np.ones((2, 3, 8), bool)
        rating = np.zeros((2, 1), np.float32)
        gen = GenerationConfig(num_beams=2, max_length=10, min_length=2,
                               length_penalty=1.0, early_stopping=True,
                               no_repeat_ngram_size=0)
        ref = generate(model, params, [eh], [mask], rating, gen, kv_quant="int8")
        got = generate(model, params, [eh], [mask], rating, gen,
                       kv_quant="int8_kernel")
        np.testing.assert_array_equal(np.asarray(got.sequences),
                                      np.asarray(ref.sequences))
        np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores),
                                   atol=1e-4)
    finally:
        P.decode_cross_attention_pallas_q8 = orig


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
