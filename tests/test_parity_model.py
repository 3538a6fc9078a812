"""Activation parity of the Flax BART against the PyTorch reference.

Each test builds a randomly-initialised reference model on CPU, converts its
weights with ``ckpt/convert.py``, runs both implementations on identical
inputs, and compares logits to float32 tolerance.
"""

import numpy as np
import pytest

from reference_oracle import (
    make_cond_model,
    make_enc_model,
    make_multienc_model,
    require_reference,
    tiny_jax_config,
)

ATOL = 2e-4
RTOL = 2e-4


@pytest.fixture(scope="module")
def torch_mod():
    require_reference()
    import torch

    return torch


def _jax_model(multimodal=False):
    from multimodalsum_tpu.models.bart import BartModel

    return BartModel(tiny_jax_config(), multimodal=multimodal)


def _convert(model, multimodal=False):
    from multimodalsum_tpu.ckpt.convert import bart_params_from_torch

    return bart_params_from_torch(model.state_dict(), tiny_jax_config(), multimodal=multimodal)


def _labels(torch, rng, bsz=2, tgt=10):
    """Labels shaped like the training data: tokens then EOS then pads
    (src/data_utils.py:48-52 strips BOS/EOS from a max_length encode)."""
    cfg = tiny_jax_config()
    labels = torch.from_numpy(rng.integers(3, cfg.vocab_size, (bsz, tgt))).long()
    lengths = [tgt - 2, tgt]
    for b, L in enumerate(lengths):
        labels[b, L - 1] = cfg.eos_token_id
        labels[b, L:] = cfg.pad_token_id
    return labels


def test_shift_tokens_right_parity(torch_mod):
    torch = torch_mod
    from transformer.modeling_multimodalsum import shift_tokens_right as ref_shift

    from multimodalsum_tpu.ops.masks import shift_tokens_right

    cfg = tiny_jax_config()
    rng = np.random.default_rng(0)
    cases = []
    # case 2/1: tokens (+eos) then pads
    cases.append(_labels(torch, rng))
    # case 3/4: starting with BOS
    with_bos = _labels(torch, rng)
    with_bos[:, 0] = cfg.bos_token_id
    cases.append(with_bos)
    for labels in cases:
        ref = ref_shift(labels, cfg.pad_token_id, cfg.bos_token_id, cfg.eos_token_id)
        got = shift_tokens_right(labels.numpy(), cfg.pad_token_id, cfg.bos_token_id, cfg.eos_token_id)
        np.testing.assert_array_equal(np.asarray(got), ref.numpy())


def test_enc_conditional_generation_logits(torch_mod):
    torch = torch_mod
    cfg = tiny_jax_config()
    ref = make_enc_model(seed=0)
    rng = np.random.default_rng(1)

    bsz, ents, src, tgt = 2, 3, 8, 10
    eh = torch.from_numpy(rng.normal(size=(bsz, ents, src, cfg.d_model)).astype(np.float32))
    mask = torch.ones(bsz, ents, src, dtype=torch.long)
    mask[0, 2, :] = 0      # null entity
    mask[1, 1, 5:] = 0     # partial padding
    labels = _labels(torch, rng)
    rating_diff = torch.from_numpy(rng.normal(size=(bsz, 1)).astype(np.float32))

    with torch.no_grad():
        ref_logits = ref(eh, rating_diff, mask, labels=labels)[0].numpy()

    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.ops.masks import padding_mask, shift_tokens_right

    model = _jax_model()
    params = _convert(ref)
    dec_inputs = shift_tokens_right(labels.numpy(), cfg.pad_token_id, cfg.bos_token_id, cfg.eos_token_id)
    logits = model.apply(
        {"params": params},
        dec_inputs,
        [(eh.numpy(), mask.numpy().astype(bool))],
        rating_diff.numpy(),
        padding_mask(dec_inputs, cfg.pad_token_id),
        method=BartModel.decode_train,
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=ATOL, rtol=RTOL)


def test_multienc_logits(torch_mod):
    torch = torch_mod
    cfg = tiny_jax_config()
    ref = make_multienc_model(seed=3)
    rng = np.random.default_rng(4)

    bsz, d = 2, cfg.d_model
    text_h = torch.from_numpy(rng.normal(size=(bsz, 4, 8, d)).astype(np.float32))
    text_m = torch.ones(bsz, 4, 8, dtype=torch.long)
    text_m[0, 3, :] = 0
    table_h = torch.from_numpy(rng.normal(size=(bsz, 1, 6, d)).astype(np.float32))
    table_m = torch.ones(bsz, 1, 6, dtype=torch.long)
    table_m[1] = 0  # batch 1 has no table -> alpha gate zeroed
    img_h = torch.from_numpy(rng.normal(size=(bsz, 2, 5, d)).astype(np.float32))
    img_m = torch.ones(bsz, 2, 5, dtype=torch.long)
    img_m[0] = 0  # batch 0 has no image -> beta gate zeroed
    labels = _labels(torch, rng)
    rating_diff = torch.from_numpy(rng.normal(size=(bsz, 1)).astype(np.float32))

    with torch.no_grad():
        ref_logits = ref(
            text_h, text_m, table_h, table_m, img_h, img_m,
            rating_diff=rating_diff, labels=labels,
        )[0].numpy()

    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.ops.masks import padding_mask, shift_tokens_right

    model = _jax_model(multimodal=True)
    params = _convert(ref, multimodal=True)
    dec_inputs = shift_tokens_right(labels.numpy(), cfg.pad_token_id, cfg.bos_token_id, cfg.eos_token_id)
    modalities = [
        (text_h.numpy(), text_m.numpy().astype(bool)),
        (table_h.numpy(), table_m.numpy().astype(bool)),
        (img_h.numpy(), img_m.numpy().astype(bool)),
    ]
    logits = model.apply(
        {"params": params},
        dec_inputs,
        modalities,
        rating_diff.numpy(),
        padding_mask(dec_inputs, cfg.pad_token_id),
        method=BartModel.decode_train,
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=ATOL, rtol=RTOL)


def test_stage0_seq2seq_logits(torch_mod):
    """Stock BART path (stage 0): self-encoded inputs, no masks, no rating."""
    torch = torch_mod
    cfg = tiny_jax_config()
    ref = make_cond_model(seed=5)
    rng = np.random.default_rng(6)

    bsz, src, tgt = 2, 12, 9
    input_ids = torch.from_numpy(rng.integers(3, cfg.vocab_size, (bsz, src))).long()
    dec_inputs = torch.from_numpy(rng.integers(3, cfg.vocab_size, (bsz, tgt))).long()
    dec_inputs[:, 0] = cfg.bos_token_id

    with torch.no_grad():
        ref_logits = ref(input_ids, decoder_input_ids=dec_inputs, use_cache=False)[0].numpy()

    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.ops.masks import padding_mask

    model = _jax_model()
    params = _convert(ref)
    hiddens = model.apply({"params": params}, input_ids.numpy(), method=BartModel.encode)
    modalities = [(np.asarray(hiddens)[:, None], np.ones((bsz, 1, src), bool))]
    logits = model.apply(
        {"params": params},
        dec_inputs.numpy(),
        modalities,
        None,
        padding_mask(dec_inputs.numpy(), cfg.pad_token_id),
        method=BartModel.decode_train,
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=ATOL, rtol=RTOL)


def test_decode_step_matches_full_forward():
    """Incremental decode with KV cache must equal the teacher-forced forward."""
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.models.bart import BartModel, init_self_attn_cache

    cfg = tiny_jax_config()
    model = _jax_model()
    rng = np.random.default_rng(7)
    bsz, ents, src, tgt = 2, 3, 8, 6
    eh = rng.normal(size=(bsz, ents, src, cfg.d_model)).astype(np.float32)
    mask = np.ones((bsz, ents, src), bool)
    mask[0, 2] = False
    tokens = rng.integers(3, cfg.vocab_size, (bsz, tgt))
    rating = rng.normal(size=(bsz, 1)).astype(np.float32)

    params = model.init(
        jax.random.PRNGKey(0), tokens, [(eh, mask)], rating, None,
        method=BartModel.decode_train,
    )["params"]

    full = model.apply(
        {"params": params}, tokens, [(eh, mask)], rating, None, method=BartModel.decode_train
    )

    cross_kv = model.apply({"params": params}, [eh], method=BartModel.init_decode)
    cache = init_self_attn_cache(cfg, bsz, tgt)
    step_logits = []
    for t in range(tgt):
        logits, cache = model.apply(
            {"params": params},
            tokens[:, t : t + 1],
            jnp.int32(t),
            cache,
            cross_kv,
            [mask],
            rating,
            method=BartModel.decode_step,
        )
        step_logits.append(np.asarray(logits)[:, 0])
    np.testing.assert_allclose(
        np.stack(step_logits, axis=1), np.asarray(full), atol=1e-4, rtol=1e-4
    )
