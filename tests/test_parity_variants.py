"""Parity for non-default config variants: relu activation, pre-LN
(normalize_before) with the mbart-style encoder layer_norm, and the decoder
add_final_layer_norm — exercising every config knob against the oracle."""

import numpy as np
import pytest

from reference_oracle import require_reference, tiny_jax_config


@pytest.fixture(scope="module")
def torch_mod():
    require_reference()
    import torch

    return torch


def test_mbart_style_variant_parity(torch_mod):
    torch = torch_mod
    from transformer.configuration_bart import BartConfig as TorchBartConfig
    from transformer.modeling_multimodalsum import BartForEncConditionalGeneration

    from multimodalsum_tpu.ckpt.convert import bart_params_from_torch
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.ops.masks import padding_mask, shift_tokens_right

    base = tiny_jax_config()
    variant = dict(
        activation_function="relu",
        normalize_before=True,
        add_final_layer_norm=True,
        normalize_embedding=True,
    )
    tcfg = TorchBartConfig(
        vocab_size=base.vocab_size, d_model=base.d_model,
        encoder_layers=base.encoder_layers, decoder_layers=base.decoder_layers,
        encoder_attention_heads=base.encoder_attention_heads,
        decoder_attention_heads=base.decoder_attention_heads,
        encoder_ffn_dim=base.encoder_ffn_dim, decoder_ffn_dim=base.decoder_ffn_dim,
        max_position_embeddings=base.max_position_embeddings,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        decoder_start_token_id=2, **variant,
    )
    torch.manual_seed(77)
    ref = BartForEncConditionalGeneration(tcfg)
    ref.eval()

    cfg = base.replace(**variant)
    model = BartModel(cfg)
    params = bart_params_from_torch(ref.state_dict(), cfg)  # maps variant norms too

    rng = np.random.default_rng(78)
    bsz, ents, src, tgt = 2, 3, 8, 9
    eh = torch.from_numpy(rng.normal(size=(bsz, ents, src, cfg.d_model)).astype(np.float32))
    mask = torch.ones(bsz, ents, src, dtype=torch.long)
    mask[1, 2, 4:] = 0
    labels = torch.from_numpy(rng.integers(3, cfg.vocab_size, (bsz, tgt))).long()
    labels[:, -1] = cfg.eos_token_id
    rating = torch.from_numpy(rng.normal(size=(bsz, 1)).astype(np.float32))

    with torch.no_grad():
        want = ref(eh, rating, mask, labels=labels)[0].numpy()

    dec_in = shift_tokens_right(labels.numpy(), cfg.pad_token_id, cfg.bos_token_id,
                                cfg.eos_token_id)
    got = model.apply(
        {"params": params}, dec_in, [(eh.numpy(), mask.numpy().astype(bool))],
        rating.numpy(), padding_mask(dec_in, cfg.pad_token_id),
        method=BartModel.decode_train,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=3e-4)
