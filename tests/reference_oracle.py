"""Helpers to instantiate the PyTorch reference as a parity oracle.

The reference repo is mounted read-only at /root/reference; importing its
modules executes them unmodified on CPU torch, giving golden activations for
free. Tests that use this module must call :func:`require_reference` first,
which skips when the reference (or torch) is unavailable.
"""

from __future__ import annotations

import pytest

from conftest import add_reference_to_path, reference_available

_TINY_KW = dict(
    vocab_size=128,
    d_model=32,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=64,
    decoder_ffn_dim=64,
    max_position_embeddings=64,
    dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    decoder_start_token_id=2,  # production bart-large value (cfg/bart-large.json)
)


def require_reference():
    if not reference_available():
        pytest.skip("reference repo not available")
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch not available")
    add_reference_to_path()


def tiny_torch_config():
    from transformer.configuration_bart import BartConfig as TorchBartConfig

    return TorchBartConfig(**_TINY_KW)


def tiny_jax_config():
    from multimodalsum_tpu.core.config import TINY_CONFIG

    return TINY_CONFIG


def make_enc_model(seed: int = 0):
    """Randomly-initialised reference BartForEncConditionalGeneration (eval mode)."""
    import torch

    from transformer.modeling_multimodalsum import BartForEncConditionalGeneration

    torch.manual_seed(seed)
    model = BartForEncConditionalGeneration(tiny_torch_config())
    model.eval()
    return model


def make_multienc_model(seed: int = 0):
    import torch

    from transformer.modeling_multimodalsum import BartForMultiEncConditionalGeneration

    torch.manual_seed(seed)
    model = BartForMultiEncConditionalGeneration(tiny_torch_config())
    model.eval()
    return model


def make_cond_model(seed: int = 0):
    import torch

    from transformer.modeling_multimodalsum import BartForConditionalGeneration

    torch.manual_seed(seed)
    model = BartForConditionalGeneration(tiny_torch_config())
    model.eval()
    return model
