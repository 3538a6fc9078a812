"""Beam-search parity for the MULTIMODAL generate path (three modality
bundles, gate zeroing, unexpanded-KV beam folding) vs the reference
``BartForMultiEncConditionalGeneration.generate`` (``:2295-3067``)."""

import numpy as np
import pytest

from reference_oracle import make_multienc_model, require_reference, tiny_jax_config


@pytest.fixture(scope="module")
def torch_mod():
    require_reference()
    import torch

    return torch


@pytest.fixture(scope="module")
def setup(torch_mod):
    torch = torch_mod
    cfg = tiny_jax_config()
    ref = make_multienc_model(seed=51)
    rng = np.random.default_rng(52)
    bsz, d = 3, cfg.d_model
    text_h = torch.from_numpy(rng.normal(size=(bsz, 4, 8, d)).astype(np.float32))
    text_m = torch.ones(bsz, 4, 8, dtype=torch.long)
    text_m[0, 3, :] = 0
    table_h = torch.from_numpy(rng.normal(size=(bsz, 1, 6, d)).astype(np.float32))
    table_m = torch.ones(bsz, 1, 6, dtype=torch.long)
    table_m[1] = 0   # no table -> alpha gate zeroed
    img_h = torch.from_numpy(rng.normal(size=(bsz, 2, 5, d)).astype(np.float32))
    img_m = torch.ones(bsz, 2, 5, dtype=torch.long)
    img_m[2] = 0     # no image -> beta gate zeroed
    rating = torch.zeros(bsz, 1)

    from multimodalsum_tpu.ckpt.convert import bart_params_from_torch
    from multimodalsum_tpu.models.bart import BartModel

    model = BartModel(cfg, multimodal=True)
    params = bart_params_from_torch(ref.state_dict(), cfg, multimodal=True)
    return dict(cfg=cfg, ref=ref, model=model, params=params,
                text=(text_h, text_m), table=(table_h, table_m),
                img=(img_h, img_m), rating=rating)


@pytest.mark.parametrize(
    "kw",
    [
        dict(num_beams=5, max_length=14, min_length=4, length_penalty=2.0,
             early_stopping=True, no_repeat_ngram_size=3),
        dict(num_beams=2, max_length=18, min_length=2, length_penalty=1.0,
             early_stopping=False, no_repeat_ngram_size=2,
             repetition_penalty=1.2),
    ],
)
def test_multimodal_beam_parity(setup, kw):
    import torch

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate

    (text_h, text_m), (table_h, table_m), (img_h, img_m) = (
        setup["text"], setup["table"], setup["img"])
    with torch.no_grad():
        ref_out = setup["ref"].generate(
            text_h, text_m, table_h, table_m, img_h, img_m,
            rating_diff=setup["rating"], **kw,
        )

    gen = GenerationConfig(do_sample=False, num_return_sequences=1, **kw)
    res = generate(
        setup["model"], setup["params"],
        [text_h.numpy(), table_h.numpy(), img_h.numpy()],
        [text_m.numpy().astype(bool), table_m.numpy().astype(bool),
         img_m.numpy().astype(bool)],
        setup["rating"].numpy(), gen,
    )
    from test_parity_generate import _compare

    _compare(ref_out, res.sequences[:, 0], res.lengths[:, 0],
             setup["cfg"].pad_token_id)


def test_multimodal_beam_parity_ancestry(setup):
    """Ancestry cache mode must match the reference too (full oracle chain)."""
    import torch

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate

    kw = dict(num_beams=3, max_length=12, min_length=3, length_penalty=2.0,
              early_stopping=True, no_repeat_ngram_size=3)
    (text_h, text_m), (table_h, table_m), (img_h, img_m) = (
        setup["text"], setup["table"], setup["img"])
    with torch.no_grad():
        ref_out = setup["ref"].generate(
            text_h, text_m, table_h, table_m, img_h, img_m,
            rating_diff=setup["rating"], **kw,
        )
    gen = GenerationConfig(do_sample=False, num_return_sequences=1, **kw)
    res = generate(
        setup["model"], setup["params"],
        [text_h.numpy(), table_h.numpy(), img_h.numpy()],
        [text_m.numpy().astype(bool), table_m.numpy().astype(bool),
         img_m.numpy().astype(bool)],
        setup["rating"].numpy(), gen, cache_mode="ancestry",
    )
    from test_parity_generate import _compare

    _compare(ref_out, res.sequences[:, 0], res.lengths[:, 0],
             setup["cfg"].pad_token_id)
