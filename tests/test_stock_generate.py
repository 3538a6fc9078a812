"""Stock seq2seq generate (encode-then-decode convenience).

NOTE: the reference's own ``BartForConditionalGeneration.generate`` is dead
code — it always auto-creates a 2-D attention mask which the modified
cross-attention rejects (assert at modeling_multimodalsum.py:840), so stage 0
never generates. The oracle here is therefore the Enc-class generate fed the
same encoder's output explicitly, which is definitionally what
``generate_from_input_ids`` computes."""

import numpy as np
import pytest

from reference_oracle import make_enc_model, require_reference, tiny_jax_config


@pytest.fixture(scope="module")
def torch_mod():
    require_reference()
    import torch

    return torch


def test_stock_generate_parity_via_enc_oracle(torch_mod):
    torch = torch_mod
    cfg = tiny_jax_config()
    ref = make_enc_model(seed=61)
    rng = np.random.default_rng(62)
    bsz, src = 2, 12
    input_ids = torch.from_numpy(rng.integers(3, cfg.vocab_size, (bsz, src))).long()
    mask = torch.ones(bsz, 1, src, dtype=torch.long)
    kw = dict(num_beams=3, max_length=12, min_length=3, length_penalty=2.0,
              early_stopping=True, no_repeat_ngram_size=3)

    with torch.no_grad():
        eh = ref.model.encoder(input_ids=input_ids)[0].unsqueeze(1)  # [b, 1, s, d]
        ref_out = ref.generate(eh, mask, rating_diff=torch.zeros(bsz, 1), **kw)

    from multimodalsum_tpu.ckpt.convert import bart_params_from_torch
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate_from_input_ids
    from multimodalsum_tpu.models.bart import BartModel

    model = BartModel(cfg)
    params = bart_params_from_torch(ref.state_dict(), cfg)
    res = generate_from_input_ids(
        model, params, input_ids.numpy(), None,
        GenerationConfig(do_sample=False, num_return_sequences=1, **kw),
    )
    from test_parity_generate import _compare

    _compare(ref_out, res.sequences[:, 0], res.lengths[:, 0], cfg.pad_token_id)
