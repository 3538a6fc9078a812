"""Full-geometry parity spot-check (VERDICT r1 #3): bart-large shape
(d_model 1024, 12+12 layers, 16 heads, vocab 50265 — ``cfg/bart-large.json``)
with random seeded weights through ``ckpt/convert.bart_params_from_torch``,
against the PyTorch reference on CPU.

Scale-dependent numerics the tiny-geometry parity tests cannot see: f32
accumulation over d=1024, 50k-vocab log-softmax, 142-step KV-cache behavior.
Asserts token-exact beam-5 generation at the production eval configuration
and bounded teacher-forced logit drift.

Set ``MMSUM_SKIP_FULL_GEOMETRY=1`` to skip (the test takes a few minutes of
CPU compile+decode); it runs in-suite by default.
"""

import os

import numpy as np
import pytest

from reference_oracle import require_reference

pytestmark = pytest.mark.skipif(
    os.environ.get("MMSUM_SKIP_FULL_GEOMETRY") == "1",
    reason="full-geometry parity skipped by env")


@pytest.fixture(scope="module")
def setup():
    require_reference()
    import torch

    from multimodalsum_tpu.ckpt.convert import bart_params_from_torch
    from multimodalsum_tpu.core.config import BartConfig
    from multimodalsum_tpu.models.bart import BartModel
    from transformer.configuration_bart import BartConfig as TorchBartConfig

    cfg = BartConfig(dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    assert (cfg.d_model, cfg.encoder_layers, cfg.vocab_size) == (1024, 12, 50265)

    tcfg = TorchBartConfig.from_json_file("/root/reference/cfg/bart-large.json")
    torch.manual_seed(7)
    from transformer.modeling_multimodalsum import BartForEncConditionalGeneration

    ref = BartForEncConditionalGeneration(tcfg)
    ref.eval()

    model = BartModel(cfg)
    params = bart_params_from_torch(ref.state_dict(), cfg)

    rng = np.random.default_rng(17)
    b, e, s = 2, 8, 160  # production eval shape (src/test.py:56-60, yelp)
    # random-init hiddens scaled to LayerNormed-activation magnitude
    eh = rng.normal(size=(b, e, s, cfg.d_model)).astype(np.float32)
    mask = np.ones((b, e, s), np.int64)
    mask[0, 6:, :] = 0        # null entities
    mask[1, 2, 80:] = 0       # padded tail
    rating = np.zeros((b, 1), np.float32)
    return dict(cfg=cfg, torch=torch, ref=ref, model=model, params=params,
                eh=eh, mask=mask, rating=rating)


def test_teacher_forced_logits_drift_bounded(setup):
    """Teacher-forced logits at bart-large scale: f32 drift must stay small
    relative to the logit range (the tiny tests bound 2e-4 at d=32; deeper
    accumulation admits more, but parity means <1e-2 absolute)."""
    torch = setup["torch"]
    cfg = setup["cfg"]
    rng = np.random.default_rng(3)
    labels = rng.integers(3, cfg.vocab_size, (2, 24)).astype(np.int64)
    labels[:, -1] = cfg.eos_token_id

    with torch.no_grad():
        ref_logits = setup["ref"](
            torch.from_numpy(setup["eh"]),
            torch.from_numpy(setup["rating"]),
            torch.from_numpy(setup["mask"]),
            labels=torch.from_numpy(labels),
        )[0].numpy()

    import jax

    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.ops.masks import padding_mask, shift_tokens_right

    dec_inputs = shift_tokens_right(labels, cfg.pad_token_id,
                                    cfg.bos_token_id, cfg.eos_token_id)
    out = jax.jit(
        lambda p, d, eh, m, r, kv: setup["model"].apply(
            {"params": p}, d, [(eh, m)], r, kv, method=BartModel.decode_train)
    )(setup["params"], dec_inputs, setup["eh"],
      setup["mask"].astype(bool), setup["rating"],
      padding_mask(dec_inputs, cfg.pad_token_id))
    mine = np.asarray(out, np.float32)

    assert mine.shape == ref_logits.shape == (2, 24, cfg.vocab_size)
    drift = np.abs(mine - ref_logits).max()
    assert drift < 1e-2, f"logit drift {drift}"
    # and the next-token argmax agrees everywhere (what generation consumes)
    np.testing.assert_array_equal(mine.argmax(-1), ref_logits.argmax(-1))


def test_beam5_generation_token_exact(setup):
    """Beam-5 decode at the production eval configuration
    (num_beams 5, max_length 142, min_length 56, length_penalty 2.0,
    no_repeat_ngram 3, early_stopping — src/test.py:156-181 +
    cfg/bart-large.json task params): token-exact vs the reference loop."""
    torch = setup["torch"]
    kw = dict(num_beams=5, max_length=142, min_length=56, length_penalty=2.0,
              early_stopping=True, no_repeat_ngram_size=3)

    with torch.no_grad():
        ref_out = setup["ref"].generate(
            torch.from_numpy(setup["eh"]),
            torch.from_numpy(setup["mask"]),
            rating_diff=torch.from_numpy(setup["rating"]), **kw)

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate

    res = generate(setup["model"], setup["params"], [setup["eh"]],
                   [setup["mask"].astype(bool)], setup["rating"],
                   GenerationConfig(do_sample=False, **kw))

    from test_parity_generate import _compare

    _compare(torch.from_numpy(np.asarray(ref_out)), res.sequences[:, 0],
             res.lengths[:, 0], setup["cfg"].pad_token_id)
