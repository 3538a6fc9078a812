"""Generation parity: device-side beam/greedy engines vs the reference loops."""

import numpy as np
import pytest

from reference_oracle import make_enc_model, require_reference, tiny_jax_config

pytestmark = pytest.mark.usefixtures("torch_mod")


@pytest.fixture(scope="module")
def torch_mod():
    require_reference()
    import torch

    return torch


@pytest.fixture(scope="module")
def setup(torch_mod):
    torch = torch_mod
    cfg = tiny_jax_config()
    ref = make_enc_model(seed=11)
    rng = np.random.default_rng(12)
    bsz, ents, src = 3, 4, 8
    eh = torch.from_numpy(rng.normal(size=(bsz, ents, src, cfg.d_model)).astype(np.float32))
    mask = torch.ones(bsz, ents, src, dtype=torch.long)
    mask[0, 3, :] = 0
    mask[1, 1, 5:] = 0
    rating = torch.zeros(bsz, 1)

    from multimodalsum_tpu.ckpt.convert import bart_params_from_torch
    from multimodalsum_tpu.models.bart import BartModel

    model = BartModel(cfg)
    params = bart_params_from_torch(ref.state_dict(), cfg)
    return dict(cfg=cfg, ref=ref, eh=eh, mask=mask, rating=rating, model=model, params=params)


def _run_mine(setup, gen):
    from multimodalsum_tpu.decode.engine import generate

    return generate(
        setup["model"], setup["params"],
        [setup["eh"].numpy()], [setup["mask"].numpy().astype(bool)],
        setup["rating"].numpy(), gen,
    )


def _compare(ref_out, seqs, lengths, pad_id, eos_id=2):
    """Token-level equality, modulo one reference quirk: when every best
    hypothesis has equal length the reference skips appending the trailing
    EOS (modeling_multimodalsum.py:2118-2124); this framework always appends
    it when it fits. Decoded text is identical."""
    ref_out = ref_out.numpy()
    seqs = np.asarray(seqs)
    lengths = np.asarray(lengths)
    for b in range(ref_out.shape[0]):
        ref_row = ref_out[b]
        ref_toks = ref_row[ref_row != pad_id] if (ref_row == pad_id).any() else ref_row
        mine = seqs[b, : lengths[b]]
        if len(mine) == len(ref_toks) + 1 and mine[-1] == eos_id:
            mine = mine[:-1]
        np.testing.assert_array_equal(mine, ref_toks, err_msg=f"row {b}")
        assert (seqs[b, lengths[b]:] == pad_id).all()


@pytest.mark.parametrize(
    "kw",
    [
        dict(num_beams=2, max_length=12, min_length=3, length_penalty=2.0,
             early_stopping=True, no_repeat_ngram_size=3),
        dict(num_beams=4, max_length=16, min_length=5, length_penalty=1.0,
             early_stopping=False, no_repeat_ngram_size=2),
        dict(num_beams=3, max_length=20, min_length=0, length_penalty=0.8,
             early_stopping=True, no_repeat_ngram_size=0, repetition_penalty=1.3),
    ],
)
def test_beam_search_parity(setup, kw):
    import torch

    from multimodalsum_tpu.core.config import GenerationConfig

    with torch.no_grad():
        ref_out = setup["ref"].generate(
            setup["eh"], setup["mask"], rating_diff=setup["rating"], **kw
        )
    gen = GenerationConfig(do_sample=False, num_return_sequences=1, **kw)
    res = _run_mine(setup, gen)
    _compare(ref_out, res.sequences[:, 0], res.lengths[:, 0], setup["cfg"].pad_token_id)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_beam_parity_model_sweep(torch_mod, seed):
    """Beam parity across independently-seeded models (diversity beats depth
    for catching tie-handling / bookkeeping divergences)."""
    import torch

    from multimodalsum_tpu.ckpt.convert import bart_params_from_torch
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.models.bart import BartModel

    cfg = tiny_jax_config()
    ref = make_enc_model(seed=seed)
    rng = np.random.default_rng(seed)
    bsz, ents, src = 2, 3, 7
    eh = torch.from_numpy(rng.normal(size=(bsz, ents, src, cfg.d_model)).astype(np.float32))
    mask = torch.ones(bsz, ents, src, dtype=torch.long)
    mask[0, 1, 3:] = 0
    rating = torch.zeros(bsz, 1)
    kw = dict(num_beams=4, max_length=15, min_length=3, length_penalty=2.0,
              early_stopping=True, no_repeat_ngram_size=3)

    with torch.no_grad():
        ref_out = ref.generate(eh, mask, rating_diff=rating, **kw)

    model = BartModel(cfg)
    params = bart_params_from_torch(ref.state_dict(), cfg)
    res = generate(model, params, [eh.numpy()], [mask.numpy().astype(bool)],
                   rating.numpy(), GenerationConfig(do_sample=False, **kw))
    _compare(ref_out, res.sequences[:, 0], res.lengths[:, 0], cfg.pad_token_id)


def test_beam_multi_return_parity(setup):
    """num_return_sequences > 1 with beams: the top-R finished hypotheses
    per batch element, in score order (reference output [b*R, L])."""
    import torch

    from multimodalsum_tpu.core.config import GenerationConfig

    kw = dict(num_beams=4, max_length=14, min_length=3, length_penalty=1.0,
              early_stopping=False, no_repeat_ngram_size=2)
    R = 2
    with torch.no_grad():
        ref_out = setup["ref"].generate(
            setup["eh"], setup["mask"], rating_diff=setup["rating"],
            num_return_sequences=R, **kw)
    gen = GenerationConfig(do_sample=False, num_return_sequences=R, **kw)
    res = _run_mine(setup, gen)
    bsz = setup["eh"].shape[0]
    assert res.sequences.shape[1] == R
    ref_rows = ref_out.view(bsz, R, -1)
    for r in range(R):
        _compare(ref_rows[:, r], res.sequences[:, r], res.lengths[:, r],
                 setup["cfg"].pad_token_id)


def test_greedy_parity(setup):
    import torch

    from multimodalsum_tpu.core.config import GenerationConfig

    kw = dict(max_length=14, min_length=4, no_repeat_ngram_size=3)
    with torch.no_grad():
        ref_ids, ref_probs = setup["ref"].generate(
            setup["eh"], setup["mask"], rating_diff=setup["rating"],
            num_beams=1, do_sample=False, store_next_prob=True, **kw,
        )
    gen = GenerationConfig(num_beams=1, do_sample=False, length_penalty=1.0,
                           early_stopping=False, **kw)
    res = _run_mine(setup, gen)
    _compare(ref_ids, res.sequences, res.lengths, setup["cfg"].pad_token_id)
    # chosen-token probabilities per step (reference next_prob_list)
    mine_probs = np.asarray(res.next_probs)
    ref_p = ref_probs.numpy()
    steps = ref_p.shape[1]
    np.testing.assert_allclose(mine_probs[:, :steps], ref_p, atol=1e-4, rtol=1e-3)
