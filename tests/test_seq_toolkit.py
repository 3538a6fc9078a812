"""Seq toolkit tests: GRU encoder, pointer-generator, scripted Beamer decode
(the reference mlmo ``test_beam_decoder`` pattern: deterministic fake
decoding functions with asserted exact outputs)."""

import numpy as np
import pytest


def test_gru_encoder_masking():
    import jax

    from multimodalsum_tpu.toolkit.seq import GruEncoder

    rng = np.random.default_rng(0)
    b, t, d, h = 2, 6, 8, 12
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    mask = np.ones((b, t), np.int32)
    mask[1, 3:] = 0

    enc = GruEncoder(hidden_size=h)
    params = enc.init(jax.random.PRNGKey(0), x, mask)["params"]
    outs, final = enc.apply({"params": params}, x, mask)
    assert outs.shape == (b, t, h) and final.shape == (b, h)
    # padded positions emit zeros; final state equals the last valid output
    assert np.allclose(np.asarray(outs)[1, 3:], 0.0)
    np.testing.assert_allclose(np.asarray(final)[1], np.asarray(outs)[1, 2], rtol=1e-6)

    # final state must be independent of pad content
    x2 = x.copy()
    x2[1, 3:] = 99.0
    _, final2 = enc.apply({"params": params}, x2, mask)
    np.testing.assert_allclose(np.asarray(final2), np.asarray(final), rtol=1e-6)


def test_pointer_generator_distribution():
    import jax

    from multimodalsum_tpu.toolkit.seq import GruPointerDecoder

    rng = np.random.default_rng(1)
    b, s, h, V = 2, 5, 16, 30
    dec = GruPointerDecoder(hidden_size=h, vocab_size=V)
    prev = rng.normal(size=(b, h)).astype(np.float32)
    state = rng.normal(size=(b, h)).astype(np.float32)
    enc_out = rng.normal(size=(b, s, h)).astype(np.float32)
    enc_ids = rng.integers(0, V, (b, s))
    mask = np.ones((b, s), np.int32)

    params = dec.init(jax.random.PRNGKey(0), prev, state, enc_out, enc_ids, mask)["params"]
    dist, new_state, attn = dec.apply({"params": params}, prev, state, enc_out,
                                      enc_ids, mask)
    dist = np.asarray(dist)
    np.testing.assert_allclose(dist.sum(-1), 1.0, rtol=1e-5)
    assert (dist >= 0).all()
    assert new_state.shape == (b, h)
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, rtol=1e-5)

    # with the copy gate forced shut (p_gen ~ 0 via huge negative bias), the
    # distribution concentrates on source tokens
    import jax.numpy as jnp

    p2 = jax.tree.map(lambda x: x, params)
    p2["copy_gate"]["bias"] = jnp.full_like(p2["copy_gate"]["bias"], -30.0)
    dist2 = np.asarray(dec.apply({"params": p2}, prev, state, enc_out, enc_ids, mask)[0])
    on_source = dist2[np.arange(b)[:, None], enc_ids].sum(-1)
    np.testing.assert_allclose(on_source, 1.0, rtol=1e-4)


def test_beamer_scripted_decode():
    """Deterministic scripted step function -> exact expected sequences
    (reference mlmo tools/test_beam_decoder.py pattern)."""
    import jax.numpy as jnp

    from multimodalsum_tpu.toolkit.seq import Beamer

    V = 6  # tokens: 0=pad, 1=start, 2=end, 3,4,5 content
    # scripted log-prob tables: at position p, given last token x, the next
    # token distribution is table[p][x]
    L = 6
    table = np.full((L, V, V), -1e9, np.float32)
    # from start: strongly prefer 3, weakly 4
    table[:, 1, 3] = np.log(0.7)
    table[:, 1, 4] = np.log(0.3)
    # after 3: go to 4
    table[:, 3, 4] = np.log(0.9)
    table[:, 3, 5] = np.log(0.1)
    # after 4: end with high prob
    table[:, 4, 2] = np.log(0.8)
    table[:, 4, 5] = np.log(0.2)
    # after 5: end
    table[:, 5, 2] = np.log(0.99)
    table[:, 5, 3] = np.log(0.01)
    # end continues as end (finished rows are padded anyway)
    table[:, 2, 2] = 0.0
    table[:, 0, 0] = 0.0
    tbl = jnp.asarray(table)

    def step_fn(tokens, index, cache):
        last = tokens[:, 0]
        return tbl[index, last], cache

    beamer = Beamer(step_fn, V, start_id=1, end_id=2, pad_id=0)
    res = beamer.decode(init_cache=(), batch_size=2, beam_size=2, max_length=L,
                        length_penalty=1.0, early_stopping=False)
    seqs = np.asarray(res.sequences)
    lengths = np.asarray(res.lengths)
    # best hypothesis: 1 3 4 2 (p = .7*.9*.8), score log(p)/3
    np.testing.assert_array_equal(seqs[0, 0, : lengths[0, 0]], [1, 3, 4, 2])
    want = np.log(0.7 * 0.9 * 0.8) / 3.0
    np.testing.assert_allclose(np.asarray(res.scores)[0, 0], want, rtol=1e-5)
    # both batch rows identical (same script)
    np.testing.assert_array_equal(seqs[0], seqs[1])


def test_beamer_num_return_and_penalty():
    import jax.numpy as jnp

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.beam_search import beam_search

    V, L = 5, 5  # 0 pad, 1 start, 2 end, 3/4 content
    table = np.full((L, V, V), -1e9, np.float32)
    table[:, 1, 3] = np.log(0.6)
    table[:, 1, 4] = np.log(0.4)
    table[:, 3, 2] = 0.0   # 3 -> end certainly
    table[:, 4, 4] = np.log(0.9)
    table[:, 4, 2] = np.log(0.1)
    tbl = jnp.asarray(table)

    def step_fn(tokens, index, cache):
        return tbl[index, tokens[:, 0]], cache

    gen = GenerationConfig(num_beams=3, num_return_sequences=2, max_length=L,
                           min_length=0, length_penalty=0.0,  # pure logprob
                           early_stopping=False, no_repeat_ngram_size=0)
    res = beam_search(step_fn, (), 1, vocab_size=V, gen=gen,
                      decoder_start_token_id=1, bos_token_id=1, pad_token_id=0,
                      eos_token_id=2, force_bos_eos=False)
    seqs = np.asarray(res.sequences)[0]
    scores = np.asarray(res.scores)[0]
    # rank 1: [1,3,2] score log(.6); rank 2: [1,4,...] paths
    np.testing.assert_array_equal(seqs[0, :3], [1, 3, 2])
    np.testing.assert_allclose(scores[0], np.log(0.6), rtol=1e-5)
    assert scores[0] >= scores[1]


def test_ffnn_and_mu_sigma_shapes():
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.toolkit.seq import Ffnn, MuSigmaFfnn

    x = jnp.ones((4, 6))
    net = Ffnn(output_dim=3, hidden_dims=(8, 5))
    p = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(p, x)
    assert out.shape == (4, 3)
    # no hidden layers: a single affine map (reference hidden_dim=None)
    lin = Ffnn(output_dim=2)
    pl = lin.init(jax.random.PRNGKey(1), x)
    assert len(jax.tree.leaves(pl)) == 2  # one kernel + one bias

    head = MuSigmaFfnn(output_dim=3, hidden_dims=(8,))
    ph = head.init(jax.random.PRNGKey(2), x)
    mu, sigma = head.apply(ph, x)
    assert mu.shape == sigma.shape == (4, 3)
    assert bool((sigma > 0).all())  # exp(log_sigma) is positive


def test_out_embds_ties_to_table_prefix():
    import jax.numpy as jnp
    import numpy as np

    from multimodalsum_tpu.toolkit.seq import out_embds

    table = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 4)))
    logits = out_embds(x, table, vocab_size=7)
    assert logits.shape == (3, 7)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(x) @ np.asarray(table[:7]).T,
                               rtol=1e-6)


def test_kl_annealing_schedules():
    import numpy as np

    from multimodalsum_tpu.toolkit.seq import kl_cyc_annealing, kl_mon_annealing

    # cyclic: 0 at step 0, ramps to max over r of each cycle, then holds at 1
    t, m, r = 100, 4, 0.5
    assert float(kl_cyc_annealing(0, t, m, r)) == 0.0
    ramp_mid = float(kl_cyc_annealing(1 + 6, t, m, r))   # tau=6/25=0.24 -> .48
    np.testing.assert_allclose(ramp_mid, 0.48, atol=1e-6)
    hold = float(kl_cyc_annealing(1 + 20, t, m, r))      # tau=0.8 > r -> 1
    assert hold == 1.0
    # cycle restart: step t/m+1 has tau=0 again
    np.testing.assert_allclose(float(kl_cyc_annealing(26, t, m, r)), 0.0,
                               atol=1e-6)
    # monotonic: linear then clamped; disabled -> 1
    np.testing.assert_allclose(float(kl_mon_annealing(5, 10)), 0.5, atol=1e-6)
    assert float(kl_mon_annealing(25, 10)) == 1.0
    assert float(kl_mon_annealing(3, 0)) == 1.0
