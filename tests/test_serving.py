"""Continuous-batching serving engine: per-request outputs must be
token-identical to offline greedy generation, slots must refill mid-stream,
and sampling must be reproducible per request key."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.bart import BartModel

    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(3), method=BartModel.init_all)["params"]
    rng = np.random.default_rng(7)
    e, s = 2, 6
    reqs = []
    for i in range(5):
        h = rng.normal(size=(e, s, cfg.d_model)).astype(np.float32)
        m = np.ones((e, s), bool)
        if i % 2:
            m[1, 3:] = False
        reqs.append((f"req{i}", h, m))
    return dict(cfg=cfg, model=model, params=params, reqs=reqs, e=e, s=s)


def _offline(setup, gen, req):
    from multimodalsum_tpu.decode.engine import generate

    _, h, m = req
    res = generate(setup["model"], setup["params"], [h[None]], [m[None]],
                   np.zeros((1, 1), np.float32), gen)
    return np.asarray(res.sequences[0, : int(res.lengths[0])])


def test_continuous_batching_matches_offline_greedy(setup):
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=12,
                          min_length=2, length_penalty=1.0,
                          early_stopping=False, no_repeat_ngram_size=2)
    # 2 slots < 5 requests forces refills mid-stream
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])])
    for rid, h, m in setup["reqs"]:
        eng.submit(rid, [h], [m])
    results = eng.run()
    assert set(results) == {r[0] for r in setup["reqs"]}

    for req in setup["reqs"]:
        want = _offline(setup, gen, req)
        got = results[req[0]]
        np.testing.assert_array_equal(got, want, err_msg=req[0])


def test_serving_rejects_bad_configs_and_shapes(setup):
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    shapes = [(setup["e"], setup["s"])]
    # beam serving is greedy-beam only, non-speculative, top-1
    with pytest.raises(ValueError, match="greedy-beam"):
        ContinuousBatcher(
            setup["model"], setup["params"],
            GenerationConfig(num_beams=3, do_sample=True, max_length=8,
                             min_length=1, length_penalty=1.0,
                             early_stopping=True), 2, shapes)
    with pytest.raises(ValueError, match="single-beam"):
        ContinuousBatcher(
            setup["model"], setup["params"],
            GenerationConfig(num_beams=3, max_length=8, min_length=1,
                             length_penalty=1.0, early_stopping=True), 2,
            shapes, spec_window=4, spec_src_max=16)
    with pytest.raises(ValueError, match="num_return_sequences"):
        ContinuousBatcher(
            setup["model"], setup["params"],
            GenerationConfig(num_beams=3, max_length=8, min_length=1,
                             length_penalty=1.0, early_stopping=True,
                             num_return_sequences=2), 2, shapes)

    gen = GenerationConfig(num_beams=1, max_length=8, min_length=1,
                           length_penalty=1.0, early_stopping=False)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, 2,
                            [(setup["e"], setup["s"])])
    bad = np.zeros((setup["e"], setup["s"] + 1, setup["cfg"].d_model), np.float32)
    with pytest.raises(ValueError, match="shape"):
        eng.submit("bad", [bad], [np.ones((setup["e"], setup["s"] + 1), bool)])


def test_serving_steps_per_tick_matches_offline(setup):
    """k decode steps per host sync must not change any output — finished
    slots just idle (gated) until the tick boundary."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=12,
                          min_length=2, length_penalty=1.0,
                          early_stopping=False, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])],
                            steps_per_tick=4)
    for rid, h, m in setup["reqs"]:
        eng.submit(rid, [h], [m])
    results = eng.run()
    for req in setup["reqs"]:
        want = _offline(setup, gen, req)
        np.testing.assert_array_equal(results[req[0]], want, err_msg=req[0])


def test_serving_int8_matches_offline_int8(setup):
    """kv_quant='int8' slot slabs: per-request outputs must equal offline
    greedy generation with the same quantized cross-KV path."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=12,
                          min_length=2, length_penalty=1.0,
                          early_stopping=False, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])],
                            kv_quant="int8")
    for rid, h, m in setup["reqs"][:3]:
        eng.submit(rid, [h], [m])
    results = eng.run()

    for rid, h, m in setup["reqs"][:3]:
        res = generate(setup["model"], setup["params"], [h[None]], [m[None]],
                       np.zeros((1, 1), np.float32), gen, kv_quant="int8")
        want = np.asarray(res.sequences[0, : int(res.lengths[0])])
        np.testing.assert_array_equal(results[rid], want, err_msg=rid)


def test_serving_sampling_reproducible_per_key(setup):
    import jax

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=True, temperature=0.9,
                          top_k=20, max_length=10, min_length=1,
                          length_penalty=1.0, early_stopping=False)

    def run_once():
        eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                                modality_shapes=[(setup["e"], setup["s"])])
        for i, (rid, h, m) in enumerate(setup["reqs"][:3]):
            eng.submit(rid, [h], [m], key=jax.random.PRNGKey(100 + i))
        return eng.run()

    a, b = run_once(), run_once()
    for rid in a:
        np.testing.assert_array_equal(a[rid], b[rid], err_msg=rid)
    # and at least one request differs from the greedy output
    gen_g = gen.replace(do_sample=False)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen_g, 2,
                            [(setup["e"], setup["s"])])
    for rid, h, m in setup["reqs"][:3]:
        eng.submit(rid, [h], [m])
    greedy = eng.run()
    assert any(not np.array_equal(a[r], greedy[r]) for r in a)


def test_spec_decoding_matches_offline_greedy(setup):
    """Prompt-lookup speculative decoding must be token-identical to
    offline greedy for every request, across the acceptance spectrum:
    an ORACLE source (the request's own offline greedy output — drafts are
    the true continuation, near-full acceptance), a random source (drafts
    mostly rejected), and no source at all (pure rejection path)."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=12,
                          min_length=2, length_penalty=1.0,
                          early_stopping=False, no_repeat_ngram_size=2)
    wants = {req[0]: _offline(setup, gen, req) for req in setup["reqs"]}

    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])],
                            spec_window=4, spec_ngram=2, spec_src_max=24)
    rng = np.random.default_rng(0)
    for i, (rid, h, m) in enumerate(setup["reqs"]):
        if i == 0:
            src = None                                   # no source
        elif i == 1:
            src = rng.integers(4, setup["cfg"].vocab_size,
                               size=(20,)).astype(np.int32)  # random source
        else:
            src = wants[rid]                             # oracle source
        eng.submit(rid, [h], [m], source_tokens=src)
    results = eng.run()
    for rid, want in wants.items():
        np.testing.assert_array_equal(results[rid], want, err_msg=rid)


def test_spec_self_lookup_matches_offline_greedy(setup):
    """r5 self-lookup drafting (active only when the ngram ban allows it —
    here no_repeat_ngram_size=0) must keep outputs token-identical to
    offline greedy: the verifier owns correctness whatever the drafter
    proposes. Also pins the static gate: under the reference eval config
    (ban order 3, spec_ngram 2) self-lookup is provably inert and stays
    off."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=14,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False, no_repeat_ngram_size=0)
    wants = {req[0]: _offline(setup, gen, req) for req in setup["reqs"][:3]}
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])],
                            spec_window=4, spec_ngram=2, spec_src_max=24)
    for rid, h, m in setup["reqs"][:3]:
        eng.submit(rid, [h], [m])  # no source: only self-lookup can draft
    results = eng.run()
    for rid, want in wants.items():
        np.testing.assert_array_equal(results[rid], want, err_msg=rid)


def test_spec_decoding_oracle_saves_ticks(setup):
    """With an oracle source every draft is accepted, so a request must
    finish in far fewer engine ticks than it has tokens (that is the whole
    point of the verify window)."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=12,
                          min_length=2, length_penalty=1.0,
                          early_stopping=False, no_repeat_ngram_size=2)
    req = setup["reqs"][0]
    want = _offline(setup, gen, req)

    W = 4
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=1,
                            modality_shapes=[(setup["e"], setup["s"])],
                            spec_window=W, spec_ngram=2, spec_src_max=24)
    eng.submit(req[0], [req[1]], [req[2]], source_tokens=want)
    ticks = 0
    results = {}
    while not results and ticks < 100:
        for rid, toks, _ in eng.tick():
            results[rid] = toks
        ticks += 1
    np.testing.assert_array_equal(results[req[0]], want)
    n_generated = len(want) - 1  # minus decoder-start
    # first window has no ngram context (no draft); afterwards oracle
    # drafts commit up to W tokens per tick
    assert ticks <= 2 + (n_generated + W - 1) // W, (ticks, n_generated)


def test_spec_decoding_rejects_bad_config(setup):
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen_s = GenerationConfig(num_beams=1, do_sample=True, max_length=8,
                             min_length=1, length_penalty=1.0,
                             early_stopping=False)
    with pytest.raises(ValueError, match="greedy"):
        ContinuousBatcher(setup["model"], setup["params"], gen_s, 2,
                          [(setup["e"], setup["s"])], spec_window=4,
                          spec_src_max=16)
    gen = gen_s.replace(do_sample=False)
    with pytest.raises(ValueError, match="spec_src_max"):
        ContinuousBatcher(setup["model"], setup["params"], gen, 2,
                          [(setup["e"], setup["s"])], spec_window=4)


def test_engine_pool_matches_offline_across_devices(setup):
    """Replica-per-device pool: outputs must be token-identical to offline
    greedy, requests must spread over the replicas, and every replica's
    state must live on its own device (conftest forces an 8-CPU world)."""
    import jax

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import EnginePool

    devices = jax.local_devices()[:4]
    assert len(devices) == 4

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=12,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False, no_repeat_ngram_size=2)
    pool = EnginePool(setup["model"], setup["params"], gen, n_slots=1,
                      modality_shapes=[(setup["e"], setup["s"])],
                      devices=devices)
    assert pool.n_slots_total == 4
    for rid, h, m in setup["reqs"]:
        pool.submit(rid, [h], [m])
    # 5 requests over 4 single-slot replicas: all four fill, one refills
    loads = [len(e._queue) + len(e._slot_req) for e in pool.engines]
    assert sorted(loads) == [1, 1, 1, 2]

    results = pool.run()
    assert set(results) == {r[0] for r in setup["reqs"]}
    for req in setup["reqs"]:
        np.testing.assert_array_equal(results[req[0]], _offline(setup, gen, req),
                                      err_msg=req[0])
    for eng, dev in zip(pool.engines, devices):
        assert next(iter(jax.tree.leaves(eng.params))).devices() == {dev}
        assert eng.state.tokens.devices() == {dev}
        assert jax.tree.leaves(eng.state.cross_kv)[0].devices() == {dev}


def test_engine_pool_int8_and_sampling(setup):
    """Pool with int8 slot slabs + per-request sampling keys: reproducible
    and identical to a single pinned engine given the same keys."""
    import jax

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher, EnginePool

    devices = jax.local_devices()[:2]
    gen = GenerationConfig(num_beams=1, do_sample=True, top_k=5,
                           max_length=10, min_length=2, length_penalty=1.0,
                           early_stopping=False)
    keys = {rid: jax.random.PRNGKey(i)
            for i, (rid, _, _) in enumerate(setup["reqs"])}

    pool = EnginePool(setup["model"], setup["params"], gen, n_slots=2,
                      modality_shapes=[(setup["e"], setup["s"])],
                      devices=devices, kv_quant="int8")
    for rid, h, m in setup["reqs"]:
        pool.submit(rid, [h], [m], key=keys[rid])
    got = pool.run()

    solo = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                             modality_shapes=[(setup["e"], setup["s"])],
                             kv_quant="int8", device=devices[1])
    for rid, h, m in setup["reqs"]:
        solo.submit(rid, [h], [m], key=keys[rid])
    want = solo.run()
    assert set(got) == set(want)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid], err_msg=rid)


def test_fill_chunk_max_bounds_batched_fills(setup):
    """fill_chunk_max must cap the per-call fill batch without changing
    outputs (same greedy results as the uncapped engine)."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=10,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False, no_repeat_ngram_size=2)

    seen = []

    class Probe(ContinuousBatcher):
        def _ensure_cross_kv_slabs(self, ckv):
            import jax
            seen.append(jax.tree.leaves(ckv)[0].shape[0])
            super()._ensure_cross_kv_slabs(ckv)

    eng = Probe(setup["model"], setup["params"], gen, n_slots=4,
                modality_shapes=[(setup["e"], setup["s"])], fill_chunk_max=2)
    for rid, h, m in setup["reqs"]:
        eng.submit(rid, [h], [m])
    got = eng.run()
    assert max(seen) <= 2  # 4 free slots still filled in <=2-sized chunks

    ref = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=4,
                            modality_shapes=[(setup["e"], setup["s"])])
    for rid, h, m in setup["reqs"]:
        ref.submit(rid, [h], [m])
    want = ref.run()
    assert set(got) == set(want)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid], err_msg=rid)

    with pytest.raises(ValueError, match="fill_chunk_max"):
        ContinuousBatcher(setup["model"], setup["params"], gen, 2,
                          [(setup["e"], setup["s"])], fill_chunk_max=0)


# --------------------------------------------------------------------- beams


def _offline_beam(setup, gen, req, kv_quant=None):
    from multimodalsum_tpu.decode.engine import generate

    _, h, m = req
    res = generate(setup["model"], setup["params"], [h[None]], [m[None]],
                   np.zeros((1, 1), np.float32), gen, kv_quant=kv_quant)
    seqs = np.asarray(res.sequences).reshape(1, -1, res.sequences.shape[-1])
    lens = np.asarray(res.lengths).reshape(1, -1)
    return seqs[0, 0, : int(lens[0, 0])]


def test_beam_serving_matches_offline_beam(setup):
    """num_beams > 1 serving: each request's summary must be token-identical
    to offline beam search, including refills (2 slots < 5 requests)."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=3, do_sample=False, max_length=12,
                           min_length=2, length_penalty=1.0,
                           early_stopping=True, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])])
    for rid, h, m in setup["reqs"]:
        eng.submit(rid, [h], [m])
    results = eng.run()
    assert set(results) == {r[0] for r in setup["reqs"]}
    for req in setup["reqs"]:
        np.testing.assert_array_equal(results[req[0]],
                                      _offline_beam(setup, gen, req),
                                      err_msg=req[0])


def test_beam_serving_no_early_stop_and_length_penalty(setup):
    """early_stopping=False with a length penalty: slots that hit max length
    while open must finalize via the live-beam merge (offline post-loop
    semantics), still token-identical to offline."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=3, do_sample=False, max_length=10,
                           min_length=8, length_penalty=2.0,
                           early_stopping=False, no_repeat_ngram_size=3)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])])
    for rid, h, m in setup["reqs"]:
        eng.submit(rid, [h], [m])
    results = eng.run()
    for req in setup["reqs"]:
        np.testing.assert_array_equal(results[req[0]],
                                      _offline_beam(setup, gen, req),
                                      err_msg=req[0])


def test_beam_serving_steps_per_tick_int8_and_rating(setup):
    """Beam serving composes with multi-step ticks, int8 cross-KV slabs and
    per-request rating_diff — identical to the offline int8 beam path."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=2, do_sample=False, max_length=12,
                           min_length=2, length_penalty=1.0,
                           early_stopping=True, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])],
                            kv_quant="int8", steps_per_tick=3)
    ratings = {rid: 0.5 * i - 1.0
               for i, (rid, _, _) in enumerate(setup["reqs"][:3])}
    for rid, h, m in setup["reqs"][:3]:
        eng.submit(rid, [h], [m], rating_diff=ratings[rid])
    results = eng.run()

    for rid, h, m in setup["reqs"][:3]:
        res = generate(setup["model"], setup["params"], [h[None]], [m[None]],
                       np.full((1, 1), ratings[rid], np.float32), gen,
                       kv_quant="int8")
        seqs = np.asarray(res.sequences).reshape(1, -1, res.sequences.shape[-1])
        lens = np.asarray(res.lengths).reshape(1, -1)
        want = seqs[0, 0, : int(lens[0, 0])]
        np.testing.assert_array_equal(results[rid], want, err_msg=rid)


def test_engine_pool_beam(setup):
    """Replica-per-device pool with beam engines: merged results must be
    token-identical to offline beam search."""
    import jax

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import EnginePool

    devices = jax.local_devices()[:2]
    gen = GenerationConfig(num_beams=3, do_sample=False, max_length=12,
                           min_length=2, length_penalty=1.0,
                           early_stopping=True, no_repeat_ngram_size=2)
    pool = EnginePool(setup["model"], setup["params"], gen, n_slots=1,
                      modality_shapes=[(setup["e"], setup["s"])],
                      devices=devices)
    for rid, h, m in setup["reqs"]:
        pool.submit(rid, [h], [m])
    results = pool.run()
    assert set(results) == {r[0] for r in setup["reqs"]}
    for req in setup["reqs"]:
        np.testing.assert_array_equal(results[req[0]],
                                      _offline_beam(setup, gen, req),
                                      err_msg=req[0])


def test_beam_serving_ancestry_matches_offline(setup):
    """cache_mode='ancestry' (reorder-free slot cache, per-row-position
    ancestry gather) must stay token-identical to offline beam search,
    including refills that reset the refilled slot's ancestry rows."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=3, do_sample=False, max_length=12,
                           min_length=2, length_penalty=1.0,
                           early_stopping=True, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])],
                            cache_mode="ancestry", steps_per_tick=2)
    for rid, h, m in setup["reqs"]:
        eng.submit(rid, [h], [m])
    results = eng.run()
    for req in setup["reqs"]:
        np.testing.assert_array_equal(results[req[0]],
                                      _offline_beam(setup, gen, req),
                                      err_msg=req[0])

    with pytest.raises(ValueError, match="cache_mode"):
        ContinuousBatcher(setup["model"], setup["params"], gen, 2,
                          [(setup["e"], setup["s"])], cache_mode="nope")


def test_cancel_and_partials(setup):
    """cancel() drops queued or in-flight requests without disturbing other
    slots (outputs stay token-identical to offline); partials() exposes the
    committed prefix of every in-flight greedy request."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=12,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])])
    for rid, h, m in setup["reqs"]:
        eng.submit(rid, [h], [m])

    assert eng.cancel("req4")          # still queued
    assert not eng.cancel("nope")
    eng.tick()                         # req0/req1 now decoding
    snap = eng.partials()
    assert set(snap) == {"req0", "req1"}
    assert eng.cancel("req1")          # in flight: slot freed, no result
    results = eng.run()
    assert set(results) == {"req0", "req2", "req3"}
    for req in setup["reqs"]:
        if req[0] in results:
            want = _offline(setup, gen, req)
            np.testing.assert_array_equal(results[req[0]], want, err_msg=req[0])
            # every earlier partial is a prefix of the final output
            if req[0] in snap:
                p = snap[req[0]]
                np.testing.assert_array_equal(p, want[: len(p)])


def test_pool_cancel_and_partials(setup):
    import jax

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import EnginePool

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=12,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False, no_repeat_ngram_size=2)
    pool = EnginePool(setup["model"], setup["params"], gen, n_slots=1,
                      modality_shapes=[(setup["e"], setup["s"])],
                      devices=jax.local_devices()[:2])
    for rid, h, m in setup["reqs"][:4]:
        pool.submit(rid, [h], [m])
    pool.tick()
    assert set(pool.partials()) == {"req0", "req1"}
    assert pool.cancel("req0") and not pool.cancel("req0")
    results = pool.run()
    assert set(results) == {"req1", "req2", "req3"}
    for req in setup["reqs"][1:4]:
        np.testing.assert_array_equal(results[req[0]], _offline(setup, gen, req),
                                      err_msg=req[0])


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_beam_serving_randomized_configs(setup, seed):
    """Property sweep: random generation configs (beams, penalties, lengths,
    stopping rule, cache mode, tick width) must all stay token-identical to
    offline beam search — the tie-handling edge cases live in odd corners
    of this space."""
    import random

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    r = random.Random(seed)
    max_length = r.choice([9, 12, 15])
    gen = GenerationConfig(
        num_beams=r.choice([2, 3, 4]), do_sample=False,
        max_length=max_length,
        min_length=r.randint(1, max_length - 2),
        length_penalty=r.choice([0.5, 1.0, 2.0]),
        early_stopping=r.choice([True, False]),
        no_repeat_ngram_size=r.choice([0, 2, 3]))
    eng = ContinuousBatcher(
        setup["model"], setup["params"], gen,
        n_slots=r.choice([2, 3]),
        modality_shapes=[(setup["e"], setup["s"])],
        cache_mode=r.choice(["reorder", "ancestry"]),
        steps_per_tick=r.choice([1, 3]))
    for rid, h, m in setup["reqs"]:
        eng.submit(rid, [h], [m])
    results = eng.run()
    for req in setup["reqs"]:
        np.testing.assert_array_equal(
            results[req[0]], _offline_beam(setup, gen, req),
            err_msg=f"{req[0]} gen={gen}")


def test_stats_and_swap_params(setup):
    """stats() counters track occupancy/completions; swap_params() hot-swaps
    weights with no recompilation — requests submitted after the swap decode
    exactly as a fresh engine built with the new params."""
    import jax

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=10,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])])
    s0 = eng.stats()
    assert s0 == dict(n_slots=2, beams=1, steps_per_tick=1, active=0, queued=0,
                      ticks=0, completed=0, tokens_out=0)
    for rid, h, m in setup["reqs"][:3]:
        eng.submit(rid, [h], [m])
    assert eng.stats()["queued"] == 3
    first = eng.run()
    s1 = eng.stats()
    assert s1["completed"] == 3 and s1["active"] == 0 and s1["queued"] == 0
    assert s1["tokens_out"] == sum(len(v) for v in first.values())
    assert s1["ticks"] > 0

    # new weights: same tree, different values
    params2 = jax.tree.map(lambda x: x * 1.5 if x.dtype.kind == "f" else x,
                           setup["params"])
    eng.swap_params(params2)
    for rid, h, m in setup["reqs"][:3]:
        eng.submit(rid + "-v2", [h], [m])
    swapped = eng.run()

    fresh = ContinuousBatcher(setup["model"], params2, gen, n_slots=2,
                              modality_shapes=[(setup["e"], setup["s"])])
    for rid, h, m in setup["reqs"][:3]:
        fresh.submit(rid, [h], [m])
    want = fresh.run()
    changed = 0
    for rid, h, m in setup["reqs"][:3]:
        np.testing.assert_array_equal(swapped[rid + "-v2"], want[rid],
                                      err_msg=rid)
        changed += not np.array_equal(swapped[rid + "-v2"], first[rid])
    assert changed  # the swap actually took effect

    import pytest

    bad = dict(setup["params"])
    bad.pop(sorted(bad)[0])
    with pytest.raises(ValueError, match="swap_params"):
        eng.swap_params(bad)


def test_beam_serving_int4_matches_offline_int4(setup):
    """int4 cross-KV slot slabs under beam serving: token-identical to the
    offline int4 beam path."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=2, do_sample=False, max_length=10,
                           min_length=2, length_penalty=1.0,
                           early_stopping=True, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])],
                            kv_quant="int4")
    for rid, h, m in setup["reqs"][:3]:
        eng.submit(rid, [h], [m])
    results = eng.run()
    for rid, h, m in setup["reqs"][:3]:
        want = _offline_beam(setup, gen, (rid, h, m), kv_quant="int4")
        np.testing.assert_array_equal(results[rid], want, err_msg=rid)


def test_pool_failover_requeues_to_survivors(setup):
    """failover=True: a replica whose device step raises is dropped, its
    queued + in-flight requests restart on the survivors, and every output
    stays token-identical to offline greedy."""
    import jax

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import EnginePool

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=12,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False, no_repeat_ngram_size=2)
    pool = EnginePool(setup["model"], setup["params"], gen, n_slots=1,
                      modality_shapes=[(setup["e"], setup["s"])],
                      devices=jax.local_devices()[:2], failover=True)
    for rid, h, m in setup["reqs"]:
        pool.submit(rid, [h], [m])
    pool.tick()  # both replicas now have one in-flight request each

    victim = pool.engines[0]
    owned = set(victim._slot_req.values()) | {i[0] for i in victim._queue}
    assert owned  # the sabotage must actually orphan something

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    victim._step = boom
    results = pool.run()

    assert len(pool.engines) == 1
    assert pool.failed and "injected device failure" in pool.failed[0][1]
    assert set(results) == {r[0] for r in setup["reqs"]}
    for req in setup["reqs"]:
        np.testing.assert_array_equal(results[req[0]], _offline(setup, gen, req),
                                      err_msg=req[0])


def test_pool_without_failover_raises(setup):
    import jax
    import pytest

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import EnginePool

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=10,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False)
    pool = EnginePool(setup["model"], setup["params"], gen, n_slots=1,
                      modality_shapes=[(setup["e"], setup["s"])],
                      devices=jax.local_devices()[:2])
    for rid, h, m in setup["reqs"][:2]:
        pool.submit(rid, [h], [m])

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    pool.engines[0]._step = boom
    with pytest.raises(RuntimeError, match="injected device failure"):
        pool.run()


def test_submit_validation_and_fill_transactionality(setup):
    """Malformed requests fail at submit() (wrong modality count, wrong mask
    shape, duplicate live id); a mid-fill device failure must not leak slots
    or drop the batch (requeued, order preserved, retry succeeds)."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=10,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False)
    e, s = setup["e"], setup["s"]
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(e, s)])
    rid, h, m = setup["reqs"][0]
    with pytest.raises(ValueError, match="modalities"):
        eng.submit("x", [h, h], [m, m])
    with pytest.raises(ValueError, match="mask shape"):
        eng.submit("x", [h], [np.ones((e, s + 1), bool)])
    eng.submit(rid, [h], [m])
    with pytest.raises(ValueError, match="already queued"):
        eng.submit(rid, [h], [m])

    # transactional fill: first _project call dies, queue/slots must survive
    real_project = eng._project
    calls = dict(n=0)

    def flaky(params, hiddens):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected fill failure")
        return real_project(params, hiddens)

    eng._project = flaky
    with pytest.raises(RuntimeError, match="injected fill"):
        eng.tick()
    assert len(eng._free) == 2 and len(eng._queue) == 1  # nothing leaked
    results = eng.run()  # retry drains normally
    np.testing.assert_array_equal(
        results[rid], _offline(setup, gen, setup["reqs"][0]))


def test_default_sampling_keys_reproducible_across_runs(setup):
    """Default per-request keys derive from the constructor rng + a
    submission counter — two engines with the same rng produce identical
    sampled outputs with NO explicit per-request keys (the old hash(rid)
    scheme was PYTHONHASHSEED-randomised)."""
    import jax

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=True, top_k=10,
                           max_length=10, min_length=2, length_penalty=1.0,
                           early_stopping=False)

    def run_once():
        eng = ContinuousBatcher(setup["model"], setup["params"], gen,
                                n_slots=2,
                                modality_shapes=[(setup["e"], setup["s"])],
                                rng=jax.random.PRNGKey(42))
        for rid, h, m in setup["reqs"][:3]:
            eng.submit(rid, [h], [m])
        return eng.run()

    a, b = run_once(), run_once()
    for rid in a:
        np.testing.assert_array_equal(a[rid], b[rid], err_msg=rid)


def test_beam_cancel_partials_and_refill(setup):
    """Cancel an in-flight BEAM request: the freed slot's next occupant must
    decode token-identically to offline beams (stale done/hyp state must not
    survive the refill), and beam partials() exposes the top live beam."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=3, do_sample=False, max_length=12,
                           min_length=2, length_penalty=1.0,
                           early_stopping=True, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen, n_slots=2,
                            modality_shapes=[(setup["e"], setup["s"])],
                            cache_mode="ancestry")
    for rid, h, m in setup["reqs"]:
        eng.submit(rid, [h], [m])
    eng.tick()
    snap = eng.partials()
    assert set(snap) == {"req0", "req1"}
    assert all(len(v) >= 1 for v in snap.values())
    assert eng.cancel("req1")
    results = eng.run()
    assert set(results) == {"req0", "req2", "req3", "req4"}
    for req in setup["reqs"]:
        if req[0] in results:
            np.testing.assert_array_equal(results[req[0]],
                                          _offline_beam(setup, gen, req),
                                          err_msg=req[0])


def test_pool_stats_monotonic_across_failover(setup):
    """Pool stats() totals must include work served by replicas that were
    later dropped (monotonic counters for monitoring)."""
    import jax

    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import EnginePool

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=10,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False)
    pool = EnginePool(setup["model"], setup["params"], gen, n_slots=1,
                      modality_shapes=[(setup["e"], setup["s"])],
                      devices=jax.local_devices()[:2], failover=True)
    for rid, h, m in setup["reqs"][:2]:
        pool.submit(rid, [h], [m])
    pool.run()
    before = pool.stats()
    assert before["completed"] == 2

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    pool.engines[0]._step = boom
    for rid, h, m in setup["reqs"][2:4]:
        pool.submit(rid, [h], [m])
    pool.run()
    after = pool.stats()
    assert after["completed"] == 4  # not reset by the drop
    assert after["tokens_out"] >= before["tokens_out"]


def test_steps_per_tick_auto(setup):
    """steps_per_tick='auto' measures tick RTT vs step time after 3 live
    ticks, recompiles the step once, and stays token-identical."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=16,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False, no_repeat_ngram_size=2)
    kw = dict(n_slots=2, modality_shapes=[(setup["e"], setup["s"])])
    ref_eng = ContinuousBatcher(setup["model"], setup["params"], gen, **kw)
    auto_eng = ContinuousBatcher(setup["model"], setup["params"], gen,
                                 steps_per_tick="auto", **kw)
    assert auto_eng.steps_per_tick == 1  # probes at 1 first
    for rid, h, m in setup["reqs"]:
        ref_eng.submit(rid, [h], [m])
        auto_eng.submit(rid, [h], [m])
    ref = ref_eng.run()
    out = auto_eng.run()
    for rid, _, _ in setup["reqs"]:
        np.testing.assert_array_equal(out[rid], ref[rid], err_msg=rid)
    st = auto_eng.stats()
    assert not auto_eng._auto_spt  # tuning ran
    assert 1 <= st["steps_per_tick"] <= max(1, gen.max_length // 8)


def test_steps_per_tick_auto_ignores_underfull_ticks(setup):
    """r5 (VERDICT r4 #7): the tuner samples only steady-occupancy ticks —
    a mostly-empty engine (the r4 bulk-warmup failure mode) must keep the
    latency-optimal k=1 and leave tuning pending rather than calibrating
    from unrepresentative 1-slot step times."""
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.serving import ContinuousBatcher

    gen = GenerationConfig(num_beams=1, do_sample=False, max_length=16,
                           min_length=2, length_penalty=1.0,
                           early_stopping=False, no_repeat_ngram_size=2)
    eng = ContinuousBatcher(setup["model"], setup["params"], gen,
                            n_slots=8, steps_per_tick="auto",
                            modality_shapes=[(setup["e"], setup["s"])])
    assert eng._steady_occupancy == 6
    rid, h, m = setup["reqs"][0]
    eng.submit(rid, [h], [m])
    eng.run()
    # one live slot out of 8: every tick is under-full -> no samples, no
    # tuning, k stays 1
    assert eng._tick_times == []
    assert eng._auto_spt and eng.steps_per_tick == 1
