"""Continuous-batching serving engine (greedy / sampling).

A TPU-serving extension beyond the reference (which only has offline batch
eval, ``src/test.py``): requests stream in, each occupies a **slot** of a
fixed-size on-device decode state, every engine tick advances ALL active
slots by one token in a single jitted step, and finished slots are refilled
immediately from the queue — no head-of-line blocking on the longest
sequence in a batch, the classic continuous-batching win for serving.

Design around the static-shape constraint of XLA:

* per-slot state (self-attention KV cache, token buffer, ``cur_len``,
  PRNG) lives in fixed ``[n_slots, ...]`` arrays;
* the decoder step is the SAME ``BartModel.decode_step`` used by offline
  generate, ``vmap``-ed over the slot axis so every slot carries its own
  cache position — matmul shapes batch exactly as in the offline path;
* logits post-processing (forced BOS/EOS, repetition penalty, min-length
  EOS ban, no-repeat-ngram, bad words) is the offline ``decode/logits.py``
  stack vmapped per slot with that slot's own ``cur_len``, so a slot's
  output is **token-identical to offline greedy generation** of the same
  request in matched arithmetic (tested on CPU/f32,
  ``tests/test_serving.py``; in bf16 on chip, batching-order rounding can
  flip near-argmax ties on a few rows — see the beam caveat below);
* request insertion writes one slot's cross-attention K/V + masks via a
  jitted ``.at[slot].set`` update (donated, so slabs update in place).

``num_beams > 1`` serves **beam search** in the same slot architecture:
a slot holds ``num_beams`` decode rows (cache rows ``n_slots * beams``,
cross-KV stays per-slot/unexpanded — beam queries fold into the
attention's position axis exactly as in offline decode), and the per-slot
hypothesis bookkeeping of ``decode/beam_search.py`` (candidate walk,
worst-eviction hyp buffer, done rule) runs vmapped over slots with each
slot's own ``cur_len``. A finished slot is finalized host-side at collect
time with the same stable tie rules as the offline post-loop, so a
request's summary is **token-identical to offline beam search** of the
same inputs in matched arithmetic (tested exhaustively on CPU/f32,
``tests/test_serving.py``). Measured caveat (GATE_r4, bf16 on chip): the
slot-batched step orders matmul reductions differently from the offline
batch step, and bf16 rounding then flips near-argmax ties on a few rows —
95/100 rows identical vs offline static decode (id-ROUGE-L 95.75); the
same effect any batch-size change has on a bf16 decode. Greedy beams
only (``do_sample`` and speculative windows stay single-beam features).

``spec_window > 1`` enables **prompt-lookup speculative decoding** (greedy
only): every engine step decodes a window of ``spec_window`` consecutive
positions — the last committed token plus drafts copied from the request's
source tokens at the first occurrence of the last ``spec_ngram`` generated
tokens — and commits the verified prefix (the drafts that equal the
post-processed argmax), plus the correction token. Decode cost per step is
nearly flat in the window size (the step is HBM-bound on weights and
cross-KV, which are read once per window regardless). Committed output
is verified, so it is token-identical to ``spec_window == 1`` in exact
arithmetic (the k-token verify forward batches matmuls differently from
the 1-token step, so bf16 tie-flips apply: 84/100 identical in GATE_r4).

**Measured NEGATIVE for this model** (GATE_r4, trained weights, real
reviews): draft acceptance 1.66%, 0.36 vs 4.03 sum/s classic — an 11x
LOSS. The premise that an abstractive opinion summarizer copies its
sources verbatim does not hold: the model abstracts, so source-only
prompt-lookup almost never hits. The r5 extension (drafting from the
model's OWN generated prefix, standard prompt-lookup practice) is
provably inert under the reference eval config: with
``no_repeat_ngram_size=3`` and ``spec_ngram=2`` every self-draft token
reproduces an already-seen trigram and is banned by postprocessing
before the verifier even sees it — so self-lookup activates only for
ban-free configs (see ``self_lookup_ok`` in the engine). Keep
``spec_window=1`` in production for this model family; the machinery
remains correct (verified-exact) and useful where outputs do quote
their prompts (extractive QA, editing/rewrite loops). SCALING.md
"speculative decoding" has the full refutation.
"""

from __future__ import annotations

import os
import time
from collections import deque
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodalsum_tpu.core.config import BartConfig, GenerationConfig
from multimodalsum_tpu.decode.logits import (
    NEG_INF, adjust_logits, postprocess_scores, top_k_top_p_filtering,
)
from multimodalsum_tpu.models.bart import BartModel


class _SlotState(NamedTuple):
    tokens: jnp.ndarray      # [S, L] int32
    cur_len: jnp.ndarray     # [S] int32 (1 = only decoder-start written)
    active: jnp.ndarray      # [S] bool
    lengths: jnp.ndarray     # [S] int32 final lengths (valid when finished)
    cache: Any               # layers x (k [S, L, n, h], v)
    cross_kv: Any            # layers x modalities x (k [S, e, s, n, h], v)
    masks: Tuple             # per modality [S, e, s] bool
    rating: jnp.ndarray      # [S, 1]
    rng: jnp.ndarray         # [S, 2] per-slot PRNG keys
    src: Any                 # [S, P] int32 source tokens (prompt-lookup
                             # speculative drafting), or None when disabled
    src_len: Any             # [S] int32 valid source lengths, or None
    spec_committed: Any = None  # scalar int32: total tokens committed by
                                # speculative windows (None unless W > 1)
    spec_windows: Any = None    # scalar int32: active slot-window steps


class _BeamSlotState(NamedTuple):
    """Per-slot beam-search state (``num_beams > 1``): a slot owns K decode
    rows plus the hypothesis buffer of ``decode/beam_search.py`` — the
    field names ``hyp_scores/hyp_tokens/hyp_lens/num_hyps`` duck-type the
    offline ``BeamState`` so ``_merge_hyps`` is shared verbatim."""

    tokens: jnp.ndarray      # [S, K, L] int32
    cur_len: jnp.ndarray     # [S] int32 (all beams of a slot share it)
    active: jnp.ndarray      # [S] bool (request in flight)
    done: jnp.ndarray        # [S] bool (bookkeeping done; pending collect)
    beam_scores: jnp.ndarray  # [S, K] carried sum log-probs
    hyp_scores: jnp.ndarray  # [S, K] normalised, NEG_INF = empty
    hyp_tokens: jnp.ndarray  # [S, K, L]
    hyp_lens: jnp.ndarray    # [S, K]
    num_hyps: jnp.ndarray    # [S]
    cache: Any               # layers x (k [S*K, L, n, h], v) — slot-major rows
    cross_kv: Any            # layers x modalities x (k [S, e, s, n, h], v)
    masks: Tuple             # per modality [S, e, s] bool (per slot, unexpanded)
    rating: jnp.ndarray      # [S, 1]
    anc: Any                 # [S*K, L] int32 ancestry (cache_mode="ancestry"
                             # — the cache stays unreordered), or None


def _cast_params_to(dtype, params):
    """Cast floating leaves to the model compute dtype (no-op leaves pass
    through; casting an already-converted tree is free — same-dtype astype
    returns the input array)."""
    if dtype == jnp.float32:
        return params
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, params)


class ContinuousBatcher:
    """Slot-based continuous batching over the multi-entity decoder.

    Args:
      model / params: a :class:`BartModel` (uni- or multimodal) and params.
      gen: generation config — greedy/sampling at ``num_beams == 1``, or
        greedy beam search at ``num_beams > 1`` (a slot then holds the
        request's beams; outputs token-identical to offline beams).
      n_slots: decode slots (concurrent requests) advanced per tick.
      modality_shapes: per modality ``(e, s)`` of the encoder states a
        request supplies (static — requests pad to these shapes).
    """

    def __init__(self, model: BartModel, params, gen: GenerationConfig,
                 n_slots: int, modality_shapes: Sequence[Tuple[int, int]],
                 rng: Optional[jnp.ndarray] = None,
                 kv_quant: Optional[str] = None,
                 steps_per_tick: int = 1,
                 spec_window: int = 1,
                 spec_ngram: int = 2,
                 spec_src_max: Optional[int] = None,
                 device=None,
                 fill_chunk_max: Optional[int] = 1,
                 cache_mode: Optional[str] = None):
        self.beams = int(gen.num_beams)
        if cache_mode not in (None, "reorder", "ancestry"):
            raise ValueError(f"unknown cache_mode {cache_mode!r}")
        if cache_mode is None:
            # default to the measured-best beam slot cache: ancestry was
            # 8.5x reorder at bart-large shapes on one v5e chip (8 slots,
            # beam 5: 0.92 vs 0.11 req/s — SCALING.md serving table)
            cache_mode = "ancestry"
        # ancestry is moot at K == 1 (no selection ever reorders anything)
        self.cache_mode = cache_mode if self.beams > 1 else "reorder"
        if self.beams > 1:
            if gen.do_sample:
                raise ValueError("beam serving is greedy-beam only (beam "
                                 "sampling stays an offline feature)")
            if spec_window > 1:
                raise ValueError("speculative decoding is single-beam only")
            if gen.num_return_sequences != 1:
                raise ValueError("beam serving returns the top hypothesis "
                                 "per request (num_return_sequences == 1); "
                                 "use decode.engine.generate for n-best")
        if spec_window > 1 and gen.do_sample:
            raise ValueError("speculative decoding is greedy-only (verified "
                             "acceptance is exact for argmax, not for "
                             "sampled draws)")
        if spec_window > 1 and spec_src_max is None:
            raise ValueError("spec_window > 1 requires spec_src_max (static "
                             "source-token buffer length for prompt lookup)")
        cfg: BartConfig = model.config
        if gen.max_length > cfg.max_position_embeddings:
            raise ValueError("max_length exceeds max_position_embeddings")
        self.model, self.gen, self.cfg = model, gen, cfg
        self.n_slots = n_slots
        self.modality_shapes = tuple(modality_shapes)
        if kv_quant not in (None, "int8", "int4"):
            raise ValueError(f"unknown kv_quant {kv_quant!r}")
        self.kv_quant = kv_quant
        # decode steps per host round-trip: >1 amortises the device->host
        # completion poll (large on slow links) at the cost of slots idling
        # up to steps_per_tick-1 tokens after finishing before refill.
        # "auto": start at 1, measure the sync RTT and the on-device step
        # time from ticks at STEADY occupancy (>= 3/4 of the slots live —
        # the r4 version calibrated from the 1-slot warmup fill and chose a
        # k that lost to fixed-8 on bulk decode), then pick the smallest k
        # that caps the RTT at ~10% of a tick (bounded so finished slots
        # never idle more than ~max_length/8 steps). The k-step program is
        # AOT-compiled on a background thread and swapped in between ticks,
        # so the engine never stalls on a mid-run re-jit; until it lands
        # (or at sub-steady occupancy, where big ticks only add slot idle
        # and completion latency) the engine keeps the latency-optimal k=1.
        self._auto_spt = steps_per_tick == "auto"
        self._tick_times: list = []
        self._steady_occupancy = max(1, (3 * n_slots) // 4)
        self._step_pending = None
        self.steps_per_tick = 1 if self._auto_spt else int(steps_per_tick)
        assert self.steps_per_tick >= 1
        # upper bound on the power-of-two fill-chunk size. The DEFAULT is 1
        # (one projection+insert per request): measured on chip, per-request
        # fills pipeline through the async dispatch queue and beat chunked
        # fills 2-4x (min fill for a 32-request wave: 9.0s at cap=1 vs 18.8s
        # at 8 vs 35.1s at 32 — one big stacked transfer serialises), each
        # extra chunk size costs its own projection+insert compile, and
        # per-request projection keeps a request's tokens independent of its
        # batch-mates (bf16 projection rounding varies with the batch
        # shape). Chunking (>1 / None = up to n_slots) remains available for
        # links where per-call dispatch dominates instead.
        self.fill_chunk_max = None if fill_chunk_max is None else int(fill_chunk_max)
        if self.fill_chunk_max is not None and self.fill_chunk_max < 1:
            raise ValueError("fill_chunk_max must be >= 1")
        # prompt-lookup speculative decoding (greedy only): every engine
        # step decodes a spec_window-token verify window — the last
        # committed token plus spec_window-1 draft tokens looked up from the
        # request's SOURCE tokens by matching the last spec_ngram generated
        # tokens. Accepted drafts are exactly the tokens sequential greedy
        # would have produced (verified against the post-processed argmax),
        # so output is token-identical to spec_window == 1; opinion
        # summaries copy heavily from the source reviews, which is what
        # makes the lookup hit.
        self.spec_window = int(spec_window)
        self.spec_ngram = int(spec_ngram)
        self.spec_src_max = int(spec_src_max) if spec_src_max else 0
        assert self.spec_window >= 1 and self.spec_ngram >= 1
        if self.spec_window > 1 and self.spec_src_max <= self.spec_ngram:
            raise ValueError("spec_src_max must exceed spec_ngram (the "
                             "source must fit at least one match window "
                             "plus a continuation token)")

        params = _cast_params_to(model.dtype, params)
        # device=None serves on the default device; an explicit device pins
        # the replica there (EnginePool runs one pinned replica per chip).
        # Every COMPUTED jit input must then be committed to that device —
        # host numpy inputs are fine (they follow the committed params).
        self._device = device
        self.params = jax.device_put(params, device)  # staged once, passed per call

        S, L = n_slots, gen.max_length
        n = cfg.decoder_attention_heads
        h = cfg.d_model // n
        layers = cfg.decoder_layers
        masks = tuple(jnp.zeros((S, e, s), bool) for (e, s) in self.modality_shapes)
        base_rng = jax.random.PRNGKey(0) if rng is None else rng
        # default per-request sampling keys fold a monotonic submission
        # counter into this key (submit()) — reproducible across runs,
        # unlike hashing request ids (PYTHONHASHSEED-randomised)
        self._base_rng = base_rng
        self._submitted = 0
        # NOTE: every leaf must be a DISTINCT buffer — the state is donated
        # into the jitted step/insert, and XLA rejects donating one buffer
        # twice (init_self_attn_cache shares one zeros array across layers).
        # The cross-KV slab structure depends on kv_quant (plain arrays vs
        # QuantizedKV values+scales), so it is built lazily from the first
        # projected request (cross_kv=None until then).
        if self.beams == 1:
            self.state = _SlotState(
                tokens=jnp.full((S, L), cfg.pad_token_id, jnp.int32),
                cur_len=jnp.ones((S,), jnp.int32),
                active=jnp.zeros((S,), bool),
                lengths=jnp.zeros((S,), jnp.int32),
                cache=tuple((jnp.zeros((S, L, n, h), model.dtype),
                             jnp.zeros((S, L, n, h), model.dtype))
                            for _ in range(layers)),
                cross_kv=None,
                masks=masks,
                rating=jnp.zeros((S, 1), jnp.float32),
                rng=jax.random.split(base_rng, S),
                src=(jnp.full((S, self.spec_src_max), cfg.pad_token_id, jnp.int32)
                     if self.spec_window > 1 else None),
                src_len=(jnp.zeros((S,), jnp.int32)
                         if self.spec_window > 1 else None),
                spec_committed=(jnp.int32(0) if self.spec_window > 1
                                else None),
                spec_windows=(jnp.int32(0) if self.spec_window > 1
                              else None),
            )
        else:
            from multimodalsum_tpu.ops.ancestry_attention import init_ancestry

            K = self.beams
            self.state = _BeamSlotState(
                tokens=jnp.full((S, K, L), cfg.pad_token_id, jnp.int32),
                cur_len=jnp.ones((S,), jnp.int32),
                active=jnp.zeros((S,), bool),
                done=jnp.zeros((S,), bool),
                beam_scores=jnp.zeros((S, K), jnp.float32),
                hyp_scores=jnp.full((S, K), NEG_INF, jnp.float32),
                hyp_tokens=jnp.full((S, K, L), cfg.pad_token_id, jnp.int32),
                hyp_lens=jnp.zeros((S, K), jnp.int32),
                num_hyps=jnp.zeros((S,), jnp.int32),
                cache=tuple((jnp.zeros((S * K, L, n, h), model.dtype),
                             jnp.zeros((S * K, L, n, h), model.dtype))
                            for _ in range(layers)),
                cross_kv=None,
                masks=masks,
                rating=jnp.zeros((S, 1), jnp.float32),
                anc=(init_ancestry(S * K, L)
                     if self.cache_mode == "ancestry" else None),
            )
        if device is not None:
            self.state = jax.device_put(self.state, device)

        self._free: deque = deque(range(n_slots))
        self._slot_req: Dict[int, Any] = {}
        self._queue: deque = deque()
        self._live_ids: set = set()
        self._ticks = 0
        self._completed = 0
        self._tokens_out = 0
        self._build_fns()

    def _ensure_cross_kv_slabs(self, ckv_batch):
        """Allocate the [n_slots, ...] slot slabs mirroring the (possibly
        quantized) structure of a projected cross-KV batch ([k, ...] leaves)."""
        if self.state.cross_kv is None:
            S = self.n_slots
            slabs = jax.tree.map(
                lambda x: jnp.zeros((S,) + x.shape[1:], x.dtype), ckv_batch)
            if self._device is not None:
                slabs = jax.device_put(slabs, self._device)
            # zero-filled empty slots are safe: their masks are all-False, so
            # attention sees the finite entity fill (never NaN) and the
            # parallel-mean weight for those entities is zero
            self.state = self.state._replace(cross_kv=slabs)

    # ------------------------------------------------------------------ jit

    def _build_project(self):
        model, kv_quant = self.model, self.kv_quant

        def project(params, modality_hiddens):
            """Project k stacked requests' encoder states ([k, e, s, d] per
            modality) to per-layer cross-KV in ONE call."""
            ckv = model.apply({"params": params}, list(modality_hiddens),
                              method=BartModel.init_decode)
            if kv_quant is not None:
                # int8/int4 slot slabs: halves/quarters serving HBM per slot
                # (more concurrent slots per chip); scale-folded attention
                # reads the int values directly, same as offline decode.
                # MMS_NATIVE_INT4_SLABS=1 switches int4 slabs to the native
                # jnp.int4 dtype (faster widening, token-identical) — off by
                # default because slabs CROSS jit boundaries here and that
                # crashes the experimental axon dev backend; bench.py probes
                # the limitation every run (native_int4_jit_boundary_ok) so
                # the flip is data-driven when a fixed backend lands.
                from multimodalsum_tpu.ops.quantization import quantize_cross_kv

                native4 = os.environ.get("MMS_NATIVE_INT4_SLABS") == "1"
                ckv = quantize_cross_kv(ckv, bits=int(kv_quant[3:]),
                                        native_int4=native4)
            return ckv

        self._project = jax.jit(project)

    def _build_fns(self):
        self._build_project()
        if self.beams > 1:
            self._build_beam_fns()
            return
        model, gen, cfg = self.model, self.gen, self.cfg
        L = gen.max_length
        eos, pad, bos = cfg.eos_token_id, cfg.pad_token_id, cfg.bos_token_id

        # params are ARGUMENTS of every jitted fn, never closed over:
        # closure would bake the full parameter tree into the program as
        # literal constants — a multi-GB compile payload at bart-large
        def post_one(logits, cur_len, tokens_row, rng_row):
            """Logits post-processing + pick for ONE slot (vmapped — these
            are cheap [V]-sized ops; each slot needs its own cur_len)."""
            logits = logits[None]                                 # [1, V]
            if not gen.do_sample:
                logits = adjust_logits(logits, cur_len, L, bos, eos)
            scores = postprocess_scores(
                logits, tokens_row[None], cur_len,
                repetition_penalty=gen.repetition_penalty,
                min_length=gen.min_length, eos_token_id=eos,
                no_repeat_ngram_size=gen.no_repeat_ngram_size,
                bad_words=None, bad_lengths=None)
            if gen.do_sample:
                sampled = scores / gen.temperature if gen.temperature != 1.0 else scores
                sampled = top_k_top_p_filtering(sampled, top_k=gen.top_k,
                                                top_p=gen.top_p)
                # rng_row is a raw [2]-uint32 key (old-style), unique per
                # slot occupancy; folding in cur_len gives per-step draws
                step_rng = jax.random.fold_in(rng_row, cur_len)
                return jax.random.categorical(step_rng, sampled, axis=-1)[0]
            return jnp.argmax(scores, axis=-1)[0]

        vpost = jax.vmap(post_one, in_axes=(0, 0, 0, 0))

        def step(state: _SlotState, params):
            S = state.tokens.shape[0]
            last = jnp.take_along_axis(
                state.tokens, (state.cur_len - 1)[:, None], axis=1)
            # the HEAVY part runs as ONE batched decode step with per-row
            # cache positions (vector index) — identical matmul shapes to
            # offline decode, one-hot masked cache writes instead of the
            # per-slot scatters a vmapped step would emit
            logits, new_cache = model.apply(
                {"params": params}, last, state.cur_len - 1, state.cache,
                state.cross_kv, list(state.masks), state.rating,
                method=BartModel.decode_step)
            next_tok = vpost(logits[:, 0, :].astype(jnp.float32),
                             state.cur_len, state.tokens, state.rng)
            # inactive slots keep their (stale) cache; their tokens are pads
            to_add = jnp.where(state.active, next_tok, pad).astype(jnp.int32)
            rows = jnp.arange(S)
            # inactive slots may sit at cur_len == L; clamp the write index
            # and write back the old value there (no-op)
            widx = jnp.minimum(state.cur_len, L - 1)
            tokens = state.tokens.at[rows, widx].set(
                jnp.where(state.active, to_add, state.tokens[rows, widx]))
            new_len = state.cur_len + state.active.astype(jnp.int32)
            hit_eos = state.active & (to_add == eos)
            hit_max = state.active & (new_len >= L)
            just_finished = hit_eos | hit_max
            lengths = jnp.where(just_finished, new_len, state.lengths)
            active = state.active & ~just_finished
            cache = jax.tree.map(
                lambda new, old: jnp.where(
                    state.active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                new_cache, state.cache)
            return state._replace(tokens=tokens, cur_len=new_len, active=active,
                                  lengths=lengths, cache=cache), just_finished

        W, G = self.spec_window, self.spec_ngram

        # self-lookup viability is DECIDABLE from the config: a self-draft
        # continues a G-token match of the model's own output, so the copied
        # token reproduces a (G+1)-gram seen earlier — when the no-repeat
        # ban order n satisfies n-1 <= G, that token is ALWAYS banned by
        # postprocessing (the verifier would reject every first draft) and
        # a self match would only shadow a viable source draft. Under the
        # reference eval config (n=3, G=2) self-lookup is therefore inert
        # by construction; it activates for ban-free greedy serving (n=0)
        # or when the ban order exceeds G+1.
        n_ban = gen.no_repeat_ngram_size or 0
        self_lookup_ok = n_ban == 0 or n_ban > G + 1

        def draft_lookup(state: _SlotState):
            """Prompt+generated-lookup drafts [S, W-1] (r5, VERDICT r4 #6a):
            match the last G generated tokens against (a) the slot's OWN
            generated prefix — most recent strictly-earlier occurrence,
            when ``self_lookup_ok`` — and (b) the slot's source tokens —
            first occurrence — and copy the W-1 tokens that follow,
            preferring the self match. The r4 source-only drafter measured
            1.66% acceptance on trained weights: an abstractive summarizer
            almost never quotes its sources verbatim, but it does repeat
            its own phrasing ("the food is great ... the service is
            great"). Rows without a usable match draft pads, which the
            verifier rejects (degenerating to one committed token, exactly
            classic decode)."""
            S, P = state.src.shape
            key_idx = state.cur_len[:, None] - G + jnp.arange(G)[None, :]
            key = jnp.take_along_axis(
                state.tokens, jnp.clip(key_idx, 0, L - 1), axis=1)   # [S, G]
            # (b) source lookup: first occurrence inside the valid source
            n_win = P - G + 1
            win_idx = jnp.arange(n_win)[:, None] + jnp.arange(G)[None, :]
            src_win = state.src[:, win_idx]                          # [S, n_win, G]
            m = jnp.all(src_win == key[:, None, :], axis=-1)         # [S, n_win]
            m &= (jnp.arange(n_win)[None, :] + G) < state.src_len[:, None]
            has = jnp.any(m, axis=1) & (state.cur_len >= G)
            first = jnp.argmax(m, axis=1)                            # [S]
            d_idx = first[:, None] + G + jnp.arange(W - 1)[None, :]  # [S, W-1]
            drafts = jnp.take_along_axis(
                state.src, jnp.clip(d_idx, 0, P - 1), axis=1)
            d_valid = has[:, None] & (d_idx < state.src_len[:, None])
            src_drafts = jnp.where(d_valid, drafts, pad).astype(jnp.int32)
            if not self_lookup_ok:
                return src_drafts
            # (a) self lookup over the generated buffer: windows end at
            # most cur_len-2, so the key's own occurrence (ending at
            # cur_len-1) can never match itself; most recent wins (the
            # latest repetition is the best continuation predictor)
            n2 = L - G + 1
            win2 = jnp.arange(n2)[:, None] + jnp.arange(G)[None, :]
            tok_win = state.tokens[:, win2]                          # [S, n2, G]
            m2 = jnp.all(tok_win == key[:, None, :], axis=-1)        # [S, n2]
            m2 &= (jnp.arange(n2)[None, :] + G) < state.cur_len[:, None]
            has2 = jnp.any(m2, axis=1) & (state.cur_len >= G)
            last2 = n2 - 1 - jnp.argmax(m2[:, ::-1], axis=1)         # [S]
            d2_idx = last2[:, None] + G + jnp.arange(W - 1)[None, :]
            drafts2 = jnp.take_along_axis(
                state.tokens, jnp.clip(d2_idx, 0, L - 1), axis=1)
            v2 = has2[:, None] & (d2_idx < state.cur_len[:, None])
            self_drafts = jnp.where(v2, drafts2, pad).astype(jnp.int32)
            return jnp.where(has2[:, None], self_drafts, src_drafts)

        def _window_write(buf, vals, start, row_valid):
            """Write vals [S, T] into buf [S, L] at per-row positions
            start..start+T-1 (overflow past L dropped), rows masked by
            row_valid."""
            T = vals.shape[1]
            off = jnp.arange(buf.shape[1])[None, :] - start[:, None]  # [S, L]
            in_w = (off >= 0) & (off < T) & row_valid[:, None]
            gathered = jnp.take_along_axis(vals, jnp.clip(off, 0, T - 1), axis=1)
            return jnp.where(in_w, gathered, buf)

        def step_spec(state: _SlotState, params):
            """One speculative engine step: decode a W-token verify window
            per slot, commit the verified prefix (1..W tokens). Output is
            token-identical to the classic one-token step (greedy)."""
            S = state.tokens.shape[0]
            drafts = draft_lookup(state)                             # [S, W-1]
            last = jnp.take_along_axis(
                state.tokens, (state.cur_len - 1)[:, None], axis=1)
            win_tokens = jnp.concatenate([last, drafts], axis=1)     # [S, W]
            logits, new_cache = model.apply(
                {"params": params}, win_tokens, state.cur_len - 1, state.cache,
                state.cross_kv, list(state.masks), state.rating,
                method=BartModel.decode_step)                        # [S, W, V]
            # pre-write drafts so position j's post-processing (repetition
            # penalty, ngram bans — they mask by effective length
            # cur_len + j) sees the draft prefix it is conditioned on
            tokens_buf = _window_write(state.tokens, drafts, state.cur_len,
                                       state.active)

            def verify_one(_, j):
                nt = vpost(logits[:, j, :].astype(jnp.float32),
                           state.cur_len + j, tokens_buf, state.rng)
                return None, nt

            _, nts = jax.lax.scan(verify_one, None, jnp.arange(W))
            nts = nts.T.astype(jnp.int32)                            # [S, W]

            match = nts[:, : W - 1] == drafts                        # [S, W-1]
            acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
            n_new = acc + 1                                          # [S] 1..W
            is_eos = nts == eos
            has_eos = jnp.any(is_eos, axis=1)
            first_eos = jnp.argmax(is_eos, axis=1)
            n_new = jnp.where(has_eos & (first_eos + 1 < n_new),
                              first_eos + 1, n_new)
            n_new = jnp.minimum(n_new, L - state.cur_len)
            n_new = jnp.where(state.active, n_new, 0)

            tokens = _window_write(tokens_buf, nts, state.cur_len, state.active)
            new_len = state.cur_len + n_new
            committed_eos = state.active & has_eos & (first_eos < n_new)
            hit_max = state.active & (new_len >= L)
            just_finished = committed_eos | hit_max
            lengths = jnp.where(just_finished, new_len, state.lengths)
            active = state.active & ~just_finished
            cache = jax.tree.map(
                lambda new, old: jnp.where(
                    state.active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                new_cache, state.cache)
            return state._replace(tokens=tokens, cur_len=new_len, active=active,
                                  lengths=lengths, cache=cache,
                                  # acceptance telemetry: n_new is already 0
                                  # for inactive slots; windows counts only
                                  # slots that actually decoded this step
                                  spec_committed=(state.spec_committed
                                                  + jnp.sum(n_new)),
                                  spec_windows=(state.spec_windows
                                                + jnp.sum(state.active
                                                          .astype(jnp.int32)))
                                  ), just_finished

        self._one_step = step_spec if W > 1 else step
        self._rebuild_multi_step()

        def insert(state: _SlotState, slots, ckv, masks, rating, keys,
                   src_rows=None, src_len_rows=None):
            """Insert a BATCH of k requests into slots ``slots`` ([k] int32)
            with one scatter per state leaf — per-request jit dispatches
            would dominate wave-fill time (measured ~0.3 s/request through
            the dev tunnel); batching makes the fill one device call."""
            kb = slots.shape[0]
            start_rows = jnp.full((kb, L), pad, jnp.int32).at[:, 0].set(
                cfg.decoder_start_token_id)
            tokens = state.tokens.at[slots].set(start_rows)
            cross_kv = jax.tree.map(lambda dst, src: dst.at[slots].set(src),
                                    state.cross_kv, ckv)
            masks_new = tuple(dst.at[slots].set(src)
                              for dst, src in zip(state.masks, masks))
            cache = jax.tree.map(
                lambda c: c.at[slots].set(
                    jnp.zeros((kb,) + c.shape[1:], c.dtype)), state.cache)
            return state._replace(
                tokens=tokens,
                cur_len=state.cur_len.at[slots].set(1),
                active=state.active.at[slots].set(True),
                lengths=state.lengths.at[slots].set(0),
                cache=cache,
                cross_kv=cross_kv,
                masks=masks_new,
                rating=state.rating.at[slots].set(rating),
                rng=state.rng.at[slots].set(keys),
                src=(state.src if src_rows is None
                     else state.src.at[slots].set(src_rows)),
                src_len=(state.src_len if src_len_rows is None
                         else state.src_len.at[slots].set(src_len_rows)),
            )

        self._insert = jax.jit(insert, donate_argnums=0)

    def _build_beam_fns(self):
        """Slot-batched greedy beam search: the decode step runs batched over
        all ``n_slots * K`` rows (cross-KV unexpanded — beams fold into the
        attention's position axis as in offline decode), and the per-slot
        candidate walk of ``decode/beam_search.py`` runs vmapped over slots
        with each slot's own ``cur_len``. Math and op order mirror the
        offline body exactly (lazy log-softmax under the same condition,
        2K candidate top-k, stable EOS partition, worst-eviction hyp merge,
        done rule), so a request decodes token-identically to offline beam
        search; finalization happens host-side at :meth:`_collect_beam`."""
        from multimodalsum_tpu.decode.beam_search import _merge_hyps
        from multimodalsum_tpu.ops.ancestry_attention import update_ancestry

        ancestry = self.cache_mode == "ancestry"
        model, gen, cfg = self.model, self.gen, self.cfg
        K, L = self.beams, gen.max_length
        V = cfg.vocab_size
        lp = gen.length_penalty
        eos, pad, bos = cfg.eos_token_id, cfg.pad_token_id, cfg.bos_token_id
        # same condition as the offline loop (do_sample is excluded in beam
        # serving): fold the per-row log-softmax normaliser into the carried
        # beam score instead of materialising a second [rows, V] pass
        lazy_lse = gen.repetition_penalty == 1.0

        def cand_one(logits_k, tokens_k, beam_k, cur_len):
            """Per-slot candidate walk (offline body with the batch axis
            dropped; vmapped over slots so every slot uses its own
            cur_len). Returns continuation selections + finalization
            candidates."""
            logits_k = adjust_logits(logits_k, cur_len, L, bos, eos)
            if lazy_lse:
                scores_step = logits_k
                lse = jax.scipy.special.logsumexp(scores_step, axis=-1)  # [K]
                carried = beam_k - lse
            else:
                scores_step = jax.nn.log_softmax(logits_k, axis=-1)
                carried = beam_k
            scores_step = postprocess_scores(
                scores_step, tokens_k, cur_len,
                repetition_penalty=gen.repetition_penalty,
                min_length=gen.min_length, eos_token_id=eos,
                no_repeat_ngram_size=gen.no_repeat_ngram_size,
                bad_words=None, bad_lengths=None)
            next_scores = scores_step + carried[:, None]            # [K, V]
            top_scores, top_idx = jax.lax.top_k(next_scores.reshape(K * V), 2 * K)
            tok_id = top_idx % V
            beam_id = top_idx // V
            is_eos_c = tok_id == eos
            order = jnp.argsort(is_eos_c, stable=True)  # non-eos first, rank kept
            cont = order[:K]
            sel_scores = top_scores[cont]
            sel_tok = tok_id[cont]
            sel_beam = beam_id[cont]
            cand_eos = is_eos_c & (jnp.arange(2 * K) < K)
            cand_norm = top_scores / (cur_len.astype(jnp.float32) ** lp)
            cand_tokens = tokens_k[beam_id]                          # [2K, L]
            return (sel_scores, sel_tok, sel_beam, cand_eos, cand_norm,
                    cand_tokens, top_scores[0])

        vcand = jax.vmap(cand_one)

        def beam_step(state: _BeamSlotState, params):
            S = state.cur_len.shape[0]
            flat_tokens = state.tokens.reshape(S * K, L)
            pos = jnp.repeat(state.cur_len - 1, K)                   # [S*K]
            last = jnp.take_along_axis(
                flat_tokens, jnp.clip(pos, 0, L - 1)[:, None], axis=1)
            rating = jnp.repeat(state.rating, K, axis=0)
            logits, new_cache = model.apply(
                {"params": params}, last, pos, state.cache,
                state.cross_kv, list(state.masks), rating,
                method=BartModel.decode_step,
                anc=state.anc)                                       # [S*K, 1, V]
            logits = logits[:, 0, :].astype(jnp.float32).reshape(S, K, V)

            live = state.active & ~state.done
            (sel_scores, sel_tok, sel_beam, cand_eos, cand_norm,
             cand_tokens, best_top) = vcand(
                logits, state.tokens, state.beam_scores, state.cur_len)

            # ---- finalized hypotheses (offline: EOS candidates, rank < K)
            cand_valid = cand_eos & live[:, None]
            cand_lens = jnp.broadcast_to(state.cur_len[:, None], (S, 2 * K))
            hyp_scores, hyp_tokens, hyp_lens, num_hyps = _merge_hyps(
                state, cand_norm, cand_tokens, cand_lens, cand_valid)

            # ---- done rule (offline order: after this step's additions)
            worst = jnp.min(hyp_scores, axis=1)
            best_possible = best_top / (state.cur_len.astype(jnp.float32) ** lp)
            newly_done = live & (num_hyps >= K) & (
                jnp.bool_(gen.early_stopping) | (worst >= best_possible))
            done = state.done | newly_done

            # ---- freeze non-live slots: identity reorder, no writes
            frozen = ~live[:, None]
            sel_scores = jnp.where(frozen, state.beam_scores, sel_scores)
            sel_beam = jnp.where(frozen, jnp.arange(K)[None, :], sel_beam)

            # ---- reorder + append at each slot's own position
            new_tokens = jnp.take_along_axis(
                state.tokens, sel_beam[:, :, None], axis=1)
            write = ((jnp.arange(L)[None, None, :] == state.cur_len[:, None, None])
                     & live[:, None, None])
            new_tokens = jnp.where(write, sel_tok[:, :, None], new_tokens)
            new_len = state.cur_len + live.astype(jnp.int32)

            live_rows = jnp.repeat(live, K)
            cache = jax.tree.map(
                lambda new, old: jnp.where(
                    live_rows.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                new_cache, state.cache)
            flat_idx = (jnp.arange(S)[:, None] * K + sel_beam).reshape(-1)
            if ancestry:
                # reorder-free: the cache stays in place, selection updates
                # the [S*K, L] ancestry matrix (offline's 2.5x lever)
                anc = update_ancestry(state.anc, flat_idx,
                                      jnp.repeat(state.cur_len, K))
            else:
                anc = state.anc
                cache = jax.tree.map(lambda x: jnp.take(x, flat_idx, axis=0),
                                     cache)

            hit_max = live & (new_len >= L)
            just_finished = newly_done | hit_max
            active = state.active & ~just_finished
            return state._replace(
                tokens=new_tokens, cur_len=new_len, active=active, done=done,
                beam_scores=sel_scores, hyp_scores=hyp_scores,
                hyp_tokens=hyp_tokens, hyp_lens=hyp_lens, num_hyps=num_hyps,
                cache=cache, anc=anc), just_finished

        self._one_step = beam_step
        self._rebuild_multi_step()

        def insert(state: _BeamSlotState, slots, ckv, masks, rating, keys,
                   src_rows=None, src_len_rows=None):
            """Reset a batch of slots to fresh beam-decode state (keys and
            src_* accepted for signature parity with the greedy engine;
            beam serving is deterministic and non-speculative)."""
            del keys, src_rows, src_len_rows
            kb = slots.shape[0]
            start_rows = jnp.full((kb, K, L), pad, jnp.int32).at[:, :, 0].set(
                cfg.decoder_start_token_id)
            # greedy beam search considers only beam 0 at step 1 (offline
            # beam_scores0): -1e9 on beams 1.. avoids K identical expansions
            bs0 = jnp.zeros((kb, K), jnp.float32).at[:, 1:].set(-1e9)
            row_idx = (slots[:, None] * K + jnp.arange(K)[None, :]).reshape(-1)
            cache = jax.tree.map(
                lambda c: c.at[row_idx].set(
                    jnp.zeros((kb * K,) + c.shape[1:], c.dtype)), state.cache)
            anc = state.anc
            if anc is not None:  # identity ancestry for the refilled rows
                anc = anc.at[row_idx].set(
                    jnp.broadcast_to(row_idx[:, None], (kb * K, L))
                    .astype(anc.dtype))
            cross_kv = jax.tree.map(lambda dst, src: dst.at[slots].set(src),
                                    state.cross_kv, ckv)
            masks_new = tuple(dst.at[slots].set(src)
                              for dst, src in zip(state.masks, masks))
            return state._replace(
                tokens=state.tokens.at[slots].set(start_rows),
                cur_len=state.cur_len.at[slots].set(1),
                active=state.active.at[slots].set(True),
                done=state.done.at[slots].set(False),
                beam_scores=state.beam_scores.at[slots].set(bs0),
                hyp_scores=state.hyp_scores.at[slots].set(
                    jnp.full((kb, K), NEG_INF, jnp.float32)),
                hyp_tokens=state.hyp_tokens.at[slots].set(
                    jnp.full((kb, K, L), pad, jnp.int32)),
                hyp_lens=state.hyp_lens.at[slots].set(
                    jnp.zeros((kb, K), jnp.int32)),
                num_hyps=state.num_hyps.at[slots].set(0),
                cache=cache,
                cross_kv=cross_kv,
                masks=masks_new,
                rating=state.rating.at[slots].set(rating),
                anc=anc,
            )

        self._insert = jax.jit(insert, donate_argnums=0)

    # ----------------------------------------------------------------- API

    def submit(self, request_id, modality_hiddens: Sequence[np.ndarray],
               modality_masks: Sequence[np.ndarray],
               rating_diff: float = 0.0,
               key: Optional[jnp.ndarray] = None,
               source_tokens: Optional[np.ndarray] = None) -> None:
        """Queue a request. ``modality_hiddens[i]`` is ``[e_i, s_i, d]`` (the
        request's encoder states, unbatched), masks ``[e_i, s_i]`` bool.
        ``source_tokens`` (1-D int array, e.g. the request's concatenated
        review token ids) feeds prompt-lookup drafting when the engine runs
        with ``spec_window > 1``; without it the request decodes classically
        inside the speculative step (every draft rejected).

        Malformed requests are rejected HERE, where the offending caller
        gets the exception — inside a tick they would surface ticks later
        and (with chunked fills) poison innocent batch-mates."""
        if (len(modality_hiddens) != len(self.modality_shapes)
                or len(modality_masks) != len(self.modality_shapes)):
            raise ValueError(
                f"expected {len(self.modality_shapes)} modalities, got "
                f"{len(modality_hiddens)} hiddens / {len(modality_masks)} masks")
        for h, m, (e, s) in zip(modality_hiddens, modality_masks,
                                self.modality_shapes):
            if tuple(h.shape[:2]) != (e, s):
                raise ValueError(
                    f"modality shape {tuple(h.shape[:2])} != engine spec {(e, s)}")
            if tuple(m.shape) != (e, s):
                raise ValueError(
                    f"mask shape {tuple(m.shape)} != engine spec {(e, s)}")
        if request_id in self._live_ids:
            raise ValueError(
                f"request id {request_id!r} is already queued or decoding "
                f"on this engine (duplicate ids break completion routing)")
        if key is None and self.beams == 1:
            # deterministic default: constructor rng + submission counter
            # (beam serving is deterministic — skip the key dispatch there)
            key = jax.random.fold_in(self._base_rng, self._submitted)
        self._submitted += 1
        self._live_ids.add(request_id)
        self._queue.append((request_id, modality_hiddens, modality_masks,
                            rating_diff, key, source_tokens))

    def _fill_slots(self):
        while self._free and self._queue:
            # fill in power-of-two chunks of at most fill_chunk_max requests
            # (default 1 — see the constructor note: per-request fills
            # measured faster on chip AND keep outputs batch-independent);
            # power-of-two sizing bounds distinct compiled batch sizes to
            # log2(cap)+1
            n = min(len(self._free), len(self._queue))
            if self.fill_chunk_max is not None:
                n = min(n, self.fill_chunk_max)
            kb = 1 << (n.bit_length() - 1)
            batch = [self._queue.popleft() for _ in range(kb)]
            slots = [self._free.popleft() for _ in range(kb)]
            try:
                n_mod = len(self.modality_shapes)
                # device-resident requests (bulk eval hands the encoder's
                # jitted outputs straight in) stack with jnp — np.stack
                # would round-trip every request's states through host
                # memory, which on a remote-device link costs seconds/req
                hiddens = [
                    (jnp.stack if isinstance(batch[0][1][i], jax.Array)
                     else np.stack)([b[1][i] for b in batch])
                    for i in range(n_mod)]
                ckv = self._project(self.params, hiddens)  # leaves [kb, ...]
                self._ensure_cross_kv_slabs(ckv)
                keys = None
                if self.beams == 1:  # beam insert has no per-slot PRNG
                    keys = jnp.stack([b[4] for b in batch])  # set at submit()
                    if self._device is not None:  # stack runs on the default device
                        keys = jax.device_put(keys, self._device)
                src_rows = src_len_rows = None
                if self.spec_window > 1:
                    P = self.spec_src_max
                    rows = np.full((kb, P), self.cfg.pad_token_id, np.int32)
                    lens = np.zeros((kb,), np.int32)
                    for r, b in enumerate(batch):
                        if b[5] is not None:
                            flat = np.asarray(b[5], np.int32).reshape(-1)[:P]
                            rows[r, : flat.shape[0]] = flat
                            lens[r] = flat.shape[0]
                    src_rows, src_len_rows = jnp.asarray(rows), jnp.asarray(lens)
                self.state = self._insert(
                    self.state, jnp.asarray(slots, jnp.int32), ckv,
                    tuple((jnp.stack if isinstance(batch[0][2][i], jax.Array)
                           else np.stack)([b[2][i] for b in batch]).astype(bool)
                          for i in range(n_mod)),
                    jnp.asarray([[float(b[3])] for b in batch], jnp.float32),
                    keys, src_rows, src_len_rows)
            except BaseException:
                # transactional fill: a mid-fill failure (device error, OOM)
                # must not leak the popped slots or silently drop the batch
                # — requeue at the FRONT (order preserved) and return the
                # slots, so failover can resubmit and a retried tick resumes
                for b in reversed(batch):
                    self._queue.appendleft(b)
                for slot in slots:
                    self._free.append(slot)
                raise
            for slot, b in zip(slots, batch):
                self._slot_req[slot] = b[0]

    def _rebuild_multi_step(self, background: bool = False):
        """(Re)jit the per-tick step as ``steps_per_tick`` chained decode
        steps — split out so steps_per_tick='auto' can switch k after
        measuring, recompiling ONLY the step (insert/project keep their
        compiled programs).

        ``background=True``: AOT-compile the new program on a worker thread
        and leave it in ``_step_pending``; ``_dispatch`` swaps it in between
        ticks. The engine keeps serving on the current program meanwhile —
        a foreground re-jit would stall every live slot for the full
        compile (and the r4 bulk numbers measured exactly that stall)."""
        one_step, k = self._one_step, self.steps_per_tick

        def multi_step(state, params):
            if k == 1:
                return one_step(state, params)

            def body(_, carry):
                st, fin = carry
                st, just = one_step(st, params)
                return st, fin | just

            S = state.cur_len.shape[0]
            return jax.lax.fori_loop(
                0, k, body, (state, jnp.zeros((S,), bool)))

        jitted = jax.jit(multi_step, donate_argnums=0)
        if not background:
            self._step = jitted
            return

        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (self.state, self.params))

        def work():
            try:
                compiled = jitted.lower(*abstract).compile()
                self._step_pending = compiled
            except Exception as e:  # fall back to lazy compile on swap
                print(f"serving: background compile of steps_per_tick="
                      f"{k} failed ({e!r}); swapping the lazily-compiled "
                      f"form (one tick pays the compile)", flush=True)
                self._step_pending = jitted

        import threading

        threading.Thread(target=work, daemon=True).start()

    def _autotune_spt(self):
        """Pick steps_per_tick from tick RTT vs on-device step time measured
        at STEADY occupancy (>= _steady_occupancy live slots; runs once).
        Model: tick wall time = step + sync RTT; RTT measured directly as a
        tiny device_get. The chosen k's program compiles in the background
        (``_rebuild_multi_step(background=True)``) — no tick stalls."""
        # drain queued work UN-timed first: device_get blocks on all
        # previously dispatched computation, so an undrained probe absorbs
        # pending step time into "rtt" (measured r5: a 3.6 s "rtt" during a
        # link-stall window floored the step estimate and clamped k to the
        # cap)
        np.asarray(self.state.cur_len[:1])
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(self.state.cur_len[:1])
        rtt = (time.perf_counter() - t0) / 3
        step = float(np.median(self._tick_times)) - rtt
        cap = max(1, self.gen.max_length // 8)
        if step <= 0:
            # contaminated samples (a link stall hit the probe or the tick
            # window): the model is unusable — fall back to the shipped
            # fixed default rather than the cap
            self.steps_per_tick = min(8, cap)
        else:
            k = int(np.ceil(9 * rtt / step))  # RTT <= ~10% of a tick
            self.steps_per_tick = int(np.clip(k, 1, cap))
        self._auto_spt = False
        print(f"serving: auto steps_per_tick -> {self.steps_per_tick} "
              f"(rtt {rtt*1e3:.1f} ms, step {step*1e3:.1f} ms, "
              f"{len(self._tick_times)} steady ticks)", flush=True)
        if self.steps_per_tick > 1:
            self._rebuild_multi_step(background=True)

    def tick(self) -> List[Tuple[Any, np.ndarray, int]]:
        """Advance every active slot one token. Returns completed requests
        as ``(request_id, tokens, length)``."""
        if self._auto_spt and len(self._tick_times) >= 3:
            self._autotune_spt()
        t0 = time.perf_counter() if self._auto_spt and self._ticks else None
        jf = self._dispatch()
        occupancy = len(self._slot_req)
        out = self._collect(jf) if jf is not None else []
        if (t0 is not None and jf is not None
                and occupancy >= self._steady_occupancy):
            # only steady-occupancy ticks inform the tuner: warmup-fill
            # ticks run underfull batches whose step time says nothing
            # about the steady state the tuned k will run at
            self._tick_times.append(time.perf_counter() - t0)
        return out

    def _dispatch(self):
        """Fill + enqueue one device step; returns the (not yet synced)
        just-finished flags or None when idle. Split from :meth:`_collect`
        so :class:`EnginePool` can dispatch EVERY replica before paying any
        host round-trip — the per-tick sync then overlaps across devices."""
        pending = self._step_pending
        if pending is not None:
            self._step, self._step_pending = pending, None
        self._fill_slots()
        if not self._slot_req:
            return None
        self.state, just_finished = self._step(self.state, self.params)
        self._ticks += 1
        return just_finished

    def _collect(self, just_finished) -> List[Tuple[Any, np.ndarray, int]]:
        if self.beams > 1:
            out = self._collect_beam(just_finished)
        else:
            done = np.nonzero(np.asarray(just_finished))[0]
            out = []
            if len(done):
                tokens = np.asarray(self.state.tokens[done])
                lengths = np.asarray(self.state.lengths[done])
                for row, slot in enumerate(done):
                    slot = int(slot)
                    rid = self._slot_req.pop(slot)
                    out.append((rid, tokens[row, : lengths[row]],
                                int(lengths[row])))
                    self._free.append(slot)
        self._completed += len(out)
        self._tokens_out += sum(o[2] for o in out)
        self._live_ids.difference_update(o[0] for o in out)
        return out

    def _collect_beam(self, just_finished) -> List[Tuple[Any, np.ndarray, int]]:
        """Finalize finished beam slots host-side with the offline post-loop
        semantics (``decode/beam_search.py`` finalisation): a slot that hit
        max length while still open merges its live beams into the
        hypothesis buffer (stable merge — incumbents win ties, like
        ``lax.top_k`` over the concatenation), then the top hypothesis is
        padded/EOS-terminated exactly as offline."""
        done_slots = np.nonzero(np.asarray(just_finished))[0]
        if not len(done_slots):
            return []
        st, K, L = self.state, self.beams, self.gen.max_length
        lp, eos = self.gen.length_penalty, self.cfg.eos_token_id
        idx = jnp.asarray(done_slots)
        # one batched transfer: seven separate np.asarray calls would each
        # pay a dispatch+sync round-trip (expensive on slow links)
        (hyp_scores, hyp_tokens, hyp_lens, beam_scores, tokens, cur_len,
         was_done) = jax.device_get(
            (st.hyp_scores[idx], st.hyp_tokens[idx], st.hyp_lens[idx],
             st.beam_scores[idx], st.tokens[idx], st.cur_len[idx],
             st.done[idx]))
        out = []
        for row, slot in enumerate(done_slots):
            scores, toks, lens = hyp_scores[row], hyp_tokens[row], hyp_lens[row]
            if not was_done[row]:
                # hit max length while open: merge live beams (offline
                # post-loop, incumbents first so stable sort favours them)
                cl = int(cur_len[row])
                scores = np.concatenate(
                    [scores, beam_scores[row] / (float(cl) ** lp)])
                toks = np.concatenate([toks, tokens[row]], axis=0)
                lens = np.concatenate(
                    [lens, np.full((K,), cl, np.int32)])
            best = int(np.argsort(-scores, kind="stable")[0])
            ln = int(lens[best])
            seq = toks[best, :ln]
            if ln < L:  # offline: EOS appended at ``length`` when it fits
                seq = np.concatenate([seq, np.asarray([eos], seq.dtype)])
                ln += 1
            slot = int(slot)
            rid = self._slot_req.pop(slot)
            out.append((rid, seq.astype(np.int32), ln))
            self._free.append(slot)
        return out

    @property
    def pending(self) -> bool:
        """True while any request is queued or decoding."""
        return bool(self._queue or self._slot_req)

    def cancel(self, request_id) -> bool:
        """Abort a request: drop it from the queue, or deactivate and free
        its slot if already decoding (the slot refills on the next tick; no
        partial result is emitted). Other requests are unaffected — slots
        decode row-independently. Returns whether the request was found."""
        for i, item in enumerate(self._queue):
            if item[0] == request_id:
                del self._queue[i]
                self._live_ids.discard(request_id)
                return True
        for slot, rid in self._slot_req.items():
            if rid == request_id:
                self.state = self.state._replace(
                    active=self.state.active.at[slot].set(False))
                del self._slot_req[slot]
                self._free.append(slot)
                self._live_ids.discard(request_id)
                return True
        return False

    def stats(self) -> Dict[str, Any]:
        """Host-side counters for monitoring: slot occupancy, queue depth,
        engine steps taken (``ticks * steps_per_tick`` decode steps),
        completed requests, and tokens emitted. No device sync."""
        return dict(
            n_slots=self.n_slots,
            beams=self.beams,
            steps_per_tick=self.steps_per_tick,
            active=len(self._slot_req),
            queued=len(self._queue),
            ticks=self._ticks,
            completed=self._completed,
            tokens_out=self._tokens_out,
        )

    def spec_stats(self) -> Optional[Dict[str, Any]]:
        """Speculative-decoding acceptance, read from the device counters
        (one tiny host transfer — unlike :meth:`stats`, this syncs).

        ``tokens_per_window``: mean committed tokens per active slot window
        (1..spec_window; 1.0 = drafts never help). ``draft_acceptance``:
        fraction of DRAFTED tokens accepted, i.e.
        (committed - windows) / (windows * (spec_window - 1)).
        None when speculative decoding is disabled."""
        if self.spec_window <= 1 or getattr(
                self.state, "spec_committed", None) is None:
            return None
        committed = int(np.asarray(self.state.spec_committed))
        windows = int(np.asarray(self.state.spec_windows))
        return dict(
            spec_window=self.spec_window,
            committed_tokens=committed,
            window_steps=windows,
            tokens_per_window=round(committed / max(windows, 1), 4),
            draft_acceptance=round(
                (committed - windows)
                / max(windows * (self.spec_window - 1), 1), 4),
        )

    def swap_params(self, params) -> None:
        """Hot-swap the served parameters (model update without downtime).

        The compiled step/insert/project programs key on shapes/dtypes, not
        values — a same-architecture checkpoint swaps in with zero
        recompilation. Requests already decoding continue under the NEW
        parameters from their next step (their cache/prefix came from the
        old ones); drain first if that mix is unacceptable."""
        new = jax.device_put(_cast_params_to(self.model.dtype, params),
                             self._device)
        old_shapes = jax.tree.map(lambda x: (x.shape, str(x.dtype)), self.params)
        new_shapes = jax.tree.map(lambda x: (x.shape, str(x.dtype)), new)
        if old_shapes != new_shapes:
            raise ValueError("swap_params: parameter tree shapes/dtypes "
                             "differ from the served model's")
        self.params = new

    def partials(self) -> Dict[Any, np.ndarray]:
        """Tokens generated so far for every in-flight request (one host
        read of the active rows). Greedy/sampling: the committed prefix of
        the final output. Beams: the current top-ranked live beam — a
        preview that later selection may still abandon."""
        if not self._slot_req:
            return {}
        slots = sorted(self._slot_req)
        idx = jnp.asarray(slots, jnp.int32)
        if self.beams > 1:
            toks = np.asarray(self.state.tokens[idx, 0])
        else:
            toks = np.asarray(self.state.tokens[idx])
        lens = np.asarray(self.state.cur_len[idx])
        return {self._slot_req[s]: toks[i, : int(lens[i])]
                for i, s in enumerate(slots)}

    def run(self, max_ticks: int = 100000) -> Dict[Any, np.ndarray]:
        """Drain the queue: tick until every submitted request completes."""
        return _drain(self, max_ticks)


class EnginePool:
    """Data-parallel serving: one pinned :class:`ContinuousBatcher` replica
    per device.

    Generation is embarrassingly parallel across requests (SURVEY §2.5 —
    the reference serves on a single GPU, ``src/test.py``), so scaling
    serving over a pod slice is replica-per-chip, not sharded-model:
    each replica owns its slots, cache slabs, and a full (bf16 or
    int8/int4-KV) parameter copy on its own device. Requests go to the
    replica with the most headroom; each tick dispatches EVERY replica's
    device step before syncing any of them, so the per-tick host
    round-trips overlap instead of serialising.

    For model-sharded (tp) serving use the offline `--dp/--tp` eval path;
    at bart-large size a v5e chip fits many full replicas, so dp-only
    serving is the throughput-optimal layout (no per-step collectives).
    """

    def __init__(self, model: BartModel, params, gen: GenerationConfig,
                 n_slots: int, modality_shapes: Sequence[Tuple[int, int]],
                 devices: Optional[Sequence] = None, failover: bool = False,
                 **engine_kwargs):
        devices = list(devices) if devices is not None else jax.local_devices()
        if not devices:
            raise ValueError("EnginePool needs at least one device")
        self.engines = [
            ContinuousBatcher(model, params, gen, n_slots, modality_shapes,
                              device=d, **engine_kwargs)
            for d in devices
        ]
        self._rr = 0  # round-robin tiebreak cursor
        # failover=True retains a host copy of every live request's inputs
        # (the in-flight encoder states live only on their replica's device)
        # so a replica whose device errors can be dropped and its requests
        # restarted on the survivors — the closest TPU analog of elastic
        # recovery, absent in the reference entirely (SURVEY §5). Costs
        # O(live requests x encoder-state bytes) host RAM, hence opt-in.
        self._failover = bool(failover)
        self._retained: Dict[Any, Tuple[tuple, dict]] = {}
        self.failed: List[Tuple[Any, str]] = []  # (device, error) log
        # pool-level default sampling keys: per-replica counters would
        # collide (same base rng + same counter value on two replicas =
        # identical draws for different requests), so the pool assigns keys
        # from ITS rng + a pool-wide counter before routing
        self._pool_rng = engine_kwargs.get("rng")
        if self._pool_rng is None:
            self._pool_rng = jax.random.PRNGKey(0)
        self._pool_submitted = 0
        # counters of replicas dropped by failover, so stats() totals stay
        # monotonic after a drop
        self._dropped_stats = dict(completed=0, tokens_out=0, ticks=0)

    @property
    def n_slots_total(self) -> int:
        return sum(e.n_slots for e in self.engines)

    def submit(self, request_id, modality_hiddens, modality_masks,
               **kwargs) -> None:
        """Queue a request on the replica with the most headroom (free
        slots minus queued work; round-robin on ties)."""
        n = len(self.engines)
        best, best_score = None, None
        for i in range(n):
            j = (self._rr + i) % n
            e = self.engines[j]
            score = len(e._free) - len(e._queue)
            if best_score is None or score > best_score:
                best, best_score = j, score
        if any(request_id in e._live_ids for e in self.engines):
            raise ValueError(
                f"request id {request_id!r} is already live in the pool "
                f"(duplicate ids break completion routing and failover)")
        if kwargs.get("key") is None and self.engines[best].beams == 1:
            # pool-wide counter: per-replica counters would hand the same
            # key to different requests on different replicas
            kwargs["key"] = jax.random.fold_in(self._pool_rng,
                                               self._pool_submitted)
        self._pool_submitted += 1
        self._rr = (best + 1) % n
        # engine.submit validates (shapes, duplicates) and may raise —
        # retain only ACCEPTED requests, or rejected ones leak host copies
        self.engines[best].submit(request_id, modality_hiddens,
                                  modality_masks, **kwargs)
        if self._failover:
            self._retained[request_id] = ((modality_hiddens, modality_masks),
                                          dict(kwargs))

    def tick(self) -> List[Tuple[Any, np.ndarray, int]]:
        """Advance every replica one engine step; merged completions. With
        ``failover=True`` a replica whose device step raises is dropped and
        its queued + in-flight requests restart from scratch on the
        survivors (partial decode progress on the dead device is lost)."""
        out: List[Tuple[Any, np.ndarray, int]] = []
        dispatched, dead = [], []
        for e in self.engines:
            try:
                dispatched.append((e, e._dispatch()))
            except RuntimeError as exc:  # device/runtime failure only:
                # request-induced errors (ValueError/TypeError) are raised at
                # submit() by validation, and must NOT cost a healthy replica
                if not self._failover:
                    raise
                dead.append((e, exc))
        for e, jf in dispatched:
            if jf is None:
                continue
            try:
                completed = e._collect(jf)
            except RuntimeError as exc:
                if not self._failover:
                    raise
                dead.append((e, exc))
                continue
            for rid, toks, n in completed:
                self._retained.pop(rid, None)
                out.append((rid, toks, n))
        for e, exc in dead:
            self._drop_replica(e, exc)
        return out

    def _drop_replica(self, engine, exc) -> None:
        """Remove a failed replica and resubmit everything it owned."""
        self.failed.append((engine._device, repr(exc)))
        for k in self._dropped_stats:  # keep pool totals monotonic
            self._dropped_stats[k] += engine.stats()[k]
        self.engines.remove(engine)
        if not self.engines:
            raise RuntimeError(
                f"all serving replicas failed (last: {exc!r})") from exc
        orphans = [item[0] for item in engine._queue]
        orphans += list(engine._slot_req.values())
        for rid in orphans:
            retained = self._retained.get(rid)
            if retained is None:
                # unreachable by construction (failover retains at submit,
                # duplicates are rejected pool-wide) — surface loudly rather
                # than silently dropping a client's request
                raise RuntimeError(
                    f"internal failover inconsistency: request {rid!r} was "
                    f"in flight on the failed replica but has no retained "
                    f"inputs to restart from") from exc
            (hiddens, masks), kwargs = retained
            self.submit(rid, hiddens, masks, **kwargs)

    @property
    def pending(self) -> bool:
        """True while any replica has queued or decoding requests."""
        return any(e.pending for e in self.engines)

    def cancel(self, request_id) -> bool:
        """Abort a request on whichever replica holds it."""
        found = any(e.cancel(request_id) for e in self.engines)
        if found:
            self._retained.pop(request_id, None)
        return found

    def partials(self) -> Dict[Any, np.ndarray]:
        """In-flight partial outputs merged across replicas."""
        out: Dict[Any, np.ndarray] = {}
        for e in self.engines:
            out.update(e.partials())
        return out

    def stats(self) -> Dict[str, Any]:
        """Pool totals plus per-replica counter dicts. Totals include work
        served by replicas later dropped via failover, so the counters stay
        monotonic across drops."""
        per = [e.stats() for e in self.engines]
        d = self._dropped_stats
        return dict(
            replicas=len(per),
            n_slots_total=self.n_slots_total,
            active=sum(s["active"] for s in per),
            queued=sum(s["queued"] for s in per),
            completed=sum(s["completed"] for s in per) + d["completed"],
            tokens_out=sum(s["tokens_out"] for s in per) + d["tokens_out"],
            ticks=sum(s["ticks"] for s in per) + d["ticks"],
            per_replica=per,
        )

    def swap_params(self, params) -> None:
        """Hot-swap parameters on every replica (each keeps its own pinned
        device copy)."""
        for e in self.engines:
            e.swap_params(params)

    def run(self, max_ticks: int = 100000) -> Dict[Any, np.ndarray]:
        """Drain all replicas: tick until every submitted request completes."""
        return _drain(self, max_ticks)


def _drain(engine, max_ticks: int) -> Dict[Any, np.ndarray]:
    """Shared drain loop over anything exposing ``pending``/``tick()``."""
    results: Dict[Any, np.ndarray] = {}
    ticks = 0
    while engine.pending and ticks < max_ticks:
        for rid, toks, _ in engine.tick():
            results[rid] = toks
        ticks += 1
    if engine.pending:
        raise RuntimeError(f"run() did not drain in {max_ticks} ticks")
    return results
