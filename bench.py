"""Flagship benchmark: multimodal beam-search summarization throughput.

Measures end-to-end summaries/sec/chip for the production eval configuration
(reference ``src/test.py:156-181``): Yelp groups of 8 reviews x 160 tokens,
47-row table, 10 images, BART-large multimodal decoder, beam 5, max_length
142 (config default), no_repeat_ngram 3, early stopping — the whole pipeline
(3 encoders + on-device beam search) jitted, bf16.

Two serving configurations are measured every run:

* **token-exact** (bf16 KV, ancestry cache) — the headline ``value``: the
  quality half of the metric is exactly the reference's, by construction;
* **quantized** (scale-folded int8 cross-KV) — reported as
  ``value_quantized`` together with its measured quality cost vs the exact
  path on identical inputs: per-sequence token agreement, mean
  first-divergence prefix fraction, and id-level ROUGE-L (quantized output
  scored against the exact output as reference).

Also benchmarks the stage-3 **training step** (bart-large x9 leave-one-out +
3 encoders + AdamW, batch 8 — the reference's 8-GPU global batch,
``README.md:139-140``) and reports s/step, target-tokens/s and analytic MFU.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "value_exact",
   "value_quantized", "config_exact", "config_quantized", "fallbacks",
   "quant_token_agreement", "quant_prefix_agreement",
   "quant_rougeL_vs_exact", "decode_mfu", "train"}

``vs_baseline`` compares against an estimated 2.0 summaries/sec for the
reference PyTorch implementation on one A100 (batch 8, beam 5, ~142
host-synced single-token decoder steps per summary — the reference beam loop
round-trips GPU->host every token, see SURVEY.md §3.4). The reference repo
publishes no numbers (BASELINE.md), so this anchor is an engineering
estimate, stated here for transparency.

When the trained bart-large checkpoint exists (``scripts/train_r5.py`` /
``scripts/train_real_ckpt.py`` → ``_work/real_ckpt``; auto-restored from
the committed ``assets/real_ckpt_pack/``), a **quality gate** additionally
runs the REAL 100-group Yelp eval and PROMOTES to the headline ``value``
the FASTEST quantized tier that passes the r5 criterion: the val-min
learning-evidence checkpoint beats the lead-review baseline (quality
floor) AND the tier costs <= 0.5 gold ROUGE-L measured by decoding **the
val-min checkpoint itself** — the artifact one would ship — not the
overfit stress basis (id-ROUGE-L recorded as the token-fidelity
diagnostic). Measured r5 outcome on the committed checkpoint (valmin gold
RL 16.15 vs lead 13.81): int8 +0.08, int4_r1 +0.05, int4+int8 +0.03 gold
delta all pass, pure int4 FAILS at -0.79 — so the headline goes to
int4_r1 (~18.8 sum/s), exactly the demotion the valmin re-grounding
exists to catch (on the overfit basis int4 had looked quality-free). An
amazon gate section (exact + valmin + lead baseline over the 32-product
test set) runs when ``ckpt/multimodal_trained_amazon`` exists.
``--gate_sections=sched,spec,...`` additionally A/Bs static-vs-continuous
bulk decode and measures speculative acceptance on the real length
distribution (GATE_r5.json).

Flags: ``--exact`` (skip the quantized config), ``--no-train`` (skip the
training benchmark), ``--train-only`` (just the training step),
``--train_remat=true|false|<policy name>`` (rotation remat A/B),
``--batch=N --cache_mode=M --kv_quant=Q`` (bench one explicit config),
``--pallas`` (entity-attention Pallas kernel A/B), ``--no-gate`` /
``--gate-only`` / ``--gate_root=PATH`` (trained-checkpoint quality gate).
"""

import json
import os
import sys
import time
import traceback

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: verified working through the axon
# tunnel (cross-process re-run of a 4.5 s compile hit in 0.26 s). This
# host has ONE CPU core, so bart-large beam-decode compiles cost minutes;
# caching makes repeat bench/gate invocations measure decode, not XLA.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_work", "jax_cache")
try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass  # older jax or read-only fs: compile costs stay per-process

A100_REFERENCE_SUMMARIES_PER_SEC = 2.0

E, S, N_IMG = 8, 160, 10   # entities x tokens, images (src/test.py:56-60,121-124)
B_MAX = 96                 # inputs drawn once at B_MAX; batch b uses rows [:b]
TRAIN_BATCH = 8
TRAIN_LEN = 128

# chip peak bf16 FLOP/s by device_kind prefix (public TPU specs)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,       # v5p (checked after the more specific v5 lite)
    "TPU v6 lite": 918e12,
}


def prefix_match_fraction(exact_seq, other_seq) -> float:
    """Fraction of ``exact_seq`` matched before the first divergence from
    ``other_seq`` — whole-sequence agreement alone can't distinguish
    "diverges at token 3" from "diverges at token 130"."""
    k = 0
    for a, b in zip(exact_seq, other_seq):
        if a != b:
            break
        k += 1
    return k / max(len(exact_seq), 1)


def chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for prefix in ("TPU v5 lite", "TPU v6 lite", "TPU v5", "TPU v4"):
        if kind.startswith(prefix):
            return PEAK_FLOPS[prefix]
    return 197e12  # conservative default


def make_inputs(cfg):
    """Deterministic inputs at B_MAX; row i is identical for every batch size
    that includes it, so sequences are comparable across configs."""
    rng = np.random.default_rng(0)
    reviews = rng.integers(3, cfg.vocab_size, (B_MAX, E, S)).astype(np.int32)
    reviews_mask = np.ones((B_MAX, E, S), np.int32)
    img = rng.normal(size=(B_MAX, N_IMG, 224, 224, 3)).astype(np.float32)
    img_mask = np.ones((B_MAX, N_IMG), bool)
    return reviews, reviews_mask, img, img_mask


def _matmul_flops(m, n, k):
    return 2.0 * m * n * k


def train_step_flops(cfg, b: int, t: int = TRAIN_LEN) -> float:
    """Analytic dense-matmul FLOPs for one stage-3 train step (fwd + bwd ~ 3x
    fwd): encoder once over b*9 reviews, 9 leave-one-out decoder rotations,
    lm head, cross-attention over text/table/img, ResNet-101 over 10 images
    (conv fwd ~7.8 GFLOP/image at 224^2; stages 1-2 frozen, so bwd only on
    ~stage-3+linear, counted at ~1.5x fwd). Attention score/context terms
    included; norms/gates/embeddings (vector-scale work) excluded."""
    d, ffn, V = cfg.d_model, cfg.decoder_ffn_dim, cfg.vocab_size
    s_text, s_tab, s_img = E * t, 47, N_IMG * 196
    L = cfg.decoder_layers

    # encoder over b*9 reviews of t tokens
    enc_tok = b * 9 * t
    enc = cfg.encoder_layers * (
        _matmul_flops(enc_tok, d, d) * 4 +          # q,k,v,o
        _matmul_flops(enc_tok, t, d) * 2 +          # scores + context
        _matmul_flops(enc_tok, ffn, d) * 2)         # fc1, fc2

    # one decoder rotation over b rows of t tokens
    dec_tok = b * t
    self_attn = _matmul_flops(dec_tok, d, d) * 4 + _matmul_flops(dec_tok, t, d) * 2
    cross = 0.0
    for s_m in (s_text, s_tab, s_img):
        kv = _matmul_flops(b * s_m, d, d) * 2        # k, v over source
        qo = _matmul_flops(dec_tok, d, d) * 2        # q, out
        sc = _matmul_flops(dec_tok, s_m, d) * 2      # scores + context
        cross += kv + qo + sc
    ffn_f = _matmul_flops(dec_tok, ffn, d) * 2
    head = _matmul_flops(dec_tok, V, d)
    rotation = L * (self_attn + cross + ffn_f) + head

    fwd = enc + 9 * rotation
    resnet = b * N_IMG * 7.8e9 * 2.5                # fwd + partial bwd
    return 3.0 * fwd + resnet                       # bwd ~ 2x fwd


def decode_step_flops(cfg, b: int, beams: int, pos: int) -> float:
    """Analytic FLOPs for ONE beam-decode token step at cache position
    ``pos`` (self-attention attends pos keys; cross-KV projections are
    amortised outside the loop and excluded)."""
    d, ffn, V = cfg.d_model, cfg.decoder_ffn_dim, cfg.vocab_size
    rows = b * beams
    s_text, s_tab, s_img = E * S, 47, N_IMG * 196
    L = cfg.decoder_layers
    self_attn = _matmul_flops(rows, d, d) * 4 + _matmul_flops(rows, pos, d) * 2
    cross = sum(_matmul_flops(rows, d, d) * 2 + _matmul_flops(rows, s_m, d) * 2
                for s_m in (s_text, s_tab, s_img))
    ffn_f = _matmul_flops(rows, ffn, d) * 2
    head = _matmul_flops(rows, V, d)
    return L * (self_attn + cross + ffn_f) + head


_SHARED = {}


def shared_model_state(dataset: str = "yelp"):
    """Init the flagship model ONCE per dataset and share params across
    bench configs (each batch size needs its own jit, not its own
    406M-param init). The throughput configs are all yelp; the amazon entry
    exists for the amazon trained-checkpoint gate (its table encoder has
    the 5+128 amazon field geometry, ``models/table.py``)."""
    if dataset not in _SHARED:
        from multimodalsum_tpu.core.config import BartConfig
        from multimodalsum_tpu.models.multimodal import (
            MultimodalSum, amazon_dummy_table, yelp_dummy_table,
        )

        cfg = BartConfig(dropout=0.0)
        model = MultimodalSum(cfg, dataset=dataset, img_model="resnet101",
                              dtype=jnp.bfloat16)
        t0 = time.time()
        field, values1 = (yelp_dummy_table(1) if dataset == "yelp"
                          else amazon_dummy_table(1))
        variables = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), field, values1,
                               method=MultimodalSum.init_all))()
        print(f"# init[{dataset}] {time.time()-t0:.1f}s", flush=True)
        _SHARED[dataset] = dict(cfg=cfg, model=model,
                                params=variables["params"],
                                batch_stats=variables["batch_stats"])
    return _SHARED[dataset]


def bench_batch(inputs, b: int, cache_mode: str = "reorder",
                kv_quant=None):
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.models.multimodal import MultimodalSum, yelp_dummy_table

    st = shared_model_state()
    cfg, model = st["cfg"], st["model"]
    params, batch_stats = st["params"], st["batch_stats"]
    gen = GenerationConfig(
        num_beams=5, max_length=142, min_length=56, length_penalty=2.0,
        early_stopping=True, no_repeat_ngram_size=3,
    )
    bart = BartModel(cfg, multimodal=True, dtype=model.dtype)

    reviews, reviews_mask, img, img_mask = (x[:b] for x in inputs)
    reviews = reviews.reshape(b * E, S)
    reviews_mask = reviews_mask.reshape(b * E, S)
    field, values = yelp_dummy_table(b)

    # ResNet over b*10 images in one shot peaks activation memory; encoding
    # in lax.map chunks lowers pressure and measured slightly faster at b64
    img_chunks = max(1, b // 16)

    def pipeline(params, batch_stats, reviews, reviews_mask, field, values, img, img_mask):
        vs = {"params": params, "batch_stats": batch_stats}
        text_h = model.apply(vs, reviews.reshape(b, E, S), reviews_mask.reshape(b, E, S),
                             method=MultimodalSum.encode_text)
        table_h, table_m = model.apply(vs, field, values, method=MultimodalSum.encode_table)
        if img_chunks > 1 and b % img_chunks == 0:
            imgs = img.reshape(img_chunks, b // img_chunks, *img.shape[1:])
            masks = img_mask.reshape(img_chunks, b // img_chunks, img_mask.shape[1])
            img_h, img_m = jax.lax.map(
                lambda c: model.apply(vs, c[0], c[1], method=MultimodalSum.encode_img),
                (imgs, masks))
            img_h = img_h.reshape(b, *img_h.shape[2:])
            img_m = img_m.reshape(b, *img_m.shape[2:])
        else:
            img_h, img_m = model.apply(vs, img, img_mask, method=MultimodalSum.encode_img)
        text_m = reviews_mask.reshape(b, E, S).astype(bool)
        rating = jnp.zeros((b, 1), jnp.float32)
        res = generate(bart, params["bart"], [text_h, table_h, img_h],
                       [text_m, table_m, img_m], rating, gen,
                       cache_mode=cache_mode, kv_quant=kv_quant)
        return res.sequences, res.lengths

    jit_pipe = jax.jit(pipeline)

    def run(args):
        """One synchronized execution. block_until_ready does NOT actually
        block on the experimental axon backend — a host device_get is the
        only reliable barrier, so timings transfer the (tiny) lengths array."""
        seqs, lengths = jit_pipe(*args)
        return seqs, np.asarray(lengths)

    # Stage all inputs on device ONCE, outside the timed loop. The axon dev
    # tunnel moves host->device at only a few MB/s, so re-transferring the
    # 192 MB f32 image batch per iteration would measure the debug tunnel,
    # not the chip (production feeds the chip over local PCIe/DMA and the
    # eval harness prefetches asynchronously).
    args = jax.device_put(
        (params, batch_stats, reviews, reviews_mask, field, values, img, img_mask))
    _ = np.asarray(args[3][:1, :1])  # wait for the staging transfer
    t0 = time.time()
    seqs, lengths = run(args)
    print(f"# batch {b}: compile+first run {time.time()-t0:.1f}s", flush=True)

    iters = 4
    times = []
    for _ in range(iters):
        t0 = time.time()
        seqs, lengths = run(args)
        times.append(time.time() - t0)
    print(f"# per-iter: {[round(t, 3) for t in times]}", flush=True)
    # median: robust to single tunnel-hiccup outliers (observed 11.5s amid
    # 4.14s iters), still honest for the steady state
    dt = float(np.median(times))
    print(f"# steady-state: {dt:.3f}s/batch of {b} (median of {iters}); "
          f"~{int(lengths.sum())} tokens; {b/dt:.2f} summaries/s", flush=True)

    # rough decode MFU: mean per-step flops over the 142 positions / chip peak
    steps = 142
    flops = sum(decode_step_flops(cfg, b, 5, p) for p in
                range(1, steps)) / (steps - 1) * steps
    mfu = flops / dt / chip_peak_flops()
    return dict(sps=b / dt, dt=dt, b=b,
                seqs=np.asarray(seqs)[:, 0], lengths=np.asarray(lengths)[:, 0],
                mfu=mfu)


def bench_train(remat=True, grad_accum=1, moment_dtype=None):
    """Stage-3 training step at production shapes (bart-large, x9 rotations,
    ResNet-101 over 10 images, AdamW, donation): s/step + tokens/s + MFU.

    ``remat``: True (full), False (none), or a jax.checkpoint_policies name
    (``--train_remat=`` flag) — A/B lever for the rotation recompute.
    ``grad_accum``: N accumulation microbatches of TRAIN_BATCH/N each at
    fixed global batch 8 (``--train_grad_accum=N``) — prices the
    accumulation mechanics; see the in-function note for why global-batch
    scaling on ONE chip is out (FSDP/multi-chip owns it)."""
    from multimodalsum_tpu.core.config import BartConfig
    from multimodalsum_tpu.models.multimodal import MultimodalSum, yelp_dummy_table
    from multimodalsum_tpu.train.loop import TrainStateWithStats, make_train_step_with_stats
    from multimodalsum_tpu.train.optim import NO_DECAY_MULTIMODAL, make_optimizer
    from multimodalsum_tpu.train.stages import multimodal_train_loss

    # params shared with the decode configs (dropout has no parameters, so
    # the tree is identical) but the model instance carries the training
    # dropout rate — the measured step includes dropout like production
    st = shared_model_state()
    params, batch_stats = st["params"], st["batch_stats"]
    cfg = BartConfig()  # dropout active
    # accumulation is measured at FIXED global batch (micro = 8/N): the
    # global-batch-16 form does not fit on one 16 GB v5e next to f32 AdamW
    # state (measured RESOURCE_EXHAUSTED with f32 AND bf16 accumulators) —
    # larger global batches are the FSDP/multi-chip path (parallel/), not a
    # single-chip accumulation trick; this row prices the accumulation
    # mechanics themselves (extra dispatches + accumulator traffic)
    b, t = TRAIN_BATCH, TRAIN_LEN
    model = MultimodalSum(cfg, dataset="yelp", img_model="resnet101",
                          dtype=jnp.bfloat16)
    field, _ = yelp_dummy_table(1)

    rng = np.random.default_rng(1)
    _, values = yelp_dummy_table(b)
    batch = dict(
        reviews=rng.integers(3, cfg.vocab_size, (b, 9, t)).astype(np.int32),
        reviews_mask=np.ones((b, 9, t), np.int32),
        reviews_rating=rng.integers(1, 6, (b, 9)).astype(np.float32),
        field_values=values,
        img=rng.normal(size=(b, N_IMG, 224, 224, 3)).astype(np.float32),
        img_mask=np.ones((b, N_IMG), bool),
    )
    # ``moment_dtype=bf16`` (--train_moment_dtype) halves AdamW m+v state
    # (~1.6 GB at bart-large) — the memory lever for the cheaper remat
    # policies (train/optim.scale_by_adam_dtyped; VERDICT r4 #5)
    md = jnp.bfloat16 if moment_dtype in ("bf16", "bfloat16") else None
    tx = make_optimizer(params, learning_rate=1e-5, total_steps=1000,
                        no_decay=NO_DECAY_MULTIMODAL, max_grad_norm=1.0,
                        moment_dtype=md)

    def loss_fn(p, stats, bt, r):
        return multimodal_train_loss(model, p, stats, dict(bt, field=field),
                                     label_smoothing=0.1, rng=r, remat=remat)

    if grad_accum > 1:
        # host-driven accumulation: the scan-form accum step at FULL
        # 12+12-layer geometry crashes the axon tunnel's remote-compile
        # helper (HTTP 500 at any remat setting; the half-depth program
        # compiles), so the bench measures the program-size-bounded
        # alternative — k micro-grad dispatches + one apply
        # (train/loop.make_host_accum_step, numerically equivalent)
        from multimodalsum_tpu.train.loop import make_host_accum_step

        # bf16 accumulator: the f32 one OOMs next to AdamW state on 16 GB
        # (see make_host_accum_step docstring for the rounding tradeoff)
        step = make_host_accum_step(loss_fn, tx, grad_accum,
                                    accum_dtype=jnp.bfloat16)
    else:
        step = jax.jit(make_train_step_with_stats(loss_fn, tx),
                       donate_argnums=0)
    state = TrainStateWithStats.create(params, batch_stats, tx)
    state = jax.device_put(state)
    batch = jax.device_put(batch)
    key = jax.device_put(jax.random.PRNGKey(2))
    _ = np.asarray(batch["reviews_mask"][:1, :1, :1])

    t0 = time.time()
    state, loss = step(state, batch, key)
    loss = float(loss)  # host sync
    print(f"# train compile+first step {time.time()-t0:.1f}s loss={loss:.3f}",
          flush=True)
    iters, times = 3, []
    for _ in range(iters):
        t0 = time.time()
        state, loss = step(state, batch, key)
        loss = float(loss)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    flops = train_step_flops(cfg, b)
    mfu = flops / dt / chip_peak_flops()
    tokens = b * 9 * t  # target tokens per step (9 rotations)
    print(f"# train: {dt:.3f}s/step batch {b}; {b/dt:.2f} groups/s; "
          f"{tokens/dt:.0f} target-tokens/s; MFU {mfu:.3f}", flush=True)
    out = dict(s_per_step=round(dt, 4), batch=b,
               groups_per_sec=round(b / dt, 3),
               target_tokens_per_sec=round(tokens / dt, 1),
               mfu=round(mfu, 4), remat=remat, grad_accum=grad_accum,
               moment_dtype="bfloat16" if md is not None else "float32")
    if grad_accum > 1:
        # self-describing accumulation semantics (these changed in r4:
        # FIXED global batch with micro 8/N, bf16 accumulator) so BENCH
        # json rows are comparable across rounds without code archaeology
        out.update(global_batch=b, micro_batch=b // grad_accum,
                   accum_dtype="bfloat16", accum_impl="host_driven")
    return out


GATE_SECTIONS = ("quant", "sched", "spec", "valmin", "randinit")


QUANT_TIERS = ("int8", "int4_r1", "int4+int8", "int4")


def resolve_quality_floor(gate: dict) -> tuple:
    """(floor_ok, source_ckpt) for the quant-promotion quality floor.

    The floor = the LEARNING-EVIDENCE checkpoint beats the lead-review
    baseline. That is ckpt_valmin when its section ran (the checkpoint one
    would ship — reference best-val gating, ``src/train_utils.py:82``): the
    overfit final save exists to give the quant ladder peaked logits and
    deliberately trades test gold score for train memorisation (r4: valmin
    goldRL 16.03 vs overfit 13.05), so keying the floor on IT would demote
    tiers for a property of the stress-test basis, not of the model or the
    tier. Falls back to the exact (overfit) verdict when no valmin section
    is present."""
    vm_floor = (gate.get("valmin") or {}).get("beats_lead_baseline")
    if vm_floor is not None:
        return bool(vm_floor), "valmin"
    return bool(gate.get("beats_lead_baseline")), "exact"


def restore_gate_ckpt(work_root: str) -> None:
    """Materialise the trained checkpoint from the committed pack when the
    gitignored ``_work/`` tree was cleaned between sessions (the driver's
    round-end bench must still be able to gate; see scripts/ckpt_pack.py).
    No-op when the checkpoint is already present or no pack is committed."""
    pack_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "assets", "real_ckpt_pack")
    # no early-out on the trained ckpt alone: a partially cleaned _work tree
    # (ckpt present but tok/, the data tree, or ckpt_valmin/ missing) still
    # needs the other pieces — unpack() is incremental and per-component
    # idempotent, restoring only what is absent
    if not os.path.isdir(pack_dir):
        return
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.ckpt_pack import unpack

    t0 = time.time()
    restored = unpack(pack_dir, work_root)
    print(f"# gate checkpoint restored from assets pack: {restored} "
          f"({time.time()-t0:.0f}s)", flush=True)


def quality_gate(work_root: str, timing_batch: int = 25,
                 sections=GATE_SECTIONS, quant_tiers=QUANT_TIERS,
                 dataset: str = "yelp", sched_spt=8):
    """Trained-weights quantization quality gate + bulk-scheduler A/B.

    Runs the REAL eval contract (reference ``src/test.py:222-236``) on the
    in-environment-trained bart-large checkpoint
    (``scripts/train_real_ckpt.py``): the 100-group Yelp test split, corpus
    BPE tokenizer, beam 5 / lp 2.0 / early stopping. For each kv_quant
    config it reports exact-output agreement, id-ROUGE-L vs the exact
    output, and gold ROUGE — measured on PEAKED logits, where quantization
    error shows real divergence instead of single-ULP coin flips (the
    random-init numbers of rounds 1-2 were meaningless lower bounds).

    GATE: the quantized throughput config is promoted to the bench headline
    iff its id-ROUGE-L vs the exact path is >= 95 on trained weights.

    Also A/Bs the static while_loop bulk decode against the continuous slot
    scheduler on the same real length distribution (VERDICT r2 #2).

    ``sections`` selects which parts run beyond the always-on exact pass:
    ``quant`` (int8/int4 ladder), ``sched`` (static-vs-continuous A/B),
    ``spec`` (greedy speculative decoding), ``valmin`` (gold-ROUGE of the
    stage-3 validation-minimum checkpoint ``ckpt_valmin/`` when present —
    the learning-evidence number; the overfit default ckpt deliberately
    memorises its train split and is only the right basis for the
    quantization comparison's peaked logits).
    """
    import types

    ckpt = os.path.join(work_root, "ckpt", f"multimodal_trained_{dataset}")
    if not os.path.exists(os.path.join(ckpt, "meta.json")):
        return {"skipped": f"no trained checkpoint at {ckpt}"}

    from multimodalsum_tpu.ckpt.checkpoint import load_eval_params, read_meta
    from multimodalsum_tpu.cli.common import load_tokenizer
    from multimodalsum_tpu.core.config import GenerationConfig
    from multimodalsum_tpu.data.multimodal_data import EvalDataset
    from multimodalsum_tpu.eval.harness import generate_summaries
    from multimodalsum_tpu.eval.metrics import aggregate_multi_reference
    from multimodalsum_tpu.eval.rouge_impl import plansum_tokens, rouge_l_pair

    st = shared_model_state(dataset)
    model = st["model"]
    tokenizer = load_tokenizer(types.SimpleNamespace(
        tokenizer_dir=os.path.join(work_root, "tok")))
    params, batch_stats = load_eval_params(ckpt, st["params"],
                                           st["batch_stats"])
    # one transfer for the ~7 eval passes (the harness's own device_put is
    # then a no-op; load_eval_params returns host trees)
    params, batch_stats = jax.device_put((params, batch_stats))
    ds_name, dataset = dataset, EvalDataset(work_root, dataset, "test")
    gen = GenerationConfig(num_beams=5, max_length=142, min_length=56,
                           length_penalty=2.0, early_stopping=True,
                           no_repeat_ngram_size=3)
    silent = lambda *a, **k: None

    # stage the fixed 100-group eval set on device ONCE (uint8 images,
    # normalised on device): the gate runs ~7 full passes over the same
    # rows, and per-pass float32 re-transfer over the remote device link —
    # not PIL, not the TPU — was what capped the r3 gate at 0.289 sum/s
    from multimodalsum_tpu.eval.harness import stage_eval_batches

    t0 = time.time()
    staged = stage_eval_batches(dataset, tokenizer, timing_batch)
    print(f"# gate: staged {len(dataset)} rows on device "
          f"({time.time()-t0:.0f}s)", flush=True)

    def run(tag, timed=False, gen_override=None, params_override=None,
            **kw):
        g = gen_override or gen
        p, bs = params_override or (params, batch_stats)
        # steady-state sum/s measured INSIDE the single pass (compile
        # excluded by the harness); a second timed call would re-trace the
        # jitted closures and measure XLA recompilation, not decode
        st_t = [] if timed else None
        preds = generate_summaries(model, p, bs, dataset,
                                   tokenizer, g, batch_size=timing_batch,
                                   log=silent, cache_mode="ancestry",
                                   steady_timing=st_t,
                                   staged_batches=staged, **kw)
        sps = None
        if st_t:
            rows, secs = st_t[0]
            sps = rows / secs if secs > 0 else None
        gold = aggregate_multi_reference(preds, dataset.summaries)
        return preds, gold, sps

    out = {"ckpt": ckpt, "ckpt_step": read_meta(ckpt).get("step"),
           "dataset": ds_name, "rows": len(dataset),
           # r4 re-grounding (VERDICT r3 weak #4): promotion is a QUALITY
           # claim, so the primary criterion is gold-ROUGE — the tier must
           # cost <= 0.5 gold RL vs its decode basis AND the model itself
           # must clear the learning floor (beats the lead-review extractive
           # baseline; quality deltas measured on a model that loses to a
           # trivial baseline are noise). id-ROUGE-L stays recorded as the
           # token-fidelity diagnostic. r5 (VERDICT r4 #3): the quant ladder
           # decodes the VAL-MIN checkpoint — the artifact one would ship —
           # when its section ran; the overfit save is only the fallback
           # basis (quantization error is checkpoint-dependent, so deltas
           # measured on a checkpoint nobody ships prove nothing about the
           # one that passes the floor).
           "criterion_version": "r5",
           "gate_criterion": "learning floor (valmin beats_lead_baseline; "
                             "exact's if no valmin section) and "
                             "gold_rougeL >= basis_gold_rougeL - 0.5, "
                             "quant decoded on the quant_basis ckpt "
                             "(valmin when present, else overfit exact; "
                             "id_rougeL recorded as diagnostic)"}
    # trivial extractive baseline the trained model must beat (learning
    # evidence, VERDICT r2 #6): each group's FIRST review as the summary
    lead = aggregate_multi_reference([r[0] for r in dataset.reviews],
                                     dataset.summaries)
    out["lead_review_baseline"] = {k: round(v, 2) for k, v in lead.items()}
    t0 = time.time()
    exact_preds, exact_gold, exact_sps = run("exact", timed=True)
    out["exact"] = {k: round(v, 2) for k, v in exact_gold.items()}
    out["beats_lead_baseline"] = exact_gold["rougeL"] > lead["rougeL"]
    out["exact"]["bulk_static_sps"] = round(exact_sps, 3) if exact_sps else None
    mean_toks = np.mean([len(tokenizer.encode(p)) for p in exact_preds])
    out["exact"]["mean_len_tokens"] = round(float(mean_toks), 1)
    print(f"# gate[exact]: goldRL {exact_gold['rougeL']:.2f}, "
          f"static {exact_sps or 0:.2f} sum/s steady, "
          f"mean len {mean_toks:.0f} ({time.time()-t0:.0f}s)", flush=True)

    def seq_compare(preds, ref_preds):
        """Quantified sequence agreement (a bare ``==`` bool can't separate
        "1 near-tie flip in 100 rows" from "broken engine")."""
        toks = [plansum_tokens(p) for p in preds]
        rtoks = [plansum_tokens(p) for p in ref_preds]
        idrl = 100 * float(np.mean([rouge_l_pair(a, b)
                                    for a, b in zip(toks, rtoks)]))
        pref = float(np.mean([prefix_match_fraction(b, a)
                              for a, b in zip(toks, rtoks)]))
        return {"identical_rows": sum(p == q for p, q in zip(preds, ref_preds)),
                "rows": len(preds), "id_rougeL": round(idrl, 2),
                "mean_prefix_match": round(pref, 4)}

    # honest-generalisation checkpoint (VERDICT r2 #6): the overfit ckpt
    # above is the right basis for the quantization gate (peaked logits)
    # but it memorises its train split — its gold ROUGE understates what
    # the model learned (measured val loss 6.15 at epoch 70 vs the 5.37
    # minimum at epoch 55). When the val-min stage-3 variant exists
    # (scripts/train_real_ckpt.py STAGE3_EPOCHS=55
    # STAGE3_CKPT_ROOT=ckpt_valmin), score ITS exact decode against gold
    # and the lead-review extractive baseline: that pair is the learning
    # evidence (reference metric contract src/test.py:222-236).
    vm = os.path.join(work_root, "ckpt_valmin",
                      f"multimodal_trained_{ds_name}")
    # quant decode basis (r5): valmin when its section runs, else overfit
    quant_basis = "overfit"
    basis_preds, basis_gold, basis_params = exact_preds, exact_gold, None
    if "valmin" in sections and os.path.exists(os.path.join(vm, "meta.json")):
        t0 = time.time()
        pv = jax.device_put(load_eval_params(vm, st["params"],
                                             st["batch_stats"]))
        vm_preds, vm_gold, _ = run("valmin-exact", params_override=pv)
        meta_vm = read_meta(vm)
        out["valmin"] = {
            "ckpt": vm, "ckpt_step": meta_vm.get("step"),
            "val_loss": meta_vm.get("val_loss"),
            "exact": {k: round(v, 2) for k, v in vm_gold.items()},
            "beats_lead_baseline": vm_gold["rougeL"] > lead["rougeL"],
            "vs_overfit": seq_compare(vm_preds, exact_preds),
        }
        print(f"# gate[valmin]: goldRL {vm_gold['rougeL']:.2f} vs lead "
              f"baseline {lead['rougeL']:.2f} vs overfit "
              f"{exact_gold['rougeL']:.2f} "
              f"-> beats_baseline={out['valmin']['beats_lead_baseline']} "
              f"({time.time()-t0:.0f}s)", flush=True)
        quant_basis = "valmin"
        basis_preds, basis_gold, basis_params = vm_preds, vm_gold, pv

    # learning-evidence floor: the SAME eval contract on the random-init
    # params. The trained-vs-random gold-ROUGE delta is the direct
    # demonstration that training moved the model (the lead-review
    # extractive baseline is made of real human text, so a from-scratch
    # model trained on 170 groups can trail it while still having learned
    # a great deal).
    if "randinit" in sections:
        t0 = time.time()
        _, ri_gold, _ = run("randinit",
                            params_override=(st["params"], st["batch_stats"]))
        out["randinit"] = {k: round(v, 2) for k, v in ri_gold.items()}
        print(f"# gate[randinit]: goldRL {ri_gold['rougeL']:.2f} "
              f"(untrained floor; trained exact {exact_gold['rougeL']:.2f}) "
              f"({time.time()-t0:.0f}s)", flush=True)

    if "quant" in sections:
        out["quant_basis"] = quant_basis
        out["quant_basis_gold_rougeL"] = round(basis_gold["rougeL"], 2)
    basis_tok = [plansum_tokens(p) for p in basis_preds]
    for kvq in (quant_tiers if "quant" in sections else ()):
        t0 = time.time()
        try:
            preds, gold, _ = run(kvq, kv_quant=kvq,
                                 params_override=basis_params)
        except Exception as e:  # a failing tier must not sink the others
            print(f"# gate[{kvq}]: FAILED {e!r}", flush=True)
            out[kvq] = {"failed": repr(e)}
            continue
        agree = sum(p == e for p, e in zip(preds, basis_preds))
        idrl = 100 * np.mean([rouge_l_pair(plansum_tokens(p), e)
                              for p, e in zip(preds, basis_tok)])
        out[kvq] = {
            "basis": quant_basis,
            "agreement": round(agree / len(preds), 4),
            "id_rougeL": round(float(idrl), 2),
            "gold": {k: round(v, 2) for k, v in gold.items()},
            "gold_delta": round(gold["rougeL"] - basis_gold["rougeL"], 2),
        }
        print(f"# gate[{kvq}] on {quant_basis}: agreement "
              f"{agree}/{len(preds)}, id-RL {idrl:.2f}, goldRL "
              f"{gold['rougeL']:.2f} (delta {out[kvq]['gold_delta']:+.2f}, "
              f"{time.time()-t0:.0f}s)", flush=True)

    # bulk-scheduler A/B on the same real length distribution. Guarded like
    # the quant tiers: the slot engine allocates big per-slot slabs and can
    # RESOURCE_EXHAUST when the gate runs inside a full-bench process whose
    # b72 ladders already fragmented HBM (measured r5) — a failing section
    # must record its error, not sink the sections already measured
    if "sched" in sections:
        t0 = time.time()
        try:
            cont_preds, _, cont_sps = run("continuous", timed=True,
                                          scheduler="continuous",
                                          n_slots=timing_batch,
                                          steps_per_tick=sched_spt)
            out["bulk_continuous_sps"] = (round(cont_sps, 3)
                                          if cont_sps else None)
            out["bulk_continuous_spt"] = sched_spt
            out["continuous_vs_static"] = seq_compare(cont_preds, exact_preds)
            print(f"# gate[continuous]: {cont_sps or 0:.2f} sum/s steady vs "
                  f"static {out['exact']['bulk_static_sps']} "
                  f"(identical {out['continuous_vs_static']['identical_rows']}/"
                  f"{out['continuous_vs_static']['rows']}, id-RL "
                  f"{out['continuous_vs_static']['id_rougeL']}, "
                  f"{time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"# gate[continuous]: FAILED {e!r}", flush=True)
            out["bulk_continuous_sps"] = None
            out["sched_failed"] = repr(e)[:300]

    # speculative decoding where it matters (VERDICT r2 #4): greedy decode
    # of the real reviews under TRAINED weights, prompt-lookup drafts from
    # each row's own sources, classic vs spec_window=4. Verification is
    # exact in exact arithmetic, but the k-token verify forward batches
    # matmuls differently from the 1-token step, so bf16 rounding can flip
    # near-argmax ties (measured r4: 84/100 identical, id-RL 93.2 — the
    # same effect batch-size changes have on any bf16 decode)
    gen1 = gen.replace(num_beams=1)
    spec = {}
    for w, tag in ((1, "classic"), (4, "spec_w4")) if "spec" in sections else ():
        eng_stats: dict = {}
        try:
            preds1, _, sps1 = run(f"greedy-{tag}", timed=True,
                                  scheduler="continuous",
                                  n_slots=timing_batch, steps_per_tick=8,
                                  spec_window=w, gen_override=gen1,
                                  stats_out=eng_stats)
        except Exception as e:  # same engine-slab OOM guard as sched
            print(f"# gate[greedy-{tag}]: FAILED {e!r}", flush=True)
            spec[tag] = {"sps": None, "failed": repr(e)[:300]}
            if w == 1:
                break  # no classic baseline -> the spec leg is meaningless
            continue
        spec[tag] = {"sps": round(sps1, 3) if sps1 else None}
        if w == 1:
            greedy_classic = preds1
        else:
            spec["vs_classic"] = seq_compare(preds1, greedy_classic)
            if spec["classic"]["sps"] and spec["spec_w4"]["sps"]:
                spec["speedup"] = round(spec["spec_w4"]["sps"]
                                        / spec["classic"]["sps"], 3)
            # measured prompt-lookup acceptance on TRAINED weights over the
            # real reviews (VERDICT r2 #4) — replaces the random-init caveat
            if eng_stats.get("spec"):
                spec["acceptance"] = eng_stats["spec"]
                print(f"# gate[spec acceptance]: "
                      f"{eng_stats['spec']['tokens_per_window']:.2f} "
                      f"tokens/window (draft acceptance "
                      f"{eng_stats['spec']['draft_acceptance']:.1%})",
                      flush=True)
        print(f"# gate[greedy-{tag}]: {sps1 or 0:.2f} sum/s steady", flush=True)
    if spec:
        out["greedy_spec"] = spec
    return out


def _require_live_backend(timeout_s: float = 180.0) -> None:
    """Fail loudly (clear message, nonzero exit) if JAX backend init hangs.

    The axon tunnel can wedge upstream (observed 2026-08-17: the terminal
    stopped answering mid-round and ``jax.devices()`` blocked forever); a
    silent hang until the driver's timeout looks like a bench bug, a clear
    tail does not. The probe runs in a daemon thread — on success the main
    thread reuses the already-initialised client."""
    import threading

    ok = threading.Event()
    failed: list = []

    def _probe():
        try:
            jax.devices()
        except BaseException as e:  # noqa: BLE001 — report raise vs hang
            failed.append(e)
        finally:
            ok.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not ok.wait(timeout_s):
        print(f"# FATAL: JAX backend did not initialise within {timeout_s:.0f}s "
              f"— device tunnel unreachable (jax.devices() still blocked). "
              f"No measurement possible on this host right now.", flush=True)
        sys.exit(3)
    if failed:
        print(f"# FATAL: JAX backend initialisation raised: {failed[0]!r}",
              flush=True)
        sys.exit(3)


def probe_native_int4_jit_boundary() -> bool:
    """Regression probe (VERDICT r2 weak #6): serving keeps PACKED-BYTE int4
    slot slabs because a ``jnp.int4`` array returned from one jit and fed to
    another takes the experimental axon dev backend down. Runs in a
    SUBPROCESS (the failure can be fatal to the process) BEFORE this process
    claims the chip. The moment this reports True on a production backend,
    set ``MMS_NATIVE_INT4_SLABS=1`` to flip serving slabs to the faster
    native dtype (decode/serving.py wires the switch)."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp\n"
        "a = jax.jit(lambda x: x.astype(jnp.int4))("
        "jnp.arange(8, dtype=jnp.int8))\n"
        "b = jax.jit(lambda q: q.astype(jnp.bfloat16).sum())(a)\n"
        "print('INT4_XJIT_OK', float(b))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=180)
        return r.returncode == 0 and "INT4_XJIT_OK" in r.stdout
    except Exception:
        return False


def main():
    # probe before claiming the chip (only one process can hold it)
    int4_xjit_ok = (all(f not in sys.argv for f in
                        ("--no-probe", "--train-only", "--gate-only"))
                    and probe_native_int4_jit_boundary())
    if int4_xjit_ok:
        print("# NOTE: native jnp.int4 now survives jit boundaries on this "
              "backend - set MMS_NATIVE_INT4_SLABS=1 for serving", flush=True)
    _require_live_backend()
    if "--pallas" in sys.argv:
        from multimodalsum_tpu.ops.attention import set_entity_attention_impl

        set_entity_attention_impl("pallas")

    # (batch, cache_mode, kv_quant) attempts, best-first, from the measured
    # batch sweep on one v5e chip (SCALING.md table; r2 exact sweep:
    # b44 12.98 > b42 12.93 > b36 12.45 > b48 12.24 > b40 11.96; b52+ OOM).
    attempts_exact = [(44, "ancestry", None), (48, "ancestry", None),
                      (32, "ancestry", None), (32, "reorder", None),
                      (8, "reorder", None)]
    # int4 uses the native jnp.int4 dtype (XLA fuses the widening into the
    # dot operand load — measured 19.2 sum/s at b72 vs 17.4 for int8; the
    # manual nibble-packed int4 loses, SCALING.md). BOTH tiers are measured
    # every run: the trained-weights gate decides per-tier which may claim
    # the headline (int4 is faster but fails the gate on peaked logits —
    # id-RL 80.9 — while int8 passes at 97.3), so the headline candidate is
    # the fastest tier that PASSES, not the fastest tier outright.
    attempts_quant = {
        "int4": [(72, "ancestry", "int4")],
        # rank-1 scales: same int4 reads, finer effective precision — the
        # tier built to pass the trained-weights gate at ~int4 speed
        "int4_r1": [(72, "ancestry", "int4_r1")],
        "int8": [(72, "ancestry", "int8"), (64, "ancestry", "int8"),
                 (32, "ancestry", "int8")],
    }

    cache_mode = kv_quant = batch = None
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        elif a.startswith("--cache_mode="):
            cache_mode = a.split("=")[1]
        elif a.startswith("--kv_quant="):
            kv_quant = a.split("=")[1]
        elif a == "--ancestry":  # back-compat
            cache_mode = "ancestry"
    explicit = bool(batch or cache_mode or kv_quant)

    train_remat = True
    train_ga = 1
    train_md = None
    for a in sys.argv:
        if a.startswith("--train_remat="):
            v = a.split("=", 1)[1]
            train_remat = {"true": True, "false": False}.get(v.lower(), v)
        elif a.startswith("--train_grad_accum="):
            train_ga = int(a.split("=", 1)[1])
        elif a.startswith("--train_moment_dtype="):
            train_md = a.split("=", 1)[1]
    if "--train-only" in sys.argv:
        print(json.dumps({"train": bench_train(remat=train_remat,
                                       grad_accum=train_ga,
                                       moment_dtype=train_md)}))
        return
    if "--gate-only" in sys.argv:
        root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "_work", "real_ckpt")
        sections = GATE_SECTIONS
        tiers = QUANT_TIERS
        ds = "yelp"
        tb = None
        kw_spt = None
        for a in sys.argv:
            if a.startswith("--gate_root="):
                root = a.split("=", 1)[1]
            elif a.startswith("--gate_sections="):
                # e.g. --gate_sections=valmin runs only exact + valmin
                sections = tuple(a.split("=", 1)[1].split(","))
            elif a.startswith("--gate_tiers="):
                # e.g. --gate_tiers=int4_r1 measures one quant tier
                tiers = tuple(a.split("=", 1)[1].split(","))
            elif a.startswith("--gate_dataset="):
                ds = a.split("=", 1)[1]
            elif a.startswith("--gate_batch="):
                tb = int(a.split("=", 1)[1])
            elif a.startswith("--gate_spt="):
                # sched-section steps_per_tick: an int or 'auto' (the r5
                # steady-occupancy tuner A/B, VERDICT r4 #7)
                v = a.split("=", 1)[1]
                kw_spt = v if v == "auto" else int(v)
        # --no-restore: score a CANDIDATE root (e.g. a symlinked view of a
        # ckpt_r5 training run) without the committed pack re-materialising
        # the shipped checkpoints into it
        if "--no-restore" not in sys.argv:
            restore_gate_ckpt(root)
        kw = {"timing_batch": tb} if tb else {}
        if kw_spt is not None:
            kw["sched_spt"] = kw_spt
        print(json.dumps({"trained_gate": quality_gate(
            root, sections=sections, quant_tiers=tiers, dataset=ds, **kw)}))
        return

    from multimodalsum_tpu.core.config import BartConfig

    inputs = make_inputs(BartConfig())
    fallbacks = []

    def run_attempts(attempts, tag):
        for b, cm, kvq in attempts:
            try:
                print(f"# config[{tag}]: batch={b} cache_mode={cm} kv_quant={kvq}",
                      flush=True)
                out = bench_batch(inputs, b, cache_mode=cm, kv_quant=kvq)
                return out, dict(batch=b, cache_mode=cm, kv_quant=kvq)
            except Exception:
                fallbacks.append(dict(tag=tag, batch=b, cache_mode=cm,
                                      kv_quant=kvq, error="failed"))
                print(f"# config (batch={b}, {cm}, {kvq}) failed, falling back:",
                      flush=True)
                traceback.print_exc()
        return None, None

    if explicit:
        first = (attempts_quant.get(kv_quant, attempts_quant["int8"])[0]
                 if kv_quant not in (None, "none") else attempts_exact[0])
        one = [(batch or first[0], cache_mode or first[1],
                None if (kv_quant in (None, "none")) else kv_quant)]
        out, cfg_used = run_attempts(one, "explicit")
        if out is None:
            raise SystemExit("bench failed at the requested config")
        record = {
            "metric": "multimodal_beam5_summaries_per_sec_per_chip",
            "value": round(out["sps"], 3),
            "unit": "summaries/sec/chip",
            "vs_baseline": round(out["sps"] / A100_REFERENCE_SUMMARIES_PER_SEC, 3),
            "config": cfg_used, "fallbacks": fallbacks,
            "decode_mfu": round(out["mfu"], 4),
        }
        print(json.dumps(record))
        return

    exact, cfg_exact = run_attempts(attempts_exact, "exact")
    if exact is None:
        raise SystemExit("bench failed at every exact config")

    quants = {}  # kvq tier -> (out, cfg); every tier is a gate candidate
    if "--exact" not in sys.argv:
        for kvq, ladder in attempts_quant.items():
            out_q, cfg_q = run_attempts(ladder, f"quant-{kvq}")
            if out_q is not None:
                quants[kvq] = (out_q, cfg_q)
    quant, cfg_quant = (max(quants.values(), key=lambda t: t[0]["sps"])
                        if quants else (None, None))

    record = {
        "metric": "multimodal_beam5_summaries_per_sec_per_chip",
        # headline = the token-exact path: its quality is the reference's by
        # construction (the quantized figure is reported alongside, with its
        # measured quality delta, instead of being claimed as the headline)
        "value": round(exact["sps"], 3),
        "unit": "summaries/sec/chip",
        "vs_baseline": round(exact["sps"] / A100_REFERENCE_SUMMARIES_PER_SEC, 3),
        "value_exact": round(exact["sps"], 3),
        "config_exact": cfg_exact,
        "decode_mfu": round(exact["mfu"], 4),
        "fallbacks": fallbacks,
        # regression probe: flips to true when the backend supports native
        # jnp.int4 across jit boundaries (then flip serving slabs via
        # MMS_NATIVE_INT4_SLABS=1 — see decode/serving.py)
        "native_int4_jit_boundary_ok": int4_xjit_ok,
    }

    if quant is not None:
        n = min(exact["b"], quant["b"])
        agree = 0
        rl = []
        from multimodalsum_tpu.eval.rouge_impl import rouge_l_pair

        prefix = []
        for i in range(n):
            se = exact["seqs"][i][: exact["lengths"][i]].tolist()
            sq = quant["seqs"][i][: quant["lengths"][i]].tolist()
            agree += int(se == sq)
            rl.append(rouge_l_pair([str(x) for x in sq], [str(x) for x in se]))
            prefix.append(prefix_match_fraction(se, sq))
        record.update({
            "value_quantized": round(quant["sps"], 3),
            "config_quantized": cfg_quant,
            "quant_token_agreement": round(agree / n, 4),
            "quant_prefix_agreement": round(sum(prefix) / n, 4),
            "quant_rougeL_vs_exact": round(100 * sum(rl) / len(rl), 2),
            "quant_compared_rows": n,
            "quant_tiers": {k: {"sps": round(o["sps"], 3),
                                "batch": c["batch"]}
                            for k, (o, c) in quants.items()},
        })
        print(f"# quant quality vs exact on {n} rows: "
              f"agreement {agree}/{n}, mean prefix match "
              f"{record['quant_prefix_agreement']:.2%}, id-ROUGE-L "
              f"{record['quant_rougeL_vs_exact']}", flush=True)

    # trained-checkpoint quality gate (VERDICT r3 #1): decides whether the
    # quantized throughput config may claim the headline
    gate_root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "_work", "real_ckpt")
    # the default (driver) run keeps the gate bounded: quant decides the
    # headline promotion, valmin is the learning evidence; the sched/spec
    # sections are measurement-only and run via --gate-only/--gate_sections
    # (their dated numbers live in SCALING.md and GATE_r{N}.json)
    gate_sections = ("quant", "valmin")
    for a in sys.argv:
        if a.startswith("--gate_root="):
            gate_root = a.split("=", 1)[1]
        elif a.startswith("--gate_sections="):
            gate_sections = tuple(a.split("=", 1)[1].split(","))
    if "--no-gate" not in sys.argv:
        try:
            restore_gate_ckpt(gate_root)
            record["trained_gate"] = quality_gate(gate_root,
                                                  sections=gate_sections)
        except Exception:
            print("# quality gate failed:", flush=True)
            traceback.print_exc()
            record["trained_gate"] = {"skipped": "gate raised (see stderr)"}
        # amazon trained-checkpoint gate (VERDICT r4 #4): quality-only
        # section (exact + valmin + lead baseline over the 32-product test
        # set; the throughput configs above are the yelp geometry)
        amz = os.path.join(gate_root, "ckpt", "multimodal_trained_amazon")
        if os.path.exists(os.path.join(amz, "meta.json")):
            try:
                record["trained_gate_amazon"] = quality_gate(
                    gate_root, timing_batch=16, sections=("valmin",),
                    dataset="amazon")
            except Exception:
                print("# amazon quality gate failed:", flush=True)
                traceback.print_exc()
                record["trained_gate_amazon"] = {
                    "skipped": "gate raised (see stderr)"}
        gate = record["trained_gate"]
        # per-tier verdicts: the headline goes to the FASTEST measured tier
        # that clears the gate — int4 being fastest but failing must not
        # block a slower-but-passing int8. Criterion (r4, VERDICT r3 #5):
        # the model beats the lead-review baseline (quality floor — without
        # it gold deltas are noise) AND the tier costs <= 0.5 gold ROUGE-L
        # vs the exact path; id-RL recorded as the token-fidelity diagnostic.
        verdicts = {}
        floor_ok, floor_src = resolve_quality_floor(gate)
        for kvq, (out_q, _) in quants.items():
            g = gate.get(kvq)
            if isinstance(g, dict) and "id_rougeL" in g:
                # r5: delta vs the tier's decode basis (valmin when present
                # — the checkpoint one would ship), emitted by quality_gate
                delta = g.get("gold_delta")
                ok = bool(floor_ok and delta is not None and delta >= -0.5)
                verdicts[kvq] = {"sps": round(out_q["sps"], 3),
                                 "id_rougeL": g["id_rougeL"],
                                 "gold_rougeL_delta": delta,
                                 "delta_basis": g.get("basis"),
                                 "quality_floor": floor_ok,
                                 "quality_floor_ckpt": floor_src,
                                 "passed": ok}
                print(f"# gate verdict[{kvq}]: gold-RL delta {delta} on "
                      f"{g.get('basis')} (floor "
                      f"{'ok' if floor_ok else 'MISSED'}, id-RL "
                      f"{g['id_rougeL']}) -> "
                      f"{'eligible' if ok else 'demoted'} "
                      f"({out_q['sps']:.2f} sum/s)", flush=True)
        record["gate_verdicts"] = verdicts
        passing = [(v["sps"], k) for k, v in verdicts.items() if v["passed"]]
        if passing and max(passing)[0] > exact["sps"]:
            sps_win, kvq_win = max(passing)
            record["value"] = sps_win
            record["vs_baseline"] = round(
                sps_win / A100_REFERENCE_SUMMARIES_PER_SEC, 3)
            record["headline_config"] = (
                f"quantized {kvq_win} (passed trained gate, "
                f"id-RL {verdicts[kvq_win]['id_rougeL']})")
            print(f"# GATE PASSED: {kvq_win} promoted to headline "
                  f"({sps_win} sum/s)", flush=True)
        elif verdicts:
            record["headline_config"] = (
                "exact (no quantized tier both passed the gate and beat "
                "the exact throughput)")
            print("# GATE: headline stays token-exact", flush=True)

    if "--no-train" not in sys.argv:
        # the amazon gate pins a SECOND full bart-large model in _SHARED
        # (~3.2 GB f32) that nothing after it needs; the train bench's
        # AdamW state + activations then no longer fit (measured r5: the
        # train section OOM'd only once the amazon section existed)
        _SHARED.pop("amazon", None)
        try:
            record["train"] = bench_train(remat=train_remat,
                                          grad_accum=train_ga,
                                          moment_dtype=train_md)
        except Exception:
            print("# train bench failed:", flush=True)
            traceback.print_exc()
            record["train"] = None

    print(json.dumps(record))


if __name__ == "__main__":
    main()
