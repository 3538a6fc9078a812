"""Flagship benchmark: multimodal beam-search summarization throughput.

Measures end-to-end summaries/sec/chip for the production eval configuration
(reference ``src/test.py:156-181``): Yelp groups of 8 reviews x 160 tokens,
47-row table, 10 images, BART-large multimodal decoder, beam 5, max_length
142 (config default), no_repeat_ngram 3, early stopping — the whole pipeline
(3 encoders + on-device beam search) jitted, bf16.

Default serving config (measured-best on one TPU v5e chip, 2026-08 A/B —
SCALING.md has the full table): batch 72, reorder-free ancestry beam cache,
scale-folded int8 cross-attention KV. Falls back to smaller batches / exact config
automatically if compilation fails (e.g. memory on a smaller chip).
``--exact`` benchmarks the fully token-exact path (no KV quantization)
instead; ``--cache_mode/--kv_quant/--batch/--pallas`` override individually.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against an estimated 2.0 summaries/sec for the
reference PyTorch implementation on one A100 (batch 8, beam 5, ~142
host-synced single-token decoder steps per summary — the reference beam loop
round-trips GPU->host every token, see SURVEY.md §3.4). The reference repo
publishes no numbers (BASELINE.md), so this anchor is an engineering
estimate, stated here for transparency.
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

A100_REFERENCE_SUMMARIES_PER_SEC = 2.0


def bench_batch(b: int, cache_mode: str = "reorder", kv_quant: str | None = None) -> float:
    from multimodalsum_tpu.core.config import BartConfig, GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.models.multimodal import MultimodalSum, yelp_dummy_table

    cfg = BartConfig(dropout=0.0)
    gen = GenerationConfig(
        num_beams=5, max_length=142, min_length=56, length_penalty=2.0,
        early_stopping=True, no_repeat_ngram_size=3,
    )
    model = MultimodalSum(cfg, dataset="yelp", img_model="resnet101", dtype=jnp.bfloat16)
    bart = BartModel(cfg, multimodal=True, dtype=model.dtype)

    e, s, n_img = 8, 160, 10
    rng = np.random.default_rng(0)
    reviews = rng.integers(3, cfg.vocab_size, (b * e, s)).astype(np.int32)
    reviews_mask = np.ones((b * e, s), np.int32)
    field, values = yelp_dummy_table(b)
    img = rng.normal(size=(b, n_img, 224, 224, 3)).astype(np.float32)
    img_mask = np.ones((b, n_img), bool)

    t0 = time.time()
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), field, yelp_dummy_table(1)[1],
                           method=MultimodalSum.init_all)
    )()
    params, batch_stats = variables["params"], variables["batch_stats"]
    print(f"# init {time.time()-t0:.1f}s", flush=True)

    # ResNet over b*10 images in one shot peaks activation memory; encoding
    # in lax.map chunks lowers pressure and measured slightly faster at b64
    img_chunks = max(1, b // 16)

    def pipeline(params, batch_stats, reviews, reviews_mask, field, values, img, img_mask):
        vs = {"params": params, "batch_stats": batch_stats}
        text_h = model.apply(vs, reviews.reshape(b, e, s), reviews_mask.reshape(b, e, s),
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
        text_m = reviews_mask.reshape(b, e, s).astype(bool)
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
    dt = sum(times) / iters
    print(f"# steady-state: {dt:.3f}s/batch of {b}; ~{int(lengths.sum())} tokens; "
          f"{b/dt:.2f} summaries/s", flush=True)
    return b / dt


def main():
    if "--pallas" in sys.argv:
        from multimodalsum_tpu.ops.attention import set_entity_attention_impl

        set_entity_attention_impl("pallas")

    # (batch, cache_mode, kv_quant) attempts, best-first. Measured on one
    # v5e chip: b72/ancestry/int8 17.4 sum/s (the sharp peak of the batch
    # sweep: b64 15.0, b68 16.1, b76 15.0, b80 13.1); b48/ancestry/exact
    # 12.25; b32/reorder/exact 4.3; b96+ fail to compile (HBM).
    attempts = [(72, "ancestry", "int8"), (64, "ancestry", "int8"),
                (48, "ancestry", None), (32, "ancestry", None),
                (32, "reorder", None), (8, "reorder", None)]
    if "--exact" in sys.argv:
        attempts = [a for a in attempts if a[2] is None]

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
    if batch or cache_mode or kv_quant:
        first = attempts[0]
        attempts = [(batch or first[0], cache_mode or first[1],
                     kv_quant if kv_quant is not None else first[2])]
        attempts = [(b, c, None if q in (None, "none") else q)
                    for (b, c, q) in attempts]

    summaries_per_sec = None
    for b, cm, kvq in attempts:
        try:
            print(f"# config: batch={b} cache_mode={cm} kv_quant={kvq}", flush=True)
            summaries_per_sec = bench_batch(b, cache_mode=cm, kv_quant=kvq)
            break
        except Exception:
            print(f"# config (batch={b}, {cm}, {kvq}) failed, falling back:", flush=True)
            traceback.print_exc()
    if summaries_per_sec is None:
        raise SystemExit("bench failed at every config")

    print(json.dumps({
        "metric": "multimodal_beam5_summaries_per_sec_per_chip",
        "value": round(summaries_per_sec, 3),
        "unit": "summaries/sec/chip",
        "vs_baseline": round(summaries_per_sec / A100_REFERENCE_SUMMARIES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
