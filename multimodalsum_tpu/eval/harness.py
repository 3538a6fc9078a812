"""End-to-end evaluation harness (reference ``src/test.py:137-236``).

Loads a MultimodalSum checkpoint, runs the three encoders + on-device beam
search over the gold evaluation set, decodes, and scores with the PlanSum
ROUGE protocol (averaged over the multiple gold summaries for Amazon).

The whole generate pipeline is one jitted function per batch shape; unlike
the reference (host-synced Python beam loop, ``src/test.py`` hot loop), the
TPU runs the full beam search without host round-trips.
"""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from multimodalsum_tpu.core.config import GenerationConfig
from multimodalsum_tpu.data.multimodal_data import EvalDataset
from multimodalsum_tpu.data.tables import stack_features
from multimodalsum_tpu.decode.engine import generate
from multimodalsum_tpu.eval.metrics import aggregate_multi_reference
from multimodalsum_tpu.models.bart import BartModel
from multimodalsum_tpu.models.multimodal import MultimodalSum


def normalize_images(img, img_mask):
    """Device-side ImageNet normalisation for uint8-shipped eval images
    (shared device-side formula: :mod:`multimodalsum_tpu.ops.images`)."""
    from multimodalsum_tpu.ops.images import normalize_uint8_images

    return normalize_uint8_images(img, img_mask)


def stage_eval_batches(dataset: EvalDataset, tokenizer, batch_size: int,
                       to_device: bool = True):
    """Assemble the full eval set ONCE as fixed-shape batches (uint8
    images) and optionally pin them on device — ``bench.py``'s quality gate
    runs ~7 full eval passes over the same fixed rows, so per-pass host
    re-assembly + re-transfer is pure waste. Returns a list of
    ``(real_rows, arrays)`` consumable via ``generate_summaries(...,
    staged_batches=...)``. Device cost: ~150 MB uint8 for the 100-group
    Yelp set."""
    batches = []
    n = len(dataset)
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        real = len(idxs)
        while len(idxs) < batch_size:  # pad final batch to the jit shape
            idxs.append(idxs[-1])
        rows = [dataset.example(i, tokenizer, raw_uint8=True) for i in idxs]
        arrs = (
            np.stack([r["reviews"] for r in rows]),
            np.stack([r["reviews_mask"] for r in rows]),
            stack_features([r["field_values"] for r in rows]),
            np.stack([r["img"] for r in rows]),
            np.stack([r["img_mask"] for r in rows]),
        )
        if to_device:
            arrs = jax.device_put(arrs)
        batches.append((real, arrs))
    return batches


def generate_summaries(
    model: MultimodalSum,
    params,
    batch_stats,
    dataset: EvalDataset,
    tokenizer,
    gen: GenerationConfig,
    batch_size: int = 8,
    log=print,
    kv_quant: str | None = None,
    self_kv_quant: str | None = None,
    cache_mode: str | None = None,
    mesh=None,
    scheduler: str = "static",
    n_slots: int | None = None,
    steps_per_tick: int = 8,
    spec_window: int = 1,
    spec_ngram: int = 2,
    steady_timing: list | None = None,
    stats_out: dict | None = None,
    staged_batches: list | None = None,
) -> List[str]:
    """``cache_mode=None`` resolves to "ancestry" on a single device (2.5x
    faster, token-identical — SCALING.md) but "reorder" under a mesh: the
    ancestry one-hot gather contracts over the full (batch-sharded) row
    axis, which SPMD can only lower with per-step cross-device KV movement,
    while the reorder ``take`` stays shard-local.

    ``spec_window > 1`` (continuous + greedy only) decodes with prompt-lookup
    speculative verification: each row's own review tokens feed the draft
    lookup (summaries quote their sources heavily), committed prefixes are
    verified-exact so outputs stay token-identical.

    ``steady_timing``, if given a list, receives one ``(rows, seconds)``
    tuple measuring steady-state throughput with compilation excluded:
    the static path times every batch after the first (batch 1 carries the
    jit compile), the continuous path times from the end of the first
    engine tick (which carries the tick-fn compile) to drain. A fresh call
    re-traces its jitted closures, so "run twice and time the second call"
    measures XLA recompilation, not decode — this is the honest
    alternative.

    ``stats_out``, if given a dict, receives the continuous engine's
    counters at drain (ticks, tokens_out, ...) plus a ``"spec"`` entry with
    the measured speculative acceptance when ``spec_window > 1``.

    ``scheduler="continuous"`` replaces the static all-rows while_loop with
    the slot-based continuous batcher (``decode/serving.ContinuousBatcher``,
    token-identical outputs): finished rows free their slot immediately and
    the next queued row refills it, so with ``early_stopping`` (the
    reference eval contract, ``src/test.py:156-158``) the batch never waits
    for its slowest row — the static path pays max(len) per batch where
    this pays ~mean(len). ``n_slots`` defaults to ``batch_size``;
    ``steps_per_tick`` amortises the per-tick host sync on remote links."""
    if scheduler not in ("static", "continuous"):
        raise ValueError(f"unknown scheduler {scheduler!r}")
    if scheduler == "continuous" and mesh is not None:
        raise ValueError("continuous eval scheduling is single-device for "
                         "now (the slot engine owns its own device layout); "
                         "drop --scheduler continuous or the mesh flags")
    if spec_window > 1 and scheduler != "continuous":
        raise ValueError("spec_window > 1 requires scheduler='continuous' "
                         "(the static while_loop has no draft path)")
    if cache_mode is None:
        cache_mode = "reorder" if mesh is not None else "ancestry"
    field = dataset.field_tokens(tokenizer)
    bart = BartModel(model.config, multimodal=True, dtype=model.dtype)

    def encode_batch(params, batch_stats, reviews, reviews_mask, field_values, img, img_mask):
        vs = {"params": params, "batch_stats": batch_stats}
        b = reviews.shape[0]
        if img.dtype == jnp.uint8:
            # uint8-shipped images: normalise on device (see normalize_images)
            img = normalize_images(img, img_mask)
        text_h = model.apply(vs, reviews, reviews_mask, method=MultimodalSum.encode_text)
        table_h, table_m = model.apply(vs, field, field_values,
                                       method=MultimodalSum.encode_table)
        # encode images in chunks: ResNet over b*10 images in one shot peaks
        # activation memory well above the decode working set (bench.py uses
        # the same chunking; keeps large serving batches compiling). Under a
        # mesh the batch axis is already sharded (per-device count is small)
        # and reshaping a sharded axis would fight the partitioner.
        # smallest chunk count DIVIDING b with <= 16 images' batch rows per
        # chunk (a non-divisor fallback would silently run the full-batch
        # ResNet and reintroduce the memory spike for e.g. b = 50)
        img_chunks = 1
        if mesh is None and b > 16:
            img_chunks = next(c for c in range(-(-b // 16), b + 1) if b % c == 0)
        if img_chunks > 1:
            imgs = img.reshape(img_chunks, b // img_chunks, *img.shape[1:])
            imasks = img_mask.reshape(img_chunks, b // img_chunks, img_mask.shape[1])
            img_h, img_m = jax.lax.map(
                lambda c: model.apply(vs, c[0], c[1], method=MultimodalSum.encode_img),
                (imgs, imasks))
            img_h = img_h.reshape(b, *img_h.shape[2:])
            img_m = img_m.reshape(b, *img_m.shape[2:])
        else:
            img_h, img_m = model.apply(vs, img, img_mask, method=MultimodalSum.encode_img)
        return ([text_h, table_h, img_h],
                [reviews_mask.astype(bool), table_m, img_m])

    def pipeline(params, batch_stats, reviews, reviews_mask, field_values, img, img_mask):
        hiddens, masks = encode_batch(params, batch_stats, reviews,
                                      reviews_mask, field_values, img, img_mask)
        b = reviews.shape[0]
        rating = jnp.zeros((b, 1), jnp.float32)  # zeros at eval (src/test.py:155)
        res = generate(bart, params["bart"], hiddens, masks,
                       rating, gen, kv_quant=kv_quant,
                       self_kv_quant=self_kv_quant, cache_mode=cache_mode)
        if res.lengths.ndim == 1:  # greedy (num_beams == 1): [B, L] / [B]
            return res.sequences, res.lengths
        return res.sequences[:, 0], res.lengths[:, 0]

    if mesh is not None:
        # SPMD data-parallel eval: batch args sharded on the data axis,
        # params replicated (tests/test_parallel_generate.py shows the
        # sharded run is token-identical). The reference serves one process
        # per GPU instead; one mesh-wide jit amortises compile + weights.
        from multimodalsum_tpu.parallel.mesh import (
            DATA_AXIS, MODEL_AXIS, batch_sharding, dp_shardings,
        )

        n_data = mesh.shape[DATA_AXIS]
        if batch_size % n_data:
            raise ValueError(
                f"batch_size ({batch_size}) must be divisible by the mesh "
                f"data axis ({n_data}) for data-parallel eval")
        in_sh = list(dp_shardings(mesh, 7, 2))
        if mesh.shape.get(MODEL_AXIS, 1) > 1:
            # tensor-parallel decode: weights sharded with the Megatron
            # rules instead of replicated (parallel/sharding.py)
            from multimodalsum_tpu.parallel.sharding import param_shardings

            in_sh[0] = param_shardings(params, mesh)
        # pre-place weights to match in_shardings ONCE — otherwise jit
        # reshards the full multi-GB tree on EVERY batch call
        params = jax.device_put(params, in_sh[0])
        batch_stats = jax.device_put(batch_stats, in_sh[1])
        b_sh = batch_sharding(mesh)
        pipeline = jax.jit(pipeline, in_shardings=tuple(in_sh),
                           out_shardings=b_sh)
    else:
        b_sh = None
        # pin weights on device ONCE: load_eval_params returns HOST trees,
        # and jit re-transfers host ndarray arguments on EVERY call — ~1.6 GB
        # of params per batch over the remote link was the r4 gate's real
        # bulk-throughput ceiling (35 s/batch of 25, decode itself ~7 s).
        # A no-op for already-device-resident inputs.
        params = jax.device_put(params)
        batch_stats = jax.device_put(batch_stats)
        pipeline = jax.jit(pipeline)

    outputs: List[str] = []
    n = len(dataset)
    n_batches = (n + batch_size - 1) // batch_size

    def host_batches():
        """Assemble + stack each batch on host (reference data_prefetcher's
        worker side); images ship as uint8, normalised on device."""
        if staged_batches is not None:
            yield from staged_batches
            return
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            real = len(idxs)
            # pad the final batch to the jit shape with repeats
            while len(idxs) < batch_size:
                idxs.append(idxs[-1])
            rows = [dataset.example(i, tokenizer, raw_uint8=True)
                    for i in idxs]
            yield real, (
                np.stack([r["reviews"] for r in rows]),
                np.stack([r["reviews_mask"] for r in rows]),
                stack_features([r["field_values"] for r in rows]),
                np.stack([r["img"] for r in rows]),
                np.stack([r["img_mask"] for r in rows]),
            )

    if scheduler == "continuous":
        from multimodalsum_tpu.data.prefetch import host_prefetch
        from multimodalsum_tpu.decode.serving import ContinuousBatcher

        enc = jax.jit(encode_batch)
        engine = None
        results: dict = {}
        next_id = 0
        t_start = time.time()
        # steady-state markers: the first tick carries the tick-fn compile
        tick_count = 0
        t_steady = None
        rows_at_steady = 0
        for real, arrs in host_prefetch(host_batches()):
            hiddens, masks = enc(params, batch_stats, *arrs)
            if engine is None:
                shapes = [tuple(h.shape[1:3]) for h in hiddens]
                engine = ContinuousBatcher(
                    bart, params["bart"], gen,
                    n_slots=n_slots or batch_size,
                    modality_shapes=shapes, kv_quant=kv_quant,
                    steps_per_tick=steps_per_tick, cache_mode=cache_mode,
                    spec_window=spec_window, spec_ngram=spec_ngram,
                    spec_src_max=(int(np.prod(arrs[0].shape[1:]))
                                  if spec_window > 1 else None))
            # split the encoded batch into device-resident per-row requests
            # (serving stacks jax.Arrays with jnp — no host round-trip)
            for r in range(real):
                src = None
                if spec_window > 1:
                    # the row's own (unpadded) review tokens drive the
                    # prompt-lookup draft
                    src = arrs[0][r][arrs[1][r].astype(bool)]
                engine.submit(next_id, [h[r] for h in hiddens],
                              [m[r] for m in masks], source_tokens=src)
                next_id += 1
            # advance decode while the next batch's host assembly runs in
            # the prefetch thread; stop ticking as soon as a slot is free
            # to take rows from the NEXT batch (ticks refill from the
            # queue first, so a free slot implies the queue is empty)
            while engine.pending:
                st = engine.stats()
                if st["queued"] == 0 and st["active"] < st["n_slots"]:
                    break
                for rid, tokens, _ in engine.tick():
                    results[rid] = tokens
                tick_count += 1
                if tick_count == 1:
                    t_steady = time.time()
                    rows_at_steady = len(results)
        if engine is not None:
            for rid, tokens in engine.run().items():
                results[rid] = tokens
        ticks = engine.stats()["ticks"] if engine else 0
        if stats_out is not None and engine is not None:
            stats_out.update(engine.stats())
            spec = engine.spec_stats()
            if spec is not None:
                stats_out["spec"] = spec
        if steady_timing is not None and t_steady is not None:
            steady_timing.append((len(results) - rows_at_steady,
                                  time.time() - t_steady))
        log(f"continuous eval: {len(results)} rows, {ticks} ticks "
            f"x{steps_per_tick} steps, {time.time() - t_start:.2f}s")
        return [tokenizer.decode(results[i], skip_special_tokens=True)
                for i in range(next_id)]

    # overlap host assembly AND H2D transfer with device compute: batches
    # build in a background thread (host_prefetch — PIL decode of b*10
    # images + tokenization would otherwise run while the device idles) and
    # device_put queues the next transfer during decode — the TPU-native
    # double buffering (replaces the reference's CUDA-stream
    # data_prefetcher, src/multimodal_train.py:196-343)
    from multimodalsum_tpu.data.prefetch import host_prefetch, prefetch_to_device

    if staged_batches is not None:
        # batches already assembled + device-resident (stage_eval_batches):
        # no prefetch pipeline needed
        reals = [r for r, _ in staged_batches]
        dev_iter = (a for _, a in staged_batches)
    else:
        reals = []

        def arrays_only():
            for real, arrs in host_batches():
                reals.append(real)
                yield arrs

        dev_iter = prefetch_to_device(host_prefetch(arrays_only()), size=2,
                                      sharding=b_sh)

    batch_secs = []
    for bi, dev_args in enumerate(dev_iter):
        t0 = time.time()
        seqs, lengths = pipeline(params, batch_stats, *dev_args)
        seqs = np.asarray(seqs)
        for r in range(reals[bi]):
            outputs.append(tokenizer.decode(seqs[r], skip_special_tokens=True))
        batch_secs.append(time.time() - t0)
        log(f"eval batch {bi + 1}/{n_batches} ({batch_secs[-1]:.2f}s)")
    if steady_timing is not None and len(batch_secs) > 1:
        steady_timing.append((sum(reals[1:]), sum(batch_secs[1:])))
    return outputs


def evaluate(
    model: MultimodalSum,
    params,
    batch_stats,
    dataset: EvalDataset,
    tokenizer,
    gen: GenerationConfig,
    batch_size: int = 8,
    with_bert: bool = False,
    kv_quant: str | None = None,
    self_kv_quant: str | None = None,
    cache_mode: str | None = None,
    mesh=None,
    log=print,
    scheduler: str = "static",
    n_slots: int | None = None,
    steps_per_tick: int = 8,
    spec_window: int = 1,
    spec_ngram: int = 2,
) -> tuple[Dict[str, float], List[str]]:
    """Generate + score (reference ``src/test.py:218-236``); returns
    (metrics, generated summaries)."""
    preds = generate_summaries(model, params, batch_stats, dataset, tokenizer,
                               gen, batch_size, log=log, kv_quant=kv_quant,
                               self_kv_quant=self_kv_quant,
                               cache_mode=cache_mode, mesh=mesh,
                               scheduler=scheduler, n_slots=n_slots,
                               steps_per_tick=steps_per_tick,
                               spec_window=spec_window, spec_ngram=spec_ngram)
    return aggregate_multi_reference(preds, dataset.summaries, with_bert=with_bert), preds
