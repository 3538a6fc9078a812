"""Streaming-serving CLI: continuous-batching greedy/sampling/beam decode.

Serving counterpart of ``cli/test.py`` (which does offline batch beam
eval): requests stream through the slot-based continuous batcher
(``decode/serving.py``) — encoders run per arriving request batch, decode
slots refill the moment a summary finishes, outputs stream to the output
file in completion order. ``--num_beams > 1`` serves beam search with
summaries token-identical to the offline beam eval (a slot then holds
``num_beams`` decode rows); greedy additionally supports sampling and
prompt-lookup speculative decoding.

Usage:
  python -m multimodalsum_tpu.cli.serve --dataset yelp --mode dev \
      --tokenizer_dir assets/tok --multimodal_trained ckpt/multimodal_trained_yelp \
      --n_slots 16 --max_length 142 --min_length 56
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from multimodalsum_tpu.cli.common import (
    base_parser, load_model_config, load_tokenizer, setup_environment,
)
from multimodalsum_tpu.core.config import GenerationConfig
from multimodalsum_tpu.data.multimodal_data import EvalDataset
from multimodalsum_tpu.models.bart import BartModel
from multimodalsum_tpu.models.multimodal import MultimodalSum


def main(argv=None):
    p = base_parser("MultimodalSum-TPU streaming serving (continuous batching)")
    p.add_argument("--mode", type=str, default="dev", choices=["dev", "test"])
    p.add_argument("--img_model", type=str, default="resnet101")
    p.add_argument("--multimodal_trained", type=str, default=None)
    p.add_argument("--n_slots", type=int, default=16)
    p.add_argument("--max_length", type=int, default=142)
    p.add_argument("--min_length", type=int, default=56)
    p.add_argument("--num_beams", type=int, default=1,
                   help=">1 serves beam search in the same slot architecture "
                        "(a slot holds num_beams decode rows); each summary "
                        "is token-identical to offline beam eval. Greedy "
                        "beams only (excludes --do_sample / --spec_window)")
    p.add_argument("--length_penalty", type=float, default=1.0)
    p.add_argument("--cache_mode", type=str, default="ancestry",
                   choices=["reorder", "ancestry"],
                   help="beam slot cache: the reorder-free ancestry gather "
                        "(default — measured 8.5x the physical per-step "
                        "reorder at bart-large beam-5 serving shapes; "
                        "token-identical) or the physical reorder")
    # --early_stopping comes from base_parser; in this CLI it means the beam
    # rule (stop a request once num_beams hypotheses finished — the
    # reference eval fixes it True, src/test.py:158)
    p.add_argument("--do_sample", action="store_true")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--output", type=str, default=None,
                   help="write '<group_id>\\t<summary>' lines in completion order")
    p.add_argument("--steps_per_tick", type=int, default=1,
                   help="decode steps per host round-trip (amortises the "
                        "completion poll on slow links)")
    p.add_argument("--kv_quant", type=str, default=None,
                   choices=["int8", "int4"],
                   help="quantize cross-KV slot slabs (more slots per chip; "
                        "changes tokens — see SCALING.md quality deltas)")
    p.add_argument("--spec_window", type=int, default=1,
                   help=">1 enables prompt-lookup speculative decoding "
                        "(greedy only, token-identical output): each step "
                        "verifies a window of this many tokens drafted from "
                        "the request's source reviews")
    p.add_argument("--spec_ngram", type=int, default=2,
                   help="generated-suffix n-gram length matched against the "
                        "source for drafting")
    p.add_argument("--pool_devices", type=int, default=1,
                   help="serve on this many local devices with one pinned "
                        "engine replica (n_slots each) per device; -1 = all "
                        "local devices. 1 = single engine on the default "
                        "device")
    p.add_argument("--failover", action="store_true",
                   help="pool serving: retain request inputs on host and "
                        "restart a failed replica's requests on the "
                        "survivors (costs host RAM per live request)")
    p.add_argument("--fill_chunk_max", type=int, default=1,
                   help="max requests per slot-fill dispatch (power-of-two "
                        "chunked). Default 1: per-request fills measured "
                        "faster AND batch-independent (SCALING.md); raise "
                        "only on links where per-call dispatch dominates")
    args = p.parse_args(argv)
    if args.pool_devices != -1 and args.pool_devices < 1:
        raise SystemExit(f"--pool_devices must be >= 1 or -1 (all), got "
                         f"{args.pool_devices}")
    if args.num_beams > 1 and (args.do_sample or args.spec_window > 1):
        raise SystemExit("--num_beams > 1 serves greedy beam search only "
                         "(drop --do_sample / --spec_window)")
    setup_environment(args)

    cfg = load_model_config(args)
    tokenizer = load_tokenizer(args)
    import jax.numpy as jnp

    model = MultimodalSum(cfg, dataset=args.dataset, img_model=args.img_model,
                          dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    from multimodalsum_tpu.models.multimodal import amazon_dummy_table, yelp_dummy_table

    fdummy, vdummy = (yelp_dummy_table(1) if args.dataset == "yelp"
                      else amazon_dummy_table(1))
    variables = model.init(jax.random.PRNGKey(args.seed), fdummy, vdummy,
                           method=MultimodalSum.init_all)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if args.multimodal_trained:
        from multimodalsum_tpu.ckpt.checkpoint import load_eval_params

        params, batch_stats = load_eval_params(
            args.multimodal_trained, params, batch_stats)

    dataset = EvalDataset(args.data_root, args.dataset, args.mode)
    field = dataset.field_tokens(tokenizer)
    bart = BartModel(cfg, multimodal=True, dtype=model.dtype)
    gen = GenerationConfig(
        num_beams=args.num_beams, do_sample=args.do_sample,
        temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p, max_length=args.max_length,
        min_length=args.min_length, length_penalty=args.length_penalty,
        early_stopping=args.early_stopping, no_repeat_ngram_size=3,
    )

    vs = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def encode_one(reviews, reviews_mask, field_values, img, img_mask):
        text_h = model.apply(vs, reviews, reviews_mask,
                             method=MultimodalSum.encode_text)
        table_h, table_m = model.apply(vs, field, field_values,
                                       method=MultimodalSum.encode_table)
        img_h, img_m = model.apply(vs, img, img_mask,
                                   method=MultimodalSum.encode_img)
        return ((text_h[0], table_h[0], img_h[0]),
                (reviews_mask[0].astype(bool), table_m[0], img_m[0]))

    max_len = dataset.MAX_LEN[args.dataset]
    from multimodalsum_tpu.data.multimodal_data import MAX_IMGS

    e_img = MAX_IMGS[args.dataset]
    shapes = [(8, max_len - 2), (1, field.shape[0]), (e_img, 196)]

    from multimodalsum_tpu.decode.serving import ContinuousBatcher, EnginePool

    engine_kwargs = dict(
        rng=jax.random.PRNGKey(args.seed),
        kv_quant=args.kv_quant,
        steps_per_tick=args.steps_per_tick,
        fill_chunk_max=args.fill_chunk_max,
        cache_mode=args.cache_mode,
        spec_window=args.spec_window,
        spec_ngram=args.spec_ngram,
        spec_src_max=(8 * (max_len - 2) if args.spec_window > 1 else None))
    if args.pool_devices == 1:
        eng = ContinuousBatcher(bart, params["bart"], gen,
                                n_slots=args.n_slots,
                                modality_shapes=shapes, **engine_kwargs)
    else:
        devices = jax.local_devices()
        if args.pool_devices > 0:
            devices = devices[: args.pool_devices]
        # rng stays in kwargs: the pool derives per-request default keys
        # from it (pool-wide counter, so keys never collide across replicas)
        eng = EnginePool(bart, params["bart"], gen, n_slots=args.n_slots,
                         modality_shapes=shapes, devices=devices,
                         failover=args.failover, **engine_kwargs)
        print(f"# serving pool: {len(devices)} replicas x {args.n_slots} "
              f"slots", flush=True)

    out_f = None
    if args.output:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        out_f = open(args.output, "w")

    t0 = time.time()
    done = 0

    def drain(block=False):
        nonlocal done
        completed = eng.tick()
        while block and eng.pending:
            completed += eng.tick()
        for rid, toks, _ in completed:
            text = tokenizer.decode(
                [t for t in toks.tolist()[1:]
                 if t not in (cfg.eos_token_id, cfg.pad_token_id)],
                skip_special_tokens=True).strip()
            done += 1
            if out_f:
                out_f.write(f"{rid}\t{text}\n")
                out_f.flush()
            print(f"[{time.time()-t0:7.1f}s] {done}/{len(dataset)} {rid}: "
                  f"{text[:60]!r}", flush=True)

    from multimodalsum_tpu.data.tables import stack_features

    for i in range(len(dataset)):
        # uint8 ship + device normalise (encode_img): 4x less per-request
        # H2D, and the remote-device tunnel leaks host RAM per byte
        # transferred (ops/images.py) — matters most in a long-running server
        row = dataset.example(i, tokenizer, raw_uint8=True)
        hiddens, masks = encode_one(
            row["reviews"][None], row["reviews_mask"][None],
            stack_features([row["field_values"]]),
            row["img"][None], row["img_mask"][None])
        src = None
        if args.spec_window > 1:
            # non-pad review tokens, concatenated — the prompt-lookup corpus
            rv, rm = row["reviews"], row["reviews_mask"].astype(bool)
            src = np.asarray(rv)[rm].reshape(-1)
        eng.submit(row["group_id"],
                   [np.asarray(h) for h in hiddens],
                   [np.asarray(m) for m in masks],
                   source_tokens=src)
        drain()  # keep slots moving while requests stream in

    drain(block=True)
    if out_f:
        out_f.close()
    dt = time.time() - t0
    stats = eng.stats()
    print(f"# served {done} summaries in {dt:.1f}s = {done/dt:.2f} req/s; "
          f"{stats['tokens_out']} tokens over "
          f"{stats.get('ticks', sum(s['ticks'] for s in stats.get('per_replica', [])))} ticks")


if __name__ == "__main__":
    main()
