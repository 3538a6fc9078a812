"""Evaluation / inference CLI (reference ``src/test.py``).

Loads the full multimodal checkpoint, beam-search-generates summaries for the
gold evaluation set, and prints ROUGE (+BERTScore when available) — the
mandatory generation flags mirror the reference (``src/test.py:179-181``).

Usage:
  python -m multimodalsum_tpu.cli.test --dataset yelp --mode test \
      --tokenizer_dir assets/bart-tokenizer \
      --multimodal_trained ckpt/multimodal_trained_yelp \
      --num_beams 5 --length_penalty 2.0 --max_length 142
"""

from __future__ import annotations

import os

import jax

from multimodalsum_tpu.cli.common import (
    base_parser, load_model_config, load_tokenizer, setup_environment,
)
from multimodalsum_tpu.core.config import GenerationConfig
from multimodalsum_tpu.data.multimodal_data import EvalDataset
from multimodalsum_tpu.eval.harness import evaluate
from multimodalsum_tpu.models.multimodal import MultimodalSum


def main(argv=None):
    p = base_parser("MultimodalSum-TPU evaluation")
    p.add_argument("--mode", type=str, default="test", choices=["dev", "test"])
    p.add_argument("--img_model", type=str, default="resnet101")
    p.add_argument("--multimodal_trained", type=str, required=False, default=None)
    # mandatory generation flags, like the reference (src/test.py:179-181)
    p.add_argument("--num_beams", type=int, required=True)
    p.add_argument("--length_penalty", type=float, required=True)
    p.add_argument("--max_length", type=int, required=True)
    p.add_argument("--min_length", type=int, default=0)
    p.add_argument("--with_bert", action="store_true")
    p.add_argument("--output", type=str, default=None,
                   help="write generated summaries, one per line")
    p.add_argument("--self_kv_quant", type=str, default=None, choices=["int8"],
                   help="quantize the decoder self-attention KV cache")
    p.add_argument("--kv_quant", type=str, default=None, choices=["int8", "int4", "int8+int4", "int4+int8"],
                   help="quantize decode-time cross-attention K/V")
    p.add_argument("--cache_mode", type=str, default=None,
                   choices=["reorder", "ancestry"],
                   help="beam KV-cache handling; default resolves to "
                        "ancestry on one device (reorder-free, "
                        "token-identical, ~2.5x faster) and reorder under "
                        "--dp/--tp meshes (shard-local; SCALING.md)")
    p.add_argument("--pallas", action="store_true",
                   help="use the fused Pallas entity-attention kernel")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel eval over N devices (0 = single "
                        "device, -1 = all remaining); batch_size must "
                        "divide by N")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel width (model mesh axis); uses "
                        "dp*tp devices")
    p.add_argument("--scheduler", type=str, default="static",
                   choices=["static", "continuous"],
                   help="bulk decode scheduling: 'static' jits one "
                        "while_loop over each batch (every batch waits for "
                        "its slowest row); 'continuous' streams rows "
                        "through the slot engine (decode/serving.py, "
                        "token-identical) so early-stopped rows free their "
                        "slot immediately — wins when lengths vary")
    p.add_argument("--n_slots", type=int, default=None,
                   help="continuous scheduler slots (default: batch_size)")
    p.add_argument("--steps_per_tick", type=int, default=8,
                   help="continuous scheduler decode steps per host sync")
    p.add_argument("--spec_window", type=int, default=1,
                   help="speculative decode window (continuous scheduler, "
                        "num_beams=1 only): prompt-lookup drafts from each "
                        "row's own reviews, verified exact")
    p.add_argument("--spec_ngram", type=int, default=2,
                   help="prompt-lookup match n-gram length")
    args = p.parse_args(argv)
    setup_environment(args)
    if args.pallas:
        from multimodalsum_tpu.ops.attention import set_entity_attention_impl

        set_entity_attention_impl("pallas")

    cfg = load_model_config(args)
    tokenizer = load_tokenizer(args)
    import jax.numpy as jnp

    model = MultimodalSum(cfg, dataset=args.dataset, img_model=args.img_model,
                          dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    from multimodalsum_tpu.models.multimodal import amazon_dummy_table, yelp_dummy_table

    fdummy, vdummy = (yelp_dummy_table(1) if args.dataset == "yelp"
                      else amazon_dummy_table(1))
    variables = model.init(jax.random.PRNGKey(0), fdummy, vdummy,
                           method=MultimodalSum.init_all)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if args.multimodal_trained:
        # raw restore + merge: evaluation must not depend on how the
        # checkpoint's optimizer was configured (opt_state structure varies
        # with e.g. --max_grad_norm)
        from multimodalsum_tpu.ckpt.checkpoint import load_eval_params

        params, batch_stats = load_eval_params(
            args.multimodal_trained, params, batch_stats)

    gen = GenerationConfig(
        num_beams=args.num_beams, length_penalty=args.length_penalty,
        max_length=args.max_length, min_length=args.min_length,
        no_repeat_ngram_size=3, early_stopping=True,  # fixed (src/test.py:158)
    )
    mesh = None
    if args.dp or args.tp > 1:
        from multimodalsum_tpu.parallel.mesh import make_mesh

        avail = len(jax.devices())
        dp = avail // args.tp if args.dp in (0, -1) else args.dp
        mesh = make_mesh(data=dp, model=args.tp,
                         devices=jax.devices()[:dp * args.tp])

    dataset = EvalDataset(args.data_root, args.dataset, args.mode)
    metrics, preds = evaluate(model, params, batch_stats, dataset, tokenizer, gen,
                              batch_size=args.batch_size, with_bert=args.with_bert,
                              kv_quant=args.kv_quant,
                              self_kv_quant=args.self_kv_quant,
                              cache_mode=args.cache_mode,
                              mesh=mesh, scheduler=args.scheduler,
                              n_slots=args.n_slots,
                              steps_per_tick=args.steps_per_tick,
                              spec_window=args.spec_window,
                              spec_ngram=args.spec_ngram)

    if args.output:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        with open(args.output, "w") as f:
            f.write("\n".join(preds) + "\n")

    print("# Results")
    print(" | ".join(f"{k} : {v:.2f}" for k, v in metrics.items()))


if __name__ == "__main__":
    main()
