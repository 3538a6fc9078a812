"""Stage 0: BART denoising pretraining on the review corpus
(reference ``src/bart-review.py``).

Usage:
  python -m multimodalsum_tpu.cli.bart_review --dataset yelp \
      --tokenizer_dir assets/bart-tokenizer [--torch_init bart-large.bin]
"""

from __future__ import annotations

import glob
import os

import jax
import numpy as np
import pandas as pd

from multimodalsum_tpu.ckpt.checkpoint import save_checkpoint
from multimodalsum_tpu.cli.common import (
    base_parser, load_model_config, load_tokenizer, save_args, setup_environment, make_hooks,
)
from multimodalsum_tpu.data.noising import BartNoiser
from multimodalsum_tpu.data.prefetch import host_prefetch, prefetch_to_device
from multimodalsum_tpu.models.bart import BartModel
from multimodalsum_tpu.cli.common import mesh_for_batch
from multimodalsum_tpu.parallel.mesh import batch_sharding
from multimodalsum_tpu.train.loop import LoopHooks, TrainState, make_eval_step, make_train_step, train_model
from multimodalsum_tpu.train.optim import make_optimizer
from multimodalsum_tpu.train.stages import denoising_loss


def load_review_corpus(data_root, dataset, tokenizer, block_size, mode="train"):
    """Tokenise every review > 5 chars (reference ``ReviewDataset``,
    ``src/bart-review.py:23-43``) to fixed blocks, no special tokens."""
    rows = []
    for csv in sorted(glob.glob(os.path.join(data_root, dataset, "5.text", mode, "*.csv"))):
        df = pd.read_csv(csv, sep="\t")
        rows.extend(t for t in df["review_text"]
                    if isinstance(t, str) and len(t) > 5 and not t.isspace())
    ids = [tokenizer.encode(t, add_special_tokens=False, truncation=True,
                            max_length=block_size, padding="max_length")
           for t in rows]
    return np.asarray(ids, np.int32)


def main(argv=None):
    p = base_parser("MultimodalSum-TPU stage 0: BART denoising pretraining")
    p.add_argument("--block_size", type=int, default=128)
    p.add_argument("--permute_ratio", type=float, default=1.0)
    p.add_argument("--mask_ratio", type=float, default=0.3)
    p.add_argument("--dist_lambda", type=float, default=3.0)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--dropout_off_ratio", type=float, default=0.1,
                   help="disable dropout for the final fraction of steps "
                        "(reference trainer.py:419,524-527)")
    p.add_argument("--torch_init", type=str, default=None)
    p.add_argument("--extra_datasets", type=str, nargs="*", default=(),
                   help="additional prepped dataset trees under --data_root "
                        "whose 5.text reviews join the denoising corpus "
                        "(e.g. 'amazon' alongside yelp) — stage 0 is generic "
                        "LM pretraining, so cross-domain review text only "
                        "adds signal (the reference pretrains on its full "
                        "million-review dump, README.md:130-133)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume full training state from")
    p.set_defaults(num_epochs=3)  # stage-0 reference default (README:130-133)
    args = p.parse_args(argv)
    setup_environment(args)

    cfg = load_model_config(args)
    tokenizer = load_tokenizer(args)
    import jax.numpy as jnp

    model = BartModel(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    params = model.init(jax.random.PRNGKey(args.seed), method=BartModel.init_all)["params"]
    if args.torch_init:
        import torch

        from multimodalsum_tpu.ckpt.convert import bart_params_from_torch

        params = bart_params_from_torch(torch.load(args.torch_init, map_location="cpu"), cfg)

    corpus = np.concatenate(
        [load_review_corpus(args.data_root, ds, tokenizer, args.block_size)
         for ds in (args.dataset, *args.extra_datasets)])
    val_corpus = np.concatenate(
        [load_review_corpus(args.data_root, ds, tokenizer, args.block_size,
                            mode="val")
         for ds in (args.dataset, *args.extra_datasets)])
    noiser = BartNoiser(tokenizer, args.block_size, args.permute_ratio,
                        args.mask_ratio, args.dist_lambda, seed=args.seed)

    from multimodalsum_tpu.cli.common import host_data_shard

    si, sc, steps_per_epoch = host_data_shard(len(corpus), args.batch_size)
    total_steps = steps_per_epoch * args.num_epochs
    dropout_off_after = int(total_steps * (1.0 - args.dropout_off_ratio))

    tx = make_optimizer(
        params, learning_rate=args.learning_rate, total_steps=total_steps,
        warmup_ratio=args.warmup_ratio, weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm if args.max_grad_norm is not None else 1.0,
        adam_eps=1e-8,  # HF Trainer default (training_args.py:165)
    )
    state = TrainState.create(params, tx)
    start_epoch = 0
    if args.resume:
        from multimodalsum_tpu.cli.common import resume_state

        state, start_epoch = resume_state(args.resume, state)


    def loss_fn(params, batch, rng):
        return denoising_loss(model, params, batch, rng=rng)

    def batches(epoch, data, shuffle=True, fixed_noise_seed=None):
        # fixed_noise_seed: swap in a fixed-seed generator so every
        # validation pass draws IDENTICAL corruptions — otherwise best-val
        # checkpoint gating compares losses on different noise realizations
        # across epochs (the text stage fixes its val sampling the same way,
        # data/text.py random_state=7). The training stream is saved and
        # RESTORED afterwards so train epochs keep fresh noise.
        saved_rng = None
        if fixed_noise_seed is not None:
            saved_rng = noiser.rng
            noiser.rng = np.random.default_rng(fixed_noise_seed)
        try:
            order = np.random.default_rng(args.seed + epoch).permutation(len(data)) \
                if shuffle else np.arange(len(data))
            # per-host sharding replaces DistributedSampler (train_utils.py:38-43)
            from multimodalsum_tpu.data.text import shard_order

            order = shard_order(order, si, sc)
            b = args.batch_size
            for s in range(0, (len(order) // b) * b, b):
                yield noiser(data[order[s:s + b]])
        finally:
            if saved_rng is not None:
                noiser.rng = saved_rng

    ckpt_dir = os.path.join(args.ckpt_root, f"bart-review_{args.dataset}")
    save_args(args, ckpt_dir)
    mesh = mesh_for_batch(args.batch_size)
    b_shard = batch_sharding(mesh)
    hooks = make_hooks(args, save=lambda st, epoch, vl: save_checkpoint(
        ckpt_dir, st, save_option="whole", epoch=epoch, val_loss=vl))

    train_model(
        state,
        make_train_step(loss_fn, tx, grad_accum=args.grad_accum),
        make_eval_step(lambda p, b, r: denoising_loss(model, p, b, rng=None)),
        # the BART-noise collator (sentence permute + span infill) is the
        # CPU-heavy part of this stage — build it one batch ahead
        lambda e: prefetch_to_device(host_prefetch(batches(e, corpus)),
                                     sharding=b_shard),
        lambda: prefetch_to_device(
            batches(0, val_corpus, shuffle=False,
                    fixed_noise_seed=args.seed + 7919),
            sharding=b_shard),
        num_epochs=args.num_epochs,
        rng=jax.random.PRNGKey(args.seed),
        fsdp=args.fsdp,
        max_steps_per_epoch=args.max_steps_per_epoch,
        mesh=mesh,
        log_interval=500,
        early_stopping=args.early_stopping,
        hooks=hooks,
        deterministic_after=dropout_off_after,
        start_epoch=start_epoch,
    )


if __name__ == "__main__":
    main()
