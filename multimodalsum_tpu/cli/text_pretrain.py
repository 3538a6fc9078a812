"""Stage 1: text encoder-decoder pretraining (reference ``src/text_pretrain.py``).

Usage:
  python -m multimodalsum_tpu.cli.text_pretrain --dataset yelp \
      --tokenizer_dir assets/bart-tokenizer --bart_init ckpt/bart-review_yelp
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np

from multimodalsum_tpu.ckpt.checkpoint import load_export, save_checkpoint
from multimodalsum_tpu.cli.common import (
    base_parser, load_model_config, load_tokenizer, save_args, setup_environment, make_hooks,
)
from multimodalsum_tpu.data.prefetch import prefetch_to_device
from multimodalsum_tpu.data.text import ReviewGroupStore, TextBatches
from multimodalsum_tpu.models.bart import BartModel
from multimodalsum_tpu.cli.common import mesh_for_batch
from multimodalsum_tpu.parallel.mesh import batch_sharding
from multimodalsum_tpu.train.loop import LoopHooks, TrainState, make_eval_step, make_train_step, train_model
from multimodalsum_tpu.train.optim import NO_DECAY_TEXT, make_optimizer
from multimodalsum_tpu.train.stages import text_pretrain_loss


def main(argv=None):
    p = base_parser("MultimodalSum-TPU stage 1: text pretraining")
    p.add_argument("--bart_init", type=str, default=None,
                   help="checkpoint dir from stage 0 (orbax export)")
    p.add_argument("--workers", type=int, default=0,
                   help="tokenisation worker processes for the train stream "
                        "(the reference DataLoader num_workers; 0 = inline)")
    p.add_argument("--torch_init", type=str, default=None,
                   help="pytorch_model.bin to convert (e.g. facebook/bart-large dump)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume full training state from")
    p.add_argument("--extra_datasets", type=str, nargs="*", default=(),
                   help="additional prepped dataset trees under --data_root "
                        "whose 5.text groups join the leave-one-out corpus "
                        "(e.g. 'amazon' alongside yelp) — text pretraining "
                        "is dataset-agnostic, so cross-domain review groups "
                        "add signal on a small corpus, and ONE joint stage-1 "
                        "model can seed BOTH datasets' downstream stages "
                        "(stage 0 already trains joint, cli/bart_review.py)")
    p.add_argument("--valmin_dir", type=str, default=None,
                   help="also write a params-only checkpoint of the epoch "
                        "with the LOWEST validation loss into this root — "
                        "downstream stages can then initialise from the "
                        "best-generalising text model instead of the "
                        "end-of-budget memorised one (the stage-1 epoch "
                        "budget was sized by memorisation speed, not val)")
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

        sd = torch.load(args.torch_init, map_location="cpu")
        params = bart_params_from_torch(sd, cfg)
    elif args.bart_init:
        params = load_export(args.bart_init, params)

    if args.extra_datasets:
        datasets = (args.dataset, *args.extra_datasets)
        train_store = ReviewGroupStore.from_dirs(args.data_root, datasets, "train")
        val_store = ReviewGroupStore.from_dirs(args.data_root, datasets, "val")
    else:
        train_store = ReviewGroupStore.from_dir(args.data_root, args.dataset, "train")
        val_store = ReviewGroupStore.from_dir(args.data_root, args.dataset, "val")
    from multimodalsum_tpu.cli.common import host_data_shard

    si, sc, steps_per_epoch = host_data_shard(len(train_store), args.batch_size)
    train_data = TextBatches(train_store, tokenizer, args.batch_size, seed=args.seed,
                             shard_index=si, shard_count=sc,
                             workers=args.workers)
    val_data = TextBatches(val_store, tokenizer, args.batch_size, shuffle=False,
                           drop_last=(sc > 1), shard_index=si, shard_count=sc)
    tx = make_optimizer(
        params,
        learning_rate=args.learning_rate,
        total_steps=steps_per_epoch * args.num_epochs,
        warmup_ratio=args.warmup_ratio,
        no_decay=NO_DECAY_TEXT,
        max_grad_norm=args.max_grad_norm,
    )
    state = TrainState.create(params, tx)
    start_epoch = 0
    if args.resume:
        from multimodalsum_tpu.cli.common import resume_state

        state, start_epoch = resume_state(args.resume, state)

    def loss_fn(params, batch, rng):
        return text_pretrain_loss(model, params, batch,
                                  label_smoothing=args.label_smoothing, rng=rng)

    def eval_loss_fn(params, batch, rng):
        return text_pretrain_loss(model, params, batch,
                                  label_smoothing=args.label_smoothing, rng=None)

    ckpt_dir = os.path.join(args.ckpt_root, f"text_pretrained_{args.dataset}")
    save_args(args, ckpt_dir)
    mesh = mesh_for_batch(args.batch_size)
    b_shard = batch_sharding(mesh)

    from multimodalsum_tpu.cli.common import make_valmin_tracker

    on_val, valmin_finalize = make_valmin_tracker(
        args, f"text_pretrained_{args.dataset}")
    hooks = make_hooks(args, save=lambda st, epoch, vl: save_checkpoint(
        ckpt_dir, st, save_option="whole", epoch=epoch, val_loss=vl),
        on_val=on_val)

    train_model(
        state,
        make_train_step(loss_fn, tx, grad_accum=args.grad_accum),
        make_eval_step(eval_loss_fn),
        functools.partial(_epoch_iter, train_data, b_shard),
        lambda: prefetch_to_device(val_data.epoch(0), sharding=b_shard),
        num_epochs=args.num_epochs,
        rng=jax.random.PRNGKey(args.seed),
        fsdp=args.fsdp,
        max_steps_per_epoch=args.max_steps_per_epoch,
        mesh=mesh,
        log_interval=max(steps_per_epoch // 10, 1),
        early_stopping=args.early_stopping,
        hooks=hooks,
        start_epoch=start_epoch,
    )
    valmin_finalize()


def _epoch_iter(data, sharding, epoch):
    return prefetch_to_device(data.epoch(epoch), sharding=sharding)


if __name__ == "__main__":
    main()
