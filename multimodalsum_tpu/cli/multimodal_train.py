"""Stage 3: end-to-end multimodal training (reference ``src/multimodal_train.py``).

Usage:
  python -m multimodalsum_tpu.cli.multimodal_train --dataset yelp \
      --tokenizer_dir assets/bart-tokenizer \
      --bart_init ckpt/text_pretrained_yelp \
      --img_init ckpt/img_pretrained_yelp --table_init ckpt/table_pretrained_yelp
"""

from __future__ import annotations

import functools
import os

import jax

from multimodalsum_tpu.ckpt.checkpoint import load_export, save_checkpoint
from multimodalsum_tpu.cli.common import (
    base_parser, load_model_config, load_tokenizer, save_args, setup_environment, make_hooks,
)
from multimodalsum_tpu.data.multimodal_data import MultimodalStore, multimodal_batches
from multimodalsum_tpu.data.prefetch import host_prefetch, prefetch_to_device
from multimodalsum_tpu.models.multimodal import MultimodalSum
from multimodalsum_tpu.cli.common import mesh_for_batch
from multimodalsum_tpu.parallel.mesh import batch_sharding
from multimodalsum_tpu.train.loop import (
    LoopHooks, TrainStateWithStats, make_train_step_with_stats, train_model,
)
from multimodalsum_tpu.train.optim import NO_DECAY_MULTIMODAL, make_optimizer
from multimodalsum_tpu.train.stages import multimodal_train_loss


def main(argv=None):
    p = base_parser("MultimodalSum-TPU stage 3: multimodal training")
    p.add_argument("--img_model", type=str, default="resnet101")
    p.add_argument("--bart_init", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume full training state from")
    p.add_argument("--img_init", type=str, default=None)
    p.add_argument("--table_init", type=str, default=None)
    p.add_argument("--valmin_dir", type=str, default=None,
                   help="also write a params-only checkpoint of the epoch "
                        "with the LOWEST validation loss into this root "
                        "(tracked as a device-side bf16 copy each epoch, "
                        "written once at stage end) — the honest "
                        "learning-evidence checkpoint while the main run "
                        "deliberately overfits (reference best-val gating, "
                        "src/train_utils.py:82)")
    p.add_argument("--save_epochs", type=str, default=None,
                   help="comma list of 0-indexed epochs at which to write a "
                        "params-only snapshot into --snap_root (checkpoint-"
                        "averaging capture around a known val minimum; runs "
                        "are seed-deterministic so a rerun retraces the "
                        "same trajectory — scripts/avg_ckpts.py)")
    p.add_argument("--snap_root", type=str, default=None,
                   help="root dir for --save_epochs snapshots")
    p.add_argument("--run_epochs", type=int, default=None,
                   help="stop training after this many epochs while keeping "
                        "the LR-schedule horizon at --num_epochs (cheap "
                        "deterministic re-trace of a prefix of a longer run)")
    args = p.parse_args(argv)
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
    # per-stage export loading (reference multimodal_train.py:111-122)
    if args.bart_init:
        params["bart"] = load_export(args.bart_init, params["bart"])
    if args.img_init:
        from multimodalsum_tpu.ckpt.checkpoint import load_export_stats

        params["img_encoder"] = load_export(args.img_init, params["img_encoder"])
        batch_stats["img_encoder"] = load_export_stats(
            args.img_init, batch_stats["img_encoder"])
    if args.table_init:
        params["table_encoder"] = load_export(args.table_init, params["table_encoder"])

    store = MultimodalStore(args.data_root, args.dataset, "train")
    val_store = MultimodalStore(args.data_root, args.dataset, "val")
    field = store.field_tokens(tokenizer)
    from multimodalsum_tpu.cli.common import host_data_shard

    si, sc, steps_per_epoch = host_data_shard(len(store), args.batch_size)
    tx = make_optimizer(
        params, learning_rate=args.learning_rate,
        total_steps=steps_per_epoch * args.num_epochs,
        warmup_ratio=args.warmup_ratio, no_decay=NO_DECAY_MULTIMODAL,
        max_grad_norm=args.max_grad_norm,
    )
    state = TrainStateWithStats.create(params, batch_stats, tx)
    start_epoch = 0
    if args.resume:
        from multimodalsum_tpu.cli.common import resume_state

        state, start_epoch = resume_state(args.resume, state)


    def loss_fn(params, stats, batch, rng):
        full = dict(batch, field=field)
        return multimodal_train_loss(model, params, stats, full,
                                     label_smoothing=args.label_smoothing, rng=rng)

    def eval_step(state, batch):
        loss, _ = multimodal_train_loss(
            model, state.params, state.batch_stats, dict(batch, field=field),
            label_smoothing=args.label_smoothing, rng=None)
        return loss

    ckpt_dir = os.path.join(args.ckpt_root, f"multimodal_trained_{args.dataset}")
    save_args(args, ckpt_dir)
    mesh = mesh_for_batch(args.batch_size)
    b_shard = batch_sharding(mesh)

    # --valmin_dir: track the true validation minimum as a device-side bf16
    # copy (params + batch_stats, ~0.9 GB HBM — a host device_get per
    # improvement would cost minutes over a remote device link), written out
    # ONCE after the loop (cli.common.make_valmin_tracker; fixes the r3
    # failure where "best-val" could only pick among 3 sparse interval
    # saves and degenerated to the final save).
    from multimodalsum_tpu.cli.common import make_valmin_tracker

    snap_epochs = ([int(e) for e in args.save_epochs.split(",")]
                   if args.save_epochs else ())
    on_val, valmin_finalize = make_valmin_tracker(
        args, f"multimodal_trained_{args.dataset}",
        snap_epochs=snap_epochs, snap_root=args.snap_root)

    hooks = make_hooks(args, save=lambda st, epoch, vl: save_checkpoint(
        ckpt_dir, st, save_option="whole", epoch=epoch, val_loss=vl),
        on_val=on_val)

    batches = functools.partial(multimodal_batches, store, tokenizer,
                                args.batch_size, seed=args.seed,
                                shard_index=si, shard_count=sc)
    train_model(
        state,
        make_train_step_with_stats(loss_fn, tx, grad_accum=args.grad_accum),
        eval_step,
        lambda e: prefetch_to_device(host_prefetch(batches(epoch=e, train=True)),
                                     sharding=b_shard),
        lambda: prefetch_to_device(
            multimodal_batches(val_store, tokenizer, args.batch_size, epoch=0,
                               train=False, shuffle=False, drop_last=(sc > 1),
                               shard_index=si, shard_count=sc),
            sharding=b_shard),
        # --run_epochs stops early while the LR horizon (make_optimizer
        # total_steps above) stays on the full --num_epochs schedule
        num_epochs=(min(args.run_epochs, args.num_epochs)
                    if args.run_epochs else args.num_epochs),
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


if __name__ == "__main__":
    main()
