"""Stage 2b: table-encoder pretraining against the frozen text decoder
(reference ``src/table_pretrain.py``). Only the table encoder trains.

Usage:
  python -m multimodalsum_tpu.cli.table_pretrain --dataset yelp \
      --tokenizer_dir assets/bart-tokenizer --bart_init ckpt/text_pretrained_yelp
"""

from __future__ import annotations

import os

import jax
import numpy as np

from multimodalsum_tpu.ckpt.checkpoint import load_export, save_checkpoint
from multimodalsum_tpu.cli.common import (
    base_parser, load_model_config, load_tokenizer, save_args, setup_environment, make_hooks,
)
from multimodalsum_tpu.data.multimodal_data import MultimodalStore
from multimodalsum_tpu.data.prefetch import host_prefetch, prefetch_to_device
from multimodalsum_tpu.data.tables import stack_features
from multimodalsum_tpu.models.multimodal import MultimodalSum
from multimodalsum_tpu.cli.common import mesh_for_batch
from multimodalsum_tpu.parallel.mesh import batch_sharding
from multimodalsum_tpu.train.loop import (
    LoopHooks, TrainState, make_eval_step, make_train_step, train_model,
)
from multimodalsum_tpu.train.optim import NO_DECAY_TABLE, make_optimizer
from multimodalsum_tpu.train.stages import table_pretrain_loss


def table_label_batches(store, tokenizer, batch_size, *, epoch, train, seed=0,
                        block=130, drop_last=True, shard_index=0, shard_count=1):
    """(field_values, labels) batches (reference ``TableDataset``,
    ``src/table_pretrain.py:21-82``); the table stage reads no photos."""
    from multimodalsum_tpu.data.multimodal_data import example_batches

    def project(rows):
        return dict(
            field_values=stack_features([r["field_values"] for r in rows]),
            labels=np.stack([r["reviews"][r["label_idx"]] for r in rows]),
        )

    yield from example_batches(
        store, tokenizer, batch_size, project=project, epoch=epoch,
        max_length=block, shuffle=train, drop_last=drop_last, seed=seed,
        shard_index=shard_index, shard_count=shard_count,
        labels_per_group=9,  # one item per sampled review (reference :55-61)
        example_kwargs=dict(train=False, skip_images=True),
    )


def main(argv=None):
    p = base_parser("MultimodalSum-TPU stage 2b: table pretraining")
    p.add_argument("--bart_init", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume full training state from")
    p.add_argument("--img_model", type=str, default="resnet50",
                   help="trunk held (frozen) in the composed model")
    args = p.parse_args(argv)
    setup_environment(args)

    cfg = load_model_config(args)
    tokenizer = load_tokenizer(args)
    import jax.numpy as jnp

    model = MultimodalSum(cfg, dataset=args.dataset, img_model=args.img_model,
                          dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    from multimodalsum_tpu.models.multimodal import amazon_dummy_table, yelp_dummy_table

    field_dummy, values = (yelp_dummy_table(1) if args.dataset == "yelp"
                           else amazon_dummy_table(1))
    variables = model.init(jax.random.PRNGKey(args.seed), field_dummy, values,
                           method=MultimodalSum.init_all)
    params = variables["params"]
    if args.bart_init:
        params["bart"] = load_export(args.bart_init, params["bart"])

    store = MultimodalStore(args.data_root, args.dataset, "train")
    val_store = MultimodalStore(args.data_root, args.dataset, "val")
    field = store.field_tokens(tokenizer)
    from multimodalsum_tpu.cli.common import host_data_shard

    si, sc, steps_per_epoch = host_data_shard(len(store), args.batch_size)
    tx = make_optimizer(
        params, learning_rate=args.learning_rate,
        total_steps=steps_per_epoch * args.num_epochs,
        warmup_ratio=args.warmup_ratio, no_decay=NO_DECAY_TABLE,
        max_grad_norm=args.max_grad_norm,
        trainable=lambda n: n.startswith("table_encoder"),
    )
    state = TrainState.create(params, tx)
    start_epoch = 0
    if args.resume:
        from multimodalsum_tpu.cli.common import resume_state

        state, start_epoch = resume_state(args.resume, state)


    def loss_fn(params, batch, rng):
        full = dict(batch, field=field)
        return table_pretrain_loss(model, params, full,
                                   label_smoothing=args.label_smoothing, rng=rng)

    ckpt_dir = os.path.join(args.ckpt_root, f"table_pretrained_{args.dataset}")
    save_args(args, ckpt_dir)
    mesh = mesh_for_batch(args.batch_size)
    b_shard = batch_sharding(mesh)
    hooks = make_hooks(args, save=lambda st, epoch, vl: save_checkpoint(
        ckpt_dir, st, save_option="table", epoch=epoch, val_loss=vl))

    train_model(
        state,
        make_train_step(loss_fn, tx, grad_accum=args.grad_accum),
        make_eval_step(lambda p, b, r: loss_fn(p, b, None)),
        lambda e: prefetch_to_device(
            host_prefetch(
                table_label_batches(store, tokenizer, args.batch_size, epoch=e,
                                    train=True, seed=args.seed,
                                    shard_index=si, shard_count=sc)),
            sharding=b_shard),
        lambda: prefetch_to_device(
            table_label_batches(val_store, tokenizer, args.batch_size, epoch=0,
                                train=False, drop_last=(sc > 1),  # multihost: drop the val tail
                                shard_index=si, shard_count=sc), sharding=b_shard),
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


if __name__ == "__main__":
    main()
