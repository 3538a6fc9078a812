"""Stage 2a: image-encoder pretraining against the frozen text decoder
(reference ``src/img_pretrain.py``). Only the ResNet (stage 3 + projection)
trains; BART stays frozen.

Usage:
  python -m multimodalsum_tpu.cli.img_pretrain --dataset yelp \
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
from multimodalsum_tpu.models.multimodal import MultimodalSum
from multimodalsum_tpu.cli.common import mesh_for_batch
from multimodalsum_tpu.parallel.mesh import batch_sharding
from multimodalsum_tpu.train.loop import (
    LoopHooks, TrainStateWithStats, make_train_step_with_stats, train_model,
)
from multimodalsum_tpu.train.optim import NO_DECAY_IMG, make_optimizer
from multimodalsum_tpu.train.stages import img_pretrain_loss


def img_label_batches(store, tokenizer, batch_size, *, epoch, train, seed=0,
                      block=130, drop_last=True, shard_index=0, shard_count=1):
    """(img, img_mask, labels) batches: one sampled review per group as the
    reconstruction target (reference ``ImgDataset``, ``src/img_pretrain.py:22-83``).
    Labels: each of the group's 9 sampled reviews is its own dataset item
    (reference ImgDataset keeps one review per row, src/img_pretrain.py:60-66
    — 9 rows per group per epoch)."""
    from multimodalsum_tpu.data.multimodal_data import example_batches

    def project(rows):
        return dict(
            img=np.stack([r["img"] for r in rows]),
            img_mask=np.stack([r["img_mask"] for r in rows]),
            labels=np.stack([r["reviews"][r["label_idx"]] for r in rows]),
        )

    yield from example_batches(
        store, tokenizer, batch_size, project=project, epoch=epoch,
        max_length=block, shuffle=train, drop_last=drop_last, seed=seed,
        shard_index=shard_index, shard_count=shard_count,
        labels_per_group=9,
        example_kwargs=dict(train=train),
    )


def main(argv=None):
    p = base_parser("MultimodalSum-TPU stage 2a: image pretraining")
    p.add_argument("--img_model", type=str, default="resnet101")
    p.add_argument("--bart_init", type=str, default=None, required=False)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume full training state from")
    p.add_argument("--torch_resnet", type=str, default=None,
                   help="torchvision ResNet state dict (e.g. an ImageNet-"
                        "pretrained resnet101 dump) — strongly recommended: "
                        "stages 1-2 are frozen, so without pretrained weights "
                        "they stay random (reference uses pretrained=True)")
    args = p.parse_args(argv)
    setup_environment(args)

    cfg = load_model_config(args)
    tokenizer = load_tokenizer(args)
    import jax.numpy as jnp

    model = MultimodalSum(cfg, dataset=args.dataset, img_model=args.img_model,
                          dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    from multimodalsum_tpu.models.multimodal import amazon_dummy_table, yelp_dummy_table

    field, values = (yelp_dummy_table(1) if args.dataset == "yelp"
                     else amazon_dummy_table(1))
    variables = model.init(jax.random.PRNGKey(args.seed), field, values,
                           method=MultimodalSum.init_all)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if args.bart_init:
        params["bart"] = load_export(args.bart_init, params["bart"])
    if args.torch_resnet:
        import torch

        from multimodalsum_tpu.ckpt.checkpoint import _merge
        from multimodalsum_tpu.ckpt.convert import resnet_params_from_torch

        sd = torch.load(args.torch_resnet, map_location="cpu")
        prefix = "resnet." if any(k.startswith("resnet.") for k in sd) else ""
        rp, rs = resnet_params_from_torch(sd, prefix=prefix)
        params["img_encoder"] = _merge(params["img_encoder"], rp)
        batch_stats["img_encoder"] = _merge(batch_stats["img_encoder"], rs)

    # only groups WITH photos train the image encoder (reference
    # ImgDataset filters by photo_business_dict, src/img_pretrain.py:44)
    store = MultimodalStore(args.data_root, args.dataset, "train",
                            require_photos=True)
    val_store = MultimodalStore(args.data_root, args.dataset, "val",
                                require_photos=True)
    from multimodalsum_tpu.cli.common import host_data_shard

    # 9 dataset items per group (one per sampled review, like the reference)
    si, sc, steps_per_epoch = host_data_shard(len(store) * 9, args.batch_size)
    tx = make_optimizer(
        params, learning_rate=args.learning_rate,
        total_steps=steps_per_epoch * args.num_epochs,
        warmup_ratio=args.warmup_ratio, no_decay=NO_DECAY_IMG,
        max_grad_norm=args.max_grad_norm,
        trainable=lambda n: n.startswith("img_encoder"),
    )
    state = TrainStateWithStats.create(params, batch_stats, tx)
    start_epoch = 0
    if args.resume:
        from multimodalsum_tpu.cli.common import resume_state

        state, start_epoch = resume_state(args.resume, state)


    def loss_fn(params, stats, batch, rng):
        return img_pretrain_loss(model, params, stats, batch,
                                 label_smoothing=args.label_smoothing, rng=rng)

    ckpt_dir = os.path.join(args.ckpt_root, f"img_pretrained_{args.dataset}")
    save_args(args, ckpt_dir)
    mesh = mesh_for_batch(args.batch_size)
    b_shard = batch_sharding(mesh)
    hooks = make_hooks(args, save=lambda st, epoch, vl: save_checkpoint(
        ckpt_dir, st, save_option="img", epoch=epoch, val_loss=vl))

    def eval_step(state, batch):
        loss, _ = img_pretrain_loss(model, state.params, state.batch_stats, batch,
                                    label_smoothing=args.label_smoothing, rng=None)
        return loss

    train_model(
        state,
        make_train_step_with_stats(loss_fn, tx, grad_accum=args.grad_accum),
        eval_step,
        lambda e: prefetch_to_device(
            host_prefetch(
                img_label_batches(store, tokenizer, args.batch_size, epoch=e,
                                  train=True, seed=args.seed, shard_index=si,
                                  shard_count=sc)),
            sharding=b_shard),
        lambda: prefetch_to_device(
            img_label_batches(val_store, tokenizer, args.batch_size, epoch=0,
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
