"""Shared CLI plumbing for the training/eval entry points.

Replaces the reference's per-script argparse + ``set_environments`` NCCL
setup (``src/train_utils.py:12-31``): here a single process drives all local
TPU devices through a data-parallel mesh (SPMD), and multi-host runs
initialise via ``jax.distributed`` instead of env-var rendezvous.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--dataset", type=str, default="yelp", choices=["yelp", "amazon"])
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--ckpt_root", type=str, default="ckpt")
    p.add_argument("--tokenizer_dir", type=str, default=None,
                   help="dir with vocab.json/merges.txt (bart-large files)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=5)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--warmup_ratio", type=float, default=0.1)
    p.add_argument("--max_grad_norm", type=float, default=None)
    p.add_argument("--label_smoothing", type=float, default=None)
    p.add_argument("--early_stopping", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_config", type=str, default=None,
                   help="JSON model config (defaults to bart-large)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu for dry runs)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for pod slices")
    p.add_argument("--max_steps_per_epoch", type=int, default=None,
                   help="cap training steps per epoch (bounded smoke/debug "
                        "runs; validation and checkpointing still run)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer state over the data axis "
                        "(ZeRO/FSDP-style; ~Nx less state memory per device, "
                        "one parameter all-gather per step; losses identical "
                        "to plain DP)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate gradients over N microbatches per "
                        "optimizer step (the HF Trainer lever, reference "
                        "trainer.py:680-739); --batch_size is the GLOBAL "
                        "batch and must be divisible by N")
    p.add_argument("--save_interval", type=int, default=1,
                   help="save a checkpoint every N epochs (the final epoch "
                        "always saves; reference saves every epoch — raise "
                        "this when per-epoch device->host checkpoint traffic "
                        "dominates short epochs, e.g. small-corpus overfit "
                        "runs). Composes with --early_stopping: only epochs "
                        "the loop deems save-worthy AND on-interval save")
    p.add_argument("--metrics_log", type=str, default=None,
                   help="append JSON-lines training metrics to this file "
                        "(the vendored Trainer's log format, trainer.py:617)")
    p.add_argument("--wandb_project", type=str, default=None,
                   help="log metrics to this Weights & Biases project "
                        "(reference Trainer.setup_wandb, trainer.py:359-391; "
                        "requires the wandb package, honors WANDB_DISABLED/"
                        "WANDB_PROJECT)")
    p.add_argument("--run_name", type=str, default=None,
                   help="experiment run name for W&B")
    return p


def setup_environment(args) -> None:
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent XLA compile cache (verified working through the axon
    # tunnel): repeat CLI invocations skip minutes of bart-large compile.
    # JAX_COMPILATION_CACHE_DIR= (empty) disables.
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "multimodalsum_jax"))
    if cache:
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # older jax / read-only fs: compiles stay per-process
    if getattr(args, "multihost", False):
        # the repo's rendezvous wrapper (reference torch.distributed.launch
        # env-var analog, parallel/comm.py) — not jax.distributed directly,
        # so explicit-coordinator environments share one code path
        from multimodalsum_tpu.parallel.comm import initialize_multihost

        initialize_multihost()


def load_model_config(args):
    from multimodalsum_tpu.core.config import BartConfig

    if args.model_config:
        return BartConfig.from_json(args.model_config)
    return BartConfig()


def load_tokenizer(args):
    from multimodalsum_tpu.data.tokenizer import ByteLevelBPETokenizer

    if args.tokenizer_dir is None:
        raise SystemExit(
            "--tokenizer_dir is required (directory containing the BART "
            "vocab.json and merges.txt; this environment cannot download them)"
        )
    return ByteLevelBPETokenizer.from_dir(args.tokenizer_dir)


def _largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that is <= ``cap`` (the data-axis size must
    divide the batch, NOT the device count — gcd(devices, batch) leaves
    devices idle, e.g. batch 6 on 8 devices can use 6 chips, gcd says 2)."""
    for d in range(min(n, cap), 0, -1):
        if n % d == 0:
            return d
    return 1


def mesh_for_batch(batch_size: int):
    """Data-parallel mesh over as many devices as the (per-host) batch
    divides into — a batch smaller than the device count shards over a
    device subset.

    Multi-process runs (``--multihost``): every host contributes
    ``batch_size`` examples per step, so the mesh spans the same number of
    devices on EVERY process (process-major order) and the global batch is
    ``batch_size * process_count``. Feed batches through
    ``prefetch_to_device`` — it assembles global arrays from each host's
    local shard."""
    from multimodalsum_tpu.parallel.mesh import make_mesh

    nproc = jax.process_count()
    local = jax.local_devices()
    per_host = _largest_divisor_leq(batch_size, len(local))
    if per_host < len(local):
        print(f"warning: per-host batch_size {batch_size} shards over only "
              f"{per_host} of {len(local)} local devices; pick a batch with "
              f"a divisor >= the device count to use the whole mesh")
    if nproc == 1:
        return make_mesh(data=per_host, model=1, devices=local[:per_host])
    # global mesh: the first per_host local devices of every process, in
    # process order, so each host's batch rows land on its own chips
    devices = []
    for p in range(nproc):
        owned = [d for d in jax.devices() if d.process_index == p]
        devices.extend(owned[:per_host])
    return make_mesh(data=per_host * nproc, model=1, devices=devices)


def make_hooks(args, save, on_val=None):
    """LoopHooks with the console line plus, when ``--metrics_log`` or
    ``--wandb_project`` is set, a JSON-lines/W&B record per logged step
    AND one per-epoch ``val_loss`` record (the r3 valmin post-mortem:
    per-epoch val loss was unobservable after the fact —
    ``core/observability.MetricLogger``). ``on_val(state, epoch, val_loss)``
    is chained into the loop's per-epoch validation hook on every process.

    Multi-host: console/metric files/W&B belong to process 0 only (the
    reference's world-master gating, ``Trainer.is_world_master`` around
    ``setup_wandb``) — N hosts would otherwise create N W&B runs and race
    on shared metrics files. The SAVE hook stays live on every process:
    orbax checkpoint saves are collective (all hosts call, orbax barriers
    internally and only the primary host writes — ``ckpt.save_checkpoint``),
    and the loop gathers cross-host-sharded state to host first
    (``train/loop.gather_state_to_host``)."""
    from multimodalsum_tpu.train.loop import LoopHooks

    interval = getattr(args, "save_interval", 1) or 1
    if interval > 1:
        inner_save = save
        num_epochs = getattr(args, "num_epochs", None)

        def save(st, epoch, vl, _inner=inner_save, _n=num_epochs):
            # 1-indexed epochs on the interval, plus the final epoch — a run
            # whose num_epochs is not a multiple of the interval still ends
            # with a checkpoint
            if (epoch + 1) % interval == 0 or (_n is not None and epoch >= _n - 1):
                _inner(st, epoch, vl)
    if jax.process_index() != 0:
        return LoopHooks(log=lambda m: None, save=save, on_val=on_val)
    if not (getattr(args, "metrics_log", None)
            or getattr(args, "wandb_project", None)):
        return LoopHooks(save=save, on_val=on_val)
    from multimodalsum_tpu.core.observability import MetricLogger

    console = LoopHooks().log
    ml = MetricLogger(log_path=getattr(args, "metrics_log", None),
                      stdout=False,
                      wandb_project=getattr(args, "wandb_project", None),
                      run_name=getattr(args, "run_name", None),
                      config=vars(args))
    # LoopHooks has no teardown; close the file handle / finish the W&B run
    # at interpreter exit (repeated main() calls in one process, as the test
    # suite does, would otherwise accumulate open handles)
    import atexit

    atexit.register(ml.close)

    def log(m):
        console(m)
        # key JSON-lines records by the GLOBAL step (the per-epoch counter
        # resets each epoch and would collide/overwrite in step-keyed
        # consumers like TensorBoard) — the vendored Trainer logs the same
        step = m.get("global_step", m.get("step", 0))
        ml.log(step, **{k: v for k, v in m.items()
                        if k not in ("step", "global_step")})

    def on_val_logged(state, epoch, vl):
        # int(state.step) is a device sync, but validation just synced anyway
        ml.log(int(state.step), epoch=epoch + 1, val_loss=float(vl))
        if on_val is not None:
            on_val(state, epoch, vl)

    return LoopHooks(log=log, save=save, on_val=on_val_logged)


def host_data_shard(n_examples: int, batch_size: int):
    """``(shard_index, shard_count, steps_per_epoch)`` for per-host data
    sharding (the DistributedSampler replacement,
    reference ``src/train_utils.py:38-43``): each host of a multi-host run
    iterates only its equal-size slice of the group list, so
    steps-per-epoch (and hence the LR-schedule horizon) divides by the
    process count. Identity on a single host."""
    from multimodalsum_tpu.parallel.comm import host_shard

    shard_index, shard_count = host_shard()
    per_host = -(-n_examples // shard_count)  # ceil: shard_order pads
    steps = per_host // batch_size
    if steps == 0:
        raise SystemExit(
            f"per-host shard of {per_host} examples (of {n_examples} over "
            f"{shard_count} hosts) is smaller than batch_size {batch_size}: "
            f"drop_last training would run ZERO steps per epoch (and still "
            f"save checkpoints of untouched params) — lower the batch size "
            f"or host count")
    return shard_index, shard_count, steps


def resume_state(resume_dir: str, state):
    """Restore a full training state from ``resume_dir`` and derive the epoch
    to continue from (completed epoch in ``meta.json`` + 1, or 0 when the
    meta is missing/unnumbered). Returns ``(state, start_epoch)`` — pass
    ``start_epoch`` into ``train_model`` so resuming a crashed run continues
    the interrupted epoch schedule instead of re-training ``num_epochs``
    epochs on top of the restored step (which would run the LR schedule past
    its horizon). HF-Trainer analog: reference ``trainer.py:477-493``."""
    from multimodalsum_tpu.ckpt.checkpoint import read_meta, restore_checkpoint

    state = restore_checkpoint(resume_dir, state)
    start_epoch = 0
    try:
        start_epoch = int(read_meta(resume_dir).get("epoch", -1)) + 1
    except (OSError, ValueError, TypeError):
        pass
    print(f"resumed from {resume_dir} at step {int(state.step)} "
          f"(continuing at epoch {start_epoch})")
    return state, start_epoch


def make_valmin_tracker(args, ckpt_name: str, *, snap_epochs=(),
                        snap_root: Optional[str] = None):
    """Track the epoch with the LOWEST validation loss as a device-side bf16
    copy and write it once at stage end (reference best-val gating,
    ``src/train_utils.py:82`` — but tracking the TRUE per-epoch minimum
    instead of gating sparse interval saves). Shared by the stage CLIs via
    ``--valmin_dir`` (stage 3 since r4; stage 1 since r5 so downstream
    stages can initialise from the best-generalising text model rather than
    the end-of-budget memorised one, VERDICT r4 #1d).

    Returns ``(on_val, finalize)``: chain ``on_val`` into the loop hooks,
    call ``finalize()`` after ``train_model`` returns. Both are None-safe
    no-ops when ``args.valmin_dir`` is unset and ``snap_epochs`` is empty.

    ``snap_epochs``/``snap_root``: additionally write a params-only snapshot
    at each listed 0-indexed epoch into ``snap_root/<ckpt_name>_epoch{E}`` —
    the capture pass for checkpoint averaging around a known val minimum
    (``scripts/avg_ckpts.py``; runs are deterministic given a seed, so a
    rerun lands the same trajectory and the window can be chosen post-hoc).

    Single-controller only (multi-host snapshot leaves are globally sharded;
    a process-0-only orbax save would deadlock its collectives).
    """
    import math

    import jax.numpy as jnp

    from multimodalsum_tpu.ckpt.checkpoint import read_meta, save_checkpoint
    from multimodalsum_tpu.train.loop import EvalSnapshot

    valmin_dir = getattr(args, "valmin_dir", None)
    snap_epochs = set(snap_epochs or ())
    if not valmin_dir and not snap_epochs:
        return None, lambda: None
    if jax.process_count() > 1:
        print("warning: --valmin_dir/--save_epochs are single-controller "
              "only; skipping val-min tracking", flush=True)
        return None, lambda: None

    best = {"vl": float("inf")}
    if valmin_dir:
        # crash+retry seeding: a fresh tracker must not overwrite a better
        # snapshot an earlier attempt already wrote
        try:
            prev = read_meta(os.path.join(valmin_dir, ckpt_name))
            if prev.get("val_loss") is not None:
                best["vl"] = float(prev["val_loss"])
        except (OSError, ValueError, TypeError):
            pass

    snap_cast = jax.jit(lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t))

    def _snapshot(st):
        return EvalSnapshot(
            step=jnp.int32(int(st.step)), params=snap_cast(st.params),
            batch_stats=(snap_cast(st.batch_stats)
                         if getattr(st, "batch_stats", None) is not None
                         else None))

    # snapshots are WRITTEN bf16 (half the device->host transfer + disk —
    # the first measured f32 flush cost ~4 min over the device link, 2x the
    # r4 bf16 one); the load path casts restored leaves to the consuming
    # template's dtype (``ckpt._merge``), so training from these dirs still
    # gets f32 master params
    def write_valmin():
        vm_dir = os.path.join(valmin_dir, ckpt_name)
        save_checkpoint(vm_dir, best["snap"],
                        save_option="whole",
                        epoch=best["epoch"], val_loss=best["vl"],
                        extra_meta={"params_only": True,
                                    "snapshot_dtype": "bfloat16"})
        best["dirty"] = False
        print(f"== val-min snapshot saved: epoch {best['epoch']} "
              f"val {best['vl']:.4f} -> {vm_dir}", flush=True)

    # crash-durability: a device-side-only minimum dies with the process
    # (a wedged device link killed a 200-epoch run at epoch 141 with the
    # epoch-34 minimum parked in device memory), so the tracked best is
    # flushed to disk at most every VALMIN_FLUSH_IV epochs when it improved
    VALMIN_FLUSH_IV = 10

    def on_val(st, epoch, vl):
        if valmin_dir and math.isfinite(vl) and vl < best["vl"]:
            best.update(vl=vl, epoch=epoch, snap=_snapshot(st), dirty=True)
        if (best.get("dirty") and (epoch + 1) % VALMIN_FLUSH_IV == 0):
            write_valmin()
        if epoch in snap_epochs:
            d = os.path.join(snap_root or valmin_dir or ".",
                             f"{ckpt_name}_epoch{epoch}")
            save_checkpoint(d, _snapshot(st),
                            save_option="whole",
                            epoch=epoch, val_loss=vl,
                            extra_meta={"params_only": True,
                                        "snapshot_dtype": "bfloat16"})
            print(f"== epoch snapshot saved: {d} (val {vl:.4f})", flush=True)

    def finalize():
        if best.get("dirty"):
            write_valmin()

    return on_val, finalize


def save_args(args, ckpt_dir: str) -> None:
    """Snapshot CLI args beside the checkpoint (reference
    ``training_args.bin``, ``src/train_utils.py:13-16``). Process 0 only —
    N hosts writing one file on shared storage race."""
    if jax.process_index() != 0:
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "training_args.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)
