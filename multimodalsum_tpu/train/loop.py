"""Generic training loop and train state.

Equivalent of the reference's custom loop stack (``train_model``
``src/train_utils.py:65-97`` + per-script ``train()``/``validate()``): epoch
loop with per-epoch dataset resampling, distributed loss averaging for
logging, validation, best-val checkpoint gating, and per-stage submodule
export. The device side is one jitted ``train_step`` whose batch is sharded
over the mesh's data axis — the gradient all-reduce is inserted by XLA and
rides ICI (replacing apex DDP's delayed all-reduce).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from multimodalsum_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(step=jnp.int32(0), params=params, opt_state=tx.init(params))


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    grad_accum: int = 1):
    """Build a jittable ``(state, batch, rng) -> (state, loss)`` step.

    ``loss_fn(params, batch, rng)`` returns a scalar. Gradients flow through
    the full param tree; frozen leaves receive zero updates from the
    multi-transform optimizer (see ``train/optim.py``).

    ``grad_accum > 1`` splits the batch's leading axis into that many
    microbatches and accumulates gradients with ``lax.scan`` before a single
    optimizer update — the HF Trainer's gradient accumulation
    (reference ``trainer.py:680-739``), done on-device.
    """

    def train_step(state: TrainState, batch, rng):
        step_rng = None if rng is None else jax.random.fold_in(rng, state.step)

        if grad_accum <= 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, step_rng)
        else:
            lead = jax.tree.leaves(batch)[0].shape[0]
            if lead % grad_accum:
                raise ValueError(
                    f"batch leading dim {lead} is not divisible by "
                    f"grad_accum {grad_accum}")
            micro = jax.tree.map(
                lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum) + x.shape[1:]),
                batch,
            )

            def body(carry, mb_and_i):
                mb, i = mb_and_i
                r = None if step_rng is None else jax.random.fold_in(step_rng, i)
                loss_i, g_i = jax.value_and_grad(loss_fn)(state.params, mb, r)
                total_loss, total_g = carry
                return (total_loss + loss_i,
                        jax.tree.map(jnp.add, total_g, g_i)), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.float32(0.0), zero_g),
                (micro, jnp.arange(grad_accum)),
            )
            loss = loss / grad_accum
            grads = jax.tree.map(lambda g: g / grad_accum, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), loss

    return train_step


class TrainStateWithStats(struct.PyTreeNode):
    """Train state carrying BatchNorm running statistics (img/multimodal stages)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation):
        return cls(step=jnp.int32(0), params=params, opt_state=tx.init(params),
                   batch_stats=batch_stats)


def make_train_step_with_stats(loss_fn: Callable, tx: optax.GradientTransformation,
                               grad_accum: int = 1):
    """Like :func:`make_train_step` for losses returning
    ``(loss, new_batch_stats)`` — the img and multimodal stages, whose ResNet
    BatchNorm updates running stats in training mode (torch semantics).

    ``grad_accum > 1`` accumulates gradients over that many microbatches
    with ``lax.scan`` before one optimizer update; BatchNorm running stats
    chain THROUGH the scan (microbatch i sees the stats updated by i-1),
    matching torch accumulation where each forward updates running stats."""

    def train_step(state: TrainStateWithStats, batch, rng):
        step_rng = None if rng is None else jax.random.fold_in(rng, state.step)

        if grad_accum <= 1:
            def wrapped(params):
                return loss_fn(params, state.batch_stats, batch, step_rng)

            (loss, new_stats), grads = jax.value_and_grad(
                wrapped, has_aux=True)(state.params)
        else:
            lead = jax.tree.leaves(batch)[0].shape[0]
            if lead % grad_accum:
                raise ValueError(
                    f"batch leading dim {lead} is not divisible by "
                    f"grad_accum {grad_accum}")
            micro = jax.tree.map(
                lambda x: x.reshape(
                    (grad_accum, x.shape[0] // grad_accum) + x.shape[1:]),
                batch,
            )

            def body(carry, mb_and_i):
                mb, i = mb_and_i
                r = None if step_rng is None else jax.random.fold_in(step_rng, i)
                total_loss, total_g, stats = carry

                def wrapped(params):
                    return loss_fn(params, stats, mb, r)

                (loss_i, new_stats_i), g_i = jax.value_and_grad(
                    wrapped, has_aux=True)(state.params)
                return (total_loss + loss_i,
                        jax.tree.map(jnp.add, total_g, g_i),
                        new_stats_i), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads, new_stats), _ = jax.lax.scan(
                body, (jnp.float32(0.0), zero_g, state.batch_stats),
                (micro, jnp.arange(grad_accum)),
            )
            loss = loss / grad_accum
            grads = jax.tree.map(lambda g: g / grad_accum, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, opt_state=opt_state,
                          batch_stats=new_stats),
            loss,
        )

    return train_step


def make_host_accum_step(loss_fn: Callable, tx: optax.GradientTransformation,
                         grad_accum: int, accum_dtype=None):
    """Gradient accumulation driven from the HOST: ``grad_accum`` calls of a
    jitted single-microbatch grad program, then one jitted apply.

    Numerically equivalent to :func:`make_train_step_with_stats`'s
    ``lax.scan`` form (BatchNorm stats chain through the sequential calls
    the same way), but each compiled program is no bigger than the ga=1
    step. That matters where the compile service rejects large programs:
    the full-geometry 12+12-layer stage-3 step with an accumulation scan
    crashes the remote-compile helper of the axon tunnel (HTTP 500 at any
    remat setting), while its half-depth version compiles — host-driven
    accumulation is the TPU-native fallback, at the cost of ``grad_accum``
    dispatches per step (dispatch is async; the device never idles).

    Returns a step with the :func:`train_model` signature; NOT a jitted
    function itself — do not wrap it in ``jax.jit``.

    ``accum_dtype`` (e.g. ``jnp.bfloat16``) stores the cross-microbatch
    accumulator in a narrower dtype: at bart-large f32 the persistent
    accumulator alone is 3.2 GB, the difference between fitting and
    RESOURCE_EXHAUSTED next to AdamW state on a 16 GB chip. A bf16
    accumulator rounds each add to ~8 mantissa bits — for the 2-8-term
    sums of practical accumulation the update noise is far below the
    gradient noise the larger batch exists to average out. Default None
    keeps the gradients' own dtype (f32 master params -> f32, exact)."""
    if grad_accum < 2:
        raise ValueError("host-accum needs grad_accum >= 2; use "
                         "make_train_step_with_stats for ga=1")

    def micro_grad(params, stats, mb, r, total_loss, total_g):
        """One microbatch's grad, accumulated IN PLACE into ``total_g``
        (donated): a separate add program would hold two full grad trees
        live at once — +3.2 GB high-water at bart-large f32, the difference
        between fitting and RESOURCE_EXHAUSTED on a 16 GB chip."""
        (loss, new_stats), grads = jax.value_and_grad(
            lambda p: loss_fn(p, stats, mb, r), has_aux=True)(params)
        if accum_dtype is not None:
            grads = jax.tree.map(lambda g: g.astype(accum_dtype), grads)
        return (loss + total_loss, new_stats,
                jax.tree.map(jnp.add, total_g, grads))

    def apply(state, loss, grads, new_stats):
        loss = loss / grad_accum
        grads = jax.tree.map(
            lambda g, p: g.astype(p.dtype) / grad_accum,
            grads, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params,
                          opt_state=opt_state, batch_stats=new_stats),
            loss,
        )

    j_micro = jax.jit(micro_grad, donate_argnums=(4, 5))
    j_apply = jax.jit(apply, donate_argnums=(0, 2))
    j_zeros = jax.jit(lambda p: (jnp.float32(0.0), jax.tree.map(
        lambda x: jnp.zeros(x.shape, accum_dtype or x.dtype), p)))

    def train_step(state, batch, rng):
        step_rng = None if rng is None else jax.random.fold_in(rng, state.step)
        lead = jax.tree.leaves(batch)[0].shape[0]
        if lead % grad_accum:
            raise ValueError(f"batch leading dim {lead} is not divisible "
                             f"by grad_accum {grad_accum}")
        stats = state.batch_stats
        loss, grads = j_zeros(state.params)
        for i in range(grad_accum):
            mb = jax.tree.map(
                lambda x: x[i * (lead // grad_accum):(i + 1) * (lead // grad_accum)],
                batch)
            r = None if step_rng is None else jax.random.fold_in(step_rng, i)
            loss, stats, grads = j_micro(state.params, stats, mb, r,
                                         loss, grads)
        return j_apply(state, loss, grads, stats)

    return train_step


def make_eval_step(loss_fn: Callable):
    def eval_step(state: TrainState, batch):
        return loss_fn(state.params, batch, None)

    return eval_step


def gather_state_to_host(state, mesh):
    """Full host-side copy of a (possibly cross-host-sharded) train state.

    The reference's save contract is rank-0 full-state
    (``src/train_utils.py:79-97``). On one controller this is the identity
    (``ckpt.save_checkpoint`` does its own ``device_get``). In a
    multi-controller world the state's arrays are global — a host cannot
    ``np.asarray`` leaves whose shards live on other hosts (the FSDP case;
    even replicated leaves are not *fully* addressable) — so a compiled
    all-gather first replicates every leaf across the mesh (one collective
    per save, riding ICI/DCN), then each host reads its local copy.

    COLLECTIVE: every process must call this, even though only process 0's
    save hook writes (``cli.common.make_hooks`` no-ops the others). The full
    state transiently exists per device; for models whose *sharded* state
    only just fits, switch to an orbax per-shard distributed save instead.
    """
    if jax.process_count() == 1:
        return state
    import numpy as np

    rep = replicated(mesh)
    state = jax.jit(lambda s: s, out_shardings=rep)(state)
    return jax.tree.map(lambda x: np.asarray(x.addressable_data(0)), state)


class EvalSnapshot(struct.PyTreeNode):
    """Params-only checkpoint payload (no optimizer state) for
    evaluation-grade saves — the stage-3 validation-minimum snapshot and
    the durable packs. ``ckpt.save_checkpoint`` accepts it like a
    TrainState; resume machinery must NOT treat such a save as resumable
    (mark it via ``extra_meta={"params_only": True}``, which
    ``scripts/train_real_ckpt.resume_args`` checks)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any = None


@dataclass
class LoopHooks:
    """Host-side callbacks: logging and checkpointing."""

    log: Callable[[dict], None] = lambda m: print(
        f"{m.get('elapsed','')} epoch {m['epoch']} step {m['step']}/{m['steps_per_epoch']} "
        f"loss {m['loss']:.6f}"
    )
    save: Optional[Callable[[TrainState, int, float], None]] = None
    #: called after EVERY epoch's validation with (state, epoch, val_loss) —
    #: unlike ``save`` (interval-gated, host-gathered), this sees the live
    #: device state each epoch, so callers can track the true val minimum
    #: (e.g. keep a device-side best-params copy) and log per-epoch val loss
    #: (reference per-epoch ``validate()``, ``src/train_utils.py:74-78``)
    on_val: Optional[Callable[[Any, int, float], None]] = None


def train_model(
    state: TrainState,
    train_step,
    eval_step,
    train_batches: Callable[[int], Iterable],
    val_batches: Callable[[], Iterable],
    *,
    num_epochs: int,
    rng: jnp.ndarray,
    mesh=None,
    log_interval: int = 100,
    early_stopping: bool = False,
    hooks: LoopHooks | None = None,
    deterministic_after: int | None = None,
    start_epoch: int = 0,
    fsdp: bool = False,
    max_steps_per_epoch: int | None = None,
):
    """Epoch loop mirroring reference ``train_model`` (``src/train_utils.py:65-97``):
    per-epoch resampling via ``train_batches(epoch)``, validation each epoch,
    save gated on best val loss when ``early_stopping`` (reference saves every
    epoch otherwise).

    ``train_batches(epoch)`` must re-sample the dataset (the reference calls
    ``dataset.set_epoch()`` for epochs > 0, ``:72-73``).

    ``deterministic_after``: global step after which dropout is disabled —
    the HF-Trainer customisation "model.eval() for the final 10% of steps"
    (reference ``trainer.py:419,524-527``). Implemented by passing
    ``rng=None`` (a second jit specialisation), not by mutating the model.

    ``fsdp``: shard params + optimizer state over the mesh's data axis
    (ZeRO/FSDP-style; ``parallel/sharding.fsdp_shardings``) instead of
    replicating — ~data_size× less state memory per device, one parameter
    all-gather per step. Losses are identical to plain DP (same math,
    different placement); no reference analog (SURVEY §2.5 "optional").

    ``max_steps_per_epoch``: cap on training steps per epoch for bounded
    smoke/debug runs (validation and checkpointing still run; note the LR
    schedule horizon is computed from the uncapped epoch length).

    ``start_epoch``: first epoch index to run — pass the resumed checkpoint's
    completed epoch + 1 so ``--resume`` continues the interrupted run instead
    of re-training the full epoch count on top of the restored step (the HF
    Trainer's epochs_trained fast-forward, reference ``trainer.py:477-493``).
    The global step counter continues from ``state.step`` either way, so the
    LR schedule and ``deterministic_after`` stay on their original horizon.
    """
    hooks = hooks or LoopHooks()
    mesh = mesh if mesh is not None else make_mesh()
    b_shard = batch_sharding(mesh)
    r_shard = replicated(mesh)

    if fsdp:
        # ZeRO/FSDP-style: params + optimizer state sharded over the data
        # axis (largest divisible dim per leaf); XLA inserts the per-step
        # parameter all-gather and gradient reduce-scatter. The state is
        # re-placed here so the first step doesn't pay a layout transfer
        # inside the compiled program. parallel/sharding.fsdp_shardings.
        # Multi-host saves gather the sharded state back to host memory
        # first (gather_state_to_host below).
        from multimodalsum_tpu.parallel.sharding import fsdp_shardings

        s_shard = fsdp_shardings(state, mesh)
        state = jax.device_put(state, s_shard)
    else:
        s_shard = r_shard

    # donate the state: without donation every step transiently holds TWO
    # copies of params + optimizer state (~15 GB for BART-large + AdamW),
    # which OOMs a 16 GB chip that fits the donated step comfortably
    jit_train = jax.jit(
        train_step, in_shardings=(s_shard, b_shard, r_shard),
        out_shardings=(s_shard, r_shard), donate_argnums=0,
    )
    jit_train_det = jax.jit(
        lambda s, b: train_step(s, b, None),
        in_shardings=(s_shard, b_shard), out_shardings=(s_shard, r_shard),
        donate_argnums=0,
    )
    jit_eval = jax.jit(eval_step, in_shardings=(s_shard, b_shard), out_shardings=r_shard)
    # tail val batches (drop_last=False) may not divide the data axis; they
    # run unsharded instead of being dropped or padded (single-host only —
    # multihost CLIs drop the val tail, see cli/common.host_data_shard)
    jit_eval_unsharded = jax.jit(eval_step)
    from multimodalsum_tpu.parallel.mesh import DATA_AXIS

    # the axis batch_sharding shards over, NOT the mesh's first axis (a
    # ('model', 'data')-ordered mesh would silently misroute tail batches)
    data_size = mesh.shape[DATA_AXIS]

    start = time.time()
    val_losses = []
    steps_per_epoch = None
    global_step = int(state.step)
    for epoch in range(start_epoch, num_epochs):
        i = 0
        epoch_iter = train_batches(epoch)
        for batch in epoch_iter:
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                # bounded smoke/debug runs (scripts/real_data_e2e.py): stop
                # the epoch early but still validate + checkpoint normally.
                # Close the iterator so prefetch producer threads underneath
                # are released (data/prefetch.host_prefetch stop flag)
                close = getattr(epoch_iter, "close", None)
                if close is not None:
                    close()
                break
            if deterministic_after is not None and global_step >= deterministic_after:
                state, loss = jit_train_det(state, batch)
            else:
                state, loss = jit_train(state, batch, rng)
            global_step += 1
            if i % max(log_interval, 1) == 0:
                dt = int(time.time() - start)
                elapsed = f"{dt // 3600}:{dt // 60 % 60:02d}:{dt % 60:02d}"
                hooks.log(dict(epoch=epoch + 1, step=i + 1,
                               global_step=global_step,
                               steps_per_epoch=steps_per_epoch or "?",
                               loss=float(loss), elapsed=elapsed))
            i += 1
        steps_per_epoch = i

        # validation (loss averaged over batches, reference AverageMeter)
        total, count = 0.0, 0
        for batch in val_batches():
            n = jax.tree.leaves(batch)[0].shape[0]
            if n % data_size == 0:
                total += float(jit_eval(state, batch)) * n
            else:
                host_batch = jax.device_get(batch)
                total += float(jit_eval_unsharded(state, host_batch)) * n
            count += n
        # count == 0 (empty val iterator) must NOT record 0.0: it would
        # become the unbeatable "best" and disable every later save
        val_loss = total / count if count else float("inf")
        if count == 0:
            print(f"epoch {epoch + 1}: no validation batches (val set smaller "
                  f"than the batch size?)")
        else:
            print(f"epoch {epoch + 1} valid loss {val_loss:.6f}")

        val_losses.append(val_loss)
        if hooks.on_val is not None:
            hooks.on_val(state, epoch, val_loss)
        # best-val gating over FINITE losses only: a NaN epoch (diverged
        # early, recovered later) would otherwise poison min() for the whole
        # run (nan comparisons are always False) and no checkpoint would
        # ever be written again
        finite = [v for v in val_losses if math.isfinite(v)]
        should_save = (not early_stopping) or (
            math.isfinite(val_loss) and val_loss <= min(finite))
        if should_save and hooks.save is not None:
            # the argument is evaluated on EVERY process (the gather is a
            # collective) even where the hook itself is a process!=0 no-op
            hooks.save(gather_state_to_host(state, mesh), epoch, val_loss)

    return state, val_losses
