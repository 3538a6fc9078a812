"""Checkpoint rotation/resume and gradient accumulation."""

import numpy as np
import pytest


def _tiny_setup():
    import jax

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.train.optim import make_optimizer

    model = BartModel(cfg)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=100, warmup_ratio=0.0)
    return cfg, model, params, tx


def test_rotating_checkpoint_and_resume(tmp_path):
    import jax

    from multimodalsum_tpu.ckpt.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_rotating_checkpoint,
    )
    from multimodalsum_tpu.train.loop import TrainState

    cfg, model, params, tx = _tiny_setup()
    state = TrainState.create(params, tx)
    root = str(tmp_path / "ckpts")

    import os

    for step in (5, 10, 15, 20):
        save_rotating_checkpoint(root, state.replace(step=np.int32(step)), keep=2)
    kept = sorted(os.listdir(root))
    assert kept == ["checkpoint-15", "checkpoint-20"]
    assert latest_checkpoint(root).endswith("checkpoint-20")

    restored = restore_checkpoint(latest_checkpoint(root), state)
    assert int(restored.step) == 20


def test_grad_accumulation_matches_full_batch():
    """accum over 4 microbatches == one step on the full batch (mean loss)."""
    import jax

    from multimodalsum_tpu.train.loop import TrainState, make_train_step
    from multimodalsum_tpu.train.stages import enc_conditional_loss

    cfg, model, params, tx = _tiny_setup()
    rng = np.random.default_rng(0)
    bsz = 8
    hiddens = rng.normal(size=(bsz, 2, 6, cfg.d_model)).astype(np.float32)
    mask = np.ones((bsz, 2, 6), bool)
    labels = rng.integers(3, cfg.vocab_size, (bsz, 7))
    batch = dict(h=hiddens, m=mask, labels=labels)

    def loss_fn(p, b, r):
        return enc_conditional_loss(model, p, b["h"], b["m"], b["labels"], rng=None)

    state = TrainState.create(params, tx)
    full_step = jax.jit(make_train_step(loss_fn, tx, grad_accum=1))
    accum_step = jax.jit(make_train_step(loss_fn, tx, grad_accum=4))

    s_full, loss_full = full_step(state, batch, jax.random.PRNGKey(0))
    s_acc, loss_acc = accum_step(state, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(loss_acc), float(loss_full), rtol=1e-5)
    import chex

    chex.assert_trees_all_close(
        jax.device_get(s_acc.params), jax.device_get(s_full.params),
        rtol=2e-4, atol=1e-6,
    )


def test_grad_accumulation_with_stats_matches_full_batch():
    """Stats-variant (img/multimodal stages): accumulation matches the full
    batch for the parameter update, and BatchNorm-style running stats chain
    THROUGH the microbatch scan (each microbatch sees its predecessor's
    stats — torch accumulation semantics)."""
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.train.loop import (TrainStateWithStats,
                                              make_train_step_with_stats)
    from multimodalsum_tpu.train.stages import enc_conditional_loss

    cfg, model, params, tx = _tiny_setup()
    rng = np.random.default_rng(0)
    bsz = 8
    hiddens = rng.normal(size=(bsz, 2, 6, cfg.d_model)).astype(np.float32)
    batch = dict(h=hiddens, m=np.ones((bsz, 2, 6), bool),
                 labels=rng.integers(3, cfg.vocab_size, (bsz, 7)))

    def loss_fn(p, stats, b, r):
        loss = enc_conditional_loss(model, p, b["h"], b["m"], b["labels"],
                                    rng=None)
        # stand-in for BN running stats: a call counter (proves chaining)
        # and a batch statistic (proves each call sees ITS microbatch)
        return loss, {"calls": stats["calls"] + 1,
                      "mean_h": jnp.mean(b["h"])}

    stats0 = {"calls": jnp.int32(0), "mean_h": jnp.float32(0.0)}
    state = TrainStateWithStats.create(params, stats0, tx)
    full_step = jax.jit(make_train_step_with_stats(loss_fn, tx, grad_accum=1))
    accum_step = jax.jit(make_train_step_with_stats(loss_fn, tx, grad_accum=4))

    s_full, loss_full = full_step(state, batch, jax.random.PRNGKey(0))
    s_acc, loss_acc = accum_step(state, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(loss_acc), float(loss_full), rtol=1e-5)
    import chex

    chex.assert_trees_all_close(
        jax.device_get(s_acc.params), jax.device_get(s_full.params),
        rtol=2e-4, atol=1e-6,
    )
    assert int(s_acc.batch_stats["calls"]) == 4
    assert int(s_full.batch_stats["calls"]) == 1
    # the carried stat reflects the LAST microbatch, not the whole batch
    np.testing.assert_allclose(float(s_acc.batch_stats["mean_h"]),
                               float(np.mean(hiddens[6:])), rtol=1e-5)

    # global batch not divisible by grad_accum must fail loudly
    with pytest.raises(ValueError, match="divisible"):
        make_train_step_with_stats(loss_fn, tx, grad_accum=3)(
            state, batch, jax.random.PRNGKey(0))


def test_latest_checkpoint_ignores_incomplete_and_stray(tmp_path):
    """Resume must skip partially-written checkpoints (no meta.json — the
    completeness marker written after the orbax tree) and not crash on
    stray checkpoint-* names."""
    import os

    from multimodalsum_tpu.ckpt.checkpoint import (latest_checkpoint,
                                                   save_rotating_checkpoint)
    from multimodalsum_tpu.train.loop import TrainState

    cfg, model, params, tx = _tiny_setup()
    state = TrainState.create(params, tx)
    root = str(tmp_path / "ckpts")
    save_rotating_checkpoint(root, state.replace(step=np.int32(7)), keep=3)

    # partially-written checkpoint: state dir exists, meta.json missing
    os.makedirs(os.path.join(root, "checkpoint-99", "state"))
    # stray non-numeric entries must not crash rotation or resume
    os.makedirs(os.path.join(root, "checkpoint-best"))
    os.makedirs(os.path.join(root, "checkpoint-50-old"))

    assert latest_checkpoint(root).endswith("checkpoint-7")
    save_rotating_checkpoint(root, state.replace(step=np.int32(8)), keep=2)
    assert latest_checkpoint(root).endswith("checkpoint-8")
    # the incomplete dir must not occupy a keep slot: with keep=2 both
    # COMPLETE checkpoints survive and the unusable checkpoint-99 is removed
    # (a high-step incomplete dir sorting "newest" would otherwise evict
    # every complete checkpoint at keep=1 and lose resume entirely)
    assert not os.path.exists(os.path.join(root, "checkpoint-99"))
    assert os.path.exists(os.path.join(root, "checkpoint-7", "meta.json"))
    save_rotating_checkpoint(root, state.replace(step=np.int32(9)), keep=1)
    numbered = sorted(d for d in os.listdir(root)
                      if d.split("-")[-1].isdigit())
    assert numbered == ["checkpoint-9"]
    assert latest_checkpoint(root).endswith("checkpoint-9")


def test_load_export_rejects_zero_restore(tmp_path):
    """A wrong checkpoint dir / save_option (no shared keys) must raise
    instead of silently training from the fresh-init template."""
    from multimodalsum_tpu.ckpt.checkpoint import (load_export,
                                                   save_checkpoint)
    from multimodalsum_tpu.train.loop import TrainState

    cfg, model, params, tx = _tiny_setup()
    state = TrainState.create(params, tx)
    directory = str(tmp_path / "export_whole")
    save_checkpoint(directory, state, save_option="whole")

    # correct usage restores fine
    merged = load_export(directory, params)
    assert set(merged) == set(params)

    # mismatched template (e.g. passing a whole-model export where a
    # submodule is expected) shares no keys -> hard error
    with pytest.raises(ValueError, match="ZERO leaves"):
        load_export(directory, {"completely": {"different": np.zeros(2)}})


def test_load_export_casts_to_template_dtype(tmp_path):
    """bf16-stored snapshots (val-min trackers, packs) must restore onto an
    f32 template AS f32 — the template owns the dtype contract, so training
    from a snapshot keeps f32 master params/optimizer state (r5; values
    stay bf16-quantised, upcasting is exact). Integer leaves keep their
    stored dtype."""
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.ckpt.checkpoint import load_export, save_checkpoint
    from multimodalsum_tpu.train.loop import EvalSnapshot

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3) / 7,
              "steps": np.array([3, 4], dtype=np.int32)}
    snap = EvalSnapshot(
        step=jnp.int32(5),
        params=jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if np.issubdtype(x.dtype, np.floating) else x, params))
    d = str(tmp_path / "vm")
    save_checkpoint(d, snap, save_option="whole", epoch=1,
                    extra_meta={"params_only": True})

    template = {"w": np.zeros((2, 3), np.float32),
                "steps": np.zeros(2, np.int32)}
    merged = load_export(d, template)
    assert merged["w"].dtype == np.float32
    assert merged["steps"].dtype == np.int32
    # values are the bf16-quantised originals, exactly upcast
    np.testing.assert_array_equal(
        merged["w"], np.asarray(params["w"].astype(jnp.bfloat16),
                                dtype=np.float32))
    np.testing.assert_array_equal(merged["steps"], params["steps"])


def test_host_accum_matches_scan_accum():
    """Host-driven accumulation (k micro-grad jit calls + one apply —
    train/loop.make_host_accum_step, the program-size-bounded form for
    compile services that reject the full scan-accum program) matches the
    lax.scan accumulation step exactly: same microbatch split, same rng
    folding, same sequential stats chaining."""
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.train.loop import (
        TrainStateWithStats, make_host_accum_step, make_train_step_with_stats,
    )
    from multimodalsum_tpu.train.stages import enc_conditional_loss

    cfg, model, params, tx = _tiny_setup()
    rng = np.random.default_rng(0)
    bsz = 8
    batch = dict(h=rng.normal(size=(bsz, 2, 6, cfg.d_model)).astype(np.float32),
                 m=np.ones((bsz, 2, 6), bool),
                 labels=rng.integers(3, cfg.vocab_size, (bsz, 7)))

    def loss_fn(p, stats, b, r):
        loss = enc_conditional_loss(model, p, b["h"], b["m"], b["labels"],
                                    rng=None)
        return loss, {"calls": stats["calls"] + 1, "mean_h": jnp.mean(b["h"])}

    stats0 = {"calls": jnp.int32(0), "mean_h": jnp.float32(0.0)}
    state = TrainStateWithStats.create(params, stats0, tx)
    scan_step = jax.jit(make_train_step_with_stats(loss_fn, tx, grad_accum=4))
    host_step = make_host_accum_step(loss_fn, tx, grad_accum=4)  # NOT jitted

    s_scan, loss_scan = scan_step(state, batch, jax.random.PRNGKey(0))
    state2 = TrainStateWithStats.create(params, stats0, tx)
    s_host, loss_host = host_step(state2, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(loss_host), float(loss_scan), rtol=1e-6)
    import chex

    chex.assert_trees_all_close(
        jax.device_get(s_host.params), jax.device_get(s_scan.params),
        rtol=1e-5, atol=1e-7,
    )
    assert int(s_host.batch_stats["calls"]) == 4
    np.testing.assert_allclose(float(s_host.batch_stats["mean_h"]),
                               float(s_scan.batch_stats["mean_h"]), rtol=1e-6)
    assert int(s_host.step) == int(s_scan.step) == 1

    with pytest.raises(ValueError, match="divisible"):
        make_host_accum_step(loss_fn, tx, grad_accum=3)(
            TrainStateWithStats.create(params, stats0, tx), batch,
            jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match=">= 2"):
        make_host_accum_step(loss_fn, tx, grad_accum=1)


def test_host_accum_bf16_accumulator_close_to_f32():
    """The bf16 accumulator option (HBM relief at bart-large scale) must
    track the exact f32 accumulation to bf16 rounding tolerance."""
    import jax
    import jax.numpy as jnp

    from multimodalsum_tpu.train.loop import (
        TrainStateWithStats, make_host_accum_step,
    )
    from multimodalsum_tpu.train.stages import enc_conditional_loss

    cfg, model, params, tx = _tiny_setup()
    rng = np.random.default_rng(0)
    bsz = 8
    batch = dict(h=rng.normal(size=(bsz, 2, 6, cfg.d_model)).astype(np.float32),
                 m=np.ones((bsz, 2, 6), bool),
                 labels=rng.integers(3, cfg.vocab_size, (bsz, 7)))

    def loss_fn(p, stats, b, r):
        return (enc_conditional_loss(model, p, b["h"], b["m"], b["labels"],
                                     rng=None), stats)

    # j_apply donates its state, so each run gets its own param copies
    state = lambda: TrainStateWithStats.create(
        jax.tree.map(jnp.array, params), {}, tx)
    s32, l32 = make_host_accum_step(loss_fn, tx, 4)(
        state(), batch, jax.random.PRNGKey(0))
    s16, l16 = make_host_accum_step(loss_fn, tx, 4, accum_dtype=jnp.bfloat16)(
        state(), batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(l16), float(l32), rtol=1e-6)
    # AdamW normalises by sqrt(v), so where the accumulated grad is ~0 a
    # bf16 rounding flip moves that element by O(lr) in the opposite
    # direction — element-exact comparison is the wrong contract. Instead:
    # virtually all elements match tightly, and no element moves further
    # than one full AdamW step (the sign-flip bound).
    a = np.concatenate([x.ravel() for x in
                        jax.tree.leaves(jax.device_get(s16.params))])
    b = np.concatenate([x.ravel() for x in
                        jax.tree.leaves(jax.device_get(s32.params))])
    close = np.isclose(a, b, rtol=0.05, atol=2e-5)
    assert close.mean() > 0.999, f"only {close.mean():.2%} close"
    assert np.max(np.abs(a - b)) < 2.5e-3  # < 2x the AdamW step scale
