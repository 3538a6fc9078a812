"""Unit tests for the round-4 real-checkpoint training machinery.

* ``scripts/train_real_ckpt.resume_args`` must never offer a params-only
  save (pack-restored checkpoint or val-min snapshot — both lack opt_state)
  for full-state resume (advisor r3, medium).
* the per-epoch ``on_val`` hook chain: ``train_model`` fires it every epoch
  and ``cli.common.make_hooks`` both logs a per-epoch ``val_loss`` record
  (the r3 valmin post-mortem: per-epoch val loss was unobservable after the
  fact) and forwards to the caller's tracker.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training import train_state

from multimodalsum_tpu.ckpt.checkpoint import save_checkpoint
from scripts.train_real_ckpt import resume_args


@pytest.fixture
def tiny_state():
    return train_state.TrainState.create(
        apply_fn=lambda *a, **k: None,
        params={"w": jnp.ones((2,))},
        tx=optax.sgd(0.1),
    )


def test_resume_args_full_save(tiny_state, tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, tiny_state, epoch=3, val_loss=1.0)
    assert resume_args(d) == ["--resume", d]


def test_resume_args_skips_params_only(tiny_state, tmp_path):
    """A val-min snapshot (params_only) or a pack-restored dir (packed) has
    no opt_state; restore against a full TrainState template would die on
    the structure mismatch — resume_args must fall back to a fresh start."""
    for flag in ("params_only", "packed"):
        d = str(tmp_path / flag)
        save_checkpoint(d, tiny_state, epoch=3, val_loss=1.0,
                        extra_meta={flag: True})
        assert resume_args(d) == []


def test_resume_args_missing_or_bad_meta(tmp_path):
    assert resume_args(str(tmp_path / "nope")) == []
    d = tmp_path / "bad"
    os.makedirs(d)
    (d / "meta.json").write_text("{truncated")
    assert resume_args(str(d)) == []


def _run_tiny_loop(hooks, num_epochs=3):
    """Drive train_model with stub steps: train loss constant, val loss
    dips at epoch 1 then rises (a true interior minimum)."""
    from multimodalsum_tpu.train.loop import TrainState, train_model

    state = TrainState.create({"w": jnp.ones((2,))}, optax.sgd(0.1))
    # eval_step runs under jit (traced once): derive the per-epoch loss from
    # state.step (1 train step/epoch -> step e+1 at epoch e's validation)
    losses = jnp.asarray([3.0, 1.0, 2.0])

    def train_step(state, batch, rng):
        return state.replace(step=state.step + 1), jnp.float32(0.5)

    def eval_step(state, batch):
        return losses[jnp.clip(state.step - 1, 0, 2)]

    import jax

    return train_model(
        state, train_step, eval_step,
        lambda e: [np.zeros((8, 1), np.float32)],
        lambda: [np.zeros((8, 1), np.float32)],
        num_epochs=num_epochs, rng=jax.random.PRNGKey(0), hooks=hooks)


def test_on_val_fires_every_epoch():
    from multimodalsum_tpu.train.loop import LoopHooks

    seen = []
    _run_tiny_loop(LoopHooks(
        log=lambda m: None,
        on_val=lambda st, epoch, vl: seen.append((epoch, round(vl, 2)))))
    assert seen == [(0, 3.0), (1, 1.0), (2, 2.0)]


def test_make_hooks_logs_val_loss_and_chains(tmp_path):
    """make_hooks: one val_loss JSON-lines record per epoch, caller's
    on_val still called — the minimum is observable after the fact."""
    import types

    from multimodalsum_tpu.cli.common import make_hooks

    log_path = str(tmp_path / "m.jsonl")
    args = types.SimpleNamespace(metrics_log=log_path, wandb_project=None,
                                 run_name=None, save_interval=1,
                                 num_epochs=3)
    best = {"vl": float("inf"), "epoch": None}

    def track(st, epoch, vl):
        if vl < best["vl"]:
            best.update(vl=vl, epoch=epoch)

    hooks = make_hooks(args, save=None, on_val=track)
    _run_tiny_loop(hooks)
    assert (best["epoch"], best["vl"]) == (1, 1.0)
    rows = [json.loads(l) for l in open(log_path) if l.strip()]
    val_rows = [r for r in rows if "val_loss" in r]
    assert [round(r["val_loss"], 2) for r in val_rows] == [3.0, 1.0, 2.0]
    assert [r["epoch"] for r in val_rows] == [1, 2, 3]
