"""Unit tests for scripts/train_real_ckpt.py's best-val snapshot wrapper.

The wrapper preserves the stage-3 validation-minimum save as ckpt_valmin/
while the main run deliberately overfits past it (peaked logits for the
quantization gate — reference metric contract ``src/test.py:222-236``).
"""

import json
import os

import jax.numpy as jnp
import optax
import pytest
from flax.training import train_state

from multimodalsum_tpu.ckpt.checkpoint import save_checkpoint
from scripts.train_real_ckpt import make_snapshot_save


@pytest.fixture
def tiny_state():
    return train_state.TrainState.create(
        apply_fn=lambda *a, **k: None,
        params={"w": jnp.ones((2,))},
        tx=optax.sgd(0.1),
    )


def _valmin_meta():
    with open("ckpt_valmin/multimodal_trained_yelp/meta.json") as f:
        return json.load(f)


def test_snapshot_tracks_best_val(tiny_state, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    save = make_snapshot_save(save_checkpoint)
    save("ckpt/multimodal_trained_yelp", tiny_state, epoch=11, val_loss=6.0)
    assert _valmin_meta()["epoch"] == 11
    # worse val: canonical save advances, snapshot does not
    save("ckpt/multimodal_trained_yelp", tiny_state, epoch=22, val_loss=7.0)
    assert _valmin_meta()["epoch"] == 11
    canonical = json.load(open("ckpt/multimodal_trained_yelp/meta.json"))
    assert canonical["epoch"] == 22
    # better val: snapshot overwritten
    save("ckpt/multimodal_trained_yelp", tiny_state, epoch=33, val_loss=5.0)
    assert _valmin_meta() == {"save_option": "whole", "epoch": 33,
                              "val_loss": 5.0, "step": 0}


def test_snapshot_ignores_missing_val(tiny_state, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    save = make_snapshot_save(save_checkpoint)
    save("ckpt/multimodal_trained_yelp", tiny_state, epoch=1, val_loss=None)
    assert not os.path.exists("ckpt_valmin")


def test_snapshot_seeds_from_prior_attempt(tiny_state, tmp_path, monkeypatch):
    """A crash+retry builds a FRESH wrapper; it must seed its best-val from
    the existing snapshot instead of overwriting it with a worse save."""
    monkeypatch.chdir(tmp_path)
    make_snapshot_save(save_checkpoint)(
        "ckpt/multimodal_trained_yelp", tiny_state, epoch=55, val_loss=5.37)
    retry = make_snapshot_save(save_checkpoint)  # fresh tracker, as on retry
    retry("ckpt/multimodal_trained_yelp", tiny_state, epoch=66, val_loss=5.9)
    assert _valmin_meta()["epoch"] == 55  # worse save did not clobber
    retry("ckpt/multimodal_trained_yelp", tiny_state, epoch=60, val_loss=5.1)
    assert _valmin_meta()["epoch"] == 60  # genuinely better save did
