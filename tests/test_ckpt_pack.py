"""Durable checkpoint packs (scripts/ckpt_pack.py): roundtrip fidelity.

The pack is what lets the round-end bench gate on a trained checkpoint after
the gitignored ``_work/`` tree is cleaned — a lossy or structurally wrong
roundtrip would silently gate on garbage weights, so the tests assert both
tree structure and bf16-bit-exactness of every float leaf."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodalsum_tpu.ckpt.checkpoint import (
    load_eval_params,
    load_export,
    read_meta,
    save_checkpoint,
)
from multimodalsum_tpu.train.loop import TrainStateWithStats
from scripts.ckpt_pack import (
    CKPT_DIRS,
    _flatten,
    _unflatten,
    pack,
    pack_ckpt,
    unpack,
    unpack_ckpt,
)


def _tiny_state(seed=0):
    k = jax.random.PRNGKey(seed)
    params = {
        "bart": {"w": jax.random.normal(k, (4, 3), jnp.float32),
                 "b": jnp.zeros((3,), jnp.float32)},
        "img_encoder": {"conv": jax.random.normal(k, (2, 2), jnp.float32)},
    }
    stats = {"img_encoder": {"bn": {"mean": jnp.ones((2,), jnp.float32)}}}
    tx = optax.adamw(1e-3)
    return TrainStateWithStats.create(params, stats, tx)


def test_flatten_roundtrip():
    tree = {"a": {"b": np.arange(3), "c": {"d": np.ones(2)}}, "e": np.zeros(1)}
    flat = _flatten(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = _unflatten(flat)
    assert jax.tree.structure(tree) == jax.tree.structure(back)


def test_pack_unpack_roundtrip(tmp_path):
    state = _tiny_state()
    src = tmp_path / "src_ckpt"
    save_checkpoint(str(src), state, save_option="whole", epoch=7,
                    val_loss=1.25)
    npz = tmp_path / "pack" / "ckpt.npz"
    pack_ckpt(str(src), str(npz))
    dst = tmp_path / "dst_ckpt"
    unpack_ckpt(str(npz), str(dst))

    meta = read_meta(str(dst))
    assert meta["epoch"] == 7 and meta["val_loss"] == 1.25
    # the restored params must be the bf16 cast of the originals, upcast to
    # f32 — exactly what the bf16-compute model sees either way
    p, bs = load_eval_params(str(dst), jax.device_get(state.params),
                             jax.device_get(state.batch_stats))
    want = jax.tree.map(
        lambda a: np.asarray(a, jnp.bfloat16).astype(np.float32), state.params)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(
        bs["img_encoder"]["bn"]["mean"]).dtype == np.float32
    # export/ is re-derived from meta's save_option (whole → full params)
    exp = load_export(str(dst), jax.device_get(state.params))
    assert set(exp) == set(state.params)


def test_pack_unpack_submodule_export(tmp_path):
    """A stage-2a-style img export must survive the pack (next stage loads
    export/, not state/)."""
    state = _tiny_state()
    src = tmp_path / "src"
    save_checkpoint(str(src), state, save_option="img", epoch=2)
    npz = tmp_path / "p" / "c.npz"
    pack_ckpt(str(src), str(npz))
    dst = tmp_path / "dst"
    unpack_ckpt(str(npz), str(dst))
    exp = load_export(str(dst),
                      jax.device_get(state.params)["img_encoder"])
    assert set(exp) == {"conv"}


def test_workroot_pack_skips_incomplete_and_preserves_newer(tmp_path):
    from scripts.train_real_ckpt import EPOCHS

    work = tmp_path / "work"
    packd = tmp_path / "packd"
    # one complete checkpoint, one incomplete (no meta.json)
    s3 = work / "ckpt" / "multimodal_trained_yelp"
    save_checkpoint(str(s3), _tiny_state(), save_option="whole",
                    epoch=EPOCHS["stage3"] - 1)
    incomplete = work / "ckpt" / "text_pretrained_yelp"
    os.makedirs(incomplete / "state")
    # non-checkpoint payload the gate needs
    os.makedirs(work / "tok")
    (work / "tok" / "vocab.json").write_text(json.dumps({"a": 1}))
    (work / "metrics_stage3.jsonl").write_text('{"val_loss": 5.4}\n')

    packed = pack(str(work), str(packd))
    names = [rel for rel, _ in packed]
    assert "ckpt/multimodal_trained_yelp" in names
    assert "ckpt/text_pretrained_yelp" not in names

    # restore into an empty root: workdir + the complete ckpt come back
    fresh = tmp_path / "fresh"
    restored = unpack(str(packd), str(fresh))
    assert "workdir" in restored
    assert "ckpt/multimodal_trained_yelp" in restored
    assert json.load(open(fresh / "tok" / "vocab.json")) == {"a": 1}
    assert read_meta(str(fresh / "ckpt" / "multimodal_trained_yelp"))[
        "epoch"] == EPOCHS["stage3"] - 1

    # a NEWER complete checkpoint on disk must win over the pack
    newer = fresh / "ckpt" / "multimodal_trained_yelp"
    save_checkpoint(str(newer), _tiny_state(seed=9), save_option="whole",
                    epoch=999)
    restored2 = unpack(str(packd), str(fresh))
    assert "ckpt/multimodal_trained_yelp" not in restored2
    assert read_meta(str(newer))["epoch"] == 999

    # re-pack with an unchanged save: marked unchanged, not rewritten
    packed2 = pack(str(work), str(packd))
    assert ("ckpt/multimodal_trained_yelp", "unchanged") in packed2


def test_ckpt_dirs_cover_gate_and_stages():
    """bench.quality_gate reads the stage-3 pairs for BOTH datasets; the
    expensive-to-retrain stage-0/1 exports are packed for seeded retrains.
    The img/table stage-2 dirs are deliberately NOT packed (re-derivable in
    ~10 min/stage; 3 GB of permanent git history otherwise — r5). The yelp
    stage-3 threshold is the r5 epoch-60 cut, below train_real_ckpt's
    r4-era 120-epoch budget (meta records the last epoch INDEX)."""
    from scripts.train_real_ckpt import EPOCHS

    dirs = dict(CKPT_DIRS)
    assert dirs["ckpt/multimodal_trained_yelp"] == 59
    assert dirs["ckpt/multimodal_trained_yelp"] <= EPOCHS["stage3"] - 1
    assert dirs["ckpt/text_pretrained_yelp"] == EPOCHS["stage1"] - 1
    assert dirs["ckpt_valmin/multimodal_trained_yelp"] == 0
    assert dirs["ckpt/multimodal_trained_amazon"] == 59
    assert dirs["ckpt_valmin/multimodal_trained_amazon"] == 0
    assert "ckpt/img_pretrained_yelp" not in dirs


def test_pack_skips_midstage_intermediate(tmp_path):
    """An intermediate save (epoch below the stage's completion threshold)
    must NOT be packed — the pack drops opt_state, so a seeded retrain
    could not mid-stage-resume from it."""
    work = tmp_path / "w"
    mid = work / "ckpt" / "text_pretrained_yelp"
    save_checkpoint(str(mid), _tiny_state(), save_option="text", epoch=44)
    os.makedirs(work / "tok")
    packed = pack(str(work), str(tmp_path / "p"))
    assert all(rel != "ckpt/text_pretrained_yelp" for rel, _ in packed)
