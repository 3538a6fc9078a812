"""Experiment dirs, observability meters, TP sharding rules."""

import json
import os

import numpy as np


def test_next_run_dir(tmp_path):
    from multimodalsum_tpu.core.experiments import next_run_dir, snapshot_config

    a = next_run_dir(str(tmp_path))
    b = next_run_dir(str(tmp_path))
    assert a.endswith("run_1") and b.endswith("run_2")
    cfg = snapshot_config(a, lr=1e-4, stage="text")
    loaded = json.load(open(cfg))
    assert loaded["lr"] == 1e-4 and "created" in loaded


def test_metric_logger(tmp_path):
    from multimodalsum_tpu.core.observability import MetricLogger

    path = str(tmp_path / "metrics.jsonl")
    log = MetricLogger(log_path=path, stdout=False)
    log.log(1, loss=0.5, tokens_per_sec=1000)
    log.log(2, loss=0.4)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["step"] == 2


def test_metric_logger_wandb_backend(tmp_path, monkeypatch):
    """W&B backend (reference Trainer.setup_wandb, trainer.py:359-391):
    init with project/config/name, per-step log forwarding, finish on close,
    WANDB_DISABLED honored. Driven with a fake wandb module (the real
    package is absent offline — the backend is import-gated)."""
    import sys
    import types

    calls = dict(init=None, logs=[], finished=0)
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls.__setitem__("init", kw)
    fake.log = lambda metrics, step=None: calls["logs"].append((step, metrics))
    fake.finish = lambda: calls.__setitem__("finished", calls["finished"] + 1)
    monkeypatch.setitem(sys.modules, "wandb", fake)
    monkeypatch.delenv("WANDB_DISABLED", raising=False)

    from multimodalsum_tpu.core.observability import MetricLogger

    log = MetricLogger(stdout=False, wandb_project="mmsum",
                       run_name="r2", config={"lr": 1e-5})
    assert calls["init"] == dict(project="mmsum", config={"lr": 1e-5}, name="r2")
    log.log(3, loss=0.25, note="text")  # non-numeric values filtered for W&B
    assert calls["logs"] == [(3, {"loss": 0.25})]
    log.close()
    assert calls["finished"] == 1

    # the reference's WANDB_DISABLED env switch
    monkeypatch.setenv("WANDB_DISABLED", "true")
    log2 = MetricLogger(stdout=False, wandb_project="mmsum")
    assert log2._wandb is None
    log2.log(1, loss=1.0)
    assert calls["logs"] == [(3, {"loss": 0.25})]


def test_step_timer():
    from multimodalsum_tpu.core.observability import StepTimer

    t = StepTimer(tokens_per_step=100, examples_per_step=4, warmup_steps=1)
    for _ in range(4):
        t.step()
    rates = t.rates()
    assert rates["steps_per_sec"] > 0
    assert abs(rates["tokens_per_sec"] / rates["steps_per_sec"] - 100) < 1e-6


def test_tp_sharding_rules():
    import jax
    from jax.sharding import PartitionSpec as P

    from multimodalsum_tpu.core.config import TINY_CONFIG as cfg
    from multimodalsum_tpu.models.bart import BartModel
    from multimodalsum_tpu.parallel.mesh import make_mesh
    from multimodalsum_tpu.parallel.sharding import param_shardings

    model = BartModel(cfg, multimodal=True)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh)

    dec0 = shardings["decoder"]["layers_0"]
    assert dec0["self_attn"]["q_proj"]["kernel"].spec == P(None, "model")
    assert dec0["self_attn"]["out_proj"]["kernel"].spec == P("model", None)
    assert dec0["fc1"]["kernel"].spec == P(None, "model")
    assert dec0["fc2"]["kernel"].spec == P("model", None)
    assert dec0["encoder_attn"]["k_proj"]["kernel"].spec == P(None, "model")
    # replicated leaves
    assert shardings["shared"]["embedding"].spec == P()
    assert dec0["self_attn_layer_norm"]["scale"].spec == P()
    assert dec0["encoder_attn"]["alpha_proj"]["kernel"].spec == P()


def test_position_overflow_raises():
    """Sequences longer than the position table raise at trace time instead
    of silently clamping the gather (which produced NaN losses)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from multimodalsum_tpu.core.config import TINY_CONFIG, GenerationConfig
    from multimodalsum_tpu.decode.engine import generate
    from multimodalsum_tpu.models.bart import BartModel

    cfg = TINY_CONFIG  # max_position_embeddings = 64
    model = BartModel(cfg, multimodal=False)
    params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]

    ids = jnp.ones((1, cfg.max_position_embeddings + 1), jnp.int32)
    with pytest.raises(ValueError, match="max_position_embeddings"):
        model.apply({"params": params}, ids, None, method=BartModel.encode)

    hid = jnp.zeros((1, 1, 4, cfg.d_model))
    gen = GenerationConfig(num_beams=2, max_length=cfg.max_position_embeddings + 1)
    with pytest.raises(ValueError, match="max_position_embeddings"):
        generate(model, params, [hid], [jnp.ones((1, 1, 4), bool)], None, gen)


def test_make_hooks_metrics_log(tmp_path):
    """--metrics_log plumbing: console line plus one JSON record per log call."""
    import argparse
    import json as _json

    from multimodalsum_tpu.cli.common import make_hooks

    path = str(tmp_path / "m.jsonl")
    args = argparse.Namespace(metrics_log=path)
    hooks = make_hooks(args, save=None)
    hooks.log(dict(epoch=1, step=3, steps_per_epoch=10, loss=1.25, elapsed="00:00:01"))
    rec = _json.loads(open(path).read().strip())
    assert rec["step"] == 3 and rec["loss"] == 1.25

    args = argparse.Namespace(metrics_log=None)
    assert make_hooks(args, save=None).save is None


def test_prefetch_uneven_tail_falls_back_unsharded():
    """drop_last=False validation tails whose size does not divide the mesh
    data axis must transfer unsharded instead of raising (the train loop's
    unsharded-eval fallback handles them)."""
    import numpy as np

    from multimodalsum_tpu.data.prefetch import prefetch_to_device
    from multimodalsum_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    b_shard = batch_sharding(mesh)
    batches = [dict(x=np.zeros((16, 3))), dict(x=np.zeros((5, 3)))]
    out = list(prefetch_to_device(iter(batches), sharding=b_shard))
    assert len(out) == 2
    assert out[0]["x"].shape == (16, 3)
    assert out[1]["x"].shape == (5, 3)  # uneven tail survives


def test_shard_order_equal_counts():
    """Per-host sharding pads with wrapped indices so every shard gets the
    same count (multi-host steps-per-epoch must match or collectives hang)."""
    import numpy as np

    from multimodalsum_tpu.data.text import shard_order

    order = np.arange(99)
    shards = [shard_order(order, i, 2) for i in range(2)]
    assert len(shards[0]) == len(shards[1]) == 50
    assert shards[1][-1] == order[0]  # wrap-around pad
    np.testing.assert_array_equal(shard_order(order, 0, 1), order)


def test_init_logger_console_and_file(tmp_path, capsys):
    from multimodalsum_tpu.core.observability import init_logger

    log_file = tmp_path / "run" / "train.log"
    logger = init_logger("msum-test", str(log_file))
    logger.info("hello world")
    # re-init must replace handlers, not stack duplicates
    logger = init_logger("msum-test", str(log_file))
    logger.info("second line")
    assert len(logger.handlers) == 2  # one stream + one file
    text = log_file.read_text()
    assert "hello world" in text and "second line" in text
    # directory form: a timestamped log_*.txt is created inside
    d = tmp_path / "dir_logs"
    d.mkdir()  # existing directory (or trailing separator) selects dir mode
    logger2 = init_logger("msum-test-2", str(d))
    logger2.warning("to dir")
    files = list(d.glob("log_*.txt"))
    assert files and "to dir" in files[0].read_text()


def test_host_prefetch_order_and_errors():
    """host_prefetch must yield the producer's batches unchanged and in
    order (single background thread), and re-raise producer exceptions at
    the consumer."""
    import numpy as np

    from multimodalsum_tpu.data.prefetch import host_prefetch

    batches = [dict(x=np.full((2, 3), i)) for i in range(7)]
    got = list(host_prefetch(iter(batches), depth=2))
    assert len(got) == 7
    for i, b in enumerate(got):
        np.testing.assert_array_equal(b["x"], batches[i]["x"])

    def boom():
        yield batches[0]
        raise RuntimeError("producer exploded")

    it = host_prefetch(boom(), depth=2)
    next(it)
    import pytest

    with pytest.raises(RuntimeError, match="producer exploded"):
        list(it)


def test_mesh_for_batch_and_host_shard_guards():
    """mesh_for_batch picks the LARGEST batch divisor that fits the device
    count (gcd left devices idle: batch 6 on 8 devices can use 6 chips);
    host_data_shard refuses configs whose per-host shard trains zero steps."""
    import pytest

    from multimodalsum_tpu.cli.common import (
        _largest_divisor_leq, host_data_shard, mesh_for_batch,
    )

    assert _largest_divisor_leq(6, 8) == 6
    assert _largest_divisor_leq(12, 8) == 6
    assert _largest_divisor_leq(8, 8) == 8
    assert _largest_divisor_leq(7, 4) == 1
    mesh = mesh_for_batch(6)  # conftest forces an 8-CPU-device world
    assert mesh.devices.size == 6

    si, sc, steps = host_data_shard(10, batch_size=4)
    assert (si, sc, steps) == (0, 1, 2)
    with pytest.raises(SystemExit, match="ZERO steps"):
        host_data_shard(3, batch_size=4)


def test_metric_logger_arrays_colliding_keys_and_timer(tmp_path):
    """Array metrics serialize as lists (not TypeError), metrics named
    'step'/'time' don't collide with the record keys, and StepTimer with
    warmup 0 measures from construction."""
    import json as _json

    import numpy as np

    from multimodalsum_tpu.core.observability import MetricLogger, StepTimer

    path = tmp_path / "m.jsonl"
    ml = MetricLogger(log_path=str(path), stdout=False)
    ml.log(1, rouge_per_ref=np.array([0.31, 0.28]), time=3.5, loss=np.float32(2.0))
    ml.close()
    rec = _json.loads(path.read_text().splitlines()[0])
    assert rec["rouge_per_ref"] == [0.31, 0.28]
    assert rec["time_metric"] == 3.5 and isinstance(rec["time"], float)
    assert rec["loss"] == 2.0

    t = StepTimer(tokens_per_step=10, warmup_steps=0)
    t.step()
    t.step()
    r = t.rates()
    assert r and r["tokens_per_sec"] > 0 and t.measured_steps == 2


def test_host_prefetch_releases_producer_on_early_close():
    """Abandoning a (possibly nested) prefetch iterator mid-epoch — what
    train_model's max_steps_per_epoch break does — must release the
    host_prefetch producer thread instead of leaving it parked on a full
    queue for the life of the process."""
    import threading
    import time

    from multimodalsum_tpu.data.prefetch import host_prefetch, prefetch_to_device

    started = threading.Event()

    def slow_source():
        i = 0
        while True:  # unbounded: only early close can end the producer
            started.set()
            yield {"x": np.full((2, 2), i)}
            i += 1

    before = {t.ident for t in threading.enumerate()}
    it = prefetch_to_device(host_prefetch(slow_source(), depth=2))
    first = next(it)
    assert first["x"].shape == (2, 2)
    assert started.wait(5)
    it.close()  # what the train loop's capped break triggers

    deadline = time.time() + 5
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.name == "host_prefetch" and t.ident not in before
                  and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"host_prefetch producer thread leaked: {leaked}"


def test_host_prefetch_normal_drain_still_works():
    from multimodalsum_tpu.data.prefetch import host_prefetch

    out = list(host_prefetch(iter([1, 2, 3]), depth=1))
    assert out == [1, 2, 3]

    # producer exceptions still re-raise at the consumer
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = host_prefetch(bad(), depth=1)
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom"):
        list(it)
