"""Tracing, metrics, and structured logging.

The reference has almost no observability (wall-clock prints in the custom
loops, ``src/text_pretrain.py:174-178``; optional torch-XLA metric dumps in
the vendored Trainer, ``trainer.py:604-606``). This module provides the
TPU-native equivalents:

* :class:`StepTimer` — tokens/sec and examples/sec meters with
  ``block_until_ready`` timing;
* :func:`trace` — context manager around the JAX profiler (produces
  TensorBoard-loadable traces of XLA execution);
* :class:`MetricLogger` — JSON-lines metric logging (one parseable line per
  event, the Trainer's log format modernised) with optional TensorBoard
  writing when ``tensorflow`` is present and optional Weights & Biases
  logging (reference ``setup_wandb``, ``trainer.py:359-391``) when ``wandb``
  is present — both import-gated, both honoring the reference's
  ``WANDB_DISABLED`` env switch;
* :class:`AverageMeter` — running average (reference ``src/utils.py:40-55``).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import jax


class AverageMeter:
    """Running average (reference ``AverageMeter``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0


class StepTimer:
    """Throughput meter: call :meth:`step` once per completed device step."""

    def __init__(self, tokens_per_step: int = 0, examples_per_step: int = 0,
                 warmup_steps: int = 1):
        self.tokens = tokens_per_step
        self.examples = examples_per_step
        self.warmup = warmup_steps
        self._steps = 0
        # warmup 0 measures from construction (the `== warmup` trigger below
        # can never fire at 0: _steps is incremented before the comparison)
        self._t0: Optional[float] = time.time() if warmup_steps == 0 else None

    def step(self, result=None) -> None:
        if result is not None:
            leaves = [x for x in jax.tree.leaves(result) if hasattr(x, "ndim")]
            if leaves:
                # block_until_ready does NOT block on the axon backend
                # (SCALING.md "Benchmark hygiene"); a one-element host read
                # forces execution completion, so rates are execution rates
                x = leaves[0]
                jax.device_get(x if x.ndim == 0 else x[(0,) * x.ndim])
            else:
                jax.block_until_ready(result)
        self._steps += 1
        if self._steps == self.warmup:
            self._t0 = time.time()

    @property
    def measured_steps(self) -> int:
        return max(self._steps - self.warmup, 0)

    def rates(self) -> dict:
        if self._t0 is None or self.measured_steps == 0:
            return {}
        dt = time.time() - self._t0
        sps = self.measured_steps / dt
        out = {"steps_per_sec": sps}
        if self.tokens:
            out["tokens_per_sec"] = sps * self.tokens
        if self.examples:
            out["examples_per_sec"] = sps * self.examples
        return out


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """JAX profiler trace (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricLogger:
    """JSON-lines metrics + optional TensorBoard."""

    def __init__(self, log_path: Optional[str] = None,
                 tensorboard_dir: Optional[str] = None, stdout: bool = True,
                 wandb_project: Optional[str] = None,
                 run_name: Optional[str] = None,
                 config: Optional[dict] = None):
        self.stdout = stdout
        self._file = None
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
            self._file = open(log_path, "a", encoding="utf-8")
        self._tb = None
        if tensorboard_dir:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except ImportError:
                self._tb = None
        self._wandb = None
        if wandb_project:
            self.setup_wandb(wandb_project, run_name=run_name, config=config)

    def setup_wandb(self, project: str, run_name: Optional[str] = None,
                    config: Optional[dict] = None) -> bool:
        """W&B experiment logging (reference ``Trainer.setup_wandb``,
        ``trainer.py:359-391``): ``wandb.init(project, config, name)`` with
        metrics forwarded from :meth:`log`. Import-gated — returns False
        (and logging proceeds without W&B) when the ``wandb`` package is
        missing or ``WANDB_DISABLED`` is truthy, mirroring the reference's
        env switch."""
        if os.environ.get("WANDB_DISABLED", "").lower() in ("1", "true", "yes"):
            return False
        try:
            import wandb
        except ImportError:
            return False
        self._wandb = wandb
        wandb.init(project=os.environ.get("WANDB_PROJECT", project),
                   config=config or {}, name=run_name)
        return True

    @staticmethod
    def _sanitize(v):
        # non-finite floats (diverged loss) serialize as null — bare NaN/Inf
        # literals are not valid JSON and break line parsers. Recurses into
        # lists/dicts (e.g. per-reference metric lists).
        import math

        if isinstance(v, dict):
            return {k: MetricLogger._sanitize(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [MetricLogger._sanitize(x) for x in v]
        if isinstance(v, (float, int, str, bool)) or v is None:
            return None if isinstance(v, float) and not math.isfinite(v) else v
        if hasattr(v, "tolist") and getattr(v, "ndim", 0) > 0:
            # numpy/jax ARRAYS (e.g. per-reference metric lists): float(v)
            # on a multi-element array raises, and json.dumps would raise
            # again on the raw array — recurse over the list form instead
            return MetricLogger._sanitize(v.tolist())
        try:
            f = float(v)  # numpy / jax scalars
        except (TypeError, ValueError):
            return v
        return None if not math.isfinite(f) else f

    def log(self, step: int, **metrics) -> None:
        record = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            # a metric named 'step'/'time' must not collide with the record
            # keys (dict(**) would raise TypeError mid-run)
            record[f"{k}_metric" if k in record else k] = v
        record = {k: self._sanitize(v) for k, v in record.items()}
        line = json.dumps(record, default=float)
        if self.stdout:
            print(line, flush=True)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                # iterate the SANITIZED record: raw numpy/jax scalars fail
                # an isinstance((int, float)) check and would silently drop
                # from TensorBoard while reaching the JSONL file and wandb
                for k, v in record.items():
                    if k not in ("step", "time") and isinstance(v, (int, float)):
                        tf.summary.scalar(k, v, step=step)
        if self._wandb is not None:
            numeric = {k: v for k, v in record.items()
                       if k not in ("step", "time") and isinstance(v, (int, float))}
            self._wandb.log(numeric, step=step)

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb is not None:
            # the TF writer buffers with a ~2 min flush interval: a short
            # run that exits without closing can lose its last events
            self._tb.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass


def init_logger(name: str = "multimodalsum_tpu",
                output_path: Optional[str] = None,
                level: int = 20) -> "logging.Logger":
    """Console + optional file logger (reference mlutils ``init_logger``,
    ``mlutils/helpers/logging.py:31``): one shared formatter, a stream
    handler always, and a file handler when ``output_path`` is given — an
    existing directory (or a path ending in the separator) gets a
    timestamped ``log_*.txt`` inside it, anything else is the log file
    itself (parents created). Re-initialisation closes and replaces the
    previous handlers instead of stacking duplicates."""
    import logging

    logger = logging.getLogger(name)
    logger.setLevel(level)
    for h in logger.handlers:
        h.close()
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s [%(levelname)s]: %(message)s")
    stream = logging.StreamHandler()
    stream.setFormatter(fmt)
    logger.addHandler(stream)
    # the logger owns its handlers; propagating to a configured root logger
    # would emit every record twice
    logger.propagate = False
    if output_path:
        if os.path.isdir(output_path) or output_path.endswith(os.sep):
            os.makedirs(output_path, exist_ok=True)
            output_path = os.path.join(
                output_path, time.strftime("log_%b_%d_%H_%M_%S.txt"))
        else:
            os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        fh = logging.FileHandler(output_path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
