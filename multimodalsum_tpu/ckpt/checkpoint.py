"""Orbax checkpointing with the reference's per-stage export contract.

The reference saves ``pytorch_model.bin`` (+ ``training_state.bin``) per
stage, exporting only the submodule the next stage consumes
(``save_option ∈ {whole, text, img, table}``, ``src/train_utils.py:79-97``),
and the next stage loads it with ``load_state_dict``
(``src/multimodal_train.py:116-122``). The HF Trainer additionally rotates
checkpoints and supports full resume (``trainer.py:421-493``), which the
reference's custom loops lack — this framework supports resume for every
stage.

Layout under ``<dir>``:
  ``state/``          full TrainState pytree (params, opt_state, step[, batch_stats])
  ``export/``         the stage's exported submodule params (what the next stage loads)
  ``meta.json``       stage name, epoch, val loss, config snapshot
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional  # noqa: F401 (Optional used in helpers)

import jax
import orbax.checkpoint as ocp

EXPORT_SUBTREES = {
    "whole": None,        # full params
    "text": ("bart",),    # the BART model for stages 2/3 (reference saves model.bart_model)
    "img": ("img_encoder",),
    "table": ("table_encoder",),
}

_CKPTR = None


def _checkpointer() -> "ocp.StandardCheckpointer":
    """One shared StandardCheckpointer — each instance owns an async
    background executor, so constructing a fresh one per save/restore call
    churns threads over a multi-epoch run."""
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _subtree(params, option: str):
    path = EXPORT_SUBTREES[option]
    if path is None:
        return params
    if option == "text" and isinstance(params, dict) and "bart" not in params:
        # stage 1 trains BartModel DIRECTLY (params: shared/encoder/decoder/
        # final_logits_bias — no 'bart' wrapper); its whole model IS the
        # text export. Stages 2/3 hold a MultimodalSum tree with a 'bart'
        # subtree, which is what the next stage consumes.
        return params
    node = params
    for k in path:
        node = node[k]  # KeyError = caller picked the wrong save_option
    return node


def save_checkpoint(
    directory: str,
    state: Any,
    *,
    save_option: str = "whole",
    epoch: int = 0,
    val_loss: float | None = None,
    extra_meta: Optional[dict] = None,
) -> None:
    """Save a train state + per-stage export.

    Multi-controller runs: EVERY process must call this with the same
    host-gathered state (``train/loop.gather_state_to_host``) — orbax's
    ``Checkpointer.save`` synchronizes internally and only the primary host
    writes data; the plain host-file side effects here (meta.json, stats
    cleanup) are primary-only for the same reason (shared filesystem)."""
    primary = jax.process_index() == 0
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    meta_path = os.path.join(directory, "meta.json")
    # invalidate the completeness marker BEFORE touching the state tree: a
    # kill between orbax's rmtree of the old state/ and the meta rewrite
    # must not leave a stale meta.json beside a deleted/partial tree (the
    # resume machinery treats meta presence as "checkpoint is complete")
    if primary and os.path.exists(meta_path):
        os.remove(meta_path)
    ckptr = _checkpointer()
    state = jax.device_get(state)
    ckptr.save(os.path.join(directory, "state"), state, force=True)
    ckptr.save(
        os.path.join(directory, "export"), _subtree(state.params, save_option), force=True
    )
    # BatchNorm running statistics travel with the export (torch state_dicts
    # include BN buffers; load_state_dict transfers them — reference
    # multimodal_train.py:121-122)
    stats = getattr(state, "batch_stats", None)
    stats_sub = None
    if stats is not None:
        try:
            stats_sub = _subtree(stats, save_option)
        except (KeyError, TypeError):
            stats_sub = None
    stats_path = os.path.join(directory, "export_stats")
    if stats_sub:
        ckptr.save(stats_path, stats_sub, force=True)
    elif primary and os.path.isdir(stats_path):
        # a previous save's stats must not pair with this save's export
        import shutil

        shutil.rmtree(stats_path, ignore_errors=True)
    ckptr.wait_until_finished()
    if not primary:
        return
    meta = dict(save_option=save_option, epoch=epoch, val_loss=val_loss,
                step=int(state.step), **(extra_meta or {}))
    # atomic: a kill mid-dump must leave either no meta (incomplete, resume
    # falls back) or the full one — a truncated meta silently reset the
    # resume epoch to 0 and re-trained past the LR horizon
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, meta_path)


def restore_checkpoint(directory: str, template: Any) -> Any:
    """Full-state resume: ``template`` is a TrainState with the right structure
    (e.g. freshly created); returns the restored state."""
    return _checkpointer().restore(
        os.path.join(os.path.abspath(directory), "state"),
        jax.device_get(template))


def _merge(template, restored, path="", stats=None):
    """Recursively overlay ``restored`` onto ``template``; keys present only
    in the template keep their (fresh-init) values — the orbax analog of the
    reference's ``authorized_missing_keys`` (e.g. the multimodal alpha/beta
    gate projections are missing from a text-stage BART export,
    ``modeling_multimodalsum.py:2183``). ``stats`` (optional dict) counts
    restored vs kept leaves so callers can detect a no-op restore."""
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            if isinstance(restored, dict) and k in restored:
                out[k] = _merge(v, restored[k], f"{path}/{k}", stats)
            else:
                if stats is not None:
                    stats["kept"] = stats.get("kept", 0) + len(jax.tree.leaves(v))
                out[k] = v
        return out
    if restored is None:
        if stats is not None:
            stats["kept"] = stats.get("kept", 0) + 1
        return template
    if getattr(restored, "shape", None) != getattr(template, "shape", None):
        # ValueError, not assert: python -O must not silently merge
        # wrong-shaped arrays (surfaces later as an opaque jit shape error)
        raise ValueError(
            f"shape mismatch at {path}: {getattr(restored, 'shape', None)} vs "
            f"{getattr(template, 'shape', None)}")
    if stats is not None:
        stats["restored"] = stats.get("restored", 0) + 1
    # the TEMPLATE owns the dtype contract: bf16-stored snapshots (val-min
    # trackers, packs — half the device->host transfer and disk of f32)
    # restore onto f32 master-param templates as f32, so training from them
    # keeps f32 optimizer state and the model's own bf16 compute cast is
    # unchanged (upcasting bf16 values is exact). Cast only float->float;
    # int/bool leaves keep their stored dtype.
    r_dt = getattr(restored, "dtype", None)
    t_dt = getattr(template, "dtype", None)
    import numpy as _np

    def _is_float(dt):
        return dt is not None and (_np.issubdtype(dt, _np.floating)
                                   or str(dt) == "bfloat16")

    if r_dt != t_dt and _is_float(r_dt) and _is_float(t_dt):
        return restored.astype(t_dt)
    return restored


def load_export(directory: str, template: Any) -> Any:
    """Load a previous stage's exported submodule params onto ``template``.

    Keys absent from the export keep the template's fresh initialisation
    (partial restore); shapes of restored leaves must match. Raises when the
    export shares NO leaves with the template — that always means the wrong
    checkpoint directory / save_option (e.g. a whole-model export passed
    where a bart submodule is expected), and silently training from random
    init would waste the run."""
    restored = _checkpointer().restore(
        os.path.join(os.path.abspath(directory), "export"))
    stats: dict = {}
    out = _merge(jax.device_get(template), restored, stats=stats)
    if not stats.get("restored"):
        top_t = sorted(template)[:6] if isinstance(template, dict) else type(template)
        top_r = sorted(restored)[:6] if isinstance(restored, dict) else type(restored)
        raise ValueError(
            f"export at {directory!r} restored ZERO leaves onto the template "
            f"(template keys {top_t}, export keys {top_r}) — wrong checkpoint "
            f"dir or save_option?")
    return out


def load_export_stats(directory: str, template: Any) -> Any:
    """Load the export's BatchNorm running stats onto ``template`` (identity
    when the export carries none)."""
    path = os.path.join(os.path.abspath(directory), "export_stats")
    if not os.path.isdir(path):
        return template
    return _merge(jax.device_get(template), _checkpointer().restore(path))


def load_state_raw(directory: str):
    """Restore the full saved state as raw nested dicts (no template) —
    robust to optimizer-structure differences when only params/batch_stats
    are needed (e.g. evaluation of a checkpoint trained with different
    optimizer options)."""
    return _checkpointer().restore(
        os.path.join(os.path.abspath(directory), "state"))


def load_eval_params(directory: str, params, batch_stats=None):
    """Load a full training checkpoint's params (and optionally BatchNorm
    stats) onto fresh templates for evaluation/serving — the guarded public
    form of the raw-restore + merge the eval CLIs need (robust to optimizer
    structure differences). Raises when the checkpoint restores ZERO param
    leaves (wrong checkpoint for this model — silently serving random-init
    weights is the failure mode this guard exists for)."""
    raw = load_state_raw(directory)
    stats: dict = {}
    params = _merge(jax.device_get(params), raw.get("params"), stats=stats)
    if not stats.get("restored"):
        raise ValueError(
            f"checkpoint at {directory!r} restored ZERO parameter leaves "
            f"onto this model — wrong checkpoint (e.g. a bart-only stage-1 "
            f"state passed as a multimodal one)?")
    if batch_stats is not None:
        batch_stats = _merge(jax.device_get(batch_stats),
                             raw.get("batch_stats"))
        return params, batch_stats
    return params


def read_meta(directory: str) -> dict:
    with open(os.path.join(directory, "meta.json")) as f:
        return json.load(f)


def save_rotating_checkpoint(
    root: str, state: Any, *, keep: int = 3, save_option: str = "whole",
    epoch: int = 0, val_loss: float | None = None,
) -> str:
    """Step-numbered checkpoints with rotation (the HF Trainer's
    ``checkpoint-<step>`` dirs + ``_rotate_checkpoints``, reference
    ``trainer.py:573-596,843-857``). Returns the new checkpoint dir."""
    import shutil

    step = int(state.step)
    directory = os.path.join(root, f"checkpoint-{step}")
    save_checkpoint(directory, state, save_option=save_option, epoch=epoch,
                    val_loss=val_loss)
    if jax.process_index() != 0:
        return directory  # rotation cleanup is a primary-host job
    # Incomplete numbered dirs (no meta.json — left by a mid-save kill) are
    # unusable for resume; delete them eagerly so they never occupy a slot in
    # the keep window (a stale incomplete dir with a high step number would
    # otherwise sort newest and evict every COMPLETE checkpoint at keep=1).
    existing = []
    for d in sorted(_numbered_checkpoints(root), key=_ckpt_step):
        if os.path.exists(os.path.join(root, d, "meta.json")):
            existing.append(d)
        elif os.path.join(root, d) != directory:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    for stale in existing[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(root, stale), ignore_errors=True)
    return directory


def _ckpt_step(name: str) -> int:
    return int(name.split("-")[1])


def _numbered_checkpoints(root: str):
    """``checkpoint-<int>`` dir names only — stray entries like
    ``checkpoint-best`` or ``checkpoint-500-old`` are ignored instead of
    crashing rotation/resume."""
    out = []
    for d in os.listdir(root):
        parts = d.split("-")
        if len(parts) == 2 and parts[0] == "checkpoint" and parts[1].isdigit():
            out.append(d)
    return out


def latest_checkpoint(root: str) -> Optional[str]:
    """Most recent COMPLETE ``checkpoint-<step>`` dir for resume, or None.
    A checkpoint is complete when its ``meta.json`` exists — save_checkpoint
    writes it after the orbax state tree, so a run killed mid-save leaves no
    meta.json and the previous good checkpoint is returned instead."""
    if not os.path.isdir(root):
        return None
    dirs = [d for d in _numbered_checkpoints(root)
            if os.path.exists(os.path.join(root, d, "meta.json"))]
    if not dirs:
        return None
    best = max(dirs, key=_ckpt_step)
    return os.path.join(root, best)
