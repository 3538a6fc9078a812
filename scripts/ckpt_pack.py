"""Durable checkpoint packs: the trained-gate artifacts, git-committable.

The in-environment-trained bart-large checkpoint (``scripts/train_real_ckpt.py``
→ ``_work/real_ckpt``) powers ``bench.py``'s trained-weights quality gate —
the thing that promotes the quantized throughput config to the headline with
measured id-ROUGE-L instead of random-init coin flips. But ``_work/`` is
gitignored and the round driver can clean the tree between sessions; round 3
lost a finished ~1.5 h training run exactly that way. This tool packs the
eval-relevant subset of the work dir into ``assets/real_ckpt_pack/``
(committed) and restores it into a fresh ``_work/real_ckpt`` where both
``bench.py``'s gate and ``train_real_ckpt.py``'s stage-skip logic find it
exactly as if training had just finished.

Per checkpoint the pack stores params + batch_stats + step, float32 leaves
cast to bfloat16 (stored as uint16 views — ``np.save`` rejects ml_dtypes).
The model computes in bf16 (``MultimodalSum(dtype=jnp.bfloat16)``), so decode
outputs from a restored pack are bit-identical to the fp32-master original.
Optimizer state is deliberately NOT packed: stages are packed only once
complete, and nothing downstream reads it — stage handoff loads ``export/``
(re-derived on restore from params via the save_option in ``meta.json``),
the gate loads params via ``load_state_raw``.

Packed verbatim (tar.gz): the corpus BPE tokenizer (``tok/``), the
preprocessed data tree (``yelp/`` + photo assets, ~16 MB — the gate's
``EvalDataset`` must see the exact split/tokenization the model trained on),
and the ``metrics_*.jsonl`` learning-evidence logs.

Usage:
  python scripts/ckpt_pack.py pack   [work_root] [pack_dir]
  python scripts/ckpt_pack.py unpack [pack_dir] [work_root]

``unpack`` never overwrites a checkpoint dir that is already complete
(``meta.json`` present), so a fresher in-progress training run wins over the
committed pack.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tarfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_WORK = os.path.join(REPO, "_work", "real_ckpt")
DEFAULT_PACK = os.path.join(REPO, "assets", "real_ckpt_pack")

# checkpoint dirs worth persisting, relative to the work root, with the
# minimum meta epoch that marks the stage COMPLETE (train_real_ckpt.py
# EPOCHS; meta records the last epoch index, hence -1). The stage-1/2
# entries exist so an interrupted FUTURE retrain can skip ~40 min of
# pretraining; the stage-3 pair is what the quality gate actually loads.
# Mid-stage intermediate saves are never packed: the pack drops opt_state,
# and a seeded retrain must not try to mid-stage-resume from one (the
# stage CLIs restore the FULL TrainState for resume). The valmin snapshot
# is final by construction (saved once, never resumed from).
# NOT packed: the img/table stage-2 checkpoints. They are ~0.75 GB each
# (x4 with amazon — 3 GB of permanent git history, ADVICE r4 #5) and
# re-derivable in ~10 min/stage from the packed stage-1 export (measured
# r5: at this corpus scale the frozen decoder has memorised the train
# reviews, so stage 2 moves the encoders barely at all — SCALING round 5);
# the gate itself reads only the stage-3 pairs below.
CKPT_DIRS = (
    ("ckpt/bart-review_yelp", 19),
    ("ckpt/text_pretrained_yelp", 59),
    # r5: the yelp stage-3 run is cut at the epoch-60 interval save — the
    # val minimum lands ~epoch 40 and the r4 run showed epochs 60-120 only
    # sharpen the deliberately-overfit final (SCALING.md round 5)
    ("ckpt/multimodal_trained_yelp", 59),
    ("ckpt_valmin/multimodal_trained_yelp", 0),
    # amazon chain (r5, VERDICT r4 #4)
    ("ckpt/multimodal_trained_amazon", 59),
    ("ckpt_valmin/multimodal_trained_amazon", 0),
)

# workdir content packed verbatim (everything the gate reads besides
# params). Checkpoint roots are excluded by PREFIX: the r5 chains train
# into ckpt_r5/ckpt_r5_valmin/ckpt_r5_snaps/... siblings, and a literal
# list silently tarred ~12 GB of them into "workdir data" (measured r5)
DATA_TAR_EXCLUDE_PREFIXES = ("ckpt", "jax_cache", "__pycache__")


def _tar_excluded(name: str) -> bool:
    return any(name == p or name.startswith(p) for p in
               DATA_TAR_EXCLUDE_PREFIXES)


def _flatten(tree, prefix="", out=None):
    out = {} if out is None else out
    if isinstance(tree, dict):
        for k in sorted(tree):
            _flatten(tree[k], f"{prefix}{k}/", out)
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, leaf in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def pack_ckpt(ckpt_dir: str, out_npz: str) -> None:
    """state/{params,batch_stats,step} → one compressed npz + meta sidecar."""
    from multimodalsum_tpu.ckpt.checkpoint import load_state_raw, read_meta

    raw = load_state_raw(ckpt_dir)
    keep = {k: raw[k] for k in ("params", "batch_stats", "step") if k in raw}
    flat = _flatten(keep)
    arrays, spec = {}, {}
    for i, (path, leaf) in enumerate(flat.items()):
        arr = np.asarray(leaf)
        orig = str(arr.dtype)
        if arr.dtype == np.float32 or orig == "bfloat16":
            import ml_dtypes

            arr = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
            stored = "bf16_as_u16"
        else:
            stored = orig
        key = f"a{i}"
        arrays[key] = arr
        spec[key] = {"path": path, "orig": orig, "stored": stored}
    os.makedirs(os.path.dirname(out_npz), exist_ok=True)
    np.savez_compressed(out_npz, **arrays)
    sidecar = {"spec": spec, "meta": read_meta(ckpt_dir)}
    with open(out_npz + ".json", "w") as f:
        json.dump(sidecar, f)


def unpack_ckpt(npz_path: str, ckpt_dir: str) -> None:
    """Rebuild ``state/`` + ``export/`` (+``export_stats``) + ``meta.json``
    from a pack. float32 leaves come back as float32 upcast from the stored
    bf16 (bit-identical forward pass — the model casts to bf16 anyway)."""
    import ml_dtypes

    from multimodalsum_tpu.ckpt import checkpoint as C

    with open(npz_path + ".json") as f:
        sidecar = json.load(f)
    spec, meta = sidecar["spec"], sidecar["meta"]
    with np.load(npz_path) as z:
        flat = {}
        for key, info in spec.items():
            arr = z[key]
            if info["stored"] == "bf16_as_u16":
                arr = arr.view(ml_dtypes.bfloat16)
                if info["orig"] == "float32":
                    arr = arr.astype(np.float32)
            flat[info["path"]] = arr
    tree = _unflatten(flat)
    if os.path.isdir(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    ckptr = C._checkpointer()
    ckptr.save(os.path.join(ckpt_dir, "state"), tree, force=True)
    save_option = meta.get("save_option", "whole")
    export = C._subtree(tree["params"], save_option)
    ckptr.save(os.path.join(ckpt_dir, "export"), export, force=True)
    stats = tree.get("batch_stats")
    if stats:
        try:
            stats_sub = C._subtree(stats, save_option)
        except (KeyError, TypeError):
            stats_sub = None
        if stats_sub:
            ckptr.save(os.path.join(ckpt_dir, "export_stats"), stats_sub,
                       force=True)
    ckptr.wait_until_finished()
    # "packed": resume machinery must not offer this dir for full-state
    # resume (no opt_state in a pack — restore_checkpoint against a full
    # TrainState template dies on the structure mismatch). Atomic write,
    # mirroring ckpt.save_checkpoint: a kill mid-write must not leave a
    # truncated meta that makes the dir look complete.
    meta = dict(meta, packed=True)
    meta_path = os.path.join(ckpt_dir, "meta.json")
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, meta_path)


def _complete(ckpt_dir: str, min_epoch: int = 0) -> bool:
    meta = os.path.join(ckpt_dir, "meta.json")
    if not os.path.exists(meta):
        return False
    try:
        return int(json.load(open(meta)).get("epoch", -1)) >= min_epoch
    except (ValueError, TypeError):
        return False


def pack(work_root: str = DEFAULT_WORK, pack_dir: str = DEFAULT_PACK) -> list:
    os.makedirs(pack_dir, exist_ok=True)
    packed = []
    for rel, min_epoch in CKPT_DIRS:
        src = os.path.join(work_root, rel)
        if not _complete(src, min_epoch):
            continue
        out = os.path.join(pack_dir, rel.replace("/", "__") + ".npz")
        # skip when the pack already matches this save (same step + epoch)
        sidecar = out + ".json"
        if os.path.exists(sidecar):
            from multimodalsum_tpu.ckpt.checkpoint import read_meta

            old = json.load(open(sidecar))["meta"]
            new = read_meta(src)
            if (old.get("step"), old.get("epoch")) == (new.get("step"),
                                                       new.get("epoch")):
                packed.append((rel, "unchanged"))
                continue
        pack_ckpt(src, out)
        packed.append((rel, f"{os.path.getsize(out) / 1e6:.0f} MB"))
        print(f"packed {rel}: {packed[-1][1]}", flush=True)
    # the non-checkpoint workdir (data + tokenizer + metrics), verbatim.
    # gzip with mtime=0 for a DETERMINISTIC byte stream (the default embeds
    # the current time in the gzip header, so even a byte-identical workdir
    # produced a fresh ~16 MB git blob every pack), plus a hash compare so
    # an unchanged tar never touches the committed file at all.
    import gzip
    import hashlib

    tar_path = os.path.join(pack_dir, "workdir.tar.gz")
    with gzip.GzipFile(tar_path + ".tmp", "wb", mtime=0) as gz:
        with tarfile.open(fileobj=gz, mode="w") as tar:
            for name in sorted(os.listdir(work_root)):
                if _tar_excluded(name):
                    continue
                tar.add(os.path.join(work_root, name), arcname=name)

    def _sha(path):
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    if os.path.exists(tar_path) and _sha(tar_path) == _sha(tar_path + ".tmp"):
        os.remove(tar_path + ".tmp")
        packed.append(("workdir.tar.gz", "unchanged"))
    else:
        os.replace(tar_path + ".tmp", tar_path)
        packed.append(("workdir.tar.gz",
                       f"{os.path.getsize(tar_path) / 1e6:.0f} MB"))
    print(f"packed workdir: {packed[-1][1]}", flush=True)
    return packed
def unpack(pack_dir: str = DEFAULT_PACK, work_root: str = DEFAULT_WORK) -> list:
    """Restore a pack into ``work_root``; complete existing dirs are kept."""
    restored = []
    tar_path = os.path.join(pack_dir, "workdir.tar.gz")
    if os.path.exists(tar_path) and not os.path.exists(
            os.path.join(work_root, "tok", "vocab.json")):
        os.makedirs(work_root, exist_ok=True)
        with tarfile.open(tar_path) as tar:
            tar.extractall(work_root, filter="data")
        restored.append("workdir")
    for rel, _min_epoch in CKPT_DIRS:
        npz = os.path.join(pack_dir, rel.replace("/", "__") + ".npz")
        dst = os.path.join(work_root, rel)
        if not os.path.exists(npz) or _complete(dst):
            continue
        unpack_ckpt(npz, dst)
        restored.append(rel)
        print(f"restored {rel}", flush=True)
    return restored


def main(argv):
    cmd = argv[0] if argv else "pack"
    if cmd == "pack":
        pack(*(os.path.abspath(a) for a in argv[1:3]))
    elif cmd == "unpack":
        unpack(*(os.path.abspath(a) for a in argv[1:3]))
    else:
        raise SystemExit(f"unknown command {cmd!r} (pack|unpack)")


if __name__ == "__main__":
    main(sys.argv[1:])
