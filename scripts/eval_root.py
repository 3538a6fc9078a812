"""Build a symlink view of a training workdir with a CANDIDATE checkpoint
root mounted at the canonical gate paths.

``bench.py --gate-only`` reads fixed subpaths (``ckpt/multimodal_trained_*``,
``ckpt_valmin/...``, ``tok/``, the dataset trees) under one root. Candidate
chains train into separate roots (``ckpt_r5``, sweep variants, averaged
checkpoints) so the shipped r4 artifacts stay intact until a measured gate
comparison promotes a winner — this tool mounts any candidate pair at the
canonical names without copying gigabytes:

  python scripts/eval_root.py _work/real_ckpt _work/eval_r5 \
      --ckpt ckpt_r5 --valmin ckpt_r5_valmin
  python bench.py --gate-only --no-restore --gate_root=_work/eval_r5 \
      --gate_sections=valmin

Pass ``--no-restore`` to the gate: the committed pack must not
re-materialise the shipped checkpoints into the candidate view.
"""

from __future__ import annotations

import argparse
import os


def build(work: str, out: str, ckpt: str, valmin: str | None) -> str:
    work, out = os.path.abspath(work), os.path.abspath(out)
    os.makedirs(out, exist_ok=True)
    links = {"ckpt": os.path.join(work, ckpt)}
    if valmin:
        links["ckpt_valmin"] = os.path.join(work, valmin)
    for name in os.listdir(work):
        if name in ("ckpt", "ckpt_valmin", "jax_cache") or name.startswith(
                "ckpt_"):
            continue
        links.setdefault(name, os.path.join(work, name))
    for name, target in links.items():
        dst = os.path.join(out, name)
        if os.path.islink(dst):
            os.remove(dst)
        elif os.path.exists(dst):
            raise SystemExit(f"{dst} exists and is not a symlink")
        os.symlink(target, dst)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("work")
    ap.add_argument("out")
    ap.add_argument("--ckpt", required=True,
                    help="candidate root (relative to work) to mount as ckpt/")
    ap.add_argument("--valmin", default=None,
                    help="candidate valmin root to mount as ckpt_valmin/")
    a = ap.parse_args()
    print(build(a.work, a.out, a.ckpt, a.valmin))
