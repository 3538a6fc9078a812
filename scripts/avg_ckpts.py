"""Average model parameters across k checkpoint dirs (checkpoint averaging
around the validation minimum — VERDICT r4 #1c).

Training runs are seed-deterministic, so the capture pass
(``cli.multimodal_train --save_epochs E-2,E-1,E,E+1,E+2 --snap_root ...``)
retraces the exact trajectory of the run that located the val minimum E and
writes params-only snapshots of a window around it. This tool averages those
windows' floating leaves (f64 accumulation, f32 out) into one params-only
checkpoint the eval gate can score like any other
(``bench.py --gate-only``). BatchNorm running stats are averaged too (they
are running means/vars of the same distribution at neighbouring epochs).

Averaging neighbouring SGD iterates removes the last-step noise of a sharp
minimum (Polyak/SWA); on ROUGE it is typically worth a few tenths at zero
training cost. The averaged checkpoint is a candidate, not the winner: score
it against the plain val-min snapshot and ship whichever gates higher.

Usage:
  python scripts/avg_ckpts.py OUT_DIR SNAP_DIR [SNAP_DIR ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def average_checkpoints(out_dir: str, snap_dirs: list) -> None:
    import jax.numpy as jnp

    from multimodalsum_tpu.ckpt.checkpoint import (
        load_state_raw, read_meta, save_checkpoint,
    )
    from multimodalsum_tpu.train.loop import EvalSnapshot

    assert len(snap_dirs) >= 2, "averaging needs at least 2 checkpoints"
    acc = None
    metas = []
    for d in snap_dirs:
        raw = load_state_raw(d)
        metas.append(read_meta(d))
        tree = {k: raw[k] for k in ("params", "batch_stats") if k in raw}
        if acc is None:
            import jax

            acc = jax.tree.map(
                lambda x: np.asarray(x, dtype=np.float64)
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                or str(np.asarray(x).dtype) == "bfloat16"
                else np.asarray(x), tree)
        else:
            import jax

            acc = jax.tree.map(
                lambda a, x: a + np.asarray(x, dtype=np.float64)
                if a.dtype == np.float64 else a, acc, tree)
    import jax

    n = len(snap_dirs)
    avg = jax.tree.map(
        lambda a: (a / n).astype(np.float32) if a.dtype == np.float64 else a,
        acc)
    center = metas[len(metas) // 2]
    snap = EvalSnapshot(step=jnp.int32(int(center.get("step", 0))),
                        params=avg["params"],
                        batch_stats=avg.get("batch_stats"))
    save_checkpoint(
        out_dir, snap, save_option="whole",
        epoch=int(center.get("epoch", 0)),
        val_loss=center.get("val_loss"),
        extra_meta={"params_only": True,
                    "averaged_from": [
                        {"dir": d, "epoch": m.get("epoch"),
                         "val_loss": m.get("val_loss")}
                        for d, m in zip(snap_dirs, metas)]})
    print(f"averaged {n} checkpoints "
          f"(epochs {[m.get('epoch') for m in metas]}) -> {out_dir}",
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    average_checkpoints(sys.argv[1], sys.argv[2:])
