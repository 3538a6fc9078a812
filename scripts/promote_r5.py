"""Promote the measured round-5 winners to the canonical gate paths.

The r5 chains train into ``ckpt_r5``/``ckpt_r5_valmin``/``ckpt_r5_avg``
roots so the shipped r4 artifacts stay intact until gates decide
(``scripts/train_r5.py``). This tool executes the decision: it replaces the
canonical ``ckpt/``+``ckpt_valmin/`` dirs that ``bench.py``'s gate and the
committed pack read, picking the yelp valmin artifact by measured gold
ROUGE-L (plain val-min snapshot vs the checkpoint-averaged one — pass the
winner explicitly after comparing their gate runs).

Usage:
  python scripts/promote_r5.py --yelp_valmin ckpt_r5_avg|ckpt_r5_valmin \
      [--work _work/real_ckpt] [--dry]
"""

from __future__ import annotations

import argparse
import os
import shutil

MOVES_YELP = [
    ("ckpt_r5/text_pretrained_yelp", "ckpt/text_pretrained_yelp"),
    ("ckpt_r5/img_pretrained_yelp", "ckpt/img_pretrained_yelp"),
    ("ckpt_r5/table_pretrained_yelp", "ckpt/table_pretrained_yelp"),
    ("ckpt_r5/multimodal_trained_yelp", "ckpt/multimodal_trained_yelp"),
]
MOVES_AMAZON = [
    ("ckpt_r5/img_pretrained_amazon", "ckpt/img_pretrained_amazon"),
    ("ckpt_r5/table_pretrained_amazon", "ckpt/table_pretrained_amazon"),
    ("ckpt_r5/multimodal_trained_amazon", "ckpt/multimodal_trained_amazon"),
    ("ckpt_r5_valmin/multimodal_trained_amazon",
     "ckpt_valmin/multimodal_trained_amazon"),
]


def promote(work: str, yelp_valmin_root: str, dry: bool = False) -> list:
    moves = MOVES_YELP + [
        (f"{yelp_valmin_root}/multimodal_trained_yelp",
         "ckpt_valmin/multimodal_trained_yelp"),
    ] + MOVES_AMAZON
    done = []
    for src, dst in moves:
        s, d = os.path.join(work, src), os.path.join(work, dst)
        if not os.path.exists(os.path.join(s, "meta.json")):
            print(f"skip (incomplete/absent): {src}")
            continue
        if dry:
            done.append((src, dst, "DRY"))
            continue
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        shutil.copytree(s, d)
        done.append((src, dst, "ok"))
        print(f"promoted {src} -> {dst}", flush=True)
    return done


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_work", "real_ckpt"))
    ap.add_argument("--yelp_valmin", required=True,
                    help="root holding the winning yelp valmin artifact "
                         "(ckpt_r5_valmin or ckpt_r5_avg)")
    ap.add_argument("--dry", action="store_true")
    a = ap.parse_args()
    promote(os.path.abspath(a.work), a.yelp_valmin, a.dry)
