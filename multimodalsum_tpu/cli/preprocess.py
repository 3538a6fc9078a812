"""Offline preprocessing CLI (replaces the reference's Luigi invocation
``python -m luigi ... Partition`` + ``multimodal_preprocessing.py``).

Usage:
  python -m multimodalsum_tpu.cli.preprocess text --dataset yelp \
      --raw data/yelp/raw/reviews.json --data_root data
  python -m multimodalsum_tpu.cli.preprocess multimodal --dataset yelp --data_root data
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="MultimodalSum-TPU offline preprocessing")
    sub = p.add_subparsers(dest="stage", required=True)

    t = sub.add_parser("text", help="prepare/tokenize/subsample/partition")
    t.add_argument("--dataset", choices=["yelp", "amazon"], required=True)
    t.add_argument("--raw", nargs="+", required=True, help="raw dump file(s)")
    t.add_argument("--data_root", default="data")
    t.add_argument("--min_revs", type=int, default=10)
    t.add_argument("--min_rev_len", type=int, default=10)
    t.add_argument("--max_rev_len", type=int, default=70)
    t.add_argument("--percentile", type=int, default=90)
    t.add_argument("--max_total_revs", type=int, default=None)
    t.add_argument("--train_part", type=float, default=0.9)
    t.add_argument("--val_part", type=float, default=0.1)

    m = sub.add_parser("multimodal", help="5.text + photo dicts + meta.csv")
    m.add_argument("--dataset", choices=["yelp", "amazon"], required=True)
    m.add_argument("--data_root", default="data")

    args = p.parse_args(argv)
    if args.stage == "text":
        from multimodalsum_tpu.pipeline.textprep import run_text_pipeline

        run_text_pipeline(
            args.dataset, args.raw, args.data_root,
            min_revs=args.min_revs, min_rev_len=args.min_rev_len,
            max_rev_len=args.max_rev_len, percentile=args.percentile,
            max_total_revs=args.max_total_revs,
            train_part=args.train_part, val_part=args.val_part,
        )
    else:
        from multimodalsum_tpu.pipeline.multimodal_prep import run_multimodal_pipeline

        run_multimodal_pipeline(args.data_root, args.dataset)


if __name__ == "__main__":
    main()
