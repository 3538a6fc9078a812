"""Offline text preprocessing: prepare → tokenize → subsample → partition.

Replaces the reference's Luigi DAG (``preprocessing/steps/{preparation,
tokenization,subsampling,partitioning}.py``) with plain idempotent functions
sharing the same on-disk contract:

  ``<out>/1.prep/<src>/<group_id>.csv``   per-group tab-separated reviews
  ``<out>/2.tok/<src>/<group_id>.csv``    Moses-tokenized review_text
  ``<out>/3.subsam/<src>/<group_id>.csv`` length/popularity filtered
  ``<out>/4.part/{train,val,test}/<group_id>.csv``

Rows carry [group_id, review_id?, review_text, rating, category] like the
reference writers (``preprocessing/helpers/data_utils.py:135-158``).

Test-set groups are excluded from the partition by reading the shipped gold
CSVs directly (the reference hardcodes the same ids as
``EXCLUDED_GROUP_IDS`` lists in ``preprocessing/fields/*.py``).
"""

from __future__ import annotations

import csv
import glob
import gzip
import json
import os
from ast import literal_eval
from collections import OrderedDict
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


def clean_text(text: str) -> str:
    return " ".join(str(text).split())


# --------------------------------------------------------------------------
# 1.prep — group raw reviews per business/product


def iter_yelp_groups(path: str) -> Iterator[Tuple[str, List[dict]]]:
    """Yelp review.json lines grouped by business, streamed via an external
    disk sort like the reference (``preprocessing/helpers/data_utils.py:12-69``
    sorts the dump by business id then streams group-by-group). The real dump
    is ~5-7 GB / ~7M reviews; accumulating per-review dicts in memory would
    multiply that several-fold in Python object overhead and OOM the prep
    host, so only ONE group is ever resident. Review order within a group is
    the file order (``sort --stable`` on the business-id key only)."""
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory(prefix="yelp_prep_") as tmp:
        proj = os.path.join(tmp, "proj.tsv")
        with open(path, encoding="utf-8") as f, \
                open(proj, "w", encoding="utf-8") as out:
            for line in f:
                d = json.loads(line)
                # json-encode the text: single line, no raw tabs/newlines
                out.write(f"{d['business_id']}\t{d['review_id']}\t"
                          f"{d['stars']}\t{json.dumps(d['text'])}\n")
        sorted_fp = os.path.join(tmp, "sorted.tsv")
        subprocess.run(
            ["sort", "--stable", "-t", "\t", "-k1,1", "-o", sorted_fp, proj],
            check=True, env=dict(os.environ, LC_ALL="C", TMPDIR=tmp),
        )
        os.remove(proj)

        cur_gid, units = None, []
        with open(sorted_fp, encoding="utf-8") as f:
            for line in f:
                gid, rid, stars, text_json = line.rstrip("\n").split("\t", 3)
                if gid != cur_gid and units:
                    yield cur_gid, units
                    units = []
                cur_gid = gid
                units.append(
                    dict(group_id=gid, review_id=rid,
                         review_text=clean_text(json.loads(text_json)),
                         rating=float(stars), category="business")
                )
        if units:
            yield cur_gid, units


def iter_amazon_groups(path: str) -> Iterator[Tuple[str, List[dict]]]:
    """Amazon gzip of python-literal lines, grouped by asin (reference
    ``read_amazon_data`` / ``parse``)."""
    import html as _html

    category = source_name(path).lower()
    groups: "OrderedDict[str, List[dict]]" = OrderedDict()
    with gzip.open(path, "rb") as g:
        for raw in g:
            d = literal_eval(raw.decode("utf-8"))
            if "asin" not in d or "reviewText" not in d or "overall" not in d:
                continue
            groups.setdefault(d["asin"], []).append(
                dict(group_id=d["asin"],
                     review_text=clean_text(_html.unescape(d["reviewText"])),
                     rating=d["overall"], category=category)
            )
    yield from groups.items()


def write_group_csv(path: str, units: List[dict]) -> None:
    """Quote-aware writer (csv.QUOTE_MINIMAL) so texts containing quotes
    round-trip exactly through read_group_csv / the runtime readers — the
    reference writes naively and corrupts quoted reviews."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8", newline="") as f:
        header = list(units[0].keys())
        writer = csv.writer(f, delimiter="\t")
        writer.writerow(header)
        for u in units:
            writer.writerow([str(u[k]) for k in header])


def read_group_csv(path: str) -> List[dict]:
    with open(path, encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t")
        return list(reader)


def source_name(inp_file: str) -> str:
    """Raw-file stem with the full extension chain stripped
    (``Electronics.json.gz`` → ``Electronics``) — the 1.prep dir name the
    multimodal back-join expects (``1.prep/<CategoryTitle>/<gid>.csv``)."""
    name = os.path.basename(inp_file)
    while True:
        stem, ext = os.path.splitext(name)
        if ext.lower() in (".gz", ".json", ".jsonl", ".txt", ".csv"):
            name = stem
        else:
            return name


def prepare(dataset: str, inp_file: str, out_root: str) -> str:
    """Stage 1.prep for one raw input file; returns the output dir."""
    src = source_name(inp_file)
    out_dir = os.path.join(out_root, "1.prep", src)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        return out_dir  # idempotent, like the Luigi complete() check
    it = iter_yelp_groups(inp_file) if dataset == "yelp" else iter_amazon_groups(inp_file)
    for gid, units in it:
        write_group_csv(os.path.join(out_dir, f"{gid}.csv"), units)
    return out_dir


# --------------------------------------------------------------------------
# 2.tok — Moses tokenization


def tokenize_dir(prep_dir: str, out_root: str) -> str:
    from sacremoses import MosesTokenizer

    mt = MosesTokenizer()
    src = os.path.basename(prep_dir)
    out_dir = os.path.join(out_root, "2.tok", src)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for fp in sorted(glob.glob(os.path.join(prep_dir, "*.csv"))):
        units = read_group_csv(fp)
        for u in units:
            u["review_text"] = " ".join(mt.tokenize(u["review_text"], escape=False))
        write_group_csv(os.path.join(out_dir, os.path.basename(fp)), units)
    return out_dir


# --------------------------------------------------------------------------
# 3.subsam — filters (reference ``steps/subsampling.py:22-157``)


def subsample_dir(
    tok_dir: str, out_root: str, *, min_revs: int = 10, min_rev_len: int = 10,
    max_rev_len: int = 70, percentile: int = 90,
    max_total_revs: Optional[int] = None, log=print,
) -> str:
    src = os.path.basename(tok_dir)
    out_dir = os.path.join(out_root, "3.subsam", src)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        return out_dir

    groups: Dict[str, List[dict]] = {}
    counts = []
    init_groups = init_units = 0
    for fp in sorted(glob.glob(os.path.join(tok_dir, "*.csv"))):
        init_groups += 1
        units = []
        for u in read_group_csv(fp):
            init_units += 1
            n = len(u["review_text"].split())
            if min_rev_len <= n <= max_rev_len:
                units.append(u)
        if len(units) >= min_revs:
            groups[os.path.splitext(os.path.basename(fp))[0]] = units
            counts.append(len(units))
    if not groups:
        raise ValueError("No groups survive subsampling; adjust parameters.")

    perc = np.percentile(counts, percentile)
    kept: Dict[str, List[dict]] = {}
    total = 0
    for gid, units in groups.items():
        if len(units) < perc:
            if max_total_revs is not None and total + len(units) > max_total_revs:
                break
            kept[gid] = units
            total += len(units)
    if total == 0:
        raise ValueError("All units subsampled out; adjust parameters.")

    for gid, units in kept.items():
        write_group_csv(os.path.join(out_dir, f"{gid}.csv"), units)
    log(f"subsample {src}: groups {init_groups}->{len(groups)}->{len(kept)}, "
        f"units {init_units}->{sum(counts)}->{total}, percentile {perc:.1f}")
    return out_dir


# --------------------------------------------------------------------------
# 4.part — train/val split with test-group exclusion


def excluded_test_groups(data_root: str, dataset: str) -> set:
    """Group ids appearing in the shipped gold eval data (the reference's
    ``EXCLUDED_GROUP_IDS`` constants carry the same ids)."""
    import pandas as pd

    out = set()
    if dataset == "yelp":
        p = os.path.join(data_root, "yelp", "test", "summaries_0-200_cleaned.csv")
        if os.path.exists(p):
            out.update(str(x) for x in pd.read_csv(p)["Input.business_id"] if isinstance(x, str))
    else:
        p = os.path.join(data_root, "amazon", "test", "all.csv")
        if os.path.exists(p):
            out.update(str(x) for x in pd.read_csv(p, sep="\t")["prod_id"])
    return out


def partition(
    subsam_dirs: List[str], out_root: str, *, train_part: float = 0.9,
    val_part: float = 0.1, test_part: float = 0.0,
    excluded: Optional[set] = None, seed: int = 42, log=print,
) -> str:
    out_dir = os.path.join(out_root, "4.part")
    excluded = excluded or set()
    seen = set()
    group_units: List[List[dict]] = []
    dup = skip = 0
    for d in subsam_dirs:
        for fp in sorted(glob.glob(os.path.join(d, "*.csv"))):
            gid = os.path.splitext(os.path.basename(fp))[0]
            if gid in seen:
                dup += 1
                continue
            seen.add(gid)
            if gid in excluded:
                skip += 1
                continue
            group_units.append(read_group_csv(fp))

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(group_units))
    n_train = int(len(order) * train_part)
    n_val = int(len(order) * val_part)
    if test_part > 0:
        splits = {
            "train": order[:n_train],
            "val": order[n_train:n_train + n_val],
            "test": order[n_train + n_val:],
        }
    else:
        # remainder groups fold into val so nothing is silently dropped
        # (reference partition(): val_groups += groups[val_part_end:])
        splits = {"train": order[:n_train], "val": order[n_train:], "test": []}
    for title, idxs in splits.items():
        for i in idxs:
            units = group_units[int(i)]
            gid = units[0]["group_id"]
            write_group_csv(os.path.join(out_dir, title, f"{gid}.csv"), units)
    log(f"partition: excluded {skip}, duplicates {dup}, "
        f"train {len(splits['train'])}, val {len(splits['val'])}")
    return out_dir


def run_text_pipeline(
    dataset: str, raw_files: List[str], data_root: str, *, min_revs: int = 10,
    train_part: float = 0.9, val_part: float = 0.1, **subsample_kw,
) -> str:
    """prepare → tokenize → subsample → partition for a list of raw dumps."""
    out_root = os.path.join(data_root, dataset)
    sub_dirs = []
    for f in raw_files:
        prep = prepare(dataset, f, out_root)
        tok = tokenize_dir(prep, out_root)
        sub_dirs.append(subsample_dir(tok, out_root, min_revs=min_revs, **subsample_kw))
    return partition(
        sub_dirs, out_root, train_part=train_part, val_part=val_part,
        excluded=excluded_test_groups(data_root, dataset),
    )
