"""Experiment directory management.

Equivalent of the reference's ``mlutils`` ``ExperimentsPathController``
(``mltoolkit/mlutils/tools/experiments_path_controller.py:7``): auto-numbered
run directories with a config snapshot, so repeated launches never clobber
each other.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


def next_run_dir(root: str, prefix: str = "run") -> str:
    """Create and return ``<root>/<prefix>_<N>`` with the smallest unused N."""
    os.makedirs(root, exist_ok=True)
    existing = set()
    for d in os.listdir(root):
        if d.startswith(prefix + "_"):
            try:
                existing.add(int(d.split("_")[-1]))
            except ValueError:
                pass
    n = 1
    while n in existing:
        n += 1
    path = os.path.join(root, f"{prefix}_{n}")
    os.makedirs(path)
    return path


def snapshot_config(run_dir: str, name: str = "config.json", **config) -> str:
    """Write a JSON snapshot of the run configuration (the reference pickles
    ``training_args.bin``; JSON is greppable)."""
    path = os.path.join(run_dir, name)
    with open(path, "w") as f:
        json.dump(dict(created=time.strftime("%Y-%m-%d %H:%M:%S"), **config),
                  f, indent=2, default=str)
    return path
