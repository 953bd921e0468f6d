"""Logging / run-dir / metric utilities.

Re-implements the live parts of `pepflow/utils/misc.py` and
`pepflow/utils/train.py` (BlackHole, get_logger, get_new_log_dir, seed_all,
inf_iterator, ScalarMetricAccumulator, count_parameters) without torch or
wandb. Metrics stream to a JSONL file per run; wandb is used when importable
and enabled, silently skipped otherwise.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Optional


class BlackHole:
    """Null object: absorbs any call/attribute (misc.py:14-20)."""

    def __setattr__(self, name, value):
        pass

    def __getattr__(self, name):
        return self

    def __call__(self, *args, **kwargs):
        return self


def get_logger(name: str, log_dir: Optional[str] = None, prefix: str = "") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    if logger.handlers:
        return logger
    fmt = logging.Formatter("[%(asctime)s::%(name)s::%(levelname)s] %(message)s")
    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir is not None:
        fname = f"{prefix}log.txt" if prefix else "log.txt"
        fh = logging.FileHandler(os.path.join(log_dir, fname))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def get_new_log_dir(root: str = "./logs", prefix: str = "", tag: str = "") -> str:
    fn = time.strftime("%Y_%m_%d__%H_%M_%S", time.localtime())
    if prefix:
        fn = f"{prefix}_{fn}"
    if tag:
        fn = f"{fn}_{tag}"
    log_dir = os.path.join(root, fn)
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def seed_all(seed: int):
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed % (2**32))


def inf_iterator(iterable):
    while True:
        yield from iter(iterable)


class MetricsWriter:
    """JSONL metrics sink (+ optional wandb mirror)."""

    def __init__(self, log_dir: Optional[str], use_wandb: bool = False, wandb_kwargs=None):
        self._f = None
        if log_dir is not None:
            self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                self._wandb = None

    def log(self, step: int, scalars: dict, tag: str = "train"):
        rec = {"step": step, "tag": tag, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        if self._f is not None:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self._wandb is not None:
            self._wandb.log({f"{tag}/{k}": v for k, v in scalars.items()}, step=step)

    def close(self):
        if self._f is not None:
            self._f.close()


class ScalarMetricAccumulator:
    """Running means for validation (pepflow/utils/train.py:85-123)."""

    def __init__(self):
        self._sums: dict[str, float] = {}
        self._counts: dict[str, float] = {}

    def add(self, name: str, value, batchsize: int = 1, mode: str = "mean"):
        v = float(value)
        if mode == "mean":
            self._sums[name] = self._sums.get(name, 0.0) + v * batchsize
            self._counts[name] = self._counts.get(name, 0.0) + batchsize
        else:
            self._sums[name] = self._sums.get(name, 0.0) + v
            self._counts[name] = self._counts.get(name, 0.0) + 1

    def get_average(self, name: str) -> float:
        return self._sums[name] / max(self._counts[name], 1e-8)

    def summary(self) -> dict:
        return {k: self.get_average(k) for k in self._sums}


def count_parameters(params) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def git_version_stamp(repo_dir: str = ".") -> str:
    """Best-effort commit stamp (pepflow/utils/vc.py:4-20)."""
    import subprocess

    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=repo_dir, stderr=subprocess.DEVNULL
            )
            .decode()
            .strip()
        )
    except Exception:
        return "unknown"
