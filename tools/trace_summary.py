#!/usr/bin/env python
"""Summarize a jax.profiler trace directory: per-category device time.

Usage: python tools/trace_summary.py /tmp/tracedir [steps] [topk]

Groups XLA op names into categories (copy, fusion, matmul, reduce, pallas
kernels by name prefix, ...) and prints total device ms and ms/step (if the
trace covers `steps` iterations, default 99 for a 100-step sampler trace whose
first step ran pre-trace). This is the round-1 PERF.md methodology, packaged.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def load_events(trace_dir: str):
    paths = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    evs = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, nm in pids.items() if "TPU" in nm or "/device" in nm.lower()}
    return [e for e in evs
            if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e]


_CATEGORIES = (
    ("copy", re.compile(r"^(copy|copy-start|copy-done|transpose)")),
    ("matmul", re.compile(r"^(convolution|dot|cublas)")),
    ("reduce", re.compile(r".*(reduce)")),
    ("select/concat/slice", re.compile(r"^(select|concatenate|slice|dynamic)")),
    ("fusion", re.compile(r"^(input_)?fusion")),
)


def categorize(name: str) -> str:
    if re.match(r"^[a-z_0-9]+\.\d+$", name) and not any(
        rx.match(name) for _, rx in _CATEGORIES
    ):
        # pallas kernels keep their python-level names (edge_transition_0.10)
        base = name.split(".")[0]
        if not re.match(r"^(add|sub|mul|div|exp|tanh|broadcast|reshape|bitcast"
                        r"|convert|iota|constant|compare|while|conditional"
                        r"|all|tuple|get|parameter|custom)", base):
            return f"kernel:{re.sub(r'_[0-9]+$', '', base)}"
    for cat, rx in _CATEGORIES:
        if rx.match(name):
            return cat
    return "other"


def main():
    trace_dir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 99
    topk = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    evs = load_events(trace_dir)

    cat_us = collections.Counter()
    cat_n = collections.Counter()
    op_us = collections.Counter()
    op_n = collections.Counter()
    total = 0.0
    for e in evs:
        name = e["name"]
        if name.startswith(("jit_", "while")):  # enclosing regions, not ops
            continue
        # Purely numeric-named events are whole-step/module spans on this
        # platform (one per traced step, each covering the entire step) —
        # counting them double-counts every constituent op. Seen in the
        # round-3 train traces as ops "2", "5", "8", ... at ~1 step of
        # duration each.
        if re.fullmatch(r"\d+", name):
            continue
        cat = categorize(name)
        cat_us[cat] += e["dur"]
        cat_n[cat] += 1
        op_us[name] += e["dur"]
        op_n[name] += 1
        total += e["dur"]

    print(f"device op time {total/1e3:.1f} ms total, {total/1e3/steps:.3f} ms/step "
          f"({steps} steps)")
    print("-- by category --")
    for cat, us in cat_us.most_common():
        print(f"  {us/1e3/steps:8.3f} ms/step  {us/1e3:9.1f} ms x{cat_n[cat]:<7} {cat}")
    print(f"-- top {topk} ops --")
    for nm, us in op_us.most_common(topk):
        print(f"  {us/1e3/steps:8.3f} ms/step  x{op_n[nm]:<6} {nm[:84]}")


if __name__ == "__main__":
    main()
