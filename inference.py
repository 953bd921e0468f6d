#!/usr/bin/env python
"""Evaluation-oriented inference CLI (reference `models_con/inference.py`).

Thin front-end over sample.py's machinery with the reference's defaults:
seed 114514, 200 ODE steps, 64 samples per complex, metrics to outputs.csv.
"""

import sys

from sample import main as sample_main

if __name__ == "__main__":
    argv = sys.argv[1:]
    defaults = {
        "--num_steps": "200",
        "--num_samples": "64",
        "--seed": "114514",
    }
    for flag, value in defaults.items():
        if flag not in argv:
            argv += [flag, value]
    sys.argv = [sys.argv[0]] + argv
    sample_main()
