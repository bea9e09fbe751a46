#!/usr/bin/env python
"""Canned trainer launch — reference tasks/train_canny_v2.py equivalent."""
import sys
from _launch import run, train_defaults

if __name__ == "__main__":
    sys.exit(run("train.py", train_defaults(
        "diffusiondb-canny-v2", "process/diffusiondb_canny", "control-lora-canny_v2") + sys.argv[1:]))
