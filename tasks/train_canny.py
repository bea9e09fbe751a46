#!/usr/bin/env python
"""Canned trainer launch — reference tasks/train_canny.py equivalent."""
import sys
from _launch import run, train_defaults

if __name__ == "__main__":
    sys.exit(run("train.py", train_defaults(
        "diffusiondb-canny", "process/diffusiondb_canny", "control-lora-canny") + sys.argv[1:]))
