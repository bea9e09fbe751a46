#!/usr/bin/env python
"""Canned trainer launch — reference tasks/train_fill50k.py equivalent."""
import sys
from _launch import run, train_defaults

if __name__ == "__main__":
    sys.exit(run("train.py", train_defaults(
        "fill50k", "process/fill50k", "control-lora-fill50k") + sys.argv[1:]))
