#!/usr/bin/env python
"""Canned trainer launch — reference tasks/train_sketch.py equivalent."""
import sys
from _launch import run, train_defaults

if __name__ == "__main__":
    sys.exit(run("train.py", train_defaults(
        "danbooru-sketch", "process/danbooru_sketch", "control-lora-sketch") + sys.argv[1:]))
