#!/usr/bin/env python
"""Canned trainer launch — reference tasks/train_pose.py equivalent."""
import sys
from _launch import run, train_defaults

if __name__ == "__main__":
    sys.exit(run("train.py", train_defaults(
        "mpii-pose", "process/mpii_pose", "control-lora-pose") + sys.argv[1:]))
