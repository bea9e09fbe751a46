#!/usr/bin/env python
"""Canned trainer launch — reference tasks/train_pose_v2.py equivalent."""
import sys
from _launch import run, train_defaults

if __name__ == "__main__":
    sys.exit(run("train.py", train_defaults(
        "mpii-pose-v2", "process/mpii_pose", "control-lora-pose_v2") + sys.argv[1:]))
