#!/usr/bin/env python
"""Canned eval launch — reference tasks/test_pose_v2.py equivalent."""
import sys
from _launch import run, test_defaults

if __name__ == "__main__":
    sys.exit(run("sample.py", test_defaults(
        "control-lora-pose_v2", "process/mpii_pose", "samples/pose_v2") + sys.argv[1:]))
