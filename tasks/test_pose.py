#!/usr/bin/env python
"""Canned eval launch — reference tasks/test_pose.py equivalent."""
import sys
from _launch import run, test_defaults

if __name__ == "__main__":
    sys.exit(run("sample.py", test_defaults(
        "control-lora-pose", "process/mpii_pose", "samples/pose") + sys.argv[1:]))
