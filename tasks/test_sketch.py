#!/usr/bin/env python
"""Canned eval launch — reference tasks/test_sketch.py equivalent."""
import sys
from _launch import run, test_defaults

if __name__ == "__main__":
    sys.exit(run("sample.py", test_defaults(
        "control-lora-sketch", "process/danbooru_sketch", "samples/sketch") + sys.argv[1:]))
