#!/usr/bin/env python
"""Canned eval launch — reference tasks/test_fill50k.py equivalent."""
import sys
from _launch import run, test_defaults

if __name__ == "__main__":
    sys.exit(run("sample.py", test_defaults(
        "control-lora-fill50k", "process/fill50k", "samples/fill50k") + sys.argv[1:]))
