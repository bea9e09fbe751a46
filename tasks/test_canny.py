#!/usr/bin/env python
"""Canned eval launch — reference tasks/test_canny.py equivalent."""
import sys
from _launch import run, test_defaults

if __name__ == "__main__":
    sys.exit(run("sample.py", test_defaults(
        "control-lora-canny", "process/diffusiondb_canny", "samples/canny") + sys.argv[1:]))
