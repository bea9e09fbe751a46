#!/usr/bin/env python
"""Canned eval launch — reference tasks/test_canny_v2.py equivalent."""
import sys
from _launch import run, test_defaults

if __name__ == "__main__":
    sys.exit(run("sample.py", test_defaults(
        "control-lora-canny_v2", "process/diffusiondb_canny", "samples/canny_v2") + sys.argv[1:]))
