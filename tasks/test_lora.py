#!/usr/bin/env python
"""Canned DreamBooth-LoRA eval — sample with the trained attn-procs LoRA via the
mix script without a ControlLoRA (reference tasks/test_lora.py equivalent)."""
import sys
from _launch import run

if __name__ == "__main__":
    sys.exit(run("sample.py", [
        "--control_lora_dir", "dreambooth-lora",
        "--output_dir", "samples/lora",
    ] + sys.argv[1:]))
