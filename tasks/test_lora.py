#!/usr/bin/env python
"""Canned DreamBooth-LoRA eval — reference tasks/test_lora.py equivalent: load the
latest training checkpoint, re-save the run-root attn-procs artifact, and render
validation samples (test_dreambooth_lora.py:824-886)."""
import sys
from _launch import run

VALIDATION_PROMPT = "portrait of female HighCWu as a cute pink hair girl"

if __name__ == "__main__":
    sys.exit(run("sample.py", [
        "--lora_weights", "ckpts/sd-highcwu_v1-model-lora",
        "--resume_from_checkpoint", "latest",
        "--prompt", VALIDATION_PROMPT,
        "--resolution", "512",
        "--num_validation_images", "4",
        "--num_inference_steps", "25",
        "--output_dir", "samples/lora",
        "--seed", "0",
    ] + sys.argv[1:]))
