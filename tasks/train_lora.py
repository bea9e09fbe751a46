#!/usr/bin/env python
"""Canned DreamBooth-LoRA trainer launch — reference tasks/train_lora.py equivalent."""
import sys
from _launch import run

if __name__ == "__main__":
    sys.exit(run("train_dreambooth.py", [
        "--instance_data_dir", "data/instance",
        "--instance_prompt", "a photo of sks",
        "--resolution", "512",
        "--train_batch_size", "1",
        "--learning_rate", "1e-4",
        "--max_train_steps", "1000",
        "--lora_rank", "4",
        "--output_dir", "dreambooth-lora",
        "--seed", "42",
    ] + sys.argv[1:]))
