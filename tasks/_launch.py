"""Shared launcher for canned tasks — the reference's tasks/*.py are one-line
`accelerate launch` command lines pinning hyperparameters (e.g. reference
tasks/train_canny.py:14-25); here they invoke scripts/train.py / sample.py in-process.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(script: str, args: list[str]) -> int:
    cmd = [sys.executable, os.path.join(ROOT, "scripts", script)] + args
    print("+", " ".join(cmd))
    return subprocess.call(cmd)


# Reference hyperparameters shared across tasks (reference tasks/train_canny.py:14-25):
# 512 resolution, batch 1 (paper setting) / 16 (trainer default), lr 1e-4, 30k steps,
# seed 42.
def train_defaults(config: str, dataset: str, output_dir: str, extra=()):
    return [
        "--control_lora_config", config,
        "--dataset_name", dataset,
        "--resolution", "512",
        "--train_batch_size", "1",
        "--learning_rate", "1e-4",
        "--max_train_steps", "30000",
        "--checkpointing_steps", "500",
        "--seed", "42",
        "--output_dir", output_dir,
        *extra,
    ]


def test_defaults(control_dir: str, dataset: str, output_dir: str, extra=()):
    return [
        "--control_lora_dir", control_dir,
        "--dataset_name", dataset,
        "--resolution", "512",
        "--num_inference_steps", "30",
        "--num_validation_images", "4",
        "--output_dir", output_dir,
        *extra,
    ]
