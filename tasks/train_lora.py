#!/usr/bin/env python
"""Canned DreamBooth-LoRA trainer launch — reference tasks/train_lora.py equivalent
(same hyperparams; the instance dir / prompts are the user's to override)."""
import sys
from _launch import run

VALIDATION_PROMPT = "portrait of female HighCWu as a cute pink hair girl"

if __name__ == "__main__":
    sys.exit(run("train_dreambooth.py", [
        "--instance_data_dir", "data/instance",
        "--instance_prompt", "portrait of male HighCWu",
        "--output_dir", "ckpts/sd-highcwu_v1-model-lora",
        "--resolution", "512",
        "--train_batch_size", "1",
        "--gradient_accumulation_steps", "1",
        "--checkpointing_steps", "100",
        "--resume_from_checkpoint", "latest",
        "--learning_rate", "1e-4",
        "--report_to", "wandb",
        "--lr_scheduler", "constant",
        "--lr_warmup_steps", "0",
        "--max_train_steps", "2000",
        "--validation_prompt", VALIDATION_PROMPT,
        "--validation_epochs", "50",
        "--lora_rank", "4",
        "--seed", "0",
    ] + sys.argv[1:]))
