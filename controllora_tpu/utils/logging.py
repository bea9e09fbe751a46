"""Metrics logging: JSONL always, TensorBoard/wandb when available.

The reference reports through accelerate trackers (tensorboard/wandb/comet, reference
train_text_to_image_control_lora.py:284-292, 696-697). Here: a dependency-light JSONL
stream (machine-readable, hermetic) plus optional tensorboard and wandb sinks behind
lazy imports — `report_to` accepts jsonl | tensorboard | wandb | all.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricsLogger:
    def __init__(self, output_dir: str, report_to: str = "jsonl"):
        os.makedirs(output_dir, exist_ok=True)
        self.jsonl_path = os.path.join(output_dir, "metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        self._tb = None
        if report_to in ("tensorboard", "all"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except Exception:
                pass
        self._wandb = None
        if report_to in ("wandb", "all"):
            try:
                import wandb

                self._wandb = wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "controllora_tpu"),
                    dir=output_dir,
                    resume="allow",
                )
            except Exception:
                print("wandb requested but unavailable; falling back to jsonl")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in metrics.items()}, step=int(step))

    def log_image(self, step: int, tag: str, image_u8: np.ndarray):
        """image_u8: HWC uint8. Saved as PNG under images/ and to tensorboard."""
        d = os.path.join(os.path.dirname(self.jsonl_path), "images")
        os.makedirs(d, exist_ok=True)
        try:
            from PIL import Image

            Image.fromarray(image_u8).save(os.path.join(d, f"{tag}-{step}.png"))
        except Exception:
            pass
        if self._tb is not None:
            self._tb.add_image(tag, image_u8, step, dataformats="HWC")
        if self._wandb is not None:
            import wandb

            self._wandb.log({tag: wandb.Image(image_u8)}, step=int(step))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
