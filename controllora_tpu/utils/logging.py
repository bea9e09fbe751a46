"""Metrics logging: JSONL always, TensorBoard/wandb when available.

The reference reports through accelerate trackers (tensorboard/wandb/comet, reference
train_text_to_image_control_lora.py:284-292, 696-697). Here: a dependency-light JSONL
stream (machine-readable, hermetic) plus optional tensorboard/wandb/comet sinks behind
lazy imports — `report_to` accepts jsonl | tensorboard | wandb | comet_ml | all.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricsLogger:
    def __init__(self, output_dir: str, report_to: str = "jsonl",
                 enabled: bool = True):
        """`enabled=False` turns every sink into a no-op — multi-host runs gate all
        trackers on process 0 (the reference gates via accelerator.is_main_process,
        reference train:696-697); non-main processes would otherwise spawn duplicate
        wandb runs and collide on shared-filesystem jsonl/PNG writes."""
        self.enabled = enabled
        self.jsonl_path = os.path.join(output_dir, "metrics.jsonl")
        self._jsonl = None
        self._tb = None
        self._wandb = None
        self._comet = None
        self._t0 = time.time()
        if not enabled:
            return
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(self.jsonl_path, "a")
        if report_to in ("tensorboard", "all"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except Exception:
                pass
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
        if report_to in ("comet_ml", "all"):
            # the reference accepts comet_ml as a tracker (train:284-292)
            try:
                import comet_ml

                self._comet = comet_ml.Experiment(
                    project_name=os.environ.get("COMET_PROJECT", "controllora_tpu")
                )
            except Exception:
                print("comet_ml requested but unavailable; falling back to jsonl")

    def log(self, step: int, metrics: Dict[str, float]):
        if not self.enabled:
            return
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in metrics.items()}, step=int(step))
        if self._comet is not None:
            self._comet.log_metrics(
                {k: float(v) for k, v in metrics.items()}, step=int(step))

    def log_image(self, step: int, tag: str, image_u8: np.ndarray):
        """image_u8: HWC uint8. Saved as PNG under images/ and to tensorboard."""
        if not self.enabled:
            return
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
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._comet is not None:
            self._comet.end()
