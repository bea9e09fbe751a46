"""Checkpoint / resume.

Rebuilds the reference's three serialization paths (SURVEY.md §5):
  1. training state (params + optimizer + step + RNG) — orbax, `checkpoint-<step>` dirs
     with latest-scan resume semantics (reference train:713-735, 805-809),
  2. final ControlLoRA artifact — config JSON + safetensors/bin in the reference's
     state-dict naming (reference train:922-929) via utils.torch_compat,
  3. plain LoRA attn-procs artifact (DreamBooth path) — handled by the same exporter.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.utils.torch_compat import (
    control_lora_from_torch,
    control_lora_to_torch,
    load_state_dict,
    save_state_dict,
)


def checkpoint_step_dirs(output_dir: str):
    """List (step, path) for checkpoint-* dirs, ascending (reference train:713-722)."""
    if not os.path.isdir(output_dir):
        return []
    out = []
    for d in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", d)
        if m:
            out.append((int(m.group(1)), os.path.join(output_dir, d)))
    return sorted(out)


_SHARED_CKPTR = None


def _shared_checkpointer():
    """One process-wide StandardCheckpointer (itself an orbax AsyncCheckpointer):
    async saves queue on it and `finalize_checkpoints()` drains it."""
    global _SHARED_CKPTR
    if _SHARED_CKPTR is None:
        _SHARED_CKPTR = ocp.StandardCheckpointer()
    return _SHARED_CKPTR


def save_train_state(output_dir: str, step: int, state,
                     keep: Optional[int] = None, wait: bool = True):
    """Save under output_dir/checkpoint-<step>; optionally prune old checkpoints
    (the reference's --checkpoints_total_limit, train:176-186).

    `wait=False` = preemption-safe ASYNC save (beyond-reference, TPU-native:
    orbax commits in a background thread via atomic rename while the train loop
    keeps stepping; the reference's accelerate save_state blocks the loop).
    Serialization of successive saves is guaranteed by the shared checkpointer
    (a new save first drains the previous one); call `finalize_checkpoints()`
    before process exit."""
    assert _HAS_ORBAX, "orbax not available"
    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}"))
    ckptr = _shared_checkpointer()
    ckptr.save(os.path.join(path, "state"), state, force=True)
    if wait:
        ckptr.wait_until_finished()
    if keep is not None:
        # prune only COMMITTED checkpoints (atomic-rename guarantees state/ only
        # appears complete); the in-flight newest is never in the prune window
        dirs = [d for d in checkpoint_step_dirs(output_dir)
                if os.path.isdir(os.path.join(d[1], "state"))]
        for _, p in dirs[:-keep]:
            import shutil

            shutil.rmtree(p, ignore_errors=True)
    return path


def finalize_checkpoints():
    """Drain any in-flight async checkpoint save (no-op when none)."""
    if _SHARED_CKPTR is not None:
        _SHARED_CKPTR.wait_until_finished()


def restore_train_state(
    output_dir: str, target, step: str | int = "latest"
) -> Tuple[Optional[Any], int]:
    """Restore `checkpoint-<step>` (or latest). Returns (state, step) or (None, 0) when
    nothing exists — the reference degrades to a fresh run the same way (train:723-727).
    `target` is an abstract/example TrainState pytree used for structure."""
    assert _HAS_ORBAX, "orbax not available"
    # only committed checkpoints are restorable (async saves appear atomically)
    dirs = [d for d in checkpoint_step_dirs(output_dir)
            if os.path.isdir(os.path.join(d[1], "state"))]
    if not dirs:
        return None, 0
    if step == "latest":
        step_num, path = dirs[-1]
    else:
        match = [d for d in dirs if d[0] == int(step)]
        if not match:
            return None, 0
        step_num, path = match[0]
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    state = ckptr.restore(os.path.join(os.path.abspath(path), "state"), abstract)
    return state, step_num


def save_control_lora(
    output_dir: str, params, config: ControlLoRAConfig, formats=("safetensors", "bin")
):
    """Final artifact: config.json + diffusion_pytorch_model.{safetensors,bin}
    (the reference writes both, train:927-929)."""
    os.makedirs(output_dir, exist_ok=True)
    config.save_json(os.path.join(output_dir, "config.json"))
    sd = control_lora_to_torch(jax.device_get(params), config)
    if "safetensors" in formats:
        save_state_dict(sd, os.path.join(output_dir, "diffusion_pytorch_model.safetensors"))
    if "bin" in formats:
        save_state_dict(sd, os.path.join(output_dir, "diffusion_pytorch_model.bin"))
    return output_dir


def load_control_lora(path: str) -> Tuple[Any, ControlLoRAConfig]:
    """Load a saved (or reference-published) ControlLoRA directory — the equivalent of
    `ControlLoRA.from_pretrained` (reference apps/gradio_canny2image.py:38)."""
    cfg = ControlLoRAConfig.from_json(os.path.join(path, "config.json"))
    for name in ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return control_lora_from_torch(load_state_dict(p), cfg), cfg
    raise FileNotFoundError(f"no weights found under {path}")
