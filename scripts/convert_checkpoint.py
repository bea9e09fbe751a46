#!/usr/bin/env python
"""Checkpoint conversion CLI.

- `import-sd`: verify/ingest a diffusers-layout SD checkpoint directory (unet/vae/
  text_encoder safetensors) into flax trees and report shapes (the same loader the
  trainer uses; catches layout problems before a training run).
- `export-controllora` / `import-controllora`: convert between our orbax training
  state and the reference's bin/safetensors artifact.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("import-sd")
    s.add_argument("path")

    s = sub.add_parser("export-controllora")
    s.add_argument("--run_dir", required=True, help="training output dir (orbax)")
    s.add_argument("--config", required=True, help="preset name or config json")
    s.add_argument("--out", required=True)

    s = sub.add_parser("import-controllora")
    s.add_argument("path", help="dir with config.json + diffusion_pytorch_model.*")

    args = p.parse_args()
    import jax

    if args.cmd == "import-sd":
        from controllora_tpu.models import zoo

        frozen = zoo.load_frozen(args.path)
        for name, tree in frozen.items():
            n = sum(x.size for x in jax.tree.leaves(tree))
            print(f"{name}: {n/1e6:.1f}M params ok")
    elif args.cmd == "import-controllora":
        from controllora_tpu.training.checkpoint import load_control_lora

        params, cfg = load_control_lora(args.path)
        n = sum(x.size for x in jax.tree.leaves(params))
        print(f"ControlLoRA v{cfg.control_version}: {n/1e6:.2f}M params ok")
    else:
        from controllora_tpu.config import load_config
        from controllora_tpu.models.control_lora import ControlLoRA
        from controllora_tpu.training.checkpoint import (
            restore_train_state,
            save_control_lora,
        )

        cfg = load_config(args.config)
        cl = ControlLoRA(cfg)
        template = {"step": 0, "params": cl.init(jax.random.PRNGKey(0), 64),
                    "opt_state": None}
        # restore params only via a state-shaped target
        from controllora_tpu.training.trainer import TrainState, make_optimizer
        import jax.numpy as jnp

        opt = make_optimizer()
        state = TrainState(step=jnp.zeros((), jnp.int32), params=template["params"],
                           opt_state=opt.init(template["params"]))
        restored, step = restore_train_state(args.run_dir, state)
        if restored is None:
            raise SystemExit(f"no checkpoint under {args.run_dir}")
        save_control_lora(args.out, restored.params, cfg)
        print(f"exported step-{step} adapter to {args.out}")


if __name__ == "__main__":
    main()
