#!/usr/bin/env python
"""Reference-side training benchmark — anchors BASELINE.md's "≥3× A100
steps/sec/chip" target with a measured PyTorch number.

Runs in a REFERENCE environment (GPU + torch + diffusers + the reference repo on
sys.path — not this container). One command measures the reference ControlLoRA
training step (SD1.5 frozen stack + base adapters, 512², batch 8, fp16 autocast,
adapter-only AdamW — the same workload bench.py times on TPU) and writes
BASELINE_TORCH.json; drop that file at the repo root and bench.py's
`train_vs_baseline` switches from the documented public-report estimate to the
measured anchor.

Usage (reference environment):
    python scripts/bench_reference_torch.py \
        --pretrained runwayml/stable-diffusion-v1-5 \
        [--control_lora_config <reference configs/sd_control_lora.json>] \
        [--batch 8] [--xformers] --out BASELINE_TORCH.json

Self-test (runs HERE, CI-covered): `--selftest` exercises the measurement loop —
warmup/steady-state split, synchronize fencing, JSON schema — against a stub
model on CPU, so the one-shot GPU run cannot fail on script bugs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_steps(step_fn, sync, warmup: int = 3, iters: int = 10) -> float:
    """Steady-state seconds/step: warmup (compile/cudnn autotune) then timed loop
    with a device fence at the end — the same chained-measurement contract as
    bench.py (docs/BENCHMARKS.md)."""
    for _ in range(warmup):
        step_fn()
    sync()
    t0 = time.time()
    for _ in range(iters):
        step_fn()
    sync()
    return (time.time() - t0) / iters


def run_real(args) -> dict:
    import torch
    from diffusers import AutoencoderKL, DDPMScheduler, UNet2DConditionModel
    from transformers import CLIPTextModel

    # reference repo import: ControlLoRA container (reference models.py:613)
    from models import ControlLoRA

    dev = "cuda"
    dtype = torch.float16
    unet = UNet2DConditionModel.from_pretrained(args.pretrained, subfolder="unet")
    vae = AutoencoderKL.from_pretrained(args.pretrained, subfolder="vae")
    text = CLIPTextModel.from_pretrained(args.pretrained, subfolder="text_encoder")
    for m in (unet, vae, text):
        m.to(dev).requires_grad_(False)
    if args.xformers:
        unet.enable_xformers_memory_efficient_attention()

    if args.control_lora_config:
        control_lora = ControlLoRA.from_config(args.control_lora_config)
    else:
        control_lora = ControlLoRA()  # reference defaults = base config
    control_lora.to(dev).train()

    # install processors (reference train_text_to_image_control_lora.py:468-487)
    lora_layers_list = [list(l) for l in control_lora.lora_layers]
    procs = {}
    for name in unet.attn_processors.keys():
        if name.startswith("mid_block"):
            cid = len(unet.config.block_out_channels) - 1
        elif name.startswith("up_blocks"):
            cid = list(reversed(range(len(unet.config.block_out_channels))))[
                int(name[len("up_blocks.")])]
        else:
            cid = int(name[len("down_blocks.")])
        if lora_layers_list[cid]:
            procs[name] = lora_layers_list[cid].pop(0)
    unet.set_attn_processor(procs)

    sch = DDPMScheduler.from_pretrained(args.pretrained, subfolder="scheduler")
    opt = torch.optim.AdamW(control_lora.parameters(), lr=1e-4,
                            betas=(0.9, 0.999), weight_decay=1e-2, eps=1e-8)
    scaler = torch.cuda.amp.GradScaler()

    b = args.batch
    pixels = torch.zeros(b, 3, args.resolution, args.resolution, device=dev)
    guide = torch.zeros(b, 3, args.resolution, args.resolution, device=dev)
    ids = torch.zeros(b, 77, dtype=torch.long, device=dev)

    def step():
        opt.zero_grad(set_to_none=True)
        with torch.autocast("cuda", dtype=dtype):
            with torch.no_grad():
                latents = vae.encode(pixels).latent_dist.sample() * 0.18215
                ctx = text(ids)[0]
            noise = torch.randn_like(latents)
            t = torch.randint(0, sch.config.num_train_timesteps, (b,), device=dev)
            noisy = sch.add_noise(latents, noise, t)
            control_lora(guide)  # inject control states into the processors
            pred = unet(noisy, t, encoder_hidden_states=ctx).sample
            loss = torch.nn.functional.mse_loss(pred.float(), noise.float())
        scaler.scale(loss).backward()
        scaler.unscale_(opt)
        torch.nn.utils.clip_grad_norm_(control_lora.parameters(), 1.0)
        scaler.step(opt)
        scaler.update()

    sec = measure_steps(step, torch.cuda.synchronize, args.warmup, args.iters)
    return {
        "steps_per_sec": round(1.0 / sec, 4),
        "imgs_per_sec": round(b / sec, 3),
        "batch": b,
        "resolution": args.resolution,
        "device": torch.cuda.get_device_name(0),
        "xformers": bool(args.xformers),
        "protocol": "warmup+fenced steady-state mean, encode-per-step, fp16 autocast",
    }


def run_selftest(args) -> dict:
    """Measurement-loop plumbing on a CPU stub: the timed section must dominate
    a deliberate per-step sleep, and the JSON schema must be complete."""
    calls = {"n": 0}

    def step():
        calls["n"] += 1
        time.sleep(0.01)

    sec = measure_steps(step, lambda: None, warmup=2, iters=5)
    assert calls["n"] == 7, calls
    assert 0.009 < sec < 0.05, sec
    out = {
        "steps_per_sec": round(1.0 / sec, 4),
        "imgs_per_sec": round(args.batch / sec, 3),
        "batch": args.batch,
        "resolution": args.resolution,
        "device": "selftest-stub",
        "xformers": False,
        "protocol": "selftest",
    }
    assert set(out) == {"steps_per_sec", "imgs_per_sec", "batch", "resolution",
                        "device", "xformers", "protocol"}
    print("selftest ok: measurement loop + schema verified", file=sys.stderr)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained")
    p.add_argument("--control_lora_config", default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--xformers", action="store_true")
    p.add_argument("--out", default="BASELINE_TORCH.json")
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args()

    if args.selftest:
        out = run_selftest(args)
    else:
        if not args.pretrained:
            p.error("--pretrained is required (or use --selftest)")
        out = run_real(args)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
