#!/usr/bin/env python
"""Quality-bound the accelerated serving presets on a TRAINED model.

The exact/tome/turbo presets ship with TPU throughput numbers (docs/BENCHMARKS.md)
whose quality claims were, until round 5, imported from GPU papers. This script
measures the quality trade ON THIS CODEBASE, end-to-end, hermetically: train the
smoke ControlLoRA on procedural fill50k to convergence (minutes on CPU at 64²),
render the same seeded prompts+guides under every preset, and report

  * guide fidelity — fit the rendered circle (nearest-palette-color segmentation
    → centroid + equivalent radius) and compare against the dataset's ground-truth
    center/radius, the same eval-by-generation idea as the reference's validation
    loop (reference test_text_to_image_control_lora.py:772-789);
  * drift vs the exact sampler — mean |Δ| in 8-bit units per preset.

Usage (CPU, ~4-6 min with --train_steps 600):
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/eval_presets.py \
        --output_dir /tmp/presets_run --train_steps 600 --report /tmp/presets.json

With an already-trained run (e.g. from scripts/train.py): add --control_lora_dir.
Prints one JSON report line to stdout; montage saved under --output_dir.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESETS = {
    # name -> (tome_ratio, deepcache_interval); mirrors scripts/serve.py --preset
    "exact": (0.0, 1),
    "tome50": (0.5, 1),
    "dc2": (0.0, 2),
    "turbo": (0.5, 2),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--control_lora_dir", type=str, default=None,
                   help="skip training and evaluate this run directory")
    p.add_argument("--train_steps", type=int, default=600)
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--num_eval", type=int, default=4,
                   help="eval samples (fill50k indices 10_000+i: unseen specs)")
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--guidance_scale", type=float, default=9.0)
    p.add_argument("--seed", type=int, default=42,
                   help="must match the training run's --seed (frozen stack)")
    p.add_argument("--report", type=str, default=None,
                   help="also write the JSON report to this path")
    return p.parse_args(argv)


def fit_circle(img_u8: np.ndarray, fg_rgb, bg_rgb):
    """Nearest-of-two-colors segmentation → (cx, cy, radius) of the fg blob.

    Robust to the smoke model's soft colors: a pixel is foreground when it is
    L2-closer to the caption's fg palette color than to the bg color."""
    img = img_u8.astype(np.float32)
    d_fg = np.sum((img - np.asarray(fg_rgb, np.float32)) ** 2, axis=-1)
    d_bg = np.sum((img - np.asarray(bg_rgb, np.float32)) ** 2, axis=-1)
    mask = d_fg < d_bg
    area = float(mask.sum())
    if area < 4.0:
        return None
    yy, xx = np.nonzero(mask)
    return float(xx.mean()), float(yy.mean()), float(np.sqrt(area / np.pi))


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    run_dir = args.control_lora_dir
    if run_dir is None:
        run_dir = os.path.join(args.output_dir, "train")
        from scripts.train import main as train_main

        print(f"training smoke ControlLoRA: {args.train_steps} steps at "
              f"{args.resolution}^2 -> {run_dir}", file=sys.stderr)
        train_main([
            "--model_variant", "smoke",
            "--dataset_name", "process/fill50k",
            "--resolution", str(args.resolution),
            "--train_batch_size", str(args.train_batch_size),
            "--max_train_steps", str(args.train_steps),
            "--learning_rate", "3e-4",
            "--seed", str(args.seed),
            "--output_dir", run_dir,
            "--no_remat",
            "--mixed_precision", "no",
            "--checkpointing_steps", str(10 ** 9),
        ])

    import jax
    import jax.numpy as jnp

    from controllora_tpu.data.fill50k import _COLORS, Fill50kSynthetic
    from controllora_tpu.data.tokenizer import default_tokenizer
    from controllora_tpu.models import zoo
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
    from controllora_tpu.schedulers import DPMSolverMultistepScheduler
    from controllora_tpu.training.checkpoint import load_control_lora

    dtype = jnp.float32
    unet, vae, text_encoder = zoo.build_models("smoke", dtype=dtype)
    frozen = zoo.random_frozen(jax.random.PRNGKey(args.seed), unet, vae,
                               text_encoder, latent_size=args.resolution // 8,
                               param_dtype=dtype)
    control_params, ccfg = load_control_lora(run_dir)
    pipe = StableDiffusionControlLoRAPipeline(
        unet, vae, text_encoder, default_tokenizer(), frozen,
        ControlLoRA(ccfg, dtype=dtype), control_params,
        scheduler=DPMSolverMultistepScheduler(),
    )

    ds = Fill50kSynthetic(resolution=args.resolution)
    report = {"presets": {}, "train_dir": run_dir,
              "num_eval": args.num_eval, "resolution": args.resolution,
              "num_inference_steps": args.num_inference_steps}
    renders = {}  # preset -> [HWC u8]
    specs = []
    for i in range(args.num_eval):
        idx = 10_000 + i  # far outside any plausible smoke-training window
        bg, fg, cx, cy, radius = ds._sample_spec(idx)
        ex = ds[idx]
        specs.append(dict(bg=bg, fg=fg, cx=cx, cy=cy, radius=radius,
                          guide=ex["guide_values"],
                          caption=f"{fg} circle with {bg} background"))

    for name, (tome_ratio, dc) in PRESETS.items():
        imgs = []
        for i, sp in enumerate(specs):
            out = pipe(sp["caption"], guide=sp["guide"],
                       num_inference_steps=args.num_inference_steps,
                       guidance_scale=args.guidance_scale,
                       height=args.resolution, width=args.resolution,
                       rng=jax.random.PRNGKey(1000 + i),
                       tome_ratio=tome_ratio, deepcache_interval=dc,
                       tome_min_tokens=0)  # smoke latents are tiny; don't gate
            imgs.append(np.asarray(out[0]))
        renders[name] = imgs

    h = args.resolution
    for name, imgs in renders.items():
        center_err, radius_err, drift = [], [], []
        for sp, img, exact_img in zip(specs, imgs, renders["exact"]):
            fit = fit_circle(img, _COLORS[sp["fg"]], _COLORS[sp["bg"]])
            if fit is None:
                center_err.append(float(h))  # count a lost circle as max error
                radius_err.append(float(h))
            else:
                fx, fy, fr = fit
                center_err.append(float(np.hypot(fx - sp["cx"], fy - sp["cy"])))
                radius_err.append(abs(fr - sp["radius"]))
            drift.append(float(np.mean(np.abs(
                img.astype(np.float32) - exact_img.astype(np.float32)))))
        report["presets"][name] = {
            "tome_ratio": PRESETS[name][0],
            "deepcache_interval": PRESETS[name][1],
            "center_err_px_mean": round(float(np.mean(center_err)), 2),
            "center_err_px_max": round(float(np.max(center_err)), 2),
            "radius_err_px_mean": round(float(np.mean(radius_err)), 2),
            "drift_vs_exact_u8_mean": round(float(np.mean(drift)), 2),
            "drift_vs_exact_u8_max": round(float(np.max(drift)), 2),
        }

    # montage: rows = presets, cols = eval samples (guide in row 0)
    try:
        from PIL import Image

        rows = [np.concatenate(
            [(127.5 * (sp["guide"] + 1)).astype(np.uint8) for sp in specs], axis=1)]
        rows += [np.concatenate(renders[n], axis=1) for n in PRESETS]
        path = os.path.join(args.output_dir, "presets_montage.png")
        Image.fromarray(np.concatenate(rows, axis=0)).save(path)
        report["montage"] = path
    except Exception as e:  # montage is a nicety, the numbers are the product
        print(f"montage skipped: {e}", file=sys.stderr)

    line = json.dumps(report)
    print(line)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line + "\n")
    return report


if __name__ == "__main__":
    main()
