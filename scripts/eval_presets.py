#!/usr/bin/env python
"""Quality-bound the accelerated serving presets on a TRAINED model.

The exact/tome/turbo presets ship with TPU throughput numbers (docs/BENCHMARKS.md)
whose quality claims were, until round 5, imported from GPU papers. This script
measures the quality trade ON THIS CODEBASE, end-to-end, hermetically: train the
smoke ControlLoRA on procedural fill50k (minutes on CPU at 64²), generate the same
seeded prompts+guides under every preset, and report per preset:

  * fidelity RELATIVE TO THE EXACT SAMPLER, latent space — the hermetic stack's
    absolute quality is bounded by its construction (a ~0.2M adapter over a
    frozen RANDOM UNet cannot reach the data manifold; measured: generated
    latents keep ~7-10 std of residual noise vs the 0.09-std encoded targets),
    so the meaningful question is whether a preset CHANGES the model's
    per-input behavior: `latent_rel_err_vs_exact` = ||gen_p(i) − gen_exact(i)||
    / ||gen_exact(i)||, and `exact_retrieval_acc` — is preset output i nearest
    EXACT's output for the same spec i among all eval specs?
  * guide sensitivity — mean pairwise latent distance between different specs'
    outputs, normalized by output norm, per preset. If ToMe/DeepCache washed
    out the conditioning, this collapses toward 0 relative to exact's value.
  * absolute context — RMSE vs the VAE-encoded ground-truth image, normalized
    by target std (`latent_nrmse_vs_gt`): honest evidence of how far the smoke
    stack is from the data manifold. These metrics are the hermetic-stack
    equivalent of the reference's eval-by-generation loop
    (test_text_to_image_control_lora.py:772-789): with a RANDOM frozen VAE,
    decode() does not invert encode(), so pixel-space circle fitting is
    structurally uninformative — see the calibration gate below.
  * guide fidelity, pixel space — circle fit (nearest-palette-color segmentation
    → centroid + equivalent radius) vs the dataset's ground-truth center/radius.
    Reported only when the VAE round-trip decode(encode(gt)) itself passes the
    circle fit (true for pretrained/reference-quality stacks; never for the
    hermetic random smoke stack). The calibration numbers are always reported.
  * drift vs the exact sampler — mean |Δ| in 8-bit units over decoded renders.

Usage (CPU):
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/eval_presets.py \
        --output_dir /tmp/presets_run --train_steps 4000 --report /tmp/presets.json

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
    p.add_argument("--train_steps", type=int, default=4000)
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--num_eval", type=int, default=6,
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

    Robust to soft colors: a pixel is foreground when it is L2-closer to the
    caption's fg palette color than to the bg color."""
    img = img_u8.astype(np.float32)
    d_fg = np.sum((img - np.asarray(fg_rgb, np.float32)) ** 2, axis=-1)
    d_bg = np.sum((img - np.asarray(bg_rgb, np.float32)) ** 2, axis=-1)
    mask = d_fg < d_bg
    area = float(mask.sum())
    if area < 4.0:
        return None
    yy, xx = np.nonzero(mask)
    return float(xx.mean()), float(yy.mean()), float(np.sqrt(area / np.pi))


def circle_errors(img_u8, sp, h, colors):
    fit = fit_circle(img_u8, colors[sp["fg"]], colors[sp["bg"]])
    if fit is None:
        return float(h), float(h)  # a lost circle counts as max error
    fx, fy, fr = fit
    return (float(np.hypot(fx - sp["cx"], fy - sp["cy"])),
            abs(fr - sp["radius"]))


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

    encode_mean = jax.jit(lambda x: vae.apply(
        {"params": frozen["vae"]}, x, method=vae.encode))  # rng=None -> mean
    decode = jax.jit(lambda z: vae.apply(
        {"params": frozen["vae"]}, z, method=vae.decode))

    def to_u8(img_m1_1):
        return np.clip((np.asarray(img_m1_1, np.float32) + 1.0) * 127.5,
                       0, 255).astype(np.uint8)

    ds = Fill50kSynthetic(resolution=args.resolution)
    h = args.resolution
    report = {"presets": {}, "train_dir": run_dir,
              "num_eval": args.num_eval, "resolution": args.resolution,
              "num_inference_steps": args.num_inference_steps}
    specs = []
    for i in range(args.num_eval):
        idx = 10_000 + i  # far outside any plausible smoke-training window
        bg, fg, cx, cy, radius = ds._sample_spec(idx)
        ex = ds[idx]
        specs.append(dict(bg=bg, fg=fg, cx=cx, cy=cy, radius=radius,
                          guide=ex["guide_values"], pixels=ex["pixel_values"],
                          caption=f"{fg} circle with {bg} background"))

    # per-spec targets: encoded gt latents + the VAE round-trip calibration
    gt_lat = np.stack([np.asarray(encode_mean(sp["pixels"][None]))[0]
                       for sp in specs])                       # (n, h/8, w/8, 4)
    roundtrip = [to_u8(decode(l[None])[0]) for l in gt_lat]
    calib = [circle_errors(rt, sp, h, _COLORS)
             for rt, sp in zip(roundtrip, specs)]
    pixel_fit_valid = all(c[0] < 3.0 and c[1] < 3.0 for c in calib)
    report["vae_roundtrip_center_err_px"] = round(
        float(np.mean([c[0] for c in calib])), 2)
    report["vae_roundtrip_radius_err_px"] = round(
        float(np.mean([c[1] for c in calib])), 2)
    report["pixel_fit_valid"] = pixel_fit_valid
    if not pixel_fit_valid:
        report["pixel_fit_note"] = (
            "random frozen VAE: decode() does not invert encode(), so pixel-space "
            "circle fits are uninformative on the hermetic smoke stack; guide "
            "fidelity is reported in latent space instead")

    lats = {}     # preset -> (n, h/8, w/8, 4) generated latents
    renders = {}  # preset -> [HWC u8]
    for name, (tome_ratio, dc) in PRESETS.items():
        gen = []
        for i, sp in enumerate(specs):
            out = pipe(sp["caption"], guide=sp["guide"],
                       num_inference_steps=args.num_inference_steps,
                       guidance_scale=args.guidance_scale,
                       height=args.resolution, width=args.resolution,
                       rng=jax.random.PRNGKey(1000 + i),
                       tome_ratio=tome_ratio, deepcache_interval=dc,
                       tome_min_tokens=0,  # smoke latents are tiny; don't gate
                       return_latents=True)
            gen.append(np.asarray(out[0], np.float32))
        lats[name] = np.stack(gen)
        renders[name] = [to_u8(decode(l[None])[0]) for l in lats[name]]

    flat_gt = gt_lat.reshape(len(specs), -1)
    flat_exact = lats["exact"].reshape(len(specs), -1)
    n = len(specs)
    for name in PRESETS:
        flat = lats[name].reshape(n, -1)
        # relative behavior vs the exact sampler (the quality bound)
        d2x = ((flat[:, None, :] - flat_exact[None, :, :]) ** 2).mean(-1)  # (n, n)
        rel_err = [float(np.sqrt(d2x[i, i]) / (np.sqrt((flat_exact[i] ** 2).mean())
                                               + 1e-8)) for i in range(n)]
        exact_retrieval = float(np.mean(d2x.argmin(axis=1) == np.arange(n)))
        # conditioning preserved? mean pairwise inter-spec distance, normalized
        pair = [np.sqrt(((flat[i] - flat[j]) ** 2).mean()) for i in range(n)
                for j in range(i + 1, n)]
        sens = float(np.mean(pair) / (np.sqrt((flat ** 2).mean()) + 1e-8))
        # absolute context vs the encoded ground truth
        d2g = ((flat - flat_gt) ** 2).mean(-1)
        nrmse = [float(np.sqrt(d2g[i]) / (flat_gt[i].std() + 1e-8))
                 for i in range(n)]
        center_err, radius_err, drift = [], [], []
        for i, sp in enumerate(specs):
            ce, re_ = circle_errors(renders[name][i], sp, h, _COLORS)
            center_err.append(ce)
            radius_err.append(re_)
            drift.append(float(np.mean(np.abs(
                renders[name][i].astype(np.float32)
                - renders["exact"][i].astype(np.float32)))))
        entry = {
            "tome_ratio": PRESETS[name][0],
            "deepcache_interval": PRESETS[name][1],
            "latent_rel_err_vs_exact_mean": round(float(np.mean(rel_err)), 4),
            "latent_rel_err_vs_exact_max": round(float(np.max(rel_err)), 4),
            "exact_retrieval_acc": round(exact_retrieval, 3),
            "guide_sensitivity": round(sens, 4),
            "latent_nrmse_vs_gt_mean": round(float(np.mean(nrmse)), 1),
            "drift_vs_exact_u8_mean": round(float(np.mean(drift)), 2),
            "drift_vs_exact_u8_max": round(float(np.max(drift)), 2),
        }
        if pixel_fit_valid:
            entry["center_err_px_mean"] = round(float(np.mean(center_err)), 2)
            entry["center_err_px_max"] = round(float(np.max(center_err)), 2)
            entry["radius_err_px_mean"] = round(float(np.mean(radius_err)), 2)
        report["presets"][name] = entry

    # montage: row 0 = guides, row 1 = VAE-roundtripped targets (the best any
    # render could look through this VAE), then one row per preset
    try:
        from PIL import Image

        rows = [np.concatenate(
            [(127.5 * (sp["guide"] + 1)).astype(np.uint8) for sp in specs], axis=1)]
        rows += [np.concatenate(roundtrip, axis=1)]
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
