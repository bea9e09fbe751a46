#!/usr/bin/env python
"""Parity-fixture dumper.

The north-star parity requirement is fixed-seed comparability with the PyTorch
reference (SURVEY.md §7 hard part 1). This container cannot run the torch reference
(no diffusers/GPU), so parity is established through recorded fixtures:

1. On a machine with the reference installed, run the documented counterpart commands
   (docstring bottom) to dump reference activations for the same weights + inputs.
2. Here: `python scripts/dump_fixtures.py --pretrained <sd-dir> --out fixtures.npz`
   dumps this framework's activations for deterministic inputs.
3. Compare: `python scripts/dump_fixtures.py --compare ours.npz theirs.npz`.

Inputs are derived deterministically from --seed with numpy (identical on both sides —
no framework RNG involved), and noise for the scheduler test is recorded in the dump,
so comparisons are bit-meaningful per SURVEY §4's recorded-noise convention.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def deterministic_inputs(seed: int, resolution: int = 512):
    rng = np.random.default_rng(seed)
    lat = resolution // 8
    return {
        "latents": rng.standard_normal((1, lat, lat, 4)).astype(np.float32),
        "noise": rng.standard_normal((1, lat, lat, 4)).astype(np.float32),
        "guide": rng.uniform(-1, 1, (1, resolution, resolution, 3)).astype(np.float32),
        "pixels": rng.uniform(-1, 1, (1, resolution, resolution, 3)).astype(np.float32),
        "ids": rng.integers(0, 49408, (1, 77)).astype(np.int32),
        "t": np.array([500], np.int32),
    }


def dump(args):
    import jax
    import jax.numpy as jnp

    from controllora_tpu.config import load_config
    from controllora_tpu.models import zoo
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.schedulers import DDPMScheduler, DPMSolverMultistepScheduler

    dtype = jnp.float32  # fp32 for bit-level comparison
    unet, vae, text_encoder = zoo.build_models(args.model_variant, dtype=dtype)
    if args.pretrained:
        frozen = zoo.load_frozen(args.pretrained, param_dtype=dtype)
    else:
        frozen = zoo.random_frozen(jax.random.PRNGKey(0), unet, vae, text_encoder,
                                   latent_size=args.resolution // 8, param_dtype=dtype)
        print("NOTE: random weights — cross-framework comparison requires --pretrained")
    x = deterministic_inputs(args.seed, args.resolution)

    out = {k: v for k, v in x.items()}
    out["clip_hidden"] = np.asarray(
        text_encoder.apply({"params": frozen["text"]}, jnp.asarray(x["ids"]))
    )
    mean, logvar = vae.apply({"params": frozen["vae"]}, jnp.asarray(x["pixels"]),
                             method=vae.encode_moments)
    out["vae_mean"], out["vae_logvar"] = np.asarray(mean), np.asarray(logvar)
    out["vae_decode"] = np.asarray(
        vae.apply({"params": frozen["vae"]},
                  jnp.asarray(x["latents"]) * 0.18215, method=vae.decode)
    )
    out["unet_eps"] = np.asarray(
        unet.apply({"params": frozen["unet"]}, jnp.asarray(x["latents"]),
                   jnp.asarray(x["t"]), jnp.asarray(out["clip_hidden"]))
    )
    if args.control_lora_dir:
        cl, cp = ControlLoRA.from_pretrained(args.control_lora_dir, dtype)
        controls = cl.apply(cp, jnp.asarray(x["guide"]))
        for i, c in enumerate(controls):
            out[f"control_{i}"] = np.asarray(c)
        adapters = cl.build_adapters(cp, controls, unet.config)
        out["unet_eps_controlled"] = np.asarray(
            unet.apply({"params": frozen["unet"]}, jnp.asarray(x["latents"]),
                       jnp.asarray(x["t"]), jnp.asarray(out["clip_hidden"]), adapters)
        )
    if args.hed_weights or args.hed_random:
        # HED sigmoid probability on the uint8-quantized guide — same contract as
        # the torch dumper (reference annotator/hed/__init__.py:88-116: BGR flip,
        # /255; quantization matches the detector entry point)
        from controllora_tpu.annotators.hed import HEDdetector

        det = (HEDdetector.from_pretrained(args.hed_weights)
               if args.hed_weights else HEDdetector())
        img_u8 = np.clip((x["guide"][0] + 1.0) * 127.5, 0, 255).astype(np.uint8)
        bgr = img_u8[:, :, ::-1].astype(np.float32) / 255.0
        out["hed_prob"] = np.asarray(
            det.net.apply({"params": det.params}, jnp.asarray(bgr)[None])
        )

    # scheduler math on recorded noise
    sch = DDPMScheduler()
    out["ddpm_noisy"] = np.asarray(
        sch.add_noise(jnp.asarray(x["latents"]), jnp.asarray(x["noise"]),
                      jnp.asarray(x["t"]))
    )
    dpm = DPMSolverMultistepScheduler()
    tables = dpm.tables(20)
    st = dpm.init_state(jnp.asarray(x["latents"]))
    st = dpm.step(st, jnp.asarray(x["noise"]), jnp.asarray(0), 20, tables)
    out["dpm_step0"] = np.asarray(st.sample)

    np.savez_compressed(args.out, **out)
    print(f"wrote {len(out)} arrays to {args.out}")


def compare(path_a: str, path_b: str, atol: float):
    a, b = np.load(path_a), np.load(path_b)
    keys = sorted(set(a.files) & set(b.files))
    worst = 0.0
    for k in keys:
        if a[k].shape != b[k].shape:
            print(f"{k}: SHAPE MISMATCH {a[k].shape} vs {b[k].shape}")
            continue
        err = float(np.abs(a[k].astype(np.float64) - b[k].astype(np.float64)).max())
        worst = max(worst, err)
        print(f"{k}: max abs err {err:.3e} {'OK' if err <= atol else 'FAIL'}")
    print(f"worst: {worst:.3e} ({'PASS' if worst <= atol else 'FAIL'} at atol {atol})")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained", type=str, default=None)
    p.add_argument("--control_lora_dir", type=str, default=None)
    p.add_argument("--hed_weights", type=str, default=None,
                   help="network-bsds500.pth for the HED fixture (torch_compat import)")
    p.add_argument("--hed_random", action="store_true",
                   help="dump the HED fixture with random weights (schema check only)")
    p.add_argument("--model_variant", type=str, default="sd15",
                   choices=["sd15", "smoke"])
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", type=str, default="fixtures.npz")
    p.add_argument("--compare", nargs=2, metavar=("A", "B"))
    p.add_argument("--atol", type=float, default=5e-3)
    args = p.parse_args()
    if args.compare:
        compare(*args.compare, args.atol)
    else:
        dump(args)


if __name__ == "__main__":
    main()
