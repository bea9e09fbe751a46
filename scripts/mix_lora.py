#!/usr/bin/env python
"""LoRA x ControlLoRA composition demo — the reference's mix_lora_and_control_lora.py:
load a DreamBooth LoRA (attn-procs format) and a ControlLoRA, inject the plain LoRAs as
pre- (or post-) adapters of every control processor, and sample with both active
(reference mix_lora_and_control_lora.py:114-151).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--model_variant", type=str, default="sd15", choices=["sd15", "smoke"])
    p.add_argument("--control_lora_dir", type=str, required=True)
    p.add_argument("--lora_weights", type=str, required=True,
                   help="pytorch_lora_weights.safetensors (attn-procs format)")
    p.add_argument("--where", type=str, default="pre", choices=["pre", "post"])
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--guide_image", type=str, default=None,
                   help="image file; omit to use a fill50k synthetic guide")
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--guidance_scale", type=float, default=9.0)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--num_images", type=int, default=1)
    p.add_argument("--output_dir", type=str, default="samples/mix")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from controllora_tpu.data.tokenizer import default_tokenizer
    from controllora_tpu.models import zoo
    from controllora_tpu.models.control_lora import ControlLoRA
    from controllora_tpu.models.lora import AdapterSpec, AttnAdapter
    from controllora_tpu.pipelines import StableDiffusionControlLoRAPipeline
    from controllora_tpu.training.checkpoint import load_control_lora
    from controllora_tpu.utils.torch_compat import attn_procs_from_torch, load_state_dict

    dtype = jnp.bfloat16 if args.model_variant == "sd15" else jnp.float32
    unet, vae, text_encoder = zoo.build_models(args.model_variant, dtype=dtype)
    rng = jax.random.PRNGKey(args.seed)
    if args.pretrained_model_name_or_path:
        frozen = zoo.load_frozen(args.pretrained_model_name_or_path, param_dtype=dtype)
    else:
        frozen = zoo.random_frozen(rng, unet, vae, text_encoder,
                                   latent_size=args.resolution // 8, param_dtype=dtype)
        print("WARNING: random frozen stack")

    control_params, ccfg = load_control_lora(args.control_lora_dir)
    lora_params = attn_procs_from_torch(load_state_dict(args.lora_weights))
    spec = AdapterSpec(kind="lora")
    extra = {name: AttnAdapter(params=p, spec=spec) for name, p in lora_params.items()}
    print(f"loaded {len(extra)} plain LoRA adapters + ControlLoRA "
          f"({ccfg.lora_control_version=})")

    pipe = StableDiffusionControlLoRAPipeline(
        unet, vae, text_encoder, default_tokenizer(require_clip=bool(args.pretrained_model_name_or_path)), frozen,
        ControlLoRA(ccfg, dtype=dtype), control_params,
    )

    if args.guide_image:
        g = Image.open(args.guide_image).convert("RGB").resize(
            (args.resolution, args.resolution))
        guide = np.asarray(g, np.float32) / 127.5 - 1.0
    else:
        from controllora_tpu.data import Fill50kSynthetic

        guide = Fill50kSynthetic(resolution=args.resolution, size=10)[0][
            "guide_values"
        ].astype(np.float32)

    os.makedirs(args.output_dir, exist_ok=True)
    imgs = pipe(
        args.prompt, guide=guide,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        num_images=args.num_images,
        rng=jax.random.PRNGKey(args.seed),
        extra_loras=extra, extra_loras_where=args.where,
    )
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(os.path.join(args.output_dir, f"{i}.png"))
        print(f"wrote {args.output_dir}/{i}.png")


if __name__ == "__main__":
    main()
